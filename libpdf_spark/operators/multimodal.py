"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages. The image/audio codec libraries are NOT in
this container, so the decode step is a deterministic stub
(``_fake_decode``) behind the real Spark-side plumbing — schema,
partitioning, UDF signature and batch shape are production-real and
tested; swapping the stub for PIL/ffmpeg is a one-function change.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "meta struct<width:int,height:int,n_frames:int,sample_rate:int,format:string>"
)

FEATURE_SCHEMA = (
    "media_id bigint, kind string, ok boolean, error string, "
    "width int, height int, n_frames int, "
    "mean_luma double, phash string, thumb_bytes int"
)


def synth_media_df(spark, n: int = 64, partitions: int | None = None):
    """Deterministic synthetic media table: payload bytes are a seeded
    function of media_id (no external data), metadata consistent."""
    from pyspark.sql import functions as F

    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        w, h = 32 + (i % 7) * 16, 32 + (i % 5) * 16
        n_frames = 1 if kind == "image" else 8 + i % 16
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * (4 + i % 3)
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                (w, h, n_frames, 16000 if kind == "audio" else None, "synthetic"),
            )
        )
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    return df.repartition(partitions or spark.sparkContext.defaultParallelism)


def _fake_decode(payload: bytes, meta) -> dict:
    """STUB for the codec call (PIL/ffmpeg not installed here).

    Deterministic fake: derives per-pixel statistics from a hash of the
    payload so downstream feature code is fully exercisable. Replace
    with a real decoder to productionize — the function contract
    (bytes, meta) → {"luma": float, "phash_bits": bytes} is the whole
    integration surface.
    """
    if not payload:
        raise ValueError("empty media payload")
    digest = hashlib.sha256(bytes(payload)).digest()
    luma = struct.unpack(">I", digest[:4])[0] / 0xFFFFFFFF * 255.0
    return {"luma": luma, "phash_bits": digest[:8]}


def extract_media_features(media_df):
    """decode → feature-extract as one Arrow-batched stage.

    Per-row failures surface as ``ok=false`` rows, never aborts — same
    isolation contract as the text extraction pipeline.
    """
    import pandas as pd

    def batch_fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = {
                "media_id": [], "kind": [], "ok": [], "error": [],
                "width": [], "height": [], "n_frames": [],
                "mean_luma": [], "phash": [], "thumb_bytes": [],
            }
            for _, row in pdf.iterrows():
                meta = row["meta"]
                try:
                    feats = _fake_decode(row["payload"], meta)
                    ok, err = True, None
                except (ValueError, TypeError) as exc:
                    feats, ok, err = None, False, str(exc)
                out["media_id"].append(row["media_id"])
                out["kind"].append(row["kind"])
                out["ok"].append(ok)
                out["error"].append(err)
                out["width"].append(meta["width"] if meta is not None else None)
                out["height"].append(meta["height"] if meta is not None else None)
                out["n_frames"].append(
                    meta["n_frames"] if meta is not None else None
                )
                out["mean_luma"].append(
                    round(feats["luma"], 4) if feats else None
                )
                out["phash"].append(feats["phash_bits"].hex() if feats else None)
                # "resize to 16x16 thumbnail" byte count (stubbed decode
                # → size is the real contract being tested)
                out["thumb_bytes"].append(16 * 16 if ok else None)
            yield pd.DataFrame(out)

    return media_df.mapInPandas(batch_fn, schema=FEATURE_SCHEMA)


def sample_frames(media_df, every_k: int = 4):
    """Frame-sampling plan for video rows: one output row per sampled
    frame index — pure relational explode, no decode needed until the
    downstream feature stage."""
    from pyspark.sql import functions as F

    video = media_df.filter(F.col("kind") == "video")
    return video.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_k)
            )
        ).alias("frame_idx"),
    )


def q_media_features(spark, sf_dir):
    """queries() entry: synthetic media → feature extraction → stats
    per kind (rows-only check; decode is stubbed, plumbing is real)."""
    from pyspark.sql import functions as F

    feats = extract_media_features(synth_media_df(spark, n=96))
    return (
        feats.groupBy("kind")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("ok").cast("long")).alias("n_ok"),
            F.round(F.avg("mean_luma"), 4).alias("avg_luma"),
            F.countDistinct("phash").alias("distinct_phash"),
        )
    )


def q_media_frame_sample(spark, sf_dir):
    """queries() entry: frame-sampling plan (rows-only check)."""
    from pyspark.sql import functions as F

    frames = sample_frames(synth_media_df(spark, n=96))
    return frames.groupBy("media_id").agg(
        F.count("*").alias("n_sampled"),
        F.max("frame_idx").alias("last_frame"),
    )


QUERIES = {
    "media_features": q_media_features,
    "media_frame_sample": q_media_frame_sample,
}

ORACLES: dict[str, str] = {}  # binary/mapInPandas tier: rows-only checks
