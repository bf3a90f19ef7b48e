"""Multimodal column processing: real decoders over opaque binary columns.

Image/audio/video travel as ``binary`` columns with a typed metadata
struct; decode / feature-extract / frame-sample run as Arrow-batched
``mapInPandas`` stages. Round 2 replaced the round-1 decode stub with
REAL dependency-free decoders:

* **image** — BMP (24-bit uncompressed, ``BITMAPINFOHEADER``), decoded
  with ``struct`` + numpy: dimensions from the header, per-pixel RGB
  sums, 8×8 block signature;
* **audio** — WAV (RIFF, PCM16 mono): sample rate from the ``fmt ``
  chunk, int16 samples from ``data``, mean |amplitude| and 8-bucket
  signature;
* **video** — RV8, a minimal raw 8-bit-gray planar container
  (``RV8 `` magic + width/height/frame-count header + frame planes —
  the shape a real frame-extraction stage hands downstream); per-frame
  means and per-frame signature.

The synthetic corpus is generated from pure-integer formulas of
``media_id`` (no external data, no RNG), so a DuckDB oracle can
recompute every decoded feature analytically — the oracle agreeing
with the Spark output proves the encode→decode round-trip bit-exactly.
All features are integers (``level_millis``; md5 over integer-CSV
signatures) so no float rounding can flip the driver's value hash.

Scale posture: one mapInPandas over the media table (columnar zip, no
``iterrows``), per-row failures surface as ``ok=false`` rows; the
frame-sampling plan is a pure relational ``explode(sequence)``.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "meta struct<width:int,height:int,n_frames:int,sample_rate:int,format:string>"
)

FEATURE_SCHEMA = (
    "media_id bigint, kind string, ok boolean, error string, "
    "width int, height int, n_frames int, sample_rate int, "
    "level_millis bigint, phash string"
)

N_MEDIA = 96
SAMPLE_RATE = 16000
VIDEO_W = VIDEO_H = 16

# integer pixel/sample formulas — mirrored verbatim in the DuckDB oracle
_A, _B, _C, _D, _E = 9973, 131, 7, 37, 13


def _params(mid: int) -> dict:
    kind = ("image", "audio", "video")[mid % 3]
    return {
        "kind": kind,
        "iw": 16 + (mid % 4) * 8,
        "ih": 16 + ((mid // 3) % 3) * 8,
        "ns": 512 + (mid % 4) * 256,
        "nf": 4 + (mid % 4),
    }


# ---------------------------------------------------------------------------
# encoders (corpus synthesis) — real file formats from integer formulas
# ---------------------------------------------------------------------------


def encode_bmp(mid: int, w: int, h: int) -> bytes:
    """24-bit uncompressed BMP; pixel (x, y, channel) = formula(mid).

    Row y=0 is the BOTTOM row (BMP native order); rows padded to 4
    bytes. Stored channel order is B, G, R (ch indices 2, 1, 0)."""
    x = np.arange(w, dtype=np.int64)
    y = np.arange(h, dtype=np.int64)
    base = mid * _A + y[:, None] * _B + x[None, :] * _C + _E
    rows = np.empty((h, w, 3), dtype=np.uint8)
    rows[:, :, 0] = (base + 2 * _D) % 256  # B
    rows[:, :, 1] = (base + 1 * _D) % 256  # G
    rows[:, :, 2] = (base + 0 * _D) % 256  # R
    stride = (w * 3 + 3) & ~3
    padded = np.zeros((h, stride), dtype=np.uint8)
    padded[:, : w * 3] = rows.reshape(h, w * 3)
    pix = padded.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(pix), 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0
    )
    return header + pix


def encode_wav(mid: int, n_samples: int, rate: int = SAMPLE_RATE) -> bytes:
    """RIFF/WAVE, PCM 16-bit mono; sample s = formula(mid) − 2048."""
    s = np.arange(n_samples, dtype=np.int64)
    amp = ((mid * _A + s * _B + _E) % 4096 - 2048).astype("<i2")
    data = amp.tobytes()
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
        + struct.pack(
            "<4sIHHIIHH", b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16
        )
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def encode_rv8(mid: int, w: int, h: int, n_frames: int) -> bytes:
    """RV8 raw gray video: magic + <HHH w h nf> + nf planes of w*h
    bytes; frame f pixel p = formula(mid)."""
    f = np.arange(n_frames, dtype=np.int64)
    p = np.arange(w * h, dtype=np.int64)
    planes = ((mid * _A + f[:, None] * _B + p[None, :] * _C + _E) % 256).astype(
        np.uint8
    )
    return struct.pack("<4sHHH", b"RV8 ", w, h, n_frames) + planes.tobytes()


# ---------------------------------------------------------------------------
# decoders — parse REAL bytes back into integer features
# ---------------------------------------------------------------------------


def _sig(values) -> str:
    """Block-signature hash: md5 over the integer-CSV of block sums —
    deterministic fingerprint of decoded content (phash stand-in: equal
    for identical content, integer-exact across engines)."""
    return hashlib.md5(
        ",".join(str(int(v)) for v in values).encode()
    ).hexdigest()


def decode_bmp(data: bytes) -> dict:
    if data[:2] != b"BM" or len(data) < 54:
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", data, 10)[0]
    hdr_size, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", data, 14)
    if hdr_size < 40 or bpp != 24 or comp != 0 or w <= 0 or h <= 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    stride = (w * 3 + 3) & ~3
    need = offset + stride * h
    if len(data) < need:
        raise ValueError("truncated BMP pixel data")
    pix = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=offset)
    rgb = pix.reshape(h, stride)[:, : w * 3].reshape(h, w, 3).astype(np.int64)
    per_px = rgb.sum(axis=2)  # B+G+R == R+G+B
    total = int(per_px.sum())
    bx = (np.arange(w) * 8) // w
    by = (np.arange(h) * 8) // h
    blocks = np.zeros((8, 8), dtype=np.int64)
    np.add.at(blocks, (np.repeat(by, w), np.tile(bx, h)), per_px.ravel())
    return {
        "width": w, "height": h, "n_frames": 1, "sample_rate": None,
        "level_millis": total * 1000 // (3 * w * h),
        "phash": _sig(blocks.ravel()),  # (by, bx) order
    }


def decode_wav(data: bytes) -> dict:
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(data):
        cid, clen = struct.unpack_from("<4sI", data, pos)
        body = data[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            fmt, ch, rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", body, 0)[:6]
            if fmt != 1 or ch != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV (fmt={fmt}, channels={ch}, bits={bits})"
                )
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2").astype(np.int64)
        pos += 8 + clen + (clen & 1)
    if rate is None or samples is None or len(samples) == 0:
        raise ValueError("WAV missing fmt/data chunk")
    absamp = np.abs(samples)
    n = len(samples)
    bucket = (np.arange(n) * 8) // n
    sums = np.zeros(8, dtype=np.int64)
    np.add.at(sums, bucket, absamp)
    return {
        "width": None, "height": None, "n_frames": None, "sample_rate": int(rate),
        "level_millis": int(absamp.sum()) * 1000 // n,
        "phash": _sig(sums),
    }


def decode_rv8(data: bytes) -> dict:
    if data[:4] != b"RV8 " or len(data) < 10:
        raise ValueError("not an RV8 payload")
    w, h, nf = struct.unpack_from("<HHH", data, 4)
    need = 10 + w * h * nf
    if w == 0 or h == 0 or nf == 0 or len(data) < need:
        raise ValueError("truncated RV8 payload")
    planes = (
        np.frombuffer(data, dtype=np.uint8, count=w * h * nf, offset=10)
        .reshape(nf, w * h)
        .astype(np.int64)
    )
    frame_sums = planes.sum(axis=1)
    return {
        "width": int(w), "height": int(h), "n_frames": int(nf),
        "sample_rate": None,
        "level_millis": int(frame_sums.sum()) * 1000 // (nf * w * h),
        "phash": _sig(frame_sums),
    }


def decode_media(payload: bytes) -> dict:
    """Sniff-dispatch on magic bytes — the integration surface a real
    codec stack (PIL/ffmpeg) would slot into."""
    if not payload:
        raise ValueError("empty media payload")
    head = bytes(payload[:4])
    try:
        if head[:2] == b"BM":
            return decode_bmp(bytes(payload))
        if head == b"RIFF":
            return decode_wav(bytes(payload))
        if head == b"RV8 ":
            return decode_rv8(bytes(payload))
    except struct.error as exc:  # truncated header fields
        raise ValueError(f"truncated media payload: {exc}") from exc
    raise ValueError(f"unrecognized media magic {head!r}")


# ---------------------------------------------------------------------------
# corpus + Spark stages
# ---------------------------------------------------------------------------


def synth_media_df(spark, n: int = N_MEDIA, partitions: int | None = None):
    """Deterministic synthetic media table: REAL BMP/WAV/RV8 payload
    bytes from pure-integer formulas of media_id (no external data)."""
    rows = []
    for i in range(n):
        p = _params(i)
        if p["kind"] == "image":
            payload = encode_bmp(i, p["iw"], p["ih"])
            meta = (p["iw"], p["ih"], 1, None, "bmp")
        elif p["kind"] == "audio":
            payload = encode_wav(i, p["ns"])
            meta = (None, None, None, SAMPLE_RATE, "wav")
        else:
            payload = encode_rv8(i, VIDEO_W, VIDEO_H, p["nf"])
            meta = (VIDEO_W, VIDEO_H, p["nf"], None, "rv8")
        rows.append((i, p["kind"], bytearray(payload), meta))
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    return df.repartition(partitions or spark.sparkContext.defaultParallelism)


def extract_media_features(media_df):
    """decode → feature-extract as one Arrow-batched stage.

    Columnar zip over the batch (no pandas ``iterrows`` — ADVICE r1);
    per-row failures surface as ``ok=false`` rows, never aborts — the
    same isolation contract as the text extraction pipeline."""
    import pandas as pd

    def batch_fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in (
                "media_id", "kind", "ok", "error", "width", "height",
                "n_frames", "sample_rate", "level_millis", "phash",
            )}
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                try:
                    feats = decode_media(payload)
                    ok, err = True, None
                except (ValueError, TypeError) as exc:
                    feats, ok, err = {}, False, str(exc)
                out["media_id"].append(int(mid))
                out["kind"].append(kind)
                out["ok"].append(ok)
                out["error"].append(err)
                for k in ("width", "height", "n_frames", "sample_rate"):
                    out[k].append(feats.get(k))
                out["level_millis"].append(feats.get("level_millis"))
                out["phash"].append(feats.get("phash"))
            res = pd.DataFrame(out)
            for k in ("width", "height", "n_frames", "sample_rate"):
                res[k] = pd.array(out[k], dtype="Int32")
            res["level_millis"] = pd.array(out["level_millis"], dtype="Int64")
            yield res

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
            F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_k))
        ).alias("frame_idx"),
    )


# ---------------------------------------------------------------------------
# queries + DuckDB value oracles
# ---------------------------------------------------------------------------


def q_media_features(spark, sf_dir):
    """queries() entry: synthetic media → REAL decode → per-media
    integer features. The oracle recomputes every feature analytically
    from the generation formulas, proving the encode→decode loop."""
    return extract_media_features(synth_media_df(spark, n=N_MEDIA)).select(
        "media_id", "kind", "ok", "error", "width", "height",
        "n_frames", "sample_rate", "level_millis", "phash",
    )


def q_media_frame_sample(spark, sf_dir):
    """queries() entry: frame-sampling plan over the video rows."""
    from pyspark.sql import functions as F

    frames = sample_frames(synth_media_df(spark, n=N_MEDIA))
    return frames.groupBy("media_id").agg(
        F.count("*").alias("n_sampled"),
        F.max("frame_idx").cast("long").alias("last_frame"),
    )


_SQL_PARAMS = f"""
    WITH ids AS (SELECT unnest(range({N_MEDIA})) AS media_id),
    params AS (
      SELECT media_id,
             CASE media_id % 3 WHEN 0 THEN 'image'
                               WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
             16 + (media_id % 4) * 8 AS iw,
             16 + ((media_id // 3) % 3) * 8 AS ih,
             512 + (media_id % 4) * 256 AS ns,
             4 + (media_id % 4) AS nf
      FROM ids)
"""

SQL_MEDIA_FEATURES = (
    _SQL_PARAMS
    + f"""
    , xs AS (SELECT media_id, iw, ih, unnest(range(iw)) AS x
             FROM params WHERE kind = 'image')
    , xy AS (SELECT media_id, iw, ih, x, unnest(range(ih)) AS y FROM xs)
    , px AS (SELECT media_id, iw, ih,
                    (media_id*{_A} + y*{_B} + x*{_C} + {_E}) % 256
                  + (media_id*{_A} + y*{_B} + x*{_C} + {_D + _E}) % 256
                  + (media_id*{_A} + y*{_B} + x*{_C} + {2 * _D + _E}) % 256 AS rgb,
                    (x * 8) // iw AS bx, (y * 8) // ih AS by
             FROM xy)
    , img_blocks AS (SELECT media_id, by, bx, SUM(rgb) AS s
                     FROM px GROUP BY media_id, by, bx)
    , img AS (
        SELECT b.media_id,
               SUM(b.s) * 1000 // (3 * any_value(p.iw) * any_value(p.ih)) AS level_millis,
               md5(string_agg(b.s::VARCHAR, ',' ORDER BY b.by, b.bx)) AS phash
        FROM img_blocks b JOIN params p USING (media_id)
        GROUP BY b.media_id)
    , ss AS (SELECT media_id, ns, unnest(range(ns)) AS s
             FROM params WHERE kind = 'audio')
    , samp AS (SELECT media_id, ns, (s * 8) // ns AS b,
                      abs((media_id*{_A} + s*{_B} + {_E}) % 4096 - 2048) AS a
               FROM ss)
    , aud_buckets AS (SELECT media_id, b, SUM(a) AS s
                      FROM samp GROUP BY media_id, b)
    , aud AS (
        SELECT u.media_id,
               SUM(u.s) * 1000 // any_value(p.ns) AS level_millis,
               md5(string_agg(u.s::VARCHAR, ',' ORDER BY u.b)) AS phash
        FROM aud_buckets u JOIN params p USING (media_id)
        GROUP BY u.media_id)
    , vf AS (SELECT media_id, nf, unnest(range(nf)) AS f
             FROM params WHERE kind = 'video')
    , vp AS (SELECT media_id, nf, f, unnest(range({VIDEO_W * VIDEO_H})) AS p FROM vf)
    , vframes AS (SELECT media_id, nf, f,
                         SUM((media_id*{_A} + f*{_B} + p*{_C} + {_E}) % 256) AS s
                  FROM vp GROUP BY media_id, nf, f)
    , vid AS (
        SELECT media_id,
               SUM(s) * 1000 // (any_value(nf) * {VIDEO_W * VIDEO_H}) AS level_millis,
               md5(string_agg(s::VARCHAR, ',' ORDER BY f)) AS phash
        FROM vframes GROUP BY media_id)
    SELECT p.media_id,
           p.kind,
           TRUE AS ok,
           CAST(NULL AS VARCHAR) AS error,
           CAST(CASE p.kind WHEN 'image' THEN p.iw
                            WHEN 'video' THEN {VIDEO_W} END AS INTEGER) AS width,
           CAST(CASE p.kind WHEN 'image' THEN p.ih
                            WHEN 'video' THEN {VIDEO_H} END AS INTEGER) AS height,
           CAST(CASE p.kind WHEN 'image' THEN 1
                            WHEN 'video' THEN p.nf END AS INTEGER) AS n_frames,
           CAST(CASE p.kind WHEN 'audio' THEN {SAMPLE_RATE} END AS INTEGER)
             AS sample_rate,
           CAST(COALESCE(img.level_millis, aud.level_millis, vid.level_millis)
             AS BIGINT) AS level_millis,
           COALESCE(img.phash, aud.phash, vid.phash) AS phash
    FROM params p
    LEFT JOIN img USING (media_id)
    LEFT JOIN aud USING (media_id)
    LEFT JOIN vid USING (media_id)
"""
)

SQL_MEDIA_FRAME_SAMPLE = (
    _SQL_PARAMS
    + """
    , fr AS (SELECT media_id, unnest(range(0, nf, 4)) AS frame_idx
             FROM params WHERE kind = 'video')
    SELECT media_id, COUNT(*) AS n_sampled,
           CAST(MAX(frame_idx) AS BIGINT) AS last_frame
    FROM fr GROUP BY media_id
"""
)


QUERIES = {
    "media_features": q_media_features,
    "media_frame_sample": q_media_frame_sample,
}

ORACLES = {
    "media_features": SQL_MEDIA_FEATURES,
    "media_frame_sample": SQL_MEDIA_FRAME_SAMPLE,
}
