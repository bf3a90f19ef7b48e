"""Checkpointed, resumable extraction runs with per-partition lineage.

North-rule requirement: progress tracked per partition with lineage +
metrics tables enabling EXACT resume.

Design (no custom Catalyst work — idempotent partition overwrites):

* the corpus is bucketed by ``pmod(hash(conv_id), n_buckets)``;
* buckets are processed in CHUNKS; each chunk's output lands in
  ``<out>/data/bucket=<k>/`` via dynamic partition overwrite —
  re-running a chunk replaces exactly its partitions (idempotent);
* after each chunk commits, one lineage row per bucket is appended to
  ``<out>/lineage`` with extraction metrics (turns, docs, parse
  failures, elements, bytes) and wall time;
* resume = run again: pending buckets are derived by anti-joining the
  bucket universe against completed lineage rows — a killed run
  restarts at the first uncommitted chunk, never re-doing committed
  work and never producing duplicates.

On Iceberg the same structure maps to ``overwrite ... where bucket=k``
snapshots; parquet dynamic partition overwrite is the sandbox
equivalent.
"""

from __future__ import annotations

import time
import uuid

from libpdf_spark.config import DEFAULT_CONFIG, ExtractConfig

LINEAGE_SCHEMA = (
    "bucket int, status string, run_id string, n_turns bigint, "
    "n_docs bigint, n_parse_failures bigint, n_elements bigint, "
    "bytes_in bigint, wall_sec double, finished_at timestamp"
)


def _lineage_path(output_dir: str) -> str:
    # NOT "_lineage": Spark's file listing treats "_"-prefixed paths as
    # hidden metadata and (inconsistently) ignores them on read
    return f"{output_dir}/lineage"


def _data_path(output_dir: str) -> str:
    return f"{output_dir}/data"


def read_lineage(spark, output_dir: str):
    from pyspark.errors import AnalysisException

    path = _lineage_path(output_dir)
    try:
        # drop any cached file listing — appends from this same session
        # are otherwise intermittently invisible to the next read
        spark.catalog.refreshByPath(path)
        return spark.read.parquet(path)
    except AnalysisException:
        return spark.createDataFrame([], LINEAGE_SCHEMA)


def completed_buckets(spark, output_dir: str) -> set[int]:
    rows = (
        read_lineage(spark, output_dir)
        .filter("status = 'done'")
        .select("bucket")
        .distinct()
        .collect()
    )
    return {r.bucket for r in rows}


def run_resumable(
    spark,
    transcripts,
    output_dir: str,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    n_buckets: int = 16,
    chunk_size: int = 4,
    max_chunks: int | None = None,
) -> dict:
    """Run (or resume) the extraction job over ``transcripts``.

    Returns a summary dict. ``max_chunks`` bounds how many chunks this
    invocation commits (useful to simulate interruption in tests).
    """
    from pyspark.sql import functions as F

    from libpdf_spark.pipeline import extract_turns

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    run_id = uuid.uuid4().hex[:12]

    done = completed_buckets(spark, output_dir)
    pending = [b for b in range(n_buckets) if b not in done]
    chunks = [
        pending[i : i + chunk_size] for i in range(0, len(pending), chunk_size)
    ]
    if max_chunks is not None:
        chunks = chunks[:max_chunks]

    bucketed = transcripts.withColumn(
        "bucket", F.pmod(F.hash("conv_id"), F.lit(n_buckets))
    )

    committed = []
    for chunk in chunks:
        t0 = time.time()
        part = bucketed.filter(F.col("bucket").isin([int(b) for b in chunk]))
        extracted = extract_turns(part, cfg).withColumn(
            "bucket", F.pmod(F.hash("conv_id"), F.lit(n_buckets))
        )
        (
            extracted.repartition("bucket")
            .sortWithinPartitions("conv_id", "turn_idx")  # stable ordering
            .write.partitionBy("bucket")
            .mode("overwrite")
            .parquet(_data_path(output_dir))
        )
        wall = time.time() - t0

        # metrics per bucket from the just-written data (reading back
        # keeps lineage consistent with what is actually on disk)
        spark.catalog.refreshByPath(_data_path(output_dir))
        written = spark.read.parquet(_data_path(output_dir)).filter(
            F.col("bucket").isin([int(b) for b in chunk])
        )
        stats = (
            written.groupBy("bucket")
            .agg(
                F.count("*").alias("n_turns"),
                F.sum(F.col("doc_found").cast("long")).alias("n_docs"),
                F.sum(
                    (F.col("doc_found").cast("long"))
                    - (F.col("parse_ok").cast("long"))
                ).alias("n_parse_failures"),
                F.sum("n_elements").alias("n_elements"),
                F.sum("bytes_in").alias("bytes_in"),
            )
            .withColumn("status", F.lit("done"))
            .withColumn("run_id", F.lit(run_id))
            .withColumn("wall_sec", F.lit(float(wall)))
            .withColumn("finished_at", F.current_timestamp())
        )
        # buckets with zero rows still need a lineage row
        present = {r.bucket for r in stats.select("bucket").collect()}
        empty = [int(b) for b in chunk if b not in present]
        if empty:
            empties = spark.createDataFrame(
                [
                    (b, "done", run_id, 0, 0, 0, 0, 0, float(wall), None)
                    for b in empty
                ],
                LINEAGE_SCHEMA,
            ).withColumn("finished_at", F.current_timestamp())
            stats = stats.unionByName(empties.select(*stats.columns))
        (
            stats.select(
                "bucket", "status", "run_id", "n_turns", "n_docs",
                "n_parse_failures", "n_elements", "bytes_in", "wall_sec",
                "finished_at",
            )
            .write.mode("append")
            .parquet(_lineage_path(output_dir))
        )
        committed.append(chunk)

    done_now = {b for ch in committed for b in ch}
    return {
        "run_id": run_id,
        "committed_chunks": committed,
        "pending_before": pending,
        "remaining": [b for b in pending if b not in done_now],
    }
