"""Structured Streaming front-end for the extraction pipeline.

The reference is strictly batch (SURVEY §2.9), and so is the primary
pipeline here; this module shows the SAME ``mapInPandas`` stage running
incrementally: ``readStream`` over a file/Iceberg-snapshot source →
salted repartition → extraction → ``writeStream`` with a checkpoint.
Spark's streaming checkpoint gives exactly-once file-source progress,
complementing the batch lineage tables (lineage.py) — new transcript
files are picked up incrementally, already-processed files are never
re-extracted.

Stateless stage ⇒ no watermarks/state stores needed; a future
late-data aggregation (e.g. per-conversation rollups) would add
``withWatermark("ts", ...)`` on top of the same plan.
"""

from __future__ import annotations

from libpdf_spark.config import DEFAULT_CONFIG, ExtractConfig

TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def extract_turns_stream(
    spark,
    input_path: str,
    cfg: ExtractConfig = DEFAULT_CONFIG,
):
    """Streaming DataFrame of extraction results over a parquet
    file-source directory (new files = new micro-batches)."""
    from pyspark.sql import functions as F

    from libpdf_spark.pipeline import EXTRACT_SCHEMA, make_extract_batch

    stream = (
        spark.readStream.schema(TRANSCRIPT_DDL)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_path)
        .select("conv_id", "turn_idx", "text", "tool")
    )
    salt = F.pmod(F.hash("turn_idx"), F.lit(cfg.salt_buckets))
    key = F.concat_ws("#", F.col("conv_id"), salt.cast("string"))
    return stream.repartition(key).mapInPandas(
        make_extract_batch(cfg), schema=EXTRACT_SCHEMA
    )


def run_stream_once(
    spark,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    timeout_sec: int = 300,
) -> None:
    """Process everything currently available, exactly once, then stop
    (``Trigger.AvailableNow``). Re-invoking with the same checkpoint
    processes ONLY files that arrived since — incremental resume."""
    q = (
        extract_turns_stream(spark, input_path, cfg)
        .writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    if q.isActive:
        q.stop()
        raise TimeoutError("streaming extraction did not drain in time")
