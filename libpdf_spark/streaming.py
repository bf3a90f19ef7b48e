"""Structured Streaming front-end for the extraction pipeline.

The reference is strictly batch (SURVEY §2.9), and so is the primary
pipeline here; this module shows the SAME ``mapInPandas`` stage running
incrementally: ``readStream`` over a file/Iceberg-snapshot source →
salted repartition → extraction → ``writeStream`` with a checkpoint.
Spark's streaming checkpoint gives exactly-once file-source progress,
complementing the batch lineage tables (lineage.py) — new transcript
files are picked up incrementally, already-processed files are never
re-extracted.

Round 2 adds the two stateful tiers on top of the stateless stage:

* :func:`windowed_turn_metrics` — event-time tumbling-window rollups
  with ``withWatermark`` late-data semantics (append mode: a window
  emits exactly once, when the watermark passes its end; rows arriving
  later than the watermark allowance are DROPPED, counted never);
* :func:`conversation_state_stream` — a custom stateful operator via
  ``applyInPandasWithState``: per-conversation running totals carried
  in the state store across micro-batches (the GroupState pattern for
  operators Spark's built-ins can't express).
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


def _read_transcript_stream(spark, input_path: str):
    return (
        spark.readStream.schema(TRANSCRIPT_DDL)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_path)
    )


def windowed_turn_metrics(
    stream_df,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
):
    """Event-time tumbling-window turn metrics with late-data handling.

    Append-mode semantics: a (window, role) row is emitted exactly once
    — when the watermark (max event time seen, minus the allowance)
    passes the window end — and any row arriving more than
    ``watermark`` behind the stream's max ``ts`` is dropped before the
    aggregation. The watermark persists in the checkpoint, so
    ``availableNow`` re-runs advance it across invocations.
    """
    from pyspark.sql import functions as F

    return (
        stream_df.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "role")
        .agg(
            F.count("*").alias("turns"),
            F.sum(F.length("text")).alias("bytes_in"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "role", "turns", "bytes_in",
        )
    )


def run_windowed_metrics_once(
    spark,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    timeout_sec: int = 300,
) -> None:
    """Drain currently-available files through the watermarked window
    aggregation (append mode → only CLOSED windows reach the sink)."""
    q = (
        windowed_turn_metrics(
            _read_transcript_stream(spark, input_path), window, watermark
        )
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    if q.isActive:
        q.stop()
        raise TimeoutError("windowed metrics stream did not drain in time")


CONV_STATE_DDL = "n_turns long, n_docs long"
CONV_STATE_OUTPUT_DDL = (
    "conv_id string, n_turns long, n_docs long, batch_turns long"
)


def conversation_state_stream(spark, input_path: str):
    """Custom stateful operator (``applyInPandasWithState``): per-
    conversation running totals (turns seen, document-bearing turns)
    carried in the state store across micro-batches. Each batch emits
    one row per updated conversation with the accumulated totals plus
    this batch's contribution — the pattern for incremental corpus
    statistics that no built-in aggregation expresses (state survives
    restarts via the checkpoint)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from libpdf_spark.payload import DOC_OPEN, PDF_OPEN

    def update_fn(key, pdf_iter, state: GroupState):
        n_turns, n_docs = state.get if state.exists else (0, 0)
        batch_turns = 0
        for pdf in pdf_iter:
            batch_turns += len(pdf)
            for text in pdf["text"]:
                if isinstance(text, str) and (DOC_OPEN in text or PDF_OPEN in text):
                    n_docs += 1
        n_turns += batch_turns
        state.update((n_turns, n_docs))
        yield pd.DataFrame(
            {
                "conv_id": [key[0]],
                "n_turns": [n_turns],
                "n_docs": [n_docs],
                "batch_turns": [batch_turns],
            }
        )

    return (
        _read_transcript_stream(spark, input_path)
        .groupBy("conv_id")
        .applyInPandasWithState(
            update_fn,
            outputStructType=CONV_STATE_OUTPUT_DDL,
            stateStructType=CONV_STATE_DDL,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_state_stream_once(
    spark,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    timeout_sec: int = 300,
) -> None:
    q = (
        conversation_state_stream(spark, input_path)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    if q.isActive:
        q.stop()
        raise TimeoutError("stateful stream did not drain in time")
