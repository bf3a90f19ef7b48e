"""Shared helpers for the operator surface."""

from __future__ import annotations

_EXCLUDED_RULES = "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"


def ensure_session_tuning(spark) -> None:
    """Apply the runtime-settable parts of our session tuning even when
    the caller (e.g. an external driver) built the session without
    ``configure_session``. InferFiltersFromGenerate turns
    ``explode(expensive_expr)`` into a scan filter that re-evaluates
    the generator per input row — a measured 10-60× regression on the
    shingle/minhash pipelines. Idempotent."""
    try:
        current = spark.conf.get("spark.sql.optimizer.excludedRules", "")
    except Exception:  # noqa: BLE001 — conf access is best-effort
        current = ""
    if _EXCLUDED_RULES not in (current or ""):
        merged = f"{current},{_EXCLUDED_RULES}" if current else _EXCLUDED_RULES
        spark.conf.set("spark.sql.optimizer.excludedRules", merged)


def load(spark, sf_dir: str, name: str):
    """Columnar scan of one testdata table. Catalyst handles predicate
    pushdown + column pruning on top of this."""
    ensure_session_tuning(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_parallel(spark, sf_dir: str, name: str, key: str):
    """Scan + ensure the compute that follows parallelizes.

    Small single-file tables arrive as ONE partition (file-split
    granularity), which serializes expression-heavy pipelines
    (shingling, per-token hashing) onto one core. At 100 TB the scan
    has thousands of natural splits and this is a no-op; on small
    inputs we pay one cheap shuffle to fan the compute out.
    """
    df = load(spark, sf_dir, name)
    parallelism = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, parallelism // 2):
        df = df.repartition(parallelism, key)
    return df
