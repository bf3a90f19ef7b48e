"""Shared helpers for the operator surface."""

from __future__ import annotations


def load(spark, sf_dir: str, name: str):
    """Columnar scan of one testdata table. Catalyst handles predicate
    pushdown + column pruning on top of this."""
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
