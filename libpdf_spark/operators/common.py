"""Shared helpers for the operator surface."""

from __future__ import annotations


def load(spark, sf_dir: str, name: str):
    """Columnar scan of one testdata table. Catalyst handles predicate
    pushdown + column pruning on top of this."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
