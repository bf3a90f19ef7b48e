"""DataFrame-tier operator surface (SURVEY.md §2 [D] column).

Each operator exists twice:
* a Spark DataFrame implementation ``(spark, sf_dir) -> DataFrame``;
* an ANSI-SQL oracle string for DuckDB over the same parquet tables.

Both alias every computed column identically — the driver's
correctness gate hashes values after sorting columns by name.
"""

from libpdf_spark.operators import (
    dedup,
    events,
    extraction,
    multimodal,
    relational,
    scalarfn,
    similarity,
    textops,
)

_MODULES = (
    relational, scalarfn, events, dedup, similarity, textops,
    multimodal, extraction,
)


def all_queries():
    out = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return out


def all_oracles():
    out = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return out
