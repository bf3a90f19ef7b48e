"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction pipeline on sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2
(plus the training-data operators); ``oracle_sql()`` gives the DuckDB
equivalent for every SQL-expressible operator. Column names are
aliased identically on both sides (the driver hashes values after
sorting columns by name).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from libpdf_spark.operators import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full layout-extraction pipeline over
    document-bearing transcript turns built from sf0.001 documents."""
    from libpdf_spark.operators.extraction import q_extract_documents

    return q_extract_documents(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
