"""Bucketed co-located joins: pre-bucketing a table on the join key
removes the shuffle from every later equi-join on that key — the
standard layout contract for repeated corpus-scale joins (dedup
verdicts ⋈ documents, clusters ⋈ documents, …)."""

from __future__ import annotations

import shutil

import pytest

WAREHOUSE = "/tmp/libpdf_spark_test_warehouse"


@pytest.fixture(scope="module")
def bucketed(spark):
    # warehouse.dir is static config — use the shared session's default
    spark.sql("DROP TABLE IF EXISTS docs_bucketed")
    spark.sql("DROP TABLE IF EXISTS verdicts_bucketed")
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    (
        docs.write.mode("overwrite")
        .bucketBy(8, "doc_id")
        .sortBy("doc_id")
        .saveAsTable("docs_bucketed")
    )
    from libpdf_spark.operators.textops import QUERIES

    verdicts = QUERIES["corpus_filter"](spark, "/root/testdata/sf0.01")
    (
        verdicts.write.mode("overwrite")
        .bucketBy(8, "doc_id")
        .sortBy("doc_id")
        .saveAsTable("verdicts_bucketed")
    )
    yield spark
    spark.sql("DROP TABLE IF EXISTS docs_bucketed")
    spark.sql("DROP TABLE IF EXISTS verdicts_bucketed")
    shutil.rmtree("/root/repo/spark-warehouse", ignore_errors=True)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(bucketed):
    spark = bucketed
    # disable broadcast so the planner must consider co-location (at
    # corpus scale neither side broadcasts anyway)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.sql(
            """
            SELECT d.doc_id, v.keep
            FROM docs_bucketed d JOIN verdicts_bucketed v USING (doc_id)
            """
        )
        plan = _plan(joined)
        # co-located: both sides read pre-bucketed files — the join
        # needs NO shuffle Exchange on either side
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        assert joined.count() == 500
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_unbucketed_same_join_shuffles(bucketed):
    # the control: the identical join over plain parquet DOES shuffle
    spark = bucketed
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    from libpdf_spark.operators.textops import QUERIES

    verdicts = QUERIES["corpus_filter"](spark, "/root/testdata/sf0.01")
    import pyspark.sql.functions as F

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = docs.select("doc_id").join(verdicts, "doc_id")
        assert "Exchange hashpartitioning(doc_id" in _plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
