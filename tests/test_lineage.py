"""Resumable-run tests: interrupt after one chunk, resume, verify
exact completion with no duplicates (north-rule checkpoint semantics)."""

from __future__ import annotations

import shutil

import pytest

from libpdf_spark.config import ExtractConfig
from libpdf_spark.fixtures import gen_transcripts
from libpdf_spark.lineage import completed_buckets, read_lineage, run_resumable

OUT = "/tmp/libpdf_spark_test_lineage"


@pytest.fixture()
def corpus_df(spark):
    transcripts, expected_text, _ = gen_transcripts(n_convs=10, seed=11)
    return spark.createDataFrame(transcripts), transcripts, expected_text


def test_interrupt_and_resume(spark, corpus_df):
    df, transcripts, expected_text = corpus_df
    shutil.rmtree(OUT, ignore_errors=True)
    cfg = ExtractConfig()

    # first invocation commits only ONE chunk (simulated kill)
    r1 = run_resumable(spark, df, OUT, cfg, n_buckets=8, chunk_size=2, max_chunks=1)
    assert len(r1["committed_chunks"]) == 1
    assert r1["remaining"]
    done1 = completed_buckets(spark, OUT)
    assert done1 == set(r1["committed_chunks"][0])

    # partial data on disk covers exactly the committed NON-EMPTY
    # buckets (a bucket no conv_id hashes to is "done" with no data)
    from pyspark.sql import functions as F

    nonempty = {
        r.b
        for r in df.select(F.pmod(F.hash("conv_id"), F.lit(8)).alias("b"))
        .distinct()
        .collect()
    }
    partial = spark.read.parquet(f"{OUT}/data")
    got_buckets = set(r.bucket for r in partial.select("bucket").distinct().collect())
    assert got_buckets == done1 & nonempty

    # resume completes the rest without touching committed buckets
    r2 = run_resumable(spark, df, OUT, cfg, n_buckets=8, chunk_size=2)
    assert set(b for ch in r2["committed_chunks"] for b in ch) == set(r1["remaining"])
    assert completed_buckets(spark, OUT) == set(range(8))

    # full output: exactly one row per input turn, no duplicates
    out = spark.read.parquet(f"{OUT}/data")
    assert out.count() == len(transcripts)
    assert out.select("conv_id", "turn_idx").distinct().count() == len(transcripts)

    # per-turn text equality still holds end-to-end through resume
    got = (
        out.filter("parse_ok")
        .select("conv_id", "turn_idx", "extracted_text")
        .toPandas()
    )
    merged = got.merge(expected_text, on=["conv_id", "turn_idx"])
    assert len(merged) == len(expected_text)
    assert (merged.extracted_text_x == merged.extracted_text_y).all()

    # lineage metrics reconcile with the data
    lin = read_lineage(spark, OUT).toPandas()
    assert lin.status.eq("done").all()
    assert lin.n_turns.sum() == len(transcripts)
    assert lin.n_parse_failures.sum() == 0

    # idempotence: a third run has nothing to do
    r3 = run_resumable(spark, df, OUT, cfg, n_buckets=8, chunk_size=2)
    assert r3["committed_chunks"] == []
    assert spark.read.parquet(f"{OUT}/data").count() == len(transcripts)
