"""Streaming extraction: exactly-once over arriving files, incremental
resume via the streaming checkpoint."""

from __future__ import annotations

import shutil

from libpdf_spark.fixtures import gen_transcripts
from libpdf_spark.streaming import run_stream_once

BASE = "/tmp/libpdf_spark_test_stream"


def test_incremental_stream_extraction(spark):
    shutil.rmtree(BASE, ignore_errors=True)
    t, expected_text, _ = gen_transcripts(n_convs=8, seed=21)
    half = len(t) // 2
    df = spark.createDataFrame(t)

    # batch 1: first half of the corpus arrives
    first_convs = sorted(t.conv_id.unique())[:4]
    spark.createDataFrame(t[t.conv_id.isin(first_convs)]).write.mode(
        "overwrite"
    ).parquet(f"{BASE}/in")
    run_stream_once(spark, f"{BASE}/in", f"{BASE}/out", f"{BASE}/ckpt")
    out1 = spark.read.parquet(f"{BASE}/out").toPandas()
    n_first = int(t.conv_id.isin(first_convs).sum())
    assert len(out1) == n_first

    # batch 2: the rest arrives as NEW files; same checkpoint → only
    # the new files are processed (no duplicates)
    spark.createDataFrame(t[~t.conv_id.isin(first_convs)]).write.mode(
        "append"
    ).parquet(f"{BASE}/in")
    run_stream_once(spark, f"{BASE}/in", f"{BASE}/out", f"{BASE}/ckpt")
    out2 = spark.read.parquet(f"{BASE}/out").toPandas()
    assert len(out2) == len(t)
    assert (
        out2.groupby(["conv_id", "turn_idx"]).size().max() == 1
    ), "checkpoint must prevent re-extraction"

    # per-turn text equality holds through the streaming path too
    got = out2[out2.parse_ok][["conv_id", "turn_idx", "extracted_text"]]
    merged = got.merge(expected_text, on=["conv_id", "turn_idx"])
    assert len(merged) == len(expected_text)
    assert (merged.extracted_text_x == merged.extracted_text_y).all()
