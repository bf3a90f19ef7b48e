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


def test_watermarked_window_metrics_drop_late_rows(spark):
    """Append-mode watermark semantics across availableNow re-runs:
    windows emit once when the watermark passes their end; rows later
    than the allowance are dropped, never counted."""
    import pandas as pd

    base = "/tmp/libpdf_spark_test_wm"
    shutil.rmtree(base, ignore_errors=True)
    from libpdf_spark.streaming import run_windowed_metrics_once

    def turns(rows):
        return pd.DataFrame(
            {
                "conv_id": [r[0] for r in rows],
                "turn_idx": pd.array(range(len(rows)), dtype="int32"),
                "role": [r[2] for r in rows],
                "text": ["x" * 10] * len(rows),
                "tool": [None] * len(rows),
                "ts": pd.to_datetime([r[1] for r in rows]),
            }
        )

    # batch 1: events 10:00-10:05 (window 10:00) + one at 12:00 —
    # max ts 12:00 → checkpointed watermark 11:30 after this trigger
    b1 = turns(
        [
            ("c1", "2026-01-01 10:00", "user"),
            ("c1", "2026-01-01 10:04", "user"),
            ("c1", "2026-01-01 12:00", "tool"),
        ]
    )
    # ONE file per arrival → one micro-batch per run (multiple files
    # would advance the watermark between intra-run micro-batches)
    spark.createDataFrame(b1).coalesce(1).write.mode("overwrite").parquet(f"{base}/in")
    run_windowed_metrics_once(spark, f"{base}/in", f"{base}/out", f"{base}/ckpt")
    # availableNow ends with a no-data flush batch: the watermark has
    # advanced to 11:30 (max 12:00 - 30 min), so the 10:00 window is
    # already closed and emitted; 12:00's own window stays open
    out1 = spark.read.parquet(f"{base}/out").toPandas()
    assert len(out1) == 1
    assert int(out1.turns.iloc[0]) == 2 and out1.role.iloc[0] == "user"

    # batch 2: one LATE row at 10:01 (behind the 11:30 watermark →
    # dropped) and one at 12:45 (advances the
    # watermark to 12:15, past the 12:00 window's end)
    b2 = turns(
        [
            ("c1", "2026-01-01 10:01", "user"),   # too late: dropped
            ("c1", "2026-01-01 12:45", "tool"),
        ]
    )
    spark.createDataFrame(b2).coalesce(1).write.mode("append").parquet(f"{base}/in")
    run_windowed_metrics_once(spark, f"{base}/in", f"{base}/out", f"{base}/ckpt")
    out2 = (
        spark.read.parquet(f"{base}/out")
        .toPandas()
        .sort_values("win_start")
        .reset_index(drop=True)
    )
    # the 10:00 window keeps the ORIGINAL 2 user turns only — the late
    # 10:01 row was dropped by the watermark, and an already-emitted
    # window is never re-emitted in append mode
    w10 = out2[out2.win_start == pd.Timestamp("2026-01-01 10:00")]
    assert len(w10) == 1
    assert int(w10.turns.iloc[0]) == 2
    assert w10.role.iloc[0] == "user"
    # the 12:00 window closed in run 2 (watermark reached 12:00)
    w12 = out2[out2.win_start == pd.Timestamp("2026-01-01 12:00")]
    assert len(w12) == 1 and int(w12.turns.iloc[0]) == 1
    assert w12.role.iloc[0] == "tool"
    # nothing else emitted; the late event is counted nowhere
    assert len(out2) == 2


def test_stateful_conversation_totals_survive_restart(spark):
    """applyInPandasWithState: per-conversation running totals persist
    in the state store across availableNow invocations."""
    base = "/tmp/libpdf_spark_test_state"
    shutil.rmtree(base, ignore_errors=True)
    from libpdf_spark.streaming import run_state_stream_once

    t, _, _ = gen_transcripts(n_convs=4, seed=33)
    convs = sorted(t.conv_id.unique())
    first = t[t.conv_id.isin(convs[:2])]
    spark.createDataFrame(first).write.mode("overwrite").parquet(f"{base}/in")
    run_state_stream_once(spark, f"{base}/in", f"{base}/out", f"{base}/ckpt")
    out1 = spark.read.parquet(f"{base}/out").toPandas()
    assert set(out1.conv_id) == set(convs[:2])
    got1 = dict(zip(out1.conv_id, out1.n_turns))
    exp1 = first.groupby("conv_id").size().to_dict()
    assert got1 == exp1

    # the SAME conversations send more turns; totals must accumulate
    spark.createDataFrame(first).write.mode("append").parquet(f"{base}/in")
    run_state_stream_once(spark, f"{base}/in", f"{base}/out", f"{base}/ckpt")
    out2 = spark.read.parquet(f"{base}/out").toPandas()
    latest = out2.sort_values("n_turns").groupby("conv_id").last()
    for conv, n in exp1.items():
        assert int(latest.loc[conv, "n_turns"]) == 2 * n       # accumulated
        assert int(latest.loc[conv, "batch_turns"]) == n       # this batch
    # doc-bearing turn counting matches the corpus (doc_every markers)
    n_docs_expected = first.text.str.contains("LIBPDF", regex=False).sum()
    assert int(out1.n_docs.sum()) == n_docs_expected


def test_sessionize_stream_matches_batch(spark, tmp_path):
    """Streaming gap sessionization: intra-batch gaps close sessions
    immediately; open sessions close via the EVENT-TIME state timeout
    once the watermark passes last_event + gap. Closed sessions match
    the batch operator (`q_sessionize`) row-for-row."""
    import pandas as pd

    from libpdf_spark.operators.events import q_sessionize
    from libpdf_spark.streaming import run_sessionize_stream_once

    t0 = pd.Timestamp("2026-01-01 00:00:00")

    def ev(eid, user, minutes):
        return (eid, t0 + pd.Timedelta(minutes=minutes), user, "view",
                1.0, "{}")

    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    # user 1: two clusters separated by 2 h (> 30 min gap) — the first
    # closes INTRA-batch; user 2: one open cluster
    batch1 = pd.DataFrame(
        [ev(0, 1, 0), ev(1, 1, 3), ev(2, 1, 7),
         ev(3, 1, 120), ev(4, 1, 125),
         ev(5, 2, 10), ev(6, 2, 20)],
        columns=cols,
    )
    # batch 2: one far-future event (user 3) drives the watermark past
    # every open session's last + gap → timeouts close users 1 and 2
    batch2 = pd.DataFrame([ev(7, 3, 60 * 24)], columns=cols)

    in_dir, out_dir = tmp_path / "in", tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    sdf1 = spark.createDataFrame(batch1)
    sdf1.write.mode("append").parquet(str(in_dir))
    run_sessionize_stream_once(spark, str(in_dir), str(out_dir), str(ckpt))
    got1 = (
        spark.read.parquet(str(out_dir)).toPandas()
        .sort_values("user_id").reset_index(drop=True)
    )
    # two closes in run 1: user 1's first cluster INTRA-batch, and
    # user 2 via TIMEOUT (the availableNow run's final batch sees the
    # watermark at max_ts − 1 h = t0+65 min, past user 2's
    # last + gap = t0+50 min). User 1's second cluster (last t0+125)
    # stays open.
    assert len(got1) == 2
    assert got1.iloc[0].user_id == 1 and got1.iloc[0].n_events == 3
    assert got1.iloc[1].user_id == 2 and got1.iloc[1].n_events == 2

    spark.createDataFrame(batch2).write.mode("append").parquet(str(in_dir))
    run_sessionize_stream_once(spark, str(in_dir), str(out_dir), str(ckpt))
    got = (
        spark.read.parquet(str(out_dir)).toPandas()
        .sort_values(["user_id", "start_us"]).reset_index(drop=True)
    )
    # batch parity on the CLOSED sessions (user 3 is still open)
    sf_dir = tmp_path / "static"
    sf_dir.mkdir()
    pd.concat([batch1, batch2]).pipe(spark.createDataFrame) \
        .write.mode("overwrite").parquet(str(sf_dir / "events.parquet"))
    exp = (
        q_sessionize(spark, str(sf_dir)).toPandas()
        .sort_values(["user_id", "session_idx"]).reset_index(drop=True)
    )
    exp_closed = exp[exp.user_id.isin([1, 2])]
    assert len(got) == len(exp_closed) == 3
    merged = got.merge(
        exp_closed, left_on=["user_id", "start_us"],
        right_on=["user_id", "start_us"], suffixes=("_s", "_b"),
    )
    assert len(merged) == 3
    assert (merged.end_us_s == merged.end_us_b).all()
    assert (merged.n_events_s == merged.n_events_b).all()
