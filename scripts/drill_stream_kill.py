"""Streaming kill-resume drill (VERDICT r6 ask #5).

`sessionize_stream`'s checkpoint recovery has only ever been exercised
by clean availableNow restarts; this drill kills the driver with
SIGKILL **mid-drain** (after the first micro-batch commits, while a
later one is in flight), restarts from the same checkpoint, and
asserts exactly-once session output:

* zero duplicate (user_id, start_us) sessions,
* zero lost sessions — row-for-row parity with the batch operator
  `q_sessionize` on the same input (modulo the far-future watermark
  driver event's own still-open session).

The output directory is read THROUGH Spark so the FileStreamSink's
`_spark_metadata` manifest filters any orphaned part-files from the
killed batch — that manifest + the checkpoint's offset/commit pair is
exactly Spark's exactly-once story, and this drill is its witness.

Run: python scripts/drill_stream_kill.py [kill_count]
Prints one JSON line; a drill log lives in BENCH/BASELINE.md.
"""
from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/dev/shm/libpdf_spark_stream_drill"

CHILD = """
import sys
sys.path.insert(0, {repo!r})
from bench import make_session
from libpdf_spark.streaming import run_sessionize_stream_once
spark = make_session(8)
run_sessionize_stream_once(spark, {inp!r}, {out!r}, {ckpt!r})
spark.stop()
print("DRAINED")
"""


def prepare_input(spark, in_dir: str) -> int:
    """sf events as 64 TIME-ORDERED files (=> 5 availableNow
    micro-batches at maxFilesPerTrigger=16; FileStreamSource orders by
    mtime then path, so each file gets an increasing mtime) plus one
    far-future watermark-driver event that closes every real session
    via the event-time timeout. Time-ordered arrival is the realistic
    stream shape — a hash-scattered file order would interleave whole
    months across batches, which no finite-state sessionizer (Spark's
    or otherwise) can reconcile with batch output."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = (
        spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
        .toPandas()
        .sort_values(["ts", "event_id"])
        .reset_index(drop=True)
    )
    os.makedirs(in_dir, exist_ok=True)
    n = len(pdf)
    chunks = 64
    base = time.time() - 1000
    # microsecond, tz-naive timestamps => parquet TIMESTAMP_NTZ(us),
    # matching the streaming schema (pandas' default ns precision
    # reads back as a bare INT64 mismatch)
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )

    def write(frame: pd.DataFrame, idx: int) -> None:
        p = os.path.join(in_dir, f"part-{idx:03d}.parquet")
        pq.write_table(
            pa.Table.from_pandas(frame, schema=schema, preserve_index=False),
            p,
        )
        os.utime(p, (base + idx, base + idx))

    for i in range(chunks):
        lo, hi = i * n // chunks, (i + 1) * n // chunks
        write(pdf.iloc[lo:hi], i)
    driver = pd.DataFrame(
        {
            "event_id": [int(pdf.event_id.max()) + 1],
            "ts": [pdf.ts.max() + pd.Timedelta(days=30)],
            "user_id": [-1],
            "event_type": ["view"],
            "value": [1.0],
            "props": ["{}"],
        }
    )
    write(driver, chunks)
    return n + 1


def run_child(inp: str, out: str, ckpt: str, tag: str = "x") -> subprocess.Popen:
    code = CHILD.format(repo=REPO, inp=inp, out=out, ckpt=ckpt)
    err = open(os.path.join(WORK, f"child_{tag}.err"), "wb")
    return subprocess.Popen(
        [sys.executable, "-c", code],
        stdout=subprocess.PIPE,
        stderr=err,
        start_new_session=True,  # own process group: SIGKILL gets JVM too
    )


def kill_after_first_commit(proc: subprocess.Popen, ckpt: str,
                            grace: float) -> bool:
    """Wait for the checkpoint's first batch COMMIT, then `grace`
    seconds into the next in-flight batch, then SIGKILL the group.
    Returns False if the child drained before the kill landed."""
    commits = os.path.join(ckpt, "commits", "0")
    deadline = time.time() + 300
    while time.time() < deadline:
        if proc.poll() is not None:
            return False  # drained before we could kill
        if os.path.exists(commits):
            time.sleep(grace)
            if proc.poll() is not None:
                return False
            os.killpg(proc.pid, signal.SIGKILL)
            proc.wait()
            return True
        time.sleep(0.05)
    raise TimeoutError("first commit never appeared")


def main() -> dict:
    kill_count = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    shutil.rmtree(WORK, ignore_errors=True)
    in_dir = os.path.join(WORK, "events_in")
    out = os.path.join(WORK, "sessions_out")
    ckpt = os.path.join(WORK, "ckpt")

    from bench import make_session

    spark = make_session(8)
    n_events = prepare_input(spark, in_dir)

    kills = 0
    for k in range(kill_count):
        proc = run_child(in_dir, out, ckpt, tag=f"kill{k}")
        # stagger the grace so successive kills land in different
        # batches of the drain
        killed = kill_after_first_commit(proc, ckpt, grace=1.5 + 2.0 * k)
        if not killed:
            break
        kills += 1
        # a killed run may leave batch N committed in offsets/ but not
        # commits/ — the restart must reconcile that, which is the
        # point of the drill
    # final clean run to completion
    proc = run_child(in_dir, out, ckpt, tag="final")
    out_txt, _ = proc.communicate(timeout=600)
    assert proc.returncode == 0 and b"DRAINED" in out_txt, out_txt

    # read the sink THROUGH Spark (honors _spark_metadata)
    got = (
        spark.read.parquet(out)
        .toPandas()
        .sort_values(["user_id", "start_us"])
        .reset_index(drop=True)
    )
    dup = got.groupby(["user_id", "start_us"]).size()
    n_dup = int((dup > 1).sum())

    from libpdf_spark.operators.events import q_sessionize

    # batch parity: q_sessionize reads {dir}/events.parquet — stage a
    # dir with that layout pointing at the same rows
    batch_dir = os.path.join(WORK, "batch_in")
    os.makedirs(batch_dir, exist_ok=True)
    link = os.path.join(batch_dir, "events.parquet")
    if not os.path.exists(link):
        os.symlink(in_dir, link)
    exp = (
        q_sessionize(spark, batch_dir)
        .where("user_id >= 0")  # the watermark driver stays open
        .toPandas()
        .sort_values(["user_id", "start_us"])
        .reset_index(drop=True)
    )
    cols = ["user_id", "start_us", "end_us", "n_events"]
    parity = got[cols].reset_index(drop=True).equals(
        exp[cols].reset_index(drop=True)
    )
    result = {
        "metric": "stream_kill_resume_drill",
        "events": n_events,
        "kills_delivered": kills,
        "sessions_streamed": len(got),
        "sessions_batch": len(exp),
        "duplicate_sessions": n_dup,
        "batch_parity": bool(parity),
        "ok": bool(parity and n_dup == 0 and kills == kill_count),
    }
    spark.stop()
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    r = main()
    sys.exit(0 if r["ok"] else 1)
