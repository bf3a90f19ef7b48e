#!/usr/bin/env python
"""Extra benchmarks for optimization work (guide §1.4): per-query
noop-sink isolation, plan capture, and quick A/B timing.

NOT part of the driver contract — ``bench.py`` stays the frozen
measurement harness. This file exists so optimization rounds can
measure single queries without paying the full suite, and so
``.explain("formatted")`` plans land in ``plans/<round>/``.

Usage:
    python bench_extra.py [query ...]        # time listed (default: all headline)
    python bench_extra.py --plans DIR [q ..] # also dump explain() to DIR
    python bench_extra.py --trials N
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import bench  # reuse the frozen harness's session + corpus builders

SF_DIR = bench.SF_DIR


def main():
    args = [a for a in sys.argv[1:]]
    trials = 3
    plans_dir = None
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--trials":
            trials = int(args[i + 1]); i += 2
        elif args[i] == "--plans":
            plans_dir = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    if not names:
        names = [n for n in bench.HEADLINE]
    spark = bench.make_session(bench.CPUS)
    out: dict[str, list] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        df = qs[name](spark, SF_DIR)
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            with open(os.path.join(plans_dir, f"{name}.txt"), "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                ))
        df.write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        ts = []
        for t in range(trials):
            spark.sparkContext.setJobDescription(f"trial{t}:{name}")
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            ts.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        out[name] = ts
        print(json.dumps({"query": name, "min": min(ts), "trials": ts,
                          "sf": SF_DIR}), flush=True)
    print(json.dumps({"summary": {n: min(t) for n, t in out.items()},
                      "sf": SF_DIR}))
    spark.stop()


if __name__ == "__main__":
    main()
