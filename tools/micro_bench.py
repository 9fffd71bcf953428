#!/usr/bin/env python
"""Time a subset of registry queries with the bench methodology
(noop sink, min over repeats) without running the whole headline set.

Usage:
  python tools/micro_bench.py [--sf DIR] [--runs N] name1 name2 ...

Prints one line per query: name, min, all runs. The same warm-up
discipline as bench.py (sf0.001 plan compile) keeps numbers comparable
across invocations.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from finance_data_pipeline_spark.registry import QUERIES
    from finance_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="micro-bench")
    spark.sparkContext.setLogLevel("ERROR")

    warm_dir = args.sf.rsplit("sf", 1)[0] + "sf0.001"
    for name in args.names:
        if os.path.isdir(warm_dir):
            try:
                QUERIES[name](spark, warm_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception:
                pass
    results = {}
    for name in args.names:
        spark.sparkContext.setJobDescription(f"micro-bench: {name}")
        runs = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            QUERIES[name](spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.perf_counter() - t0, 3))
        results[name] = runs
        print(f"{name}: min={min(runs)} runs={runs}", flush=True)
    spark.sparkContext.setJobDescription(None)
    total = sum(min(r) for r in results.values())
    print(f"TOTAL(min): {round(total, 3)}")
    spark.stop()


if __name__ == "__main__":
    main()
