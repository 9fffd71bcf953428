#!/usr/bin/env python
"""Scaling evidence: time representative queries at sf0.001 / 0.01 / 0.1
and print per-query wall time plus the 0.01→0.1 growth factor (data
grows 10×; a scale-correct plan should grow ≤ ~10× once out of the
fixed-overhead regime — most queries at these sizes are still
scheduling-bound, so factors well under 10 are expected).

Usage: python tools/scale_check.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "pricing_summary",
    "near_dup_pairs",
    "string_sim_join",
    "semantic_dedup",
    "kmeans_clusters",
    "unigram_logprob",
    "remove_dup_spans",
    "exact_dedup",
    "asof_join_events_bars",
    "session_windows",
]

SFS = ["0.001", "0.01", "0.1"]


def main() -> None:
    from finance_data_pipeline_spark.registry import QUERIES
    from finance_data_pipeline_spark.session import get_spark

    names = sys.argv[1:] or DEFAULT
    spark = get_spark(app_name="scale-check")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm plans at the smallest SF so timings compare plan cost, not javac.
    for name in names:
        QUERIES[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()

    print(f"| query | {' | '.join('sf' + s for s in SFS)} | 0.01→0.1 factor |")
    print("|---|" + "---|" * (len(SFS) + 1))
    for name in names:
        times = []
        for sf in SFS:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                QUERIES[name](spark, f"/root/testdata/sf{sf}").write.format(
                    "noop"
                ).mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            times.append(best)
        factor = times[-1] / times[-2] if times[-2] > 0 else float("nan")
        cells = " | ".join(f"{t:.2f}s" for t in times)
        print(f"| {name} | {cells} | {factor:.1f}× |")


if __name__ == "__main__":
    main()
