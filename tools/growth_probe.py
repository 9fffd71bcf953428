#!/usr/bin/env python
"""Empirical scale-growth probe: sf0.1 -> ~sf1 (10x) runtime factors.

tools/scale_check.py covers sf0.001->0.1 on the driver corpora; this
probe extends the scaling evidence one more decade using the
deterministic 10x upsample from tools/sf_upsample.py (key-consistent
replicas, near-dup structure kept linear). For every headline bench
query it reports min-of-2 wall time at both SFs and the growth factor.

Interpretation: data grows 10x, so a scale-correct plan should grow
<= ~10x once out of the fixed-overhead regime — and usually less,
because the sf0.1 timing still amortizes scheduling/codegen overhead.
A factor meaningfully above 10 means superlinear work (pair blowup,
quadratic verify, oracle-style re-evaluation) and is flagged:

    factor <= 12   ok
    12 < f <= 20   WATCH (superlinear, adjudicate)
    f > 20         RED  (scale hazard)

Usage:
    python tools/growth_probe.py [query ...]        # default: bench HEADLINE
Writes GROWTH_PROBE.json next to the repo root (committed record).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_DIR = os.environ.get("GROWTH_BASE_DIR", "/root/testdata/sf0.1")
BIG_DIR = os.environ.get("GROWTH_BIG_DIR", os.path.join(REPO, ".probe_data", "sf1"))
WARM_DIR = "/root/testdata/sf0.001"


def _time_query(fn, spark, sf_dir: str, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    from bench import HEADLINE
    from finance_data_pipeline_spark.registry import QUERIES
    from finance_data_pipeline_spark.session import get_spark

    names = sys.argv[1:] or list(HEADLINE)
    spark = get_spark(app_name="growth-probe")
    spark.sparkContext.setLogLevel("ERROR")

    for name in names:  # codegen warm-up; best effort
        try:
            QUERIES[name](spark, WARM_DIR).write.format("noop").mode("overwrite").save()
        except Exception:
            pass

    rows = []
    for name in names:
        fn = QUERIES[name]
        t_base = _time_query(fn, spark, BASE_DIR)
        t_big = _time_query(fn, spark, BIG_DIR)
        factor = t_big / t_base if t_base > 0 else float("inf")
        status = "ok" if factor <= 12 else ("WATCH" if factor <= 20 else "RED")
        rows.append(
            {
                "query": name,
                "sf0.1_s": round(t_base, 3),
                "sf1_s": round(t_big, 3),
                "factor": round(factor, 2),
                "status": status,
            }
        )
        print(
            f"{name:32s} {t_base:8.3f}s {t_big:9.3f}s  x{factor:6.2f}  {status}",
            flush=True,
        )

    out = {
        "base_dir": BASE_DIR,
        "big_dir": BIG_DIR,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "results": rows,
        "flagged": [r["query"] for r in rows if r["status"] != "ok"],
        "total_base_s": round(sum(r["sf0.1_s"] for r in rows), 1),
        "total_big_s": round(sum(r["sf1_s"] for r in rows), 1),
    }
    path = os.path.join(REPO, "GROWTH_PROBE.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"\nwritten {path}; flagged: {out['flagged'] or 'none'}")
    spark.stop()


if __name__ == "__main__":
    main()
