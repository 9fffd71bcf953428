#!/usr/bin/env python
"""Mechanical bench regression gate (BENCH_NOTES.md endgame plan §3).

Compares the newest bench record against the best per-query minimum
ever recorded, across every parseable BENCH_r*.json (driver rounds)
and BENCH_SPREAD_r*.json (builder/driver spread side files):

  - a QUERY regresses if its latest min exceeds 1.25x its best
    recorded min AND the absolute delta exceeds 0.3 s (the AND filters
    scheduling noise on sub-second queries);
  - the HEADLINE total regresses at >1.10x of the best recorded total.

Exit code 1 on any breach, with one line per breach naming the query,
the ratio, and both values — the adjudication protocol (idle-host
min-of-3 re-anchor, then a BENCH_NOTES line) lives in BENCH_NOTES.md.

Usage:
  python tools/bench_regress.py              # newest record vs history
  python tools/bench_regress.py FILE.json    # a specific record vs history
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RATIO_GATE = 1.25
ABS_GATE = 0.3
TOTAL_GATE = 1.10


def _round_of(path: str) -> int:
    m = re.search(r"_r(\d+)\.json$", path)
    return int(m.group(1)) if m else -1


def _load_records() -> list[tuple[int, str, dict[str, float]]]:
    """(round, path, {query: min sec}) for every parseable record."""
    out = []
    for path in glob.glob(os.path.join(REPO, "BENCH_r*.json")):
        try:
            doc = json.load(open(path))
        except Exception:
            continue
        parsed = doc.get("parsed")
        if parsed and parsed.get("queries"):
            out.append((_round_of(path), path, dict(parsed["queries"])))
    for path in glob.glob(os.path.join(REPO, "BENCH_SPREAD_r*.json")):
        try:
            doc = json.load(open(path))
        except Exception:
            continue
        spread = doc.get("spread")
        if spread and doc.get("sf") == 0.1:  # headline SF only
            out.append(
                (_round_of(path), path, {q: v["min"] for q, v in spread.items()})
            )
    return sorted(out)


def main() -> int:
    records = _load_records()
    if len(records) < 2:
        print(f"need >= 2 parseable bench records, found {len(records)}")
        return 0
    if len(sys.argv) > 1:
        latest = next((r for r in records if r[1].endswith(sys.argv[1])), None)
        if latest is None:
            print(f"{sys.argv[1]} not found among parseable records")
            return 1
    else:
        latest = records[-1]
    # A round emits TWO records of the same run (BENCH_rN and
    # BENCH_SPREAD_rN share mins), so history must be per-ROUND, not
    # per-file: dropping only the latest PATH leaves its paired file in
    # the baseline (the run gates against itself) and each prior round
    # eats two of the three slots (ADVICE r6). Collapse to one
    # {query: min} per round, excluding the latest's whole round.
    by_round: dict[int, dict[str, float]] = {}
    for rnd, path, queries in records:
        if rnd == latest[0] or path == latest[1]:
            continue
        slot = by_round.setdefault(rnd, {})
        for q, v in queries.items():
            slot[q] = min(v, slot.get(q, v))
    history = [(rnd, f"round {rnd}", qs) for rnd, qs in sorted(by_round.items())]
    # Per-query baseline = best of the LAST 3 ROUNDS with the
    # IDENTICAL query set: the headline set and warm-up protocol
    # evolved together across early rounds (r1-r3 were smaller sets
    # under a pre-warm-up protocol), so cross-set comparisons flag
    # permanent residue, not regressions (BENCH_NOTES r5/r6
    # adjudications). When the set just changed there is no same-set
    # history yet — fall back to any round containing the query so a
    # fresh set still gets a (soft) gate. Totals compare only against
    # identical-set rounds (a 20-query round's total says nothing
    # about a 52-query one).
    same_set_history = [r for r in history if set(r[2]) == set(latest[2])]
    baseline_pool = same_set_history or history
    best: dict[str, float] = {}
    for q in latest[2]:
        recent = [queries[q] for _, _, queries in baseline_pool if q in queries][-3:]
        if recent:
            best[q] = min(recent)
    same_set_totals = [sum(queries.values()) for _, _, queries in same_set_history]
    best_total = min(same_set_totals) if same_set_totals else None

    breaches = []
    for q, v in latest[2].items():
        if q not in best:
            continue  # new headline query: no history yet
        if v > best[q] * RATIO_GATE and v - best[q] > ABS_GATE:
            breaches.append(
                f"QUERY {q}: {v:.3f}s vs best {best[q]:.3f}s "
                f"({v / best[q]:.2f}x, +{v - best[q]:.3f}s)"
            )
    total = sum(latest[2].values())
    if best_total is not None and total > best_total * TOTAL_GATE:
        breaches.append(
            f"TOTAL: {total:.1f}s vs best {best_total:.1f}s "
            f"({total / best_total:.2f}x)"
        )

    src = os.path.basename(latest[1])
    if breaches:
        print(f"{src}: {len(breaches)} regression breach(es)")
        for b in breaches:
            print("  " + b)
        return 1
    total_note = (
        f"total {total:.1f}s <= {TOTAL_GATE}x best ({best_total:.1f}s)"
        if best_total is not None
        else f"total {total:.1f}s (no identical-set history to gate against)"
    )
    print(
        f"{src}: OK — {len(latest[2])} queries within {RATIO_GATE}x/"
        f"+{ABS_GATE}s of recent best; {total_note}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
