"""rel.binned_cum_weights — the distributed exclusive-cumulative
machinery ks_value_drift and mann_whitney_u ride (VERDICT r4 item 5).
Exactness must hold for ANY split quality because ties bin together by
value comparison; these tests pin that against brute-force references.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from finance_data_pipeline_spark.operators import relational as rel


def _brute_lt(rows, weight_idx):
    """{value: total weight over strictly smaller values}."""
    out = {}
    for v, *_ in rows:
        out[v] = sum(r[weight_idx] for r in rows if r[0] < v)
    return out


def test_binned_cum_matches_bruteforce_with_ties(spark):
    rng = random.Random(7)
    # heavy ties: 400 rows over 25 distinct values, two weight columns
    raw = [(rng.randint(0, 24), rng.randint(0, 1)) for _ in range(400)]
    agg = {}
    for v, a in raw:
        cnt, na = agg.get(v, (0, 0))
        agg[v] = (cnt + 1, na + a)
    rows = [(float(v), cnt, na) for v, (cnt, na) in agg.items()]
    g = spark.createDataFrame(rows, "value double, cnt long, na long")
    got = {
        r.value: (r.cnt_lt, r.na_lt)
        for r in rel.binned_cum_weights(g, "value", ["cnt", "na"], bins=4).collect()
    }
    ref_cnt = _brute_lt(rows, 1)
    ref_na = _brute_lt(rows, 2)
    assert got == {v: (ref_cnt[v], ref_na[v]) for v, *_ in rows}


def test_binned_cum_single_distinct_value(spark):
    g = spark.createDataFrame([(5.0, 17, 9)], "value double, cnt long, na long")
    [r] = rel.binned_cum_weights(g, "value", ["cnt"], bins=8).collect()
    assert r.cnt_lt == 0 and r.cnt == 17


def test_binned_cum_empty(spark):
    g = spark.createDataFrame([], "value double, cnt long")
    assert rel.binned_cum_weights(g, "value", ["cnt"], bins=8).count() == 0


def test_binned_cum_null_values_excluded(spark):
    """NULL value rows are filtered up front (ADVICE r5): before the
    fix, the NULL row's weights sorted NULLS-FIRST into the offsets
    window — (NULL,5),(1.0,3),(2.0,4) yielded cnt_lt 5 and 8 instead
    of 0 and 3 — and the NULL row itself vanished at the _bin join."""
    g = spark.createDataFrame(
        [(None, 5), (1.0, 3), (2.0, 4)], "value double, cnt long"
    )
    got = {
        r.value: r.cnt_lt
        for r in rel.binned_cum_weights(g, "value", ["cnt"], bins=4).collect()
    }
    assert got == {1.0: 0, 2.0: 3}


def test_global_rank_null_values_excluded(spark):
    """Same NULL contract for global_rank: NULLs are excluded, ranks
    over the non-NULL domain are unaffected by their presence."""
    df = spark.createDataFrame(
        [(1, None), (2, 10.0), (3, 5.0), (4, 10.0)], "pid int, v double"
    )
    got = {r.pid: r.rank for r in rel.global_rank(df, "v", ["pid"], bins=4).collect()}
    assert got == {3: 1, 2: 2, 4: 2}


def test_binned_cum_plan_windows_partition_by_bin(spark):
    """The value-grain window must partition by _bin; the only
    unpartitioned window runs over the ≤ bins-row offsets frame."""
    g = spark.range(500).select(
        (F.col("id") % 97).cast("double").alias("value"),
        F.lit(1).alias("cnt"),
    ).groupBy("value").agg(F.sum("cnt").alias("cnt"))
    out = rel.binned_cum_weights(g, "value", ["cnt"], bins=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    specs = [
        seg
        for seg in plan.split("windowspecdefinition(")[1:]
        if "value#" in seg.split(")")[0]
    ]
    assert specs, plan
    assert all("_bin" in seg.split(")")[0] for seg in specs), plan


def test_midrank_identity_from_cum(spark):
    """midrank = cnt_lt + (cnt+1)/2 equals the classic window midrank
    (rank + (ties-1)/2) on raw rows — the identity mann_whitney_u uses."""
    from pyspark.sql import Window

    rng = random.Random(3)
    raw = [(rng.randint(0, 9),) for _ in range(150)]
    df = spark.createDataFrame(raw, "v long")
    ref = {
        r.v: r.mr
        for r in df.select(
            "v",
            (
                F.rank().over(Window.orderBy("v"))
                + (F.count("*").over(Window.partitionBy("v")) - 1) / 2.0
            ).alias("mr"),
        )
        .distinct()
        .collect()
    }
    g = df.groupBy(F.col("v").cast("double").alias("value")).agg(
        F.count("*").alias("cnt")
    )
    got = {
        int(r.value): r.cnt_lt + (r.cnt + 1) / 2.0
        for r in rel.binned_cum_weights(g, "value", ["cnt"], bins=4).collect()
    }
    assert got == ref
