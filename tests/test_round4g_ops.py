"""Hand-verified semantics for KAMA, L-moments, and session stats."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from finance_data_pipeline_spark import indicators as ind

_SCHEMA = "symbol string, bar_ts long, open double, high double, low double, close double, volume long"


def test_kama_seed_and_recursion(spark):
    """13 bars of a pure +1 trend: ER = 1 (perfectly efficient) so the
    smoothing constant is the fast alpha squared and the recursion
    follows k += sc·(close − k) from the bar-11 seed."""
    rows = [("A", t, 0.0, 0.0, 0.0, 100.0 + t, 1) for t in range(1, 14)]
    b = spark.createDataFrame(
        [(s, int(t), o, h, lo, c, int(v)) for s, t, o, h, lo, c, v in rows], _SCHEMA
    )
    out = {r.bar_ts: r.kama for r in ind.with_kama(b, 10, 2, 30).collect()}
    assert out[10] is None  # warm-up
    assert out[11] == 111.0  # seed = close at bar 11
    # ER=1 → sc = (1·(2/3 − 2/31) + 2/31)² = (2/3)²
    sc = (2.0 / 3.0) ** 2
    k12 = 111.0 + sc * (112.0 - 111.0)
    assert math.isclose(out[12], k12)
    assert math.isclose(out[13], k12 + sc * (113.0 - k12))


def test_kama_flat_window_uses_slow_alpha(spark):
    """A flat stretch (zero quantized volatility) takes ER = 0 → the
    slow constant (2/31)²: KAMA barely moves on the next tick."""
    rows = [("A", t, 0.0, 0.0, 0.0, 100.0, 1) for t in range(1, 13)]
    rows.append(("A", 13, 0.0, 0.0, 0.0, 101.0, 1))
    b = spark.createDataFrame(
        [(s, int(t), o, h, lo, c, int(v)) for s, t, o, h, lo, c, v in rows], _SCHEMA
    )
    out = {r.bar_ts: r.kama for r in ind.with_kama(b, 10, 2, 30).collect()}
    assert out[11] == 100.0 and out[12] == 100.0
    # bar 13: ER = |101−100| / Σ|Δ| = 1 exactly (the only move is the
    # jump itself) → fast response, NOT the flat case
    assert out[13] > 100.0
    # truly flat window at bar 12: delta = 0 → k unchanged via sc·0
    assert math.isclose(out[12], 100.0)


def test_l_moments_uniform_sample(spark):
    """For the sample 1..9: b0 = 5, λ2 via PWM = 5/3, symmetric sample
    ⇒ L-skew = 0."""
    import numpy as np

    x = np.arange(1.0, 10.0)
    n = len(x)
    i = np.arange(1, n + 1)
    b0 = x.mean()
    b1 = (x * ((i - 1) / (n - 1))).sum() / n
    b2 = (x * (((i - 1) / (n - 1)) * ((i - 2) / (n - 2)))).sum() / n
    l2 = 2 * b1 - b0
    l3 = 6 * b2 - 6 * b1 + b0
    assert math.isclose(b0, 5.0)
    assert math.isclose(l2, 5.0 / 3.0)
    assert abs(l3 / l2) < 1e-12  # symmetric ⇒ zero L-skew


def test_session_gap_rule(spark):
    """Three events 10 min apart form one session; a 40-min gap starts
    a second one. Durations are exact integer seconds."""
    rows = [
        (1, "2024-01-01 10:00:00", 1),
        (1, "2024-01-01 10:10:00", 2),
        (1, "2024-01-01 10:20:00", 3),
        (1, "2024-01-01 11:00:00", 4),  # 40-min gap → new session
    ]
    e = spark.createDataFrame(rows, "user_id long, ts string, event_id long").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_id"
    )
    from pyspark.sql import Window

    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(wu)
    g = e.select(
        "user_id", "ts",
        F.when(
            prev.isNull() | (F.unix_timestamp("ts") - F.unix_timestamp(prev) > 1800), 1
        ).otherwise(0).alias("is_start"),
    )
    s = g.select(
        "user_id", "ts",
        F.sum("is_start").over(
            Window.partitionBy("user_id").orderBy("ts")
            .rowsBetween(Window.unboundedPreceding, 0)
        ).alias("sess"),
    )
    d = (
        s.groupBy("user_id", "sess")
        .agg(
            (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
            .cast("long")
            .alias("dur_s")
        )
        .orderBy("sess")
        .collect()
    )
    assert len(d) == 2
    assert d[0].dur_s == 1200 and d[1].dur_s == 0
