"""Hand-computed edge semantics for the X11 tail-risk family
(VaR/CVaR, return moments, up/down capture, omega/tail ratio,
win/loss streaks). Oracle parity at sf0.001 is covered parametrically
by tests/test_oracle_parity.py; these pin the definitions themselves
on tiny frames where the right answer is computable by hand.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def _rets_frame(spark, closes, symbol="A"):
    rows = [
        (symbol, f"2024-{1 + i // 28:02d}-{1 + i % 28:02d}", float(c))
        for i, c in enumerate(closes)
    ]
    df = spark.createDataFrame(rows, "symbol string, date string, close double")
    return df.select("symbol", F.col("date").cast("date").alias("date"), "close")


def _streaks(spark, closes):
    s = _rets_frame(spark, closes)
    w = Window.partitionBy("symbol").orderBy("date")
    r = s.select(
        "symbol", "date",
        (F.col("close") / F.lag("close").over(w) - 1).alias("ret"),
    ).filter(F.col("ret").isNotNull())
    sgn = F.when(F.col("ret") > 0, 1).when(F.col("ret") < 0, -1).otherwise(0)
    st = r.select("symbol", "date", sgn.alias("sgn"), F.row_number().over(w).alias("rn"))
    g = st.select(
        "symbol", "sgn",
        (F.col("rn") - F.row_number().over(
            Window.partitionBy("symbol", "sgn").orderBy("date"))).alias("grp"),
    )
    runs = g.groupBy("symbol", "sgn", "grp").agg(F.count("*").alias("len"))
    return {
        (row["sgn"]): row["mx"]
        for row in runs.groupBy("sgn").agg(F.max("len").alias("mx")).collect()
    }


def test_win_loss_streaks_islands(spark):
    """closes 1,2,3,2,1,2,3,4,5 → rets +,+,−,−,+,+,+,+ → longest win
    run 4, longest loss run 2."""
    mx = _streaks(spark, [1, 2, 3, 2, 1, 2, 3, 4, 5])
    assert mx[1] == 4
    assert mx[-1] == 2


def test_win_loss_streaks_flat_days_break_runs(spark):
    """A zero-return day is its own sign class: it splits win runs."""
    mx = _streaks(spark, [1, 2, 2, 3, 4])  # +, 0, +, + → max win run 2
    assert mx[1] == 2
    assert mx[0] == 1


def test_up_down_capture_single_symbol_is_identity(spark):
    """With one symbol the equal-weight market IS the symbol, so both
    captures are exactly 1."""
    s = _rets_frame(spark, [100, 101, 99, 103, 98, 104])
    w = Window.partitionBy("symbol").orderBy("date")
    r = s.select(
        "symbol", "date",
        (F.col("close") / F.lag("close").over(w) - 1).alias("ret"),
    ).filter(F.col("ret").isNotNull())
    mkt = r.groupBy("date").agg(
        (F.sum(F.col("ret").cast("decimal(38,18)")).cast("double")
         / F.count("ret")).alias("mret")
    )
    j = r.join(mkt, "date")
    dec = lambda c: F.sum(c.cast("decimal(38,18)")).cast("double")
    up = F.col("mret") > 0
    row = j.groupBy("symbol").agg(
        dec(F.when(up, F.col("ret")).otherwise(0.0)).alias("sr_up"),
        dec(F.when(up, F.col("mret")).otherwise(0.0)).alias("sm_up"),
    ).collect()[0]
    assert row["sr_up"] == row["sm_up"]


def test_return_moments_symmetric_series_has_zero_skew(spark):
    """Log-symmetric up/down alternation: +r then the exact inverse
    move gives a two-point return distribution {+r, −r/(1+r)}… so use
    an explicitly symmetric ARITHMETIC return set instead by
    constructing closes whose returns are exactly {+0.02, −0.02}
    repeated — skewness of a perfectly symmetric sample is 0."""
    closes, c = [100.0], 100.0
    rets = [0.02, -0.02] * 10
    for r in rets:
        c = c * (1 + r)
        closes.append(c)
    # returns implied by closes are exactly the rets list (up to float
    # division noise) — compute skew via the registry formula shape
    s = _rets_frame(spark, closes)
    w = Window.partitionBy("symbol").orderBy("date")
    r = s.select(
        "symbol", (F.col("close") / F.lag("close").over(w) - 1).alias("ret")
    ).filter(F.col("ret").isNotNull())
    dec = lambda col: F.sum(col.cast("decimal(38,18)")).cast("double")
    ret = F.col("ret")
    st = r.groupBy("symbol").agg(
        F.count("ret").alias("n"), dec(ret).alias("s1"),
        dec(ret * ret).alias("s2"), dec(ret * ret * ret).alias("s3"),
    ).collect()[0]
    n, s1, s2, s3 = st["n"], st["s1"], st["s2"], st["s3"]
    mu = s1 / n
    c2 = s2 - s1 * s1 / n
    c3 = s3 - 3 * mu * s2 + 2 * mu * mu * s1
    skew = (n ** 0.5) * c3 / c2 ** 1.5
    assert abs(skew) < 1e-6


def test_omega_all_gains_degenerates_to_null_denominator(spark):
    """Monotone-up closes: loss mass is 0 → omega must be NULL (never
    inf/NaN) under the nullif guard."""
    from finance_data_pipeline_spark.registry import QUERIES

    s = _rets_frame(spark, [100, 101, 102, 103])
    w = Window.partitionBy("symbol").orderBy("date")
    r = s.select(
        "symbol", (F.col("close") / F.lag("close").over(w) - 1).alias("ret")
    ).filter(F.col("ret").isNotNull())
    dec = lambda c: F.sum(c.cast("decimal(38,18)")).cast("double")
    st = r.groupBy("symbol").agg(
        dec(F.when(F.col("ret") > 0, F.col("ret")).otherwise(0.0)).alias("gains"),
        dec(F.when(F.col("ret") < 0, -F.col("ret")).otherwise(0.0)).alias("losses"),
    )
    out = st.select(
        (F.col("gains") / F.nullif(F.col("losses"), F.lit(0.0))).alias("omega")
    ).collect()[0]
    assert out["omega"] is None


def test_var_cvar_tail_mean_never_exceeds_var(spark):
    """CVaR (mean of the ≤VaR tail) is ≤ VaR by construction."""
    closes = [100.0]
    for r in [0.01, -0.03, 0.02, -0.05, 0.04, -0.01, 0.03, -0.04, 0.02, -0.02]:
        closes.append(closes[-1] * (1 + r))
    s = _rets_frame(spark, closes)
    w = Window.partitionBy("symbol").orderBy("date")
    r = s.select(
        "symbol", (F.col("close") / F.lag("close").over(w) - 1).alias("ret")
    ).filter(F.col("ret").isNotNull())
    v = r.groupBy("symbol").agg(F.percentile("ret", F.lit(0.05)).alias("var95"))
    j = r.join(v, "symbol").filter(F.col("ret") <= F.col("var95"))
    row = (
        j.groupBy("symbol")
        .agg(F.avg("ret").alias("cvar"), F.first("var95").alias("var95"))
        .collect()[0]
    )
    assert row["cvar"] <= row["var95"] + 1e-12
