"""Hand-checked semantics for the X16 behavioral family (stationary
distribution, burstiness, LTV deciles). Oracle parity at sf0.001 is
covered parametrically by tests/test_oracle_parity.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from finance_data_pipeline_spark.registry import QUERIES


def test_stationary_shares_sum_to_one_and_are_positive(spark):
    out = QUERIES["transition_stationary_dist"](
        spark, "/root/testdata/sf0.001"
    ).toPandas()
    assert len(out) > 1
    assert abs(out["stationary_share"].sum() - 1.0) < 1e-4
    assert (out["pi_units"] > 0).all()


def test_burstiness_periodic_vs_bursty(spark):
    """Perfectly periodic gaps → σ=0 → B=−1; one huge outlier gap
    pushes B positive."""
    rows = []
    # user 1, type 'p': perfectly periodic (10s)
    for i in range(6):
        rows.append((i, f"2024-01-01 00:00:{10 * i:02d}", 1, "p", 1.0, "{}"))
    # user 2, type 'b': four 1s gaps then a 10000s gap
    ts = [0, 1, 2, 3, 4, 10004]
    for i, t in enumerate(ts):
        rows.append(
            (100 + i, f"2024-01-01 {t // 3600:02d}:{(t % 3600) // 60:02d}:{t % 60:02d}",
             2, "b", 1.0, "{}"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string,"
        " value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    tz = F.col("ts").cast("timestamp")
    gap = (F.unix_micros(tz) - F.unix_micros(F.lag(tz).over(w))).cast("long")
    seq = ev.select("event_type", gap.alias("g")).filter(F.col("g").isNotNull())
    s = seq.groupBy("event_type").agg(
        F.count("g").alias("n"), F.sum("g").alias("s1"),
        F.sum(F.col("g").cast("decimal(19,0)") * F.col("g").cast("decimal(19,0)"))
        .cast("double")
        .alias("s2"),
    )
    mu = F.col("s1").cast("double") / F.col("n")
    sigma = F.sqrt(F.col("s2") / F.col("n") - mu * mu)
    b = {
        r["event_type"]: r["b"]
        for r in s.select(
            "event_type",
            ((sigma - mu) / (sigma + mu)).alias("b"),
        ).collect()
    }
    assert b["p"] == -1.0
    # 5 gaps [1,1,1,1,10000]s: σ≈2μ → B = (σ−μ)/(σ+μ) ≈ 1/3 > 0
    assert b["b"] > 0.3


def test_ltv_deciles_cover_all_users_and_cum_share_hits_one(spark):
    out = QUERIES["user_value_deciles"](spark, "/root/testdata/sf0.001").toPandas()
    assert list(out["decile"]) == list(range(1, 11))
    # top decile holds the largest share; Lorenz cum share ends ≈ 1
    assert out["value_share"].iloc[0] == out["value_share"].max()
    assert abs(out["cum_share"].iloc[-1] - 1.0) < 1e-3
