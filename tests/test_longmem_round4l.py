"""Hand-computed semantics for the X14 long-memory / robust-dependence
family (Hurst R/S, Kendall tau-b, Heikin-Ashi). Oracle parity at
sf0.001 is covered parametrically by tests/test_oracle_parity.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from finance_data_pipeline_spark import indicators as ind


def test_heikin_ashi_recursion_hand_example(spark):
    """Two bars: ha_open_1 = (o1+c1)/2; ha_open_2 =
    (ha_open_1 + ha_close_1)/2 with ha_close_1 = (o+h+l+c)/4."""
    rows = [
        ("A", "2024-01-01 09:00:00", 10.0, 12.0, 8.0, 11.0, 100),
        ("A", "2024-01-01 10:00:00", 11.0, 13.0, 10.0, 12.0, 100),
    ]
    df = spark.createDataFrame(
        rows, "symbol string, bar_ts string, open double, high double,"
        " low double, close double, volume long"
    ).withColumn("bar_ts", F.col("bar_ts").cast("timestamp"))
    out = ind.with_heikin_ashi(df).orderBy("bar_ts").collect()
    ha_o1 = (10.0 + 11.0) / 2                     # 10.5
    ha_c1 = (10.0 + 12.0 + 8.0 + 11.0) / 4        # 10.25
    assert out[0]["ha_open"] == ha_o1
    assert out[0]["ha_close"] == ha_c1
    assert out[1]["ha_open"] == (ha_o1 + ha_c1) / 2
    # extremes fold the smoothed values in
    assert out[0]["ha_high"] == max(12.0, ha_o1, ha_c1)
    assert out[0]["ha_low"] == min(8.0, ha_o1, ha_c1)


def test_kendall_tau_perfect_concordance(spark):
    """Two synthetic series moving in lockstep: every pair of time
    points is concordant → tau_b = 1."""
    xs = [0.01, 0.03, -0.02, 0.05, -0.04]
    p = spark.createDataFrame(
        [("A", "B", f"2024-01-{i + 1:02d}", x, 2 * x) for i, x in enumerate(xs)],
        "sa string, sb string, date string, x double, y double",
    )
    p1, p2 = p.alias("p1"), p.alias("p2")
    prod = (F.col("p2.x") - F.col("p1.x")) * (F.col("p2.y") - F.col("p1.y"))
    pp = p1.join(
        p2,
        (F.col("p1.sa") == F.col("p2.sa")) & (F.col("p1.date") < F.col("p2.date")),
    ).select(
        F.when(prod > 0, 1).otherwise(0).alias("c"),
        F.when(prod < 0, 1).otherwise(0).alias("d"),
    )
    row = pp.agg(F.sum("c").alias("nc"), F.sum("d").alias("nd"), F.count("*").alias("n0")).collect()[0]
    assert row["n0"] == 10            # C(5,2)
    assert row["nc"] == 10 and row["nd"] == 0


def test_hurst_random_walkish_blocks_have_positive_rs(spark):
    """On any non-constant return series every full block yields
    R/S > 0 and avg R/S grows with block size (the premise of the
    log-log slope)."""
    from finance_data_pipeline_spark.registry import QUERIES

    # reuse the registry query on the test fixture dir
    out = QUERIES["hurst_rs"](spark, "/root/testdata/sf0.001").toPandas()
    assert len(out) > 0
    assert (out["avg_rs_4"] > 0).all()
    assert (out["avg_rs_16"] > out["avg_rs_4"]).all()
    # H bounded in a sane band for bounded series
    assert out["hurst"].between(-0.5, 1.5).all()
