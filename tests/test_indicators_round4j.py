"""Hand-computed semantics for the W22 indicator round-out (pivot
points, force index / EOM, cross-sectional momentum, DEMA/TEMA).
Oracle parity at sf0.001 is covered parametrically by
tests/test_oracle_parity.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from finance_data_pipeline_spark import indicators as ind


def _bars(spark, rows):
    df = spark.createDataFrame(
        rows, "symbol string, bar_ts string, open double, high double,"
        " low double, close double, volume long"
    )
    return df.withColumn("bar_ts", F.col("bar_ts").cast("timestamp"))


def test_pivot_points_hand_example(spark):
    """Prev bar H=12, L=8, C=10 → P=10, R1=12, S1=8, R2=14, S2=6."""
    b = _bars(spark, [
        ("A", "2024-01-01 09:00:00", 9.0, 12.0, 8.0, 10.0, 1000),
        ("A", "2024-01-01 10:00:00", 10.0, 11.0, 9.0, 10.5, 1000),
    ])
    w = Window.partitionBy("symbol").orderBy("bar_ts")
    p = b.select(
        "symbol", "bar_ts",
        F.lag("high").over(w).alias("ph"),
        F.lag("low").over(w).alias("pl"),
        F.lag("close").over(w).alias("pc"),
    ).filter(F.col("ph").isNotNull())
    piv = (F.col("ph") + F.col("pl") + F.col("pc")) / 3
    row = p.select(
        piv.alias("p"),
        (2 * piv - F.col("pl")).alias("r1"),
        (2 * piv - F.col("ph")).alias("s1"),
        (piv + (F.col("ph") - F.col("pl"))).alias("r2"),
        (piv - (F.col("ph") - F.col("pl"))).alias("s2"),
    ).collect()[0]
    assert (row["p"], row["r1"], row["s1"], row["r2"], row["s2"]) == (
        10.0, 12.0, 8.0, 14.0, 6.0
    )


def test_force_index_sign_follows_price_change(spark):
    """Force index is positive exactly on up-bars, scaled by volume."""
    b = _bars(spark, [
        ("A", "2024-01-01 09:00:00", 10.0, 10.0, 10.0, 10.0, 500),
        ("A", "2024-01-01 10:00:00", 10.0, 11.0, 10.0, 11.0, 2000),
        ("A", "2024-01-01 11:00:00", 11.0, 11.0, 9.0, 9.0, 1000),
    ])
    w = Window.partitionBy("symbol").orderBy("bar_ts")
    fi = (F.col("close") - F.lag("close").over(w)) * F.col("volume")
    vals = [
        r["fi"]
        for r in b.select(fi.alias("fi"))
        .filter(F.col("fi").isNotNull())
        .orderBy("fi", ascending=False)
        .collect()
    ]
    vals.sort(reverse=True)
    assert vals == [2000.0, -2000.0]


def test_dema_tema_constant_series_is_flat(spark):
    """On a constant price series every EMA equals the price, so
    DEMA = 2c − c = c and TEMA = 3c − 3c + c = c."""
    rows = [("A", f"2024-01-{d:02d}", 50.0) for d in range(1, 11)]
    df = spark.createDataFrame(rows, "symbol string, date string, close double")
    df = df.select("symbol", F.col("date").cast("date").alias("date"), "close")
    out = ind.with_dema_tema(df, span=20).toPandas()
    assert (out["dema_20"] == 50.0).all()
    assert (out["tema_20"] == 50.0).all()


def test_dema_tema_matches_pandas_reference(spark):
    """Spot-check the helper against a direct pandas computation."""
    closes = [100.0, 101.5, 99.2, 103.7, 102.1, 104.9, 101.3, 105.5]
    rows = [("A", f"2024-01-{d + 1:02d}", c) for d, c in enumerate(closes)]
    df = spark.createDataFrame(rows, "symbol string, date string, close double")
    df = df.select("symbol", F.col("date").cast("date").alias("date"), "close")
    out = (
        ind.with_dema_tema(df, span=20)
        .orderBy("date")
        .toPandas()
    )
    s = pd.Series(closes)
    e1 = s.ewm(span=20, adjust=True).mean()
    e2 = e1.ewm(span=20, adjust=True).mean()
    e3 = e2.ewm(span=20, adjust=True).mean()
    assert (out["dema_20"].to_numpy() == (2 * e1 - e2).to_numpy()).all()
    assert (out["tema_20"].to_numpy() == (3 * e1 - 3 * e2 + e3).to_numpy()).all()


def test_momentum_xsec_rank_orders_by_momentum(spark):
    """Three symbols with known 1-lag momentum on the same date rank
    in descending momentum order."""
    rows = []
    for sym, (c0, c1) in {"A": (100, 110), "B": (100, 105), "C": (100, 101)}.items():
        rows += [(sym, "2024-01-01", float(c0)), (sym, "2024-01-02", float(c1))]
    df = spark.createDataFrame(rows, "symbol string, date string, close double")
    df = df.select("symbol", F.col("date").cast("date").alias("date"), "close")
    ws = Window.partitionBy("symbol").orderBy("date")
    m = df.select(
        "symbol", "date",
        (F.col("close") / F.lag("close", 1).over(ws) - 1).alias("mom"),
    ).filter(F.col("mom").isNotNull())
    wd = Window.partitionBy("date").orderBy(F.desc("mom"), F.asc("symbol"))
    out = m.select("symbol", F.rank().over(wd).alias("rk")).collect()
    ranks = {r["symbol"]: r["rk"] for r in out}
    assert ranks == {"A": 1, "B": 2, "C": 3}
