"""Scalar-function surface tests (SURVEY.md §2.8 F1-F11): each helper
is a thin named Column expression; assert reference-faithful behavior.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from finance_data_pipeline_spark import functions as fx


@pytest.fixture(scope="module")
def row(spark):
    def run(expr, **data):
        schema = ", ".join(f"{k} {'string' if isinstance(v, str) else 'double'}" for k, v in data.items())
        df = spark.createDataFrame([tuple(data.values())], schema)
        return df.select(expr.alias("out")).collect()[0]["out"]

    return run


def test_norm_symbol(row):
    assert row(fx.norm_symbol(F.col("s")), s="  aapl ") == "AAPL"


def test_fmt_and_parse_date(row):
    assert row(fx.fmt_date(fx.parse_date(F.col("s"))), s="2024-03-07") == "2024-03-07"


def test_next_day(row):
    assert str(row(fx.next_day(fx.parse_date(F.col("s"))), s="2024-02-28")) == "2024-02-29"


def test_pct_change_expr(row):
    assert row(fx.pct_change_expr(F.col("a"), F.col("b")), a=110.0, b=100.0) == pytest.approx(0.1)


def test_sign_color(row):
    assert row(fx.sign_color(F.col("a")), a=2.0) == "green"
    assert row(fx.sign_color(F.col("a")), a=-2.0) == "red"


def test_csv_symbols(row):
    assert row(fx.csv_symbols(F.col("s")), s="aapl, msft ,tsla") == ["AAPL", "MSFT", "TSLA"]


def test_json_prop(row):
    assert row(fx.json_prop(F.col("s"), "k"), s='{"k": 7}') == "7"


def test_dot_l2_cosine(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 2.0], [2.0, 0.0, 1.0])], "a array<double>, b array<double>"
    )
    out = df.select(
        fx.dot("a", "b").alias("dot"),
        fx.l2_norm("a").alias("na"),
        fx.cosine("a", "b").alias("cos"),
    ).collect()[0]
    assert out["dot"] == pytest.approx(4.0)
    assert out["na"] == pytest.approx(3.0)
    assert out["cos"] == pytest.approx(4.0 / (3.0 * math.sqrt(5.0)))


def test_days_back_cutoff_is_relative(spark):
    out = spark.range(1).select(
        (F.current_date() >= fx.days_back_cutoff(30)).alias("ok")
    ).collect()[0]["ok"]
    assert out


def test_micro_avg_exact_beyond_2pow53(spark):
    """micro_avg's inner quotient uses Spark's integer div (ADVICE r8):
    bit-for-bit with DuckDB's BIGINT // over the full int64 range. Pin
    against Python exact integer arithmetic at magnitudes where the old
    (mag - mag % d) / d double path is off by one ulp (mag > 2^53),
    plus negative sums and a half-boundary case."""
    cases = [
        (9_007_199_254_740_993, 2),       # mag = 2|s|+n > 2^53
        (-9_007_199_254_740_993, 2),      # negative branch at scale
        (4_611_686_018_427_387_900, 1),   # near int64/2: mag near max
        (7, 2),                           # 3.5 micro-units: half boundary
        (-7, 2),                          # half-away-from-zero, negative
        (1_234_567, 3),
    ]
    df = spark.createDataFrame(cases, "s long, n long")
    rows = df.select("s", "n", fx.micro_avg(F.col("s"), F.col("n")).alias("v")).collect()
    for r in rows:
        mag, d = 2 * abs(r.s) + r.n, 2 * r.n
        q = mag // d
        expect = float(-q if r.s < 0 else q) / 1_000_000.0
        assert r.v == expect, (r.s, r.n, r.v, expect)
