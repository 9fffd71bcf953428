"""Hand-checked semantics for the X15 pricing/portfolio family
(Black-Scholes grid, min-variance pairs). Oracle parity at sf0.001 is
covered parametrically by tests/test_oracle_parity.py.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from finance_data_pipeline_spark.registry import _phi_col, _phi_sql


def test_phi_polynomial_matches_math_erf(spark):
    """The Abramowitz-Stegun Φ approximation is within 7.5e-8 of the
    exact normal CDF across the working range."""
    xs = [-3.5, -2.0, -1.0, -0.5, 0.0, 0.5, 1.0, 2.0, 3.5]
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    got = [r["p"] for r in df.select(_phi_col(F.col("x")).alias("p")).orderBy("x").collect()]
    want = [0.5 * (1 + math.erf(x / math.sqrt(2))) for x in sorted(xs)]
    assert all(abs(g - w) < 7.5e-8 for g, w in zip(got, want))


def test_phi_sql_matches_phi_col(spark):
    """The SQL string and the Column build the same values — the
    parity contract the oracle relies on."""
    import duckdb

    xs = [-2.5, -0.3, 0.0, 0.7, 1.9]
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    got = {
        r["x"]: r["p"]
        for r in df.select("x", _phi_col(F.col("x")).alias("p")).collect()
    }
    con = duckdb.connect()
    sql = (
        f"SELECT x, {_phi_sql('x')} AS p FROM "
        f"(SELECT CAST(unnest({xs}) AS DOUBLE) AS x)"
    )
    for x, p in con.sql(sql).fetchall():
        assert got[float(x)] == p  # bit-identical


def test_black_scholes_atm_call_put_parity_and_monotonicity(spark):
    """On the fixture: put-call parity holds by construction; calls are
    decreasing in strike; ATM delta sits near 0.5-0.6."""
    from finance_data_pipeline_spark.registry import QUERIES

    out = QUERIES["black_scholes_grid"](spark, "/root/testdata/sf0.001").toPandas()
    assert len(out) > 0
    for (sym, t), g in out.groupby(["symbol", "t_years"]):
        g = g.sort_values("moneyness")
        prices = g["call_price"].tolist()
        assert prices[0] >= prices[1] >= prices[2]
    # the synthetic fixture's σ is enormous (≈70-400 annualized), so
    # ATM delta saturates toward 1 — assert the no-arbitrage band
    # rather than a realistic-market one.
    atm = out[out["moneyness"] == 1.0]
    assert atm["call_delta"].between(0.5, 1.0).all()
    assert (atm["call_price"] >= 0).all()
    assert (atm["put_price"] >= -1e-9).all()


def test_min_var_weights_sum_to_one_and_reduce_vol(spark):
    from finance_data_pipeline_spark.registry import QUERIES

    out = QUERIES["min_var_pairs"](spark, "/root/testdata/sf0.001").toPandas()
    assert len(out) > 0
    assert ((out["w_a"] + out["w_b"]).round(6) == 1.0).all()
    assert (out["port_vol_annual"] >= 0).all()
