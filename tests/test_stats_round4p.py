"""Invariant checks for the late round-4 families (logistics lag,
cohorts, drawdown episodes, link prediction, Kupiec, conditional
betas, greeks, KS, spectral grid, day-of-week, runs test). Oracle
parity at sf0.001 is covered parametrically by
tests/test_oracle_parity.py.
"""

from __future__ import annotations

from finance_data_pipeline_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_cohort_matrix_is_upper_triangular(spark):
    """No cohort can have revenue before its first-order year."""
    out = QUERIES["cohort_revenue_matrix"](spark, SF).toPandas()
    assert len(out) > 0
    assert (out["order_year"] >= out["cohort_year"]).all()
    assert (out["revenue"] > 0).all()


def test_drawdown_episodes_depths_negative_and_ranked(spark):
    out = QUERIES["drawdown_episodes"](spark, SF).toPandas()
    assert len(out) > 0
    assert (out["depth"] < 0).all()
    for _, g in out.groupby("symbol"):
        d = g.sort_values("rnk")["depth"].tolist()
        assert d == sorted(d)  # rank 1 = deepest (most negative first)


def test_link_pred_nonvacuous_and_bounds_jaccard(spark):
    """The repeat-trade bipartite form must produce predictions at
    every SF (the near-dup-graph form was structurally vacuous:
    clusters are cliques, zero open wedges)."""
    out = QUERIES["link_pred_common_neighbors"](spark, SF).toPandas()
    assert len(out) == 50
    assert (out["common_suppliers"] >= 1).all()
    assert out["jaccard_coef"].between(0, 1).all()
    # deterministic ranking: cn descending, then customer pair
    cns = out["common_suppliers"].tolist()
    assert cns == sorted(cns, reverse=True)


def test_kupiec_violation_rate_near_five_percent(spark):
    """In-sample VaR(95) violations sit at ~5% by construction (the
    percentile defines the threshold), so the POF test should not
    reject wildly."""
    out = QUERIES["var_backtest_kupiec"](spark, SF).toPandas()
    assert len(out) > 0
    assert out["violation_rate"].between(0.0, 0.15).all()


def test_ks_stat_bounded_and_crit_matches_n(spark):
    out = QUERIES["ks_normality"](spark, SF).toPandas()
    assert len(out) > 0
    assert out["ks_stat"].between(0, 1).all()
    assert (
        (out["crit_95"] - 1.358 / out["n_rets"] ** 0.5).abs() < 1e-6
    ).all()


def test_spectral_grid_three_periods_and_rank_permutation(spark):
    out = QUERIES["spectral_power_grid"](spark, SF).toPandas()
    for _, g in out.groupby("symbol"):
        assert sorted(g["period"]) == [5, 10, 21]
        assert sorted(g["power_rank"]) == [1, 2, 3]
        assert (g["power"] >= 0).all()


def test_runs_test_counts_consistent(spark):
    out = QUERIES["runs_test"](spark, SF).toPandas()
    assert len(out) > 0
    # runs can't exceed the number of observations, and must be ≥ 1
    assert (out["n_runs"] >= 1).all()
    assert (out["n_runs"] <= out["n_pos"] + out["n_neg"]).all()


def test_conditional_betas_up_regime_always_present(spark):
    """The sf0.001 fixture's drift is strong enough that the
    equal-weight market has no down days at all — the down-side
    columns are then NULL by design, never fabricated."""
    out = QUERIES["conditional_betas"](spark, SF).toPandas()
    assert len(out) > 0
    assert (out["n_up"].fillna(0) + out["n_down"].fillna(0) > 0).all()
    assert out["beta_up"].notna().any() or out["beta_down"].notna().any()


def test_greeks_signs(spark):
    out = QUERIES["bs_greeks"](spark, SF).toPandas()
    assert (out["gamma"] >= 0).all()
    assert (out["vega_pct"] >= 0).all()
    assert (out["theta_call_daily"] <= 0).all()


def test_dow_effect_covers_trading_days(spark):
    out = QUERIES["dow_effect"](spark, SF).toPandas()
    assert len(out) > 0
    assert out["dow"].between(1, 7).all()
