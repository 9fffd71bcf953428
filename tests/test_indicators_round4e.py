"""Edge semantics for the ADX / Aroon / CMF / range-volatility family
on hand-built bars with hand-computed expectations. (Oracle parity for
the registry entries is covered parametrically by
tests/test_oracle_parity.py.)
"""

from __future__ import annotations

import math

from finance_data_pipeline_spark import indicators as ind

_SCHEMA = "symbol string, bar_ts long, open double, high double, low double, close double, volume long"


def _bars(spark, rows):
    coerced = [
        (s, int(t), float(o), float(h), float(lo), float(c), int(v))
        for s, t, o, h, lo, c, v in rows
    ]
    return spark.createDataFrame(coerced, _SCHEMA)


def _by_ts(df, col):
    return {r.bar_ts: r[col] for r in df.orderBy("bar_ts").collect()}


# --- ADX ------------------------------------------------------------------


def test_adx_dm_classification(spark):
    """Bar 2 expands only upward → +DM = Δhigh, −DM = 0, so +DI > 0 and
    −DI = 0 and DX = 100. Bar 3 expands only downward → the mirror."""
    b = _bars(
        spark,
        [
            ("A", 1, 0, 10.0, 9.0, 9.5, 1),
            ("A", 2, 0, 12.0, 9.5, 11.0, 1),  # up-move 2, down-move -0.5
            ("A", 3, 0, 11.0, 7.0, 8.0, 1),  # up-move -1, down-move 2.5
        ],
    )
    out = ind.with_adx(b, 2)
    pdi = _by_ts(out, "pdi")
    ndi = _by_ts(out, "ndi")
    # bar 2 window = bars 1-2: sum(+DM)=2, sum(-DM)=0
    assert ndi[2] == 0.0 and pdi[2] > 0
    # bar 3 window = bars 2-3: +DM total 2 (bar 2), -DM total 2.5 (bar 3)
    assert pdi[3] > 0 and ndi[3] > pdi[3]


def test_adx_inside_bar_contributes_no_dm(spark):
    """An inside bar (lower high AND higher low) has zero ±DM."""
    b = _bars(
        spark,
        [
            ("A", 1, 0, 10.0, 8.0, 9.0, 1),
            ("A", 2, 0, 9.5, 8.5, 9.0, 1),  # inside: up -0.5, down -0.5
        ],
    )
    out = ind.with_adx(b, 2)
    # only TR contributes; both DI are 0/tr = 0
    assert _by_ts(out, "pdi")[2] == 0.0
    assert _by_ts(out, "ndi")[2] == 0.0


# --- Aroon ----------------------------------------------------------------


def test_aroon_extremes_and_warmup(spark):
    """With n=2 (3-bar lookback): a fresh high → aroon_up = 100; the
    low sitting n bars back → aroon_down = 0. Warm-up rows are null."""
    rows = [
        ("A", 1, 0, 5.0, 1.0, 3.0, 1),
        ("A", 2, 0, 6.0, 2.0, 4.0, 1),
        ("A", 3, 0, 7.0, 3.0, 5.0, 1),  # first full 3-bar window
        ("A", 4, 0, 8.0, 4.0, 6.0, 1),
    ]
    b = _bars(spark, rows)
    cols = ind.aroon(2, "bar_ts")
    out = b.select("bar_ts", cols["aroon_up"].alias("u"), cols["aroon_down"].alias("d"))
    up = _by_ts(out, "u")
    dn = _by_ts(out, "d")
    assert up[1] is None and up[2] is None  # warm-up (< n+1 bars)
    # rising series: high is always the current bar, low always n back
    assert up[3] == 100.0 and up[4] == 100.0
    assert dn[3] == 0.0 and dn[4] == 0.0


def test_aroon_tie_breaks_to_most_recent(spark):
    """Two equal highs in the window → bars-since uses the LATER one
    (struct-max last-wins), matching the oracle's lexicographic tie."""
    rows = [
        ("A", 1, 0, 9.0, 1.0, 5.0, 1),
        ("A", 2, 0, 9.0, 2.0, 5.0, 1),  # same high as bar 1
        ("A", 3, 0, 8.0, 3.0, 5.0, 1),
    ]
    b = _bars(spark, rows)
    cols = ind.aroon(2, "bar_ts")
    out = b.select("bar_ts", cols["aroon_up"].alias("u"))
    # bar 3 window = bars 1-3, max high 9.0 at bars 1 AND 2 → pick bar 2
    # → bars_since = 1 → aroon_up = 100·(2-1)/2 = 50
    assert _by_ts(out, "u")[3] == 50.0


# --- CMF ------------------------------------------------------------------


def test_cmf_close_at_extremes(spark):
    """Close at the high → mfm = +1; close at the low → −1; flat bar
    (high == low) contributes 0. CMF is the volume-weighted mean."""
    rows = [
        ("A", 1, 0, 10.0, 8.0, 10.0, 100),  # mfm +1, mfv +100
        ("A", 2, 0, 10.0, 8.0, 8.0, 300),  # mfm −1, mfv −300
        ("A", 3, 0, 9.0, 9.0, 9.0, 600),  # flat → 0
    ]
    out = ind.with_cmf(_bars(spark, rows), 3)
    cmf = _by_ts(out, "cmf_3")
    assert cmf[1] == 1.0
    assert math.isclose(cmf[2], (100 - 300) / 400)
    assert math.isclose(cmf[3], (100 - 300 + 0) / 1000)


# --- range volatility -----------------------------------------------------


def test_range_volatility_constant_price_is_zero(spark):
    """A symbol that never moves has zero under every estimator."""
    rows = [("A", t, 5.0, 5.0, 5.0, 5.0, 1) for t in range(1, 5)]
    out = ind.range_volatility(_bars(spark, rows)).collect()[0]
    assert out.vol_cc == 0.0
    assert out.vol_parkinson == 0.0
    assert out.vol_gk == 0.0
    assert out.vol_rs == 0.0


def test_range_volatility_parkinson_hand_value(spark):
    """Two bars with known high/low ratios: Parkinson matches the
    closed form sqrt(Σ ln²(h/l) / (4 ln2 n))."""
    rows = [
        ("A", 1, 10.0, 12.0, 10.0, 11.0, 1),
        ("A", 2, 11.0, 11.0, 9.0, 10.0, 1),
    ]
    out = ind.range_volatility(_bars(spark, rows)).collect()[0]
    s = math.log(12 / 10) ** 2 + math.log(11 / 9) ** 2
    assert math.isclose(out.vol_parkinson, math.sqrt(s / (4 * math.log(2) * 2)))
    assert out.n_bars == 2
    # c2c needs ≥2 returns; with exactly one return the variance
    # denominator (n−1) is 0 → null, not a crash
    assert out.vol_cc is None
