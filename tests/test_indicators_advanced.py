"""Edge semantics for the round-4 advanced indicator family (ATR,
stochastic, Williams %R, OBV, MFI, CCI, channels, ROC, candlestick
flags) on hand-built bars with hand-computed expectations. (Oracle
parity for the registry entries is covered parametrically by
tests/test_oracle_parity.py.)
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

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


# --- ATR ------------------------------------------------------------------


def test_true_range_first_bar_is_high_low_and_gap_uses_prev_close(spark):
    """Bar 1 has no prior close → TR = high-low. Bar 2 gaps far above
    its own range → TR = |high - prev_close|, not high-low."""
    b = _bars(
        spark,
        [
            ("A", 1, 10.0, 12.0, 9.0, 11.0, 100),
            ("A", 2, 20.0, 21.0, 19.5, 20.0, 100),
        ],
    )
    tr = _by_ts(ind.with_atr(b, 2), "tr")
    assert tr[1] == 3.0  # 12 - 9
    assert tr[2] == 10.0  # |21 - 11| beats 21-19.5 and |19.5-11|


def test_atr_is_sma_of_tr(spark):
    b = _bars(
        spark,
        [
            ("A", 1, 0, 4.0, 0.0, 2.0, 1),
            ("A", 2, 0, 4.0, 2.0, 3.0, 1),  # tr = max(2, |4-2|, 0) = 2
            ("A", 3, 0, 9.0, 3.0, 5.0, 1),  # tr = max(6, 6, 0) = 6
        ],
    )
    atr = _by_ts(ind.with_atr(b, 2), "atr_2")
    assert atr[2] == 3.0  # (4 + 2) / 2
    assert atr[3] == 4.0  # (2 + 6) / 2


# --- stochastic / Williams %R --------------------------------------------


def test_stochastic_k_extremes_and_flat_window_null(spark):
    b = _bars(
        spark,
        [
            ("A", 1, 0, 10.0, 5.0, 10.0, 1),  # close at HH -> 100
            ("A", 2, 0, 10.0, 5.0, 5.0, 1),  # close at LL -> 0
            ("B", 1, 0, 7.0, 7.0, 7.0, 1),  # flat envelope -> null
        ],
    )
    out = ind.with_stochastic(b, 2, 2)
    rows = {(r.symbol, r.bar_ts): r for r in out.collect()}
    assert rows[("A", 1)].pct_k == 100.0
    assert rows[("A", 2)].pct_k == 0.0
    assert rows[("A", 2)].pct_d == 50.0  # avg(100, 0)
    assert rows[("B", 1)].pct_k is None


def test_williams_r_is_stochastic_mirror(spark):
    b = _bars(
        spark,
        [
            ("A", 1, 0, 10.0, 5.0, 10.0, 1),
            ("A", 2, 0, 10.0, 5.0, 5.0, 1),
        ],
    )
    out = b.select("bar_ts", ind.williams_r(2).alias("wr"))
    wr = {r.bar_ts: r.wr for r in out.collect()}
    assert wr[1] == 0.0  # close at the high
    assert wr[2] == -100.0  # close at the low


# --- OBV / MFI ------------------------------------------------------------


def test_obv_cumulates_signed_volume(spark):
    b = _bars(
        spark,
        [
            ("A", 1, 0, 1, 0, 10.0, 100),  # first bar -> 0
            ("A", 2, 0, 1, 0, 11.0, 300),  # up -> +300
            ("A", 3, 0, 1, 0, 9.0, 50),  # down -> -50
            ("A", 4, 0, 1, 0, 9.0, 999),  # flat -> +0
        ],
    )
    obv = _by_ts(ind.with_obv(b), "obv")
    assert [obv[t] for t in (1, 2, 3, 4)] == [0, 300, 250, 250]


def test_mfi_all_up_flows_is_100_and_warmup_null(spark):
    b = _bars(
        spark,
        [
            ("A", 1, 0, 3.0, 3.0, 3.0, 10),  # no prior tp -> excluded
            ("A", 2, 0, 6.0, 6.0, 6.0, 10),  # up flow
            ("A", 3, 0, 9.0, 9.0, 9.0, 10),  # up flow
        ],
    )
    mfi = _by_ts(ind.with_mfi(b, 3), "mfi_3")
    assert mfi[1] is None  # 0/(0+0) -> null via nullif
    assert mfi[2] == 100.0
    assert mfi[3] == 100.0


# --- CCI / channels -------------------------------------------------------


def test_cci_constant_tp_is_null_and_sign_tracks_deviation(spark):
    b = _bars(
        spark,
        [
            ("A", 1, 0, 5.0, 5.0, 5.0, 1),
            ("A", 2, 0, 5.0, 5.0, 5.0, 1),  # MAD 0 -> null
            ("A", 3, 0, 11.0, 11.0, 11.0, 1),  # above mean -> positive
        ],
    )
    cci = _by_ts(ind.with_cci(b, 3), "cci_3")
    assert cci[2] is None
    # tp = [5, 5, 11]: m = 7, mad = (2+2+4)/3 = 8/3, cci = 4/(.015*8/3) = 100
    assert math.isclose(cci[3], 100.0)


def test_donchian_and_keltner_band_geometry(spark):
    b = _bars(
        spark,
        [
            ("A", 1, 0, 10.0, 2.0, 6.0, 1),
            ("A", 2, 0, 8.0, 4.0, 6.0, 1),
        ],
    )
    dc = ind.donchian(2)
    row = (
        b.select("bar_ts", *[dc[k].alias(k) for k in dc])
        .filter("bar_ts = 2")
        .collect()[0]
    )
    assert (row.dc_upper, row.dc_lower, row.dc_mid) == (10.0, 2.0, 6.0)

    kc = ind.with_keltner(b, 2, 2, 2.0).filter("bar_ts = 2").collect()[0]
    assert math.isclose(kc.kc_upper - kc.kc_mid, kc.kc_mid - kc.kc_lower)


def test_roc_warmup_null_then_percent_change(spark):
    b = _bars(
        spark,
        [("A", t, 0, 1, 0, float(c), 1) for t, c in [(1, 10), (2, 12), (3, 15)]],
    )
    out = b.select("bar_ts", ind.roc(2).alias("roc"))
    roc = {r.bar_ts: r.roc for r in out.collect()}
    assert roc[1] is None and roc[2] is None
    assert math.isclose(roc[3], 50.0)  # 15/10 - 1


# --- candlesticks ---------------------------------------------------------


def test_candlestick_flags_hand_cases(spark):
    b = _bars(
        spark,
        [
            # big red bar then a bullish engulfing green bar
            ("A", 1, 10.0, 10.5, 7.5, 8.0, 1),
            ("A", 2, 7.8, 11.0, 7.6, 10.2, 1),
            # doji: tiny body inside a wide range
            ("B", 1, 5.0, 6.0, 4.0, 5.01, 1),
            # hammer: long lower shadow, no upper shadow
            ("C", 1, 9.0, 9.1, 6.0, 9.1, 1),
        ],
    )
    flags = ind.candlestick_flags()
    out = b.select("symbol", "bar_ts", *[flags[k].alias(k) for k in flags])
    rows = {(r.symbol, r.bar_ts): r for r in out.collect()}
    assert rows[("A", 2)].bullish_engulf is True
    assert rows[("A", 2)].bearish_engulf is False
    assert rows[("B", 1)].is_doji is True
    assert rows[("C", 1)].is_hammer is True
    assert rows[("A", 1)].is_doji is False
