"""pandas-parity unit tests (SURVEY.md §5.2): compute W1-W12 via the
engine AND via the literal reference pandas code
(analyze_visualize.py:98-141, dashboard.py:35-38) on the same fixture;
assert allclose. Encodes the min_periods / sample-std / ewm(adjust=True)
subtleties of SURVEY.md §2.5 that the SQL oracle can't express (EMA).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from finance_data_pipeline_spark import fixtures, indicators

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bars_pdf(spark):
    """Hourly bars fixture → pandas, per-symbol sorted (deep windows)."""
    return (
        fixtures.bars_hourly(spark, SF_DIR)
        .toPandas()
        .sort_values(["symbol", "bar_ts"])
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def engine_pdf(spark):
    b = fixtures.bars_hourly(spark, SF_DIR)
    out = b.select(
        "symbol",
        "bar_ts",
        "close",
        "volume",
        indicators.sma("close", 5, "bar_ts").alias("sma_5"),
        indicators.sma("close", 20, "bar_ts").alias("sma_20"),
        indicators.ma("close", 50, "bar_ts").alias("ma_50"),
        indicators.ma("close", 200, "bar_ts").alias("ma_200"),
        indicators.bollinger(20, 2.0, "close", "bar_ts")["bb_upper"].alias("bb_upper"),
        indicators.bollinger(20, 2.0, "close", "bar_ts")["bb_lower"].alias("bb_lower"),
        indicators.rsi(14, "close", "bar_ts").alias("rsi_14"),
        indicators.daily_return("close", "bar_ts").alias("ret"),
        indicators.diff("close", "bar_ts").alias("delta"),
        indicators.volatility(30, "bar_ts").alias("vol_30"),
        indicators.volume_ma(20, "bar_ts").alias("volume_ma_20"),
        indicators.normalize_to_100("close", "bar_ts").alias("norm_100"),
    )
    return out.toPandas().sort_values(["symbol", "bar_ts"]).reset_index(drop=True)


def reference_indicators(g: pd.DataFrame) -> pd.DataFrame:
    """The literal reference computations (analyze_visualize.py:106-139,
    dashboard.py:36-37) on one symbol's frame."""
    g = g.sort_values("bar_ts").reset_index(drop=True)
    close, volume = g["close"], g["volume"]
    out = pd.DataFrame(index=g.index)
    out["sma_5"] = close.rolling(5, min_periods=1).mean()
    out["sma_20"] = close.rolling(20, min_periods=1).mean()
    out["ma_50"] = close.rolling(50).mean()
    out["ma_200"] = close.rolling(200).mean()
    mid = close.rolling(20).mean()
    sd = close.rolling(20).std()
    out["bb_upper"] = mid + 2 * sd
    out["bb_lower"] = mid - 2 * sd
    delta = close.diff()
    gain = delta.where(delta > 0, 0).rolling(14).mean()
    loss = (-delta.where(delta < 0, 0)).rolling(14).mean()
    rs = gain / loss
    out["rsi_14"] = 100 - 100 / (1 + rs)
    out["ret"] = close.pct_change() * 100
    out["delta"] = delta
    out["vol_30"] = out["ret"].rolling(30).std()
    out["volume_ma_20"] = volume.rolling(20, min_periods=1).mean()
    out["norm_100"] = close / close.iloc[0] * 100
    return out


COLS = [
    "sma_5", "sma_20", "ma_50", "ma_200", "bb_upper", "bb_lower",
    "rsi_14", "ret", "delta", "vol_30", "volume_ma_20", "norm_100",
]


@pytest.mark.parametrize("col", COLS)
def test_indicator_matches_reference_pandas(bars_pdf, engine_pdf, col):
    ref_parts = []
    for _, g in bars_pdf.groupby("symbol", sort=True):
        ref_parts.append(reference_indicators(g))
    ref = pd.concat(ref_parts, ignore_index=True)

    got = engine_pdf[col].to_numpy(dtype=float)
    want = ref[col].to_numpy(dtype=float)
    assert got.shape == want.shape
    both_nan = np.isnan(got) & np.isnan(want)
    close = np.isclose(got, want, rtol=1e-9, atol=1e-9)
    bad = ~(both_nan | close)
    assert not bad.any(), (
        f"{col}: {bad.sum()} mismatches, first at {np.argmax(bad)}: "
        f"engine={got[bad][:3]} pandas={want[bad][:3]}"
    )


def test_ema_macd_matches_pandas_ewm(spark, bars_pdf):
    """W3-W6: exact ewm(span, adjust=True) parity (analyze_visualize.py:111-117)."""
    b = fixtures.bars_hourly(spark, SF_DIR)
    got = (
        indicators.with_ema_macd(b, col="close", time_col="bar_ts")
        .select("symbol", "bar_ts", "ema_12", "ema_26", "macd", "macd_signal", "macd_histogram")
        .toPandas()
        .sort_values(["symbol", "bar_ts"])
        .reset_index(drop=True)
    )
    parts = []
    for _, g in bars_pdf.groupby("symbol", sort=True):
        g = g.sort_values("bar_ts").reset_index(drop=True)
        e1 = g["close"].ewm(span=12, adjust=True).mean()
        e2 = g["close"].ewm(span=26, adjust=True).mean()
        macd = e1 - e2
        sig = macd.ewm(span=9, adjust=True).mean()
        parts.append(
            pd.DataFrame(
                {
                    "ema_12": e1, "ema_26": e2, "macd": macd,
                    "macd_signal": sig, "macd_histogram": macd - sig,
                }
            )
        )
    want = pd.concat(parts, ignore_index=True)
    for c in want.columns:
        assert np.allclose(got[c], want[c], rtol=1e-9, atol=1e-12), c


def test_rsi_flat_run_is_100_after_gain(spark):
    """Zero-loss windows: RS=∞ in pandas → RSI 100; the algebraic form
    100*gain/(gain+loss) must agree (indicators.py docstring)."""
    rows = [("X", f"2024-01-{d:02d}", float(10 + d)) for d in range(1, 21)]
    df = spark.createDataFrame(rows, "symbol string, date string, close double")
    df = df.withColumn("date", df["date"].cast("date"))
    out = (
        df.select("symbol", "date", indicators.rsi(14).alias("rsi"))
        .orderBy("date")
        .toPandas()
    )
    assert out["rsi"].iloc[:13].isna().all()  # warm-up
    assert (out["rsi"].iloc[13:] == 100.0).all()  # monotone gains
