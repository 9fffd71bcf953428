"""Vacuity guard over every oracle's OUTPUT (round-5 lesson): a hash
check on an empty frame, an all-NULL column, or an all-zero metric
column verifies nothing — nine queries shipped that way before the
round-5 sweep (singular OLS, never-firing crossover, cliques-only link
prediction, ...). This test re-runs the sweep in DuckDB only (no Spark
— both engines produce the same frame when the hash check passes) and
pins the known-benign residue as an explicit allowlist, so any NEW
degenerate output fails CI with the column named instead of riding a
vacuously-green driver row.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from finance_data_pipeline_spark.schemas import DRIVER_TABLES

SF_DIR = "/root/testdata/sf0.001"

# Known-benign degenerate columns at sf0.001 — each a REAL property of
# the synthetic corpus/fixture, documented at its query:
#   - warm-up masks: ma_200 is defined NULL until 200 bars exist
#     (~30-bar fixture); pairs zscore needs its rolling window filled
#   - corpus facts: no punctuation / phone patterns / duplicate lines /
#     English stopwords / NULL cells in the generated data
#   - by-construction zeros: silence runs start at t=0; in-sample VaR
#     never rejects (the documented Kupiec property); no structural
#     breaks in the random-walk fixture; quality scores are integers
#     with >50% mass at the median (MAD 0); single-language docs give
#     the runner-up language zero marker hits; query_id 0 is a valid id
ALLOWED_NULL = {
    ("ma_warmup", "ma_200"),
    ("dashboard_frame", "ma_200"),
    ("pairs_spread_zscore", "zscore"),
}
ALLOWED_ZERO = {
    ("text_stats", "punct_ratio"),
    ("pii_scrub", "n_phone"),
    ("gopher_quality", "symbol_word_ratio"),
    ("gopher_quality", "dup_line_frac"),
    ("gopher_quality", "keep"),
    ("profile_table", "n_nulls"),
    ("ann_topk_lsh", "query_id"),
    ("canonical_dedup_stats", "n_dropped"),
    ("candlestick_patterns", "is_hammer"),
    ("candlestick_patterns", "bullish_engulf"),
    ("candlestick_patterns", "bearish_engulf"),
    ("media_silence_runs", "first_run_start"),
    ("robust_quality_by_lang", "mad_quality"),
    ("robust_quality_by_lang", "n_outliers"),
    ("cusum_break", "is_break"),
    ("var_backtest_kupiec", "reject_95"),
    ("lang_id_margin", "second_hits"),
}


@pytest.fixture(scope="module")
def oracle_frames():
    from finance_data_pipeline_spark.registry import ORACLES

    con = duckdb.connect()
    for t in DRIVER_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return {name: con.sql(sql).df() for name, sql in ORACLES.items()}


def test_no_oracle_is_empty(oracle_frames):
    empty = [n for n, df in oracle_frames.items() if len(df) == 0]
    assert not empty, f"vacuous (empty) oracle outputs at sf0.001: {empty}"


def test_no_new_all_null_columns(oracle_frames):
    found = {
        (n, c)
        for n, df in oracle_frames.items()
        for c in df.columns
        if df[c].isna().all()
    }
    new = found - ALLOWED_NULL
    assert not new, f"new all-NULL oracle columns (hash checks them vacuously): {sorted(new)}"


def test_no_new_all_zero_metric_columns(oracle_frames):
    found = set()
    for n, df in oracle_frames.items():
        if len(df) <= 1:
            continue  # single-row summaries legitimately hit exact zeros
        for c in df.columns:
            col = df[c]
            if not pd.api.types.is_numeric_dtype(col):
                continue
            nn = col.dropna()
            if len(nn) and (nn == 0).all():
                found.add((n, c))
    new = found - ALLOWED_ZERO
    assert not new, f"new all-zero oracle metric columns: {sorted(new)}"
