"""Performance summaries and comparison queries (SURVEY.md A3-A9, W13, EP2/EP3).

``generate_performance_summary`` (analyze_visualize.py:234-300) prints a
dozen scalar statistics for one symbol; here it is one groupBy producing
the same statistics for every symbol at once. ``compare`` restates
``compare_multiple_stocks`` (analyze_visualize.py:302-349);
``dashboard_frame`` restates EP3 (dashboard.py:43-98).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from finance_data_pipeline_spark.indicators import daily_return, ma, normalize_to_100


def performance_summary(stocks: DataFrame, time_col: str = "date") -> DataFrame:
    """A3-A9 in one aggregation.

    pandas `.std()` is sample std → stddev_samp (SURVEY.md §7.4). The
    reference's "annualized" Sharpe multiplies mean and std by √252,
    which cancels (analyze_visualize.py:278-280) — replicated faithfully
    as mean/std.
    """
    ret = daily_return(time_col=time_col)
    with_ret = stocks.withColumn("_ret", ret)
    return (
        with_ret.groupBy("symbol")
        .agg(
            F.count("*").alias("trading_days"),
            F.min(time_col).alias("period_start"),
            F.max(time_col).alias("period_end"),
            F.min_by("close", time_col).alias("first_close"),
            F.max_by("close", time_col).alias("last_close"),
            F.max("high").alias("highest_high"),
            F.min("low").alias("lowest_low"),
            F.avg("_ret").alias("avg_daily_return"),
            F.stddev_samp("_ret").alias("return_volatility"),
            F.max("_ret").alias("best_day"),
            F.min("_ret").alias("worst_day"),
            F.avg("volume").alias("avg_volume"),
            F.max("volume").alias("max_volume"),
        )
        .withColumn(
            "total_return_pct",
            (F.col("last_close") - F.col("first_close")) / F.col("first_close") * 100,
        )
        .withColumn("sharpe", F.col("avg_daily_return") / F.col("return_volatility"))
    )


def compare(stocks: DataFrame, symbols: Sequence[str], time_col: str = "date") -> DataFrame:
    """Multi-symbol comparison (analyze_visualize.py:302-349): validate
    symbols (P7, isin — semi-join semantics), normalize each series to
    100 at its first observation (W13)."""
    return (
        stocks.filter(F.col("symbol").isin(*symbols))
        .withColumn("normalized", normalize_to_100(time_col=time_col))
        .select("symbol", time_col, "close", "normalized")
    )


def dashboard_frame(
    stocks: DataFrame,
    symbol: str,
    start,
    end,
    ma_windows: Sequence[int] = (50, 200),
    time_col: str = "date",
) -> DataFrame:
    """EP3 — dashboard query (dashboard.py:27, 64-65, 35-38): symbol
    equality + date-between + MA overlays with min_periods=n warm-up
    (pandas rolling(n) default — leading nulls).

    Note the reference filters symbol in SQL but dates client-side
    (SURVEY.md §4); here both predicates reach the Parquet scan.
    Windows are computed *after* the symbol filter but **before** the
    date filter would bias them — so filter dates after windowing only
    if the MA should see pre-range history; the reference computes MAs
    on the filtered frame, replicated here (filter first).
    """
    filtered = stocks.filter(
        (F.col("symbol") == symbol) & F.col(time_col).between(start, end)
    )
    out = filtered
    for n in ma_windows:
        out = out.withColumn(f"ma_{n}", ma("close", n, time_col))
    return out
