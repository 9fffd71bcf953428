"""Custom Spark 4 Python DataSource: the reference's market-data fetch
seam (fetch_yfinance.py:13-16, fetch_and_store_multi.py:283-290 —
`yf.download(symbol, ...)` per ticker) re-expressed as a FIRST-CLASS
pluggable source instead of driver-side HTTP glue.

`spark.read.format("synthetic_ohlcv")` plans one input partition PER
SYMBOL — exactly how a production fetch source would parallelize
per-ticker API calls across executors — and generates deterministic
OHLCV bars from a 60-bit md5 of (symbol, day), so the source is
reproducible, engine-portable, and fully oracle-checkable (the same
hash arithmetic replays in SQL). A real yfinance/REST implementation
would replace `_bar` with an HTTP call and keep every other line.

Usage:
    spark.dataSource.register(SyntheticOHLCVSource)
    df = (spark.read.format("synthetic_ohlcv")
          .option("symbols", "AAPL,MSFT").option("days", 30).load())
"""

from __future__ import annotations

import hashlib
from datetime import date, timedelta

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_SCHEMA = (
    "symbol string, date date, open double, high double, low double,"
    " close double, volume bigint"
)
_EPOCH = date(2024, 1, 1)


def _h60(key: str) -> int:
    """60-bit md5 prefix — identical to the engine's md5_token_hash /
    DuckDB's _md5_slice_sql, so the oracle replays each bar exactly."""
    return int(hashlib.md5(key.encode()).hexdigest()[:15], 16)


def _bar(symbol: str, day: int):
    """One deterministic OHLCV bar; all prices derive from integer
    cents so float formatting is engine-exact."""
    base = _h60(f"{symbol}:{day}")
    open_c = 10_000 + base % 90_000
    spread_c = 1 + _h60(f"{symbol}:{day}:s") % 2_000
    close_c = 10_000 + _h60(f"{symbol}:{day}:c") % 90_000
    high_c = max(open_c, close_c) + spread_c
    low_c = min(open_c, close_c) - spread_c
    volume = 1_000 + _h60(f"{symbol}:{day}:v") % 1_000_000
    return (
        symbol,
        _EPOCH + timedelta(days=day),
        open_c / 100.0,
        high_c / 100.0,
        low_c / 100.0,
        close_c / 100.0,
        volume,
    )


class _SymbolPartition(InputPartition):
    def __init__(self, symbol: str, days: int):
        self.symbol = symbol
        self.days = days


class _OHLCVReader(DataSourceReader):
    def __init__(self, options):
        self.symbols = [
            s.strip().upper()
            for s in options.get("symbols", "AAPL,MSFT,GOOG").split(",")
            if s.strip()
        ]
        self.days = int(options.get("days", 30))

    def partitions(self):
        # one partition per symbol = per-ticker fetch parallelism
        return [_SymbolPartition(s, self.days) for s in self.symbols]

    def read(self, partition):
        for day in range(partition.days):
            yield _bar(partition.symbol, day)


class _OHLCVStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the fetch seam: the reference's daily
    scheduled re-fetch ("fetch only days newer than MAX(date)",
    fetch_and_store_multi.py:264-306) as a FIRST-CLASS Spark streaming
    source — the day cursor lives in the query's checkpoint as the
    stream OFFSET, replacing the reference's hand-rolled MAX(date)
    bookkeeping. Each micro-batch advances the cursor by
    ``daysPerBatch`` days across all symbols until ``days`` is
    reached; a real market-data implementation would return today's
    new bars and advance to the current date.

    Simple-reader trade: rows are produced driver-side and shipped to
    executors (the documented SimpleDataSourceStreamReader contract) —
    right for a low-rate fetch seam; bulk backfill goes through the
    batch reader's per-symbol partitions. ``readBetweenOffsets``
    replays any committed range deterministically, so crash recovery
    re-delivers identical bars.
    """

    def __init__(self, options):
        self.symbols = [
            s.strip().upper()
            for s in options.get("symbols", "AAPL,MSFT,GOOG").split(",")
            if s.strip()
        ]
        self.max_days = int(options.get("days", 30))
        self.days_per_batch = int(options.get("daysPerBatch", 10))

    def initialOffset(self):
        return {"day": 0}

    def _rows(self, start_day: int, end_day: int):
        return [
            _bar(sym, d)
            for d in range(start_day, end_day)
            for sym in self.symbols
        ]

    def read(self, start):
        s = int(start["day"])
        e = min(s + self.days_per_batch, self.max_days)
        return iter(self._rows(s, e)), {"day": e}

    def readBetweenOffsets(self, start, end):
        return iter(self._rows(int(start["day"]), int(end["day"])))


class SyntheticOHLCVSource(DataSource):
    """format name: synthetic_ohlcv"""

    @classmethod
    def name(cls):
        return "synthetic_ohlcv"

    def schema(self):
        return _SCHEMA

    def reader(self, schema):
        return _OHLCVReader(self.options)

    def simpleStreamReader(self, schema):
        return _OHLCVStreamReader(self.options)
