"""Canonical schemas.

The reference discovers its schema at runtime with ``DESCRIBE stocks``
and adapts the INSERT column list (fetch_and_store_multi.py:84-111,
202-214). Here the schema is a static contract; "adaptation" becomes a
pure normalization function over a rename map (SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql import types as T

# The reference's one persistent table (fetch_yfinance.py:24-25;
# fetch_and_store_multi.py:218-228). Logical primary key (symbol, date).
STOCKS = T.StructType(
    [
        T.StructField("symbol", T.StringType(), False),
        T.StructField("date", T.DateType(), False),
        T.StructField("open", T.DoubleType(), True),
        T.StructField("high", T.DoubleType(), True),
        T.StructField("low", T.DoubleType(), True),
        T.StructField("close", T.DoubleType(), True),
        T.StructField("adj_close", T.DoubleType(), True),
        T.StructField("volume", T.LongType(), True),
    ]
)

# Column spellings the reference probes for (fetch_and_store_multi.py:96-107),
# normalized to the canonical names above.
RENAME_MAP = {
    "Symbol": "symbol",
    "Date": "date",
    "Open": "open",
    "High": "high",
    "Low": "low",
    "Close": "close",
    "Adj Close": "adj_close",
    "Adj_Close": "adj_close",
    "AdjClose": "adj_close",
    "adjclose": "adj_close",
    "Volume": "volume",
}

# Driver-provided tables (TESTDATA.md / FIXTURES.md §3).
DRIVER_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
