"""Pluggable fetch-adapter seam (SURVEY.md S1/S2).

The reference's ingestion starts at a network fetch
(``yf.download(symbol, start, end)`` — fetch_and_store_multi.py:283-290;
``yf.Ticker(s).history(period=...)`` — fetch_and_store.py:234-246). The
engine replaces the HTTP call with deterministic parquet-derived
fixtures, but keeps the *seam*: a user pointing at a live vendor
implements :class:`FetchAdapter` once and the rest of the pipeline
(normalize → clean → boundary → merge, ingest.ingest_batch) is
unchanged.

Contract notes for implementers:

* ``fetch`` returns a DataFrame in the VENDOR's raw column layout —
  ``ingest.ingest_batch`` runs ``normalize_stocks`` (rename map + casts
  + NaN defaults), so adapters do not normalize.
* Adapters must be deterministic per (symbols, start, end) call OR
  idempotent under refetch — the merge tolerates overlap (upsert), the
  reference's own re-run semantics.
* The adapter runs on the DRIVER and should return a lazily-evaluated
  DataFrame (e.g. a scan, or spark.createDataFrame over a bounded
  request window). Never fetch unbounded data eagerly into driver
  memory: a 100 TB backfill iterates bounded (symbols × date-range)
  windows, one ingest_batch per window.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Protocol

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class FetchAdapter(Protocol):
    """One method: fetch raw OHLCV rows for symbols in [start, end]."""

    def fetch(
        self,
        spark: SparkSession,
        symbols: Sequence[str],
        start: str,
        end: str,
    ) -> DataFrame: ...


class ParquetFixtureAdapter:
    """The in-repo adapter: serves the deterministic events-derived
    OHLCV fixture as if it were the vendor (S1 bulk + S2 range fetch).
    """

    def __init__(self, sf_dir: str):
        self.sf_dir = sf_dir

    def fetch(
        self,
        spark: SparkSession,
        symbols: Sequence[str],
        start: str,
        end: str,
    ) -> DataFrame:
        from finance_data_pipeline_spark import fixtures

        df = fixtures.stocks(spark, self.sf_dir)
        if symbols:
            df = df.filter(F.col("symbol").isin(*symbols))
        return df.filter(F.col("date").between(start, end))


def fetch_and_ingest(
    spark: SparkSession,
    adapter: FetchAdapter,
    symbols: Sequence[str],
    start: str,
    end: str,
    existing: DataFrame | None = None,
    store_path: str | None = None,
) -> DataFrame:
    """EP1 with a pluggable source: adapter.fetch → ingest_batch
    (normalize → clean → incremental boundary → merge → optional
    partitioned write). The reference's per-symbol fetch loop collapses
    into one fetch per (symbols, window) request."""
    from finance_data_pipeline_spark.ingest import ingest_batch

    raw = adapter.fetch(spark, symbols, start, end)
    return ingest_batch(raw, existing, store_path)
