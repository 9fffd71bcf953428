"""Ingestion pipeline: normalize → clean → merge → partitioned write.

The Spark restatement of the reference's EP1 loop (SURVEY.md §3):
``get_last_date``/``yf.download``/``upsert_rows`` per symbol
(fetch_and_store_multi.py:264-306) becomes one lazy plan over all
symbols — the per-symbol loop disappears into partitionBy, the per-call
MySQL connections into one session, DESCRIBE into a static schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from finance_data_pipeline_spark import quality
from finance_data_pipeline_spark.io import normalize_stocks, write_stocks

KEY = ["symbol", "date"]


def insert_ignore(new: DataFrame, existing: DataFrame, key: list[str] = KEY) -> DataFrame:
    """J4 — ``INSERT IGNORE`` (fetch_yfinance.py:24): keep only rows
    whose key is absent from the store. Left anti join; Catalyst/AQE
    broadcasts whichever side is small."""
    return new.join(existing.select(*key), key, "left_anti")


def upsert(
    existing: DataFrame,
    new: DataFrame,
    key: list[str] = KEY,
    order_col: str | None = None,
) -> DataFrame:
    """J5/A10 — ``INSERT … ON DUPLICATE KEY UPDATE`` (fetch_and_store.py:
    306-314; fetch_and_store_multi.py:218-240): new wins per key.

    Merge-on-read: tag each side with a priority, keep row_number()=1
    per key ordered by priority desc. One shuffle on the key. With a
    partitioned store, restrict ``existing`` to the partitions the batch
    touches before calling (partition-scoped merge — 100-TB-sane).

    ``order_col`` optionally breaks ties *within* the new batch
    (last-write-wins by that column).
    """
    tagged_old = existing.withColumn("_src", F.lit(0))
    tagged_new = new.withColumn("_src", F.lit(1))
    order = [F.desc("_src")] + ([F.desc(order_col)] if order_col else [])
    w = Window.partitionBy(*key).orderBy(*order)
    return (
        tagged_old.unionByName(tagged_new)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_src", "_rn")
    )


def dedup_keep_latest(df: DataFrame, key: list[str] = KEY, order_col: str = "date") -> DataFrame:
    """A10 — one row per key, keeping the newest by order_col."""
    w = Window.partitionBy(*key).orderBy(F.desc(order_col))
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def incremental_boundary(new: DataFrame, existing: DataFrame, key: str = "symbol") -> DataFrame:
    """J6 — per-key as-of boundary (fetch_and_store_multi.py:269-276):
    keep only rows strictly after each key's stored MAX(date); keys
    never seen pass through (the reference starts them at 2020-01-01).

    The max-date side is one row per key → broadcast join, no shuffle
    of the incoming batch.
    """
    maxdates = existing.groupBy(key).agg(F.max("date").alias("_max_date"))
    return (
        new.join(F.broadcast(maxdates), key, "left")
        .filter((F.col("date") > F.col("_max_date")) | F.col("_max_date").isNull())
        .drop("_max_date")
    )


def merge_daily_aggregate(existing_agg: DataFrame, new_events: DataFrame) -> DataFrame:
    """Incremental materialized-aggregate maintenance: fold a new event
    batch into an existing (day, event_type) aggregate WITHOUT
    re-scanning history — the algebraic-merge pattern behind every
    streaming/warehouse incremental view refresh.

    Works because the aggregate state is mergeable: counts add, decimal
    sums add. The merge is a union of the old agg (tiny — one row per
    (day, type)) with the new batch's partial agg, then one re-combine
    shuffle keyed on (day, type). History size never appears in the
    plan; at 100 TB the refresh cost is O(batch + aggregate), not
    O(history). Non-mergeable measures (exact medians) need sketches
    (see approx_value_percentiles) or a recompute. Correctness is
    oracle-checked: incremental over split halves ≡ one-shot aggregate
    (registry ``incremental_daily_agg``).

    For repeated refreshes keep the stored state in the DECIMAL form
    (streaming.daily_event_state / merge_daily_state) — passing the
    double presentation frame here costs one double→decimal cast, which
    is exact only while totals stay under ~2^53/100.
    """
    from finance_data_pipeline_spark.streaming import present_daily_aggregate

    return present_daily_aggregate(merge_daily_state(existing_agg, new_events))


def merge_daily_state(existing_state: DataFrame, new_events: DataFrame) -> DataFrame:
    """Decimal-state merge: fold a new event batch into the stored
    (day, event_type) state, total_value staying DECIMAL(18,2)
    throughout so chained refreshes never round-trip through double.
    Accepts either the decimal state or the double presentation frame
    (cast once on entry)."""
    from finance_data_pipeline_spark.streaming import daily_event_state

    partial = daily_event_state(new_events)
    base = existing_state.select(
        "day",
        "event_type",
        "n_events",
        F.col("total_value").cast("decimal(18,2)").alias("total_value"),
    )
    return (
        base.unionByName(partial)
        .groupBy("day", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("total_value").cast("decimal(18,2)").alias("total_value"),
        )
    )


def ingest_batch(
    raw: DataFrame,
    existing: DataFrame | None,
    store_path: str | None = None,
) -> DataFrame:
    """EP1 end-to-end: normalize (P9/P8) → clean (P6) → incremental
    boundary (J6) → upsert (J5) → optionally write partitioned by symbol."""
    batch = quality.clean(normalize_stocks(raw))
    if existing is not None:
        batch = incremental_boundary(batch, existing)
        merged = upsert(existing, batch)
    else:
        merged = dedup_keep_latest(batch, KEY, "date")
    if store_path:
        write_stocks(merged, store_path)
    return merged
