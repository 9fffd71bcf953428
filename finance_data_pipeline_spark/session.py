"""SparkSession factory and session tuning.

The reference opens a MySQL connection per call
(fetch_and_store_multi.py:30-38); here one SparkSession serves every
operator and the "connection" cost disappears (SURVEY.md §3 EP1).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

APP_NAME = "finance-data-pipeline-spark"


def _cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = APP_NAME, shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) a local SparkSession tuned for the test harness.

    On a real cluster the same confs apply; only ``master`` changes.
    """
    cpus = _cpus()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # AQE: runtime re-planning — coalesces post-shuffle partitions,
        # converts to broadcast join when a side turns out small,
        # splits skewed shuffle partitions. Essential at 100 TB.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Runtime row-level filtering (Bloom filter from the selective
        # join side pushed into the probe scan) is ON by Spark 4
        # default and prunes fact row groups at 100 TB; asserted here
        # so a downgraded cluster default doesn't silently lose it.
        # Do NOT enable runtimeFilter.semiJoinReduction: measured to
        # hang the optimizer (InjectRuntimeFilter) on wide bitwise
        # projections (write_zordered's 48-term interleave).
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        # Arrow for every pandas boundary (applyInPandas, toPandas).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an externally-created session.

    The driver harness hands ``queries()`` a session we did not build;
    these settings are all runtime-mutable and make behavior
    deterministic (UTC date extraction must match the DuckDB oracle,
    which is timezone-naive).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    return spark
