"""finance_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new, idiomatic-Spark reimplementation of the query and
data-processing capabilities of ``DivyanshiSahu2024/finance-data-pipeline``
(see SURVEY.md), extended with large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns).

Design principles (SURVEY.md §7, BASELINE.json north star):

* Declarative DataFrame/SQL plans — let Catalyst pick physical strategy.
* No driver-side collects inside operators; no per-key Python loops.
* Built-in ``pyspark.sql.functions`` everywhere; Arrow-batched
  ``applyInPandas`` only where semantics require it (pandas ``ewm``).
* Every operator valid at 100 TB: partition-prunable layouts, broadcast
  hints for dimension joins, map-side partial aggregation, AQE-friendly.
"""

__version__ = "0.1.0"

from finance_data_pipeline_spark.session import get_spark, tune_session

__all__ = ["get_spark", "tune_session", "__version__"]
