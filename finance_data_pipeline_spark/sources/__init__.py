"""Source/sink surface (SURVEY.md §2.1 S1-S7).

The implementations live in :mod:`finance_data_pipeline_spark.io`;
this package re-exports them under the layout's ``sources`` name.
Parquet is the primary store (columnar, pushdown, partition pruning);
CSV/JSON are interchange formats, ORC the alternate columnar store.
"""

from finance_data_pipeline_spark.io import (
    DEFAULT_SF_DIR,
    export_csv,
    export_json,
    export_orc,
    normalize_stocks,
    read_csv,
    read_jdbc,
    read_json,
    read_orc,
    register_views,
    table,
    write_bucketed,
    write_jdbc,
    write_stocks,
)
from finance_data_pipeline_spark.sources.adapters import (
    FetchAdapter,
    ParquetFixtureAdapter,
    fetch_and_ingest,
)

__all__ = [
    "DEFAULT_SF_DIR",
    "FetchAdapter",
    "ParquetFixtureAdapter",
    "export_csv",
    "export_json",
    "export_orc",
    "fetch_and_ingest",
    "normalize_stocks",
    "read_csv",
    "read_jdbc",
    "read_json",
    "read_orc",
    "register_views",
    "table",
    "write_bucketed",
    "write_jdbc",
    "write_stocks",
]
