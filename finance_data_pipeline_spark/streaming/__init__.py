from finance_data_pipeline_spark.streaming.pipeline import (
    daily_event_aggregate,
    daily_event_state,
    dedup_in_stream,
    enrich_stream,
    interval_join_streams,
    neardup_gate,
    present_daily_aggregate,
    stateful_continuity,
    stateful_running_totals,
    stream_events,
    stream_ingest_stocks,
    streaming_daily_aggregate,
)

__all__ = [
    "stream_events",
    "streaming_daily_aggregate",
    "daily_event_aggregate",
    "daily_event_state",
    "present_daily_aggregate",
    "dedup_in_stream",
    "enrich_stream",
    "interval_join_streams",
    "neardup_gate",
    "stateful_continuity",
    "stateful_running_totals",
    "stream_ingest_stocks",
]
