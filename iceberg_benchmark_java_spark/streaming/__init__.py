from .events import (
    click_purchase_join_stream,
    dedup_against_corpus_stream,
    dedup_events_stream,
    enrich_events_stream,
    enrich_with_customer_stream,
    hourly_aggregate_stream,
    read_events_stream,
    run_stream_to_memory,
    run_stream_to_parquet,
    sessionize_stream,
    sessionize_stream_buffered,
    sessionize_stream_event_time,
)

__all__ = [
    "click_purchase_join_stream",
    "dedup_against_corpus_stream",
    "dedup_events_stream",
    "enrich_events_stream",
    "enrich_with_customer_stream",
    "hourly_aggregate_stream",
    "read_events_stream",
    "run_stream_to_memory",
    "run_stream_to_parquet",
    "sessionize_stream",
    "sessionize_stream_buffered",
    "sessionize_stream_event_time",
]
