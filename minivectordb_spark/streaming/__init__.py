from minivectordb_spark.streaming.events import (
    hourly_event_counts,
    read_source_stats,
    session_rollup,
    stream_decontaminated_ingest,
    stream_ivf_index_ingest,
    stream_quality_ingest,
    stream_durable_ingest,
    stream_events,
    stream_neardup_ingest,
    stream_source_stats_ingest,
    stream_vector_ingest,
)

__all__ = [
    "hourly_event_counts",
    "read_source_stats",
    "session_rollup",
    "stream_decontaminated_ingest",
    "stream_ivf_index_ingest",
    "stream_quality_ingest",
    "stream_durable_ingest",
    "stream_events",
    "stream_neardup_ingest",
    "stream_source_stats_ingest",
    "stream_vector_ingest",
]
