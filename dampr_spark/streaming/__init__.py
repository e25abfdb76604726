from dampr_spark.streaming.pipeline import (
    hopping_aggregate,
    hourly_aggregate,
    incremental_dedup_stream,
    read_events_stream,
    run_to_memory,
    running_user_totals,
    session_counts,
    session_finalize,
    stream_click_attribution,
    streaming_dedup,
)

__all__ = [
    "hopping_aggregate",
    "hourly_aggregate",
    "incremental_dedup_stream",
    "read_events_stream",
    "run_to_memory",
    "running_user_totals",
    "session_counts",
    "session_finalize",
    "stream_click_attribution",
    "streaming_dedup",
]
