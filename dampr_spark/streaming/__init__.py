from dampr_spark.streaming.pipeline import (
    hourly_aggregate,
    read_events_stream,
    run_to_memory,
    running_user_totals,
    session_counts,
    session_finalize,
    stream_click_attribution,
    streaming_dedup,
)

__all__ = [
    "hourly_aggregate",
    "read_events_stream",
    "run_to_memory",
    "running_user_totals",
    "session_counts",
    "session_finalize",
    "stream_click_attribution",
    "streaming_dedup",
]
