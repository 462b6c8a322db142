from spark_graft.streaming.structured import (
    dedup_stream,
    events_stream,
    tumbling_counts_stream,
    session_counts_stream,
    user_totals_stream,
    run_stream_to_memory,
)

__all__ = [
    "dedup_stream",
    "events_stream",
    "tumbling_counts_stream",
    "session_counts_stream",
    "user_totals_stream",
    "run_stream_to_memory",
]
