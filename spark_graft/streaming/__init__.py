from spark_graft.streaming.structured import (
    attribution_join_stream,
    cep_pattern_stream,
    cms_cells_stream,
    dedup_stream,
    events_stream,
    minhash_novelty_stream,
    tumbling_counts_stream,
    session_counts_stream,
    sliding_counts_stream,
    user_totals_stream,
    run_stream_foreach_batch_to_parquet,
    run_stream_to_memory,
)

__all__ = [
    "attribution_join_stream",
    "cep_pattern_stream",
    "cms_cells_stream",
    "run_stream_foreach_batch_to_parquet",
    "dedup_stream",
    "events_stream",
    "minhash_novelty_stream",
    "tumbling_counts_stream",
    "session_counts_stream",
    "sliding_counts_stream",
    "user_totals_stream",
    "run_stream_to_memory",
]
