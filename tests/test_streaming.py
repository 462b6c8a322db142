"""Structured Streaming variants == their oracle-checked batch twins.

The batch queries are proven against DuckDB (test_oracle); these tests
close the loop: the streaming plans (file source, availableNow trigger,
memory sink, watermarks) produce identical results on the same data.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_graft.registry import REGISTRY
from spark_graft.streaming import (
    dedup_stream,
    events_stream,
    run_stream_to_memory,
    session_counts_stream,
    tumbling_counts_stream,
    user_totals_stream,
)
from tests.compare import assert_frames_match


def test_streaming_source_is_streaming(spark, sf_dir):
    s = events_stream(spark, sf_dir)
    assert s.isStreaming


def test_tumbling_stream_equals_batch(spark, sf_dir):
    stream_out = run_stream_to_memory(tumbling_counts_stream(events_stream(spark, sf_dir)))
    batch_out = REGISTRY["stream_tumbling"].fn(spark, sf_dir)
    assert_frames_match(stream_out.toPandas(), batch_out.toPandas(), "tumbling stream==batch")


def test_session_stream_equals_batch(spark, sf_dir):
    """session_window must produce the same sessions as the batch
    lag+cumsum sessionization (same gap)."""
    stream_out = run_stream_to_memory(session_counts_stream(events_stream(spark, sf_dir)))
    batch = (
        REGISTRY["stream_session"]
        .fn(spark, sf_dir)
        .select("user_id", "session_start", "n_events")
    )
    assert_frames_match(stream_out.toPandas(), batch.toPandas(), "session stream==batch")


def test_stateful_user_totals_equals_batch(spark, sf_dir):
    """applyInPandasWithState emits cumulative per-user totals each
    micro-batch; the final (max) emission per user must equal the batch
    groupBy. count/max are order-insensitive, so equality is exact."""
    from spark_graft.sources import table

    emitted = run_stream_to_memory(
        user_totals_stream(events_stream(spark, sf_dir)), mode="update"
    )
    # cumulative counts are monotone: last emission == max(n_events)
    final = emitted.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"), F.max("max_value").alias("max_value")
    )
    batch = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.max("value").alias("max_value"))
    )
    assert_frames_match(final.toPandas(), batch.toPandas(), "stateful stream==batch")


def test_stream_dedup_collapses_duplicated_source(spark, sf_dir):
    """A self-unioned stream (every event delivered twice — the
    at-least-once failure mode) must dedup back to exactly the batch
    row count."""
    from spark_graft.sources import table

    doubled = events_stream(spark, sf_dir).union(events_stream(spark, sf_dir))
    out = run_stream_to_memory(
        dedup_stream(doubled).select("event_id"), mode="append"
    )
    assert out.count() == table(spark, sf_dir, "events").count()


def test_watermark_present_in_plan(spark, sf_dir):
    """The watermark node must actually be in the streaming plan (state
    eviction at scale depends on it)."""
    s = tumbling_counts_stream(events_stream(spark, sf_dir))
    assert "EventTimeWatermark" in s._jdf.queryExecution().logical().toString()
