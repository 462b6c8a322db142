"""Structured Streaming variants == their oracle-checked batch twins.

The batch queries are proven against DuckDB (test_oracle); these tests
close the loop: the streaming plans (file source, availableNow trigger,
memory sink, watermarks) produce identical results on the same data.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

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


def test_foreach_batch_parquet_sink(spark, sf_dir, tmp_path):
    """foreachBatch parquet sink: the drained stream's rows equal the
    batch source, and every row carries its micro-batch id."""
    from spark_graft.sources import table
    from spark_graft.streaming import run_stream_foreach_batch_to_parquet

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_stream_foreach_batch_to_parquet(
        events_stream(spark, sf_dir).select("event_id"), out, ckpt
    )
    back = spark.read.parquet(out)
    assert back.count() == table(spark, sf_dir, "events").count()
    assert "batch_id" in back.columns


def test_watermark_drops_late_data(spark, tmp_path):
    """An event older than the advancing watermark must be DROPPED, not
    aggregated. Three single-file micro-batches (maxFilesPerTrigger=1,
    mtimes force the order): A (12:00, 12:01) advances the watermark to
    11:01; B (14:00) advances it to 13:00; C delivers a 09:00 straggler
    — now far below the watermark — plus an on-time 15:00 event. The
    late-row filter lags the watermark update by one batch (measured),
    which is why the straggler arrives two batches after the rows that
    made it late. Append mode emits only finalized windows, so the
    expected output is exactly the 12:00 window with both on-time rows
    and NO 09:00 window."""
    import os
    import time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "src"
    src.mkdir()

    def write_file(name: str, rows: list[tuple[int, str]]) -> None:
        pdf = pd.DataFrame(
            {"id": [r[0] for r in rows], "ts": pd.to_datetime([r[1] for r in rows])}
        )
        t = pa.Table.from_pandas(pdf, preserve_index=False).cast(
            pa.schema([("id", pa.int64()), ("ts", pa.timestamp("us"))])
        )
        pq.write_table(t, str(src / name))

    write_file("a.parquet", [(1, "2024-01-01 12:00:00"), (2, "2024-01-01 12:01:00")])
    write_file("b.parquet", [(3, "2024-01-01 14:00:00")])
    write_file("c.parquet", [(4, "2024-01-01 09:00:00"), (5, "2024-01-01 15:00:00")])
    now = time.time()
    for i, name in enumerate(["a.parquet", "b.parquet", "c.parquet"]):
        os.utime(src / name, (now + i * 10, now + i * 10))

    stream = (
        spark.readStream.schema("id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    out = run_stream_to_memory(stream, mode="append").collect()
    got = sorted((str(r["ws"]), r["n"]) for r in out)
    assert got == [("2024-01-01 12:00:00", 2)], got


def test_stream_stream_join_equals_batch(spark, sf_dir):
    """The watermarked stream-stream attribution join must produce
    exactly the batch interval join's pairs: with availableNow replay
    the watermark admits every row, so buffering-based matching and
    sort-based matching see the same data."""
    from spark_graft.sources import table
    from spark_graft.streaming.structured import ATTRIB_WINDOW_MIN, attribution_join_stream

    stream_out = run_stream_to_memory(
        attribution_join_stream(events_stream(spark, sf_dir)), mode="append"
    )
    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("ts").alias("click_ts"), F.col("event_id").alias("click_id")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    batch = (
        clicks.join(
            purchases,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("click_ts") + F.expr(f"INTERVAL {ATTRIB_WINDOW_MIN} MINUTES")
            ),
        )
        .select("user_id", "click_id", "click_ts", "purchase_id", "purchase_ts", "purchase_value")
    )
    assert batch.count() > 0
    assert_frames_match(stream_out.toPandas(), batch.toPandas(), "attribution stream==batch")


def test_sliding_stream_equals_batch(spark, sf_dir):
    """Hopping windows under a watermark == the batch sliding query."""
    from spark_graft.streaming.structured import sliding_counts_stream

    stream_out = run_stream_to_memory(
        sliding_counts_stream(events_stream(spark, sf_dir))
    )
    batch_out = REGISTRY["stream_sliding"].fn(spark, sf_dir)
    assert_frames_match(
        stream_out.toPandas(), batch_out.toPandas(), "sliding stream==batch"
    )


def _staggered_files(src, files):
    """Write each (name, rows) as its own parquet with increasing mtime
    so maxFilesPerTrigger=1 processes them as ordered micro-batches —
    real incremental progression, one file per batch, state carried
    across batches through the checkpoint."""
    import os
    import time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    src.mkdir(exist_ok=True)
    now = time.time()
    for i, (name, rows) in enumerate(files):
        pdf = pd.DataFrame(
            {"id": [r[0] for r in rows], "ts": pd.to_datetime([r[1] for r in rows])}
        )
        t = pa.Table.from_pandas(pdf, preserve_index=False).cast(
            pa.schema([("id", pa.int64()), ("ts", pa.timestamp("us"))])
        )
        pq.write_table(t, str(src / name))
        os.utime(src / name, (now + i * 10, now + i * 10))


def test_multi_batch_tumbling_state_evolves(spark, tmp_path):
    """VERDICT r6 item 5: ≥3 DISTINCT micro-batches through foreachBatch,
    asserting the aggregation state actually evolves incrementally —
    the 12:00 window's count emitted by batch 0 (2 events) is UPDATED by
    batch 1 (4 events, same window + a new 12:05 window), and batch 2
    touches only its own 15:00 window. This is the gap between
    "availableNow equals batch" and "runs unbounded": update-mode
    emissions prove state is carried and re-emitted across batches, not
    recomputed from scratch."""
    _staggered_files(
        tmp_path / "src",
        [
            ("b0.parquet", [(1, "2024-01-01 12:00:00"), (2, "2024-01-01 12:01:00")]),
            ("b1.parquet", [(3, "2024-01-01 12:02:00"), (4, "2024-01-01 12:03:00"),
                            (5, "2024-01-01 12:05:00")]),
            ("b2.parquet", [(6, "2024-01-01 15:00:00")]),
        ],
    )
    from spark_graft.streaming import run_stream_foreach_batch_to_parquet

    agg = (
        spark.readStream.schema("id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "src"))
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    out = tmp_path / "out"
    run_stream_foreach_batch_to_parquet(
        agg, str(out), str(tmp_path / "ckpt"), output_mode="update"
    )
    got = {
        (r["batch_id"], str(r["ws"]), r["n"])
        for r in spark.read.parquet(str(out)).collect()
    }
    assert got == {
        (0, "2024-01-01 12:00:00", 2),            # batch 0: window opens
        (1, "2024-01-01 12:00:00", 4),            # batch 1: SAME window updated
        (1, "2024-01-01 12:05:00", 1),            # batch 1: new window
        (2, "2024-01-01 15:00:00", 1),            # batch 2: untouched windows silent
    }, got


def test_multi_batch_dedup_state_evicted_past_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark state EVICTION across micro-batches:
    key 100 emits in batch 0 (ts 12:00); batch 1's 15:00 event advances
    the watermark to 14:00, which expires key 100's state (12:00 + 1h
    delay < 14:00). Both the watermark update and the eviction lag one
    batch (measured — same lag the late-data test documents), so batch 2
    is a spacer; batch 3's on-time reappearance of key 100 at 14:55
    then emits AGAIN — while key 200's late row at 12:30 (below the
    watermark) is dropped. One key emitted twice proves eviction; the
    dropped straggler proves the late filter — together they are the
    unbounded-run semantics the availableNow equivalence tests can't
    see."""
    _staggered_files(
        tmp_path / "src",
        [
            ("b0.parquet", [(100, "2024-01-01 12:00:00"), (200, "2024-01-01 12:10:00")]),
            ("b1.parquet", [(300, "2024-01-01 15:00:00")]),
            ("b2.parquet", [(400, "2024-01-01 15:10:00")]),
            ("b3.parquet", [(100, "2024-01-01 14:55:00"), (200, "2024-01-01 12:30:00")]),
        ],
    )
    from spark_graft.streaming import run_stream_foreach_batch_to_parquet

    dedup = (
        spark.readStream.schema("id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "src"))
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["id"])
    )
    out = tmp_path / "out"
    run_stream_foreach_batch_to_parquet(dedup, str(out), str(tmp_path / "ckpt"))
    got = sorted(
        (r["batch_id"], r["id"], str(r["ts"]))
        for r in spark.read.parquet(str(out)).collect()
    )
    assert got == [
        (0, 100, "2024-01-01 12:00:00"),
        (0, 200, "2024-01-01 12:10:00"),
        (1, 300, "2024-01-01 15:00:00"),
        (2, 400, "2024-01-01 15:10:00"),
        (3, 100, "2024-01-01 14:55:00"),  # re-emitted: state was evicted
    ], got


def test_processing_time_trigger_wall_clock(spark, tmp_path):
    """VERDICT r7 item 8: the same state evolution as the availableNow /
    staggered-replay tests, under a REAL wall-clock processingTime
    trigger — the query runs unbounded while files arrive, micro-batches
    fire on the timer, and update-mode emissions prove the 12:00
    window's state is carried and updated across wall-clock batches.
    Batch ids are timer-dependent (no-data ticks may claim ids), so the
    assertion is on the ORDERED SEQUENCE of emissions, not exact ids."""
    src = tmp_path / "src"
    out = tmp_path / "out"
    src.mkdir()

    def drop(name, rows):
        _staggered_files(src, [(name, rows)])

    drop("b0.parquet", [(1, "2024-01-01 12:00:00"), (2, "2024-01-01 12:01:00")])

    agg = (
        spark.readStream.schema("id long, ts timestamp")
        .parquet(str(src))
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )

    def write_batch(batch_df, batch_id):
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(str(out))

    q = (
        agg.writeStream.foreachBatch(write_batch)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        q.processAllAvailable()
        drop("b1.parquet", [(3, "2024-01-01 12:02:00"), (4, "2024-01-01 12:03:00"),
                            (5, "2024-01-01 12:05:00")])
        q.processAllAvailable()
        drop("b2.parquet", [(6, "2024-01-01 15:00:00")])
        q.processAllAvailable()
        assert q.isActive  # genuinely unbounded until we stop it
        assert q.lastProgress["batchId"] >= 2  # >= 3 wall-clock batches ran
    finally:
        q.stop()
        q.awaitTermination()

    rows = sorted(
        ((r["batch_id"], str(r["ws"]), r["n"]))
        for r in spark.read.parquet(str(out)).collect()
    )
    emissions = [(ws, n) for _, ws, n in rows]
    assert emissions == [
        ("2024-01-01 12:00:00", 2),   # first wall-clock batch: window opens
        ("2024-01-01 12:00:00", 4),   # later batch UPDATES the same window
        ("2024-01-01 12:05:00", 1),   # and opens a new one
        ("2024-01-01 15:00:00", 1),   # final batch touches only its own
    ], rows
    # the update and the open ride the SAME batch; the other two differ
    bids = [b for b, _, _ in rows]
    assert bids[1] == bids[2] and bids[0] < bids[1] < bids[3], rows


def test_checkpoint_restart_resumes_state_and_offsets(spark, tmp_path):
    """VERDICT r8 item 3 — exactly-once across PROCESS restart, the core
    production failure mode: run a checkpointed windowed aggregation to
    completion, terminate the query, drop MORE input, then start a
    BRAND-NEW query object from the same checkpoint. The restarted run
    must (a) resume source offsets — its first batch id continues the
    old run's numbering and none of the already-processed rows are
    re-read or re-emitted — and (b) restore aggregation state — its
    update for the carried 12:00 window counts the pre-restart events
    it never itself read (4 = 3 restored + 1 new). A lost checkpoint
    would re-emit batches 0/1 (offsets) or emit n=1 for the window
    (state); both would fail the exact assertion below."""

    src, out = tmp_path / "src", tmp_path / "out"
    ckpt = str(tmp_path / "ckpt")

    def make_query():
        agg = (
            spark.readStream.schema("id long, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "5 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("ws"), "n")
        )

        def write_batch(batch_df, batch_id):
            batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(str(out))

        return (
            agg.writeStream.foreachBatch(write_batch)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    # ---- run 1: two micro-batches, then the query TERMINATES ----
    _staggered_files(
        src,
        [
            ("b0.parquet", [(1, "2024-01-01 12:00:00"), (2, "2024-01-01 12:01:00")]),
            ("b1.parquet", [(3, "2024-01-01 12:02:00")]),
        ],
    )
    q1 = make_query()
    q1.awaitTermination()
    assert not q1.isActive
    run1 = sorted(
        (r["batch_id"], str(r["ws"]), r["n"])
        for r in spark.read.parquet(str(out)).collect()
    )
    assert run1 == [
        (0, "2024-01-01 12:00:00", 2),
        (1, "2024-01-01 12:00:00", 3),
    ], run1

    # ---- more data arrives while no query is running ----
    import time

    later = time.time() + 60
    _staggered_files(
        src,
        [("b2.parquet", [(4, "2024-01-01 12:03:00"), (5, "2024-01-01 15:00:00")])],
    )
    import os

    os.utime(src / "b2.parquet", (later, later))

    # ---- run 2: NEW StreamingQuery, same checkpoint ----
    q2 = make_query()
    q2.awaitTermination()
    all_rows = sorted(
        (r["batch_id"], str(r["ws"]), r["n"])
        for r in spark.read.parquet(str(out)).collect()
    )
    run2 = [row for row in all_rows if row not in run1]
    # offsets resumed: batches 0/1 are NOT re-emitted (all_rows still
    # contains run1 exactly once), and the restarted run CONTINUES the
    # old numbering (>= 2; run 1's availableNow may claim a trailing
    # no-data batch id for the watermark commit, so the exact id is
    # timer-dependent) — a fresh checkpoint would restart at batch 0
    # and re-emit the 12:00 window from scratch.
    assert all_rows == run1 + run2, all_rows
    assert [(ws, n) for _, ws, n in run2] == [
        ("2024-01-01 12:00:00", 4),  # state restored: 3 carried + 1 new
        ("2024-01-01 15:00:00", 1),  # the genuinely new window
    ], run2
    bids = {b for b, _, _ in run2}
    assert len(bids) == 1 and bids.pop() >= 2, run2


def test_cms_stream_equals_batch_and_cells_merge(spark, sf_dir):
    """Streaming windowed count-min sketch (cms_cells_stream): (a) the
    incremental per-window cell grid equals the same grid computed in
    one batch pass, and (b) MERGEABILITY — summing cells across windows
    equals the whole-corpus sketch, i.e. grids add without rescanning
    events. (b) is the property that makes a sketch the right streaming
    state: bounded per-window cells, arbitrary rollups for free."""
    from spark_graft.operators.relational import CMS_DEPTH, _cms_bucket_spark
    from spark_graft.sources import table
    from spark_graft.streaming.structured import cms_cells_stream

    stream_out = run_stream_to_memory(cms_cells_stream(events_stream(spark, sf_dir)))

    ev = table(spark, sf_dir, "events")
    fan = ev.select(
        "ts",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cms_bucket_spark(F.col("user_id").cast("string"), d).alias("bucket"),
                    )
                    for d in range(CMS_DEPTH)
                ]
            )
        ).alias("db"),
    )
    batch = (
        fan.groupBy(
            F.window("ts", "60 minutes").alias("w"),
            F.col("db.d").alias("d"),
            F.col("db.bucket").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("cell"))
        .select(F.col("w.start").alias("window_start"), "d", "bucket", "cell")
    )
    assert_frames_match(stream_out.toPandas(), batch.toPandas(), "cms stream==batch")

    # mergeability: cell-wise sum over windows == one-pass corpus sketch
    merged = (
        stream_out.groupBy("d", "bucket").agg(F.sum("cell").alias("cell")).toPandas()
    )
    corpus = (
        fan.groupBy(F.col("db.d").alias("d"), F.col("db.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cell"))
        .toPandas()
    )
    assert_frames_match(merged, corpus, "cms merged==corpus")


def test_minhash_novelty_stream_equals_batch_gate(spark, tmp_path):
    """minhash_novelty_stream == dedup_incremental_minhash: the same
    corpus flows once through the batch gate (old deciles = index, last
    decile = new batch) and once as 3 ordered micro-batches (two index
    chunks, then the new batch) through the stateful streaming gate;
    the accepted new-doc sets must be identical. The engineered corpus
    pins the three interesting paths: a new exact copy of an OLD doc
    (rejected via state accumulated two micro-batches earlier), a novel
    new doc (accepted), and a new exact copy of THAT new doc (rejected
    via in-batch keep-first — state written and probed within one
    micro-batch)."""
    import os
    import time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_graft.streaming import minhash_novelty_stream, run_stream_to_memory

    t0 = " ".join(f"alpha{i} beta{i}" for i in range(25))  # 50 words
    t0_edit = t0.replace("alpha12", "gamma12")  # 45/51 shingles -> j~0.88
    t1 = " ".join(f"delta{i} eps{i}" for i in range(25))
    texts = {}
    for i in range(40):
        texts[i] = f"unique{i}x unique{i}y unique{i}z unique{i}w unique{i}v"
    texts[0] = t0  # old, the index content
    texts[19] = t0  # new: exact copy of old doc 0 -> rejected
    texts[29] = t0_edit  # new: near-dup of old doc 0 (if bands collide)
    texts[9] = t1  # new: novel -> accepted
    texts[39] = t1  # new: exact copy of new doc 9 -> in-batch rejected

    # batch gate over the full corpus
    doc_dir = tmp_path / "docs"
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in sorted(texts.items())],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(str(doc_dir / "documents.parquet"))
    accepted_batch = {
        r["doc_id"]
        for r in REGISTRY["dedup_incremental_minhash"].fn(spark, str(doc_dir)).collect()
    }

    # same corpus as ordered micro-batches: index chunks first, then new
    src = tmp_path / "stream_src"
    src.mkdir()
    old_ids = sorted(i for i in texts if i % 10 != 9)
    new_ids = sorted(i for i in texts if i % 10 == 9)
    chunks = [old_ids[:20], old_ids[20:], new_ids]
    now = time.time()
    for ci, ids in enumerate(chunks):
        t = pa.Table.from_pandas(
            pd.DataFrame({"doc_id": ids, "text": [texts[i] for i in ids]}),
            preserve_index=False,
        ).cast(pa.schema([("doc_id", pa.int64()), ("text", pa.string())]))
        pq.write_table(t, str(src / f"c{ci}.parquet"))
        os.utime(src / f"c{ci}.parquet", (now + ci * 10, now + ci * 10))
    docs_stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    pairs = run_stream_to_memory(
        minhash_novelty_stream(docs_stream), mode="append"
    ).collect()
    rejected_stream = {r["new_id"] for r in pairs if r["new_id"] % 10 == 9}
    accepted_stream = set(new_ids) - rejected_stream

    assert accepted_stream == accepted_batch, (accepted_stream, accepted_batch)
    assert 19 in rejected_stream  # copy of an old doc: cross-batch state
    assert 39 in rejected_stream  # copy of a same-batch doc: keep-first
    assert 9 in accepted_stream  # novel content admitted
    # other_id always precedes new_id in arrival (= doc_id) order
    assert all(r["other_id"] < r["new_id"] for r in pairs)
    # pair-multiplicity contract: a pair may repeat once per colliding
    # band (consumers dedup), but never more than N_BANDS times
    from collections import Counter

    from spark_graft.operators.dedup import N_BANDS

    mult = Counter((r["new_id"], r["other_id"]) for r in pairs)
    assert max(mult.values()) <= N_BANDS, mult.most_common(3)


def test_minhash_novelty_stream_seeded_restart_equals_batch_gate(spark, tmp_path):
    """Bootstrap-from-corpus (VERDICT r11 item 8): a fresh deployment
    with NO checkpoint streams ONLY the new batch, seeded with the
    persisted band index of the previously-admitted corpus
    (`build_novelty_seed_index`); the accepted set must equal
    `dedup_incremental_minhash` over old+new TOGETHER. The corpus
    engineers the three paths: a new exact copy of a SEED doc (rejected
    purely from the seed — doc 0 never flows through this stream), a
    novel doc (accepted), and an exact copy of that novel doc
    (in-batch keep-first rejection, state written on top of the seed).
    An UNSEEDED run over the same new-batch-only stream re-admits the
    known copy — proving the seed is what closes the redeploy hole."""
    import os
    import time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_graft.streaming import (
        build_novelty_seed_index,
        minhash_novelty_stream,
        run_stream_to_memory,
    )

    t0 = " ".join(f"alpha{i} beta{i}" for i in range(25))
    t1 = " ".join(f"delta{i} eps{i}" for i in range(25))
    texts = {}
    for i in range(40):
        texts[i] = f"unique{i}x unique{i}y unique{i}z unique{i}w unique{i}v"
    texts[0] = t0  # old (seed) content
    texts[19] = t0  # new: exact copy of seed doc 0 -> rejected via seed
    texts[9] = t1  # new: novel -> accepted
    texts[39] = t1  # new: exact copy of new doc 9 -> in-batch rejected

    doc_dir = tmp_path / "docs"
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in sorted(texts.items())],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(str(doc_dir / "documents.parquet"))
    accepted_batch = {
        r["doc_id"]
        for r in REGISTRY["dedup_incremental_minhash"].fn(spark, str(doc_dir)).collect()
    }

    old_ids = sorted(i for i in texts if i % 10 != 9)
    new_ids = sorted(i for i in texts if i % 10 == 9)
    # the old deployment's admitted corpus -> persisted band index,
    # saved through the r13 artifact contract (meta + sha + training
    # fingerprint of the admitted corpus' documents table)
    from spark_graft.artifacts import save_novelty_seed_index

    seed_path = str(tmp_path / "seed_index_artifact")
    save_novelty_seed_index(
        seed_path,
        build_novelty_seed_index(
            spark.createDataFrame(
                [(i, texts[i]) for i in old_ids], "doc_id bigint, text string"
            )
        ),
        sf_dir=str(doc_dir),
    )

    # the restarted deployment sees ONLY the new batch
    src = tmp_path / "stream_src_new_only"
    src.mkdir()
    t = pa.Table.from_pandas(
        pd.DataFrame({"doc_id": new_ids, "text": [texts[i] for i in new_ids]}),
        preserve_index=False,
    ).cast(pa.schema([("doc_id", pa.int64()), ("text", pa.string())]))
    pq.write_table(t, str(src / "new.parquet"))

    def run(seed):
        stream = spark.readStream.schema("doc_id long, text string").parquet(str(src))
        pairs = run_stream_to_memory(
            minhash_novelty_stream(
                stream,
                seed_index_path=seed,
                # fingerprint-validate against the training corpus on
                # the seeded run (r13: the check is construction-time
                # and caller-opted, like every artifacts loader)
                seed_sf_dir=str(doc_dir) if seed else None,
            ),
            mode="append",
        ).collect()
        return pairs, set(new_ids) - {r["new_id"] for r in pairs}

    # a seed trained on a DIFFERENT corpus is refused at stream
    # construction, before any micro-batch runs
    import pytest

    from spark_graft.artifacts import ArtifactMismatch

    wrong = tmp_path / "wrongdocs"
    wrong.mkdir()
    spark.createDataFrame(
        [(0, "some other corpus entirely", "en", "s", 26)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.parquet(str(wrong / "documents.parquet"))
    with pytest.raises(ArtifactMismatch):
        minhash_novelty_stream(
            spark.readStream.schema("doc_id long, text string").parquet(str(src)),
            seed_index_path=seed_path,
            seed_sf_dir=str(wrong),
        )

    pairs, accepted_seeded = run(seed_path)
    assert accepted_seeded == accepted_batch, (accepted_seeded, accepted_batch)
    assert 19 not in accepted_seeded  # known content rejected from seed alone
    assert 9 in accepted_seeded and 39 not in accepted_seeded
    # the rejection's witness is a doc this stream never ingested
    assert any(r["new_id"] == 19 and r["other_id"] == 0 for r in pairs)
    # ...and WITHOUT the seed the known copy is re-admitted: the seed is
    # load-bearing, not decorative
    _, accepted_unseeded = run(None)
    assert 19 in accepted_unseeded


def test_cep_pattern_stream_equals_batch(spark, sf_dir, tmp_path):
    """Streaming CEP == batch events_pattern: the full event table is
    replayed as THREE time-ordered micro-batches (split on the global
    (ts, event_id) sort, so cross-batch event-time order holds — the
    documented CEP precondition) through cep_pattern_stream's
    partial-suffix state; the final emission per user must equal the
    batch query exactly, including matches whose view/click-run/purchase
    SPAN a batch boundary. The split points are arbitrary thirds, so at
    sf0.001 hundreds of user timelines straddle batch boundaries.
    Arrow batches are capped at 64 rows for the run so a group's rows
    arrive as MULTIPLE out-of-order chunks — pinning the in-batch
    concat-then-global-sort (per-chunk sorting would interleave
    event-time ranges and corrupt the symbol string)."""
    import os
    import time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_graft.sources import table
    from spark_graft.streaming import cep_pattern_stream, run_stream_to_memory

    ev = (
        table(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "event_type")
        .orderBy("ts", "event_id")
        .toPandas()
    )
    src = tmp_path / "cep_src"
    src.mkdir()
    cuts = [0, len(ev) // 3, 2 * len(ev) // 3, len(ev)]
    now = time.time()
    for i in range(3):
        chunk = ev.iloc[cuts[i]:cuts[i + 1]]
        t = pa.Table.from_pandas(chunk, preserve_index=False).cast(
            pa.schema(
                [
                    ("event_id", pa.int64()),
                    ("ts", pa.timestamp("us")),
                    ("user_id", pa.int64()),
                    ("event_type", pa.string()),
                ]
            )
        )
        pq.write_table(t, str(src / f"c{i}.parquet"))
        os.utime(src / f"c{i}.parquet", (now + i * 10, now + i * 10))

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
    try:
        emitted = run_stream_to_memory(cep_pattern_stream(stream), mode="update")
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
    # cumulative emissions: the final one per user has the max events seen
    final = (
        emitted.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.desc("n_events_seen"))
            ),
        )
        .filter(F.col("rn") == 1)
        .select(
            "user_id", "n_matches", "n_events_matched",
            "first_match_len", "max_click_run",
        )
    )
    batch = REGISTRY["events_pattern"].fn(spark, sf_dir)
    assert_frames_match(final.toPandas(), batch.toPandas(), "cep stream==batch")
    # sanity: the stream actually saw 3 batches and real matches exist
    assert emitted.count() > final.count()
    assert batch.filter(F.col("n_matches") > 0).count() > 0


def test_cep_pattern_stream_reorder_equals_batch_on_shuffled_arrival(
    spark, sf_dir, tmp_path
):
    """The round-11 event-time re-order buffer (VERDICT r10 item 4)
    lifts the ordered-source precondition: events are replayed in a
    deliberately SHUFFLED arrival order — each event displaced by a
    deterministic jitter up to +-24h around its event time, far larger
    than typical same-user gaps, so many users' click/view/purchase
    sequences arrive inverted — through cep_pattern_stream with a
    48-hour reorder_delay. The buffer must hold events until the
    watermark passes them and feed the symbol machine in true
    (ts, event_id) order, so the final emission per user still equals
    the batch events_pattern exactly. Two trailing far-future flush
    files push the watermark past every real event, and the event-time
    TIMEOUT path (not new per-user data) is what releases the last
    buffered events — the flush files carry only a dummy user."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_graft.sources import table
    from spark_graft.streaming import cep_pattern_stream, run_stream_to_memory

    D_US = 48 * 3600 * 10**6  # reorder window, microseconds
    ev = (
        table(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "event_type")
        .toPandas()
    )
    ts_us = ev["ts"].to_numpy().astype("datetime64[us]").astype("int64")
    jitter = (ev["event_id"].to_numpy() * 2654435761) % D_US - D_US // 2
    ev = ev.assign(_pkey=ts_us + jitter).sort_values(["_pkey", "event_id"])
    # the shuffle must actually invert same-user event order somewhere
    inverted = sum(
        list(g["event_id"]) != list(g.sort_values(["ts", "event_id"])["event_id"])
        for _, g in ev.groupby("user_id")
    )
    assert inverted > 5, f"jitter displaced order for only {inverted} users"

    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
        ]
    )
    src = tmp_path / "cep_shuf_src"
    src.mkdir()
    now = time.time()
    n_chunks = 5
    cuts = [len(ev) * i // n_chunks for i in range(n_chunks + 1)]
    for i in range(n_chunks):
        chunk = ev.iloc[cuts[i]:cuts[i + 1]].drop(columns="_pkey")
        t = pa.Table.from_pandas(chunk, preserve_index=False).cast(schema)
        pq.write_table(t, str(src / f"c{i}.parquet"))
        os.utime(src / f"c{i}.parquet", (now + i * 10, now + i * 10))
    # flush batches: dummy-user events far past max_ts + delay; the
    # second guarantees the watermark from the FIRST is already applied
    # while a batch (with timeouts firing) still runs, regardless of
    # no-data micro-batch behavior under availableNow
    max_us = int(ts_us.max())
    for j, off in enumerate((D_US + 24 * 3600 * 10**6, D_US + 48 * 3600 * 10**6)):
        t = pa.table(
            {
                "event_id": [10**9 + j],
                "ts": [max_us + off],
                "user_id": [-1],
                "event_type": ["view"],
            },
            schema=schema,
        )
        pq.write_table(t, str(src / f"flush{j}.parquet"))
        os.utime(
            src / f"flush{j}.parquet",
            (now + (n_chunks + j) * 10, now + (n_chunks + j) * 10),
        )

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
    try:
        emitted = run_stream_to_memory(
            cep_pattern_stream(stream, reorder_delay="48 hours"), mode="update"
        )
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
    final = (
        emitted.filter(F.col("user_id") >= 0)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.desc("n_events_seen"))
            ),
        )
        .filter(F.col("rn") == 1)
    )
    # every real event was eventually released from the buffer
    per_user = {r["user_id"]: r["n_events_seen"] for r in final.collect()}
    want_counts = ev[ev.user_id >= 0].groupby("user_id").size().to_dict()
    assert per_user == want_counts
    batch = REGISTRY["events_pattern"].fn(spark, sf_dir)
    assert_frames_match(
        final.select(
            "user_id", "n_matches", "n_events_matched",
            "first_match_len", "max_click_run",
        ).toPandas(),
        batch.toPandas(),
        "cep reorder stream==batch",
    )
    assert batch.filter(F.col("n_matches") > 0).count() > 0


def test_decontaminate_stream_equals_batch(spark, sf_dir, tmp_path):
    """Stream-static join twin == batch decontaminate: the training
    deciles replay as 3 micro-batches against the STATIC eval-gram
    table; the final per-doc emission must equal the oracle-checked
    batch query exactly. The static side is broadcast (plan requirement
    of the pattern: the dimension ships once per executor, the stream
    side never shuffles raw text) — asserted on the streaming plan via
    the query-progress-independent physical string. Docs whose grams
    straddle nothing (each doc's grams live in ONE source row) finalize
    within their arrival batch, so update-mode last-emission-per-doc is
    the converged answer."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_graft.sources import table
    from spark_graft.streaming import (
        decontaminate_stream,
        eval_gram_table,
        run_stream_to_memory,
    )

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .toPandas()
    )
    src = tmp_path / "decon_src"
    src.mkdir()
    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    cuts = [0, len(docs) // 3, 2 * len(docs) // 3, len(docs)]
    now = time.time()
    for i in range(3):
        chunk = docs.iloc[cuts[i]:cuts[i + 1]]
        pq.write_table(
            pa.Table.from_pandas(chunk, preserve_index=False).cast(schema),
            str(src / f"c{i}.parquet"),
        )
        os.utime(src / f"c{i}.parquet", (now + i * 10, now + i * 10))

    static_grams = eval_gram_table(spark, sf_dir).localCheckpoint()
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = decontaminate_stream(stream, static_grams)
    from spark_graft.plans import explain_str

    assert "BroadcastHashJoin" in explain_str(out, "simple")
    emitted = run_stream_to_memory(out, mode="update")
    # update mode re-emits a doc only if its aggregate changed; since
    # each doc finalizes in one batch, rows are already final — but a
    # doc could appear once per batch boundary file split, so keep last
    final = (
        emitted.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(F.desc("n_grams"))
            ),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    batch = REGISTRY["decontaminate"].fn(spark, sf_dir)
    assert_frames_match(final.toPandas(), batch.toPandas(), "decon stream==batch")
    assert batch.count() > 0  # the equivalence is not vacuous


def test_decontaminate_stream_late_row_drop_is_visible(spark, sf_dir, tmp_path):
    """VERDICT r13 item 4: with a caller-supplied ingest column, a row
    arriving past the watermark is dropped UNEVALUATED — for a safety
    gate that failure mode must be LOUD, not silent. Construction emits
    a warning naming the contract, the pre-watermark 'decon_ingest'
    observation reports each batch's ingest-time spread (so the late
    batch's min visibly lags the prior batch's max), and the state
    operator's numRowsDroppedByWatermark counts the drop itself."""
    import json
    import os
    import time
    import warnings

    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_graft.sources import table
    from spark_graft.streaming import decontaminate_stream, eval_gram_table

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(40)
        .toPandas()
    )
    src = tmp_path / "decon_late_src"
    src.mkdir()
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("ingest_ts", pa.timestamp("us")),
        ]
    )
    T0 = 1_700_000_000_000_000  # us epoch
    HOUR = 3600 * 10**6
    now = time.time()
    # batch 0: fresh rows at T0+2h (advances the watermark there);
    # batch 1: rows stamped T0 — two hours LATE against a 1-minute
    # watermark, so they must be dropped pre-aggregation
    import pandas as pd

    # three files -> three micro-batches: Spark's late-row filter lags
    # the watermark update by ONE batch (measured — same lag
    # test_watermark_drops_late_data documents), so the watermark that
    # batch 0 advances is enforced against batch 2's rows
    fresh = docs.iloc[: len(docs) - 10].copy()
    fresh["ingest_ts"] = pd.Timestamp(T0 + 2 * HOUR, unit="us")
    fresh2 = docs.iloc[len(docs) - 10 : len(docs) - 5].copy()
    fresh2["ingest_ts"] = pd.Timestamp(T0 + 2 * HOUR, unit="us")
    late = docs.iloc[len(docs) - 5 :].copy()
    late["ingest_ts"] = pd.Timestamp(T0, unit="us")
    for i, chunk in enumerate((fresh, fresh2, late)):
        pq.write_table(
            pa.Table.from_pandas(chunk, preserve_index=False).cast(schema),
            str(src / f"c{i}.parquet"),
        )
        os.utime(src / f"c{i}.parquet", (now + i * 10, now + i * 10))

    static_grams = eval_gram_table(spark, sf_dir).localCheckpoint()
    stream = (
        spark.readStream.schema("doc_id long, text string, ingest_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    # (a) the construction-time warning names the silent-drop contract
    with pytest.warns(UserWarning, match="dropped\\s+UNEVALUATED"):
        out = decontaminate_stream(
            stream, static_grams, watermark="1 minute", window="1 minute"
        )
    q = (
        out.writeStream.format("memory")
        .queryName("decon_late_sink")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progress = [
        json.loads(p.json) if hasattr(p, "json") else p for p in q.recentProgress
    ]
    # (b) the observation reports the pre-watermark ingest spread: the
    # late batch is VISIBLE with its true (stale) ingest time
    obs = [
        p["observedMetrics"]["decon_ingest"]
        for p in progress
        if p.get("observedMetrics", {}).get("decon_ingest")
    ]
    assert obs, progress
    mins = [o["min_ingest"] for o in obs if o["rows"] > 0]
    assert any(m.startswith("2023-11-14 22:13:20") for m in mins), mins
    # (c) the drop itself is counted by the state operator
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in progress
        for op in p.get("stateOperators", [])
    )
    assert dropped >= 1, progress


def test_decontaminate_stream_state_evicts_past_watermark(spark, sf_dir, tmp_path):
    """The per-doc aggregation state must NOT grow monotonically with
    docs ingested (VERDICT r11 item 4): with an ingest-time watermark,
    a doc's counter row is evicted once the watermark passes its
    arrival window, so steady-state rows track the recent ingest window
    — not every document ever seen. Five micro-batches arrive one hour
    apart with a 1-minute watermark+window; each batch's state must
    hold only that batch's docs (earlier batches evicted), and the
    emitted rows must still equal the batch decontaminate query."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_graft.sources import table
    from spark_graft.streaming import decontaminate_stream, eval_gram_table

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .toPandas()
    )
    src = tmp_path / "decon_ttl_src"
    src.mkdir()
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("ingest_ts", pa.timestamp("us")),
        ]
    )
    N_BATCH = 5
    T0 = 1_700_000_000_000_000  # us epoch
    HOUR = 3600 * 10**6
    cuts = [len(docs) * i // N_BATCH for i in range(N_BATCH + 1)]
    now = time.time()
    batch_docs = []
    for i in range(N_BATCH):
        chunk = docs.iloc[cuts[i]:cuts[i + 1]].copy()
        chunk["ingest_ts"] = T0 + i * HOUR
        chunk["ingest_ts"] = chunk["ingest_ts"].astype("datetime64[us]")
        pq.write_table(
            pa.Table.from_pandas(chunk, preserve_index=False).cast(schema),
            str(src / f"c{i}.parquet"),
        )
        os.utime(src / f"c{i}.parquet", (now + i * 10, now + i * 10))
        batch_docs.append(len(chunk))

    static_grams = eval_gram_table(spark, sf_dir).localCheckpoint()
    stream = (
        spark.readStream.schema("doc_id long, text string, ingest_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = decontaminate_stream(
        stream, static_grams, watermark="1 minute", window="1 minute"
    )
    name = "decon_ttl_sink"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    import json

    progress = [
        json.loads(p.json) if hasattr(p, "json") else p for p in q.recentProgress
    ]
    state_rows = [
        p["stateOperators"][0]["numRowsTotal"]
        for p in progress
        if p.get("stateOperators")
    ]
    # non-eval docs only (eval decile is filtered out before the agg)
    from spark_graft.operators.pipeline import EVAL_MOD

    per_batch_nontrivial = [
        int((docs.iloc[cuts[i]:cuts[i + 1]].doc_id % EVAL_MOD != 0).sum())
        for i in range(N_BATCH)
    ]
    total = sum(per_batch_nontrivial)
    assert len(state_rows) >= N_BATCH
    # bounded: no snapshot ever holds anywhere near every doc ingested,
    # and the peak tracks a single batch's docs, not the running total
    assert max(state_rows) < total, (state_rows, total)
    assert max(state_rows) <= max(per_batch_nontrivial) * 2, (
        state_rows,
        per_batch_nontrivial,
    )
    # ...and the answer is still exactly the batch query's
    emitted = spark.sql(f"SELECT * FROM {name}")
    final = (
        emitted.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(F.desc("n_grams"))
            ),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    batch = REGISTRY["decontaminate"].fn(spark, sf_dir)
    assert_frames_match(
        final.toPandas(), batch.toPandas(), "decon ttl stream==batch"
    )


def test_cep_reorder_buffer_survives_checkpoint_restart(spark, tmp_path):
    """The reorder buffer's state — buffered (ts, event_id, symbol)
    arrays that the watermark has NOT yet released — must round-trip
    the state store across a PROCESS restart: run 1 ingests a user's
    view+click but terminates before the watermark passes them (nothing
    released, n_events_seen stays 0); run 2 is a BRAND-NEW query object
    on the same checkpoint that reads ONLY the purchase plus two
    far-future flush events. The final counters show one full vc+p
    match over 3 released events — two of which run 2 never read, so
    they can only have come from the restored buffer. A lost or
    mis-typed state schema would yield n_events_seen=1 and no match."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_graft.streaming import cep_pattern_stream

    src, out = tmp_path / "cep_ckpt_src", tmp_path / "cep_ckpt_out"
    src.mkdir()
    ckpt = str(tmp_path / "cep_ckpt")
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
        ]
    )
    T0 = 1_700_000_000_000_000  # us epoch, arbitrary fixed instant
    MIN = 60 * 10**6

    def add_file(name, rows):
        pq.write_table(
            pa.table(
                {
                    "event_id": [r[0] for r in rows],
                    "ts": [r[1] for r in rows],
                    "user_id": [r[2] for r in rows],
                    "event_type": [r[3] for r in rows],
                },
                schema=schema,
            ),
            str(src / name),
        )

    def make_query():
        stream = (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, event_type string"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        emitted = cep_pattern_stream(stream, reorder_delay="30 minutes")

        def write_batch(batch_df, batch_id):
            batch_df.write.mode("append").parquet(str(out))

        return (
            emitted.writeStream.foreachBatch(write_batch)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    # run 1: view + click arrive; watermark never passes them
    add_file("f0.parquet", [(0, T0, 1, "view"), (1, T0 + MIN, 1, "click")])
    q1 = make_query()
    q1.awaitTermination()
    run1 = {
        r["user_id"]: (r["n_matches"], r["n_events_seen"])
        for r in spark.read.parquet(str(out)).collect()
    }
    assert run1[1] == (0, 0)  # buffered, nothing released yet

    # run 2: new query object, same checkpoint; only the purchase +
    # flush events are new input
    add_file("f1.parquet", [(2, T0 + 2 * MIN, 1, "purchase")])
    add_file("f2.parquet", [(10**9, T0 + 120 * MIN, -1, "view")])
    add_file("f3.parquet", [(10**9 + 1, T0 + 180 * MIN, -1, "view")])
    q2 = make_query()
    q2.awaitTermination()
    rows = spark.read.parquet(str(out)).collect()
    best = max(
        (r for r in rows if r["user_id"] == 1), key=lambda r: r["n_events_seen"]
    )
    assert best["n_events_seen"] == 3  # 2 restored from state + 1 new
    assert best["n_matches"] == 1 and best["n_events_matched"] == 3
    assert best["first_match_len"] == 3 and best["max_click_run"] == 1


def test_ewma_reorder_buffer_survives_checkpoint_restart(spark, tmp_path):
    """ewma_stream's reorder state — the ring buffer PLUS the buffered
    (ts, event_id, value) arrays the watermark has not yet released —
    must round-trip the state store across a process restart: run 1
    ingests two of a user's values but terminates before the watermark
    passes them (nothing emitted); run 2 is a brand-new query object on
    the same checkpoint that reads ONLY a third value plus two
    far-future flush events. The flush must release all THREE events
    with EWMAs folded in true event-time order — the first two can only
    have come from the restored buffer, and the third's window depends
    on them through the restored fold."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_graft.streaming import ewma_stream

    src, out = tmp_path / "ewma_ckpt_src", tmp_path / "ewma_ckpt_out"
    src.mkdir()
    ckpt = str(tmp_path / "ewma_ckpt")
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("value", pa.float64()),
        ]
    )
    T0 = 1_700_000_000_000_000  # us epoch, arbitrary fixed instant
    MIN = 60 * 10**6

    def add_file(name, rows):
        pq.write_table(
            pa.table(
                {
                    "event_id": [r[0] for r in rows],
                    "ts": [r[1] for r in rows],
                    "user_id": [r[2] for r in rows],
                    "value": [r[3] for r in rows],
                },
                schema=schema,
            ),
            str(src / name),
        )

    def make_query():
        stream = (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        emitted = ewma_stream(stream, reorder_delay="30 minutes")

        def write_batch(batch_df, batch_id):
            batch_df.write.mode("append").parquet(str(out))

        return (
            emitted.writeStream.foreachBatch(write_batch)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    # run 1: two values arrive OUT of event-time order; the watermark
    # never passes them, so nothing is emitted
    add_file("f0.parquet", [(1, T0 + MIN, 1, 8.0), (0, T0, 1, 4.0)])
    q1 = make_query()
    q1.awaitTermination()
    run1 = spark.read.parquet(str(out)).filter(F.col("user_id") == 1)
    assert run1.count() == 0  # buffered, nothing released yet

    # run 2: new query object, same checkpoint; only the third value +
    # flush events are new input
    add_file("f1.parquet", [(2, T0 + 2 * MIN, 1, 6.0)])
    add_file("f2.parquet", [(10**9, T0 + 120 * MIN, -1, 0.0)])
    add_file("f3.parquet", [(10**9 + 1, T0 + 180 * MIN, -1, 0.0)])
    q2 = make_query()
    q2.awaitTermination()
    got = {
        r["event_id"]: r["ewma"]
        for r in spark.read.parquet(str(out))
        .filter(F.col("user_id") == 1)
        .collect()
    }
    # folded in (ts, event_id) order: 4.0; (8 + 4/2)/1.5; (6 + 8/2 + 4/4)/1.75
    assert got == {0: 4.0, 1: round(10.0 / 1.5, 6), 2: round(11.0 / 1.75, 6)}


def test_bpe_encode_stream_equals_batch_serve(spark, sf_dir, tmp_path):
    """Streaming tokenize-on-ingest == the batch artifact-served encode:
    train once (artifacts.train_and_save_bpe), replay the documents as 3
    micro-batches through bpe_encode_stream, and the appended rows must
    equal vocab_bpe_apply(merges_path=...) exactly. The plan must be
    STATELESS (no state store node) — a stateless narrow map is what
    makes ingest-time tokenization free at any scale."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_graft import artifacts
    from spark_graft.registry import REGISTRY
    from spark_graft.sources import table
    from spark_graft.streaming import bpe_encode_stream, run_stream_to_memory

    mpath = str(tmp_path / "bpe_merges")
    artifacts.train_and_save_bpe(spark, sf_dir, mpath)

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .toPandas()
    )
    src = tmp_path / "bpe_src"
    src.mkdir()
    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    cuts = [0, len(docs) // 3, 2 * len(docs) // 3, len(docs)]
    now = time.time()
    for i in range(3):
        pq.write_table(
            pa.Table.from_pandas(
                docs.iloc[cuts[i]:cuts[i + 1]], preserve_index=False
            ).cast(schema),
            str(src / f"c{i}.parquet"),
        )
        os.utime(src / f"c{i}.parquet", (now + i * 10, now + i * 10))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    enc = bpe_encode_stream(stream, mpath)
    logical = enc._jdf.queryExecution().logical().toString()
    assert "EventTimeWatermark" not in logical  # stateless narrow map
    out = run_stream_to_memory(enc, mode="append")
    batch = REGISTRY["vocab_bpe_apply"].fn(spark, sf_dir, merges_path=mpath)
    assert_frames_match(out.toPandas(), batch.toPandas(), "bpe stream==batch serve")
    # stateless: the completed streaming query used no state store
    assert out.count() == len(docs)


def test_quality_score_stream_equals_batch_serve(spark, sf_dir, tmp_path):
    """Streaming score-on-ingest == the batch artifact-served scorer:
    train once (artifacts.train_and_save_quality), replay the documents
    as 3 micro-batches through quality_score_stream, and the appended
    rows must equal quality_classifier(weights_path=...) exactly —
    including the fixed-point scores, since the arithmetic is the same
    integer expressions in both plans. STATELESS like bpe_encode_stream
    (no watermark, no state store node)."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_graft import artifacts
    from spark_graft.sources import table
    from spark_graft.streaming import quality_score_stream, run_stream_to_memory

    wpath = str(tmp_path / "qweights")
    artifacts.train_and_save_quality(spark, sf_dir, wpath)

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .toPandas()
    )
    src = tmp_path / "qscore_src"
    src.mkdir()
    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    cuts = [0, len(docs) // 3, 2 * len(docs) // 3, len(docs)]
    now = time.time()
    for i in range(3):
        pq.write_table(
            pa.Table.from_pandas(
                docs.iloc[cuts[i]:cuts[i + 1]], preserve_index=False
            ).cast(schema),
            str(src / f"c{i}.parquet"),
        )
        os.utime(src / f"c{i}.parquet", (now + i * 10, now + i * 10))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    scored = quality_score_stream(stream, wpath)
    logical = scored._jdf.queryExecution().logical().toString()
    assert "EventTimeWatermark" not in logical  # stateless narrow map
    out = run_stream_to_memory(scored, mode="append")
    batch = REGISTRY["quality_classifier"].fn(spark, sf_dir, weights_path=wpath)
    assert_frames_match(
        out.toPandas(), batch.toPandas(), "quality stream==batch serve"
    )
    assert out.count() == len(docs)


def test_cep_reorder_drops_null_event_times(spark, tmp_path):
    """The reorder path's documented null-ts contract: NULL event times
    are dropped (event-time order is undefined for them; the batch
    twin's global sort pins them first — unreproducible on a stream),
    so the streamed counters equal batch events_pattern over the
    NULL-FILTERED corpus, and the null event is never counted."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_graft.streaming import cep_pattern_stream, run_stream_to_memory

    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
        ]
    )
    T0 = 1_700_000_000_000_000
    MIN = 60 * 10**6
    rows = [
        (0, T0, 1, "view"),
        (1, None, 1, "view"),  # null ts: dropped by the reorder path
        (2, T0 + MIN, 1, "click"),
        (3, T0 + 2 * MIN, 1, "purchase"),
        (9, T0 + 600 * MIN, -1, "view"),  # flush
        (10, T0 + 900 * MIN, -1, "view"),  # flush 2
    ]
    src = tmp_path / "nullsrc"
    src.mkdir()
    import os
    import time

    now = time.time()
    for i, r in enumerate(rows):
        pq.write_table(
            pa.table(
                {
                    "event_id": [r[0]],
                    "ts": [r[1]],
                    "user_id": [r[2]],
                    "event_type": [r[3]],
                },
                schema=schema,
            ),
            str(src / f"f{i}.parquet"),
        )
        os.utime(src / f"f{i}.parquet", (now + i * 10, now + i * 10))
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    emitted = run_stream_to_memory(
        cep_pattern_stream(stream, reorder_delay="30 minutes"), mode="update"
    )
    best = max(
        (r for r in emitted.collect() if r["user_id"] == 1),
        key=lambda r: r["n_events_seen"],
    )
    # the null event neither counts nor breaks the contiguous vcp run
    assert best["n_events_seen"] == 3
    assert best["n_matches"] == 1 and best["n_events_matched"] == 3


def test_mixture_drift_stream_equals_batch_and_flags_drift(spark, sf_dir, tmp_path):
    """Mixture-drift monitor: (1) the complete-mode stream output over
    the full corpus equals the batch twin exactly (same shared integer
    helpers); (2) against a reference built FROM the corpus itself,
    nothing drifts; (3) against an engineered reference that starves
    one language, exactly that language's gap exceeds the threshold and
    flips its flag (plus whichever languages absorb the share); (4) the
    streaming plan carries ONE aggregation with single-row state and no
    watermark."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_graft import artifacts
    from spark_graft.sources import table
    from spark_graft.streaming import (
        build_mixture_reference,
        mixture_drift_batch,
        mixture_drift_stream,
        run_stream_to_memory,
    )
    from spark_graft.streaming.structured import MIXTURE_DRIFT_T_FX

    ref = build_mixture_reference(spark, sf_dir)
    rpath = str(tmp_path / "mixref")
    artifacts.save_mixture_reference(rpath, ref, sf_dir=sf_dir)

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text", "lang")
        .orderBy("doc_id")
        .toPandas()
    )
    src = tmp_path / "mix_src"
    src.mkdir()
    schema = pa.schema(
        [("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string())]
    )
    cuts = [0, len(docs) // 3, 2 * len(docs) // 3, len(docs)]
    now = time.time()
    for i in range(3):
        pq.write_table(
            pa.Table.from_pandas(
                docs.iloc[cuts[i]:cuts[i + 1]], preserve_index=False
            ).cast(schema),
            str(src / f"c{i}.parquet"),
        )
        os.utime(src / f"c{i}.parquet", (now + i * 10, now + i * 10))

    stream = (
        spark.readStream.schema("doc_id long, text string, lang string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    mon = mixture_drift_stream(stream, rpath)
    logical = mon._jdf.queryExecution().logical().toString()
    assert "EventTimeWatermark" not in logical  # cumulative, no watermark
    out = run_stream_to_memory(mon, mode="complete")
    batch = mixture_drift_batch(spark, sf_dir, rpath)
    assert_frames_match(
        out.toPandas(), batch.toPandas(), "mixture stream==batch twin"
    )
    got = {r["lang"]: r for r in out.collect()}
    # self-reference: the shares ARE the reference (same integer math),
    # so nothing drifts
    assert all(not r["drifted"] for r in got.values()), got
    assert all(r["drift_fx"] == 0 for r in got.values()), got

    # engineered reference: starve 'en' far below its actual share
    bad = dict(ref)
    bad["en"] = max(0, ref["en"] - (MIXTURE_DRIFT_T_FX + 100_000))
    bpath = str(tmp_path / "mixref_bad")
    artifacts.save_mixture_reference(bpath, bad, sf_dir=sf_dir)
    flagged = {
        r["lang"]: r["drifted"]
        for r in mixture_drift_batch(spark, sf_dir, bpath).collect()
    }
    assert flagged["en"] is True
    # languages whose reference is untouched keep their exact-zero gap
    assert all(not flagged[l] for l in flagged if l != "en"), flagged


def test_mixture_reference_artifact_rejects_malformed(spark, tmp_path):
    """load_mixture_reference refuses negative shares and
    above-scale totals up front (the quality-weights shape contract)."""
    import pytest

    from spark_graft import artifacts

    p1 = str(tmp_path / "neg")
    artifacts.save_mixture_reference(p1, {"en": -5, "de": 10})
    with pytest.raises(artifacts.ArtifactMismatch):
        artifacts.load_mixture_reference(p1)

    p2 = str(tmp_path / "oversum")
    artifacts.save_mixture_reference(p2, {"en": 900_000, "de": 200_000})
    with pytest.raises(artifacts.ArtifactMismatch):
        artifacts.load_mixture_reference(p2)


def test_mixture_drift_monitor_checkpoint_restart(spark, tmp_path):
    """The monitor across a PROCESS restart: run a checkpointed
    mixture_drift_stream over two doc micro-batches, terminate, drop
    more docs, restart a brand-new query from the same checkpoint. The
    restarted emission must count the pre-restart tokens it never
    itself read (en = 3 carried + 4 new = 7) — a lost checkpoint would
    report en = 4 and a spurious drift flag. Mid-stream the monitor
    DOES flag drift (the partial corpus is en-light vs the reference),
    and the flag clears once the full mixture arrives: the
    running-share semantics under restart, end to end."""
    import os
    import time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_graft import artifacts
    from spark_graft.streaming import mixture_drift_stream

    src, out = tmp_path / "src", tmp_path / "out"
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    schema = pa.schema(
        [("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string())]
    )

    def drop(name, rows, ts):
        pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
        pq.write_table(
            pa.Table.from_pandas(pdf, preserve_index=False).cast(schema),
            str(src / name),
        )
        os.utime(src / name, (ts, ts))

    # final corpus: en 7 tokens, fr 2 -> shares 777777 / 222222
    ref = {"en": 777777, "fr": 222222, "de": 0, "es": 0, "zh": 0, "other": 0}
    rpath = str(tmp_path / "ref")
    artifacts.save_mixture_reference(rpath, ref)

    now = time.time()
    drop("b0.parquet", [(0, "a b c", "en")], now)
    drop("b1.parquet", [(1, "x y", "fr")], now + 10)

    def make_query():
        stream = (
            spark.readStream.schema("doc_id long, text string, lang string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        mon = mixture_drift_stream(stream, rpath)

        def write_batch(batch_df, batch_id):
            batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(str(out))

        return (
            mon.writeStream.foreachBatch(write_batch)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    q1 = make_query()
    q1.awaitTermination()
    run1 = spark.read.parquet(str(out)).collect()
    last1 = max(r["batch_id"] for r in run1)
    en1 = next(r for r in run1 if r["batch_id"] == last1 and r["lang"] == "en")
    # partial corpus: en 3/5 = 600000 vs ref 777777 -> drifted
    assert en1["n_tokens"] == 3 and en1["share_fx"] == 600000
    assert en1["drifted"] is True

    drop("b2.parquet", [(2, "p q r s", "en")], time.time() + 60)

    q2 = make_query()
    q2.awaitTermination()
    rows = spark.read.parquet(str(out)).collect()
    last = max(r["batch_id"] for r in rows)
    assert last > last1  # offsets resumed, numbering continues
    final = {r["lang"]: r for r in rows if r["batch_id"] == last}
    # state restored: 3 carried + 4 new, not 4
    assert final["en"]["n_tokens"] == 7 and final["en"]["share_fx"] == 777777
    assert final["fr"]["n_tokens"] == 2 and final["fr"]["share_fx"] == 222222
    # full mixture matches the reference exactly -> all flags clear
    assert all(not r["drifted"] for r in final.values()), final


def test_mixture_share_exact_beyond_int64_wrap_point(spark):
    """The share computation routes through decimal(38,0): a language
    whose CUMULATIVE token count exceeds ~9.2e12 (where a plain int64
    n_tokens * 10^6 wraps negative) must still report the exact
    nonnegative micro-unit share — the monitor is cumulative forever,
    so this magnitude is its declared operating range."""
    from pyspark.sql import functions as F  # noqa: F401  (parity with module use)

    from spark_graft.streaming.structured import (
        MIXTURE_LANGS,
        _mixture_drift_from_counts,
    )

    row = {f"t_{l}": 0 for l in (*MIXTURE_LANGS, "other")}
    row["t_en"] = 20_000_000_000_000  # 2e13 > the 9.2e12 wrap point
    row["t_fr"] = 10_000_000_000_000
    row["t_total"] = 30_000_000_000_000
    cols = ", ".join(f"CAST({v} AS BIGINT) AS {k}" for k, v in row.items())
    counts = spark.sql(f"SELECT {cols}")
    ref = {l: 0 for l in (*MIXTURE_LANGS, "other")}
    ref["en"], ref["fr"] = 666666, 333333
    out = {
        r["lang"]: (r["share_fx"], r["drifted"])
        for r in _mixture_drift_from_counts(counts, ref).collect()
    }
    assert out["en"] == (666666, False)
    assert out["fr"] == (333333, False)
    assert all(s >= 0 for s, _ in out.values())


def test_ewma_stream_equals_batch_on_ordered_replay(spark, sf_dir, tmp_path):
    """Streaming per-user EWMA == batch ts_ewma bit-for-bit on in-order
    replay: events sorted by (ts, event_id) split into 3 micro-batches
    (per-user cross-batch order preserved by the global sort), drained
    through the stateful stream, rows compared exactly — the Python
    fold mirrors the batch lag-chain's expression tree, and round(6)
    happens Spark-side in both plans."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_graft.registry import REGISTRY
    from spark_graft.sources import table
    from spark_graft.streaming import ewma_stream, run_stream_to_memory

    ev = (
        table(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts", "value")
        .orderBy("ts", "event_id")
        .toPandas()
    )
    src = tmp_path / "ewma_src"
    src.mkdir()
    schema = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()),
         ("ts", pa.timestamp("us")), ("value", pa.float64())]
    )
    cuts = [0, len(ev) // 3, 2 * len(ev) // 3, len(ev)]
    now = time.time()
    for i in range(3):
        pq.write_table(
            pa.Table.from_pandas(
                ev.iloc[cuts[i]:cuts[i + 1]], preserve_index=False
            ).cast(schema),
            str(src / f"c{i}.parquet"),
        )
        os.utime(src / f"c{i}.parquet", (now + i * 10, now + i * 10))

    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, ts timestamp, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = run_stream_to_memory(ewma_stream(stream), mode="append")
    batch = (
        REGISTRY["ts_ewma"].fn(spark, sf_dir)
        .select("event_id", "user_id", "ts", "value", "ewma")
    )
    assert_frames_match(out.toPandas(), batch.toPandas(), "ewma stream==batch")
    assert out.count() == len(ev)


def test_ewma_stream_null_values_renormalize_like_batch(spark, tmp_path):
    """A NULL event value must shift the window but contribute 0 to both
    sums in the stream, exactly like the batch twin's coalesce/CASE
    terms: stream == batch on a planted timeline containing NULLs, and
    the post-NULL averages are finite and renormalized (not NaN)."""
    import math
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_graft.registry import REGISTRY
    from spark_graft.streaming import ewma_stream, run_stream_to_memory

    d = tmp_path / "nulls"
    d.mkdir()
    rows = [
        (0, "2024-01-01 10:00:00", 1, 4.0),
        (1, "2024-01-01 10:01:00", 1, None),
        (2, "2024-01-01 10:02:00", 1, 8.0),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [pd_ts for pd_ts in __import__("pandas").to_datetime([r[1] for r in rows])],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array(["view"] * 3, pa.string()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * 3, pa.string()),
        }
    )
    os.makedirs(d / "events.parquet")
    pq.write_table(tbl, str(d / "events.parquet" / "part-0.parquet"))

    batch = {
        r["event_id"]: r["ewma"]
        for r in REGISTRY["ts_ewma"].fn(spark, str(d)).collect()
    }
    # hand-check: e1 sees (NULL, 4/2) over weights (0, 1/2) -> 4.0;
    # e2 sees (8, NULL, 4/4) over (1, 0, 1/4) -> 9/1.25 = 7.2
    assert batch[0] == 4.0 and batch[1] == 4.0 and batch[2] == 7.2

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        .option("pathGlobFilter", "*.parquet")
        .parquet(str(d / "events.parquet"))
    )
    out = {
        r["event_id"]: r["ewma"]
        for r in run_stream_to_memory(ewma_stream(stream), mode="append").collect()
    }
    assert out == batch
    assert all(not math.isnan(v) for v in out.values())


def test_ewma_stream_reorder_equals_batch_on_shuffled_arrival(
    spark, sf_dir, tmp_path
):
    """VERDICT r14 item 2: ewma_stream's reorder_delay lifts the
    ordered-arrival precondition with cep_pattern_stream's event-time
    re-order buffer. Events are replayed in a deliberately SHUFFLED
    arrival order — each displaced by a deterministic jitter up to
    +-24h around its event time — through a 48-hour reorder_delay; the
    buffer must hold events until the watermark passes them and feed
    the EWMA fold in true (ts, event_id) order, so every emitted
    annotation equals the batch ts_ewma row exactly. Two trailing
    far-future flush files (dummy user) push the watermark past every
    real event, so the event-time TIMEOUT path — not new per-user
    data — is what releases the last buffered events."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_graft.registry import REGISTRY
    from spark_graft.sources import table
    from spark_graft.streaming import ewma_stream, run_stream_to_memory

    D_US = 48 * 3600 * 10**6  # reorder window, microseconds
    ev = (
        table(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "value")
        .toPandas()
    )
    ts_us = ev["ts"].to_numpy().astype("datetime64[us]").astype("int64")
    jitter = (ev["event_id"].to_numpy() * 2654435761) % D_US - D_US // 2
    ev = ev.assign(_pkey=ts_us + jitter).sort_values(["_pkey", "event_id"])
    inverted = sum(
        list(g["event_id"]) != list(g.sort_values(["ts", "event_id"])["event_id"])
        for _, g in ev.groupby("user_id")
    )
    assert inverted > 5, f"jitter displaced order for only {inverted} users"

    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("value", pa.float64()),
        ]
    )
    src = tmp_path / "ewma_shuf_src"
    src.mkdir()
    now = time.time()
    n_chunks = 5
    cuts = [len(ev) * i // n_chunks for i in range(n_chunks + 1)]
    for i in range(n_chunks):
        chunk = ev.iloc[cuts[i]:cuts[i + 1]].drop(columns="_pkey")
        t = pa.Table.from_pandas(chunk, preserve_index=False).cast(schema)
        pq.write_table(t, str(src / f"c{i}.parquet"))
        os.utime(src / f"c{i}.parquet", (now + i * 10, now + i * 10))
    max_us = int(ts_us.max())
    for j, off in enumerate((D_US + 24 * 3600 * 10**6, D_US + 48 * 3600 * 10**6)):
        t = pa.table(
            {
                "event_id": [10**9 + j],
                "ts": [max_us + off],
                "user_id": [-1],
                "value": [0.0],
            },
            schema=schema,
        )
        pq.write_table(t, str(src / f"flush{j}.parquet"))
        os.utime(
            src / f"flush{j}.parquet",
            (now + (n_chunks + j) * 10, now + (n_chunks + j) * 10),
        )

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
    try:
        emitted = run_stream_to_memory(
            ewma_stream(stream, reorder_delay="48 hours"), mode="append"
        )
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
    out = emitted.filter(F.col("user_id") >= 0)
    # every real event was eventually released from the buffer exactly once
    assert out.count() == len(ev)
    batch = (
        REGISTRY["ts_ewma"].fn(spark, sf_dir)
        .select("event_id", "user_id", "ts", "value", "ewma")
    )
    assert_frames_match(
        out.toPandas(), batch.toPandas(), "ewma reorder stream==batch"
    )


def test_ewma_stream_nan_values_share_null_convention(spark, tmp_path):
    """ADVICE r14: a genuine NaN double input must behave exactly like
    NULL in BOTH twins — normalized to NULL at ingest, window slot
    shifts, contributes 0 to both sums, and the passthrough `value`
    column re-emits NULL (not NaN) from batch AND stream. This is the
    one convention pandas float64 state can honor, so it is the
    contract."""
    import math
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_graft.registry import REGISTRY
    from spark_graft.streaming import ewma_stream, run_stream_to_memory

    d = tmp_path / "nans"
    d.mkdir()
    rows = [
        (0, "2024-01-01 10:00:00", 1, 4.0),
        (1, "2024-01-01 10:01:00", 1, float("nan")),  # genuine NaN, not NULL
        (2, "2024-01-01 10:02:00", 1, 8.0),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                list(pd.to_datetime([r[1] for r in rows])), pa.timestamp("us")
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array(["view"] * 3, pa.string()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * 3, pa.string()),
        }
    )
    # parquet stores the NaN as a present (non-null) float64 NaN
    assert tbl.column("value").null_count == 0
    os.makedirs(d / "events.parquet")
    pq.write_table(tbl, str(d / "events.parquet" / "part-0.parquet"))

    batch_rows = {
        r["event_id"]: (r["value"], r["ewma"])
        for r in REGISTRY["ts_ewma"].fn(spark, str(d)).collect()
    }
    # identical to the planted-NULL timeline: e1 -> 4.0, e2 -> 7.2
    assert batch_rows[0] == (4.0, 4.0)
    assert batch_rows[1] == (None, 4.0)  # NaN normalized to NULL at ingest
    assert batch_rows[2] == (8.0, 7.2)

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        .option("pathGlobFilter", "*.parquet")
        .parquet(str(d / "events.parquet"))
    )
    out_rows = {
        r["event_id"]: (r["value"], r["ewma"])
        for r in run_stream_to_memory(ewma_stream(stream), mode="append").collect()
    }
    assert out_rows == batch_rows
    assert all(not math.isnan(v) for _, v in out_rows.values())


def _reservoir_rank_py(doc_id: int) -> tuple:
    import hashlib

    return (
        int(hashlib.md5(f"res:{doc_id}".encode()).hexdigest()[:8], 16),
        doc_id,
    )


def test_reservoir_stream_equals_batch_and_is_order_invariant(
    spark, sf_dir, tmp_path
):
    """Streaming per-source reservoir == batch sample_reservoir on the
    FINAL membership (adds minus evicts), replayed as 3 micro-batches
    in a deliberately hash-SHUFFLED order — reservoir-by-rank is
    order-invariant, so no reorder buffer or watermark is needed, and
    the shuffled replay proves it rather than assuming it."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_graft.registry import REGISTRY
    from spark_graft.sources import table
    from spark_graft.streaming import reservoir_stream, run_stream_to_memory

    docs = (
        table(spark, sf_dir, "documents").select("doc_id", "source").toPandas()
    )
    # adversarial replay order: by md5 of a DIFFERENT prefix, so arrival
    # order correlates with neither doc_id nor the reservoir rank
    docs = docs.assign(
        _k=[_md5 for _md5 in ((d * 2654435761) % 997 for d in docs["doc_id"])]
    ).sort_values(["_k", "doc_id"])
    src = tmp_path / "res_src"
    src.mkdir()
    schema = pa.schema([("doc_id", pa.int64()), ("source", pa.string())])
    now = time.time()
    cuts = [len(docs) * i // 3 for i in range(4)]
    for i in range(3):
        chunk = docs.iloc[cuts[i]:cuts[i + 1]].drop(columns="_k")
        pq.write_table(
            pa.Table.from_pandas(chunk, preserve_index=False).cast(schema),
            str(src / f"c{i}.parquet"),
        )
        os.utime(src / f"c{i}.parquet", (now + i * 10, now + i * 10))

    stream = (
        spark.readStream.schema("doc_id long, source string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    log = run_stream_to_memory(
        reservoir_stream(stream), mode="append"
    ).toPandas()
    evicted = set(
        zip(log[log.action == "evict"].source, log[log.action == "evict"].doc_id)
    )
    added = set(
        zip(log[log.action == "add"].source, log[log.action == "add"].doc_id)
    )
    members = added - evicted
    batch = {
        (r["source"], r["doc_id"])
        for r in REGISTRY["sample_reservoir"].fn(spark, sf_dir).collect()
    }
    assert members == batch
    # displacement actually happened, or the eviction path went untested
    assert evicted, "no evictions in replay — pick more/smaller batches"
    # every eviction is permanent: an evicted doc never re-enters
    assert not (evicted & members)


def test_reservoir_stream_prefix_consistent_and_redelivery_noop(
    spark, tmp_path
):
    """After EVERY micro-batch the reconstructed membership must equal
    the pure-Python top-K over all docs seen so far (prefix
    consistency — the append-only-displacement property), each doc's
    action history is at most add -> evict, and re-delivering an entire
    earlier batch emits NOTHING (at-least-once absorption)."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_graft.operators.pipeline import RESERVOIR_K
    from spark_graft.streaming import (
        reservoir_stream,
        run_stream_foreach_batch_to_parquet,
    )

    src = tmp_path / "res2_src"
    src.mkdir()
    out, ckpt = str(tmp_path / "res2_out"), str(tmp_path / "res2_ckpt")
    schema = pa.schema([("doc_id", pa.int64()), ("source", pa.string())])
    now = time.time()
    # one stratum, 3 batches of 15 — K=20 fills in batch 2 and every
    # later batch displaces; batch 3 re-delivers batch 1 verbatim
    batches = [list(range(0, 15)), list(range(15, 30)), list(range(30, 45)),
               list(range(0, 15))]
    for i, ids in enumerate(batches):
        pq.write_table(
            pa.table(
                {"doc_id": ids, "source": ["s0"] * len(ids)}, schema=schema
            ),
            str(src / f"c{i}.parquet"),
        )
        os.utime(src / f"c{i}.parquet", (now + i * 10, now + i * 10))

    stream = (
        spark.readStream.schema("doc_id long, source string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    run_stream_foreach_batch_to_parquet(reservoir_stream(stream), out, ckpt)
    log = spark.read.parquet(out).toPandas()

    seen: list[int] = []
    members: set[int] = set()
    history: dict[int, list[str]] = {}
    for b, ids in enumerate(batches):
        rows = log[log.batch_id == b].sort_values("doc_id")
        for r in rows.itertuples():
            history.setdefault(r.doc_id, []).append(r.action)
            (members.add if r.action == "add" else members.discard)(r.doc_id)
        if b == 3:
            assert len(rows) == 0  # verbatim re-delivery emits nothing
            continue
        seen.extend(ids)
        want = {
            d for _, d in sorted(_reservoir_rank_py(d) for d in seen)[:RESERVOIR_K]
        }
        assert members == want, f"batch {b}"
    assert any(h == ["add", "evict"] for h in history.values())
    assert all(h in (["add"], ["add", "evict"]) for h in history.values())


def test_topk_stream_space_saving_guarantees(spark, sf_dir, tmp_path):
    """topk_stream over the real documents replayed as 3 micro-batches:
    the final per-source summaries must honor every space-saving
    guarantee against exact pandas ground truth — est >= true >=
    est - err for each tracked term, any term with true count >
    n_seen/CAPACITY is tracked, n_seen equals the true token total, and
    the emitted rows are rank-ordered."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_graft.sources import table
    from spark_graft.streaming import topk_stream, run_stream_to_memory
    from spark_graft.streaming.structured import TOPK_CAPACITY, TOPK_EMIT

    docs = table(spark, sf_dir, "documents").select("doc_id", "source", "text").toPandas()
    src = tmp_path / "topk_src"
    src.mkdir()
    schema = pa.schema(
        [("doc_id", pa.int64()), ("source", pa.string()), ("text", pa.string())]
    )
    now = time.time()
    cuts = [len(docs) * i // 3 for i in range(4)]
    for i in range(3):
        pq.write_table(
            pa.Table.from_pandas(
                docs.iloc[cuts[i]:cuts[i + 1]], preserve_index=False
            ).cast(schema),
            str(src / f"c{i}.parquet"),
        )
        os.utime(src / f"c{i}.parquet", (now + i * 10, now + i * 10))
    stream = (
        spark.readStream.schema("doc_id long, source string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = run_stream_to_memory(topk_stream(stream), mode="update").toPandas()

    import re
    from collections import Counter, defaultdict

    true = defaultdict(Counter)
    for r in docs.itertuples():
        true[r.source].update(
            t for t in re.split(r"[^a-z0-9]+", r.text.lower()) if t
        )
    for source, final in out.sort_values("n_seen").groupby("source"):
        final = final[final.n_seen == final.n_seen.max()]
        assert len(final) == TOPK_EMIT
        assert list(final.sort_values("rank")["rank"]) == list(range(1, TOPK_EMIT + 1))
        tc = true[source]
        assert final.n_seen.iloc[0] == sum(tc.values())
        tracked = set(final.term)
        for r in final.itertuples():
            assert r.est >= tc[r.term] >= r.est - r.err, (source, r.term)
        # ests are rank-sorted
        ests = list(final.sort_values("rank")["est"])
        assert ests == sorted(ests, reverse=True)
        # every guaranteed-heavy term (true > n/m) appears in the top
        # TOPK_EMIT only if its est ranks there; the SUMMARY guarantee
        # is over the full capacity — check via the threshold terms
        # being tracked among emitted when emitted covers them
        thresh = sum(tc.values()) / TOPK_CAPACITY
        heavy = {t for t, c in tc.items() if c > thresh}
        # space-saving guarantees heavy terms are among the CAPACITY
        # TRACKED counters, not necessarily the est-ordered TOPK_EMIT
        # slice: an err-inflated light counter can legitimately
        # outrank a heavy term (ADVICE r15). The emit slice can only
        # miss a heavy term h if every emitted counter's est >=
        # est(h) >= true(h) > thresh — assert that implied dominance
        # instead of direct membership.
        if len(heavy) <= TOPK_EMIT and not heavy <= tracked:
            assert final.est.min() > thresh, (source, heavy - tracked)


def test_topk_stream_exact_under_capacity_and_deterministic(spark, tmp_path):
    """While a stratum has seen <= CAPACITY distinct terms the summary
    is EXACT: est == true count and err == 0 across a 2-batch replay;
    re-running the same replay yields the identical frame."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_graft.streaming import topk_stream, run_stream_to_memory

    src = tmp_path / "topk2_src"
    src.mkdir()
    schema = pa.schema(
        [("doc_id", pa.int64()), ("source", pa.string()), ("text", pa.string())]
    )
    batches = [
        [(0, "s", "apple apple pear plum"), (1, "s", "apple fig")],
        [(2, "s", "pear apple kiwi kiwi kiwi")],
    ]
    now = time.time()
    for i, rows in enumerate(batches):
        pq.write_table(
            pa.table(
                {
                    "doc_id": [r[0] for r in rows],
                    "source": [r[1] for r in rows],
                    "text": [r[2] for r in rows],
                },
                schema=schema,
            ),
            str(src / f"c{i}.parquet"),
        )
        os.utime(src / f"c{i}.parquet", (now + i * 10, now + i * 10))

    def run():
        stream = (
            spark.readStream.schema("doc_id long, source string, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        pdf = run_stream_to_memory(topk_stream(stream), mode="update").toPandas()
        final = pdf[pdf.n_seen == pdf.n_seen.max()].sort_values("rank")
        return list(zip(final["rank"], final.term, final.est, final.err))

    got = run()
    want = [(1, "apple", 4, 0), (2, "kiwi", 3, 0), (3, "pear", 2, 0),
            (4, "fig", 1, 0), (5, "plum", 1, 0)]
    assert got == want
    assert run() == got  # deterministic replay
    # under capacity the stream equals its oracled batch twin exactly
    from spark_graft.registry import REGISTRY

    batch_dir = tmp_path / "topk_batch"
    batch_dir.mkdir()
    os.makedirs(batch_dir / "documents.parquet")
    all_rows = [r for b in batches for r in b]
    pq.write_table(
        pa.table(
            {
                "doc_id": [r[0] for r in all_rows],
                "text": [r[2] for r in all_rows],
                "lang": ["en"] * len(all_rows),
                "source": [r[1] for r in all_rows],
                "n_chars": [len(r[2]) for r in all_rows],
            }
        ),
        str(batch_dir / "documents.parquet" / "part-0.parquet"),
    )
    twin = [
        (r["rank"], r["term"], r["n"])
        for r in REGISTRY["topk_terms"].fn(spark, str(batch_dir))
        .orderBy("rank").collect()
    ]
    assert twin == [(rk, t, c) for rk, t, c, _ in got]


def test_gopher_rules_stream_equals_batch_battery(spark, sf_dir, tmp_path):
    """Streaming Gopher gate == the batch rule battery, bit-exact:
    replay the documents table as 3 micro-batches through
    gopher_rules_stream and the appended rows must equal
    pipeline_gopher_rules exactly — per-rule booleans, n_fail, keep —
    since both plans build from the one shared gopher_rule_frame
    expression battery. STATELESS like quality_score_stream (no
    watermark, no state store node), so the gate is pure map
    parallelism on the ingest path."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_graft.sources import table
    from spark_graft.streaming import gopher_rules_stream, run_stream_to_memory

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .toPandas()
    )
    src = tmp_path / "gopher_src"
    src.mkdir()
    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    cuts = [0, len(docs) // 3, 2 * len(docs) // 3, len(docs)]
    now = time.time()
    for i in range(3):
        pq.write_table(
            pa.Table.from_pandas(
                docs.iloc[cuts[i]:cuts[i + 1]], preserve_index=False
            ).cast(schema),
            str(src / f"c{i}.parquet"),
        )
        os.utime(src / f"c{i}.parquet", (now + i * 10, now + i * 10))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    gated = gopher_rules_stream(stream)
    logical = gated._jdf.queryExecution().logical().toString()
    assert "EventTimeWatermark" not in logical  # stateless narrow map
    out = run_stream_to_memory(gated, mode="append")
    batch = REGISTRY["pipeline_gopher_rules"].fn(spark, sf_dir)
    assert_frames_match(
        out.toPandas(), batch.toPandas(), "gopher stream==batch battery"
    )
    assert out.count() == len(docs)


def _paragraph_replay_src(spark, sf_dir, tmp_path, name):
    """documents replayed doc-ordered as 3 micro-batch parquet files."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_graft.sources import table

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .toPandas()
    )
    src = tmp_path / name
    src.mkdir()
    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    cuts = [0, len(docs) // 3, 2 * len(docs) // 3, len(docs)]
    now = time.time()
    for i in range(3):
        pq.write_table(
            pa.Table.from_pandas(
                docs.iloc[cuts[i]:cuts[i + 1]], preserve_index=False
            ).cast(schema),
            str(src / f"c{i}.parquet"),
        )
        os.utime(src / f"c{i}.parquet", (now + i * 10, now + i * 10))
    return src, docs


def test_paragraph_dedup_stream_equals_batch_twin(spark, sf_dir, tmp_path):
    """paragraph_dedup_stream over a doc-ordered 3-micro-batch replay ==
    the oracle-checked batch dedup_paragraph: the emitted drop rows,
    grouped per doc, must reproduce the batch twin's n_removed exactly,
    and rebuilding each doc's kept_text from the emitted drop positions
    must equal the batch kept_text — the stream and the batch can't
    disagree on what a paragraph is (shared paragraph_at/
    paragraph_index recipe) or which occurrence wins (lexicographic
    keep-first under doc-ordered arrival)."""
    import re
    from collections import defaultdict

    from spark_graft.operators.dedup import PARA_W
    from spark_graft.streaming import paragraph_dedup_stream, run_stream_to_memory

    src, docs = _paragraph_replay_src(spark, sf_dir, tmp_path, "para_src")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = run_stream_to_memory(paragraph_dedup_stream(stream), mode="update").toPandas()

    batch = {
        r["doc_id"]: r
        for r in REGISTRY["dedup_paragraph"].fn(spark, sf_dir).collect()
    }
    drops_by_doc = defaultdict(set)
    for r in out.itertuples():
        drops_by_doc[r.doc_id].add(r.pos)
        # every drop names a keeper that is lexicographically earlier
        assert (r.keep_doc_id, r.keep_pos) < (r.doc_id, r.pos)
    assert set(drops_by_doc) <= set(batch)
    for doc_id, row in batch.items():
        assert len(drops_by_doc.get(doc_id, ())) == row["n_removed"], doc_id
    # rebuild kept_text from the stream's drop positions
    for r in docs.itertuples():
        ts = [t for t in re.split(r"[^a-z0-9]+", r.text.lower()) if t]
        paras = [
            " ".join(ts[i : i + PARA_W]) for i in range(0, len(ts), PARA_W)
        ]
        kept = " ".join(
            p for i, p in enumerate(paras, start=1)
            if i not in drops_by_doc.get(r.doc_id, ())
        )
        assert kept == batch[r.doc_id]["kept_text"], r.doc_id


def test_paragraph_dedup_stream_redelivery_idempotent(spark, tmp_path):
    """At-least-once semantics: re-delivering batch 1 verbatim emits
    ONLY rows already emitted (keepers emit nothing; duplicate rows
    re-emit identical drop content), so a sink deduping by (doc_id,
    pos) is exact. Also pins within-doc repeats dropping against the
    doc's own first window."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_graft.streaming import paragraph_dedup_stream, run_stream_to_memory

    A = "alpha beta gamma delta epsilon zeta eta theta"
    rows1 = [(1, f"{A} {A}"), (2, "fresh words entirely")]
    rows2 = [(1, f"{A} {A}"), (2, "fresh words entirely")]  # verbatim redelivery
    src = tmp_path / "para_redeliver"
    src.mkdir()
    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    now = time.time()
    for i, rows in enumerate([rows1, rows2]):
        pq.write_table(
            pa.table(
                {"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]},
                schema=schema,
            ),
            str(src / f"c{i}.parquet"),
        )
        os.utime(src / f"c{i}.parquet", (now + i * 10, now + i * 10))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = run_stream_to_memory(paragraph_dedup_stream(stream), mode="update").toPandas()
    got = {
        (r.doc_id, r.pos, r.keep_doc_id, r.keep_pos) for r in out.itertuples()
    }
    # the within-doc repeat drops against the doc's own first window;
    # re-delivery adds NO new distinct rows
    assert got == {(1, 2, 1, 1)}
    assert len(out) == 2  # the re-delivered duplicate re-emits identically


def test_paragraph_dedup_stream_state_survives_checkpoint_restart(spark, tmp_path):
    """paragraph_dedup_stream's keeper map must round-trip the state
    store across a PROCESS restart: run 1 ingests the original doc
    (emits nothing — everything is first); run 2 is a BRAND-NEW query
    object on the same checkpoint reading ONLY a later copy. The copy's
    windows can only be flagged as drops against keepers restored from
    state — a lost or mis-typed state schema would admit the copy as
    original (zero drops)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_graft.streaming import paragraph_dedup_stream

    src, out = tmp_path / "para_ckpt_src", tmp_path / "para_ckpt_out"
    src.mkdir()
    ckpt = str(tmp_path / "para_ckpt")
    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    A = "alpha beta gamma delta epsilon zeta eta theta"

    def add_file(name, rows):
        pq.write_table(
            pa.table(
                {"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]},
                schema=schema,
            ),
            str(src / name),
        )

    def run_query():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )

        def write_batch(batch_df, batch_id):
            batch_df.write.mode("append").parquet(str(out))

        q = (
            paragraph_dedup_stream(stream)
            .writeStream.foreachBatch(write_batch)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    add_file("f0.parquet", [(1, f"{A} one two three four five six seven eight")])
    run_query()
    assert spark.read.parquet(str(out)).count() == 0  # all first occurrences

    add_file("f1.parquet", [(7, A)])  # later copy of doc 1's first window
    run_query()
    got = {
        (r["doc_id"], r["pos"], r["keep_doc_id"], r["keep_pos"])
        for r in spark.read.parquet(str(out)).collect()
    }
    assert got == {(7, 1, 1, 1)}  # keeper restored from checkpointed state


def test_semantic_decon_stream_equals_batch(spark, sf_dir, tmp_path):
    """Stream-static semantic gate == batch decontaminate_semantic,
    bit-exact: train vectors replay as 3 micro-batches against the
    STATIC eval-cell index built from the SAME persisted centroids
    (k = dedup's _emb_k sizing, so the artifact equals the quantizer
    the batch query trains in-query); the final per-vector emissions
    must equal the oracle-checked batch frame exactly — the JVM
    zip_with/aggregate cosine fold reproduces the batch numpy cumsum
    bit-for-bit. The static side must broadcast (the pattern's plan
    requirement)."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_graft import artifacts
    from spark_graft.operators.dedup import _emb_k
    from spark_graft.sources import table
    from spark_graft.streaming import (
        eval_cell_index,
        run_stream_to_memory,
        semantic_decon_stream,
    )

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    pdf = emb.orderBy("vec_id").toPandas()
    cpath = str(tmp_path / "semdecon_cents")
    artifacts.train_and_save_centroids(spark, sf_dir, cpath, k=_emb_k(len(pdf)))
    static_cells = eval_cell_index(spark, sf_dir, cpath).localCheckpoint()

    src = tmp_path / "semdecon_src"
    src.mkdir()
    schema = pa.schema(
        [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32()))]
    )
    cuts = [0, len(pdf) // 3, 2 * len(pdf) // 3, len(pdf)]
    now = time.time()
    for i in range(3):
        chunk = pdf.iloc[cuts[i]:cuts[i + 1]]
        pq.write_table(
            pa.Table.from_pandas(chunk, preserve_index=False).cast(schema),
            str(src / f"c{i}.parquet"),
        )
        os.utime(src / f"c{i}.parquet", (now + i * 10, now + i * 10))

    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = semantic_decon_stream(stream, static_cells, cpath)
    from spark_graft.plans import explain_str

    assert "BroadcastHashJoin" in explain_str(out, "simple")
    emitted = run_stream_to_memory(out, mode="update")
    # each vector's hits finalize in its arrival batch; keep the last
    # emission per vector in case a file split re-emits
    final = (
        emitted.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(F.desc("n_eval_hits"))
            ),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    batch = REGISTRY["decontaminate_semantic"].fn(spark, sf_dir)
    assert_frames_match(
        final.toPandas(), batch.toPandas(), "semdecon stream==batch"
    )
    assert batch.count() > 0  # the equivalence is not vacuous


def test_semantic_decon_stream_drops_zero_norm_pairs(spark, tmp_path):
    """Planted zero-norm vectors (train AND eval): their NaN cosines
    must be DROPPED, matching the batch twin — before the r16 raw-gate
    fix, Spark's NaN-above-everything ordering made NaN >= t true and
    least(greatest(NaN,-1),1) laundered the cosine into a perfect 1.0,
    so a zero-norm train vector flagged as a certain leak. The stream's
    flags must equal batch decontaminate_semantic on the same planted
    corpus (which includes one real leak as the positive control)."""
    import hashlib
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_graft import artifacts
    from spark_graft.operators.dedup import _emb_k
    from spark_graft.streaming import (
        eval_cell_index,
        run_stream_to_memory,
        semantic_decon_stream,
    )

    dim, n = 8, 48

    def vec(i: int) -> list[float]:
        if i == 10:   # eval item: distinctive direction
            return [3.0, 1.0, 0.0, 0.0, 2.0, 0.0, 1.0, 0.0]
        if i == 11:   # the planted leak (positive control)
            return [3.0, 1.0, 0.05, 0.0, 2.0, 0.0, 1.0, 0.0]
        if i in (13, 20):  # zero-norm train (13) and eval (20)
            return [0.0] * dim
        return [
            int(hashlib.md5(f"{i}:{k}".encode()).hexdigest()[:8], 16) / 2**31
            - 1.0
            for k in range(dim)
        ]

    d = tmp_path / "semzero"
    d.mkdir()
    spark.createDataFrame(
        [(i, i % 4, vec(i)) for i in range(n)],
        "vec_id bigint, label int, embedding array<float>",
    ).write.mode("overwrite").parquet(str(d / "embeddings.parquet"))

    cpath = str(tmp_path / "semzero_cents")
    artifacts.train_and_save_centroids(spark, str(d), cpath, k=_emb_k(n))
    static_cells = eval_cell_index(spark, str(d), cpath).localCheckpoint()

    src = tmp_path / "semzero_src"
    src.mkdir()
    schema = pa.schema(
        [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32()))]
    )
    rows = [(i, vec(i)) for i in range(n)]
    now = time.time()
    for b in range(2):
        chunk = rows[b * n // 2:(b + 1) * n // 2]
        pq.write_table(
            pa.table(
                {"vec_id": [r[0] for r in chunk],
                 "embedding": [r[1] for r in chunk]},
                schema=schema,
            ),
            str(src / f"c{b}.parquet"),
        )
        os.utime(src / f"c{b}.parquet", (now + b * 10, now + b * 10))

    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = run_stream_to_memory(
        semantic_decon_stream(stream, static_cells, cpath), mode="update"
    ).toPandas()
    assert 13 not in set(out.vec_id)          # zero-norm train never flags
    assert (out.near_eval_id != 20).all()     # zero-norm eval never a hit
    assert 11 in set(out.vec_id)              # the real leak still flags
    batch = REGISTRY["decontaminate_semantic"].fn(spark, str(d))
    final = (
        spark.createDataFrame(out)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(F.desc("n_eval_hits"))
            ),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    assert_frames_match(
        final.toPandas(), batch.toPandas(), "semdecon zero-norm stream==batch"
    )


def test_paragraph_dedup_stream_seeded_restart_equals_batch_twin(spark, tmp_path):
    """Bootstrap-from-corpus (VERDICT r16 item 2): a fresh deployment
    with NO checkpoint streams ONLY the new batch, seeded with the
    persisted keeper table of the previously-admitted corpus
    (`build_paragraph_seed_index`); the drop set must equal batch
    `dedup_paragraph` over old+new TOGETHER, restricted to new docs.
    The corpus engineers the three paths: a new doc repeating a SEED
    paragraph (dropped purely from the seed — its keeper never flows
    through this stream), a novel paragraph (kept), and a new doc
    repeating that novel paragraph (in-stream keep-first, state written
    on top of the seed). An UNSEEDED run over the same new-batch-only
    stream re-admits the known paragraph — the seed is load-bearing.
    A seed trained on a different corpus is refused at construction."""
    from collections import defaultdict

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from spark_graft.artifacts import (
        ArtifactMismatch,
        save_paragraph_seed_index,
    )
    from spark_graft.streaming import (
        build_paragraph_seed_index,
        paragraph_dedup_stream,
        run_stream_to_memory,
    )

    A = "alpha beta gamma delta epsilon zeta eta theta"     # 8 tokens
    B = "one two three four five six seven eight"           # 8 tokens
    old = [
        (1, f"{A} old unique prose in the admitted corpus"),
        (2, f"{B} other old content entirely its own words"),
    ]
    new = [
        (10, f"{A} brand new trailing thoughts"),   # A repeats a SEED para
        (11, f"{B} {B}"),                           # B seed-dropped, twice
        (12, "completely novel paragraph window content here friends"),
    ]
    doc_dir = tmp_path / "docs"
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in old + new],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(str(doc_dir / "documents.parquet"))
    batch = {
        r["doc_id"]: r
        for r in REGISTRY["dedup_paragraph"].fn(spark, str(doc_dir)).collect()
    }

    # the old deployment's admitted corpus -> persisted keeper table
    seed_path = str(tmp_path / "para_seed_artifact")
    save_paragraph_seed_index(
        seed_path,
        build_paragraph_seed_index(
            spark.createDataFrame(old, "doc_id bigint, text string")
        ),
        sf_dir=str(doc_dir),
    )

    # the restarted deployment sees ONLY the new batch
    src = tmp_path / "para_stream_new_only"
    src.mkdir()
    t = pa.Table.from_pandas(
        pd.DataFrame(
            {"doc_id": [i for i, _ in new], "text": [t for _, t in new]}
        ),
        preserve_index=False,
    ).cast(pa.schema([("doc_id", pa.int64()), ("text", pa.string())]))
    pq.write_table(t, str(src / "new.parquet"))

    def run(seed):
        stream = spark.readStream.schema("doc_id long, text string").parquet(
            str(src)
        )
        out = run_stream_to_memory(
            paragraph_dedup_stream(
                stream,
                seed_index_path=seed,
                seed_sf_dir=str(doc_dir) if seed else None,
            ),
            mode="update",
        ).toPandas()
        return out

    wrong = tmp_path / "para_wrongdocs"
    wrong.mkdir()
    spark.createDataFrame(
        [(0, "some other corpus entirely", "en", "s", 26)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.parquet(str(wrong / "documents.parquet"))
    with pytest.raises(ArtifactMismatch):
        paragraph_dedup_stream(
            spark.readStream.schema("doc_id long, text string").parquet(str(src)),
            seed_index_path=seed_path,
            seed_sf_dir=str(wrong),
        )

    out = run(seed_path)
    drops_by_doc = defaultdict(set)
    for r in out.itertuples():
        drops_by_doc[r.doc_id].add(r.pos)
    # per-new-doc drop counts == the batch twin over old+new
    for doc_id, _ in new:
        assert len(drops_by_doc.get(doc_id, ())) == batch[doc_id]["n_removed"], doc_id
    # the seed-para drops name keepers that never flowed through the
    # stream (the old corpus' doc_ids)
    seed_drops = [r for r in out.itertuples() if r.keep_doc_id in (1, 2)]
    assert seed_drops and all(r.doc_id >= 10 for r in seed_drops)
    # doc 11's second B-window drops with an in-seed keeper too
    assert len(drops_by_doc[11]) == batch[11]["n_removed"] == 2
    # ...and WITHOUT the seed the known paragraphs are re-admitted
    out_unseeded = run(None)
    unseeded_keepers = set(out_unseeded["keep_doc_id"])
    assert not unseeded_keepers & {1, 2}
    assert len(out_unseeded) < len(out)


def test_dsir_score_stream_equals_batch_select(spark, sf_dir, tmp_path):
    """dsir_score_stream over a 3-micro-batch replay of the candidate
    (non-target) docs, serving the persisted dense ratio table fitted
    by the batch recipe, == oracle-checked `dsir_select` bit-exactly:
    kept set, n_feat, score, and weight all match (the per-gram fold
    equals sum_dim c_dim * w_dim; shared dsir_grams/dsir_dim
    expressions). Target-source docs score too (serving is
    source-blind) but are excluded from the replay so the comparison
    universe is the batch query's. A sparse (non-dense) ratio artifact
    is refused at stream construction."""
    import os
    import time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from spark_graft.artifacts import save_dsir_ratios
    from spark_graft.operators.pipeline import (
        DSIR_TARGET_SOURCES,
        dsir_feat_table,
        dsir_ratio_table,
    )
    from spark_graft.sources import table
    from spark_graft.streaming import dsir_score_stream, run_stream_to_memory

    docs = table(spark, sf_dir, "documents")
    feat = dsir_feat_table(docs).localCheckpoint()
    ratios_path = str(tmp_path / "dsir_ratios_artifact")
    save_dsir_ratios(
        ratios_path, dsir_ratio_table(feat, dense=True), sf_dir=sf_dir
    )
    # a sparse artifact is refused at construction
    sparse_path = str(tmp_path / "dsir_ratios_sparse")
    save_dsir_ratios(sparse_path, dsir_ratio_table(feat, dense=True).limit(10))
    dummy = spark.readStream.schema("doc_id long, text string").parquet(
        str(tmp_path)
    )
    with pytest.raises(ValueError, match="not dense"):
        dsir_score_stream(dummy, sparse_path)

    cand = (
        docs.filter(~F.col("source").isin(*DSIR_TARGET_SOURCES))
        .select("doc_id", "text")
        .orderBy("doc_id")
        .toPandas()
    )
    src = tmp_path / "dsir_src"
    src.mkdir()
    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    cuts = [0, len(cand) // 3, 2 * len(cand) // 3, len(cand)]
    now = time.time()
    for i in range(3):
        pq.write_table(
            pa.Table.from_pandas(
                cand.iloc[cuts[i]:cuts[i + 1]], preserve_index=False
            ).cast(schema),
            str(src / f"c{i}.parquet"),
        )
        os.utime(src / f"c{i}.parquet", (now + i * 10, now + i * 10))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = run_stream_to_memory(
        dsir_score_stream(stream, ratios_path), mode="append"
    ).toPandas()
    assert len(out) == len(cand)  # every arrival scored exactly once

    batch = {
        r["doc_id"]: r for r in REGISTRY["dsir_select"].fn(spark, sf_dir).collect()
    }
    kept = out[out["keep"]]
    assert set(kept["doc_id"]) == set(batch)
    for r in kept.itertuples():
        b = batch[r.doc_id]
        assert (r.n_feat, r.score) == (b["n_feat"], b["score"]), r.doc_id
        assert abs(r.weight - b["weight"]) < 1e-12, r.doc_id
    # unkept rows carry NULL weight (guarded division)
    assert out[~out["keep"]]["weight"].isna().all()


def test_paragraph_dedup_stream_seed_and_checkpoint_compose(spark, tmp_path):
    """Seed + checkpoint interplay: a seeded deployment that checkpoints
    batch 1 and then RESTARTS (same checkpoint, same seed) must treat
    batch 2 correctly on BOTH kinds of keys — hashes whose state was
    written in batch 1 (state wins, seed no longer consulted) and
    hashes arriving for the first time after the restart (seed still
    consulted). Emissions across the restart must equal the batch twin
    over seed-corpus + both batches, restricted to streamed docs."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_graft.artifacts import save_paragraph_seed_index
    from spark_graft.streaming import (
        build_paragraph_seed_index,
        paragraph_dedup_stream,
    )

    A = "alpha beta gamma delta epsilon zeta eta theta"   # seed para
    B = "one two three four five six seven eight"         # seed para
    old = [(1, A), (2, B)]
    b1 = [(10, f"{A} fresh one tail"),                     # seed-hit in batch 1
          (11, "novel paragraph content arriving first here batch one")]
    b2 = [(20, f"{B} later arrival words"),                # FIRST seed-hit post-restart
          (21, b1[1][1]),                                  # repeats batch-1 novel para
          (22, f"{A} another copy after restart")]         # seed-para seen in b1 too
    all_rows = old + b1 + b2

    doc_dir = tmp_path / "docs"
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in all_rows],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(str(doc_dir / "documents.parquet"))
    batch = {
        r["doc_id"]: r
        for r in REGISTRY["dedup_paragraph"].fn(spark, str(doc_dir)).collect()
    }

    seed_path = str(tmp_path / "seedck_artifact")
    save_paragraph_seed_index(
        seed_path,
        build_paragraph_seed_index(
            spark.createDataFrame(old, "doc_id bigint, text string")
        ),
    )

    src = tmp_path / "seedck_src"
    src.mkdir()
    ckpt = str(tmp_path / "seedck_ckpt")
    out_dir = tmp_path / "seedck_out"
    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])

    def write_src(rows, name):
        pq.write_table(
            pa.Table.from_pandas(
                pd.DataFrame(
                    {"doc_id": [i for i, _ in rows], "text": [t for _, t in rows]}
                ),
                preserve_index=False,
            ).cast(schema),
            str(src / name),
        )

    def run_once():
        # foreachBatch parquet sink: the memory sink cannot recover
        # from a checkpoint (the state-restart test's pattern)
        stream = spark.readStream.schema("doc_id long, text string").parquet(
            str(src)
        )

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(str(out_dir))

        q = (
            paragraph_dedup_stream(stream, seed_index_path=seed_path)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(str(out_dir)).toPandas()

    write_src(b1, "b1.parquet")
    out1 = run_once()
    write_src(b2, "b2.parquet")
    os.utime(src / "b2.parquet", None)
    total = run_once()   # RESTART from the checkpoint; only b2 is new
    out2 = (
        total.merge(out1, how="outer", indicator=True)
        .query("_merge == 'left_only'")
        .drop(columns="_merge")
    )

    drops = {}
    for r in total.itertuples():
        drops.setdefault(r.doc_id, set()).add(r.pos)
    for doc_id, _ in b1 + b2:
        assert len(drops.get(doc_id, ())) == batch[doc_id]["n_removed"], doc_id
    # batch-2 paths, asserted loudly:
    # doc 20: seed consulted for the FIRST time after the restart
    assert any(r.doc_id == 20 and r.keep_doc_id == 2 for r in out2.itertuples())
    # doc 21: dropped against batch-1 state restored from the checkpoint
    assert any(r.doc_id == 21 and r.keep_doc_id == 11 for r in out2.itertuples())
    # doc 22: A-paragraph keeper is STILL the seed's doc 1 (state written
    # in batch 1 preserved the seed keeper, not doc 10)
    assert any(r.doc_id == 22 and r.keep_doc_id == 1 for r in out2.itertuples())


def test_stateless_ingest_gates_plan_no_state_no_shuffle(spark, sf_dir, tmp_path):
    """The score-on-ingest gates (gopher_rules_stream, dsir_score_stream)
    must STAY stateless maps as they evolve: the micro-batch physical
    plan contains no state-store operator and no Exchange — pure scan +
    narrow expressions, so ingest throughput is map parallelism at any
    scale. Captured from inside foreachBatch, where the micro-batch is
    a plain DataFrame."""
    import uuid

    from spark_graft.artifacts import save_dsir_ratios
    from spark_graft.operators.pipeline import dsir_feat_table, dsir_ratio_table
    from spark_graft.sources import table
    from spark_graft.streaming import dsir_score_stream, gopher_rules_stream

    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = table(spark, sf_dir, "documents")
    src = tmp_path / "gate_plan_src"
    src.mkdir()
    pdf = docs.select("doc_id", "text", "lang", "source").limit(50).toPandas()
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False).cast(
            pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("text", pa.string()),
                    ("lang", pa.string()),
                    ("source", pa.string()),
                ]
            )
        ),
        str(src / "d.parquet"),
    )
    ratios_path = str(tmp_path / "gate_plan_ratios")
    save_dsir_ratios(
        ratios_path, dsir_ratio_table(dsir_feat_table(docs).localCheckpoint(), dense=True)
    )

    def build_gopher(stream):
        return gopher_rules_stream(stream)

    def build_dsir(stream):
        return dsir_score_stream(stream, ratios_path)

    for label, build in (("gopher", build_gopher), ("dsir", build_dsir)):
        stream = spark.readStream.schema(
            "doc_id long, text string, lang string, source string"
        ).parquet(str(src))
        plans = []

        def sink(bdf, bid):
            plans.append(bdf._jdf.queryExecution().executedPlan().toString())
            bdf.count()

        q = (
            build(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"gate_ckpt_{uuid.uuid4().hex[:6]}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        assert plans, label
        for p in plans:
            assert "StateStore" not in p, (label, p)
            assert "Exchange" not in p, (label, p)
            assert "Generate" not in p, (label, p)  # no explode on the hot path


def test_paragraph_seed_boundary_mode_travels_with_artifact(spark, tmp_path):
    """r18 (ADVICE item): the paragraph boundary mode is part of a seed
    artifact's identity — window-mode and newline-mode fingerprints are
    disjoint hash spaces, so a newline-built seed fed to the
    window-matching stream would silently never match (re-admitting
    every known paragraph). The mode now travels in the artifact meta:
    `paragraph_dedup_stream` REFUSES a newline seed at construction,
    a window seed (explicit or pre-r18 default) is accepted, and the
    saver rejects unknown modes outright."""
    import pytest

    from spark_graft.artifacts import (
        ArtifactMismatch,
        save_paragraph_seed_index,
    )
    from spark_graft.streaming import (
        build_paragraph_seed_index,
        paragraph_dedup_stream,
    )

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma\n\ndelta epsilon zeta eta theta iota kappa"),
            (2, "one two three four five six seven eight nine ten"),
        ],
        "doc_id bigint, text string",
    )
    # the two modes genuinely fingerprint differently on this corpus
    fps = {
        b: {
            r["fp"]
            for r in build_paragraph_seed_index(corpus, boundary=b).collect()
        }
        for b in ("window", "newline")
    }
    assert fps["window"] != fps["newline"]

    nl_path = str(tmp_path / "seed_nl")
    save_paragraph_seed_index(
        nl_path, build_paragraph_seed_index(corpus, boundary="newline"),
        boundary="newline",
    )
    src = tmp_path / "src"
    src.mkdir()
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src)
    )
    with pytest.raises(ArtifactMismatch, match="boundary mode 'newline'"):
        paragraph_dedup_stream(stream, seed_index_path=nl_path)

    ok_path = str(tmp_path / "seed_win")
    save_paragraph_seed_index(
        ok_path, build_paragraph_seed_index(corpus), boundary="window"
    )
    paragraph_dedup_stream(stream, seed_index_path=ok_path)  # accepted

    with pytest.raises(ValueError, match="unknown paragraph boundary"):
        save_paragraph_seed_index(
            str(tmp_path / "seed_bad"),
            build_paragraph_seed_index(corpus),
            boundary="sentence",
        )


def test_paragraph_gate_provider_independent_rocksdb(spark, tmp_path):
    """r18 RocksDB pilot companion: the paragraph dedup gate must emit
    the IDENTICAL drop set under the RocksDB state-store provider as
    under the default HDFS-backed one — provider choice is a storage
    decision (heap vs off-heap/disk, BENCH_SF1
    stream_state_sizing_rocksdb_r18), never a semantics decision. Runs
    the same replay twice, flipping only
    spark.sql.streaming.stateStore.providerClass (read per query at
    start), and compares full outputs."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_graft.streaming import paragraph_dedup_stream

    A = "alpha beta gamma delta epsilon zeta eta theta"
    docs = [
        (1, f"{A} unique first document prose right here"),
        (2, f"{A} other trailing content of the second"),
        (3, f"{A} {A}"),
        (4, "completely novel paragraph window content here friends"),
    ]
    src = tmp_path / "src"
    src.mkdir()
    t = pa.Table.from_pandas(
        pd.DataFrame(
            {"doc_id": [i for i, _ in docs], "text": [t for _, t in docs]}
        ),
        preserve_index=False,
    ).cast(pa.schema([("doc_id", pa.int64()), ("text", pa.string())]))
    pq.write_table(t, str(src / "docs.parquet"))

    key = "spark.sql.streaming.stateStore.providerClass"
    rocks = (
        "org.apache.spark.sql.execution.streaming."
        "state.RocksDBStateStoreProvider"
    )
    had = spark.conf.get(key, None)

    def run():
        stream = spark.readStream.schema("doc_id long, text string").parquet(
            str(src)
        )
        out = run_stream_to_memory(
            paragraph_dedup_stream(stream), mode="update"
        ).toPandas()
        return sorted(map(tuple, out.itertuples(index=False)))

    try:
        base = run()
        spark.conf.set(key, rocks)
        got = run()
    finally:
        if had is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, had)
    assert base == got and len(base) > 0


def test_judgment_consistency_stream_serves_frozen_fit(spark, tmp_path):
    """r18, 19th streaming component: `judgment_consistency_stream`
    scores arriving pairwise judgments against the persisted
    Bradley-Terry fit — consistent/contradicts/tie/unknown verdicts,
    exact margin_fx — and must (a) agree with the batch join over the
    same rating table for EVERY verdict class, (b) plan as a stateless
    broadcast map: no state store, no stream-side shuffle (only
    BroadcastExchange for the O(items) rating table), and (c) refuse a
    wrong-kind artifact at construction."""
    import uuid

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from spark_graft.artifacts import (
        ArtifactMismatch,
        save_dsir_ratios,
        save_preference_ratings,
    )
    from spark_graft.operators.curriculum import preference_rating_frame
    from spark_graft.streaming import (
        judgment_consistency_stream,
        run_stream_to_memory,
    )

    # fit: A(1) >> B(2) >> C(3); D(4) never wins; E(5)/F(6) symmetric
    # 1:1 so their ratings TIE exactly
    fit_judgments = (
        [(1, 2)] * 9 + [(2, 1)]
        + [(2, 3)] * 9 + [(3, 2)]
        + [(1, 3)] * 9 + [(3, 1)]
        + [(1, 4)] * 5
        + [(5, 6), (6, 5)]
    )
    fitted = preference_rating_frame(
        spark.createDataFrame(
            fit_judgments, "chosen_id bigint, rejected_id bigint"
        )
    )
    ratings_path = str(tmp_path / "bt_ratings")
    save_preference_ratings(ratings_path, fitted)
    rating = {r["doc_id"]: r["rating_fx"] for r in fitted.collect()}
    assert rating[5] == rating[6]  # the planted tie is real

    # arriving judgments: one of each verdict class
    arrive = [(1, 3), (3, 1), (5, 6), (1, 99)]
    src = tmp_path / "judg_src"
    src.mkdir()
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "chosen_id": [c for c, _ in arrive],
                    "rejected_id": [r for _, r in arrive],
                }
            ),
            preserve_index=False,
        ).cast(
            pa.schema([("chosen_id", pa.int64()), ("rejected_id", pa.int64())])
        ),
        str(src / "j.parquet"),
    )
    stream = spark.readStream.schema(
        "chosen_id long, rejected_id long"
    ).parquet(str(src))
    out = {
        (r["chosen_id"], r["rejected_id"]): (r["verdict"], r["margin_fx"])
        for r in run_stream_to_memory(
            judgment_consistency_stream(stream, ratings_path), mode="append"
        ).collect()
    }
    m = rating[1] - rating[3]
    assert out == {
        (1, 3): ("consistent", m),
        (3, 1): ("contradicts", -m),
        (5, 6): ("tie", 0),
        (1, 99): ("unknown", None),
    }

    # plan pin: stateless broadcast map. (foreachBatch hands this
    # join-bearing micro-batch over as an already-executed
    # Scan ExistingRDD, hiding the shape — read the last micro-batch's
    # physical plan off the streaming query itself instead.)
    stream2 = spark.readStream.schema(
        "chosen_id long, rejected_id long"
    ).parquet(str(src))
    q = (
        judgment_consistency_stream(stream2, ratings_path)
        .writeStream.format("memory")
        .queryName(f"judg_plan_{uuid.uuid4().hex[:6]}")
        .outputMode("append")
        .option(
            "checkpointLocation",
            str(tmp_path / f"judg_ckpt_{uuid.uuid4().hex[:6]}"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    p = q._jsq.explainInternal(False)
    assert "StateStore" not in p, p
    assert "hashpartitioning" not in p, p  # no stream-side shuffle
    assert "BroadcastHashJoin" in p, p

    # wrong-kind artifact refused at construction
    wrong = str(tmp_path / "not_ratings")
    save_dsir_ratios(
        wrong,
        spark.createDataFrame(
            [(i, 1_000_000) for i in range(64)], "dim int, w bigint"
        ),
    )
    with pytest.raises(ArtifactMismatch, match="kind"):
        judgment_consistency_stream(stream2, wrong)


def test_dsir_score_stream_null_text_is_zero_gram_class(spark, sf_dir, tmp_path):
    """r18 (ADVICE item companion): a NULL-text doc arriving at the
    DSIR ingest gate must land in the zero-gram class — n_feat = 0,
    score = 0, keep = false — exactly like empty text, because the
    grams ARRAY is coalesced (dsir_grams(NULL) is NULL; an
    un-coalesced size() would emit NULL n_feat, or -1 under
    spark.sql.legacy.sizeOfNull)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_graft.artifacts import save_dsir_ratios
    from spark_graft.operators.pipeline import dsir_feat_table, dsir_ratio_table
    from spark_graft.sources import table
    from spark_graft.streaming import dsir_score_stream, run_stream_to_memory

    ratios_path = str(tmp_path / "nulltext_ratios")
    save_dsir_ratios(
        ratios_path,
        dsir_ratio_table(
            dsir_feat_table(table(spark, sf_dir, "documents")).localCheckpoint(),
            dense=True,
        ),
    )
    src = tmp_path / "nulltext_src"
    src.mkdir()
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(
                {"doc_id": [1, 2, 3], "text": [None, "", "spark data rows"]}
            ),
            preserve_index=False,
        ).cast(pa.schema([("doc_id", pa.int64()), ("text", pa.string())])),
        str(src / "d.parquet"),
    )
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src)
    )
    out = {
        r["doc_id"]: (r["n_feat"], r["score"], r["keep"])
        for r in run_stream_to_memory(
            dsir_score_stream(stream, ratios_path), mode="append"
        ).collect()
    }
    assert out[1] == (0, 0, False) and out[1] == out[2]
    assert out[3][0] > 0


def test_curriculum_stage_stream_serves_frozen_quantiles(spark, sf_dir, tmp_path):
    """r18, 20th streaming component: `curriculum_stage_stream` must
    (a) reproduce batch `pipeline_curriculum` EXACTLY when the fit
    corpus itself is replayed (the threshold encoding L_k = min length
    with stage > k is a lossless rewrite of the monotone stage
    function), (b) step-extend to unseen lengths — between fitted
    lengths the floor-fitted stage, above-max the max fitted stage,
    below-min stage 1, with empty leading stages (a shortest bucket
    that already spans quartiles) exercised, (c) plan as a pure
    stateless map: no
    state store, no Exchange, no Generate, and (d) refuse a
    wrong-kind artifact."""
    import uuid

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from spark_graft.artifacts import (
        ArtifactMismatch,
        save_curriculum_thresholds,
        save_preference_ratings,
    )
    from spark_graft.operators.curriculum import curriculum_thresholds
    from spark_graft.registry import REGISTRY
    from spark_graft.sources import table
    from spark_graft.streaming import (
        curriculum_stage_stream,
        run_stream_to_memory,
    )

    # (a) fit on the fixture, replay the fixture
    th_path = str(tmp_path / "cur_thresholds")
    save_curriculum_thresholds(
        th_path, curriculum_thresholds(spark, sf_dir), sf_dir=sf_dir
    )
    src = tmp_path / "cur_src"
    src.mkdir()
    pdf = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .toPandas()
    )
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False).cast(
            pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
        ),
        str(src / "d.parquet"),
    )
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src)
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["stage"])
        for r in run_stream_to_memory(
            curriculum_stage_stream(stream, th_path, sf_dir=sf_dir),
            mode="append",
        ).collect()
    }
    want = {
        r["doc_id"]: (r["n_tokens"], r["stage"])
        for r in REGISTRY["pipeline_curriculum"].fn(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0

    # (b) planted fit with an EMPTY leading stage: 6 docs at length 2
    # (cum 6/10 -> stage 3: stages 1-2 empty), 4 at length 9 (stage 4)
    planted = spark.createDataFrame(
        [(i, "a b") for i in range(6)]
        + [(i, "c " * 9) for i in range(6, 10)],
        "doc_id bigint, text string",
    )
    th2 = str(tmp_path / "cur_th_planted")
    d2 = tmp_path / "planted_docs"
    d2.mkdir()
    planted.write.mode("overwrite").parquet(str(d2 / "documents.parquet"))
    save_curriculum_thresholds(th2, curriculum_thresholds(spark, str(d2)))
    arrive = [(100, None), (101, "x"), (102, "a b"), (103, "w " * 5), (104, "w " * 40)]
    src2 = tmp_path / "cur_src2"
    src2.mkdir()
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(
                {"doc_id": [i for i, _ in arrive], "text": [t for _, t in arrive]}
            ),
            preserve_index=False,
        ).cast(pa.schema([("doc_id", pa.int64()), ("text", pa.string())])),
        str(src2 / "d.parquet"),
    )
    stream2 = spark.readStream.schema("doc_id long, text string").parquet(
        str(src2)
    )
    got2 = {
        r["doc_id"]: (r["n_tokens"], r["stage"])
        for r in run_stream_to_memory(
            curriculum_stage_stream(stream2, th2), mode="append"
        ).collect()
    }
    # fitted stages: len 2 -> 3, len 9 -> 4, so L1 = L2 = 2, L3 = 9.
    # Unseen: NULL/1-token below min -> stage 1 (shortest goes first);
    # len 5 between fitted lengths -> floor-fitted stage (3); len 40
    # above max -> the max fitted stage (4)
    assert got2 == {
        100: (0, 1),
        101: (1, 1),
        102: (2, 3),
        103: (5, 3),
        104: (40, 4),
    }

    # (c) stateless pure-map plan (no join at all, so foreachBatch
    # shows the real micro-batch operators)
    stream3 = spark.readStream.schema("doc_id long, text string").parquet(
        str(src)
    )
    plans = []

    def sink(bdf, bid):
        plans.append(bdf._jdf.queryExecution().executedPlan().toString())
        bdf.count()

    q = (
        curriculum_stage_stream(stream3, th_path)
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option(
            "checkpointLocation",
            str(tmp_path / f"cur_ckpt_{uuid.uuid4().hex[:6]}"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert plans
    for p in plans:
        assert "StateStore" not in p, p
        assert "Exchange" not in p, p
        assert "Generate" not in p, p

    # (d) wrong-kind artifact refused
    wrong = str(tmp_path / "cur_wrong_kind")
    save_preference_ratings(
        wrong,
        spark.createDataFrame([(1, 5)], "doc_id bigint, rating_fx bigint"),
    )
    with pytest.raises(ArtifactMismatch, match="kind"):
        curriculum_stage_stream(stream3, wrong)
