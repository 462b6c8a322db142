"""Structured Streaming variants of the event queries (SURVEY.md §7 M6).

The batch twins in spark_graft.operators.events define the semantics and
carry the DuckDB oracles; these streaming versions are verified by
equivalence to them (tests/test_streaming.py) using the file source in
`availableNow` mode + a memory sink — the same incremental plans that
run unbounded in production.

Watermarking: 1 hour on event time. In production the watermark bounds
window/session state eviction; with availableNow replay of a finite
directory it admits every row, so streaming results equal batch results
exactly — which is what makes the equivalence test sound.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_graft.operators.events import SESSION_GAP_MIN
from spark_graft.sources.tables import table

WATERMARK = "1 hour"


def _reorder_split(bts: list, beid: list, wm_us: int) -> tuple[list, list]:
    """The event-time re-order buffer's release decision, shared by
    every reorder-buffered stream (cep_pattern_stream, ewma_stream):
    index lists into the buffered (ts_us, event_id) arrays — RELEASE
    strictly below the watermark in (ts, event_id) order, KEEP the
    rest. Strictly below, because Spark only guarantees no FUTURE row
    older than the watermark: a row AT it may still arrive and must
    find the frontier not yet advanced past it."""
    order = sorted(range(len(bts)), key=lambda i: (bts[i], beid[i]))
    rel = [i for i in order if bts[i] < wm_us]
    keep = [i for i in order if bts[i] >= wm_us]
    return rel, keep


def _reorder_set_timeout(state, bts: list) -> None:
    """Wake the group when the watermark passes its oldest buffered
    event (the timestamp must exceed the current watermark by API
    contract; everything < wm was just released, so only the == edge
    needs the max). Shared by every reorder-buffered stream."""
    if bts:
        state.setTimeoutTimestamp(
            max(min(bts) // 1000, state.getCurrentWatermarkMs() + 1)
        )


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as an unbounded file stream. The file source needs
    a directory (basePath) + glob, and the declared schema must be the
    RAW parquet schema — ts arrives as nanos-as-long (see
    sources.tables) and is converted on the stream itself."""
    from spark_graft.sources.tables import ensure_session_confs

    ensure_session_confs(spark)
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream


def tumbling_counts_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of operators.events.stream_tumbling: watermarked
    5-minute tumbling windows. State per (window, event_type) is evicted
    once the watermark passes window end — bounded memory forever."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


def session_counts_stream(events: DataFrame) -> DataFrame:
    """Streaming sessionization via session_window — Spark's native
    gap-based session operator (state merges windows closer than the
    gap; watermark closes sessions)."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy("user_id", F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            "n_events",
        )
    )


def user_totals_stream(events: DataFrame) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user
    running event count and max value, emitted as cumulative totals
    after every micro-batch.

    This is the template for stateful logic Spark's built-in windowed
    aggregates can't express (per-key ML feature state, decaying
    counters, custom session logic): state is an explicit per-key tuple,
    updates arrive as Arrow batches, and the store shuffles once on the
    grouping key — the same bounded-state plan at any scale. Emitted
    fields are order-insensitive (count/max), so the equivalence test
    against the batch groupBy is exact, not approximate."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, mx = state.get if state.exists else (0, None)
        for pdf in pdfs:
            n += len(pdf)
            batch_max = pdf["value"].max()  # skips nulls; NaN if all-null
            if len(pdf) and not pd.isna(batch_max):
                mx = float(batch_max) if mx is None else max(mx, float(batch_max))
        state.update((n, mx))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "max_value": [mx]}
        )

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            "user_id bigint, n_events bigint, max_value double",
            "n bigint, mx double",
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def dedup_stream(events: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Streaming deduplication: dropDuplicatesWithinWatermark keeps one
    row per key and — unlike plain dropDuplicates on a stream — EVICTS
    each key's state once the watermark passes its event time. That
    bound is what lets exactly-once dedup of an at-least-once source
    (replayed files, Kafka redeliveries) run forever at 100 TB/day
    instead of accumulating every key ever seen."""
    return events.withWatermark("ts", WATERMARK).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


ATTRIB_WINDOW_MIN = 30


def attribution_join_stream(events: DataFrame) -> DataFrame:
    """Stream-stream inner join: each purchase joined to every click by
    the same user in the preceding {ATTRIB_WINDOW_MIN} minutes — the
    attribution join of an event pipeline, run as two unbounded streams.

    The two requirements that make an unbounded stream-stream join
    feasible are both visible here: a watermark on EACH side, and a
    time-range predicate tying the sides together. Spark derives the
    state-retention bound from them (a buffered click can only ever
    match purchases within the window, so once the purchase watermark
    passes click_ts + window + watermark the click's state is evicted).
    Without either, state grows forever. The equi-key (user_id) keeps it
    one hash-partitioned shuffle per side — the same keyed-join shape as
    the batch twin, just with buffering instead of a sort."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", WATERMARK)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", WATERMARK)
    )
    return clicks.join(
        purchases,
        F.expr(
            f"""c_user_id = p_user_id
            AND purchase_ts >= click_ts
            AND purchase_ts <= click_ts + INTERVAL {ATTRIB_WINDOW_MIN} MINUTES"""
        ),
        "inner",
    ).select(
        F.col("c_user_id").alias("user_id"),
        "click_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
    )


def run_stream_foreach_batch_to_parquet(
    stream_df: DataFrame, out_dir: str, checkpoint_dir: str,
    output_mode: str | None = None,
) -> None:
    """foreachBatch sink: each micro-batch lands as parquet stamped with
    its batch_id. foreachBatch is the production escape hatch for sinks
    Spark lacks connectors for (JDBC upserts, external indexes) — the
    batch_id makes retried batches idempotently detectable, and the
    checkpoint directory carries exactly-once progress across restarts.

    output_mode: None keeps the sink default (append); "update" emits
    every aggregate row changed by the batch — the mode that exposes
    per-batch state evolution (tests/test_streaming.py drives 3 distinct
    micro-batches through this and asserts counts grow batch-over-batch)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            out_dir
        )

    w = stream_df.writeStream.foreachBatch(write_batch)
    if output_mode is not None:
        w = w.outputMode(output_mode)
    q = (
        w.option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_stream_to_memory(stream_df: DataFrame, mode: str = "complete") -> DataFrame:
    """Drain a finite stream through a memory sink with availableNow
    (process-everything-then-stop) and return the sink contents as a
    DataFrame. The streaming query plan is the real incremental one."""
    name = f"sink_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")


def sliding_counts_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of operators.events.stream_sliding: watermarked
    10-minute windows hopping every 5 — each event updates 2 window
    states; eviction still follows window END + watermark, so overlap
    widens state by the constant overlap factor, not unboundedly."""
    from spark_graft.operators.events import SLIDE_STEP_MIN, SLIDE_WIDTH_MIN

    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(
            F.window(
                "ts", f"{SLIDE_WIDTH_MIN} minutes", f"{SLIDE_STEP_MIN} minutes"
            ).alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value"
        )
    )


def cms_cells_stream(events: DataFrame) -> DataFrame:
    """Streaming count-min sketch: per watermarked 1-hour tumbling
    window, the CMS_DEPTH x CMS_WIDTH (4x256) cell grid of `agg_sketch_cms`
    (operators.relational) built over user_id frequencies — the
    heavy-hitter monitoring half of production frequency tracking,
    running incrementally.

    Why a sketch is THE streaming aggregate: state per window is capped
    at D*W cells regardless of how many distinct users the window sees
    (an exact per-user count would grow state with cardinality), and
    cells are MERGEABLE — a window's grid adds cell-wise onto any other
    window's, so a day/tenant/shard rollup is one more groupBy-sum over
    grids, never a rescan of events. The equivalence test asserts both
    properties: stream==batch per window, and the cell-wise sum across
    windows equals the whole-corpus sketch built in one batch pass.

    Plan: the xD fan-out is a narrow explode before the windowed
    aggregation; state eviction follows window end + watermark exactly
    like tumbling_counts_stream."""
    from spark_graft.operators.relational import CMS_DEPTH, _cms_bucket_spark

    fan = events.withWatermark("ts", WATERMARK).select(
        "ts",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cms_bucket_spark(F.col("user_id").cast("string"), d).alias(
                            "bucket"
                        ),
                    )
                    for d in range(CMS_DEPTH)
                ]
            )
        ).alias("db"),
    )
    return (
        fan.groupBy(
            F.window("ts", "60 minutes").alias("w"),
            F.col("db.d").alias("d"),
            F.col("db.bucket").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("cell"))
        .select(F.col("w.start").alias("window_start"), "d", "bucket", "cell")
    )


def _banded_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, sh, band, sig): MinHash band rows + the '|'-joined
    shingle set, as NARROW HOF expressions only — shared by the
    streaming novelty gate (works on an unbounded stream) and
    `build_novelty_seed_index` (works on a batch corpus), so the seed
    index is bit-compatible with the state the stream accumulates."""
    from spark_graft.functions import shingles_from_tokens, tokens
    from spark_graft.operators.dedup import MINHASH_PRIME, N_BANDS, N_PERMS

    rows_per_band = N_PERMS // N_BANDS
    staged = (
        docs.select("doc_id", tokens("text").alias("toks"))
        .select("doc_id", shingles_from_tokens("toks", 3).alias("shingles"))
        .filter(F.size("shingles") > 0)
    )
    hashed = staged.select(
        "doc_id",
        "shingles",
        F.transform(
            "shingles",
            lambda s: F.struct(
                F.conv(F.substring(F.md5(s), 1, 8), 16, 10)
                .cast("bigint")
                .alias("h1"),
                F.conv(F.substring(F.md5(s), 9, 8), 16, 10)
                .cast("bigint")
                .alias("h2"),
            ),
        ).alias("hs"),
    )
    sig = hashed.select(
        "doc_id",
        "shingles",
        *[
            F.array_min(
                F.transform(
                    "hs", lambda h: (h["h1"] + F.lit(p) * h["h2"]) % MINHASH_PRIME
                )
            ).alias(f"mh{p}")
            for p in range(N_PERMS)
        ],
    )
    band_arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[
                            F.col(f"mh{b * rows_per_band + r}").cast("string")
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("sig"),
            )
            for b in range(N_BANDS)
        ]
    )
    # shingle tokens are [a-z0-9 ]-only, so '|' is a safe set separator
    return sig.select(
        "doc_id",
        F.array_join("shingles", "|").alias("sh"),
        F.explode(band_arr).alias("bs"),
    ).select(
        "doc_id", "sh", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )


def build_novelty_seed_index(docs: DataFrame) -> DataFrame:
    """(band, sig, doc_id, sh): the accumulated band index of an
    ADMITTED corpus — the batch twin's state made portable, written
    once when a deployment is (re)bootstrapped from a curated corpus.
    Persist it with `spark_graft.artifacts.save_novelty_seed_index`
    (r13: the seed now carries the full artifact contract — meta.json,
    payload sha256, training-corpus fingerprint with ArtifactMismatch
    staleness refusal, atomic swap) and feed the artifact path to
    `minhash_novelty_stream(seed_index_path=...)` so a restart without
    a checkpoint does NOT re-admit known documents (VERDICT r11 item
    8). Build it from the docs the gate ACTUALLY ADMITTED (admitted
    sets are mutually non-near-dup by the gate's greedy contract, so
    seeds never pair with each other)."""
    return _banded_signatures(docs).select("band", "sig", "doc_id", "sh")


_SEED_CACHE: dict = {}
_SEED_CACHE_MAX = 4  # concurrent live seed indexes per worker process


def _cached_seed_index(path: str, load_fn, to_index) -> dict:
    """Per-executor lazy load of a persisted seed-index ARTIFACT: one
    read per (path, version) per worker process, cached in module
    state — the same ship-the-dimension-once economics as a broadcast
    join side. The read goes through the artifacts loader (`load_fn`),
    so every executor re-verifies kind/format/payload-sha before
    serving; `to_index` turns the pyarrow payload into the probe dict.
    Shared by every seeded stream (novelty + paragraph gates); the cap
    covers their COMBINED residency. Training-corpus fingerprint
    staleness is validated ONCE, driver-side, at stream construction —
    and only when the caller passes `seed_sf_dir=`; omitting it is
    the explicit cross-corpus-serve contract, same as every other
    artifact loader (code-review r13: the previous docstring claimed an
    unconditional construction-time fingerprint check that no parameter
    could actually trigger). Beyond broadcast-able sizes, preload the
    state store itself (state-store writer / transformWithState initial
    state) instead."""
    from spark_graft.artifacts import artifact_fingerprint

    # key by (path, payload sha256): re-seeding by atomically re-saving
    # the same path must not serve a stale cached index in long-lived
    # executors. The sha probe (unlike an mtime stat) retries through
    # the atomic-swap window where `path` is briefly absent, so a
    # probe racing the driver's re-seed falls back to the last
    # complete artifact instead of crashing the micro-batch task
    # (code-review r13).
    key = (path, artifact_fingerprint(path))
    if key in _SEED_CACHE:
        # LRU touch (ADVICE r12): eviction below drops the first-listed
        # entry, so a >cap working set must re-order on every hit or
        # each probe call can re-read a broadcast-sized index per
        # micro-batch (FIFO thrash)
        _SEED_CACHE[key] = _SEED_CACHE.pop(key)
    else:
        tbl, meta = load_fn(path, return_meta=True)
        # re-derive the cache key from the meta of the payload ACTUALLY
        # READ: a re-save landing between the fingerprint probe above
        # and this load would otherwise cache the NEW payload under the
        # OLD sha, and one micro-batch could serve an index whose
        # version key misrepresents its contents (ADVICE r13)
        key = (path, meta.get("payload_sha256") or "")
        idx = to_index(tbl)
        # evict SUPERSEDED versions of this path (re-seeding must not
        # serve stale data) and cap total residency — concurrent
        # streams with different seed paths must not thrash each other
        # out of the cache, but a deployment re-seeding to a FRESH path
        # per restart must not accumulate one broadcast-sized index per
        # restart in a long-lived worker either (code-review r12):
        # beyond the cap, drop the LEAST-RECENTLY-USED entries (hits
        # re-insert at the tail, so iteration order is LRU-first)
        for k in [k for k in _SEED_CACHE if k[0] == path]:
            del _SEED_CACHE[k]
        while len(_SEED_CACHE) >= _SEED_CACHE_MAX:
            del _SEED_CACHE[next(iter(_SEED_CACHE))]
        _SEED_CACHE[key] = idx
    return _SEED_CACHE[key]


def _seed_index(path: str) -> dict:
    """Novelty-gate seed: {(band, sig): ([doc_id...], [sh...])} from a
    `save_novelty_seed_index` artifact — see `_cached_seed_index` for
    the load/version/eviction discipline."""
    from spark_graft.artifacts import load_novelty_seed_index

    def to_index(tbl) -> dict:
        t = tbl.to_pydict()
        idx: dict = {}
        rows = sorted(
            zip(t["band"], t["sig"], t["doc_id"], t["sh"]), key=lambda r: r[2]
        )
        for band, sig, did, sh in rows:
            ids, shs = idx.setdefault((band, sig), ([], []))
            ids.append(int(did))
            shs.append(sh)
        return idx

    return _cached_seed_index(path, load_novelty_seed_index, to_index)


def _para_seed_index(path: str) -> dict:
    """Paragraph-gate seed: {fp: (keep_doc_id, keep_pos)} from a
    `save_paragraph_seed_index` artifact — see `_cached_seed_index`
    for the load/version/eviction discipline."""
    from spark_graft.artifacts import load_paragraph_seed_index

    def to_index(tbl) -> dict:
        t = tbl.to_pydict()
        return {
            fp: (int(d), int(p))
            for fp, d, p in zip(t["fp"], t["keep_doc_id"], t["keep_pos"])
        }

    return _cached_seed_index(path, load_paragraph_seed_index, to_index)


def minhash_novelty_stream(
    docs: DataFrame,
    seed_index_path: str | None = None,
    seed_sf_dir: str | None = None,
) -> DataFrame:
    """Streaming near-dup novelty gate — the structured-streaming twin
    of `dedup_incremental_minhash` (operators.pipeline): documents
    arrive as an unbounded stream, each is MinHash-banded, and every
    band row probes the ACCUMULATED band index held in streaming state;
    band collisions are verified with exact Jaccard (integer form,
    5*inter >= 4*union) and every verified collision is emitted as a
    (new_id, other_id) pair — `other_id` always arrived before
    `new_id`, so the accepted set is exactly {arrivals} minus {emitted
    new_ids}, the batch gate's keep-first contract when arrival order
    is doc_id order.

    PAIR MULTIPLICITY CONTRACT: a pair colliding in several bands is
    emitted once PER COLLIDING BAND (at most N_BANDS times) — the
    standard LSH-banding at-least-once behavior, because each (band,
    sig) bucket is an independent state group and cross-group dedup
    would need a second stateful operator (a chained streaming
    dropDuplicates after applyInPandasWithState fails in Spark 4.1 with
    a columnar-row cast error — measured, not assumed; in production
    the downstream dedup lives in the foreachBatch sink, where the
    micro-batch is a plain DataFrame). The batch twin dedups candidate
    pairs before verifying; consumers of THIS stream must treat the
    pair feed as a set, as the equivalence test does.

    Spark-first mechanics: signatures are computed as NARROW HOF
    expressions (one md5 per shingle, double-hashed minima via
    array_min/transform — no explode+groupBy, which would be a second
    stateful operator upstream of the probe), so the ONLY stateful
    operator is one `applyInPandasWithState` keyed on (band, sig): the
    state per bucket is the (doc_id, shingle-set) list of its members —
    the persisted (band, sig, doc_id) index of the batch twin made
    explicit streaming state, sharded by the same key the probe joins
    on. Within a micro-batch, rows are processed in doc_id order, so
    in-batch keep-first matches the batch gate exactly.

    State lifecycle: NoTimeout — a near-dup ingest index must remember
    everything it has admitted (identity does not expire with event
    time), so eviction is a retention-policy decision, not a watermark
    one; upstream EXACT replay dedup within a watermark is
    `dedup_stream`'s job. At 100 TB/day the state store is RocksDB and
    each bucket's member list stays small because band signatures
    partition the corpus ~uniformly (the same property that makes the
    batch equi-join scale). MEASURED (sf1 replay, 50k docs ->
    179,883 (band, sig) buckets; BENCH_SF1 `stream_state_sizing_r17`):
    155.5 MB of state = ~864 bytes per bucket = ~825 MB per MILLION
    buckets — heavier per key than the paragraph gate's ~219 B because
    each bucket's value carries member doc_ids PLUS their full
    shingle-set strings for the exact-Jaccard verify. Corpus-scale
    deployments (N_BANDS x admitted docs buckets -> tens of GB and up)
    must run the RocksDB state-store provider
    (spark.sql.streaming.stateStore.providerClass =
    ...RocksDBStateStoreProvider, or SPARK_GRAFT_STATE_STORE=rocksdb
    via session.get_spark); the default HDFS-backed provider holds the
    whole loaded map on-heap. PILOTED r18 (BENCH_SF1
    `stream_state_sizing_rocksdb_r18`, same sf1 replay, identical
    179,883 buckets): ~9 B on-heap + ~367 B on-disk SST per bucket vs
    864 B all-on-heap — the working set spills instead of OOMing, ~7%
    wall overhead.

    STATE BOOTSTRAP (round 12, VERDICT r11 item 8): `seed_index_path`
    points at a persisted `build_novelty_seed_index` ARTIFACT
    (spark_graft.artifacts.save_novelty_seed_index; r13) — the
    accumulated band index of everything a previous deployment
    admitted, header-validated at stream construction and
    fingerprint-validated against `seed_sf_dir` when given. A bucket whose state does not exist yet initializes its
    member list from the seed before probing, so a restart WITHOUT a
    checkpoint still rejects documents the old deployment knew (the
    first emission can name an other_id that never flowed through this
    query's stream). The seed loads once per executor process (see
    `_seed_index`); it is never consulted again for a bucket once that
    bucket's state exists. Beyond broadcast-able seed sizes the right
    primitive is Spark 4's `transformWithStateInPandas(initialState=)`
    — the seed ships as a DISTRIBUTED grouped DataFrame straight into
    the state stores; probed in this environment and currently
    unusable (its state server needs google.protobuf, broken in this
    container: STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE; re-probed
    round 14 — google.protobuf still absent on pyspark 4.1.2; re-probed
    round 15 with a live rate-source query — the class imports but the
    driver worker still crashes at runtime, STREAM_FAILED/XXKST
    "TransformWithStateInPySpark driver worker exited unexpectedly";
    re-probed round 16 with a ValueState counter over a parquet
    availableNow stream — same XXKST runtime crash, container
    unchanged; re-probed round 17 with the identical ValueState
    counter probe — still STREAM_FAILED/XXKST "TransformWithStateInPySpark
    driver worker exited unexpectedly (crashed)" on pyspark 4.1.2;
    re-probed round 18, same ValueState probe — google.protobuf still
    absent (`import google` is ModuleNotFoundError) and the worker
    still crashes XXKST, container unchanged),
    so the per-executor cache is the implemented path and the migration
    is a mechanical swap of the probe function when the dependency is
    available."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if seed_index_path is not None:
        # fail at stream CONSTRUCTION, not inside an executor mid-batch:
        # the full artifact checks (kind, format_version, payload
        # sha256) run driver-side here, PLUS — when the caller passes
        # seed_sf_dir — the training-corpus fingerprint check, so
        # pointing a deployment at a seed trained on a different corpus
        # raises ArtifactMismatch before the query starts (omit
        # seed_sf_dir for the explicit cross-corpus-serve case, the
        # same contract as every artifacts loader). Executors re-run
        # the header checks on their own lazy load (_seed_index).
        from spark_graft.artifacts import load_novelty_seed_index

        load_novelty_seed_index(seed_index_path, sf_dir=seed_sf_dir)

    banded = _banded_signatures(docs)

    def probe(key, pdfs, state: GroupState):
        if state.exists:
            ids, shs = state.get
        elif seed_index_path is not None:
            ids, shs = _seed_index(seed_index_path).get(
                (key[0], key[1]), ((), ())
            )
        else:
            ids, shs = (), ()
        ids, shs = list(ids), list(shs)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        out_new, out_other = [], []
        for _, row in pdf.sort_values("doc_id").iterrows():
            did = int(row["doc_id"])
            if did in ids:  # replayed row — the index already has it
                continue
            sh = set(row["sh"].split("|"))
            for oid, osh in zip(ids, shs):
                other = set(osh.split("|"))
                inter = len(sh & other)
                union = len(sh) + len(other) - inter
                if 5 * inter >= 4 * union:
                    out_new.append(did)
                    out_other.append(oid)
            ids.append(did)
            shs.append(row["sh"])
        state.update((ids, shs))
        if out_new:
            yield pd.DataFrame({"new_id": out_new, "other_id": out_other})

    return banded.groupBy("band", "sig").applyInPandasWithState(
        probe,
        "new_id bigint, other_id bigint",
        "ids array<bigint>, shs array<string>",
        "append",
        GroupStateTimeout.NoTimeout,
    )


def cep_pattern_stream(
    events: DataFrame, reorder_delay: str | None = None
) -> DataFrame:
    """Streaming CEP twin of the batch `events_pattern` query: per user,
    cumulative counts of non-overlapping contiguous view -> click+ ->
    purchase runs, emitted after every micro-batch.

    Incremental matching is sound because the pattern's completed
    matches are prefix-stable: a match that spans a batch boundary must,
    at the boundary, be a partial match (`v` then `c`s), and for this
    alphabet the partial-match suffix is UNIQUE (a `v` followed only by
    `c`s — any later `v` would contradict "only cs"). So per-user state
    is just that suffix plus the running counters: O(open click-run)
    per user, NOT the full timeline, and completed spans are discarded
    the moment they close. Eviction for idle users would be a state
    timeout; it is left off here so the equivalence test is exact.

    Like any CEP engine, contiguity semantics require event-time order.
    With the default `reorder_delay=None` the source must deliver
    time-ordered micro-batches (each batch may interleave users; rows
    are sorted per user in the operator). `reorder_delay` (e.g.
    "30 minutes") lifts that precondition (VERDICT r10 item 4) with the
    standard event-time RE-ORDER BUFFER every CEP engine fronts an
    unordered stream with (Flink CEP buffers inside its NFA operator
    the same way): the source is watermarked on ts, each user's
    arriving events are held in state, and only events whose event time
    the watermark has PASSED are released — in (ts, event_id) order —
    to the symbol machine. Delivery disorder bounded by the delay is
    then invisible to the matcher; rows later than the delay are
    dropped by Spark's watermark filter before the operator (the
    documented bounded-late-data contract, NOT a silent corruption of
    "contiguous"). Per-user state is the in-flight window only (events
    within the delay of the watermark frontier) plus the O(click-run)
    matcher suffix; the released prefix is evicted immediately. An
    event-time timeout re-invokes idle groups when the watermark passes
    their oldest buffered event (Spark's no-data micro-batches drive
    this even after the source drains), so buffered events flush
    without requiring new data for that user. NULL event times are
    dropped in this mode (event-time order is undefined for them; the
    batch twin's global sort pins them first, a placement no stream
    can reproduce), and event times are compared to the watermark as
    UTC epoch micros computed JVM-side (unix_micros), so the buffer is
    correct under ANY session timezone."""
    import re

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from spark_graft.operators.events import CEP_PATTERN

    pat = re.compile(CEP_PATTERN)
    partial = re.compile("vc*$")

    def _advance(tail, nm, nem, fml, mcr, new: str):
        """Feed `new` symbols into the matcher state; returns the
        updated (tail, nm, nem, fml, mcr)."""
        s = tail + new
        last_end = 0
        for m in pat.finditer(s):
            L = m.end() - m.start()
            nm += 1
            nem += L
            if fml == 0:
                fml = L
            mcr = max(mcr, L - 2)
            last_end = m.end()
        p = partial.search(s, last_end)
        return (p.group(0) if p else ""), nm, nem, fml, mcr

    def _emit(key, nm, nem, fml, mcr, seen):
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_matches": [nm],
                "n_events_matched": [nem],
                "first_match_len": [fml],
                "max_click_run": [mcr],
                "n_events_seen": [seen],
            }
        )

    def update(key, pdfs, state: GroupState):
        tail, nm, nem, fml, mcr, seen = (
            state.get if state.exists else ("", 0, 0, 0, 0, 0)
        )
        # ONE global sort after concat — a group's rows can arrive as
        # several Arrow chunks in nondeterministic order, so sorting
        # each chunk independently would interleave event-time ranges
        # (same fix as minhash_novelty_stream's in-batch ordering)
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"])
        new = "".join(batch["sym"])
        seen += len(new)
        tail, nm, nem, fml, mcr = _advance(tail, nm, nem, fml, mcr, new)
        state.update((tail, nm, nem, fml, mcr, seen))
        yield _emit(key, nm, nem, fml, mcr, seen)

    def update_reorder(key, pdfs, state: GroupState):
        if state.exists:
            tail, nm, nem, fml, mcr, seen, bts, beid, bsym = state.get
            bts, beid = list(bts), list(beid)
        else:
            tail, nm, nem, fml, mcr, seen = "", 0, 0, 0, 0, 0
            bts, beid, bsym = [], [], ""
        chunks = [c for c in pdfs if len(c)]
        if chunks:  # timeout invocations arrive with no data
            batch = pd.concat(chunks, ignore_index=True)
            # ts_us was computed JVM-side by unix_micros (UTC epoch),
            # matching getCurrentWatermarkMs' epoch — converting the
            # timestamp column itself through pandas would render it in
            # the SESSION timezone and shift every comparison by the
            # zone offset on non-UTC sessions
            bts.extend(int(v) for v in batch["ts_us"])
            beid.extend(int(v) for v in batch["event_id"])
            bsym += "".join(batch["sym"])
        wm_us = state.getCurrentWatermarkMs() * 1000
        rel, keep = _reorder_split(bts, beid, wm_us)
        if rel:
            new = "".join(bsym[i] for i in rel)
            seen += len(new)
            tail, nm, nem, fml, mcr = _advance(tail, nm, nem, fml, mcr, new)
        bts, beid = [bts[i] for i in keep], [beid[i] for i in keep]
        bsym = "".join(bsym[i] for i in keep)
        state.update((tail, nm, nem, fml, mcr, seen, bts, beid, bsym))
        _reorder_set_timeout(state, bts)
        yield _emit(key, nm, nem, fml, mcr, seen)

    sym = (
        F.when(F.col("event_type") == "view", "v")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "purchase", "p")
        .when(F.col("event_type") == "signup", "s")
        .otherwise("e")
    )
    if reorder_delay is not None:
        # NULL event times are dropped: event-time ordering is undefined
        # for them. (The batch twin, which sorts the COMPLETE timeline,
        # pins them first — a stream can never know when "first" has
        # closed, so no buffer can reproduce that placement; equivalence
        # vs batch holds on the null-filtered corpus, tested.) ts_us is
        # the UTC epoch computed JVM-side — see update_reorder.
        return (
            events.filter(F.col("ts").isNotNull())
            .withWatermark("ts", reorder_delay)
            .select(
                "user_id",
                "ts",
                F.unix_micros("ts").alias("ts_us"),
                "event_id",
                sym.alias("sym"),
            )
            .groupBy("user_id")
            .applyInPandasWithState(
                update_reorder,
                "user_id bigint, n_matches bigint, n_events_matched bigint, "
                "first_match_len bigint, max_click_run bigint, n_events_seen bigint",
                "tail string, nm bigint, nem bigint, fml bigint, mcr bigint, "
                "seen bigint, bts array<bigint>, beid array<bigint>, bsym string",
                "update",
                GroupStateTimeout.EventTimeTimeout,
            )
        )
    return (
        events.select("user_id", "ts", "event_id", sym.alias("sym"))
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            "user_id bigint, n_matches bigint, n_events_matched bigint, "
            "first_match_len bigint, max_click_run bigint, n_events_seen bigint",
            "tail string, nm bigint, nem bigint, fml bigint, mcr bigint, seen bigint",
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def eval_gram_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STATIC side of `decontaminate_stream`: the distinct 60-bit
    4-token-gram keys of the held-out eval decile, derived with the
    batch `decontaminate` query's exact expressions (same constants,
    same md5->bigint mapping). In production this is the persisted
    benchmark-suite gram table, built once per suite release."""
    from spark_graft.functions import shingles_from_tokens, tokens
    from spark_graft.operators.pipeline import DECON_N, EVAL_MOD

    docs = table(spark, sf_dir, "documents")
    return (
        docs.filter((F.col("doc_id") % EVAL_MOD) == 0)
        .select(
            F.explode(
                shingles_from_tokens(tokens("text"), DECON_N)
            ).alias("g0")
        )
        .select(
            F.conv(F.substring(F.md5("g0"), 1, 15), 16, 10)
            .cast("bigint")
            .alias("g")
        )
        .distinct()
        .withColumn("hit", F.lit(1))
    )


def eval_cell_index(
    spark: SparkSession, sf_dir: str, centroids_path: str
) -> DataFrame:
    """The STATIC side of `semantic_decon_stream`: the eval decile's
    vectors assigned to cells by the PERSISTED quantizer (the same
    centroids the streaming gate assigns arrivals with, loaded from
    `spark_graft.artifacts`). In production this is built once per
    benchmark-suite release, right after the quantizer is trained."""
    from spark_graft import artifacts
    from spark_graft.operators.clustering import assignment_udf
    from spark_graft.operators.pipeline import EVAL_MOD

    cents = artifacts.load_kmeans_centroids(centroids_path, sf_dir=sf_dir)
    emb = table(spark, sf_dir, "embeddings")
    return (
        emb.filter((F.col("vec_id") % EVAL_MOD) == 0)
        # the similarity-family NONZERO contract: a zero-norm vector has
        # no defined cosine — excluded here so the streaming gate's
        # division can never see a zero divisor (ANSI DIVIDE_BY_ZERO)
        .filter(F.exists("embedding", lambda x: x != F.lit(0.0)))
        .select(
            assignment_udf(cents, spark)("embedding")["cluster"].alias("cell"),
            F.col("vec_id").alias("eval_id"),
            F.col("embedding").alias("eval_emb"),
        )
    )


def semantic_decon_stream(
    vecs: DataFrame,
    eval_cells: DataFrame,
    centroids_path: str,
    *,
    ingest_col: str = "ingest_ts",
    watermark: str = "10 minutes",
    window: str = "10 minutes",
) -> DataFrame:
    """Streaming EMBEDDING-SPACE decontamination — the stream-static
    twin of batch `decontaminate_semantic` (operators/pipeline.py), and
    the semantic complement of `decontaminate_stream`'s exact-gram gate
    below: every arriving train vector is assigned to its trained
    quantizer cell (centroids loaded once from `spark_graft.artifacts`
    and baked into the Arrow assignment kernel — the train-once/
    serve-many contract), stream-static joined against the broadcast
    `eval_cell_index` (bounded: one row per eval item, a benchmark
    suite), and flagged when any same-cell eval cosine reaches
    SEM_DECON_THRESHOLD — paraphrase-level leaks caught ON the ingest
    stream, before a contaminated batch ever lands in training storage.

    Cosines are pure JVM expressions (zip_with product folded
    left-to-right by F.aggregate over a double accumulator — the same
    fold order as the batch twin's numpy cumsum, so stream == batch
    BIT-FOR-BIT), clamped to [-1, 1]; the hit gate tests ~isnan on the
    RAW quotient BEFORE the clamp, because Spark SQL orders NaN ABOVE
    every double — NaN >= t is true AND least(greatest(NaN,-1),1)
    launders NaN into a perfect 1.0 — while numpy (batch) and DuckDB
    (oracle) both drop the zero-norm pair (planted-zero-vector
    tested).

    State is BOUNDED exactly like decontaminate_stream (same
    (ingest-window, vec_id) watermark eviction, same caveat for
    caller-supplied ingest columns — late rows drop UNEVALUATED, so
    size the watermark above the source's ingest disorder; the
    'semdecon_ingest' observation reports each batch's spread). At
    100 TB the per-arrival work is one k x dim assignment matmul and
    ~|cell members of the eval suite| dot products — map-side only,
    no stream-side shuffle before the windowed per-vector collapse."""
    from spark_graft import artifacts
    from spark_graft.operators.clustering import assignment_udf
    from spark_graft.operators.pipeline import EVAL_MOD, SEM_DECON_THRESHOLD

    if ingest_col in vecs.columns:
        import warnings

        warnings.warn(
            f"semantic_decon_stream: caller-supplied {ingest_col!r} — rows "
            f"later than the {watermark!r} watermark are dropped "
            f"UNEVALUATED (a leaked vector would pass the gate silently). "
            f"Size the watermark above the source's maximum ingest "
            f"disorder; per-batch spread is reported via the "
            f"'semdecon_ingest' observation.",
            stacklevel=2,
        )
        stamped = vecs.observe(
            "semdecon_ingest",
            F.count(F.lit(1)).alias("rows"),
            F.min(ingest_col).alias("min_ingest"),
            F.max(ingest_col).alias("max_ingest"),
        )
    else:
        stamped = vecs.withColumn(ingest_col, F.current_timestamp())

    cents = artifacts.load_kmeans_centroids(centroids_path)
    assigned = (
        stamped.filter((F.col("vec_id") % EVAL_MOD) != 0)
        # NONZERO contract, stream side: under ANSI (the Spark 4
        # default) a zero-norm arrival would DIVIDE_BY_ZERO-crash the
        # whole QUERY at the cosine — not just mis-flag (planted-zero
        # tested); batch drops the same pairs via its numpy NaN gate
        .filter(F.exists("embedding", lambda x: x != F.lit(0.0)))
        .select(
            "vec_id",
            ingest_col,
            "embedding",
            assignment_udf(cents)("embedding")["cluster"].alias("cell"),
        )
    )
    joined = assigned.join(F.broadcast(eval_cells), "cell")
    # per-element double widening + left-to-right fold == the batch
    # twin's float64 cumsum, so the cosine bits match exactly
    dot = F.aggregate(
        F.zip_with(
            "embedding", "eval_emb",
            lambda a, b: a.cast("double") * b.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sqnorm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(c, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    raw = dot / (sqnorm(F.col("embedding")) * sqnorm(F.col("eval_emb")))
    # the isnan gate MUST test the RAW quotient: Spark's least/greatest
    # order NaN above every double, so least(greatest(NaN,-1),1) is a
    # laundered 1.0 — a zero-norm vector would flag as a PERFECT match
    # if clamped first — and NaN >= t is itself true (probed r16; the
    # batch twin's numpy clip keeps NaN and NaN >= t is false there).
    # Gating raw vs clamped is threshold-equivalent for t in (-1, 1].
    scored = (
        joined.select(
            "vec_id",
            "cell",
            ingest_col,
            "eval_id",
            raw.alias("_raw"),
        )
        .filter(~F.isnan("_raw") & (F.col("_raw") >= SEM_DECON_THRESHOLD))
        .withColumn(
            "_cos",
            F.least(F.greatest(F.col("_raw"), F.lit(-1.0)), F.lit(1.0)),
        )
    )
    agg = (
        scored.withColumn("_cos_r", F.round("_cos", 4))
        .withWatermark(ingest_col, watermark)
        .groupBy(F.window(ingest_col, window), "vec_id", "cell")
        .agg(
            F.count(F.lit(1)).alias("n_eval_hits"),
            # lexicographic struct max: highest rounded cosine, then
            # the LOWEST eval id among ties (negated so max picks it)
            F.max(F.struct(F.col("_cos_r"), (-F.col("eval_id")).alias("ne"))).alias("b"),
        )
    )
    return agg.select(
        "vec_id",
        "cell",
        "n_eval_hits",
        F.col("b._cos_r").alias("max_cos"),
        (-F.col("b.ne")).alias("near_eval_id"),
    )


def decontaminate_stream(
    docs: DataFrame,
    eval_grams: DataFrame,
    *,
    ingest_col: str = "ingest_ts",
    watermark: str = "10 minutes",
    window: str = "10 minutes",
) -> DataFrame:
    """Streaming benchmark decontamination — the STREAM-STATIC JOIN
    capability (the canonical enrich-a-stream-with-a-dimension-table
    pattern, previously uncovered by the streaming module): arriving
    training documents are exploded to the same 60-bit gram keys as
    batch `decontaminate` (equivalence-pinned by test), LEFT
    stream-static joined against the static eval-set gram table —
    wrapped in F.broadcast, because a benchmark suite's gram table is
    bounded by construction, so every micro-batch joins MAP-SIDE with
    no stream-side shuffle and the static side ships once per executor
    — then re-aggregated per doc in update mode.

    STATE IS BOUNDED (VERDICT r11 item 4): the per-doc aggregate is
    keyed by (ingest-time window, doc_id) under a watermark on the
    ingest timestamp, so Spark EVICTS a doc's counter row once the
    watermark passes its arrival window — without the window key an
    update-mode groupBy retains one state row per doc_id FOREVER (one
    row per document ever ingested at 100 TB). The eviction is
    semantics-free: every doc's grams arrive inside its single source
    row, so its aggregate finalizes within the micro-batch that carries
    it, and doc_ids never recur in an append-only corpus feed — the
    window never splits or merges a doc's counts. Sources that carry no
    ingest timestamp get one stamped at ingest (`current_timestamp()`),
    making the eviction a processing-time TTL. CAVEAT for sources that
    DO carry `ingest_col`: a row later than the watermark is dropped
    UNEVALUATED (a contaminated doc would slip through), so size
    `watermark` above the source's maximum ingest disorder — with the
    default stamped-at-ingest column the timestamp is monotone per
    batch and nothing can arrive late. Because that failure mode is
    SILENT for a safety gate (ADVICE r12), a caller-supplied
    `ingest_col` (a) emits a construction-time warning naming the
    contract and (b) attaches an `observe("decon_ingest", count,
    min(ts), max(ts))` to the PRE-watermark stream, so every
    micro-batch's progress event reports the ingest-time spread
    actually seen — operators size (and re-size) the watermark from
    evidence instead of hoping, and a batch whose min lags the
    watermark is visible in the listener the moment it happens. The
    enforced drop itself is counted by the state operator's
    numRowsDroppedByWatermark in the same progress event (note Spark's
    late-row filter lags the watermark update by one micro-batch, so
    the first straggler batch after a watermark advance is still
    evaluated; both behaviors are pinned in
    tests/test_streaming.py::test_decontaminate_stream_late_row_drop_is_visible).

    At 100 TB: the stream side moves only 8-byte gram keys within each
    batch's narrow pipeline (raw text never shuffles), flagged docs
    emit incrementally, and state holds only the docs of the last
    `watermark + window` of ingest — the filter-before-training gate
    runs ON the ingest stream instead of as a nightly batch."""
    from spark_graft.functions import shingles_from_tokens, tokens
    from spark_graft.operators.pipeline import DECON_N, EVAL_MOD

    if ingest_col in docs.columns:
        import warnings

        warnings.warn(
            f"decontaminate_stream: caller-supplied {ingest_col!r} — rows "
            f"later than the {watermark!r} watermark are dropped "
            f"UNEVALUATED (a contaminated doc would pass the gate "
            f"silently). Size the watermark above the source's maximum "
            f"ingest disorder; per-batch ingest-time spread is reported "
            f"via the 'decon_ingest' observation.",
            stacklevel=2,
        )
        stamped = docs.observe(
            "decon_ingest",
            F.count(F.lit(1)).alias("rows"),
            F.min(ingest_col).alias("min_ingest"),
            F.max(ingest_col).alias("max_ingest"),
        )
    else:
        stamped = docs.withColumn(ingest_col, F.current_timestamp())
    grams = (
        stamped.filter((F.col("doc_id") % EVAL_MOD) != 0)
        .select(
            "doc_id",
            ingest_col,
            F.explode(
                shingles_from_tokens(tokens("text"), DECON_N)
            ).alias("g0"),
        )
        .select(
            "doc_id",
            ingest_col,
            F.conv(F.substring(F.md5("g0"), 1, 15), 16, 10)
            .cast("bigint")
            .alias("g"),
        )
    )
    agg = (
        grams.withWatermark(ingest_col, watermark)
        .join(F.broadcast(eval_grams), "g", "left")
        .groupBy(F.window(ingest_col, window), "doc_id")
        .agg(F.count("g").alias("n_grams"), F.count("hit").alias("n_hit"))
    )
    return agg.filter(F.col("n_hit") > 0).select(
        "doc_id",
        "n_grams",
        "n_hit",
        F.round(F.col("n_hit") / F.col("n_grams"), 4).alias("contam_frac"),
    )


def quality_score_stream(docs: DataFrame, weights_path: str) -> DataFrame:
    """Streaming quality scoring from a persisted
    `spark_graft.artifacts` quality-classifier model — SCORE-ON-INGEST,
    the streaming half of quality_classifier's train-once/serve-many
    contract: the 4 fixed-point weights are loaded once on the driver
    and baked into the plan as literals, and each arriving document
    flows through the same integer feature + clamp expressions as the
    batch artifact-served scorer. STATELESS — no state store, no
    watermark, no shuffle (append mode), so throughput is pure map
    parallelism at any scale: the quality gate runs ON the ingest
    stream, and downstream sinks route by `pred` instead of waiting
    for a nightly batch scoring job. Equivalence vs the batch serve is
    exact and tested (the scoring arithmetic is bit-identical integer
    work in both plans)."""
    from spark_graft import artifacts
    from spark_graft.operators.pipeline import qc_features_from, qc_score

    return qc_score(
        qc_features_from(docs), artifacts.load_quality_weights(weights_path)
    )


def gopher_rules_stream(docs: DataFrame) -> DataFrame:
    """Streaming Gopher quality gate — SCORE-ON-INGEST, the streaming
    twin of `pipeline_gopher_rules` (operators/text.py): each arriving
    document gets the full named rule battery (token-count bounds,
    mean-word-length bounds, >= 80% alphabetic tokens, >= 2 English
    stopwords), the failed-rule count, and the keep decision, from the
    SAME `gopher_rule_frame` expression battery the batch query plans —
    so sinks can route by `keep` (accepted corpus vs quarantine with
    per-rule removal reasons) the moment a document lands, instead of
    waiting for a nightly batch scoring pass.

    STATELESS like quality_score_stream: the rules are pure narrow
    codegen integer comparisons — no state store, no watermark, no
    shuffle (append mode, exactly-once per document under checkpointed
    sources/sinks) — so throughput is pure map parallelism at any
    scale, and equivalence vs the batch battery is BIT-exact by
    construction (one shared expression builder, tested over a
    micro-batch replay)."""
    from spark_graft.operators.text import gopher_rule_frame

    return gopher_rule_frame(docs)


def dsir_score_stream(docs: DataFrame, ratios_path: str) -> DataFrame:
    """Streaming DSIR selection — SCORE-ON-INGEST from a persisted
    fitted model, the streaming half of `dsir_select`'s
    train-once/serve-many contract: the {dim: w} fixed-point ratio
    table (`operators.pipeline.dsir_ratio_table(dense=True)`, saved via
    `artifacts.save_dsir_ratios`) is loaded once on the driver and
    baked into the plan as a DSIR_DIM-long array literal; each arriving
    document folds its hashed unigram+bigram stream through it —
    score = (sum over grams of w[dim(gram)]) div n_grams, the EXACT
    batch arithmetic because sum_dim c_dim * w_dim == the per-gram fold
    and the gram/bucket recipes are the shared `dsir_grams`/`dsir_dim`
    expressions. The keep gate and Horvitz-Thompson weight are the same
    md5-threshold contract; docs from the configured target sources
    score too (serving is source-blind — a redeployed fit decides what
    "target-like" means, the arriving corpus does not).

    Emits (doc_id, n_feat, score, keep, weight): keep routes the sink
    (selected corpus vs rest), weight is NULL on unkept rows (the
    division is guarded — a 0 threshold can never satisfy the gate, and
    under Spark 4 ANSI an unguarded x/0 would kill the query).
    Zero-gram docs emit n_feat = 0, score = 0, keep = false (the batch
    query never materializes a feature row for them; equivalence on
    kept rows is exact and tested).

    STATELESS like gopher_rules_stream: pure narrow expressions — no
    state store, no watermark, no shuffle (append mode, exactly-once
    per document under checkpointed sources/sinks); throughput is pure
    map parallelism at any scale, and the fitted model ships once per
    plan, not per row."""
    from spark_graft.functions import md5_bucket_raw, tokens
    from spark_graft.operators.pipeline import (
        DSIR_DIM,
        DSIR_PIVOT,
        DSIR_SCALE,
        dsir_dim,
        dsir_grams,
    )
    from spark_graft import artifacts

    ratios = artifacts.load_dsir_ratios(ratios_path)
    missing = set(range(DSIR_DIM)) - set(ratios)
    if missing:
        raise ValueError(
            f"dsir ratios artifact is not dense: missing dims {sorted(missing)[:5]}..."
            " — build with dsir_ratio_table(feat, dense=True)"
        )
    w_arr = F.array(*[F.lit(ratios[i]) for i in range(DSIR_DIM)])
    # two staging projections (the shingles_from_tokens performance
    # contract): the bigram lambdas must reference a token ATTRIBUTE
    # (an inlined tokens(text) tree would re-tokenize per element), and
    # the fold must reference a grams attribute
    staged = docs.select("doc_id", tokens("text").alias("ts")).select(
        "doc_id",
        # coalesce the ARRAY, not size()'s result (r18, ADVICE): under
        # spark.sql.legacy.sizeOfNull=true size(NULL) is -1, not NULL,
        # so a NULL-text doc would emit n_feat=-1; the array-level
        # coalesce makes the zero-gram guard config-independent (same
        # pattern as text_fingerprint's toks staging)
        F.coalesce(
            dsir_grams(F.col("ts")), F.array().cast("array<string>")
        ).alias("grams"),
    )
    n_feat = F.size("grams").cast("bigint")
    fold = F.aggregate(
        F.transform(
            F.col("grams"),
            lambda g: F.element_at(w_arr, dsir_dim(g) + F.lit(1)),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    # the fold is staged as its own column so the score division sees
    # an attribute; per-doc bounded: fold <= n_feat * CAP*SCALE (1e8),
    # int64 headroom to ~9e10 grams per single document
    scored = staged.select(
        "doc_id",
        n_feat.alias("n_feat"),
        F.when(n_feat > 0, fold.cast("bigint"))
        .otherwise(F.lit(0))
        .alias("_fold"),
    ).select(
        "doc_id",
        "n_feat",
        F.when(
            F.col("n_feat") > 0,
            F.expr("_fold div n_feat"),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("score"),
    )
    thresh = F.expr(
        f"least(score, {DSIR_PIVOT * DSIR_SCALE}) * {2**32}"
        f" div {DSIR_PIVOT * DSIR_SCALE}"
    )
    out = scored.select(
        "doc_id",
        "n_feat",
        "score",
        thresh.alias("_thresh"),
        (md5_bucket_raw("dsir:", F.col("doc_id")) < thresh).alias("keep"),
    )
    return out.select(
        "doc_id",
        "n_feat",
        "score",
        "keep",
        F.when(
            F.col("keep"),
            F.round(F.lit(float(2**32)) / F.col("_thresh"), 6),
        ).alias("weight"),
    )


def build_paragraph_seed_index(
    docs: DataFrame, boundary: str = "window"
) -> DataFrame:
    """(fp, keep_doc_id, keep_pos): the batch paragraph-dedup KEEPER
    table of an admitted corpus — one row per distinct normalized
    paragraph md5 with its lexicographic first occurrence — i.e.
    `paragraph_dedup_stream`'s accumulated state made portable, written
    once when a deployment is (re)bootstrapped from a curated corpus.
    Persist with `spark_graft.artifacts.save_paragraph_seed_index`
    (full artifact contract: meta.json, payload sha256, training-corpus
    fingerprint with ArtifactMismatch refusal, atomic swap) and feed
    the path to `paragraph_dedup_stream(seed_index_path=...)` so a
    checkpoint-less restart does NOT re-admit paragraphs the old
    deployment knew (VERDICT r16 item 2 — the gap the novelty gate
    closed in r12). Paragraph content comes from the batch twin's
    paragraph_table, so seed fingerprints and stream fingerprints can
    never disagree; the table is localCheckpoint-staged for the same
    InferFiltersFromGenerate reason dedup_paragraph documents.

    `boundary` is dedup_paragraph's boundary mode (r18, ADVICE item):
    a seed built from a newline-mode batch dedup carries DIFFERENT
    fingerprints than window-mode state, so the mode must travel with
    the artifact — pass the same value to
    `save_paragraph_seed_index(boundary=...)` so the meta records it
    and `paragraph_dedup_stream` (window-only today) can REFUSE a
    mismatched seed instead of silently never matching."""
    from spark_graft.operators.dedup import paragraph_table

    base = paragraph_table(docs, boundary).localCheckpoint()
    return (
        base.select("doc_id", F.posexplode("paras").alias("pos", "para"))
        .select(
            "doc_id",
            (F.col("pos") + 1).alias("pos"),
            F.md5("para").alias("fp"),
        )
        .groupBy("fp")
        .agg(F.min(F.struct("doc_id", "pos")).alias("k"))
        .select(
            "fp",
            F.col("k.doc_id").alias("keep_doc_id"),
            F.col("k.pos").cast("int").alias("keep_pos"),
        )
    )


def paragraph_dedup_stream(
    docs: DataFrame,
    seed_index_path: str | None = None,
    seed_sf_dir: str | None = None,
) -> DataFrame:
    """Streaming paragraph-level dedup gate — the ingest twin of batch
    `dedup_paragraph` (operators/dedup.py): as documents arrive, every
    normalized {PARA_W}-token paragraph window is checked against the
    accumulated corpus; repeats emit a DROP row (doc_id, pos,
    keep_doc_id, keep_pos) naming the keeper — CCNet's main volume
    reducer running ON the ingest stream, so the sink can excise
    boilerplate paragraphs (and count removal pressure per source) the
    moment a page lands instead of in a nightly batch. Accepted
    paragraphs = arrivals minus emitted drops; per-doc reassembly is
    the sink's array gather over its drop positions (the batch twin's
    rebuild expression).

    Paragraph content comes from the SAME `paragraph_at` /
    `paragraph_index` recipe the batch query plans (row form here —
    explode the index array, derive each window after the Generate —
    because a stream cannot localCheckpoint its way around the
    InferFiltersFromGenerate inlining the batch side staging avoids;
    the row form keeps the inferred filter O(tokens) per doc). State:
    ONE (keep_doc_id, keep_pos) pair per distinct paragraph hash —
    the minhash_novelty_stream band-index shape, growing with the
    distinct-paragraph vocabulary (16 bytes + key per entry), the
    irreducible memory of any exact streaming dedup. MEASURED (sf1
    replay, 50k docs -> 212,542 distinct paragraphs; BENCH_SF1
    `stream_state_sizing_r17`): 46.6 MB of state = ~219 bytes per
    distinct paragraph all-in (UnsafeRow key + value + store overhead)
    = ~210 MB per MILLION distinct paragraphs. Vocabulary-scale
    corpora (billions of distinct paragraphs -> hundreds of GB) must
    run the RocksDB state-store provider
    (spark.sql.streaming.stateStore.providerClass =
    ...RocksDBStateStoreProvider, or SPARK_GRAFT_STATE_STORE=rocksdb
    via session.get_spark) so state lives off-heap/on-disk with the
    same semantics — the default HDFS-backed provider holds the whole
    map on-heap. PILOTED r18 (BENCH_SF1
    `stream_state_sizing_rocksdb_r18`, same sf1 replay, identical
    212,542 distinct paragraphs, equivalence outputs unchanged):
    ~2.5 B on-heap + ~50 B on-disk SST per key vs 219 B all-on-heap,
    ~6% wall overhead. Within a
    micro-batch, rows apply in (doc_id, pos) order, so a doc-ordered
    replay reproduces the batch twin's lexicographic keep-first
    EXACTLY (equivalence-tested). At-least-once re-delivery: a
    re-delivered keeper emits nothing; a re-delivered duplicate
    re-emits its identical drop row — the change log is idempotent by
    content, dedupe by (doc_id, pos) at the sink.

    STATE BOOTSTRAP (round 17, VERDICT r16 item 2): `seed_index_path`
    points at a persisted `build_paragraph_seed_index` ARTIFACT
    (spark_graft.artifacts.save_paragraph_seed_index) — the keeper
    table of everything a previous deployment admitted,
    header-validated at stream construction and fingerprint-validated
    against `seed_sf_dir` when given. A paragraph hash whose state
    does not exist yet initializes its keeper from the seed before
    deciding, so a restart WITHOUT a checkpoint still drops paragraphs
    the old deployment knew (the drop row can name a keep_doc_id that
    never flowed through this query's stream). The seed loads once per
    executor process (`_para_seed_index`, the novelty gate's cache
    discipline) and is never consulted again for a hash once its state
    exists; beyond broadcast-able seed sizes the right primitive is
    `transformWithStateInPandas(initialState=)` — still unusable in
    this container (XXKST, re-probed r16; see minhash_novelty_stream's
    probe history)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from spark_graft.operators.dedup import paragraph_at, paragraph_index
    from spark_graft.functions import tokens

    if seed_index_path is not None:
        # fail at stream CONSTRUCTION, not inside an executor mid-batch
        # (kind/format/payload-sha driver-side; plus the training-corpus
        # fingerprint when seed_sf_dir is given — the novelty gate's
        # contract verbatim)
        from spark_graft.artifacts import (
            ArtifactMismatch,
            load_paragraph_seed_index,
        )

        _, seed_meta = load_paragraph_seed_index(
            seed_index_path, sf_dir=seed_sf_dir, return_meta=True
        )
        # this stream's state fingerprints are WINDOW-mode paragraphs;
        # a newline-mode seed would never match (disjoint hash spaces)
        # — refuse it instead of silently admitting every duplicate
        # (r18, ADVICE item; pre-r18 seeds carry no boundary field and
        # are window-built by construction)
        seed_boundary = (seed_meta.get("params") or {}).get("boundary", "window")
        if seed_boundary != "window":
            raise ArtifactMismatch(
                f"{seed_index_path}: seed built with paragraph boundary mode "
                f"{seed_boundary!r}, but paragraph_dedup_stream matches "
                "window-mode fingerprints — rebuild the seed with "
                "build_paragraph_seed_index(boundary='window')"
            )

    rows = (
        docs.select("doc_id", tokens("text").alias("toks"))
        .select("doc_id", "toks", F.explode(paragraph_index(F.col("toks"))).alias("pos"))
        .select(
            "doc_id",
            "pos",
            F.md5(paragraph_at(F.col("toks"), F.col("pos"))).alias("fp"),
        )
    )

    _EMPTY = pd.DataFrame(
        {
            "doc_id": pd.Series(dtype="int64"),
            "pos": pd.Series(dtype="int32"),
            "keep_doc_id": pd.Series(dtype="int64"),
            "keep_pos": pd.Series(dtype="int32"),
        }
    )

    def update(key, pdfs, state: GroupState):
        if state.exists:
            kd, kp = state.get
        elif seed_index_path is not None:
            kd, kp = _para_seed_index(seed_index_path).get(
                key[0], (None, None)
            )
        else:
            kd, kp = None, None
        chunks = [c for c in pdfs if len(c)]
        drops = []
        if chunks:
            batch = pd.concat(chunks, ignore_index=True).sort_values(
                ["doc_id", "pos"]
            )
            for doc_id, pos in zip(batch["doc_id"], batch["pos"]):
                doc_id, pos = int(doc_id), int(pos)
                if kd is None:
                    kd, kp = doc_id, pos
                elif (doc_id, pos) != (kd, kp):
                    drops.append((doc_id, pos, kd, kp))
            state.update((kd, kp))
        if not drops:
            yield _EMPTY
        else:
            yield pd.DataFrame(
                drops, columns=["doc_id", "pos", "keep_doc_id", "keep_pos"]
            )

    return rows.groupBy("fp").applyInPandasWithState(
        update,
        "doc_id bigint, pos int, keep_doc_id bigint, keep_pos int",
        "keep_doc_id bigint, keep_pos int",
        "update",
        GroupStateTimeout.NoTimeout,
    )


def bpe_encode_stream(docs: DataFrame, merges_path: str) -> DataFrame:
    """Streaming BPE corpus encoding from a persisted
    `spark_graft.artifacts` merge list — TOKENIZE-ON-INGEST, the
    streaming half of the train-once/serve-many contract: the merge
    list is loaded once on the driver and baked into the plan as
    literals, and each arriving document flows through the same
    narrow codegen replace() chain as batch
    `vocab_bpe_apply(merges_path=...)`. The plan is STATELESS —
    no state store, no watermark, no shuffle (append mode, exactly-once
    per document under checkpointed sources/sinks) — so throughput is
    pure map parallelism at any scale; the encoded stream (n_tokens /
    n_merged / enc_md5 per doc) lands directly in the training-data
    sink. Equivalence vs the batch encode is exact and tested."""
    from spark_graft import artifacts
    from spark_graft.operators.vocab import bpe_apply_merges

    return bpe_apply_merges(docs, artifacts.load_bpe_merges(merges_path))


# ---------------------------------------------------- mixture drift monitor

# The monitor's FIXED language alphabet: a production mixture monitor
# watches a declared domain set (anything else lands in "other"), which
# is what makes a SINGLE streaming aggregation with one row of state
# possible — chained aggregations (per-lang counts, then a global total)
# are unsupported in structured streaming, but per-lang conditional sums
# over a fixed alphabet fit one groupBy().agg() whose state is one row
# regardless of corpus size.
MIXTURE_LANGS = ("de", "en", "es", "fr", "zh")
MIXTURE_DRIFT_T_FX = 50_000  # 5 share points (micro-units)


def _mixture_counts_row(docs: DataFrame) -> DataFrame:
    """One-row token-count aggregate over the fixed alphabet: t_<lang>
    columns + t_other + t_total. Shared by the stream and its batch
    twin so the arithmetic can never diverge."""
    from spark_graft.functions import tokens

    bucket = F.when(
        F.col("lang").isin(list(MIXTURE_LANGS)), F.col("lang")
    ).otherwise(F.lit("other"))
    toks = docs.select(bucket.alias("lang"), tokens("text").alias("ts")).select(
        "lang", F.size("ts").cast("bigint").alias("n_tokens")
    )
    aggs = [
        F.sum(F.when(F.col("lang") == l, F.col("n_tokens")).otherwise(F.lit(0)))
        .alias(f"t_{l}")
        for l in (*MIXTURE_LANGS, "other")
    ]
    return toks.groupBy().agg(*aggs, F.sum("n_tokens").alias("t_total"))


def _mixture_drift_from_counts(counts: DataFrame, ref: dict[str, int]) -> DataFrame:
    """Unpivot the one-row counts to (lang, n_tokens, share_fx,
    ref_share_fx, drift_fx, drifted) rows. share_fx = tokens * SCALE
    div total — exact int64; drift vs the artifact's micro-unit shares
    is an integer compare against MIXTURE_DRIFT_T_FX."""
    from spark_graft.artifacts import MIXTURE_SCALE

    all_langs = (*MIXTURE_LANGS, "other")
    stack_args = ", ".join(f"'{l}', t_{l}" for l in all_langs)
    long = counts.select(
        F.expr(f"stack({len(all_langs)}, {stack_args}) AS (lang, n_tokens)"),
        "t_total",
    )
    # the scaled numerator routes through decimal(38,0): the monitor is
    # CUMULATIVE forever, and n_tokens * 10^6 wraps int64 once a
    # language's running count passes ~9.2e12 tokens (~40-50 TB of a
    # dominant language) — exactly the scale this gate is declared for
    # (code-review r14). floor-div of nonneg decimals == int64 div, so
    # the contract (and the batch twin, which shares this helper) is
    # unchanged below the wrap point.
    from spark_graft.functions import decimal_scaled_div_fx

    share = F.when(
        F.col("t_total") > 0,
        decimal_scaled_div_fx("n_tokens", MIXTURE_SCALE, "t_total"),
    ).otherwise(F.lit(0))
    ref_share = F.coalesce(
        *[F.when(F.col("lang") == l, F.lit(int(v))) for l, v in sorted(ref.items())],
        F.lit(0),
    )
    return long.select(
        "lang",
        "n_tokens",
        share.cast("bigint").alias("share_fx"),
        ref_share.cast("bigint").alias("ref_share_fx"),
    ).select(
        "*",
        F.abs(F.col("share_fx") - F.col("ref_share_fx")).alias("drift_fx"),
        (
            F.abs(F.col("share_fx") - F.col("ref_share_fx"))
            > F.lit(MIXTURE_DRIFT_T_FX)
        ).alias("drifted"),
    )


def mixture_drift_stream(docs: DataFrame, reference_path: str) -> DataFrame:
    """Streaming MIXTURE-DRIFT monitor — the ops gate a training-data
    ingest pipeline runs continuously: per fixed-alphabet language
    (MIXTURE_LANGS + "other"), the running token share of everything
    ingested so far vs a persisted reference mixture
    (`artifacts.save_mixture_reference`, micro-unit integer shares),
    with a drifted flag when the absolute gap exceeds
    MIXTURE_DRIFT_T_FX. A crawler that suddenly over-delivers one
    language (a common upstream failure) flips its row's flag within a
    micro-batch of the shift showing up in the running share.

    Run in COMPLETE output mode: the plan is one streaming aggregation
    whose state is a SINGLE row of per-language int64 sums (bounded
    forever, no watermark needed — the monitor is cumulative by
    design), and every trigger re-emits the 6-row mixture table. The
    reference is loaded ONCE on the driver and baked into the plan as
    literals — the same ship-the-model-not-the-data economics as
    quality_score_stream/bpe_encode_stream. Equivalence vs the batch
    twin (`mixture_drift_batch`) is exact and tested: identical integer
    expressions over identical rows."""
    from spark_graft.artifacts import load_mixture_reference

    return _mixture_drift_from_counts(
        _mixture_counts_row(docs), load_mixture_reference(reference_path)
    )


def mixture_drift_batch(
    spark: SparkSession, sf_dir: str, reference_path: str
) -> DataFrame:
    """Batch twin of mixture_drift_stream (same shared helpers, same
    integer arithmetic) over the documents table at rest."""
    from spark_graft.artifacts import load_mixture_reference
    from spark_graft.sources import table

    docs = table(spark, sf_dir, "documents").select("lang", "text")
    return _mixture_drift_from_counts(
        _mixture_counts_row(docs), load_mixture_reference(reference_path)
    )


def build_mixture_reference(spark: SparkSession, sf_dir: str) -> dict[str, int]:
    """Train half of the monitor's contract: measure the corpus's
    per-language micro-unit token shares (exact integer division, the
    same share_fx arithmetic the monitor computes) for
    `artifacts.save_mixture_reference`."""
    from spark_graft.artifacts import MIXTURE_SCALE
    from spark_graft.sources import table

    docs = table(spark, sf_dir, "documents").select("lang", "text")
    row = _mixture_counts_row(docs).collect()[0]
    total = row["t_total"] or 0
    return {
        l: (int(row[f"t_{l}"]) * MIXTURE_SCALE) // total if total else 0
        for l in (*MIXTURE_LANGS, "other")
    }


# --------------------------------------------------------- streaming EWMA


def ewma_stream(
    events: DataFrame, reorder_delay: str | None = None
) -> DataFrame:
    """Streaming per-user EWMA — the stateful twin of batch `ts_ewma`
    (operators.events): every arriving event is annotated with the
    exponentially-weighted moving average of its user's last EWMA_DEPTH
    values (alpha = 1/2), the real-time smoothing feed behind rate
    limiting and anomaly baselines. State per user is a ring buffer of
    at most EWMA_DEPTH - 1 doubles — O(depth), bounded forever, no
    watermark needed.

    Bit-equivalence contract with the batch twin: the Python fold
    mirrors the batch lag-chain's EXPRESSION TREE (terms in k order,
    left-fold addition, each term value / 2^k — exact IEEE scaling),
    missing OR NULL terms contribute exactly 0.0 to both sums, and the
    final round(6) happens SPARK-SIDE on the raw double, so stream ==
    batch bit-for-bit on in-order replay. Shared NULL/NaN convention
    (ADVICE r14): both twins normalize genuine NaN values to NULL at
    ingest — pandas float64 erases the NULL/NaN distinction inside the
    state fold, so the passthrough `value` column is nanvl-masked back
    to NULL on output, matching batch ts_ewma's ingest normalization;
    the computed `ewma` is NOT masked (an all-NULL window is NaN in
    both twins). Ordered-arrival precondition per
    user (the CEP family's contract without its reorder buffer): with
    the default ``reorder_delay=None`` rows are sorted within each
    micro-batch, and cross-batch order is the source's responsibility.

    ``reorder_delay`` (e.g. "48 hours") lifts that precondition
    (VERDICT r14 item 2) with the SAME event-time re-order buffer
    cep_pattern_stream fronts an unordered stream with: the source is
    watermarked on ts, each user's arriving events are held in state,
    and only events whose event time the watermark has PASSED are
    released — in (ts, event_id) order — to the EWMA fold. Rows later
    than the delay are dropped by Spark's watermark filter before the
    operator (the documented bounded-late-data contract). Per-user
    state is the in-flight window (events within the delay of the
    watermark frontier) plus the O(depth) ring buffer; an event-time
    timeout re-invokes idle groups when the watermark passes their
    oldest buffered event, so the tail flushes without new data for
    that user. NULL event times are dropped in this mode (event-time
    order is undefined for them), and event times are compared to the
    watermark as UTC epoch micros computed JVM-side (unix_micros), so
    the buffer is correct under ANY session timezone; the output `ts`
    is rebuilt JVM-side with timestamp_micros for the same reason."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from spark_graft.operators.events import EWMA_DEPTH

    def _step(hist: list, v):
        """One EWMA fold step — mirrors the batch lag-chain's expression
        tree exactly (k-order terms, left-fold addition, value / 2^k).
        Returns (ewma, advanced hist). Shared verbatim by the ordered
        and reorder paths so the two cannot drift."""
        window = ([v] + hist[::-1])[:EWMA_DEPTH]  # newest first
        num, den = 0.0, 0.0
        for k, x in enumerate(window):
            if x is not None:
                num = num + x / float(1 << k)
                den = den + 1.0 / float(1 << k)
        ewma = num / den if den else float("nan")
        hist = (hist + [v])[-(EWMA_DEPTH - 1):]
        return ewma, hist

    def update(key, pdfs, state: GroupState):
        # a group's rows can arrive as SEVERAL Arrow chunks in
        # nondeterministic order (one chunk per maxRecordsPerBatch) —
        # concat first, ONE sort, exactly like the CEP matcher's
        # reorder handling; sorting each chunk independently would
        # interleave event-time ranges (code-review r14)
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["ts", "event_id"]
        )
        hist = list(state.get[0]) if state.exists else []  # oldest first
        rows: list[tuple] = []
        for eid, ts, v in zip(pdf["event_id"], pdf["ts"], pdf["value"]):
            # null values: pandas float64 erases the NULL/NaN
            # distinction, so both are treated as the batch twin's NULL
            # lag — the slot still SHIFTS the window (hist keeps a
            # placeholder) but contributes 0 to numerator AND
            # denominator, renormalizing exactly like the batch
            # coalesce/CASE terms (code-review r14)
            v = None if pd.isna(v) else float(v)
            ewma, hist = _step(hist, v)
            rows.append((int(eid), int(key[0]), ts, v, ewma))
        state.update((hist,))
        yield pd.DataFrame(
            rows, columns=["event_id", "user_id", "ts", "value", "ewma_raw"]
        )

    def update_reorder(key, pdfs, state: GroupState):
        if state.exists:
            hist, bts, beid, bval = state.get
            hist, bts, beid, bval = (
                list(hist), list(bts), list(beid), list(bval)
            )
        else:
            hist, bts, beid, bval = [], [], [], []
        chunks = [c for c in pdfs if len(c)]
        if chunks:  # timeout invocations arrive with no data
            batch = pd.concat(chunks, ignore_index=True)
            # ts_us was computed JVM-side by unix_micros (UTC epoch),
            # matching getCurrentWatermarkMs' epoch — see
            # cep_pattern_stream's update_reorder for why pandas
            # timestamps cannot be compared to the watermark directly
            bts.extend(int(v) for v in batch["ts_us"])
            beid.extend(int(v) for v in batch["event_id"])
            bval.extend(
                None if pd.isna(v) else float(v) for v in batch["value"]
            )
        wm_us = state.getCurrentWatermarkMs() * 1000
        rel, keep = _reorder_split(bts, beid, wm_us)
        rows: list[tuple] = []
        for i in rel:
            ewma, hist = _step(hist, bval[i])
            rows.append((beid[i], int(key[0]), bts[i], bval[i], ewma))
        bts, beid = [bts[i] for i in keep], [beid[i] for i in keep]
        bval = [bval[i] for i in keep]
        state.update((hist, bts, beid, bval))
        _reorder_set_timeout(state, bts)
        if rows:
            yield pd.DataFrame(
                rows,
                columns=["event_id", "user_id", "ts_us", "value", "ewma_raw"],
            )

    # Arrow re-emits the fold's None placeholders as float64 NaN; mask
    # back to NULL so the passthrough matches batch ts_ewma's
    # NaN-to-NULL ingest convention bit-for-bit
    value_out = F.nanvl(F.col("value"), F.lit(None).cast("double")).alias(
        "value"
    )
    if reorder_delay is not None:
        out = (
            events.filter(F.col("ts").isNotNull())
            .withWatermark("ts", reorder_delay)
            # ts itself stays in the projection: the event-time timeout
            # requires the watermarked column to reach the stateful
            # operator (the fold reads only the JVM-computed ts_us)
            .select(
                "event_id",
                "user_id",
                "ts",
                F.unix_micros("ts").alias("ts_us"),
                "value",
            )
            .groupBy("user_id")
            .applyInPandasWithState(
                update_reorder,
                "event_id bigint, user_id bigint, ts_us bigint, "
                "value double, ewma_raw double",
                "hist array<double>, bts array<bigint>, beid array<bigint>, "
                "bval array<double>",
                "append",
                GroupStateTimeout.EventTimeTimeout,
            )
        )
        return out.select(
            "event_id",
            "user_id",
            F.timestamp_micros("ts_us").alias("ts"),
            value_out,
            F.round("ewma_raw", 6).alias("ewma"),
        )
    out = (
        events.select("event_id", "user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            "event_id bigint, user_id bigint, ts timestamp, value double, "
            "ewma_raw double",
            "hist array<double>",
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        value_out,
        F.round("ewma_raw", 6).alias("ewma"),
    )


# ---------------------------------------------------- streaming reservoir


def reservoir_stream(docs: DataFrame) -> DataFrame:
    """Streaming per-stratum reservoir — the stateful twin of batch
    `sample_reservoir` (operators.pipeline): maintain exactly
    min(K, stratum size) members per source as documents arrive, the
    ingest-side feed for capacity-bounded consumers (eval-set carving,
    human-review queues, per-source debug samples). Emits MEMBERSHIP
    CHANGES per micro-batch: action='add' when a doc enters the
    reservoir, action='evict' when a later lower-hash arrival displaces
    it; the current membership is adds minus evicts, and the final
    membership equals the batch twin's exactly.

    Determinism contract (shared with the batch twin): membership is
    the K lowest (md5_bucket_raw('res:', doc_id), doc_id) pairs seen so
    far — an exchangeable uniform order computed JVM-SIDE by the same
    expression as the batch window's sort key, so stream == batch
    regardless of arrival order (reservoir-by-rank is ORDER-INVARIANT,
    unlike the EWMA fold — no reorder buffer needed, no watermark).
    Displacement is append-only: a doc's hash never changes, so once
    evicted it can never re-qualify (tested), and re-delivery of a
    current member is a no-op (the pool dedupes by doc_id — at-least-
    once sources are absorbed).

    Scale shape: per-source state is two arrays of K int64s — O(K) per
    stratum, bounded forever. Each micro-batch's shuffle carries only
    (source, doc_id, h) triples, never text; with K << batch size the
    emitted change-log is at most 2K rows per stratum per batch."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from spark_graft.functions import md5_bucket_raw
    from spark_graft.operators.pipeline import RESERVOIR_K

    def update(key, pdfs, state: GroupState):
        if state.exists:
            ids, hs = list(state.get[0]), list(state.get[1])
        else:
            ids, hs = [], []
        pool = dict(zip(ids, hs))  # doc_id -> h; dedupes re-delivery
        before = set(pool)
        for pdf in pdfs:
            for i, h in zip(pdf["doc_id"], pdf["h"]):
                pool.setdefault(int(i), int(h))
        kept = sorted(pool.items(), key=lambda kv: (kv[1], kv[0]))[
            :RESERVOIR_K
        ]
        kept_ids = {i for i, _ in kept}
        added = [(i, h) for i, h in kept if i not in before]
        evicted = [(i, pool[i]) for i in sorted(before - kept_ids)]
        state.update(
            ([i for i, _ in kept], [h for _, h in kept])
        )
        rows = [
            (key[0], i, h, "add") for i, h in added
        ] + [(key[0], i, h, "evict") for i, h in evicted]
        if rows:
            yield pd.DataFrame(
                rows, columns=["source", "doc_id", "h", "action"]
            )

    return (
        docs.select(
            "source",
            "doc_id",
            md5_bucket_raw("res:", F.col("doc_id")).alias("h"),
        )
        .groupBy("source")
        .applyInPandasWithState(
            update,
            "source string, doc_id bigint, h bigint, action string",
            "ids array<bigint>, hs array<bigint>",
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


# ------------------------------------------------- streaming heavy hitters

TOPK_CAPACITY = 32  # space-saving counters per stratum
TOPK_EMIT = 10  # summary rows emitted per stratum per batch


def topk_stream(docs: DataFrame) -> DataFrame:
    """Streaming per-source heavy hitters via SPACE-SAVING (Metwally et
    al. 2005) — the bounded-state answer to "what are the top terms in
    each source, live?": per source, at most {TOPK_CAPACITY} (term,
    count, err) counters, emitting the current top-{TOPK_EMIT} with
    error bounds after every micro-batch. cms_cells_stream answers
    point frequency queries; this maintains the TOP-K SET itself, the
    ingest-ops view ("what suddenly floods source X").

    Space-saving guarantees (tested): est >= true count >= est - err
    for every tracked term; any term with true count > n_seen /
    {TOPK_CAPACITY} is tracked; and while a stratum has seen <=
    {TOPK_CAPACITY} distinct terms the summary is EXACT (err = 0).
    Within each micro-batch, counts are pre-folded per term and terms
    are applied in (-batch_count, term) order, so the summary is
    deterministic for a given replay batching (the sequence-dependence
    all space-saving variants have lives BETWEEN batches, where the
    file source's order is already fixed).

    Scale shape: state is O({TOPK_CAPACITY}) per source forever; each
    batch shuffles bare (source, term) pairs — pre-tokenization is a
    narrow map — and emission is {TOPK_EMIT} rows per source per
    trigger.

    Hot-source bound: Structured Streaming cannot pre-aggregate before
    ``applyInPandasWithState``, so ONE row per token OCCURRENCE reaches
    the state task per source per trigger (the in-task fold is
    vectorized pandas, but the shuffle volume is the raw token count).
    Per-trigger volume per source is therefore bounded by
    tokens-per-doc x docs-per-trigger for that source — size
    ``maxFilesPerTrigger`` / ``maxBytesPerTrigger`` accordingly. If a
    single source ever floods a trigger, shard the state key to
    (source, crc32(term) % S): each shard keeps its own space-saving
    summary and a downstream batch merge (sum est/err per term across
    shards, re-rank) preserves the est >= true >= est - err guarantee
    because every occurrence of a given term lands in exactly one
    shard."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from spark_graft.functions import tokens

    def update(key, pdfs, state: GroupState):
        if state.exists:
            terms, counts, errs, n_seen = state.get
            summ = {
                t: [int(c), int(e)]
                for t, c, e in zip(terms, counts, errs)
            }
            n_seen = int(n_seen)
        else:
            summ, n_seen = {}, 0
        chunks = [c for c in pdfs if len(c)]
        if chunks:
            batch = pd.concat(chunks, ignore_index=True)
            bc = batch.groupby("term").size()
            n_seen += int(bc.sum())
            # deterministic application order: heaviest first, ties by term
            for term, c in sorted(bc.items(), key=lambda kv: (-kv[1], kv[0])):
                c = int(c)
                if term in summ:
                    summ[term][0] += c
                elif len(summ) < TOPK_CAPACITY:
                    summ[term] = [c, 0]
                else:
                    # evict the minimum-count counter (ties by term so
                    # the choice is deterministic)
                    victim = min(summ.items(), key=lambda kv: (kv[1][0], kv[0]))
                    ve = victim[1][0]
                    del summ[victim[0]]
                    summ[term] = [ve + c, ve]
        items = sorted(summ.items(), key=lambda kv: (-kv[1][0], kv[0]))
        state.update(
            (
                [t for t, _ in items],
                [v[0] for _, v in items],
                [v[1] for _, v in items],
                n_seen,
            )
        )
        top = items[:TOPK_EMIT]
        yield pd.DataFrame(
            {
                "source": [key[0]] * len(top),
                "rank": list(range(1, len(top) + 1)),
                "term": [t for t, _ in top],
                "est": [v[0] for _, v in top],
                "err": [v[1] for _, v in top],
                "n_seen": [n_seen] * len(top),
            }
        )

    return (
        docs.select("source", F.explode(tokens("text")).alias("term"))
        .groupBy("source")
        .applyInPandasWithState(
            update,
            "source string, rank int, term string, est bigint, err bigint, "
            "n_seen bigint",
            "terms array<string>, counts array<bigint>, errs array<bigint>, "
            "n_seen bigint",
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def judgment_consistency_stream(
    judgments: DataFrame,
    ratings_path: str,
    *,
    sf_dir: str | None = None,
    validate: bool | None = None,
) -> DataFrame:
    """Streaming annotator QA — score arriving pairwise preference
    judgments against a FROZEN fitted Bradley-Terry order (the serving
    half of `operators.curriculum.preference_rating`'s
    fit-once/serve-many contract): each (chosen_id, rejected_id)
    judgment broadcast-joins the persisted rating table
    (`artifacts.save_preference_ratings`) on both legs and emits

        (chosen_id, rejected_id, rating_chosen, rating_rejected,
         margin_fx, verdict)

    with verdict in {'consistent', 'contradicts', 'tie', 'unknown'}:
    a judgment that inverts the fitted order flags 'contradicts' the
    moment it lands — the annotator-drift / label-noise monitor a
    preference-data pipeline wants ON the ingest stream, not in a
    nightly audit ('unknown' = a leg the fit never rated, margin NULL
    either way the fit can't margin it).

    STATELESS: the rating table loads ONCE driver-side (full artifact
    checks at stream construction — kind/format/sha; pass `sf_dir` /
    `validate` to also enforce the training-corpus fingerprint, the
    same serve-time staleness contract as every artifact consumer)
    and enters the plan as a broadcast
    static frame, so each micro-batch is two map-side
    BroadcastHashJoins — no state store, no stream-side shuffle
    (plan-pinned: StateStore-free and hashpartitioning-free), append
    mode, throughput = map parallelism. The table is O(rated items) —
    a preference DATASET's item universe, broadcast-able by
    construction; a rating table past broadcast size would serve via
    a bucketed warehouse table instead (the pagerank edge-layout
    contract)."""
    from spark_graft import artifacts

    ratings = artifacts.load_preference_ratings(
        ratings_path, sf_dir=sf_dir, validate=validate
    ).to_pandas()
    spark = judgments.sparkSession
    static = spark.createDataFrame(ratings, "doc_id bigint, rating_fx bigint")
    rc = F.broadcast(
        static.select(
            F.col("doc_id").alias("chosen_id"),
            F.col("rating_fx").alias("rating_chosen"),
        )
    )
    rr = F.broadcast(
        static.select(
            F.col("doc_id").alias("rejected_id"),
            F.col("rating_fx").alias("rating_rejected"),
        )
    )
    joined = judgments.join(rc, "chosen_id", "left").join(
        rr, "rejected_id", "left"
    )
    known = F.col("rating_chosen").isNotNull() & F.col(
        "rating_rejected"
    ).isNotNull()
    return joined.select(
        "chosen_id",
        "rejected_id",
        "rating_chosen",
        "rating_rejected",
        F.when(
            known, F.col("rating_chosen") - F.col("rating_rejected")
        ).alias("margin_fx"),
        F.when(~known, F.lit("unknown"))
        .when(F.col("rating_chosen") > F.col("rating_rejected"), F.lit("consistent"))
        .when(F.col("rating_chosen") < F.col("rating_rejected"), F.lit("contradicts"))
        .otherwise(F.lit("tie"))
        .alias("verdict"),
    )


def curriculum_stage_stream(
    docs: DataFrame,
    thresholds_path: str,
    *,
    sf_dir: str | None = None,
    validate: bool | None = None,
) -> DataFrame:
    """Streaming curriculum stage assignment — the serving half of
    `operators.curriculum.pipeline_curriculum`'s fit-once/serve-many
    contract: arriving documents take their training stage 1..4 from
    the FROZEN quantile boundaries of the fit corpus
    (`operators.curriculum.curriculum_thresholds` persisted via
    `artifacts.save_curriculum_thresholds`), so an ingest pipeline can
    route documents into stage buckets the moment they land — the
    schedule does not drift as the arriving mixture does (recompute
    and redeploy the artifact to re-anchor, exactly the DSIR serving
    posture).

    Emits (doc_id, n_tokens, stage) with
    stage(v) = 1 + sum_k [v >= L_k] over the fitted L_k = min length
    whose stage exceeds k: the batch stage function EXACTLY on every
    fitted length (stage is monotone, so v >= L_k iff stage(v) > k —
    equivalence-tested over the fit corpus) and the batch cum() step
    extension elsewhere — between fitted lengths the floor-fitted
    stage, above the fitted maximum the maximum fitted stage, below
    the fitted minimum stage 1 (shortest goes first). NULL text counts
    as zero tokens (the batch twin's r18 NULL rule, array-level
    coalesce).

    STATELESS, and not even a join: the whole fitted model is
    CURRICULUM_STAGES-1 ints baked into the plan as literals (the
    dsir_score_stream posture, smaller) — no state store, no shuffle,
    no broadcast, pure codegen comparisons; throughput is map
    parallelism at any scale."""
    from spark_graft import artifacts
    from spark_graft.functions import tokens

    us = artifacts.load_curriculum_thresholds(
        thresholds_path, sf_dir=sf_dir, validate=validate
    )
    n_tokens = F.size(
        F.coalesce(tokens("text"), F.array().cast("array<string>"))
    ).cast("bigint")
    staged = docs.select("doc_id", n_tokens.alias("n_tokens"))
    stage = F.lit(1)
    for u in us:
        stage = stage + F.when(
            F.col("n_tokens") >= F.lit(int(u)), 1
        ).otherwise(0)
    return staged.select(
        "doc_id", "n_tokens", stage.cast("bigint").alias("stage")
    )
