"""SparkSession factory.

Local test configuration mirrors what we'd deploy on a real cluster:
- AQE on (runtime partition coalescing, skew-join splitting) — the modern
  form of the reference's manual load-balancing (MapReduce.h:149-153,
  277-279 balance split/reduce file sizes by hand).
- shuffle.partitions sized for the local box; on a 1000-executor cluster
  this becomes ~2-3x total cores and AQE coalesces down.
- UTC session timezone so timestamp results hash-match the DuckDB oracle.
- Arrow enabled: every pandas UDF / mapInPandas path is Arrow-batched.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_driver_memory() -> str:
    """Size the local JVM heap from physical RAM (quarter of the box,
    clamped to [2g, 48g]).

    In local[] mode the driver JVM IS every executor, but Spark's
    1g `spark.driver.memory` default assumes a thin cluster driver —
    at sf1 (6M-row lineitem) 32 concurrent tasks blew that heap before
    any operator got a chance to spill. On a real cluster this knob is
    per-executor sizing instead and the quarter-of-RAM heuristic still
    applies (leave room for OS cache + Python workers + Arrow buffers).
    Override with SPARK_GRAFT_DRIVER_MEM.
    """
    try:
        ram = os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
        return f"{max(2, min(48, ram // (4 * 1024**3)))}g"
    except (ValueError, OSError, AttributeError):
        return "4g"


def get_spark(app_name: str = "spark-graft", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]"))
        # Applied at JVM launch only: the first get_spark() in a process
        # decides the heap; later getOrCreate() calls can't resize it.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", _default_driver_memory()),
        )
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # events.parquet stores TIMESTAMP(NANOS), which Spark's reader
        # rejects; read as long and convert in sources.tables.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # parquet timestamps without UTC adjustment must read as plain
        # TIMESTAMP (withWatermark rejects TIMESTAMP_NTZ); see
        # sources.tables.ensure_session_confs
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.shuffle.spill.compress", "true")
        # spark.sql.join.preferSortMergeJoin stays at its DEFAULT (true)
        # as of r19. The r18 session set it false (guide §3.1/§9 "allow
        # shuffled-hash when it fits") justified only "within noise";
        # the r19 sf1 A/B (VERDICT item 4, ADVICE r18) found exactly ONE
        # query whose strategy the flag changes — join_outer, SHJ vs
        # SMJ — and it is flat at sf0.1 AND sf1 (1.51 vs 1.45 s medians,
        # 6-rep in-session pairs). A statically planned SHJ has no
        # runtime fallback when the build-side size estimate is wrong
        # (post-filter estimates often are) — an OOM risk with zero
        # measured benefit is a bad default for a framework claiming
        # 100 TB safety. Queries that KNOW a side fits should use a
        # per-join SHUFFLE_HASH hint instead.
        # local runs: keep the UI off and logs quiet
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Dlog4j2.level=warn")
    )
    # Growing-state streams (the paragraph/novelty dedup gates) hold one
    # state row per distinct key; the default HDFSBackedStateStore keeps
    # that map ON-HEAP (~219 B/distinct paragraph measured at sf1 —
    # BENCH_SF1 stream_state_sizing_r17). MEASURED RECOMMENDATION (r19,
    # both sf1 replays in BENCH_SF1, identical key counts and outputs):
    #   - paragraph_dedup_stream: 46.6 MB heap -> 0.54 MB heap +
    #     10.6 MB SST (~87x less heap, ~2.5 B/key on-heap, ~50 B/key
    #     on-disk), wall 23.5 -> 25.6 s (+9%).
    #   - minhash_novelty_stream (member-list state, bigger values):
    #     155 MB heap -> 1.65 MB heap + 66 MB SST, wall 77.8 -> 102.6 s
    #     (+32% — RocksDB serializes each updated member list per put).
    # Default stays HDFSBacked: at bench scale (and any state set that
    # fits comfortably on-heap) it is strictly faster. Switch to
    # RocksDB when projected state per executor core approaches heap
    # share — e.g. >~10^8 distinct paragraph keys/executor at 219 B/key
    # — where the on-heap map OOMs and RocksDB degrades to disk
    # instead; the 9-32% throughput tax is the price of that headroom.
    # Opt in with SPARK_GRAFT_STATE_STORE=rocksdb (any SparkSession
    # conf works; the provider is read per streaming query at start).
    if os.environ.get("SPARK_GRAFT_STATE_STORE", "").lower() == "rocksdb":
        builder = builder.config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming."
            "state.RocksDBStateStoreProvider",
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
