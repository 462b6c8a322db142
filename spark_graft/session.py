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
        # guide §3.1/§9: let the planner pick shuffled-hash join when its
        # size conditions hold (sort-merge only wins when both sides are
        # huge per partition; AQE still falls back when the build side
        # does not fit)
        .config("spark.sql.join.preferSortMergeJoin", "false")
        # local runs: keep the UI off and logs quiet
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Dlog4j2.level=warn")
    )
    # Growing-state streams (the paragraph/novelty dedup gates) hold one
    # state row per distinct key; the default HDFSBackedStateStore keeps
    # that map ON-HEAP (~219 B/distinct paragraph measured at sf1 —
    # BENCH_SF1 stream_state_sizing_r17). At vocabulary scale run the
    # RocksDB provider: the r18 pilot (stream_state_sizing_rocksdb_r18,
    # same sf1 replay, identical key counts and outputs) measured ~2.5 B
    # on-heap + ~50 B on-disk SST per paragraph key (~87x less heap,
    # ~6% wall overhead) — state spills instead of OOMing. Opt in with
    # SPARK_GRAFT_STATE_STORE=rocksdb (any SparkSession conf works; the
    # provider is read per streaming query at start).
    if os.environ.get("SPARK_GRAFT_STATE_STORE", "").lower() == "rocksdb":
        builder = builder.config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming."
            "state.RocksDBStateStoreProvider",
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
