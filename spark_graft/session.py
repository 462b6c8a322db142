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


def get_spark(app_name: str = "spark-graft", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]"))
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
        # local runs: keep the UI off and logs quiet
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Dlog4j2.level=warn")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
