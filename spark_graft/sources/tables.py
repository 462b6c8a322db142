"""Parquet table source for the TESTDATA star schema.

Columnar parquet scans give us, via Catalyst and with zero code here:
column pruning (ReadSchema), predicate pushdown (PushedFilters), and
newline-free split planning — the industrial version of the reference's
hand-rolled byte-range text splits (MapReduce.h:136-176). At 100 TB the
same code path scales by partition count; callers should always
select/filter BEFORE wide transforms so pushdown reaches the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables: always safe (and right) to broadcast in joins.
SMALL_DIMS = {"region", "nation", "supplier"}


def ensure_session_confs(spark: SparkSession) -> None:
    """Runtime confs every query depends on, set defensively so queries
    behave identically under ANY caller-provided SparkSession (the
    driver builds its own, without spark_graft.session's builder):
    - UTC session TZ: timestamp results must not depend on host TZ;
    - nanosAsLong: events.parquet stores TIMESTAMP(NANOS), which the
      vectorized reader otherwise rejects;
    - no TIMESTAMP_NTZ inference: parquet timestamps without UTC
      adjustment otherwise surface as TIMESTAMP_NTZ, which
      `withWatermark` rejects (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE) —
      with a UTC session TZ, reading them as plain TIMESTAMP denotes
      the same instants in both batch and streaming plans.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) parquet read via nanosAsLong (session.py):
        # convert ns->us integer-side (ns magnitudes overflow double).
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str, register_views: bool = False) -> dict[str, DataFrame]:
    dfs = {name: table(spark, sf_dir, name) for name in TABLES}
    if register_views:
        for name, df in dfs.items():
            df.createOrReplaceTempView(name)
    return dfs
