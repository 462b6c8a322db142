"""Skew handling: salted two-stage aggregation.

A hot grouping key sends all its rows to one reduce task — the straggler
that dominates job wall-clock at 100 TB (the reference has the same
failure mode: one reduce file gets the hot key's whole run,
MapReduce.h:263-330). The fix for AGGREGATIONS is salting: split every
key into n_salts sub-groups, partially aggregate per (key, salt), then
merge the tiny per-salt partials per key. Stage 1's shuffle spreads the
hot key over n_salts tasks; stage 2 moves only n_salts rows per key.
Works for any MERGEABLE aggregate (count->sum, sum->sum, min->min,
max->max); sums stay in exact decimal through both stages so the result
is bit-identical to the unsalted plan.

JOIN-side skew needs no hand-rolling: AQE's skew-join optimization
(spark.sql.adaptive.skewJoin.enabled, on by default) splits oversized
shuffle partitions at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_graft.registry import query
from spark_graft.sources import table

N_SALTS = 16


def salted_agg(
    df: DataFrame,
    key: str,
    salt_src: str,
    value: str,
    n_salts: int = N_SALTS,
) -> DataFrame:
    """groupBy(key).agg(count, exact-decimal sum(value), min, max) as a
    salted two-stage plan. `salt_src` must be a column that spreads rows
    (any unique-ish id); the salt is a deterministic hash so reruns and
    retries aggregate identically."""
    salt = F.pmod(F.xxhash64(salt_src), F.lit(n_salts)).alias("_salt")
    partial = (
        df.select(key, salt, F.col(value).cast("decimal(18,2)").alias("_v"))
        .groupBy(key, "_salt")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum("_v").alias("_s"),
            F.min("_v").alias("_mn"),
            F.max("_v").alias("_mx"),
        )
    )
    return partial.groupBy(key).agg(
        F.sum("_n").alias("n_rows"),
        F.sum("_s").cast("double").alias("sum_value"),
        F.min("_mn").cast("double").alias("min_value"),
        F.max("_mx").cast("double").alias("max_value"),
    )


@query(
    "agg_skew_salted",
    oracle="""
        SELECT event_type,
               count(*) AS n_rows,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
               CAST(min(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS min_value,
               CAST(max(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_value
        FROM events GROUP BY event_type
    """,
)
def agg_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted plan vs a plain GROUP BY oracle: the hash-match proves
    salting is a pure physical rewrite — same result, different shuffle
    shape. event_type is exactly the kind of low-cardinality key (5
    values) whose groups each land on a single task unsalted."""
    ev = table(spark, sf_dir, "events")
    return salted_agg(ev, "event_type", "event_id", "value")
