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

JOIN-side skew has two answers, both here: AQE's skew-join optimization
(spark.sql.adaptive.skewJoin.enabled, on by default) splits oversized
shuffle partitions at runtime with zero code; `join_skew_salted` is the
static rewrite for when the skew is known up front — salt the fact
side's key space and replicate the dimension over the salt range, so a
hot key's probe rows spread across n_salts reduce tasks instead of one
straggler.
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


JOIN_SALTS = 8


@query(
    "join_skew_salted",
    oracle="""
        SELECT p_brand,
               count(*) AS n_items,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_price
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted shuffle join vs a plain-join oracle: the hash-match proves
    salting a JOIN, like salting an aggregate, is a pure physical rewrite.
    The fact side (lineitem) gets a deterministic per-row salt; the
    dimension side (part) is replicated once per salt value via a narrow
    posexplode; the join key becomes (partkey, salt), so a hot part's
    probe rows land on JOIN_SALTS different reduce tasks instead of one.
    The merge hint pins sort-merge: a broadcast would bypass the shuffle
    being demonstrated (and at 100 TB the dim that needs this treatment
    is exactly the one too big to broadcast).

    Scale ledger: replicating the FULL dimension multiplies its shuffle
    volume by n_salts — the right trade when dim ≪ fact (here 1:30).
    When the dimension is itself large, salt only the measured hot keys
    (split dim into hot×n_salts + cold×1 and union) or let AQE's runtime
    skew split handle it; this query pins the general mechanism with an
    exact oracle."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_extendedprice",
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(JOIN_SALTS)).alias(
            "_salt"
        ),
    )
    pt = table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        F.explode(F.sequence(F.lit(0), F.lit(JOIN_SALTS - 1)).cast("array<bigint>")).alias(
            "_salt"
        ),
    )
    joined = li.hint("merge").join(
        pt,
        (li["l_partkey"] == pt["p_partkey"]) & (li["_salt"] == pt["_salt"]),
    )
    return joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
    )
