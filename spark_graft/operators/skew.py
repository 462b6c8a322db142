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


# ---------------------------------------------------------------- profiler

SKEW_TOP_K = 5
SKEW_FX = 1000  # fixed-point scale for the skew ratio
SHARE_FX = 10000  # fixed-point scale for per-key row share


@query(
    "profile_skew",
    oracle=f"""
        WITH c AS (
            SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
            FROM events GROUP BY user_id
        ),
        t AS (
            SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
                   CAST(count(*) AS BIGINT) AS n_keys,
                   CAST(max(cnt) AS BIGINT) AS max_cnt
            FROM c
        ),
        top AS (
            SELECT user_id, cnt FROM c
            ORDER BY cnt DESC, user_id LIMIT {SKEW_TOP_K}
        )
        SELECT CAST(row_number() OVER (ORDER BY top.cnt DESC, top.user_id)
                    AS INTEGER) AS rank,
               top.user_id, top.cnt,
               (top.cnt * {SHARE_FX}) // t.n_rows AS share_fx,
               t.n_rows, t.n_keys,
               (t.max_cnt * {SKEW_FX} * t.n_keys) // t.n_rows AS skew_fx
        FROM top CROSS JOIN t
    """,
)
def profile_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/agg-key SKEW PROFILER — the diagnostic you run BEFORE
    choosing a mitigation from this module: per candidate shuffle key
    (events.user_id here), the top-{SKEW_TOP_K} heavy hitters with
    their fixed-point row share, plus the corpus-level skew factor
    skew_fx = max_key_count / mean_key_count (x{SKEW_FX}) — 1000 means
    perfectly uniform; the value tells you which regime you are in:
    near 1000 -> plain hash shuffle is fine; a few hot keys with high
    share -> split hot x n_salts + cold x 1 (join_skew_salted's
    docstring ledger); everything hot -> pre-aggregate or re-key. At
    100 TB this query IS the capacity-planning step: the skew factor
    upper-bounds the straggler's task size under hash partitioning,
    from one partial-aggregated pass over the key column.

    Plan shape: one groupBy(key) count with map-side partials (the key
    profile — vocabulary-bounded output), a 1-row global aggregate of
    it, the top-k via TakeOrderedAndProject (O(k) driver-free), and
    the 1-row stats table broadcast-crossed onto the k rows (the same
    crossJoin(broadcast(<1-row aggregate>)) pattern as profile_table).
    All integer `div` arithmetic so both engines floor identically."""
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("max_cnt"),
    )
    top = counts.orderBy(F.desc("cnt"), F.asc("user_id")).limit(SKEW_TOP_K)
    # rank window runs over exactly SKEW_TOP_K rows (bounded, like
    # mixture_weights' <=n_languages global window)
    rk = F.row_number().over(Window.orderBy(F.desc("cnt"), F.asc("user_id")))
    return (
        top.crossJoin(F.broadcast(totals))
        .withColumn("rank", rk)
        .select(
            "rank",
            "user_id",
            "cnt",
            F.expr(f"(cnt * {SHARE_FX}) div n_rows").alias("share_fx"),
            "n_rows",
            "n_keys",
            F.expr(f"(max_cnt * {SKEW_FX} * n_keys) div n_rows").alias("skew_fx"),
        )
    )
