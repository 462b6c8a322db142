"""Join operators: equi (shuffle + broadcast), multi-way, semi/anti, outer,
theta/range.

The reference has no joins — but its key-grouped shuffle (R7,
MapReduce.h:263-330: equal keys always land in the same reduce file) is
exactly the co-location contract every shuffle join relies on. Scale
notes per query; small dims are broadcast so the 100 TB fact side never
shuffles for them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_graft.functions import dsum, dsum_sql
from spark_graft.registry import query
from spark_graft.sources import table


@query(
    "join_q2_shape",
    oracle="""
        SELECT r.r_name, n.n_name, s.s_suppkey, s.s_name, s.s_acctbal
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE s.s_acctbal = (SELECT max(s2.s_acctbal) FROM supplier s2
                             WHERE s2.s_nationkey = s.s_nationkey)
    """,
)
def join_q2_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2's shape on the supplier dimension chain: a correlated
    max subquery (best-funded supplier(s) per nation) plus a broadcast
    chain through nation and region. The correlated subquery is resolved
    as a window max over the group key — one shuffle of supplier on
    s_nationkey, no self-join, no re-aggregation — and the dim chain
    never shuffles the supplier side. Ties on the max keep every
    witness, exactly like the SQL form."""
    s = table(spark, sf_dir, "supplier")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    r = F.broadcast(table(spark, sf_dir, "region"))
    best = (
        s.withColumn("_mx", F.max("s_acctbal").over(Window.partitionBy("s_nationkey")))
        .filter(F.col("s_acctbal") == F.col("_mx"))
        .drop("_mx")
    )
    return (
        best.join(n, best.s_nationkey == n.n_nationkey)
        .join(r, F.col("n_regionkey") == r.r_regionkey)
        .select("r_name", "n_name", "s_suppkey", "s_name", "s_acctbal")
    )


@query(
    "join_inner",
    oracle="""
        SELECT o.o_orderkey, c.c_custkey, c.c_mktsegment, o.o_totalprice
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain equi-join. Both sides hash-partition on the key (the R7
    invariant); AQE converts to broadcast at runtime if one side turns
    out small. At 100 TB: bucket both tables on the key to skip the
    shuffle entirely."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    return orders.join(cust, orders.o_custkey == cust.c_custkey, "inner").select(
        "o_orderkey", "c_custkey", "c_mktsegment", "o_totalprice"
    )


@query(
    "join_broadcast",
    oracle=f"""
        SELECT p.p_brand,
               count(*) AS n_items,
               {dsum_sql("l.l_quantity")} AS sum_qty
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ broadcast(dim): the big side never shuffles for the join —
    the only shuffle is the final tiny groupBy(p_brand). This is THE
    100 TB join pattern for dimension lookups (map-side join in
    MapReduce terms)."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.select("l_partkey", "l_quantity")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_items"), dsum("l_quantity").alias("sum_qty"))
    )


@query(
    "join_multi",
    oracle=f"""
        SELECT r.r_name, n.n_name,
               count(*) AS n_orders,
               {dsum_sql("o.o_totalprice")} AS sum_price
        FROM region r
        JOIN nation n   ON n.n_regionkey = r.r_regionkey
        JOIN customer c ON c.c_nationkey = n.n_nationkey
        JOIN orders o   ON o.o_custkey   = c.c_custkey
        GROUP BY r.r_name, n.n_name
    """,
)
def join_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-way snowflake chain. region/nation are broadcast (tiny dims);
    only customer⋈orders shuffles. Catalyst's join reordering + AQE keep
    the plan shaped this way at any scale."""
    r = F.broadcast(table(spark, sf_dir, "region"))
    n = F.broadcast(table(spark, sf_dir, "nation"))
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("sum_price"))
    )


@query(
    "join_semi_anti",
    oracle="""
        SELECT 'with_orders' AS kind, count(*) AS n FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        UNION ALL
        SELECT 'without_orders' AS kind, count(*) AS n FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI / LEFT ANTI — existence joins that never duplicate the
    left side and only ship the join key of the right side."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").select("o_custkey")
    on = cust.c_custkey == orders.o_custkey
    semi = cust.join(orders, on, "left_semi").agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("with_orders").alias("kind"), "n"
    )
    anti = cust.join(orders, on, "left_anti").agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("without_orders").alias("kind"), "n"
    )
    return semi.unionAll(anti)


@query(
    "join_outer",
    oracle=f"""
        SELECT o.o_orderkey,
               count(l.l_orderkey) AS n_items,
               coalesce({dsum_sql("l.l_quantity")}, 0) AS sum_qty
        FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey
    """,
)
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER with null-aware aggregation: orders with no lineitems
    survive with n_items=0, sum 0 (count(col) skips nulls; sum of none
    coalesced)."""
    o = table(spark, sf_dir, "orders").select("o_orderkey")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left")
        .groupBy("o_orderkey")
        .agg(
            F.count("l_orderkey").alias("n_items"),
            F.coalesce(dsum("l_quantity"), F.lit(0.0)).alias("sum_qty"),
        )
    )


@query(
    "join_asof",
    oracle="""
        SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
               c.event_id AS click_id, c.ts AS click_ts
        FROM events p
        LEFT JOIN LATERAL (
            SELECT event_id, ts FROM events c
            WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
            ORDER BY c.ts DESC, c.event_id DESC LIMIT 1
        ) c ON true
        WHERE p.event_type = 'purchase'
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (point-in-time) join: each purchase matched to the user's
    most recent click at-or-before it. Spark has no ASOF JOIN, and the
    naive form (range self-join + per-row max) re-scans the right side
    per probe. The scalable composition: tag both sides, union, and
    carry the last click forward with a running `last(..., ignorenulls)`
    window — ONE shuffle on user_id, linear in events, the same plan at
    100 TB. Ties break deterministically: at equal ts the click sorts
    before the purchase it matches, and the highest click event_id wins
    (mirrored in the oracle's ORDER BY ... DESC LIMIT 1)."""
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "ts")
    sided = ev.filter(F.col("event_type").isin("purchase", "click")).select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("side"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = sided.select(
        "event_id",
        "user_id",
        "ts",
        "side",
        F.last(
            F.when(F.col("side") == 0, F.struct("ts", "event_id")), ignorenulls=True
        )
        .over(w)
        .alias("m"),
    )
    return carried.filter(F.col("side") == 1).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("m.event_id").alias("click_id"),
        F.col("m.ts").alias("click_ts"),
    )


@query(
    "join_theta_range",
    oracle="""
        SELECT a.user_id, count(*) AS n_followups
        FROM events a JOIN events b
          ON a.user_id = b.user_id
         AND b.ts > a.ts
         AND b.ts <= a.ts + INTERVAL 1 HOUR
        GROUP BY a.user_id
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/theta self-join: follow-up events within 1h per user.

    Joining on user_id alone compares O(per-user-events^2) pairs — fine
    for sparse users, quadratic for chatty ones. The interval-join
    binning trick (what Flink's interval join does internally) adds a
    coarse time bucket to the equi key: bucket width = the range width
    (1h), the probe side explodes to its own and the next bucket, and a
    match's buckets can then only be equal — so the hash join compares
    only temporally-adjacent events and the residual range filter runs
    on candidates already ~within range. Same result, join key
    (user_id, hour) instead of (user_id)."""
    ev = table(spark, sf_dir, "events").select("user_id", "ts")
    bkt = F.floor(F.unix_timestamp("ts") / 3600)
    a = ev.select(
        "user_id", "ts", F.explode(F.array(bkt, bkt + 1)).alias("bkt")
    ).alias("a")
    b = ev.select("user_id", "ts", bkt.alias("bkt")).alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.bkt") == F.col("b.bkt"))
            & (F.col("b.ts") > F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .groupBy(F.col("a.user_id").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_followups"))
    )



# ---------------------------------------------------------------- join_bloom

# Bloom-filter semi-join reduction parameters. m is FIXED — the bitmap
# is 8 KiB regardless of how large the build side grows, which is the
# whole point: a dimension too big to broadcast still has a
# broadcastable bloom. k=3 xxhash64-seeded hash functions: the bloom is
# physical-only (no false negatives — the residual equi-join keeps
# exactness and the oracle is the plain join), so unlike the md5-derived
# keys of oracle-visible operators the hash needs NO engine portability,
# and the native 64-bit hash costs a fraction of 3 md5-of-string rounds
# per fact row (measured 3.47 s -> the hash was most of the probe cost
# at sf0.1).
BLOOM_M = 1 << 16  # bits
BLOOM_K = 3
_BLOOM_WORDS = BLOOM_M // 32  # int32 words


def _bloom_pos_spark(col, seed: int):
    """Bit position of `col` under hash function `seed` (xxhash64 with
    the seed mixed in as a leading column — JVM-native, codegen'd)."""
    return F.pmod(F.xxhash64(F.lit(seed), col), F.lit(BLOOM_M)).cast("int")


@query(
    "join_bloom",
    oracle=f"""
        SELECT n.n_name,
               count(*) AS n_shipments,
               {dsum_sql("l.l_extendedprice * (1 - l.l_discount)", 4)} AS revenue
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'EUROPE'
        GROUP BY n.n_name
    """,
)
def join_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join reduction: revenue per nation for
    shipments handled by EUROPE suppliers, with the fact side pre-pruned
    by an 8 KiB bloom filter built from the qualifying supplier keys
    BEFORE the join shuffle.

    Why this is THE 100 TB join-pruning pattern: when the filtered
    build side outgrows the broadcast threshold, the shuffle join must
    move every fact row — including the ~majority that will never match.
    A bloom over the build keys is fixed-size (m = 2^16 bits here, m is
    a tuning knob, not data-dependent), always broadcastable, has no
    false negatives (the residual equi-join keeps exactness), and its
    false-positive rate only pads the shuffle, never the answer. Spark's
    own AQE runtime filter (spark.sql.optimizer.runtime.bloomFilter.*)
    injects this automatically when stats justify it; this query is the
    explicit, plannable form.

    Driver traffic is provably bounded: the build side collapses to
    <= m distinct bit positions (65536 ints worst case — a ceiling set
    by the FILTER's size, not the data's). The bloom is physical-only:
    zero false negatives means the oracle is the plain 4-way join.

    Plan shape: dims broadcast (nation/region are tiny everywhere);
    supplier-side bloom positions are a narrow projection + distinct;
    the fact scan applies k=3 xxhash64 bit-tests as a codegen'd filter and
    only surviving rows enter the SortMergeJoin shuffle (deliberately
    NOT broadcast-hinted — the demo models the dim-too-big-to-broadcast
    regime; AQE may still flip it at this SF, which is correct too)."""
    sup = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = F.broadcast(table(spark, sf_dir, "nation"))
    reg = F.broadcast(table(spark, sf_dir, "region"))
    build = (
        sup.join(nat, sup.s_nationkey == nat.n_nationkey)
        .join(reg, (F.col("n_regionkey") == reg.r_regionkey) & (reg.r_name == "EUROPE"))
        .select("s_suppkey", "n_name")
    )

    # Build the bitmap: k positions per key, distinct, <= m ints to the
    # driver (bounded by the bloom's size, not the table's).
    pos_rows = (
        build.select(
            F.explode(
                F.array(*[_bloom_pos_spark(F.col("s_suppkey"), s) for s in range(BLOOM_K)])
            ).alias("pos")
        )
        .distinct()
        .collect()
    )
    words = [0] * _BLOOM_WORDS
    for r in pos_rows:
        words[r.pos >> 5] |= 1 << (r.pos & 31)
    # store as signed int32 literals
    words = [w - (1 << 32) if w >= (1 << 31) else w for w in words]
    bitmap = F.lit(words)

    li = table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )

    # k codegen'd bit-tests; a row passes only if every probed bit is set
    cond = F.lit(True)
    for s in range(BLOOM_K):
        p = _bloom_pos_spark(F.col("l_suppkey"), s)
        word = F.element_at(bitmap, F.shiftright(p, 5) + 1)
        # F.shiftleft only takes a literal bit count; call the SQL
        # function directly so the shift amount can be a column
        mask = F.call_function("shiftleft", F.lit(1), p % 32)
        cond = cond & (word.bitwiseAND(mask) != F.lit(0))

    pruned = li.filter(cond)
    return (
        pruned.join(build.select("s_suppkey", "n_name"), pruned.l_suppkey == F.col("s_suppkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_shipments"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
        )
    )
