"""Window operators: rank, running aggregate, lag.

The lag idiom is the reference's reducer in disguise: reducer_do_work
streams sorted (k,v) pairs carrying the previous key and compares
adjacent keys (R8, MapReduce.h:192-208, carry at 200-205). lag(k) OVER
(ORDER BY k) is that exact computation, distributed: Spark
hash-partitions on the PARTITION BY key and sorts within partitions —
the same partition-then-sort the reference builds by hand (R4+R7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_graft.registry import query
from spark_graft.sources import table


@query(
    "win_rank",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rk
            FROM orders
        ) WHERE rk = 1
    """,
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top order per customer. Deterministic tie-break on o_orderkey."""
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )


@query(
    "win_running",
    oracle="""
        SELECT o_custkey, o_orderkey,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                    OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                   AS running_spend
        FROM orders
    """,
)
def win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum per customer by order date (decimal-exact running
    frame so every prefix sum hash-matches)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").alias("running_spend"),
    )


@query(
    "win_lag",
    oracle="""
        SELECT o_custkey, o_orderkey,
               lag(o_totalprice) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey)
                   AS prev_price,
               (o_orderstatus = lag(o_orderstatus) OVER (PARTITION BY o_custkey
                                                         ORDER BY o_orderdate, o_orderkey))
                   AS same_status_as_prev
        FROM orders
    """,
)
def win_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-row compare (ref R8's previous-key carry, MapReduce.h:
    200-205). Partitioned by o_custkey so the sort is per-group — scales
    as pure shuffle parallelism, no global order needed. Ordering ends
    on the unique o_orderkey, making lag deterministic (lineitem has no
    unique sort key in this dataset)."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        (F.col("o_orderstatus") == F.lag("o_orderstatus").over(w)).alias("same_status_as_prev"),
    )


@query(
    "win_range",
    oracle="""
        SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                   PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
                   RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS spend_30d
        FROM orders
    """,
)
def win_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: trailing-30-day spend per customer. Unlike a ROWS
    frame, the bound is a VALUE distance — Spark needs a numeric
    orderBy, so the date becomes epoch days (unix_date) with
    rangeBetween(-30, 0); DuckDB's INTERVAL frame is the same
    predicate. Decimal sum keeps every frame's total exact, so the two
    engines hash-match even though each row sums a different subset."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_date(F.to_date("o_orderdate")))
        .rangeBetween(-30, 0)
    )
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").alias("spend_30d"),
    )


@query(
    "win_dist",
    oracle="""
        SELECT c_custkey,
               ntile(4) OVER w AS quartile,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cume
        FROM customer
        -- NULLS FIRST: Spark ASC defaults to nulls-first while
        -- DuckDB windows default to nulls-last; global_rank's bucket
        -- assignment (NULL > cut IS NULL -> bucket 0) already sorts
        -- NULL acctbals first, so the oracle must pin the same order
        WINDOW w AS (ORDER BY c_acctbal NULLS FIRST, c_custkey)
    """,
)
def win_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (quartile assignment, percentile
    position) over a GLOBAL order — the one window class that genuinely
    needs a total ordering. Spark plans a bare `Window.orderBy` as
    Exchange SinglePartition (one task sorts everything), so this runs
    the scalable two-pass form instead: global_rank() below assigns
    deterministic range buckets from approxQuantile cut points, ranks
    within buckets in parallel, and adds broadcast bucket offsets; the
    distribution functions are then closed-form in (global rank, n) —
    exact, because the (c_acctbal, c_custkey) order is a total order
    (no ties), which also makes ntile's quartile edges reproducible."""
    ranked, n = global_rank(
        table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal"),
        value_col="c_acctbal",
        order_cols=("c_acctbal", "c_custkey"),
    )
    grn = F.col("_grn")
    return ranked.select(
        "c_custkey",
        ntile_from_rank(grn, n, 4).alias("quartile"),
        F.round((grn - 1) / (n - 1 if n > 1 else 1), 6).alias("pct_rank"),
        F.round(grn / F.lit(float(n)), 6).alias("cume"),
    )


def global_rank(
    df: DataFrame,
    value_col: str,
    order_cols: tuple[str, ...],
    n_buckets: int = 32,
):
    """(df + `_grn` global row number, total n) WITHOUT a single-task
    sort: the 100 TB global-ranking pattern.

    1. Cut points from approxQuantile become LITERALS in the plan, so
       bucket assignment is deterministic across re-executions (a
       repartitionByRange would re-sample boundaries per action and
       desynchronize the offset pass from the rank pass).
    2. row_number per bucket — parallel, one shuffle on the bucket id.
       Equal values always share a bucket (assignment compares only the
       value), so the within-bucket order concatenated in bucket order
       IS the global order.
    3. Per-bucket counts (one tiny aggregate) become broadcast literal
       offsets; _grn = offset[bucket] + local rank."""
    bounds = sorted(
        set(
            df.stat.approxQuantile(
                value_col, [i / n_buckets for i in range(1, n_buckets)], 0.001
            )
        )
    )
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + F.when(F.col(value_col) > F.lit(b), 1).otherwise(0)
    bucketed = df.withColumn("_bkt", bucket)
    w_local = Window.partitionBy("_bkt").orderBy(*order_cols)
    ranked = bucketed.withColumn("_lrn", F.row_number().over(w_local))
    counts = {
        r["_bkt"]: r["n"]
        for r in bucketed.groupBy("_bkt").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    off_expr = F.lit(0)
    for b, off in offsets.items():
        if off:
            off_expr = F.when(F.col("_bkt") == b, F.lit(off)).otherwise(off_expr)
    return ranked.withColumn("_grn", F.col("_lrn") + off_expr).drop("_bkt", "_lrn"), acc


def ntile_from_rank(grn, n: int, k: int):
    """SQL ntile(k) as a closed form over a global row number with no
    ties: the first n%k buckets get floor(n/k)+1 rows, the rest
    floor(n/k)."""
    q, r = divmod(n, k)
    big = r * (q + 1)
    return (
        F.when(grn <= big, F.floor((grn - 1) / (q + 1)) + 1)
        .otherwise(F.lit(r) + F.floor((grn - big - 1) / q) + 1 if q else F.lit(r))
        .cast("int")
    )
