"""Graph analytics over the near-duplicate document graph: PageRank.

The reference's deepest idea is the iterative multi-job driver (R12,
main.cpp:28-68): an ordinary host-language loop that re-runs a
distributed job until a condition holds. `dedup_clusters` generalizes
that to connected components; this module generalizes it to the other
canonical iterative MapReduce algorithm — PageRank — over the same
MinHash near-dup graph (rank = how central a document is inside its
duplicate neighborhood; high-rank docs are the natural canonical
representatives to KEEP when collapsing a near-dup cluster).

Numerics are FIXED-POINT: ranks are bigint micro-units (1e12 = mass 1)
and every step is integer `div` / integer sum — both order-independent —
so the iterated result is bit-identical across partitionings, retries,
and engines. A floating-point PageRank cannot be hash-gated (sum order
flips the low bits); the fixed-point one can, and the same property is
what makes a 1000-executor run reproducible at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_graft.operators.dedup import _MINHASH_PAIRS_SQL, dedup_minhash
from spark_graft.registry import query

UNIT = 10**12  # fixed-point scale: 1.0 of rank mass
DAMP_NUM, DAMP_DEN = 85, 100  # damping factor 0.85 as an integer ratio
N_ITERS = 3  # fixed so the oracle can unroll; production loops on delta


def _iter_sql(prev: str, nxt: str) -> str:
    """One unrolled PageRank round as a DuckDB CTE body."""
    return f"""
        {nxt} AS (
            SELECT e.dst AS id,
                   CAST(({DAMP_DEN - DAMP_NUM} * (SELECT init FROM params)) // {DAMP_DEN}
                        + ({DAMP_NUM} * sum({prev}.r // d.d)) // {DAMP_DEN}
                        AS BIGINT) AS r
            FROM edges e
            JOIN {prev} ON {prev}.id = e.src
            JOIN deg d ON d.src = e.src
            GROUP BY e.dst
        )"""


@query(
    "graph_pagerank",
    oracle=f"""
        WITH pairs AS (SELECT doc_a, doc_b FROM ({_MINHASH_PAIRS_SQL}) p),
        edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION ALL
            SELECT doc_b, doc_a FROM pairs
        ),
        deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
        params AS (SELECT {UNIT} // nullif(count(*), 0) AS init FROM deg),
        r0 AS (SELECT src AS id, (SELECT init FROM params) AS r FROM deg),
        {_iter_sql("r0", "r1")},
        {_iter_sql("r1", "r2")},
        {_iter_sql("r2", "r3")}
        SELECT id AS doc_id, r AS rank_fx,
               round(r / {float(UNIT)}, 6) AS rank
        FROM r3
    """,
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the symmetrized MinHash near-dup pair graph,
    {N_ITERS} rounds, damping {DAMP_NUM}/{DAMP_DEN}, fixed-point bigint
    arithmetic (see module docstring for why integer math is the only
    hash-gateable — and the only reproducible-at-scale — choice).

    Loop shape mirrors the reference's iterative driver (main.cpp:28-68)
    and `connected_components`: each round is ONE distributed job — join
    ranks to the out-edge table on src (both sides hash-partitioned on
    the same key), per-edge integer contribution `r div out_deg`, then a
    groupBy(dst) integer sum with map-side partial aggregation. The
    edge+degree table is built once and persisted across rounds; only
    the node count ever reaches the driver. Because the graph is
    symmetrized, every node has in- and out-edges — no dangling-mass
    term, no node drops out of the iteration. At 100 TB: identical loop
    with ranks checkpointed to durable storage per round and the edge
    table bucketed by src so the per-round join never re-shuffles."""
    pairs = dedup_minhash(spark, sf_dir).select("doc_a", "doc_b")
    return pagerank(spark, pairs, n_iters=N_ITERS)


def pagerank(
    spark: SparkSession, pairs: DataFrame, n_iters: int = N_ITERS
) -> DataFrame:
    """The fixed-point PageRank core over ANY undirected pair list
    (columns: two node-id bigints). See graph_pagerank for the loop
    contract; split out so other pair sources (and the property tests,
    which run it against a pure-python reference on arbitrary graphs)
    can reuse it."""
    # single-reference symmetrization — same rationale as
    # connected_components: a self-union would run the whole upstream
    # pair-derivation pipeline once per branch
    a, b = pairs.columns
    pairs = pairs.select(F.col(a).alias("doc_a"), F.col(b).alias("doc_b"))
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
                    F.struct(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    # one persisted (src, dst, d) table feeds every round: the expensive
    # pair derivation runs once, and each round's join reads the cache.
    # Everything downstream (node count, initial ranks, round joins) MUST
    # derive from edges_d, not from edges/deg — those lineages bypass the
    # cache and re-execute the whole minhash pipeline per reference.
    edges_d = edges.join(deg, "src").persist()
    try:
        # first action: materializes the cache AND yields the node count
        n_nodes = edges_d.select("src").distinct().count()
        if n_nodes == 0:
            return spark.createDataFrame(
                [], "doc_id bigint, rank_fx bigint, rank double"
            )
        init = UNIT // n_nodes
        teleport = ((DAMP_DEN - DAMP_NUM) * init) // DAMP_DEN
        ranks = edges_d.select(F.col("src").alias("id")).distinct().select(
            "id", F.lit(init).alias("r")
        )
        for _ in range(n_iters):
            # localCheckpoint per round = one eagerly-executed job per
            # iteration (the R12 driver-loop shape) AND a lineage cut:
            # the returned frame no longer references edges_d, so the
            # unpersist below cannot trigger a full recompute of the
            # minhash pipeline when the caller finally runs the plan.
            ranks = (
                edges_d.join(ranks, edges_d.src == ranks.id)
                .select("dst", F.expr("r div d").alias("c"))
                .groupBy("dst")
                .agg(F.sum("c").alias("in_mass"))
                .select(
                    F.col("dst").alias("id"),
                    (
                        F.lit(teleport)
                        + F.expr(f"({DAMP_NUM} * in_mass) div {DAMP_DEN}")
                    ).alias("r"),
                )
                .localCheckpoint()
            )
        return ranks.select(
            F.col("id").alias("doc_id"),
            F.col("r").alias("rank_fx"),
            F.round(F.col("r") / F.lit(float(UNIT)), 6).alias("rank"),
        )
    finally:
        edges_d.unpersist()
