"""Iterative numerical clustering: Lloyd's k-means on the embeddings
table, in fixed-point integer arithmetic.

Third member of the reference's iterative-driver family (R12,
main.cpp:28-68) after connected components (`dedup_clusters`) and
PageRank (`graph_pagerank`): a host-language loop that re-issues one
distributed job per round. K-means is the loop that matters for
embedding pipelines — it is exactly how the IVF coarse quantizer of
`sim_ann_ivf` gets trained (that query probes fixed centroids; this one
produces them).

Scale shape per round: centroids are k×64 integers embedded as plan
LITERALS (the degenerate broadcast — no shuffle, no join), assignment is
a narrow map over each vector's staged integer array, and the centroid
update is 64 JVM-side sum aggregates with map-side partials — one
shuffle of k partial rows per partition. The only driver traffic is the
k×64 centroid matrix per round. At 100 TB the identical loop runs with
centroids still as literals; only the partial-agg shuffle grows, and it
is already minimal.

Numerics: embeddings are quantized to positive fixed-point bigints
(round((x + 1) * 1e6); the data lives in (-1, 1)), so every distance,
sum, and mean is integer arithmetic — order-independent and therefore
bit-identical across engines and partitionings. Floating-point k-means
cannot be hash-gated (centroid-mean sum order flips low bits and then
flips assignments); the fixed-point one can. Tie-breaks: equal
distances resolve to the lowest cluster id, everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_graft.registry import query
from spark_graft.sources import table

K = 8  # clusters; init = the K lowest vec_ids (deterministic, no RNG)
N_ITERS = 2  # fixed so the oracle can unroll; production loops on shift
Q_SCALE = 1000000.0
Q_SHIFT = 1.0  # data range is (-1, 1); shifting keeps quantized values
# positive so integer-division semantics (floor vs truncate) agree
# between engines by never being exercised on negatives

# the inner CAST AS DOUBLE is load-bearing: DuckDB would otherwise run
# the whole expression in FLOAT (7 significant digits — off-by-one at
# the 1e6 quantization scale), while Spark computes in double
_QV = (
    f"CAST(round((CAST(embedding[i] AS DOUBLE) + {Q_SHIFT}) * {Q_SCALE}) AS BIGINT)"
)


def _dist_cte(cent: str, dist: str, assign: str) -> str:
    """One unrolled assignment round: distances to `cent`, then argmin
    per vector (ties to the lowest cluster id)."""
    return f"""
        {dist} AS (
            SELECT q.vec_id, c.cluster,
                   CAST(sum((q.qv - c.qc) * (q.qv - c.qc)) AS BIGINT) AS d2
            FROM q JOIN {cent} c USING (pos)
            GROUP BY q.vec_id, c.cluster
        ),
        {assign} AS (
            SELECT vec_id, cluster, d2,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY d2, cluster) AS rk
            FROM {dist}
        )"""


def quantized_col():
    """The fixed-point quantization of the embedding column — ALWAYS
    stage the result as its own projection before handing it to the HOF
    expressions below (see functions.shingles_from_tokens for the
    measured trap)."""
    return F.transform(
        "embedding",
        lambda x: F.round((x.cast("double") + F.lit(Q_SHIFT)) * F.lit(Q_SCALE))
        .cast("long"),
    )


def d2_to(cvals: list[int]):
    """Integer squared distance from the staged `q` array to a centroid
    literal — the centroid rides into the plan as k×dim literals, the
    degenerate broadcast."""
    carr = F.array(*[F.lit(int(v)) for v in cvals])
    return F.aggregate(
        F.zip_with("q", carr, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def best_assignment(cents: dict[int, list[int]]):
    """struct(d2, cluster) of the nearest centroid (ties -> lowest
    cluster id, via array_min over (d2, cluster) structs)."""
    return F.array_min(
        F.array(
            *[
                F.struct(
                    d2_to(cvals).alias("d2"),
                    F.lit(cid).cast("long").alias("cluster"),
                )
                for cid, cvals in sorted(cents.items())
            ]
        )
    )


def lloyd_centroids(spark: SparkSession, sf_dir: str) -> dict[int, list[int]]:
    """Run the Lloyd training loop ({N_ITERS - 1} centroid update(s)
    from the deterministic lowest-vec_id seed) and return the final
    integer centroid matrix — the coarse quantizer `sim_ann_ivf_trained`
    serves from. Only k×dim ints cross the driver per round."""
    emb = table(spark, sf_dir, "embeddings")
    qdf = emb.select("vec_id", quantized_col().alias("q"))
    dim = int(emb.select(F.size("embedding")).first()[0])
    seed = qdf.filter(F.col("vec_id") < K).orderBy("vec_id").collect()
    cents = {int(r["vec_id"]): [int(v) for v in r["q"]] for r in seed}
    for _ in range(N_ITERS - 1):
        assigned = qdf.select("vec_id", "q", best_assignment(cents).alias("b"))
        stats = (
            assigned.groupBy(F.col("b.cluster").alias("cluster"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.sum(F.element_at("q", i + 1)).alias(f"s{i}")
                    for i in range(dim)
                ],
            )
            .collect()
        )
        cents = {
            int(r["cluster"]): [int(r[f"s{i}"]) // int(r["n"]) for i in range(dim)]
            for r in stats
        }
    return cents


# the full unrolled training pipeline as oracle CTEs — shared by
# kmeans_lloyd and by sim_ann_ivf_trained's oracle (which serves the
# trained quantizer): q = quantized position-exploded vectors,
# c1 = centroids after the update round, a2 = final assignments
KMEANS_CTES = f"""q AS (
            SELECT vec_id, i AS pos, {_QV} AS qv
            FROM embeddings,
                 unnest(generate_series(1, len(embedding))) AS u(i)
        ),
        c0 AS (SELECT vec_id AS cluster, pos, qv AS qc FROM q WHERE vec_id < {K}),
        {_dist_cte("c0", "d1", "a1")},
        c1 AS (
            SELECT a.cluster, q.pos,
                   CAST(sum(q.qv) // count(*) AS BIGINT) AS qc
            FROM a1 a JOIN q ON q.vec_id = a.vec_id
            WHERE a.rk = 1
            GROUP BY a.cluster, q.pos
        ),
        {_dist_cte("c1", "d2_", "a2")}"""


@query(
    "kmeans_lloyd",
    oracle=f"""
        WITH {KMEANS_CTES}
        SELECT vec_id, cluster, d2 FROM a2 WHERE rk = 1
    """,
)
def kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{N_ITERS} unrolled Lloyd rounds, k={K}, deterministic init (the
    {K} lowest vec_ids as seed centroids). Returns each vector's final
    cluster and its squared fixed-point distance to that centroid. See
    the module docstring for the scale shape and why the arithmetic is
    integer. The oracle re-derives the same rounds relationally
    (position-exploded join instead of array ops) — two independent
    implementations, one hash."""
    cents = lloyd_centroids(spark, sf_dir)
    qdf = table(spark, sf_dir, "embeddings").select(
        "vec_id", quantized_col().alias("q")
    )
    return qdf.select(
        "vec_id", best_assignment(cents).alias("b")
    ).select("vec_id", F.col("b.cluster").alias("cluster"), F.col("b.d2").alias("d2"))
