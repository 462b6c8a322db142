"""Iterative numerical clustering: Lloyd's k-means on the embeddings
table, in fixed-point integer arithmetic.

Third member of the reference's iterative-driver family (R12,
main.cpp:28-68) after connected components (`dedup_clusters`) and
PageRank (`graph_pagerank`): a host-language loop that re-issues one
distributed job per round. K-means is the loop that matters for
embedding pipelines — it is exactly how the IVF coarse quantizer of
`sim_ann_ivf` gets trained (that query probes fixed centroids; this one
produces them).

Scale shape per round: centroids are k×64 integers shipped in the UDF
closure (the degenerate broadcast — no shuffle, no join), assignment is
a narrow Arrow-batched numpy map (`assignment_udf` — see its docstring
for why dense linear algebra must NOT be a Catalyst expression tree),
and the centroid update is 64 JVM-side sum aggregates with map-side
partials — one shuffle of k partial rows per partition. The only driver traffic is the
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

import numpy as np
import pandas as pd
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


def _centroid_matrix(cents: dict[int, list[int]]):
    """(sorted cluster ids, k x dim int64 matrix, per-row |c|^2).
    An empty dict (training saw zero vectors) yields (0,)-shaped parts —
    consumers only evaluate them on rows, of which there are then none."""
    cids = sorted(cents)
    if not cids:
        z = np.array([], dtype=np.int64)
        return z, np.zeros((0, 1), dtype=np.int64), z
    C = np.array([cents[c] for c in cids], dtype=np.int64)
    return np.array(cids, dtype=np.int64), C, np.einsum("ij,ij->i", C, C)


def _quantize_assign(M: np.ndarray, C: np.ndarray, cn2: np.ndarray):
    """Shared numpy kernel: quantize a batch of raw float32 vectors and
    assign each to its nearest centroid row. Returns (Q int64 matrix,
    d2-to-nearest, row index into C). See `assignment_udf` for the
    determinism contract this arithmetic upholds."""
    Q = np.floor((M.astype(np.float64) + Q_SHIFT) * Q_SCALE + 0.5).astype(np.int64)
    qn2 = np.einsum("ij,ij->i", Q, Q)
    d2 = qn2[:, None] + cn2[None, :] - 2 * (Q @ C.T)
    idx = np.argmin(d2, axis=1)
    return Q, d2[np.arange(len(idx)), idx], idx


def assignment_udf(cents: dict[int, list[int]]):
    """Arrow-vectorized nearest-centroid assignment: returns a
    struct(cluster, d2) column — nearest centroid id (ties -> lowest
    cluster id) and the integer squared distance to it.

    Why a pandas UDF and not column expressions: k x dim = 512
    (element - literal)^2 terms is one expression tree Spark cannot
    whole-stage-codegen (the generated method exceeds the JIT limits, the
    stage falls back to interpreted eval, and ships a ~2 MB task
    binary). Measured at sf1 (500k x 64): zip_with+aggregate HOF 43.7s,
    unrolled element_at 52.3s, staged per-cluster columns 19.6s,
    THIS (Arrow batch -> one numpy int64 matmul per batch) 1.1s — and
    bit-identical output on all 500k rows. Dense linear algebra is the
    one place batched numpy beats Catalyst expressions, which is exactly
    what the Arrow UDF path is for.

    Determinism contract (what the DuckDB oracle hash-checks):
    - quantization floor(v + 0.5) == round-HALF-UP == Spark F.round ==
      DuckDB round for these values: v = (float32 + 1) * 1e6 is EXACT in
      float64 (<= 44 significant bits), so v + 0.5 never rounds and the
      floor is the true half-up result;
    - d2 via the expanded identity |q|^2 + |c|^2 - 2 q.c in int64 is the
      same integer as sum((q-c)^2) — no overflow, dim * (2*Q_SCALE)^2
      = 64 * 4e12 << 2^63;
    - np.argmin returns the FIRST minimum, and rows of C are sorted by
      cluster id -> ties resolve to the lowest id, like the oracle's
      ORDER BY d2, cluster."""
    CIDS, C, cn2 = _centroid_matrix(cents)

    @F.pandas_udf("cluster long, d2 long")
    def assign(emb: pd.Series) -> pd.DataFrame:
        if len(emb) == 0:
            return pd.DataFrame({"cluster": [], "d2": []})
        _, d2, idx = _quantize_assign(np.stack(emb.to_numpy()), C, cn2)
        return pd.DataFrame({"cluster": CIDS[idx], "d2": d2})

    return assign


def _update_stats(emb: DataFrame, cents: dict[int, list[int]], dim: int):
    """One Lloyd centroid-update pass: per-cluster member count and
    per-dimension sums of the quantized vectors.

    The partial sums are computed INSIDE the Arrow batches with numpy
    (`mapInPandas` emitting one k x (dim+2) stats frame per batch — the
    map-side combine), so the shuffle carries ~batches x k tiny rows and
    the final groupBy is over hundreds of rows. The same work as 64
    JVM-side `sum(round(embedding[i]..))` aggregate columns, which
    measured 11s at sf1 (64 aggregate expressions overflow codegen);
    this path is ~1s. Integer sums are order-independent, so the result
    is bit-identical however batches land."""
    CIDS, C, cn2 = _centroid_matrix(cents)
    schema = "cluster long, n long, " + ", ".join(f"s{i} long" for i in range(dim))

    def part(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            Q, _, idx = _quantize_assign(np.stack(pdf["embedding"].to_numpy()), C, cn2)
            rows = []
            for j, cid in enumerate(CIDS):
                mask = idx == j
                n = int(mask.sum())
                if n == 0:
                    continue
                rows.append([int(cid), n, *Q[mask].sum(axis=0).tolist()])
            if rows:
                yield pd.DataFrame(rows, columns=schema.replace(" long", "").split(", "))

    return (
        emb.select("embedding")
        .mapInPandas(part, schema)
        .groupBy("cluster")
        .agg(
            F.sum("n").alias("n"),
            *[F.sum(f"s{i}").alias(f"s{i}") for i in range(dim)],
        )
        .collect()
    )


# (sf_dir, k) -> trained centroids. Training is deterministic in the
# data, and every harness path (driver, bench, tests) treats a path's
# parquet as immutable within a session — so the four quantizer
# consumers (kmeans_lloyd, sim_ann_ivf_trained, dedup_embedding,
# sim_knn_graph) share one training run per (dataset, k) instead of
# re-reading the embeddings table each. Cache payload is k x dim ints.
_CENTROID_MEMO: dict[tuple[str, int], dict[int, list[int]]] = {}


def lloyd_centroids(
    spark: SparkSession, sf_dir: str, k: int = K, dim: int | None = None
) -> dict[int, list[int]]:
    """Run the Lloyd training loop ({N_ITERS - 1} centroid update(s)
    from the deterministic lowest-vec_id seed) and return the final
    integer centroid matrix — the coarse quantizer `sim_ann_ivf_trained`
    serves from. Only k×dim ints cross the driver per round.

    `k` defaults to the fixed K=8 of kmeans_lloyd / sim_ann_ivf_trained;
    dedup_embedding passes a data-derived k (~n / target cell size) so
    its blocking cells stay constant-sized as the corpus grows — and the
    `dim` it already knows, saving the lookup job. Results are memoized
    per (sf_dir, k) — see _CENTROID_MEMO."""
    memo_key = (sf_dir, k)
    if memo_key in _CENTROID_MEMO:
        return _CENTROID_MEMO[memo_key]
    emb = table(spark, sf_dir, "embeddings")
    if dim is None:
        first = emb.select(F.size("embedding")).first()
        if first is None:  # zero vectors: nothing to train on
            _CENTROID_MEMO[memo_key] = {}
            return {}
        dim = int(first[0])
    seed = (
        emb.select("vec_id", quantized_col().alias("q"))
        .filter(F.col("vec_id") < k)
        .orderBy("vec_id")
        .collect()
    )
    cents = {int(r["vec_id"]): [int(v) for v in r["q"]] for r in seed}
    for _ in range(N_ITERS - 1):
        stats = _update_stats(emb, cents, dim)
        cents = {
            int(r["cluster"]): [int(r[f"s{i}"]) // int(r["n"]) for i in range(dim)]
            for r in stats
        }
    _CENTROID_MEMO[memo_key] = cents
    return cents


# the full unrolled training pipeline as oracle CTEs — shared by
# kmeans_lloyd and by sim_ann_ivf_trained's oracle (which serves the
# trained quantizer): q = quantized position-exploded vectors,
# c1 = centroids after the update round, a2 = final assignments.
# `k_sql` is any SQL expression for the cluster count — the fixed
# default `8` for kmeans_lloyd / sim_ann_ivf_trained, a count(*)-derived
# scalar subquery for dedup_embedding's grow-with-n quantizer.


def kmeans_ctes(k_sql: str = str(K)) -> str:
    return f"""q AS (
            SELECT vec_id, i AS pos, {_QV} AS qv
            FROM embeddings,
                 unnest(generate_series(1, len(embedding))) AS u(i)
        ),
        c0 AS (SELECT vec_id AS cluster, pos, qv AS qc FROM q WHERE vec_id < {k_sql}),
        {_dist_cte("c0", "d1", "a1")},
        c1 AS (
            SELECT a.cluster, q.pos,
                   CAST(sum(q.qv) // count(*) AS BIGINT) AS qc
            FROM a1 a JOIN q ON q.vec_id = a.vec_id
            WHERE a.rk = 1
            GROUP BY a.cluster, q.pos
        ),
        {_dist_cte("c1", "d2_", "a2")}"""


KMEANS_CTES = kmeans_ctes()


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
    return (
        table(spark, sf_dir, "embeddings")
        .select("vec_id", assignment_udf(cents)("embedding").alias("b"))
        .select(
            "vec_id", F.col("b.cluster").alias("cluster"), F.col("b.d2").alias("d2")
        )
    )
