"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine near-dup.

Scale design (the part that matters at 100 TB):
- every variant reduces pair discovery to an equi-join on a derived key
  (content hash, LSH band signature, simhash bucket, shingle, label
  block) — pure shuffle parallelism, no driver state, no O(n^2) global
  cross product;
- hashing uses md5 hex strings (engine-portable; Spark's murmur3
  `hash()` and DuckDB's `hash()` disagree) so every step is
  oracle-checkable, not just "looks plausible";
- signatures/bands are computed as narrow per-row array expressions
  (transform/aggregate) — zero shuffles until the candidate join itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_graft.functions import cosine, md5_min_signature, tokens, word_shingles
from spark_graft.registry import query
from spark_graft.sources import table

_TOK = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')"
# DuckDB fragment: distinct word-3-gram shingles of `toks`
_SHINGLES = (
    "list_distinct(list_transform(generate_series(1, greatest(len(toks) - 2, 0)), "
    "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))"
)

N_PERMS = 12
N_BANDS = 4  # 3 rows per band
JACCARD_THRESHOLD = 0.8


@query(
    "dedup_exact",
    oracle=f"""
        SELECT min(doc_id) AS keep_doc_id, count(*) AS n_copies
        FROM (SELECT doc_id, md5(array_to_string({_TOK}, ' ')) AS fp FROM documents)
        GROUP BY fp
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by normalized-content hash: group on md5 of the
    token-normalized text, keep the minimum doc_id. One shuffle on a
    16-byte key regardless of document size — at 100 TB you shuffle
    hashes, never documents."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.md5(F.array_join(tokens("text"), " ")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .drop("fp")
    )


def minhash_bands(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, shingles, band, sig): LSH band signatures, one row per
    (doc, band). All signature math is narrow (per-row array exprs);
    the only wide op downstream is the band-bucket self-join."""
    sh = word_shingles(text_col, 3)
    mins = [md5_min_signature(F.col("shingles"), p).alias(f"mh{p}") for p in range(N_PERMS)]
    rows_per_band = N_PERMS // N_BANDS
    with_sig = docs.select("doc_id", sh.alias("shingles")).select(
        "doc_id", "shingles", *mins
    )
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|", *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
                    )
                ).alias("sig"),
            )
            for b in range(N_BANDS)
        ]
    )
    return with_sig.select("doc_id", "shingles", F.explode(bands).alias("bs")).select(
        "doc_id", "shingles", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )


@query(
    "dedup_minhash",
    oracle=f"""
        WITH toks AS (SELECT doc_id, {_TOK} AS toks FROM documents),
        sh AS (SELECT doc_id, {_SHINGLES} AS sh FROM toks),
        shs AS (SELECT doc_id, unnest(sh) AS s FROM sh),
        mins AS (
            SELECT shs.doc_id, g.p, min(md5(CAST(g.p AS VARCHAR) || ':' || shs.s)) AS mh
            FROM shs CROSS JOIN generate_series(0, {N_PERMS - 1}) AS g(p)
            GROUP BY shs.doc_id, g.p
        ),
        bands AS (
            SELECT doc_id, CAST(p // {N_PERMS // N_BANDS} AS INT) AS band,
                   md5(string_agg(mh, '|' ORDER BY p)) AS sig
            FROM mins GROUP BY doc_id, p // {N_PERMS // N_BANDS}
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
        )
        SELECT c.doc_a, c.doc_b,
               round(len(list_intersect(sa.sh, sb.sh)) * 1.0
                     / len(list_distinct(list_concat(sa.sh, sb.sh))), 4) AS jaccard
        FROM cand c
        JOIN sh sa ON sa.doc_id = c.doc_a
        JOIN sh sb ON sb.doc_id = c.doc_b
        WHERE len(list_intersect(sa.sh, sb.sh)) * 1.0
              / len(list_distinct(list_concat(sa.sh, sb.sh))) >= {JACCARD_THRESHOLD}
    """,
)
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs (shingle -> 12-perm minhash -> 4 bands
    -> band-bucket equi-join -> exact-Jaccard verify at >= 0.8).

    The band join only compares docs that collide in >= 1 band — expected
    cost is proportional to true near-dup pairs, not n^2. The md5-string
    hash family is fixed and public, so the whole pipeline (not just row
    counts) is oracle-verified against an independent SQL implementation.
    """
    docs = table(spark, sf_dir, "documents")
    bands = minhash_bands(docs)
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.shingles").alias("sa"),
            F.col("b.shingles").alias("sb"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    jac = F.size(F.array_intersect("sa", "sb")) * 1.0 / F.size(F.array_union("sa", "sb"))
    return (
        pairs.select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"), jac.alias("_j"))
        .filter(F.col("_j") >= JACCARD_THRESHOLD)
        .drop("_j")
    )


def _hex4_to_int_sql(expr: str) -> str:
    """DuckDB: first-4-hex-chars-of-md5 -> 0..65535 via digit positions."""
    digits = [
        f"(instr('0123456789abcdef', substr({expr}, {i + 1}, 1)) - 1) * {16 ** (3 - i)}"
        for i in range(4)
    ]
    return "(" + " + ".join(digits) + ")"


def simhash16(toks: Column) -> Column:
    """16-bit SimHash over distinct tokens, as one codegen'd expression.

    Token hash = first 4 hex chars of md5 -> int via conv(); bit j of the
    signature is the sign of sum over tokens of (2*bit_j(hash) - 1).
    Engine-portable: the oracle rebuilds the identical integer from md5
    hex digits (DuckDB lacks conv(); instr-based digit arithmetic
    produces the same value)."""
    ints = F.transform(
        F.array_distinct(toks),
        lambda t: F.conv(F.substring(F.md5(t), 1, 4), 16, 10).cast("int"),
    )

    def bit_vote(j: int):
        # factory (not a default-arg lambda): pyspark HOF lambdas must
        # take only positional Column params
        return F.aggregate(
            ints,
            F.lit(0),
            lambda acc, d: acc + (F.shiftright(d, j).bitwiseAND(F.lit(1)) * 2 - 1),
        )

    sig = F.lit(0)
    for j in range(16):
        sig = sig + F.when(bit_vote(j) > 0, F.lit(2**j)).otherwise(F.lit(0))
    return sig


def _simhash_sql() -> str:
    h = _hex4_to_int_sql("substr(md5(t), 1, 4)")
    votes = " + ".join(
        f"(CASE WHEN list_sum(list_transform(ints, d -> 2 * ((d >> {j}) & 1) - 1)) > 0 "
        f"THEN {2**j} ELSE 0 END)"
        for j in range(16)
    )
    return f"""
        WITH ints_t AS (
            SELECT doc_id,
                   list_transform(list_distinct({_TOK}), t -> {h}) AS ints
            FROM documents
        ),
        sigs AS (SELECT doc_id, ({votes}) AS simhash FROM ints_t)
        SELECT doc_id, simhash,
               count(*) OVER (PARTITION BY simhash) AS n_bucket
        FROM sigs
    """


@query("dedup_simhash", oracle=_simhash_sql())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash bucketing: per-doc 16-bit signature + bucket population.
    Near-dup docs (small symmetric token difference) land in the same or
    Hamming-adjacent buckets; dedup is then a groupBy on the signature —
    one shuffle of 2-byte keys. (Production: 64-bit simhash + 4 rotated
    band tables for Hamming<=3; same plan shape.)"""
    docs = table(spark, sf_dir, "documents")
    from pyspark.sql.window import Window

    sigs = docs.select("doc_id", simhash16(tokens("text")).alias("simhash"))
    return sigs.withColumn("n_bucket", F.count(F.lit(1)).over(Window.partitionBy("simhash")))


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
        WITH toks AS (SELECT doc_id, {_TOK} AS toks FROM documents),
        sh AS (SELECT doc_id, unnest({_SHINGLES}) AS s FROM toks),
        cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT doc_a, doc_b,
               round(i * 1.0 / (ca.n + cb.n - i), 4) AS jaccard
        FROM inter
        JOIN cnt ca ON ca.doc_id = doc_a
        JOIN cnt cb ON cb.doc_id = doc_b
        WHERE i * 1.0 / (ca.n + cb.n - i) >= {JACCARD_THRESHOLD}
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard pairs via the inverted-index join: explode
    distinct shingles, self-join on shingle, count intersections, derive
    |union| = |A|+|B|-|A∩B|. No signatures — exact, but cost scales with
    shingle collisions; at 100 TB this is the verify stage AFTER LSH
    candidate generation (dedup_minhash), not the discovery stage."""
    docs = table(spark, sf_dir, "documents")
    sh = docs.select("doc_id", F.explode(word_shingles("text", 3)).alias("s"))
    cnt = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    ca = cnt.alias("ca")
    cb = cnt.alias("cb")
    jac = F.col("i") * 1.0 / (F.col("ca.n") + F.col("cb.n") - F.col("i"))
    return (
        inter.join(ca, F.col("doc_a") == F.col("ca.doc_id"))
        .join(cb, F.col("doc_b") == F.col("cb.doc_id"))
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


COSINE_THRESHOLD = 0.4


@query(
    "dedup_embedding",
    oracle=f"""
        WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
               round(list_cosine_similarity(a.v, b.v), 4) AS cos_sim
        FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.v, b.v) >= {COSINE_THRESHOLD}
    """,
)
def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked by `label` (the cluster
    id): the equi-join on the block key keeps pairwise work inside
    buckets — the same blocking trick as LSH bands, with the ANN index's
    cluster assignment as the band. Cosine is computed in double in
    array order (zip_with+aggregate) so it matches DuckDB bit-for-bit."""
    e = table(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    a = e.alias("a")
    b = e.alias("b")
    cos = cosine(F.col("a.embedding"), F.col("b.embedding"))
    return (
        a.join(b, (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.label").alias("label"),
            F.round(cos, 4).alias("cos_sim"),
            cos.alias("_c"),
        )
        .filter(F.col("_c") >= COSINE_THRESHOLD)
        .drop("_c")
    )
