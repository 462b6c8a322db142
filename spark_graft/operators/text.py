"""Text analysis for training-data pipelines: stats, token counting,
quality scoring, language-ID, fingerprinting, and the Arrow/pandas-UDF
tokenizer.

All pure-SQL variants stay in whole-stage codegen; the one pandas UDF
(udf_pandas_tokens) exists to exercise the Arrow-batched Python path and
is oracle-checked against the SQL tokenizer to prove equivalence.
At 100 TB these are all narrow per-row transforms — no shuffle except the
final small groupBys — so they scale linearly with input splits.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from spark_graft.functions import shingles_from_tokens, tokens
from spark_graft.registry import query
from spark_graft.sources import table

# DuckDB fragment equivalent to spark_graft.functions.tokens("text")
_TOK = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')"

STOPWORDS = {
    "en": ("the", "a", "and", "of", "to", "in", "is"),
    "es": ("el", "la", "de", "que", "y", "en"),
    "fr": ("le", "la", "et", "les", "des", "un"),
    "de": ("der", "die", "und", "das", "ist", "ein"),
}


@query(
    "text_stats",
    oracle=f"""
        SELECT lang,
               count(*) AS n_docs,
               round(sum(n_chars) * 1.0 / count(*), 4) AS avg_chars,
               round(sum(len({_TOK})) * 1.0 / count(*), 4) AS avg_tokens
        FROM documents
        GROUP BY lang
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus stats. Integer sums are exact -> deterministic
    averages via a single double division."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select("lang", "n_chars", F.size(tokens("text")).alias("n_tok"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.sum("n_chars") * 1.0 / F.count(F.lit(1)), 4).alias("avg_chars"),
            F.round(F.sum("n_tok") * 1.0 / F.count(F.lit(1)), 4).alias("avg_tokens"),
        )
    )


@query(
    "text_tokens",
    oracle=f"""
        SELECT doc_id,
               len({_TOK}) AS n_tokens,
               len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe_pieces
        FROM documents
    """,
)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace/alnum tokens and a BPE-ish
    piece count (letter runs, digit runs, single symbols) — the standard
    pre-tokenization used to budget LLM training tokens."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(tokens("text")).alias("n_tokens"),
        F.size(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0)
        ).alias("n_bpe_pieces"),
    )


def _sw_sql(lang: str) -> str:
    inlist = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter({_TOK}, t -> t IN ({inlist})))"


def stopword_count_cols(toks) -> dict[str, "F.Column"]:
    """{lang: count-of-lang-stopwords} expressions over a STAGED token
    array column (stage it as its own projection first — interpreted HOF
    lambdas re-evaluate inlined argument trees per reference). Shared by
    text_langid and the end-to-end corpus pipeline."""

    def stop_count(ws: tuple[str, ...]):
        arr = F.array([F.lit(w) for w in ws])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    return {lang: stop_count(ws).alias(f"c_{lang}") for lang, ws in STOPWORDS.items()}


@query(
    "text_quality",
    oracle=f"""
        SELECT doc_id,
               n_tokens,
               round(CASE WHEN n_tokens = 0 THEN 0.0
                          ELSE tok_chars * 1.0 / n_tokens END, 4) AS avg_token_len,
               round(CASE WHEN n_tokens = 0 THEN 0.0
                          ELSE n_stop * 1.0 / n_tokens END, 4) AS stopword_ratio,
               round(0.5 * least(n_tokens / 64.0, 1.0)
                     + 0.5 * least(CASE WHEN n_tokens = 0 THEN 0.0
                                        ELSE tok_chars * 1.0 / n_tokens END / 8.0, 1.0),
                     4) AS quality_score
        FROM (
            SELECT doc_id,
                   len({_TOK}) AS n_tokens,
                   list_sum(list_transform({_TOK}, t -> length(t))) AS tok_chars,
                   {_sw_sql('en')} AS n_stop
            FROM documents
        )
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality score: length saturation + mean token
    length (the classic Gopher/C4-style rule family), all in codegen'd
    array expressions."""
    docs = table(spark, sf_dir, "documents")
    # tokens staged once: the three measures below reference the array in
    # interpreted HOF lambdas, which re-evaluate inlined argument trees
    toks = F.col("toks")
    en = F.array([F.lit(w) for w in STOPWORDS["en"]])
    base = docs.select("doc_id", tokens("text").alias("toks")).select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.coalesce(
            F.aggregate(F.transform(toks, F.length), F.lit(0), lambda a, x: a + x), F.lit(0)
        ).alias("tok_chars"),
        F.size(F.filter(toks, lambda t: F.array_contains(en, t))).alias("n_stop"),
    )
    atl = F.when(F.col("n_tokens") == 0, 0.0).otherwise(
        F.col("tok_chars") * 1.0 / F.col("n_tokens")
    )
    return base.select(
        "doc_id",
        "n_tokens",
        F.round(atl, 4).alias("avg_token_len"),
        F.round(
            F.when(F.col("n_tokens") == 0, 0.0).otherwise(F.col("n_stop") * 1.0 / F.col("n_tokens")),
            4,
        ).alias("stopword_ratio"),
        F.round(
            0.5 * F.least(F.col("n_tokens") / 64.0, F.lit(1.0))
            + 0.5 * F.least(atl / 8.0, F.lit(1.0)),
            4,
        ).alias("quality_score"),
    )


@query(
    "text_langid",
    oracle=f"""
        SELECT doc_id,
               CASE WHEN c_en > 0 AND c_en >= greatest(c_es, c_fr, c_de) THEN 'en'
                    WHEN c_es > 0 AND c_es >= greatest(c_fr, c_de) THEN 'es'
                    WHEN c_fr > 0 AND c_fr >= c_de THEN 'fr'
                    WHEN c_de > 0 THEN 'de'
                    ELSE 'und' END AS predicted_lang
        FROM (
            SELECT doc_id,
                   {_sw_sql('en')} AS c_en,
                   {_sw_sql('es')} AS c_es,
                   {_sw_sql('fr')} AS c_fr,
                   {_sw_sql('de')} AS c_de
            FROM documents
        )
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language ID (deterministic n-gram heuristic with a
    fixed priority tie-break en>es>fr>de>und). Pure per-row array
    expressions — linear scan at any scale."""
    docs = table(spark, sf_dir, "documents")
    # staged: 4 filter-lambdas share one tokenize
    counts = stopword_count_cols(F.col("toks"))
    base = docs.select("doc_id", tokens("text").alias("toks")).select(
        "doc_id", *counts.values()
    )
    pred = (
        F.when(
            (F.col("c_en") > 0) & (F.col("c_en") >= F.greatest("c_es", "c_fr", "c_de")), "en"
        )
        .when((F.col("c_es") > 0) & (F.col("c_es") >= F.greatest("c_fr", "c_de")), "es")
        .when((F.col("c_fr") > 0) & (F.col("c_fr") >= F.col("c_de")), "fr")
        .when(F.col("c_de") > 0, "de")
        .otherwise("und")
    )
    return base.select("doc_id", pred.alias("predicted_lang"))


@query(
    "text_fingerprint",
    oracle=f"""
        SELECT doc_id,
               md5(coalesce(array_to_string({_TOK}, ' '), '')) AS content_fp,
               list_min(list_transform(
                   list_distinct(list_transform(
                       generate_series(1, greatest(len({_TOK}) - 2, 0)),
                       i -> {_TOK}[i] || ' ' || {_TOK}[i+1] || ' ' || {_TOK}[i+2])),
                   s -> md5(s))) AS min_shingle_fp
        FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over the token-normalized text
    (exact-dup key robust to whitespace/punctuation) plus the minimum
    word-3-gram hash (a 1-hash MinHash — winnowing's degenerate case).
    md5 is engine-portable, unlike Spark's murmur3 `hash()`.

    NULL text tokenizes to the EMPTY array (r17 NULL-hardening): the
    staged coalesce gives NULL-text docs content_fp = md5('') — the
    oracle's coalesce semantics — instead of Spark's md5(NULL) = NULL;
    min_shingle_fp stays NULL either way (no 3-gram exists)."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.coalesce(tokens("text"), F.array().cast("array<string>")).alias(
            "toks"
        ),
    ).select(
        "doc_id",
        F.md5(F.array_join("toks", " ")).alias("content_fp"),
        F.array_min(F.transform(shingles_from_tokens("toks", 3), F.md5)).alias(
            "min_shingle_fp"
        ),
    )


@query(
    "udf_pandas_tokens",
    oracle=f"SELECT doc_id, len({_TOK}) AS n_tokens FROM documents",
)
def udf_pandas_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched pandas UDF tokenizer, oracle-matched against the SQL
    tokenizer — the template for Python-side text ops (real BPE, model
    scoring) that can't be expressed in SQL. Vectorized per Arrow batch;
    never row-at-a-time Python.

    NULL text maps to NULL n_tokens (r18 NULL-hardening): the count
    goes through pandas' NULLABLE Int32 so a NULL input row emits an
    Arrow null instead of crashing the batch (plain ``astype("int32")``
    raises IntCastingNaNError on the NaN that ``.str.len()`` yields for
    None) — NULL-in/NULL-out is exactly the oracle's ``len(_TOK)`` and
    the SQL twin ``text_tokens``'s ``F.size(tokens(...))`` semantics."""

    @pandas_udf("int")
    def n_tokens(s: pd.Series) -> pd.Series:
        return s.str.lower().str.findall("[a-z0-9]+").str.len().astype("Int32")

    return table(spark, sf_dir, "documents").select(
        "doc_id", n_tokens("text").alias("n_tokens")
    )


EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
LONGNUM_RE = "[0-9]{6,}"


@query(
    "text_scrub",
    oracle=f"""
        SELECT doc_id,
               regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                              '{LONGNUM_RE}', '<NUM>', 'g') AS scrubbed,
               len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_emails,
               len(regexp_extract_all(text, '{LONGNUM_RE}')) AS n_longnums
        FROM documents
    """,
)
def text_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: replace email addresses and long digit runs with
    typed placeholders, and count what was removed (the audit trail a
    compliance pipeline needs). Pure regexp_replace — narrow, codegen'd,
    linear at any scale; the removal counts let downstream filters drop
    documents that were mostly PII."""
    docs = table(spark, sf_dir, "documents")
    scrub = F.regexp_replace(
        F.regexp_replace("text", EMAIL_RE, "<EMAIL>"), LONGNUM_RE, "<NUM>"
    )
    return docs.select(
        "doc_id",
        scrub.alias("scrubbed"),
        F.size(F.regexp_extract_all("text", F.lit(EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(LONGNUM_RE), 0)).alias("n_longnums"),
    )


SPLIT_PCT_TRAIN = 90
SPLIT_PCT_VAL = 5  # remainder = test


@query(
    "text_split",
    oracle=f"""
        WITH assigned AS (
            SELECT doc_id,
                   CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8))
                        AS BIGINT) % 100 AS bucket
            FROM documents
        )
        SELECT CASE WHEN bucket < {SPLIT_PCT_TRAIN} THEN 'train'
                    WHEN bucket < {SPLIT_PCT_TRAIN + SPLIT_PCT_VAL} THEN 'val'
                    ELSE 'test' END AS split,
               count(*) AS n_docs,
               min(doc_id) AS min_doc,
               max(doc_id) AS max_doc
        FROM assigned GROUP BY 1
    """,
)
def text_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split by content-stable hash — THE
    way to partition a training corpus: adding or re-ordering data never
    reassigns an existing document (no RNG, no global shuffle, no state),
    so splits stay stable across pipeline reruns and incremental loads.
    The md5-derived bucket is engine-portable (Spark's rand(seed) and
    xxhash64 are not), which is also what makes the assignment
    oracle-checkable rather than merely 'random-looking'."""
    docs = table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    split = (
        F.when(bucket < SPLIT_PCT_TRAIN, "train")
        .when(bucket < SPLIT_PCT_TRAIN + SPLIT_PCT_VAL, "val")
        .otherwise("test")
    )
    return (
        docs.select("doc_id", split.alias("split"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


@query(
    "text_repetition",
    oracle=f"""
        WITH t AS (SELECT doc_id, unnest({_TOK}) AS tok FROM documents),
        c AS (SELECT doc_id, tok, count(*) AS n FROM t GROUP BY doc_id, tok)
        SELECT doc_id,
               CAST(sum(n) AS BIGINT) AS n_tokens,
               count(*) AS n_distinct,
               round(count(*) * 1.0 / sum(n), 4) AS distinct_ratio,
               round(max(n) * 1.0 / sum(n), 4) AS top_token_frac
        FROM c GROUP BY doc_id
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition signals (the Gopher repetition-filter family):
    distinct-token ratio and the most-frequent-token fraction per doc —
    high top_token_frac / low distinct_ratio flags boilerplate and
    degenerate pages for removal before training.

    Shaped as explode -> two-stage aggregation on (doc_id, token) keys
    rather than per-row HOF scans: the mode-of-tokens via array lambdas
    is O(distinct x length) PER ROW, quadratic for long repetitive
    documents — exactly the documents this filter exists to catch. The
    keyed aggregate is linear, partial-aggregated map-side, and its key
    cardinality is bounded by document length, so no hot keys at any
    corpus size. Token-less docs drop out of the explode on both the
    Spark and oracle sides."""
    docs = table(spark, sf_dir, "documents")
    per_tok = (
        docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return per_tok.groupBy("doc_id").agg(
        F.sum("n").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.round(F.count(F.lit(1)) * 1.0 / F.sum("n"), 4).alias("distinct_ratio"),
        F.round(F.max("n") * 1.0 / F.sum("n"), 4).alias("top_token_frac"),
    )


# -------------------------------------------------------- text_diversity

DIVERSITY_SCALE = 1000000  # fixed-point scale for the Simpson index


@query(
    "text_diversity",
    oracle=f"""
        WITH tf AS (
            SELECT doc_id, count(*) AS c
            FROM (SELECT doc_id, unnest({_TOK}) AS term FROM documents)
            GROUP BY doc_id, term
        ),
        per_doc AS (
            SELECT doc_id,
                   CAST(sum(c) AS BIGINT) AS n,
                   CAST(sum(c * c) AS BIGINT) AS ssq
            FROM tf GROUP BY doc_id
        )
        SELECT doc_id,
               n AS n_tokens,
               (ssq * {DIVERSITY_SCALE}) // (n * n) AS simpson_fx,
               round(CAST(n * n AS DOUBLE) / CAST(ssq AS DOUBLE), 4)
                   AS eff_tokens
        FROM per_doc
    """,
)
def text_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-2 Rényi diversity per document: the Simpson index
    sum(p_i^2) (probability two sampled tokens collide) and its inverse,
    the EFFECTIVE vocabulary size. This is the log-free entropy — Shannon
    entropy needs log2, a transcendental the cross-engine hash gate
    cannot bind (JVM StrictMath vs libm differ in the last ulp), while
    Rényi-2 is a ratio of integer sums: simpson_fx = (sum(c^2) * SCALE)
    div n^2 exactly, eff_tokens = n^2 / sum(c^2) as one deterministic
    int64->double division. Low eff_tokens relative to n_tokens flags
    degenerate/boilerplate pages the same way a perplexity filter would,
    without a model. Complements text_repetition's mode statistics
    (top_token_frac is the L-inf view; Simpson is the L2 view, sensitive
    to the WHOLE distribution, not just the top token).

    int64 headroom: sum(c^2) <= n^2, so the scaled numerator is <=
    n^2 * 10^6 — safe for documents up to ~3M tokens, a per-document
    bound that does not grow with corpus size. Plan shape: same
    (doc_id, token) keyed aggregation as text_repetition (linear,
    map-side partials, key cardinality bounded by doc length), then a
    per-doc collapse; token-less docs drop out of the explode on both
    engines."""
    docs = table(spark, sf_dir, "documents")
    per_tok = (
        docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_doc = per_tok.groupBy("doc_id").agg(
        F.sum("c").alias("n"), F.sum(F.col("c") * F.col("c")).alias("ssq")
    )
    return per_doc.select(
        "doc_id",
        F.col("n").alias("n_tokens"),
        F.expr(f"(ssq * {DIVERSITY_SCALE}) div (n * n)").alias("simpson_fx"),
        F.round(
            (F.col("n") * F.col("n")).cast("double") / F.col("ssq").cast("double"), 4
        ).alias("eff_tokens"),
    )


TFIDF_TOP_K = 3
TFIDF_SCALE = 1000000  # fixed-point idf scale


@query(
    "text_tfidf",
    oracle=f"""
        WITH tf AS (
            SELECT doc_id, term, count(*) AS tf
            FROM (SELECT doc_id, unnest({_TOK}) AS term FROM documents)
            GROUP BY doc_id, term
        ),
        n AS (SELECT count(*) AS n_docs FROM documents),
        scored AS (
            SELECT doc_id, term, tf,
                   count(*) OVER (PARTITION BY term) AS df,
                   CAST((tf * {TFIDF_SCALE} * (SELECT n_docs FROM n))
                        // count(*) OVER (PARTITION BY term) AS BIGINT) AS score_fx
            FROM tf
        )
        SELECT doc_id, term, tf, df, score_fx
        FROM (
            SELECT *, row_number() OVER (PARTITION BY doc_id
                                         ORDER BY score_fx DESC, term) AS rk
            FROM scored
        ) WHERE rk <= {TFIDF_TOP_K}
    """,
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TFIDF_TOP_K} salient terms per document by tf-idf with a
    LOG-FREE idf (score = tf * N/df, fixed-point integer): the log in
    classic idf is monotone, so per-document top-k ranking only changes
    where two terms' scores cross — and a float log cannot be hash-gated
    cross-engine (libm ulp differences flip ranks precisely when scores
    tie mathematically, e.g. 2*ln(5) vs ln(25)). Integer scoring makes
    the ranking — and the hash — exact everywhere; ties break on term.

    Shape: explode -> keyed (doc_id, term) count with map-side partials,
    document frequency as a second PARTIAL-AGGREGATED groupBy over the
    tf table joined back on term — the same df derivation as text_bm25
    (text.py) and dedup_containment's freq table. NOT a count window
    over term: WindowExec gets no partial aggregation and no AQE skew
    handling, so the hottest term — a stopword with df ~ n_docs — would
    funnel its entire row set into ONE task at 100 TB. The groupBy form
    combines map-side (each task emits one row per local term), the df
    table is vocabulary-bounded, and AQE broadcasts it into the join.
    Then the top-k window per doc_id — Spark plans the rank filter as
    WindowGroupLimit, so only {TFIDF_TOP_K} rows per doc survive the
    final shuffle's map side. The corpus size N is the single
    driver-side scalar. At 100 TB the tf table is the thing to persist,
    since tf, df, and top-k all derive from it in one lineage."""
    from pyspark.sql.window import Window

    docs = table(spark, sf_dir, "documents")
    n_docs = docs.count()  # scalar-only driver traffic
    tf = (
        docs.select("doc_id", F.explode(tokens("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(dft, "term").withColumn(
        "score_fx", F.expr(f"(tf * CAST({TFIDF_SCALE * n_docs} AS BIGINT)) div df")
    )
    rk = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.desc("score_fx"), F.asc("term"))
    )
    return (
        scored.withColumn("rk", rk)
        .filter(F.col("rk") <= TFIDF_TOP_K)
        .select("doc_id", "term", "tf", "df", "score_fx")
    )


# ------------------------------------------------------------------ text_bm25

BM25_TOP_DOCS = 10
# query = the terms ranked 10..12 by document frequency (mid-frequency:
# below the stopword-like plateau, above the hapax tail) — derived from
# the corpus itself so the whole contract is oracle-checkable.
BM25_QRANK_LO, BM25_QRANK_HI = 10, 12
BM25_SCALE = 10_000  # fixed-point scale for tf-saturation and idf
BM25_AVGDL_SCALE = 1000  # fixed-point scale for the avgdl scalar


@query(
    "text_bm25",
    oracle=f"""
        WITH toks AS (SELECT doc_id, {_TOK} AS ts FROM documents),
        stats AS (SELECT count(*) AS n_docs,
                         coalesce(sum(len(ts)), 0) AS total_toks FROM toks),
        dl AS (SELECT doc_id, len(ts) AS dl FROM toks),
        tf AS (
            SELECT doc_id, term, count(*) AS tf
            FROM (SELECT doc_id, unnest(ts) AS term FROM toks)
            GROUP BY doc_id, term
        ),
        dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        qterms AS (
            SELECT term, df FROM dft
            ORDER BY df DESC, term
            LIMIT {BM25_QRANK_HI - BM25_QRANK_LO + 1} OFFSET {BM25_QRANK_LO - 1}
        ),
        avgdl AS (
            SELECT (total_toks * {BM25_AVGDL_SCALE}) // n_docs AS avgdl_fx,
                   n_docs
            FROM stats WHERE n_docs > 0
        ),
        scored AS (
            SELECT t.doc_id,
                   ((22 * t.tf * a.avgdl_fx * {BM25_SCALE})
                    // (10 * t.tf * a.avgdl_fx + 3 * a.avgdl_fx + 9000 * d.dl)
                   ) AS tf_sat_fx,
                   ((a.n_docs * {BM25_SCALE}) // q.df) AS idf_fx
            FROM tf t
            JOIN qterms q USING (term)
            JOIN dl d USING (doc_id)
            CROSS JOIN avgdl a
        )
        SELECT doc_id,
               count(*) AS n_terms_matched,
               CAST(sum((tf_sat_fx * idf_fx) // {BM25_SCALE}) AS BIGINT) AS score_fx
        FROM scored
        GROUP BY doc_id
        ORDER BY score_fx DESC, doc_id
        LIMIT {BM25_TOP_DOCS}
    """,
)
def text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{BM25_TOP_DOCS} documents by BM25 (Robertson-Sparck Jones,
    k1=1.2 b=0.75) for a corpus-derived query (the terms df-ranked
    {BM25_QRANK_LO}..{BM25_QRANK_HI}) — ranked retrieval, the relevance
    counterpart to text_tfidf's per-doc salience.

    Fixed-point contract (same reasoning as text_tfidf's log-free idf:
    float transcendentals cannot be hash-gated cross-engine):
      avgdl_fx   = (total_tokens * {BM25_AVGDL_SCALE}) div n_docs — the
                   corpus scalar BOTH engines use as-floored, so it is
                   part of the spec, not an approximation of one;
      tf_sat     = tf*(k1+1) / (tf + k1*(1-b) + k1*b*dl/avgdl), which
                   multiplied through by 10*avgdl_fx is exactly
                   (22*tf*avgdl_fx) / (10*tf*avgdl_fx + 3*avgdl_fx
                   + 9000*dl) — integer numerator and denominator;
      idf_fx     = (n_docs * {BM25_SCALE}) div df, the log-free rarity
                   weight (monotone where BM25's log-idf is monotone);
      score_fx   = sum over query terms of (tf_sat_fx*idf_fx) div
                   {BM25_SCALE}.
    All operands nonneg so Spark's `div` (truncate) == DuckDB's `//`
    (floor). int64 headroom: tf_sat_fx <= 2.2*{BM25_SCALE}; the product
    before the final div is <= 2.2e4 * n_docs * {BM25_SCALE} / df, safe
    through n_docs ~ 4e10 even for df=1; the tf_sat numerator
    22*tf*avgdl_fx*{BM25_SCALE} stays < 2^63 for dl, avgdl up to ~1e5
    tokens. Bounds are corpus-shape, not corpus-size: nothing here
    grows with row count except n_docs, which has 9 orders of headroom.

    Plan shape: tokens staged once; (doc_id,term) tf with map-side
    partials; df from tf (vocab-bounded); the query terms come off a
    TakeOrderedAndProject (top-{BM25_QRANK_HI} rows, O(1) driver data)
    and return as a 3-row broadcast join, so scoring touches only the
    matching tf rows; dl joins on the doc_id partitioning the tf
    aggregation already established; final answer is one
    TakeOrderedAndProject. At 100 TB the tf table is the reusable
    asset (tf, df, tfidf, and BM25 all derive from it)."""
    docs = table(spark, sf_dir, "documents")
    base = docs.select("doc_id", tokens("text").alias("ts"))
    stats = base.agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.size("ts")).alias("t")
    ).collect()[0]
    n_docs, total_toks = stats["n"], stats["t"] or 0
    empty_schema = "doc_id bigint, n_terms_matched bigint, score_fx bigint"
    if n_docs == 0:
        return spark.createDataFrame([], empty_schema)
    avgdl_fx = (total_toks * BM25_AVGDL_SCALE) // n_docs

    dl = base.select("doc_id", F.size("ts").cast("bigint").alias("dl"))
    tf = (
        base.select("doc_id", F.explode("ts").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qrows = (
        dft.orderBy(F.desc("df"), F.asc("term"))
        .limit(BM25_QRANK_HI)
        .collect()[BM25_QRANK_LO - 1 :]
    )
    if not qrows:
        return spark.createDataFrame([], empty_schema)
    qterms = F.broadcast(
        spark.createDataFrame(
            [(r["term"], r["df"]) for r in qrows], "term string, df bigint"
        )
    )
    scored = (
        tf.join(qterms, "term")
        .join(dl, "doc_id")
        .withColumn(
            "tf_sat_fx",
            F.expr(
                f"(22 * tf * {avgdl_fx} * {BM25_SCALE}) div "
                f"(10 * tf * {avgdl_fx} + 3 * {avgdl_fx} + 9000 * dl)"
            ),
        )
        .withColumn("idf_fx", F.expr(f"(CAST({n_docs} AS BIGINT) * {BM25_SCALE}) div df"))
    )
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_terms_matched"),
        F.sum(F.expr(f"(tf_sat_fx * idf_fx) div {BM25_SCALE}")).alias("score_fx"),
    )
    return agg.orderBy(F.desc("score_fx"), F.asc("doc_id")).limit(BM25_TOP_DOCS)


# parts-per-million scale for the integer-exact transition probability:
# p(nxt|head) is carried as (1e6 * n) div nh, so the per-doc aggregate
# is a sum of exact integers in both engines (never a float sum, whose
# partition-order non-associativity would break the cross-engine hash).
LM_PPM = 1_000_000


@query(
    "text_lm_score",
    oracle=f"""
        WITH toks AS (SELECT doc_id, {_TOK} AS ts FROM documents),
        pairs AS (
            SELECT doc_id, ts[i] AS head, ts[i + 1] AS nxt
            FROM toks, unnest(generate_series(1, len(ts) - 1)) AS u(i)
        ),
        counted AS (
            SELECT head, nxt, count(*) AS n FROM pairs GROUP BY head, nxt
        ),
        tot AS (
            SELECT head, CAST(sum(n) AS BIGINT) AS nh FROM counted GROUP BY head
        )
        SELECT p.doc_id,
               count(*) AS n_bigrams,
               round(sum(({LM_PPM} * c.n) // t.nh) * 1.0 / count(*), 4)
                   AS avg_p_ppm,
               CAST(min(({LM_PPM} * c.n) // t.nh) AS BIGINT) AS min_p_ppm
        FROM pairs p
        JOIN counted c ON c.head = p.head AND c.nxt = p.nxt
        JOIN tot t ON t.head = p.head
        GROUP BY p.doc_id
    """,
)
def text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-based LM quality score (the CCNet idea with the corpus
    itself as the LM): score every document by the average — and the
    worst — transition probability of its token bigrams under the
    corpus bigram model. Garbage/shuffled text has improbable
    transitions and scores low; repeated boilerplate scores high; both
    tails are exactly what a curation pipeline filters or reweights
    (compose with sample_importance). Trained and applied in one query
    because the corpus IS the training set here; in production the
    counted/tot tables are the persisted LM asset and scoring is just
    the two joins.

    Determinism: p(nxt|head) is carried as the INTEGER (1e6*n) div nh —
    a float sum over doubles would be partition-order dependent and
    break the cross-engine hash; the integer sum is exact (max 1e6 per
    bigram * doc length — no overflow headroom issues), with ONE double
    division at the end. Scale shape: bigram counts and head totals are
    vocab-bounded aggregates; scoring shuffles doc bigrams once on
    (head, nxt) and once on head — AQE broadcasts the count tables when
    they fit (vocabularies usually do), collapsing both joins to
    map-side. Docs with < 2 tokens have no bigrams and no row, exactly
    like the oracle's inner joins."""
    docs = table(spark, sf_dir, "documents")
    base = docs.select("doc_id", tokens("text").alias("ts"))
    pairs = base.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("ts") < 2,
                F.array().cast("array<struct<head:string,nxt:string>>"),
            ).otherwise(
                F.transform(
                    F.sequence(F.lit(1), F.size("ts") - 1),
                    lambda i: F.struct(
                        F.element_at("ts", i).alias("head"),
                        F.element_at("ts", i + F.lit(1)).alias("nxt"),
                    ),
                )
            )
        ).alias("p"),
    ).select("doc_id", "p.head", "p.nxt")
    counted = pairs.groupBy("head", "nxt").agg(F.count(F.lit(1)).alias("n"))
    tot = counted.groupBy("head").agg(F.sum("n").cast("bigint").alias("nh"))
    ppm = F.expr(f"({LM_PPM} * n) div nh")
    scored = pairs.join(counted, ["head", "nxt"]).join(tot, "head")
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.sum(ppm) * 1.0 / F.count(F.lit(1)), 4).alias("avg_p_ppm"),
        F.min(ppm).cast("bigint").alias("min_p_ppm"),
    )


# -------------------------------------------------- pipeline_gopher_rules

# Gopher-style rule thresholds (Rae et al. 2021 §A1.1, rescaled to the
# synthetic corpus's token range the way Dolma rescales them per source).
# All bounds are applied as INTEGER comparisons — 2*n <= chars <= 12*n,
# 5*alpha >= 4*n — so both engines decide every rule with exact int64
# arithmetic, no float threshold to disagree on.
GOPHER_MIN_TOKENS = 5
GOPHER_MAX_TOKENS = 100_000
GOPHER_MWL_LO = 2  # mean word length lower bound
GOPHER_MWL_HI = 12  # upper bound
GOPHER_ALPHA_NUM, GOPHER_ALPHA_DEN = 4, 5  # >= 80% alphabetic tokens
GOPHER_MIN_STOPWORDS = 2


@query(
    "pipeline_gopher_rules",
    oracle=f"""
        WITH feat AS (
            SELECT doc_id,
                   len(toks) AS n_tokens,
                   coalesce(list_sum(list_transform(toks, t -> length(t))), 0)
                       AS tok_chars,
                   len(list_filter(toks, t -> NOT regexp_matches(t, '[0-9]')))
                       AS n_alpha,
                   len(list_filter(toks, t -> t IN
                       ({", ".join(f"'{w}'" for w in STOPWORDS["en"])})))
                       AS n_stop
            FROM (SELECT doc_id, {_TOK} AS toks FROM documents)
        )
        SELECT doc_id, n_tokens,
               (n_tokens BETWEEN {GOPHER_MIN_TOKENS} AND {GOPHER_MAX_TOKENS})
                   AS r_word_count,
               (n_tokens > 0 AND {GOPHER_MWL_LO} * n_tokens <= tok_chars
                             AND tok_chars <= {GOPHER_MWL_HI} * n_tokens)
                   AS r_mean_word_len,
               (n_tokens > 0 AND {GOPHER_ALPHA_DEN} * n_alpha
                                 >= {GOPHER_ALPHA_NUM} * n_tokens)
                   AS r_alpha_ratio,
               (n_stop >= {GOPHER_MIN_STOPWORDS}) AS r_stopwords,
               4 - (CAST((n_tokens BETWEEN {GOPHER_MIN_TOKENS} AND {GOPHER_MAX_TOKENS}) AS INT)
                    + CAST((n_tokens > 0 AND {GOPHER_MWL_LO} * n_tokens <= tok_chars
                                         AND tok_chars <= {GOPHER_MWL_HI} * n_tokens) AS INT)
                    + CAST((n_tokens > 0 AND {GOPHER_ALPHA_DEN} * n_alpha
                                             >= {GOPHER_ALPHA_NUM} * n_tokens) AS INT)
                    + CAST((n_stop >= {GOPHER_MIN_STOPWORDS}) AS INT)) AS n_fail,
               ((n_tokens BETWEEN {GOPHER_MIN_TOKENS} AND {GOPHER_MAX_TOKENS})
                AND (n_tokens > 0 AND {GOPHER_MWL_LO} * n_tokens <= tok_chars
                                  AND tok_chars <= {GOPHER_MWL_HI} * n_tokens)
                AND (n_tokens > 0 AND {GOPHER_ALPHA_DEN} * n_alpha
                                      >= {GOPHER_ALPHA_NUM} * n_tokens)
                AND (n_stop >= {GOPHER_MIN_STOPWORDS})) AS keep
        FROM feat
    """,
)
def pipeline_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NAMED Gopher quality-rule battery with per-rule flags — what
    a curation run actually ships, as opposed to text_quality's scalar
    score: each document gets a boolean per rule (token-count bounds,
    mean-word-length bounds, >= 80% alphabetic tokens, >= 2 English
    stopwords), a failed-rule count, and the final keep decision, so
    downstream dashboards can attribute REMOVAL REASONS instead of
    just measuring survival. (The repetition rule lives in
    text_repetition; Dolma splits the battery the same way.)

    Every rule is an integer comparison over four staged token
    aggregates — zero shuffles, pure WholeStageCodegen map stage, the
    same per-row cost at 100 TB as at sf0.01. Tokens staged once as a
    projection (interpreted HOF lambdas re-evaluate inlined argument
    trees per reference — the text_quality lesson). The battery itself
    lives in `gopher_rule_frame` (r16), shared verbatim with the
    score-on-ingest twin `streaming.gopher_rules_stream` — the
    quality_score_stream batch/stream composition pattern."""
    return gopher_rule_frame(table(spark, sf_dir, "documents"))


def gopher_rule_frame(docs: DataFrame) -> DataFrame:
    """The Gopher rule battery over any (doc_id, text, ...) frame —
    batch table or ingest stream: pure narrow codegen expressions,
    no shuffle, no state, so it binds to a streaming source unchanged
    (append mode). See pipeline_gopher_rules for the rule semantics."""
    toks = F.col("toks")
    en = F.array([F.lit(w) for w in STOPWORDS["en"]])
    feat = docs.select("doc_id", tokens("text").alias("toks")).select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.coalesce(
            F.aggregate(F.transform(toks, F.length), F.lit(0), lambda a, x: a + x),
            F.lit(0),
        ).alias("tok_chars"),
        F.size(F.filter(toks, lambda t: ~t.rlike("[0-9]"))).alias("n_alpha"),
        F.size(F.filter(toks, lambda t: F.array_contains(en, t))).alias("n_stop"),
    )
    r_wc = F.col("n_tokens").between(GOPHER_MIN_TOKENS, GOPHER_MAX_TOKENS)
    r_mwl = (
        (F.col("n_tokens") > 0)
        & (GOPHER_MWL_LO * F.col("n_tokens") <= F.col("tok_chars"))
        & (F.col("tok_chars") <= GOPHER_MWL_HI * F.col("n_tokens"))
    )
    r_alpha = (F.col("n_tokens") > 0) & (
        GOPHER_ALPHA_DEN * F.col("n_alpha")
        >= GOPHER_ALPHA_NUM * F.col("n_tokens")
    )
    r_stop = F.col("n_stop") >= GOPHER_MIN_STOPWORDS
    n_fail = F.lit(4) - (
        r_wc.cast("int") + r_mwl.cast("int") + r_alpha.cast("int")
        + r_stop.cast("int")
    )
    return feat.select(
        "doc_id",
        "n_tokens",
        r_wc.alias("r_word_count"),
        r_mwl.alias("r_mean_word_len"),
        r_alpha.alias("r_alpha_ratio"),
        r_stop.alias("r_stopwords"),
        n_fail.alias("n_fail"),
        (r_wc & r_mwl & r_alpha & r_stop).alias("keep"),
    )


# --------------------------------------------------- text_hash_features

FEATURE_DIM = 16  # hashed feature-vector dimensionality


@query(
    "text_hash_features",
    oracle=f"""
        SELECT doc_id,
               CAST(CAST(('0x' || substr(md5('fh:' || term), 1, 8)) AS BIGINT)
                    % {FEATURE_DIM} AS INT) AS dim,
               CAST(sum(CASE WHEN CAST(('0x' || substr(md5('fh:' || term), 9, 1))
                                  AS BIGINT) % 2 = 0 THEN c ELSE -c END)
                    AS BIGINT) AS weight
        FROM (
            SELECT doc_id, term, count(*) AS c
            FROM (SELECT doc_id, unnest({_TOK}) AS term FROM documents)
            GROUP BY doc_id, term
        )
        GROUP BY 1, 2
        HAVING sum(CASE WHEN CAST(('0x' || substr(md5('fh:' || term), 9, 1))
                             AS BIGINT) % 2 = 0 THEN c ELSE -c END) <> 0
    """,
)
def text_hash_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (Weinberger et al. 2009): each document's
    token counts folded into a FIXED {FEATURE_DIM}-dim signed feature
    vector — dim = md5(term) mod D, sign = md5's 9th hex digit parity —
    emitted in sparse long form (doc_id, dim, weight), zero rows
    dropped. This is THE unbounded-vocabulary featurizer: no vocabulary
    table to build, ship, or version, so feature extraction over 100 TB
    is vocabulary-free and append-stable (a new term never reshapes
    existing features, unlike a fitted CountVectorizer). The signed
    fold keeps collisions unbiased (E[collision contribution] = 0),
    which is what makes the trick usable for linear models —
    quality_classifier's feature set is the hand-picked alternative.

    Scale shape: one (doc_id, term) aggregate then one (doc_id, dim)
    aggregate, both with map-side partials; everything after
    tokenization shuffles (8-byte id, int, int) triples. Output is at
    most {FEATURE_DIM} rows per doc regardless of vocabulary."""
    docs = table(spark, sf_dir, "documents")
    terms = docs.select(
        "doc_id", F.explode(tokens("text")).alias("term")
    ).groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("c"))
    dg = F.md5(F.concat(F.lit("fh:"), F.col("term")))
    dim = (
        F.conv(F.substring(dg, 1, 8), 16, 10).cast("bigint") % FEATURE_DIM
    ).cast("int")
    sign_pos = F.conv(F.substring(dg, 9, 1), 16, 10).cast("bigint") % 2 == 0
    signed = F.when(sign_pos, F.col("c")).otherwise(-F.col("c"))
    return (
        terms.select("doc_id", dim.alias("dim"), signed.alias("w"))
        .groupBy("doc_id", "dim")
        .agg(F.sum("w").alias("weight"))
        .filter(F.col("weight") != 0)
    )


# --------------------------------------------------------------- topk_terms

TOPK_TERMS_K = 10  # = streaming.structured.TOPK_EMIT, the stream twin


@query(
    "topk_terms",
    oracle=f"""
        SELECT source, rank, term, n FROM (
            SELECT source, term, n,
                   row_number() OVER (
                       PARTITION BY source ORDER BY n DESC, term
                   ) AS rank
            FROM (
                SELECT source, term, count(*) AS n
                FROM (SELECT source, unnest({_TOK}) AS term FROM documents)
                GROUP BY source, term
            )
        ) WHERE rank <= {TOPK_TERMS_K}
    """,
)
def topk_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-source top-{TOPK_TERMS_K} terms — the batch twin (and
    exact ground truth) of the streaming space-saving `topk_stream`:
    same emission shape (source, rank, term, count), deterministic
    ties by term. word_count is the corpus-wide count table; this is
    the per-stratum TOP-K SET a source dashboard shows.

    Scale shape: one (source, term) aggregate with map-side partials,
    then the rank filter plans as WindowGroupLimit — a map-side
    per-partition top-K under each source BEFORE the exchange, so a
    hot source costs O(partitions x K) in the window stage, never its
    full vocabulary (the sample_reservoir contract on a different
    key). The window reads the COLLAPSED (source, term) table, not
    raw token rows."""
    from pyspark.sql.window import Window

    docs = table(spark, sf_dir, "documents")
    counts = (
        docs.select("source", F.explode(tokens("text")).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("source").orderBy(F.desc("n"), "term")
    return counts.select(
        "source", F.row_number().over(w).alias("rank"), "term", "n"
    ).filter(F.col("rank") <= TOPK_TERMS_K)
