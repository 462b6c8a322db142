"""Training-schedule operators: curriculum bucketing and preference-pair
mining — the operators that turn a scored corpus into a training PLAN.

Both are exact-integer contracts over the same staged token projection
the text family uses, shaped for 100 TB: global quantile thresholds come
from a histogram-then-window pass over DISTINCT values (never raw rows),
and per-stratum rank selections plan as map-side WindowGroupLimit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_graft.functions import tokens
from spark_graft.operators.text import _TOK, DIVERSITY_SCALE
from spark_graft.registry import query
from spark_graft.sources import table

# ------------------------------------------------------ pipeline_curriculum

CURRICULUM_STAGES = 4  # quartile stages: short -> long


@query(
    "pipeline_curriculum",
    oracle=f"""
        WITH lens AS (SELECT doc_id, coalesce(len({_TOK}), 0) AS n_tokens
                      FROM documents),
        hist AS (SELECT n_tokens, count(*) AS c FROM lens GROUP BY n_tokens),
        cum AS (
            SELECT n_tokens,
                   CAST(sum(c) OVER (ORDER BY n_tokens
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS cum_c,
                   CAST(sum(c) OVER () AS BIGINT) AS n_total
            FROM hist
        ),
        stages AS (
            SELECT n_tokens,
                   ({CURRICULUM_STAGES} * cum_c + n_total - 1) // n_total AS stage
            FROM cum
        )
        SELECT l.doc_id, l.n_tokens, s.stage
        FROM lens l JOIN stages s USING (n_tokens)
    """,
)
def pipeline_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-based curriculum bucketing (the classic short-to-long
    training schedule): every document is assigned a stage 1..4 by which
    QUARTILE of the corpus length distribution it falls in, so a
    training run can feed stage 1 first and anneal upward. stage(v) =
    ceil(STAGES * cum(v) / n_total) where cum(v) = docs with n_tokens
    <= v — exact int64 arithmetic ((S*cum + n - 1) div n), no float
    quantile to disagree on, and the stage function is monotone in
    length by construction.

    Scale shape (the r12 window-df lesson, same as
    agg_weighted_quantile): the cumulative window runs over the
    DISTINCT-length histogram — cardinality bounded by max document
    length, not corpus size — and the stage map joins back to documents
    as a broadcast-sized dimension. The corpus-scale work is one
    groupBy(n_tokens) with map-side partials plus a narrow join; raw
    rows never enter a window. (The single-partition window over the
    histogram is the bounded-cardinality exception, same justification
    as mixture_weights.)

    NULL text counts as ZERO tokens (r18 NULL-hardening): without the
    coalesce a NULL-text doc yields n_tokens = NULL, which silently
    DROPS from both engines' equi-joins while also shifting every stage
    boundary differently (Spark windows order NULLS FIRST, DuckDB NULLS
    LAST, so the NULL histogram row's count lands on opposite ends of
    the cumulative sum). No-content docs belong in the shortest-length
    stage with the empty-text docs — same class, stage 1."""
    docs = table(spark, sf_dir, "documents")
    lens = docs.select(
        "doc_id",
        # coalesce the ARRAY, not size()'s result: size(NULL) is -1
        # under spark.sql.legacy.sizeOfNull, so the array-level
        # coalesce is the config-independent zero
        F.size(
            F.coalesce(tokens("text"), F.array().cast("array<string>"))
        ).alias("n_tokens"),
    )
    hist = lens.groupBy("n_tokens").agg(F.count(F.lit(1)).alias("c"))
    wcum = Window.orderBy("n_tokens").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    stages = hist.select(
        "n_tokens",
        F.sum("c").over(wcum).alias("cum_c"),
        F.sum("c").over(wall).alias("n_total"),
    ).select(
        "n_tokens",
        F.expr(
            f"({CURRICULUM_STAGES} * cum_c + n_total - 1) div n_total"
        ).alias("stage"),
    )
    return lens.join(F.broadcast(stages), "n_tokens").select(
        "doc_id", "n_tokens", "stage"
    )


# ------------------------------------------------ pipeline_preference_pairs

PREF_PAIRS_PER_SOURCE = 5
# chosen/rejected signal: the Simpson index (text_diversity's integer
# contract — DIVERSITY_SCALE imported so the two queries can never
# silently diverge) — most-diverse docs are "chosen", most-repetitive
# "rejected"
_SIMPSON_SQL = f"""
        SELECT doc_id, source,
               (CAST(sum(c * c) AS BIGINT) * {DIVERSITY_SCALE})
               // (CAST(sum(c) AS BIGINT) * CAST(sum(c) AS BIGINT)) AS simpson_fx
        FROM (
            SELECT doc_id, source, count(*) AS c
            FROM (SELECT doc_id, source, unnest({_TOK}) AS term FROM documents)
            GROUP BY doc_id, source, term
        )
        GROUP BY doc_id, source
"""


@query(
    "pipeline_preference_pairs",
    oracle=f"""
        WITH scored AS ({_SIMPSON_SQL}),
        best AS (
            SELECT source, doc_id, simpson_fx,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY simpson_fx, doc_id) AS rk
            FROM scored
        ),
        worst AS (
            SELECT source, doc_id, simpson_fx,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY simpson_fx DESC, doc_id DESC) AS rk
            FROM scored
        )
        SELECT b.source, b.rk AS pair_rank,
               b.doc_id AS chosen_id, w.doc_id AS rejected_id,
               w.simpson_fx - b.simpson_fx AS gap_fx
        FROM best b JOIN worst w ON b.source = w.source AND b.rk = w.rk
        WHERE b.rk <= {PREF_PAIRS_PER_SOURCE}
          AND w.simpson_fx > b.simpson_fx
    """,
)
def pipeline_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair mining — construct (chosen, rejected) document
    pairs per source for preference-model / DPO-style training data:
    pair the K most-diverse documents (lowest Simpson index, see
    text_diversity) with the K most-repetitive ones (highest), matched
    by rank, keeping only pairs with a strictly positive quality gap.
    The signal is text_diversity's integer simpson_fx, so the pairing —
    and the gap — is exact int64 end to end; ranks tie-break on doc_id
    (ascending on the chosen leg, descending on the rejected leg, so a
    tied middle never pairs a document with itself at odds of a
    zero gap — the strict gap_fx > 0 filter drops those outright).

    Scale shape: both rank selections are row_number <= K filters, which
    plan as map-side WindowGroupLimit per source (each input partition
    ships at most K rows per stratum, the sample_reservoir contract);
    the pair join is K rows per source on both sides. The corpus-scale
    work is the (doc_id, term) aggregation, shared shape with
    text_diversity/text_repetition."""
    docs = table(spark, sf_dir, "documents")
    per_tok = (
        docs.select("doc_id", "source", F.explode(tokens("text")).alias("tok"))
        .groupBy("doc_id", "source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    scored = per_tok.groupBy("doc_id", "source").agg(
        F.expr(f"(sum(c * c) * {DIVERSITY_SCALE}) div (sum(c) * sum(c))").alias(
            "simpson_fx"
        )
    )
    w_best = Window.partitionBy("source").orderBy("simpson_fx", "doc_id")
    w_worst = Window.partitionBy("source").orderBy(
        F.desc("simpson_fx"), F.desc("doc_id")
    )
    best = scored.select(
        "source",
        F.col("doc_id").alias("chosen_id"),
        F.col("simpson_fx").alias("s_best"),
        F.row_number().over(w_best).alias("pair_rank"),
    ).filter(F.col("pair_rank") <= PREF_PAIRS_PER_SOURCE)
    worst = scored.select(
        "source",
        F.col("doc_id").alias("rejected_id"),
        F.col("simpson_fx").alias("s_worst"),
        F.row_number().over(w_worst).alias("pair_rank"),
    ).filter(F.col("pair_rank") <= PREF_PAIRS_PER_SOURCE)
    return (
        best.join(worst, ["source", "pair_rank"])
        .filter(F.col("s_worst") > F.col("s_best"))
        .select(
            "source",
            "pair_rank",
            "chosen_id",
            "rejected_id",
            (F.col("s_worst") - F.col("s_best")).alias("gap_fx"),
        )
    )
