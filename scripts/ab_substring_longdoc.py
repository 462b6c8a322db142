#!/usr/bin/env python
"""Long-doc A/B for the r13 dedup_substring rebuild (VERDICT r12 item 3
'done' criterion): on BOOK-LENGTH documents, time the pre-r13 rebuild
(per-doc string-set probe for starts + per-token array_contains probe
of the covered set — O(n_tokens * (n_shared_spans + n_covered)) per
doc) against the shipped r13 form (distributive positional start
derivation + sorted-starts run-length flag sweep — O(n_tokens +
n_cov log n_cov)), and assert the outputs identical.

Fixture: every doc is ~20k tokens, HALF boilerplate — 8-token
paragraphs drawn from a shared 1000-paragraph pool alternating with
8-token unique prose (the template-page/nav-chrome shape at its
worst), so each doc carries ~1000 distinct shared spans and ~10k
covered positions — the regime the old probes go quadratic in. Results land in AB_SUBSTRING_LONGDOC.json.

    python scripts/ab_substring_longdoc.py [--n-docs 30] [--blocks 250]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_POOL = 1000  # distinct boilerplate paragraphs shared across docs


def build_fixture(spark, n_docs: int, blocks: int, tmpdir: str) -> str:
    rows = []
    for d in range(n_docs):
        parts = []
        for j in range(blocks):
            k = (d * 31 + j * 7) % N_POOL
            parts.append(" ".join(f"bp{k}w{t}" for t in range(8)))
            parts.append(" ".join(f"d{d}f{j}x{i}" for i in range(8)))
        rows.append((d, " ".join(parts), "en", "s", 0))
    path = os.path.join(tmpdir, "documents.parquet")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(path)
    return tmpdir


def old_rebuild(spark, sf_dir: str):
    """The pre-r13 dedup_substring body, verbatim semantics: collected
    shared-span STRING set per doc, per-start array_contains probe, and
    per-token array_contains probe of the covered array."""
    from pyspark.sql import functions as F

    from spark_graft.functions import shingles_from_tokens, tokens
    from spark_graft.operators.dedup import SPAN_N
    from spark_graft.sources import table

    docs = table(spark, sf_dir, "documents")
    base = docs.select("doc_id", tokens("text").alias("toks"))
    dg = base.select(
        "doc_id", F.explode(shingles_from_tokens("toks", SPAN_N)).alias("g")
    )
    shared_g = (
        dg.groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > 1)
        .select("g")
    )
    shared_per_doc = (
        dg.join(shared_g, "g").groupBy("doc_id").agg(F.collect_set("g").alias("sg"))
    )
    j = base.join(shared_per_doc, "doc_id", "left").select(
        "doc_id",
        "toks",
        F.coalesce("sg", F.array().cast("array<string>")).alias("sg"),
    )
    start_idx = F.when(
        F.size("toks") < SPAN_N, F.array().cast("array<int>")
    ).otherwise(F.sequence(F.lit(1), F.size("toks") - (SPAN_N - 1)))
    with_starts = j.select(
        "doc_id",
        "toks",
        F.filter(
            start_idx,
            lambda i: F.array_contains(
                "sg", F.array_join(F.slice("toks", i, SPAN_N), " ")
            ),
        ).alias("starts"),
    )
    with_cov = with_starts.select(
        "doc_id",
        "toks",
        F.array_distinct(
            F.flatten(
                F.transform("starts", lambda s: F.sequence(s, s + F.lit(SPAN_N - 1)))
            )
        ).alias("cov"),
    )
    all_pos = F.when(F.size("toks") == 0, F.array().cast("array<int>")).otherwise(
        F.sequence(F.lit(1), F.size("toks"))
    )
    kept = F.transform(
        F.filter(all_pos, lambda p: ~F.array_contains(F.col("cov"), p)),
        lambda p: F.element_at(F.col("toks"), p),
    )
    return with_cov.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.size("cov").alias("n_removed"),
        F.when(F.size("toks") == 0, F.lit(0.0))
        .otherwise(F.round(F.size("cov") / F.size("toks").cast("double"), 4))
        .alias("removed_frac"),
        F.array_join(kept, " ").alias("clean_text"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=30)
    ap.add_argument("--blocks", type=int, default=1250)  # 1250 * 16 = 20k tokens
    args = ap.parse_args()

    import tempfile

    from pyspark.sql import SparkSession

    from spark_graft.operators.dedup import dedup_substring

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "16g")
        .appName("ab_substring_longdoc")
        .getOrCreate()
    )
    with tempfile.TemporaryDirectory() as td:
        sf_dir = build_fixture(spark, args.n_docs, args.blocks, td)

        def run(df) -> float:
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            return round(time.perf_counter() - t0, 3)

        # warm BOTH forms once (codegen/JIT for these higher-order
        # array expressions costs several seconds on first execution —
        # a single-shot measurement ranks warm-up, not the plans),
        # then interleave and take medians
        run(dedup_substring(spark, sf_dir))
        run(old_rebuild(spark, sf_dir))
        news, olds = [], []
        for _ in range(3):
            news.append(run(dedup_substring(spark, sf_dir)))
            olds.append(run(old_rebuild(spark, sf_dir)))
        new_s, old_s = sorted(news)[1], sorted(olds)[1]
        a = dedup_substring(spark, sf_dir).orderBy("doc_id").toPandas()
        b = old_rebuild(spark, sf_dir).orderBy("doc_id").toPandas()
        results = {
            "n_docs": args.n_docs,
            "tokens_per_doc": args.blocks * 16,
            "shared_span_pool": N_POOL,
            "cpus": int(cpus),
            "old_probe_rebuild_s": old_s,
            "new_sweep_rebuild_s": new_s,
            "old_over_new_x": round(old_s / new_s, 2),
            "outputs_identical": bool(a.equals(b)),
        }
    out = os.path.join(REPO, "AB_SUBSTRING_LONGDOC.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
        f.write("\n")
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
