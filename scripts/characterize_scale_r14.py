#!/usr/bin/env python
"""VERDICT r13 item 6: ATTRIBUTE (measure, don't guess) the two
steepest r13 scale curves — pipeline_media_corpus (3.16x wall per 3x
rows) and dedup_span_fraction (3.2x) — by decomposing each query into
its stages at sf1 and sf3 and recording the stage times AND the
cardinalities that drive them.

Hypotheses under test:
- pipeline_media_corpus: the near-dup candidate-pair count (sum over
  LSH buckets of |bucket| choose 2) grows superlinearly because the
  fixture's duplicate RATE is constant — so bucket populations grow
  linearly with N and in-bucket pair work grows ~quadratically.
- dedup_span_fraction: the df>1 shared-span table outgrows the AQE
  broadcast threshold somewhere between sf1 and sf3, flipping the
  gram-stream join from BroadcastHashJoin to a full-shuffle
  SortMergeJoin (checked on the EXECUTED plan, not guessed).

Writes the decomposition to BENCH_SF1.json under
`media_span_scale_characterization_r14`.

    python scripts/characterize_scale_r14.py [--sf1-dir /tmp/testdata/sf1]
                                             [--sf3-dir /tmp/testdata/sf3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - t0, 3)


def media_stages(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from spark_graft.operators.dedup import exploded_pairs
    from spark_graft.operators.multimodal import (
        _AHASH_BANDS,
        AHASH_HAM_T,
        media_decode_stage,
    )
    from spark_graft.registry import REGISTRY
    from spark_graft.sources import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    decoded, t_decode = timed(
        lambda: media_decode_stage(docs).localCheckpoint()
    )
    n_docs = decoded.count()

    keep = decoded.groupBy("digest").agg(
        F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies")
    )
    surv = (
        decoded.join(keep, "digest")
        .filter(F.col("doc_id") == F.col("keep_id"))
        .filter(F.col("decodable"))
        .localCheckpoint()
    )
    n_surv = surv.count()

    member = F.struct("doc_id", "b0", "b1", "b2", "b3")
    buckets = (
        surv.select(
            member.alias("m"),
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(i).alias("bi"), F.col(f"b{i}").alias("bv"))
                        for i in range(_AHASH_BANDS)
                    ]
                )
            ).alias("bb"),
        )
        .select(F.col("bb.bi").alias("bi"), F.col("bb.bv").alias("bv"), "m")
        .groupBy("bi", "bv")
        .agg(F.collect_list("m").alias("ds"))
        .filter(F.size("ds") > 1)
    ).localCheckpoint()
    bstats = buckets.select(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(F.size("ds")).alias("sum_sz"),
        F.max(F.size("ds")).alias("max_sz"),
        F.sum(
            (F.size("ds") * (F.size("ds") - 1) / 2).cast("bigint")
        ).alias("cand_pairs"),
    ).first()

    def _ham_ok(p):
        ham = sum(
            F.bit_count(p["a"][f"b{i}"].bitwiseXOR(p["b"][f"b{i}"]))
            for i in range(_AHASH_BANDS)
        )
        return ham <= AHASH_HAM_T

    pairs_df = (
        exploded_pairs(buckets, "ds", pair_filter=_ham_ok)
        .select(
            F.least("p.a.doc_id", "p.b.doc_id").alias("da"),
            F.greatest("p.a.doc_id", "p.b.doc_id").alias("db"),
        )
        .distinct()
    )
    n_pairs, t_pairs = timed(pairs_df.count)

    _, t_full = timed(
        lambda: REGISTRY["pipeline_media_corpus"].fn(spark, sf_dir)
        .write.format("noop").mode("overwrite").save()
    )
    return {
        "n_docs": n_docs,
        "n_exact_survivors": n_surv,
        "n_buckets": int(bstats["n_buckets"]),
        "bucket_member_rows": int(bstats["sum_sz"]),
        "max_bucket": int(bstats["max_sz"]),
        "candidate_pairs": int(bstats["cand_pairs"]),
        "verified_pairs": n_pairs,
        "t_decode_stage_s": t_decode,
        "t_pair_expand_verify_s": t_pairs,
        "t_full_query_s": t_full,
    }


def span_stages(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from spark_graft.functions import shingles_from_tokens, tokens
    from spark_graft.operators.dedup import SPAN_N
    from spark_graft.plans import executed_plan_str
    from spark_graft.registry import REGISTRY
    from spark_graft.sources import table

    docs = table(spark, sf_dir, "documents")
    base = docs.select("doc_id", tokens("text").alias("toks"))
    grams, t_grams = timed(
        lambda: base.select(
            "doc_id", F.explode(shingles_from_tokens("toks", SPAN_N)).alias("g")
        ).localCheckpoint()
    )
    n_grams = grams.count()
    shared = (
        grams.groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > 1)
        .select("g", F.lit(1).alias("is_shared"))
    )
    n_shared, t_df = timed(shared.count)

    counted = grams.join(shared, "g", "left")
    final = counted.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.count("is_shared").alias("n_shared"),
        F.round(
            F.count("is_shared") / F.count(F.lit(1)).cast("double"), 4
        ).alias("dup_fraction"),
    )
    _, t_join_agg = timed(
        lambda: final.write.format("noop").mode("overwrite").save()
    )
    plan = executed_plan_str(final)
    join_kind = (
        "BroadcastHashJoin"
        if "BroadcastHashJoin" in plan
        else ("SortMergeJoin" if "SortMergeJoin" in plan else "other")
    )
    _, t_full = timed(
        lambda: REGISTRY["dedup_span_fraction"].fn(spark, sf_dir)
        .write.format("noop").mode("overwrite").save()
    )
    return {
        "n_gram_rows": n_grams,
        "n_shared_spans_df_gt1": n_shared,
        "gram_join_strategy": join_kind,
        "t_gram_stage_s": t_grams,
        "t_df_aggregate_s": t_df,
        "t_join_and_docagg_s": t_join_agg,
        "t_full_query_s": t_full,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf1-dir", default="/tmp/testdata/sf1")
    ap.add_argument("--sf3-dir", default="/tmp/testdata/sf3")
    args = ap.parse_args()

    from spark_graft.session import get_spark

    import spark_graft

    spark_graft.load_all_queries()
    spark = get_spark()

    out: dict = {"what": ""}
    for q, fn in (("pipeline_media_corpus", media_stages),
                  ("dedup_span_fraction", span_stages)):
        out[q] = {}
        for label, d in (("sf1", args.sf1_dir), ("sf3", args.sf3_dir)):
            out[q][label] = fn(spark, d)
            print(f"{q} @ {label}: {out[q][label]}", flush=True)
        a, b = out[q]["sf1"], out[q]["sf3"]
        out[q]["ratios_sf3_over_sf1"] = {
            k: round(b[k] / a[k], 2)
            for k in a
            if isinstance(a[k], (int, float)) and a[k]
        }

    path = os.path.join(REPO, "BENCH_SF1.json")
    with open(path) as f:
        full = json.load(f)
    full["media_span_scale_characterization_r14"] = out
    with open(path, "w") as f:
        json.dump(full, f, indent=1)
    print("written to BENCH_SF1.json: media_span_scale_characterization_r14")


if __name__ == "__main__":
    main()
