#!/usr/bin/env python
"""Reproduce the sf3_spotcheck section of BENCH_SF1.json.

Runs the scale-sensitive spot-check queries at sf1 and at a generated
sf3 (3x sf1's rows per table, driver value domains) with the same
methodology as scripts/run_scale_bench.py (bench.py subset, median of 3
warm runs via the noop sink, one fresh session per scale factor), then
rewrites only the `sf3_spotcheck` key of BENCH_SF1.json — the ratio is
computed against the sf1 seconds measured in THIS run so both points of
the curve come from comparable sessions.

    python scripts/run_sf3_spotcheck.py [--sf1-dir /tmp/testdata/sf1]
                                        [--sf3-dir /tmp/testdata/sf3]

Subset bench runs write their per-run detail to
BENCH_DETAIL_SUBSET.json (bench.py routes subset runs there so the
committed full-suite BENCH_DETAIL.json is never clobbered); read back
after each pass, like run_scale_bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DETAIL = os.path.join(REPO, "BENCH_DETAIL_SUBSET.json")

# The spot-check set: every query whose sf0.1->sf1 ratio has ever
# exceeded ~2.4x, plus the r8 additions (sim_knn_graph, dedup_semantic),
# the r9 vocab-family additions (text_bm25, vocab_bpe_train), the
# r10 additions above that band (dedup_containment, vocab_bpe_apply,
# text_lm_score, events_pattern, agg_sketch_kmv), and the r11 addition
# (multimodal_neardup — its bucket-entropy scale story lives here).
QUERIES = """
agg_percentile decontaminate dedup_clusters dedup_embedding dedup_minhash
dedup_ngram_jaccard dedup_semantic dedup_span_fraction graph_pagerank
pipeline_clean_corpus profile_table sim_knn_graph
text_bm25 vocab_bpe_train
dedup_containment vocab_bpe_apply text_lm_score events_pattern agg_sketch_kmv
multimodal_neardup
""".split()


def run_bench(sf_dir: str) -> dict[str, float]:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), *QUERIES],
        env=env, cwd=REPO, check=True, stdout=subprocess.DEVNULL,
    )
    with open(DETAIL) as f:
        return json.load(f)["queries"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf1-dir", default="/tmp/testdata/sf1")
    ap.add_argument("--sf3-dir", default="/tmp/testdata/sf3")
    args = ap.parse_args()

    for sf, out_dir in (("1", args.sf1_dir), ("3", args.sf3_dir)):
        if not os.path.isdir(out_dir):
            subprocess.run(
                [sys.executable, os.path.join(REPO, "scripts", "gen_testdata.py"),
                 "--sf", sf, "--out", out_dir],
                check=True,
            )

    q1 = run_bench(args.sf1_dir)
    q3 = run_bench(args.sf3_dir)

    path = os.path.join(REPO, "BENCH_SF1.json")
    with open(path) as f:
        doc = json.load(f)
    doc["sf3_spotcheck"] = {
        "what": (
            f"Third scaling point: {len(QUERIES)} scale-sensitive queries at a "
            "generated sf3 (3x sf1's rows per table), same code and "
            "methodology as the sf0.1->sf1 table; ratio vs sf1 seconds "
            "measured in the same reproduction run "
            "(scripts/run_sf3_spotcheck.py). r9: dedup_ngram_jaccard "
            "re-measured after the strict first-occurrence PPJoin "
            "positional filter — surviving candidates at bounded-vocab sf3 "
            "cut 27.0M -> 11.35M (ppjoin_filter_characterization); the "
            "bounded-vocabulary corpus remains the documented worst case "
            "(open Zipfian vocabularies are ~linear, see "
            "ngram_vocab_characterization)."
        ),
        "sf1_sec": q1,
        "queries": q3,
        "ratio_sf3_over_sf1": {k: round(q3[k] / q1[k], 2) for k in q3},
    }
    with open(path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(f"wrote {path}: sf3 spotcheck refreshed "
          f"(ngram_jaccard {q1['dedup_ngram_jaccard']}s -> "
          f"{q3['dedup_ngram_jaccard']}s)")


if __name__ == "__main__":
    main()
