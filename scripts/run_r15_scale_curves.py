#!/usr/bin/env python
"""Record sf1 -> sf3 scale curves for a query set (default: the eight
round-15 queries), same methodology as run_sf3_spotcheck.py: bench.py
subset runs (median of 3 warm runs via the noop sink), ratio vs sf1
seconds measured in the same session. Merges the result into
BENCH_SF1.json under --key, preserving any hand-added characterization
sub-keys.

Parameterized (--key / --queries) so future rounds pass their own list
instead of copying this file again — the r14 copy predates this
(second-pass code review, r15).

    python scripts/run_r15_scale_curves.py [--sf1-dir /tmp/testdata/sf1]
                                           [--sf3-dir /tmp/testdata/sf3]
                                           [--key r15_queries_sf3]
                                           [--queries name ...]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DETAIL = os.path.join(REPO, "BENCH_DETAIL_SUBSET.json")

R15_QUERIES = """
dedup_url fn_url pipeline_gopher_rules pipeline_train_eval_split
sim_maxsim events_rfm text_hash_features topk_terms
""".split()


def run_bench(sf_dir: str, queries: list[str]) -> dict[str, float]:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), *queries],
        env=env, cwd=REPO, check=True, stdout=subprocess.DEVNULL,
    )
    with open(DETAIL) as f:
        return json.load(f)["queries"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf1-dir", default="/tmp/testdata/sf1")
    ap.add_argument("--sf3-dir", default="/tmp/testdata/sf3")
    ap.add_argument("--key", default="r15_queries_sf3")
    ap.add_argument("--queries", nargs="*", default=R15_QUERIES)
    args = ap.parse_args()

    for sf, out_dir in (("1", args.sf1_dir), ("3", args.sf3_dir)):
        if not os.path.isdir(out_dir):
            subprocess.run(
                [sys.executable, os.path.join(REPO, "scripts", "gen_testdata.py"),
                 "--sf", sf, "--out", out_dir],
                check=True,
            )

    q1 = run_bench(args.sf1_dir, args.queries)
    q3 = run_bench(args.sf3_dir, args.queries)

    path = os.path.join(REPO, "BENCH_SF1.json")
    with open(path) as f:
        doc = json.load(f)
    # preserve any characterization sub-keys added by hand — merge,
    # don't replace
    extras = {
        k: v
        for k, v in doc.get(args.key, {}).items()
        if k not in ("what", "sf1", "sf3", "ratio_sf3_over_sf1")
    }
    doc[args.key] = {
        **extras,
        "what": (
            f"Scale curves for {len(args.queries)} queries at sf1 and a "
            "generated sf3 (3x sf1's rows per table), same code and "
            "methodology as sf3_spotcheck "
            "(scripts/run_r15_scale_curves.py). Linear-or-better per "
            "3x rows is the pass bar; each query's plan-level scale "
            "contract is pinned in tests/test_plans.py."
        ),
        "sf1": q1,
        "sf3": q3,
        "ratio_sf3_over_sf1": {k: round(q3[k] / q1[k], 2) for k in q3},
    }
    with open(path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(f"wrote BENCH_SF1.json {args.key}:",
          {k: round(q3[k] / q1[k], 2) for k in q3})


if __name__ == "__main__":
    main()
