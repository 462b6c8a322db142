#!/usr/bin/env python
"""Dump .explain("formatted") for every declared query (or a named
subset) to plans/<outdir>/<query>_<suffix>.txt. Plan capture is mostly
driver-only, BUT building some registered queries executes real jobs
(ADVICE r18): driver-loop queries (vocab_bpe_train/_apply/_fertility,
dedup_clusters, graph_pagerank, kmeans consumers) run their per-round
collect()s, and any query that localCheckpoints during construction
(the pretrain chain, dedup_containment, multimodal stages, probe
collects) materializes those stages — so capture timing is NOT free
for those, and their dumped plan starts at the last checkpoint.

Exits non-zero if any query's explain raised; a failed query writes an
"EXPLAIN FAILED: ..." file so the gap is visible, but the exit code
keeps plan-diff tooling from silently comparing error strings as plans.

    python scripts/capture_plans.py --outdir plans/r18 --suffix before [names...]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--outdir", default="plans/r18")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import spark_graft
    from spark_graft.registry import REGISTRY
    from spark_graft.session import get_spark

    spark_graft.load_all_queries()
    spark = get_spark("plan-capture")
    os.makedirs(os.path.join(REPO, args.outdir), exist_ok=True)
    names = args.names or sorted(REGISTRY)
    n_failed = 0
    for name in names:
        try:
            df = REGISTRY[name].fn(spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"EXPLAIN FAILED: {exc}"
            n_failed += 1
        path = os.path.join(REPO, args.outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(name, "ok" if not plan.startswith("EXPLAIN FAILED") else "FAIL")
    spark.stop()
    if n_failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
