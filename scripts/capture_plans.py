#!/usr/bin/env python
"""Dump .explain("formatted") for every declared query (or a named
subset) to plans/<outdir>/<query>_<suffix>.txt. Plan capture is
driver-only (no job runs), so it is cheap and timing-insensitive.

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
    for name in names:
        try:
            df = REGISTRY[name].fn(spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"EXPLAIN FAILED: {exc}"
        path = os.path.join(REPO, args.outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(name, "ok" if not plan.startswith("EXPLAIN FAILED") else "FAIL")
    spark.stop()


if __name__ == "__main__":
    main()
