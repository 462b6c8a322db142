#!/usr/bin/env python
"""Reproduce CORRECTNESS_SF1.json: the ALL-queries bit-exact
Spark-vs-DuckDB sweep at sf1 — 100x the row volume of the external
driver's per-round sf0.01 gate, same comparator.

Generates sf1 testdata (driver-curve row counts and value domains) if
missing, then runs EVERY oracled entry of `__spark_entry__.queries()`
through `tests/compare.assert_frames_match` (row-count + schema +
bit-exact values after canonical ordering) against its
`oracle_sql()` run by DuckDB over the same parquet files, and rewrites
CORRECTNESS_SF1.json at the repo root:

    python scripts/run_sf1_correctness.py [--sf1-dir /tmp/testdata/sf1]
                                          [--only name ...]

Committed as a script (VERDICT r7 item 3) so the all-queries-at-sf1 claim is
one command on the current working tree and cannot drift from the code.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf1-dir", default="/tmp/testdata/sf1")
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset of query names (default: all oracled)")
    args = ap.parse_args()

    if not os.path.isdir(args.sf1_dir):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "gen_testdata.py"),
             "--sf", "1", "--out", args.sf1_dir],
            check=True,
        )

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry
    from compare import assert_frames_match

    # Vanilla-semantics session, like the driver (the library must set
    # its own behavior confs at runtime) — but with the heap sized for
    # sf1: Spark's 1g spark.driver.memory default is a thin-cluster-
    # driver assumption, and in local[] mode the driver JVM is every
    # executor; 32 concurrent tasks over 6M-row lineitem kill a 1g heap
    # before anything can spill. Heap size is not a semantics conf.
    #
    # Arrow-batched toPandas (r16, VERDICT r15 item 7): the sweep's
    # wall-time was dominated by the COMPARATOR's materialization, not
    # the plans — ts_resample's 13.8M-row result took 424 s through the
    # row-pickling default path vs a 6.6 s plan. Arrow is a TRANSPORT
    # conf, not a semantics conf: the same IEEE doubles / int64s /
    # decimals cross in columnar batches, so values are bit-identical
    # and tests/compare.assert_frames_match is unchanged (still a
    # FULL-value compare, strictly stronger than a hash compare).
    # fallback.enabled keeps any Arrow-unsupported result type on the
    # old path automatically. Measured: BENCH_SF1
    # "sweep_comparator_arrow_r16", verdicts unchanged.
    from spark_graft.session import _default_driver_memory

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count()}]")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", _default_driver_memory()))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.fallback.enabled", "true")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{args.sf1_dir}/{t}.parquet'"
        )

    qs, osql = entry.queries(), entry.oracle_sql()
    names = args.only or [n for n in qs if n in osql]
    results: dict[str, dict] = {}
    n_pass = 0
    for name in names:
        if name not in osql:
            print(f"{name}: SKIP (no oracle — streaming/rows-only row)")
            continue
        try:
            t0 = time.time()
            sp = qs[name](spark, args.sf1_dir).toPandas()
            t1 = time.time()
            du = con.execute(osql[name]).df()
            t2 = time.time()
            assert_frames_match(sp, du, name)
            results[name] = {
                "status": "pass",
                "rows": int(len(sp)),
                "spark_s": round(t1 - t0, 1),
                "duckdb_s": round(t2 - t1, 1),
            }
            n_pass += 1
            print(f"{name}: pass ({len(sp)} rows, "
                  f"spark {t1 - t0:.1f}s, duckdb {t2 - t1:.1f}s)")
        except Exception as exc:  # noqa: BLE001 — record and continue
            results[name] = {
                "status": "FAIL",
                "error": "".join(
                    traceback.format_exception_only(type(exc), exc)
                ).strip()[:500],
            }
            print(f"{name}: FAIL — {exc}")

    path = os.path.join(REPO, "CORRECTNESS_SF1.json")
    if args.only and os.path.exists(path):
        # subset runs MERGE into the committed full-suite artifact
        # instead of silently replacing it with a partial one
        prior = json.load(open(path)).get("results", {})
        prior.update(results)
        results = prior
    n_pass = sum(1 for v in results.values() if v["status"] == "pass")
    out = {
        "what": (
            "All-queries bit-exact Spark-vs-DuckDB sweep at sf1 (10x the "
            "rows of sf0.1, 100x the driver's sf0.01 gate volume), "
            "produced by scripts/run_sf1_correctness.py on the current "
            "working tree. Comparator: tests/compare.assert_frames_match "
            "(row count + schema + exact values incl. float bits, after "
            "canonical column/row ordering). Subset (--only) runs update "
            "their queries' entries in place; other entries carry the "
            "last full run."
        ),
        "n_pass": n_pass,
        "n_total": len(results),
        "results": results,
    }
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {path}: {n_pass}/{len(results)} pass")
    if n_pass != len(results):
        sys.exit(1)


if __name__ == "__main__":
    main()
