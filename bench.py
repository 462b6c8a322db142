#!/usr/bin/env python
"""Benchmark harness: run every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], median of
N_RUNS warm runs each, and print ONE JSON line:

  {"metric": "...", "value": <total median sec>, "unit": "sec",
   "queries": {"q": sec, ...}, "sf": ...}

Each timing covers plan + execute + FULL result materialization via a
noop-format write: every output row is produced and serialized, then
discarded. A count() here would be dishonest — Catalyst prunes
deterministic projection/window columns under Aggregate[count(1)], so
map-only queries would time a bare parquet row-count instead of their
actual expressions.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

import spark_graft
from spark_graft.registry import REGISTRY
from spark_graft.session import get_spark

N_RUNS = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # sf from a trailing "sf<number>" in the dir name; any other dir
    # (e.g. CI's generated data) falls back to 0.0 rather than crashing
    m = re.search(r"sf([0-9]+(?:\.[0-9]+)?)$", os.path.basename(sf_dir.rstrip("/")))
    sf = float(m.group(1)) if m else 0.0
    spark_graft.load_all_queries()
    # The JVM inherits our fds at launch and log4j writes some lines
    # (e.g. the NativeCodeLoader warning) to ITS stdout — which would
    # corrupt the one-JSON-line stdout contract. Point fd 1 at stderr
    # while the JVM starts, then restore it for the final JSON print.
    sys.stdout.flush()
    real_stdout = os.dup(1)
    os.dup2(2, 1)
    try:
        spark = get_spark("spark-graft-bench")
    finally:
        os.dup2(real_stdout, 1)
        os.close(real_stdout)

    only = set(sys.argv[1:])  # optional: bench a subset by name
    names = [n for n in sorted(REGISTRY) if not only or n in only]

    timings: dict[str, float] = {}
    for name in names:
        spec = REGISTRY[name]
        runs = []
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            # Materialize EVERY output row (expressions included) without
            # paying for storage: the noop sink consumes and discards.
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(runs), 3)
        print(f"# {name}: {timings[name]}s (runs: {[round(r, 3) for r in runs]})", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    # Full per-query detail goes to a sidecar file: 96 entries is ~3 KB,
    # which overflowed the driver's stdout tail buffer in round 2
    # (BENCH_r02.json parsed=null). The stdout line carries the total
    # plus only the slowest queries, keeping it well under 1 KB.
    # Subset runs write to a separate _SUBSET sidecar so an ad-hoc
    # `python bench.py some_query` never clobbers the committed
    # full-suite BENCH_DETAIL.json (scripts/run_scale_bench.py reads
    # the subset sidecar back for its ratio table).
    detail_name = "BENCH_DETAIL_SUBSET.json" if only else "BENCH_DETAIL.json"
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), detail_name)
    with open(detail_path, "w") as f:
        json.dump({"sf": sf, "total_sec": total, "queries": timings}, f, indent=1, sort_keys=True)
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:8])
    print(
        json.dumps(
            {
                "metric": f"declared-query wall-clock (median of 3) at sf{sf}",
                "value": total,
                "unit": "sec",
                "n_queries": len(timings),
                "queries": slowest,
                "detail": detail_name,
                "sf": sf,
                # prove the parallelism contract (r19, VERDICT item 2):
                # the effective master and scheduler parallelism, so a
                # low-core driver run is distinguishable from local[32]
                # in the artifact itself. Additions only — every field
                # above is unchanged.
                "master": spark.sparkContext.master,
                "default_parallelism": spark.sparkContext.defaultParallelism,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
