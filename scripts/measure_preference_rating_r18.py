#!/usr/bin/env python
"""Scale curve for the r18 `preference_rating` operator (pytest-only
until declared): wall-clock at sf1 and sf3, median of 3 warm runs,
result collected (200 items — the output is bounded by sources x 2K
regardless of corpus size, so collect IS the noop-sink equivalent
here). Writes BENCH_SF1.json `preference_rating_r18`.

The corpus-scale work is the Simpson scoring aggregation feeding the
judgment legs (pipeline_preference_pairs' measured shape); the
minorization rounds run over an O(sources x K^2)-bounded game table,
so the curve should track the r14 preference-pairs curve (~2.9x per
3x), not the round count.

    python scripts/measure_preference_rating_r18.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from spark_graft.session import get_spark
    from spark_graft.operators.curriculum import preference_rating

    spark = get_spark()
    out = {}
    for label, sf_dir in (("sf1", "/tmp/testdata/sf1"), ("sf3", "/tmp/testdata/sf3")):
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            n = len(preference_rating(spark, sf_dir).collect())
            times.append(round(time.perf_counter() - t0, 2))
        out[label] = {"median_s": statistics.median(times), "runs": times, "items": n}
        print(label, out[label])

    ratio = round(out["sf3"]["median_s"] / out["sf1"]["median_s"], 2)
    path = os.path.join(REPO, "BENCH_SF1.json")
    doc = json.load(open(path))
    doc["preference_rating_r18"] = {
        "what": (
            "r18 preference_rating (Bradley-Terry over the noisy KxK "
            "judgment stream) at sf1 vs generated sf3, median of 3 warm "
            "runs, dedicated session. The corpus-scale stage is the "
            "Simpson scoring aggregation (pipeline_preference_pairs' "
            "shape); the 6 minorization rounds run over a game table "
            "bounded by sources x K^2, so round cost is scale-flat."
        ),
        **out,
        "ratio_sf3_over_sf1": ratio,
    }
    json.dump(doc, open(path, "w"), indent=1, sort_keys=True)
    print("wrote BENCH_SF1.json: preference_rating_r18, ratio", ratio)


if __name__ == "__main__":
    main()
