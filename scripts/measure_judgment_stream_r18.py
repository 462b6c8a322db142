#!/usr/bin/env python
"""Ingest throughput of `judgment_consistency_stream` at volume: fit
the Bradley-Terry ratings on the sf1 corpus's judgment stream, then
replay 1M synthetic judgments (drawn over the rated items plus a 2%
unknown-id tail) through the stream with a noop foreachBatch sink,
availableNow, warm median of 3. Records BENCH_SF1.json
`judgment_stream_r18`.

The stream is two map-side BroadcastHashJoins over a ~200-row
broadcast table, so throughput should be pure scan+map parallelism —
the number here substantiates the docstring's claim the same way
dsir_score_stream_r17 does for the fold gate.

    python scripts/measure_judgment_stream_r18.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
import uuid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_JUDG = 1_000_000


def main() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_graft.artifacts import save_preference_ratings
    from spark_graft.operators.curriculum import preference_rating
    from spark_graft.session import get_spark
    from spark_graft.streaming import judgment_consistency_stream

    spark = get_spark()
    sf_dir = "/tmp/testdata/sf1"
    fitted = preference_rating(spark, sf_dir)
    ratings_path = "/tmp/judgment_ratings_r18"
    save_preference_ratings(ratings_path, fitted)
    ids = [r["doc_id"] for r in fitted.select("doc_id").collect()]
    n_items = len(ids)

    # deterministic synthetic judgment stream: cycle the rated items,
    # 2% unknown tail (ids beyond the fit universe)
    chosen, rejected = [], []
    for k in range(N_JUDG):
        if k % 50 == 49:
            chosen.append(10_000_000 + k)
            rejected.append(ids[k % n_items])
        else:
            chosen.append(ids[k % n_items])
            rejected.append(ids[(k * 7 + 1) % n_items])
    src = f"/tmp/judgment_stream_src_{uuid.uuid4().hex[:8]}"
    os.makedirs(src)
    pq.write_table(
        pa.table(
            {"chosen_id": chosen, "rejected_id": rejected},
            schema=pa.schema(
                [("chosen_id", pa.int64()), ("rejected_id", pa.int64())]
            ),
        ),
        f"{src}/j.parquet",
    )

    def one_run() -> float:
        stream = spark.readStream.schema(
            "chosen_id long, rejected_id long"
        ).parquet(src)
        t0 = time.perf_counter()
        q = (
            judgment_consistency_stream(stream, ratings_path)
            .writeStream.foreachBatch(lambda bdf, bid: bdf.count())
            .outputMode("append")
            .option(
                "checkpointLocation", f"/tmp/judg_ckpt_{uuid.uuid4().hex[:8]}"
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return round(time.perf_counter() - t0, 2)

    runs = [one_run() for _ in range(4)][1:]  # drop the cold run
    med = statistics.median(runs)
    out = {
        "what": (
            "judgment_consistency_stream ingest throughput: 1M synthetic "
            "judgments (2% unknown-id tail) over the sf1-fitted "
            f"{n_items}-item rating table, noop foreachBatch sink, "
            "availableNow, warm median of 3 on local[32]. Two map-side "
            "BroadcastHashJoins per micro-batch — no state store, no "
            "stream-side shuffle — so this is scan+map parallelism."
        ),
        "n_judgments": N_JUDG,
        "n_rated_items": n_items,
        "runs_s": runs,
        "median_s": med,
        "judgments_per_s": int(N_JUDG / med),
    }
    path = os.path.join(REPO, "BENCH_SF1.json")
    doc = json.load(open(path))
    doc["judgment_stream_r18"] = out
    json.dump(doc, open(path, "w"), indent=1, sort_keys=True)
    print("wrote BENCH_SF1.json: judgment_stream_r18", out["judgments_per_s"], "judg/s")


if __name__ == "__main__":
    main()
