#!/usr/bin/env python
"""VERDICT r16 item 5: measure the GROWING-STATE streams' state-store
footprint on an sf1 replay — paragraph_dedup_stream (state = one
(keep_doc_id, keep_pos) per distinct paragraph md5) and
minhash_novelty_stream (state = (doc_id, shingle-set) member lists per
(band, sig) bucket) — via StreamingQueryProgress stateOperators
(numRowsTotal, stateMemory bytes). Results land in BENCH_SF1.json under
`stream_state_sizing_r17` with derived bytes/1M-distinct-keys guidance.

    python scripts/measure_stream_state_r17.py [--sf-dir /tmp/testdata/sf1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import uuid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def drain_and_measure(stream_df, mode):
    name = f"sink_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # availableNow may run several micro-batches; recentProgress keeps
    # them all — take the LAST progress carrying state operators
    ops = []
    for p in reversed(q.recentProgress):
        if p["stateOperators"]:
            ops = p["stateOperators"]
            break
    out = []
    for o in ops:
        cm = o.get("customMetrics") or {}
        # explicit None checks (r18, ADVICE): a legitimate 0-byte
        # custom metric must report 0, not fall through an `or` to the
        # fallback metric
        v = cm.get("stateOnCurrentVersionSizeBytes")
        if v is None:
            # RocksDB provider: loaded-version footprint = pinned
            # blocks + memtable; its SST size is the on-disk payload
            v = cm.get("rocksdbTotalMemoryUsage")
        if v is None:
            v = o.get("memoryUsedBytes")
        out.append(
            {
                "operator": o.get("operatorName"),
                "numRowsTotal": o.get("numRowsTotal"),
                "stateMemory_bytes": v,
                "memoryUsedBytes": o.get("memoryUsedBytes"),
                "rocksdbSstFileSize": cm.get("rocksdbSstFileSize"),
                "rocksdbTotalMemoryUsage": cm.get("rocksdbTotalMemoryUsage"),
            }
        )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/testdata/sf1")
    ap.add_argument("--skip-minhash", action="store_true")
    ap.add_argument(
        "--provider",
        choices=["hdfs", "rocksdb"],
        default="hdfs",
        help="state-store provider: default HDFSBackedStateStore or the "
        "RocksDB provider (VERDICT r17 item 4 pilot — the 100 TB sizing "
        "claim should not extrapolate from the on-heap provider alone); "
        "results land under stream_state_sizing_{r17|rocksdb_r18}",
    )
    args = ap.parse_args()

    from spark_graft.session import get_spark
    from spark_graft.sources import table
    from spark_graft.streaming import (
        minhash_novelty_stream,
        paragraph_dedup_stream,
    )

    spark = get_spark()
    if args.provider == "rocksdb":
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming."
            "state.RocksDBStateStoreProvider",
        )
    docs = (
        table(spark, args.sf_dir, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .toPandas()
    )
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = f"/tmp/stream_state_src_{uuid.uuid4().hex[:8]}"
    os.makedirs(src)
    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    pq.write_table(
        pa.Table.from_pandas(docs, preserve_index=False).cast(schema),
        f"{src}/docs.parquet",
    )
    n_docs = len(docs)
    if args.provider == "rocksdb":
        what = (
            "VERDICT r17 item 4: the SAME sf1 replay as "
            "stream_state_sizing_r17 but under the RocksDB state-store "
            "provider. memoryUsedBytes here is the loaded-version "
            "MEMORY footprint (pyspark 4.1.2 does not emit "
            "rocksdbTotalMemoryUsage; the probe keeps the key for "
            "builds that do) — compare it to the HDFS provider's "
            "all-on-heap bytes/row to see what moved off-heap; "
            "sst_bytes_per_row is the on-DISK payload per distinct "
            "key, the number that makes vocabulary-scale state "
            "feasible."
        )
    else:
        what = (
            "VERDICT r16 item 5: state-store footprint of the two "
            "growing-state streams on a full replay, from "
            "StreamingQueryProgress stateOperators. numRowsTotal = "
            "distinct keys held; stateMemory = the provider's loaded-"
            "map estimate (HDFSBackedStateStore here; RocksDB in "
            "production keeps the working set off-heap and spills, "
            "same per-row payload)."
        )
    out = {
        "what": what,
        "provider": args.provider,
        "sf_dir": args.sf_dir,
        "n_docs": n_docs,
    }

    def run(label, builder, mode):
        stream = (
            spark.readStream.schema("doc_id long, text string").parquet(src)
        )
        t0 = time.perf_counter()
        m = drain_and_measure(builder(stream), mode)
        wall = round(time.perf_counter() - t0, 1)
        for o in m:
            rows = o["numRowsTotal"] or 0
            mem = o["stateMemory_bytes"] or 0
            o["bytes_per_row"] = round(mem / rows, 1) if rows else None
            o["bytes_per_1M_keys_mb"] = (
                round(mem / rows * 1_000_000 / 2**20, 1) if rows else None
            )
            sst = o.get("rocksdbSstFileSize")
            if rows and sst is not None:
                # the RocksDB on-DISK payload per key — the number that
                # replaces the HDFS provider's on-heap bytes/row in the
                # 100 TB sizing argument
                o["sst_bytes_per_row"] = round(sst / rows, 1)
                o["sst_bytes_per_1M_keys_mb"] = round(
                    sst / rows * 1_000_000 / 2**20, 1
                )
        out[label] = {"wall_s": wall, "state": m}
        print(label, wall, "s", json.dumps(m))

    run("paragraph_dedup_stream", paragraph_dedup_stream, "update")
    if not args.skip_minhash:
        run("minhash_novelty_stream", minhash_novelty_stream, "append")

    key = (
        "stream_state_sizing_rocksdb_r18"
        if args.provider == "rocksdb"
        else "stream_state_sizing_r17"
    )
    path = os.path.join(REPO, "BENCH_SF1.json")
    d = json.load(open(path))
    d[key] = out
    json.dump(d, open(path, "w"), indent=1, sort_keys=True)
    print(f"wrote BENCH_SF1.json: {key}")


if __name__ == "__main__":
    main()
