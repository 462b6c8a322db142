"""Sink-side scale behaviors: partitioned parquet layout with partition
pruning on read-back, and bucketed tables that co-locate a join so it
needs no shuffle. At 100 TB these two layouts are what turn full-corpus
scans/shuffles into touch-only-what-you-need plans.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_graft.plans import explain_str
from spark_graft.sources import table


def test_partitioned_write_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    ev = table(spark, sf_dir, "events")
    out = str(tmp_path / "events_by_type")
    ev.write.partitionBy("event_type").mode("overwrite").parquet(out)

    back = spark.read.parquet(out)
    assert back.count() == ev.count()

    pruned = back.filter(F.col("event_type") == "click").select("event_id")
    plan = explain_str(pruned, "formatted")
    # the predicate must become a PartitionFilter (directory pruning),
    # not a row-level PushedFilter over all files
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters", 1)[1].split("\n", 1)[0]
    n_click = back.filter(F.col("event_type") == "click").count()
    assert n_click == ev.filter(F.col("event_type") == "click").count()


def test_text_lines_roundtrip(spark, tmp_path):
    """read_lines/write_lines preserve the reference's record model:
    one line one record, blanks dropped on read (MapReduce.h:227-241)."""
    from spark_graft.sources import read_lines, write_lines

    src = tmp_path / "in.txt"
    src.write_text("alpha\n\nbeta\ngamma\n\n")
    df = read_lines(spark, str(src))
    assert sorted(r["value"] for r in df.collect()) == ["alpha", "beta", "gamma"]

    out = tmp_path / "out"
    write_lines(df, str(out), single_file=True)
    back = read_lines(spark, str(out))
    assert back.count() == 3


def test_salted_agg_equals_plain_groupby(spark, sf_dir):
    """Salting is a physical rewrite only: the two-stage plan must equal
    the direct aggregate exactly (decimal sums keep it bit-identical)."""
    from spark_graft.operators.skew import salted_agg
    from spark_graft.sources import table
    from tests.compare import assert_frames_match

    ev = table(spark, sf_dir, "events")
    salted = salted_agg(ev, "event_type", "event_id", "value")
    plain = ev.select(
        "event_type", F.col("value").cast("decimal(18,2)").alias("v")
    ).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("v").cast("double").alias("sum_value"),
        F.min("v").cast("double").alias("min_value"),
        F.max("v").cast("double").alias("max_value"),
    )
    assert_frames_match(salted.toPandas(), plain.toPandas(), "salted==plain")


def test_bucketed_join_skips_shuffle(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key join WITHOUT an exchange —
    the pre-shuffled layout is the 100 TB answer to repeated big joins."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
        li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
        # external tables (explicit path): spark.sql.warehouse.dir is a
        # static conf that can't be pointed at tmp_path after startup
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").option(
            "path", str(tmp_path / "orders_b")
        ).mode("overwrite").saveAsTable("orders_b")
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").option(
            "path", str(tmp_path / "lineitem_b")
        ).mode("overwrite").saveAsTable("lineitem_b")
        ob, lb = spark.table("orders_b"), spark.table("lineitem_b")
        joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey)
        plan = explain_str(joined, "formatted")
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert joined.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_csv_jsonl_roundtrip_schema_stable(spark, sf_dir, tmp_path):
    """CSV and JSON-lines interchange: write in parallel, read back with
    an EXPLICIT schema (the formats module refuses inference by design),
    values and dtypes identical to the parquet original."""
    from spark_graft.sources import read_csv, read_jsonl, write_csv, write_jsonl, table

    src = (
        table(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
    )
    want = [tuple(r) for r in src.collect()]
    schema = src.schema

    csv_path = str(tmp_path / "nation_csv")
    write_csv(src, csv_path)
    got_csv = read_csv(spark, csv_path, schema)
    assert got_csv.schema == schema
    assert sorted(tuple(r) for r in got_csv.collect()) == want

    jl_path = str(tmp_path / "nation_jsonl")
    write_jsonl(src, jl_path)
    got_jl = read_jsonl(spark, jl_path, schema)
    assert got_jl.schema == schema
    assert sorted(tuple(r) for r in got_jl.collect()) == want


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    """ORC roundtrip preserves values/dtypes, and — the reason ORC is in
    the formats module at all — predicate pushdown and column pruning
    reach the ORC scan just like parquet."""
    from spark_graft.sources import read_orc, write_orc, table

    src = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    out = str(tmp_path / "orders_orc")
    write_orc(src, out)
    back = read_orc(spark, out)
    assert back.schema == src.schema
    assert back.count() == src.count()

    pruned = back.filter(F.col("o_custkey") == 1).select("o_orderkey")
    plan = explain_str(pruned, "formatted")
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "EqualTo(o_custkey,1)" in pushed, plan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "o_totalprice" not in read_schema, read_schema


def test_lsh_bucket_partitioned_serving_layout(spark, sf_dir, tmp_path):
    """The ANN serving claim as a gate (similarity.py docstring): bucket
    the corpus once with the production hash family, write partitioned
    by bucket id, and a probe's candidate scan must become directory
    pruning (PartitionFilters on bucket) — touching 1+n_probes
    partitions of the corpus, not a full scan."""
    from spark_graft.operators.similarity import (
        EMB_DIM,
        N_PROBES,
        _planes,
        _probe_vector,
        lsh_bucket_col,
    )

    e = table(spark, sf_dir, "embeddings")
    planes = _planes(EMB_DIM)
    out = str(tmp_path / "emb_by_bucket")
    e.withColumn("bucket", lsh_bucket_col(F.col("embedding"), planes)).write.partitionBy(
        "bucket"
    ).mode("overwrite").parquet(out)

    probe = _probe_vector(spark, sf_dir)
    margins = [sum(a * b for a, b in zip(probe, p)) for p in planes]
    pb = sum(2**i for i, m in enumerate(margins) if m >= 0)
    flips = sorted(range(len(planes)), key=lambda p: abs(margins[p]))[:N_PROBES]
    buckets = [pb] + [pb ^ (1 << p) for p in flips]

    back = spark.read.parquet(out)
    cand = back.filter(F.col("bucket").isin(buckets))
    plan = explain_str(cand, "formatted")
    pf_line = plan.split("PartitionFilters", 1)[1].split("\n", 1)[0]
    assert "bucket" in pf_line, plan
    # and the probed layout returns exactly the rows the in-plan
    # bucketing computes
    inplan = e.withColumn("bucket", lsh_bucket_col(F.col("embedding"), planes)).filter(
        F.col("bucket").isin(buckets)
    )
    assert cand.count() == inplan.count() > 0
