"""Property-based tests (hypothesis): invariants that must hold for any
input, run on small generated datasets through the real Spark engine."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from spark_graft.compat.mapreduce import mapreduce
from spark_graft.functions import dsum, tokens

lines = st.lists(
    st.text(alphabet="abcdef", min_size=0, max_size=6), min_size=0, max_size=25
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@given(data=lines)
@SETTINGS
def test_shim_dup_detection_equals_python(spark, data):
    """Compat shim's distributed duplicate check == python set check,
    for any partitioning."""
    non_empty = [l for l in data if l]
    out = mapreduce(
        spark, data, lambda l: (l, "1"), lambda prev, kv: prev != kv[0], reducers_count=3
    )
    has_dups = len(set(non_empty)) != len(non_empty)
    assert ("0" in out) == has_dups


@given(data=st.lists(st.integers(min_value=-10**6, max_value=10**6), min_size=1, max_size=40))
@SETTINGS
def test_window_sum_consistent_with_group_sum(spark, data):
    """Last running-sum value per key == groupBy sum (window/agg
    consistency)."""
    from pyspark.sql.window import Window

    rows = [(i % 3, i, v) for i, v in enumerate(data)]
    df = spark.createDataFrame(rows, "k int, seq int, v long")
    w = Window.partitionBy("k").orderBy("seq").rowsBetween(Window.unboundedPreceding, 0)
    last = (
        df.withColumn("rs", F.sum("v").over(w))
        .groupBy("k")
        .agg(F.max_by("rs", "seq").alias("total"))
    )
    direct = df.groupBy("k").agg(F.sum("v").alias("total"))
    assert sorted(map(tuple, last.collect())) == sorted(map(tuple, direct.collect()))


@given(data=lines)
@SETTINGS
def test_dedup_idempotent(spark, data):
    """dropDuplicates twice == once (idempotence)."""
    df = spark.createDataFrame([(l,) for l in data] or [("",)], "s string")
    once = sorted(r[0] for r in df.dropDuplicates().collect())
    twice = sorted(r[0] for r in df.dropDuplicates().dropDuplicates().collect())
    assert once == twice


@given(data=st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=1, max_size=30))
@SETTINGS
def test_dsum_partition_invariance(spark, data):
    """Decimal-exact sum is identical under any repartitioning — the
    property float sums lack and our oracle hashing relies on."""
    df = spark.createDataFrame([(v,) for v in data], "x double")
    a = df.agg(dsum("x").alias("s")).collect()[0]["s"]
    b = df.repartition(5).agg(dsum("x").alias("s")).collect()[0]["s"]
    assert a == b


@given(ids=st.lists(st.integers(min_value=0, max_value=50), min_size=0, max_size=12))
@SETTINGS
def test_pair_combinations_equals_itertools(spark, ids):
    """pair_combinations == itertools.combinations over sorted distinct
    ids, for any bucket contents."""
    import itertools

    from spark_graft.operators.dedup import pair_combinations

    df = spark.createDataFrame([(ids,)], "ds array<bigint>")
    got = sorted(
        (r["p"]["a"], r["p"]["b"])
        for r in df.select(F.explode(pair_combinations(F.col("ds"))).alias("p")).collect()
    )
    # array_sort keeps duplicates; i<j positional pairs over the sorted list
    expect = sorted(itertools.combinations(sorted(ids), 2))
    assert got == expect


@given(texts=st.lists(st.text(alphabet="ab c", min_size=0, max_size=30), min_size=1, max_size=8))
@SETTINGS
def test_shingles_match_python_reference(spark, texts):
    """Staged shingling == a plain python n-gram implementation for any
    text (the staging is performance-only, never semantic)."""
    import re

    from spark_graft.functions import shingles_from_tokens, tokens

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    got = {
        r["i"]: sorted(r["sh"])
        for r in df.select("i", tokens("text").alias("toks"))
        .select("i", shingles_from_tokens("toks", 3).alias("sh"))
        .collect()
    }
    for i, t in enumerate(texts):
        toks = [w for w in re.split("[^a-z0-9]+", t.lower()) if w]
        expect = sorted({" ".join(toks[j : j + 3]) for j in range(len(toks) - 2)})
        assert got[i] == expect, (t, got[i], expect)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10**6)), min_size=1, max_size=40
    )
)
@SETTINGS
def test_asof_matches_python_reference(spark, rows):
    """The union+window as-of join == a per-row python scan for any
    event sequence (ties included: latest at-or-before, max id wins)."""
    from pyspark.sql.window import Window

    data = [(i, uid, ts, "click" if i % 2 == 0 else "purchase") for i, (uid, ts) in enumerate(rows)]
    df = spark.createDataFrame(data, "event_id long, user_id long, ts long, event_type string")
    sided = df.filter(F.col("event_type").isin("purchase", "click")).select(
        "event_id", "user_id", "ts",
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("side"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        sided.select(
            "event_id", "user_id", "ts", "side",
            F.last(F.when(F.col("side") == 0, F.struct("ts", "event_id")), ignorenulls=True)
            .over(w).alias("m"),
        )
        .filter(F.col("side") == 1)
        .select("event_id", F.col("m.event_id").alias("click_id"))
    )
    got = {r["event_id"]: r["click_id"] for r in out.collect()}
    clicks = [(e, u, t) for (e, u, t, k) in data if k == "click"]
    for e, u, t, k in data:
        if k != "purchase":
            continue
        cand = [(ct, ce) for (ce, cu, ct) in clicks if cu == u and ct <= t]
        expect = max(cand)[1] if cand else None
        assert got[e] == expect


@given(texts=st.lists(st.text(alphabet="ab c", min_size=0, max_size=40), min_size=1, max_size=6))
@SETTINGS
def test_minhash_signature_matches_python_reference(spark, texts):
    """The fused aggregate-min minhash (minhash_doc_table) == a plain
    python implementation of the same double-hash family, for any text.
    Pins that the codegen'd min() rewrite is arithmetic-identical to
    min-over-the-shingle-set (docs with no shingles drop out in both)."""
    import hashlib
    import re

    from spark_graft.operators.dedup import MINHASH_PRIME, N_PERMS, minhash_doc_table

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {
        r["doc_id"]: [r[f"mh{p}"] for p in range(N_PERMS)]
        for r in minhash_doc_table(df).collect()
    }
    for i, t in enumerate(texts):
        toks = [w for w in re.split("[^a-z0-9]+", t.lower()) if w]
        sh = {" ".join(toks[j : j + 3]) for j in range(len(toks) - 2)}
        if not sh:
            assert i not in got, (t, got.get(i))
            continue
        hs = [
            (int(hashlib.md5(s.encode()).hexdigest()[:8], 16),
             int(hashlib.md5(s.encode()).hexdigest()[8:16], 16))
            for s in sh
        ]
        expect = [min((h1 + p * h2) % MINHASH_PRIME for h1, h2 in hs) for p in range(N_PERMS)]
        assert got[i] == expect, (t, got[i], expect)
