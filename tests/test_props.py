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
