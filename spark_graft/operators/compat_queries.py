"""Declared queries exercising the compat shim and the UDF surface."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_graft.compat.mapreduce import mapreduce
from spark_graft.registry import query
from spark_graft.sources import table


@query(
    "udf_compat",
    oracle="""
        SELECT (count(DISTINCT substr(c_name, 1, 5)) = count(*)) AS all_distinct_at_5
        FROM customer
    """,
)
def udf_compat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's flagship duplicate check at fixed prefix length 5,
    executed on the RDD compat shim (exact reference semantics: 1:1 map,
    key-grouped sorted shuffle, previous-key reducer, per-partition
    bool-AND — see spark_graft.compat.mapreduce). Oracle-checked against
    the algebraic form, proving the shim computes what main.cpp computes."""
    names = table(spark, sf_dir, "customer").select("c_name")
    outputs = mapreduce(
        spark,
        names,
        mapper=lambda line: (line[:5], "1"),  # main.cpp:35-38 at L=5
        reducer=lambda prev, kv: prev != kv[0],  # main.cpp:44-49
        reducers_count=4,
    )
    all_distinct = all(o == "1" for o in outputs)
    return spark.createDataFrame([(all_distinct,)], "all_distinct_at_5 boolean")
