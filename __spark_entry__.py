"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship min-unique-prefix on sf0.001.
queries()    — every declared operator from SURVEY.md §2b, backed by
               spark_graft.registry (each @query registration).
oracle_sql() — the DuckDB twin of EVERY query (none omitted since
               round 6): engine-specific sketches verify through
               keys+bounds contracts, and the ANN variants re-derive
               their public md5 plane/centroid arithmetic in SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import spark_graft
from spark_graft.registry import REGISTRY

spark_graft.load_all_queries()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (ref main.cpp:15-73): minimal unique prefix length
    over customer.c_name at sf0.001, via the iterative driver loop."""
    return REGISTRY["min_unique_prefix"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
