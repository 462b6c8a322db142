"""Interchange formats: CSV and JSON-lines readers/writers.

The reference's universe is newline-delimited text (MapReduce.h:219-245);
these are that idea grown up — still splittable line-oriented files Spark
scans partition-parallel, but typed. Two rules keep them 100 TB-safe:

- ALWAYS pass an explicit schema on read. inferSchema/schema-inference
  costs a full extra pass over the data before the real scan even
  starts, and a sampled inference can silently mistype a column that
  only misbehaves in the unread tail.
- These are interchange formats, not analytics formats: no column
  pruning, no predicate pushdown into row-oriented text, no statistics.
  Land data in parquet (sources.tables) for anything queried twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_csv(df: DataFrame, path: str) -> None:
    """Header'd, overwrite-mode CSV — one file per partition, written in
    parallel from the executors (never a driver-side collect)."""
    df.write.mode("overwrite").option("header", True).csv(path)


def read_csv(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    """Explicit-schema CSV scan. `schema` is required on purpose —
    see the module contract."""
    return spark.read.schema(schema).option("header", True).csv(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    """Newline-delimited JSON (one object per line — the splittable
    kind; a single top-level JSON array would serialize the scan)."""
    df.write.mode("overwrite").json(path)


def read_jsonl(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    """Explicit-schema JSON-lines scan."""
    return spark.read.schema(schema).json(path)


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink (native Spark, no extra packages). Unlike the text
    formats above, ORC is columnar with embedded statistics: reads get
    column pruning, predicate pushdown, and stripe skipping — the same
    scan-side behaviors the parquet tables rely on. Offered because
    mixed lakes are real; parquet stays this repo's default."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan. No schema parameter on purpose — columnar self-described
    metadata makes reading the footer free, unlike CSV/JSON inference's
    full data pass."""
    return spark.read.orc(path)
