"""Text-line source/sink — the reference's native format.

read_lines reproduces the reference's record model exactly: one line ->
one record, blank lines dropped (MapReduce.h:227-241 assembles lines and
skips empties). Spark's text source already performs the newline-aligned
byte-range splitting the reference hand-rolls (MapReduce.h:136-176), and
it parallelizes per split — `mappers_count` becomes partition count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_lines(spark: SparkSession, path: str, min_partitions: int | None = None) -> DataFrame:
    """One row per non-empty line, column `value: string`."""
    df = spark.read.text(path)
    if min_partitions and df.rdd.getNumPartitions() < min_partitions:
        df = df.repartition(min_partitions)
    return df.filter(F.length(F.col("value")) > 0)


def write_lines(df: DataFrame, path: str, single_file: bool = False) -> None:
    """Sink rows of a single string column as text lines.

    The reference's sink concatenates per-reducer outputs into one file
    (MapReduce.h:109-124); `single_file=True` mirrors that via
    coalesce(1) — only sane for small results, exactly like the original.
    """
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").text(path)
