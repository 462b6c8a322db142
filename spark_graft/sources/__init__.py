"""Sources & sinks.

The reference's only source is a newline-delimited text file, scanned with
byte-range splits aligned backward to '\\n' (MapReduce.h:136-176, 219-245);
its only sink is a concatenated text file (MapReduce.h:109-124). Spark's
FileSourceScanExec provides exactly that split logic for free; on top we
standardize the driver-provided parquet star schema (TESTDATA.md).
"""

from spark_graft.sources.formats import (
    read_csv,
    read_jsonl,
    read_orc,
    write_csv,
    write_jsonl,
    write_orc,
)
from spark_graft.sources.tables import TABLES, table, load_all
from spark_graft.sources.text import read_lines, write_lines

__all__ = [
    "TABLES",
    "table",
    "load_all",
    "read_lines",
    "write_lines",
    "read_csv",
    "write_csv",
    "read_jsonl",
    "write_jsonl",
    "read_orc",
    "write_orc",
]
