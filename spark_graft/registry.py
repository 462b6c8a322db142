"""Declared query contract: name -> (Spark callable, DuckDB oracle SQL).

Every operator we claim (SURVEY.md §2b) registers here via @query. The
driver (and our own pytest suite) runs the Spark callable and the oracle
SQL side-by-side and hash-matches the results, so the registration IS the
declaration of correctness. Queries whose semantics are not
SQL-expressible (approximate sketches, LSH with engine-specific hashing,
streaming) register with oracle=None and get a weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB over the same parquet views
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()) -> Callable[[QueryFn], QueryFn]:
    """Register fn under `name` with its DuckDB oracle SQL (or None)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "", tags=tags)
        return fn

    return deco
