"""Reusable column expressions (all JVM-side `pyspark.sql.functions`).

Everything here stays inside whole-stage codegen — no Python UDFs. These
are the shared building blocks of the declared queries, written so the
same semantics are expressible in ANSI SQL for the DuckDB oracle:

- decimal-exact aggregates (dsum/davg): float sums are order-dependent,
  so hash-matching an oracle requires summing exact decimals and casting
  the final value back to double.
- tokenization used by word_count / text analysis (regex split, matching
  DuckDB's regexp_split_to_array semantics).
- cosine similarity over array<float> in pure SQL expressions
  (zip_with + aggregate), computed in double in array order so Spark and
  DuckDB produce bit-identical results.
- md5-based MinHash: engine-portable hashing (Spark's murmur3 `hash()`
  and DuckDB's `hash()` differ; md5 hex strings are identical), with the
  minimum taken in lexicographic string order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------- aggregates


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Exact decimal sum of a double column, returned as double.

    Order-insensitive (decimal addition is associative), so the result is
    identical across Spark partitionings AND matches DuckDB's decimal sum.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def davg(col: Column | str, scale: int = 2, round_to: int = 6) -> Column:
    """Deterministic average: exact decimal sum / count, rounded.

    decimal->double conversion and double division are IEEE-deterministic,
    so both engines produce the same double before rounding.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        F.sum(c.cast(f"decimal(18,{scale})")).cast("double") / F.count(c), round_to
    )


# ------------------------------------------------------------- tokenization

TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokens(col: Column | str) -> Column:
    """array<string> of lowercase alphanumeric tokens, empties removed.

    Oracle equivalent: list_filter(regexp_split_to_array(lower(x),
    '[^a-z0-9]+'), t -> t <> '').
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_RE), lambda t: t != F.lit(""))


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """array<string> of word n-gram shingles (space-joined), distinct.

    Built with transform over token indexes — no explode needed until the
    caller chooses to; keeps shingling a narrow, codegen'd operation.
    """
    toks = tokens(col)
    # guard: sequence(1, 0) is DESCENDING [1,0] in Spark, not empty —
    # docs with fewer than n tokens must yield [] explicitly
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.array_distinct(F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n))))
    )


# ---------------------------------------------------------------- similarity


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<float> columns, accumulated in double in
    array order (deterministic, matches DuckDB list_dot_product on
    DOUBLE[] casts)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# ------------------------------------------------------------------ hashing


def md5_min_signature(shingles: Column, perm: int) -> Column:
    """One MinHash component: min over shingles of md5(perm || ':' || s).

    Using the md5 *hex string* minimum (lexicographic) makes the
    signature engine-portable: DuckDB computes the identical value with
    min(md5(perm || ':' || s)). Seeded by the perm index — a fixed,
    public hash family.
    """
    return F.array_min(
        F.transform(shingles, lambda s: F.md5(F.concat(F.lit(f"{perm}:"), s)))
    )
