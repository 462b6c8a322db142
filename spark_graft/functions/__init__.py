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
- engine-portable hashing built on md5 (Spark's murmur3 `hash()` and
  DuckDB's `hash()` differ; md5 digests are identical) — the MinHash
  family itself lives in operators.dedup (double-hash construction).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------- aggregates


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Exact decimal sum of a double column, returned as double.

    Order-insensitive (decimal addition is associative), so the result is
    identical across Spark partitionings AND matches DuckDB's decimal sum.

    The final decimal->double conversion goes through exact int64
    "scaled units" (sum * 10^scale, integral by construction): a direct
    CAST(decimal AS DOUBLE) is only bit-portable while the scaled value
    fits 2^53 — beyond that Spark converts via BigDecimal.doubleValue
    (correctly rounded) while DuckDB divides the int128 payload by
    10^scale in floats (double-rounds), and the two drift by 1 ulp
    (first observed on sum_charge at sf1, ~2.7e16 micro-units). int64 ->
    double is a single IEEE rounding in every engine, and the final
    division by the exact power of ten is one more — an identical
    sequence on both sides, bit-equal up to ±2^63 units (~9.2e12 at
    scale 6; the exact decimal itself, which production would keep,
    never degrades).

    Past ±2^63 scaled units the bigint cast would (non-ANSI) return
    NULL on Spark while DuckDB raises — a silent-NULL production sum.
    The regime is guarded LOUDLY instead: the cast is gated on
    |sum| <= (2^63-1)/10^scale and raises otherwise, telling the
    caller to lower `scale` (more headroom, coarser units) or keep the
    exact decimal. The guard is one abs-compare per GROUP (not per
    row), after aggregation — free."""
    c = F.col(col) if isinstance(col, str) else col
    f = 10**scale
    s = F.sum(c.cast(f"decimal(18,{scale})"))
    units = F.when(
        F.abs(s) > F.lit((2**63 - 1) // f),
        F.raise_error(
            F.lit(
                f"dsum overflow: |sum| * 10^{scale} exceeds 2^63 scaled "
                "units; lower `scale` or keep the exact decimal"
            )
        ).cast("bigint"),
    ).otherwise((s * f).cast("bigint"))
    return units.cast("double") / F.lit(float(f))


def dsum_sql(expr: str, scale: int = 2) -> str:
    """DuckDB oracle fragment mirroring `dsum` bit-for-bit (see its
    docstring for why the conversion routes through int64 units)."""
    f = 10**scale
    return (
        f"(CAST(CAST(sum(CAST({expr} AS DECIMAL(18,{scale}))) * {f} AS BIGINT) "
        f"AS DOUBLE) / {f}.0)"
    )


def davg(col: Column | str, scale: int = 2, round_to: int = 6) -> Column:
    """Deterministic average: exact decimal sum (as the bit-portable
    double `dsum` produces) / count, rounded."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(dsum(c, scale) / F.count(c), round_to)


def davg_sql(expr: str, scale: int = 2, round_to: int = 6) -> str:
    """DuckDB oracle fragment mirroring `davg` bit-for-bit."""
    return f"round({dsum_sql(expr, scale)} / count({expr}), {round_to})"


# ------------------------------------------------------------- tokenization

TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokens(col: Column | str) -> Column:
    """array<string> of lowercase alphanumeric tokens, empties removed.

    Oracle equivalent: list_filter(regexp_split_to_array(lower(x),
    '[^a-z0-9]+'), t -> t <> '').
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_RE), lambda t: t != F.lit(""))


def shingles_from_tokens(toks: Column | str, n: int = 3) -> Column:
    """array<string> of word n-gram shingles (space-joined), distinct,
    from an ALREADY-MATERIALIZED token-array column.

    PERFORMANCE CONTRACT: pass an attribute (a column produced by its
    own upstream projection), not the `tokens(...)` expression tree.
    Higher-order functions are interpreted (no whole-stage codegen, no
    common-subexpression elimination), so an inlined argument tree is
    re-evaluated on EVERY lambda invocation — with `tokens(text)` inline
    that re-runs the regex tokenizer once per shingle index, O(tokens^2)
    per document (measured 8.8x slower at sf0.1). Staged through a
    projection, each reference is an O(1) attribute lookup.
    """
    tc = F.col(toks) if isinstance(toks, str) else toks
    # guard: sequence(1, 0) is DESCENDING [1,0] in Spark, not empty —
    # docs with fewer than n tokens must yield [] explicitly
    idx = F.sequence(F.lit(1), F.size(tc) - (n - 1))
    return F.when(F.size(tc) < n, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(
                idx,
                # element_at per gram word: O(n) per shingle, vs slice()
                # allocating a subarray per index
                lambda i: F.concat_ws(
                    " ", *[F.element_at(tc, i + F.lit(j)) for j in range(n)]
                ),
            )
        )
    )


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Shingles straight from a text column. Convenience form for small
    inputs/tests; hot paths must stage `tokens(col)` in a projection and
    call `shingles_from_tokens` (see its performance contract)."""
    return shingles_from_tokens(tokens(col), n)


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
    """Cosine similarity, clamped to [-1, 1] exactly like DuckDB's
    list_cosine_similarity: float rounding can push the raw ratio of
    near-parallel vectors past ±1 (measured: 1.0 + 2 ulp on parallel
    constant-fill float32 vectors), and an unclamped value sorts ABOVE
    a mathematically-tied exact 1.0 — flipping top-k ranks vs the
    oracle. Callers must exclude zero-norm vectors (similarity's
    NONZERO contract) — the division is undefined for them."""
    raw = dot(a, b) / (norm(a) * norm(b))
    return F.least(F.greatest(raw, F.lit(-1.0)), F.lit(1.0))


# ------------------------------------------------------------------ hashing


def md5_bucket_raw(prefix: str, key_col: Column) -> Column:
    """Engine-portable non-negative bigint from md5(prefix || key) —
    the base of every deterministic assignment (sampling, splits,
    shards). DuckDB reproduces it with
    CAST('0x' || substr(md5(...), 1, 8) AS BIGINT). Property-tested
    against a pure-Python reference in tests/test_props.py."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(prefix), key_col.cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")


def md5_bucket(prefix: str, key_col: Column) -> Column:
    """0..99 bucket form of `md5_bucket_raw`."""
    return md5_bucket_raw(prefix, key_col) % 100




def decimal_scaled_div_fx(num: str, mul, den: str):
    """Int64-wrap-safe scaled integer division:
    CAST(CAST(num AS DECIMAL(38,0)) * mul div (den) AS BIGINT).

    Any `count * SCALE` with a corpus-scale count wraps int64 at
    2^63 / SCALE (~9.2e12 rows for SCALE = 10^6) — inside 100 TB
    territory — so every fixed-point share/probability/rate contract
    routes the product through decimal(38,0) (r14). Floor-div of
    nonnegative decimals equals int64 div in-range, so oracles written
    with plain `//` are unchanged. `num` and `den` are SQL fragments;
    `mul` an integer scale or a column name."""
    return F.expr(f"CAST(CAST({num} AS DECIMAL(38,0)) * {mul} div ({den}) AS BIGINT)")
