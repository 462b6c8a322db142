"""Scalar function library: string / datetime / math / JSON / array.

Generalizes the reference's only scalar op — substr in the flagship
mapper (main.cpp:35-38) — to the full built-in function surface. All
expressions are JVM-side and codegen'd; nothing here leaves
WholeStageCodegen, so these run at columnar scan speed on any data size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_graft.registry import query
from spark_graft.sources import table


@query(
    "fn_string",
    oracle=r"""
        SELECT p_partkey,
               upper(substr(p_name, 1, 10)) AS name10,
               trim(concat(p_brand, ' ', p_type)) AS brand_type,
               regexp_extract(p_name, '^(\w+)', 1) AS first_word,
               length(p_name) AS name_len
        FROM part
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """substring/upper/trim/concat/regexp_extract/length (ref R13's
    substr generalized; Spark substring clamps like std::substr)."""
    return table(spark, sf_dir, "part").select(
        "p_partkey",
        F.upper(F.substring("p_name", 1, 10)).alias("name10"),
        F.trim(F.concat_ws(" ", "p_brand", "p_type")).alias("brand_type"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.length("p_name").alias("name_len"),
    )


@query(
    "fn_datetime",
    oracle="""
        SELECT o_orderkey,
               year(o_orderdate) AS o_year,
               month(o_orderdate) AS o_month,
               date_trunc('month', o_orderdate) AS month_start,
               datediff('day', DATE '1995-01-01', o_orderdate) AS days_since_epoch
        FROM orders
    """,
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/date_trunc/datediff. Session TZ pinned to UTC so
    truncation boundaries match the oracle exactly."""
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch"
        ),
    )


@query(
    "fn_math_decimal",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(round(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                               AS DECIMAL(18,6)), 2) AS DOUBLE) AS revenue,
               CAST(ceil(l_quantity / 7.0) AS BIGINT) AS qty_bucket,
               abs(l_discount - 0.05) AS disc_dev,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS price_dec
        FROM lineitem
    """,
)
def fn_math_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/ceil/abs + the TPC-H revenue expression + decimal cast.
    Per-row double arithmetic is IEEE-deterministic, so row-level math
    hash-matches without decimal tricks."""
    return table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        # exact-decimal capture (scale 6 holds the full product of
        # 2-decimal inputs) BEFORE rounding to 2: decimal HALF_UP agrees
        # across engines; rounding the raw double does not at .xx5000
        F.round(
            (F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))).cast(
                "decimal(18,6)"
            ),
            2,
        )
        .cast("double")
        .alias("revenue"),
        F.ceil(F.col("l_quantity") / 7.0).alias("qty_bucket"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        # decimal cast demo; final type double (decimal round-trips to
        # engine-specific pandas types, double is portable)
        F.col("l_extendedprice").cast("decimal(18,2)").cast("double").alias("price_dec"),
    )


@query(
    "fn_json",
    oracle="""
        SELECT event_id,
               -- integral-pattern guard before TRY_CAST: DuckDB
               -- string->int casting ROUNDS ('2.7' -> 3) where Spark's
               -- try_cast yields NULL
               TRY_CAST(CASE WHEN props IS NOT NULL AND json_valid(props)
                              AND regexp_matches(trim(coalesce(json_extract_string(props, '$.k'), '')),
                                                 '^[+-]?[0-9]+$')
                             THEN json_extract_string(props, '$.k') END AS INT) AS k_val,
               (CASE WHEN props IS NOT NULL AND json_valid(props)
                     THEN json_extract_string(props, '$.k') END IS NOT NULL) AS has_k
        FROM events
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from events.props (semi-structured column).
    get_json_object evaluates without full schema inference — per-row,
    codegen'd, no driver-side sampling pass.

    Malformed-input contract (a 100 TB event stream WILL contain broken
    props): Spark's get_json_object returns NULL for NULL or unparseable
    input; DuckDB's json functions RAISE on malformed JSON, so the
    oracle guards with json_valid to pin the same malformed -> NULL
    semantics (exercised by the adversarial events differential)."""
    k = F.get_json_object("props", "$.k")
    return table(spark, sf_dir, "events").select(
        "event_id",
        # try_cast, not cast: under ANSI a non-integral k ('{"k":"abc"}',
        # '{"k":2.7}') would RAISE mid-scan in both engines; the declared
        # degradation is NULL (TRY_CAST in the oracle mirrors it)
        k.try_cast("int").alias("k_val"),
        k.isNotNull().alias("has_k"),
    )


@query(
    "fn_array",
    oracle="""
        SELECT vec_id,
               len(embedding) AS dim,
               round(CAST(embedding[1] AS DOUBLE), 4) AS first_val,
               round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                                  x -> x * x))), 4) AS l2_norm
        FROM embeddings
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array ops over array<float> embeddings: size, element access, and
    an L2 norm folded entirely in SQL expressions (no UDF) — the same
    higher-order-function machinery the similarity operators build on."""
    from spark_graft.functions import norm

    return table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 4).alias("first_val"),
        F.round(norm(F.col("embedding")), 4).alias("l2_norm"),
    )


@query(
    "fn_map",
    oracle="""
        WITH g AS (
            SELECT event_id, props,
                   -- json_type must stay inside CASE: DuckDB's AND does
                   -- not short-circuit, and json_type RAISES on
                   -- malformed input (json_valid alone is total).
                   -- Spark's from_json('map<string,int>') NULLs the
                   -- WHOLE map if ANY value fails int parsing, so ok
                   -- additionally requires every value to be a JSON
                   -- null or an int32-range integer (keys are quoted
                   -- into the path so dotted keys don't split it, and
                   -- \\ / " inside a key are path-escaped so a key like
                   -- a"b or c\\d can't break the path — an unescaped
                   -- quote RAISES a JSON path error mid-query where
                   -- Spark's from_json parses any key fine).
                   coalesce(
                       CASE WHEN props IS NOT NULL AND json_valid(props) THEN
                           CASE WHEN json_type(props) = 'OBJECT' THEN
                               len(list_filter(
                                   list_transform(
                                       json_keys(props),
                                       kraw -> '$."' ||
                                               replace(replace(kraw, '\\', '\\\\'),
                                                       '"', '\\"') || '"'),
                                   kk ->
                                   NOT (json_type(props, kk) = 'NULL'
                                        OR (json_type(props, kk) IN ('BIGINT', 'UBIGINT')
                                            AND TRY_CAST(json_extract_string(props, kk) AS INT)
                                                IS NOT NULL)))) = 0
                           ELSE false END
                       END, false) AS ok
            FROM events
        )
        SELECT event_id,
               CASE WHEN ok THEN
                   coalesce(array_to_string(list_sort(CAST(json_keys(props) AS VARCHAR[])), ','), '')
               END AS ks,
               TRY_CAST(CASE WHEN ok THEN json_extract_string(props, '$.k') END AS INT) AS k_val,
               CASE WHEN ok THEN len(json_keys(props)) END AS n_keys
        FROM g
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: parse the JSON props into map<string,int> and
    operate on it natively (map_keys, element_at, size) — the pattern
    for ragged per-row key-value metadata where a struct schema would be
    too rigid. from_json to a map needs no schema inference pass.

    Malformed-input contract: Spark's from_json yields a NULL map for
    NULL, unparseable, or non-object input (so every derived column is
    NULL); DuckDB's json functions RAISE on malformed JSON, so the
    oracle guards with json_valid + json_type = 'OBJECT' to pin the
    identical degradation (adversarial events differential)."""
    m = F.from_json("props", "map<string,int>")
    return table(spark, sf_dir, "events").select(
        "event_id",
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("ks"),
        F.element_at(m, "k").alias("k_val"),
        F.size(m).alias("n_keys"),
    )


@query(
    "fn_struct",
    oracle="""
        SELECT o_orderkey,
               struct_extract(
                   {'status': o_orderstatus, 'total': o_totalprice}, 'status')
                   AS status,
               round(struct_extract(
                   {'status': o_orderstatus, 'total': o_totalprice}, 'total'), 2)
                   AS total,
               struct_extract(struct_pack(y := year(o_orderdate),
                                          m := month(o_orderdate)), 'y') AS y,
               struct_extract(struct_pack(y := year(o_orderdate),
                                          m := month(o_orderdate)), 'm') AS m
        FROM orders WHERE o_orderkey <= 1000
    """,
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StructType round-trip: build nested structs (named_struct), read
    fields back out — the type-system row the fn_* family was missing.
    Output columns are SCALARS extracted from the structs, never struct
    columns themselves: the driver's pandas canonicalizer cannot
    sort/hash composite values (the fn_map lesson — its map column
    failed round 1 with 'unhashable list')."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    packed = o.select(
        "o_orderkey",
        F.struct(
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("total"),
        ).alias("os"),
        F.struct(
            F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
        ).alias("ym"),
    )
    return packed.select(
        "o_orderkey",
        F.col("os.status").alias("status"),
        F.round(F.col("os.total"), 2).alias("total"),
        F.col("ym.y").alias("y"),
        F.col("ym.m").alias("m"),
    )


def _fn_url_oracle() -> str:
    from spark_graft.operators.dedup import URL_RAW_DUCK, url_norm_duck

    return f"""
        WITH raw AS (SELECT doc_id, {URL_RAW_DUCK} AS url FROM documents)
        SELECT doc_id,
               regexp_extract(url, '^([^:]+)://', 1) AS protocol,
               regexp_extract(url, '^[^:]+://([^/?#]+)', 1) AS host,
               regexp_extract(url, '^[^:]+://[^/?#]+([^?#]*)', 1) AS path,
               nullif(regexp_extract(url, '\\?([^#]*)', 1), '') AS query,
               nullif(regexp_extract(url, '[?&]utm_source=([^&#]*)', 1), '')
                   AS utm_source,
               {url_norm_duck('url')} AS canon
        FROM raw
    """


@query("fn_url", oracle=_fn_url_oracle())
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing family: parse_url(PROTOCOL/HOST/PATH/QUERY) plus
    keyed query-parameter extraction and the canonical form from
    `normalize_url` (operators.dedup) — the scalar surface behind the
    dedup_url gate, over the same deterministic raw-URL synthesis.
    parse_url is JVM-side and codegen'd; DuckDB has no URL parser, so
    the oracle rebuilds each component with anchored regexes (absent
    query/param normalized to NULL on both engines via nullif/
    parse_url's own NULL)."""
    from spark_graft.operators.dedup import _URL_RAW_SQL, normalize_url

    docs = table(spark, sf_dir, "documents")
    url = F.expr(_URL_RAW_SQL)
    return docs.select(
        "doc_id",
        F.parse_url(url, F.lit("PROTOCOL")).alias("protocol"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("utm_source")).alias(
            "utm_source"
        ),
        normalize_url(url).alias("canon"),
    )
