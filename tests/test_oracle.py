"""Oracle-differential tests: every declared query runs on Spark AND as
ANSI SQL on DuckDB over the same parquet; results must match exactly
(the driver's t2 gate, run locally before declaring anything)."""

from __future__ import annotations

import pytest

from spark_graft.registry import REGISTRY
from tests.compare import assert_frames_match

ORACLED = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_match(name, spark, oracle, sf_dir):
    spec = REGISTRY[name]
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    oracle_pdf = oracle.execute(spec.oracle).df()
    assert_frames_match(spark_pdf, oracle_pdf, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(name, spark, sf_dir):
    """Weaker check for non-SQL-expressible ops: runs, stable schema,
    sane row count."""
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    rows = df.count()
    assert rows >= 0
    assert len(df.schema.fields) > 0
    # rows-only queries should still produce something at test scale
    assert rows > 0, f"{name} returned no rows at {sf_dir}"


def test_minhash_knob_off_default_stays_oracle_consistent(sf_dir):
    """The production LSH knob (SPARK_GRAFT_MINHASH_PERMS/BANDS,
    dedup.py — e.g. 60/12 for low-entropy corpora) is documented as
    keeping every consumer AND its DuckDB oracle derived from the one
    setting; this proves it by EXECUTING an off-default setting (24
    perms, 6 bands, r=4) end-to-end. The knob is read at module import
    (the oracle SQL f-strings it), so the off-default run is a
    subprocess with the env set — the same way CI or a production job
    would flip it."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = """
import sys
sys.path.insert(0, {repo!r}); sys.path.insert(0, {tests!r})
import duckdb
from pyspark.sql import SparkSession

import spark_graft
from spark_graft.operators import dedup
from compare import assert_frames_match

assert (dedup.N_PERMS, dedup.N_BANDS) == (24, 6), (dedup.N_PERMS, dedup.N_BANDS)
spark_graft.load_all_queries()
spark = (SparkSession.builder.master("local[4]")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.shuffle.partitions", "8").getOrCreate())
con = duckdb.connect()
con.execute("CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
for name in ("dedup_minhash", "dedup_clusters"):
    spec = spark_graft.REGISTRY[name]
    assert_frames_match(
        spec.fn(spark, {sf!r}).toPandas(), con.execute(spec.oracle).df(), name
    )
    print(name, "oracle-consistent at 24/6")
""".format(repo=repo, tests=os.path.join(repo, "tests"), sf=sf_dir)
    env = dict(
        os.environ, SPARK_GRAFT_MINHASH_PERMS="24", SPARK_GRAFT_MINHASH_BANDS="6"
    )
    proc = subprocess.run(
        [sys.executable, "-c", script], env=env, capture_output=True, text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "dedup_minhash oracle-consistent at 24/6" in proc.stdout


# Documents-only oracled queries (their SQL references no other table),
# re-derived here so a new documents-family query is auto-enrolled.
import re as _re

_OTHER_TABLES = ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "embeddings")
DOC_ONLY = sorted(
    n for n, s in REGISTRY.items()
    if s.oracle is not None
    and "documents" in s.oracle.lower()
    and not any(_re.search(rf"\b{t}\b", s.oracle.lower()) for t in _OTHER_TABLES)
)


def test_documents_family_on_adversarial_corpus(spark, tmp_path_factory):
    """Fixture-independence net: every documents-only oracled query must
    hash-match DuckDB on a handcrafted adversarial corpus the fixtures
    don't exhibit — empty texts, punctuation-only docs, one massive
    repeated token (overlap-merge and span-dedup stress), single-char
    docs, digit runs, a long mixed doc, and exact duplicates. Catches
    fixture-shaped assumptions (e.g. 'every doc tokenizes non-empty',
    'vocab is diverse', 'no doc is a single token') that the sf sweeps
    cannot."""
    import duckdb

    docs = [
        "",                                     # empty text
        "...!!!,,,   ---",                      # tokenizes to nothing
        "a " * 400,                             # one token, massively repeated
        "x",                                    # single 1-char token
        "7 77 777 7777 77777",                  # digit tokens
        ("the quick brown fox jumps over the lazy dog " * 30).strip(),
        "dup dup dup",                          # exact duplicate pair...
        "dup dup dup",                          # ...same text, new doc_id
        "alpha beta gamma alpha beta gamma alpha beta",  # period-2/3 repeats
        "Mixed CASE Tokens MIXED case tokens",  # case folding
    ]
    d = tmp_path_factory.mktemp("advdocs")
    spark.createDataFrame(
        [
            (i, t, ["en", "de", "fr"][i % 3], ["web", "books"][i % 2], len(t))
            for i, t in enumerate(docs)
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'"
    )
    for name in DOC_ONLY:
        spec = REGISTRY[name]
        spark_pdf = spec.fn(spark, str(d)).toPandas()
        oracle_pdf = con.execute(spec.oracle).df()
        assert_frames_match(spark_pdf, oracle_pdf, f"adversarial:{name}")


def test_embeddings_family_on_adversarial_vectors(spark, tmp_path_factory):
    """Fixture-independence net for the embeddings family: zero-norm
    vectors (the corrupt-row shape that used to DIVIDE_BY_ZERO the
    cosine family under ANSI and NaN-diverge the numpy pair ops — both
    fixed by the similarity NONZERO contract), exact duplicates,
    antipodal pairs, orthogonal unit spikes (mass distance ties), and
    parallel vectors of different magnitude (whose raw float cosine
    exceeds 1.0 by ulps — caught the missing DuckDB-style [-1, 1]
    clamp). Every embeddings-only oracled query must hash-match."""
    import duckdb

    queries = [
        "dedup_embedding", "dedup_semantic", "kmeans_lloyd",
        "sample_coreset", "sim_ann_ivf", "sim_ann_ivf_trained",
        "sim_ann_lsh", "sim_cosine_topk", "sim_hardneg", "sim_knn_graph",
        # r16: rides dedup_embedding's blocking; the zero-norm vector
        # and the parallel different-magnitude pairs stress its NaN
        # drop and [-1, 1] clamp on the bipartite train-vs-eval path
        "decontaminate_semantic",
    ]
    DIM = 64

    def v(fill, *spikes):
        x = [fill] * DIM
        for i, val in spikes:
            x[i] = val
        return [float(t) for t in x]

    vecs = (
        [v(0.0)]                                   # zero-norm (excluded by contract)
        + [v(0.5)] * 4                             # exact duplicates
        + [v(-0.5)] * 2                            # antipodal duplicates
        + [v(0.0, (i, 1.0)) for i in range(6)]     # orthogonal spikes (distance ties)
        + [v(0.0, (0, 1.0), (1, 1e-4))]            # near-tie perturbation
        + [v(0.25), v(0.250001)]                   # near-identical pair
        + [v(0.9), v(-0.9), v(0.1)]                # parallel, different magnitudes
    )
    d = tmp_path_factory.mktemp("advemb")
    spark.createDataFrame(
        [(i, vec, i % 3) for i, vec in enumerate(vecs)],
        "vec_id bigint, embedding array<float>, label int",
    ).coalesce(1).write.parquet(str(d / "embeddings.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{d}/embeddings.parquet/*.parquet'"
    )
    for name in queries:
        spec = REGISTRY[name]
        spark_pdf = spec.fn(spark, str(d)).toPandas()
        oracle_pdf = con.execute(spec.oracle).df()
        assert_frames_match(spark_pdf, oracle_pdf, f"adversarial:{name}")


def test_events_family_on_adversarial_timeline(spark, tmp_path_factory):
    """Fixture-independence net for the events family: IDENTICAL
    timestamps within a user (every window/funnel/as-of order ties),
    events exactly on window and session-gap boundaries, microsecond
    adjacency, NULL values, and NULL / malformed / empty-object props
    (which used to RAISE in the DuckDB oracle while Spark returned NULL
    — fixed by the json_valid guards in fn_json/fn_map). Every
    events-only oracled query must hash-match."""
    import datetime as dt

    import duckdb

    queries = [
        "agg_skew_salted", "events_attribution", "events_funnel", "events_paths",
        "events_pattern", "events_retention", "fill_forward", "fn_json", "fn_map",
        "join_asof", "join_theta_range", "stream_session",
        "stream_sliding", "stream_tumbling", "ts_anomaly", "ts_resample",
        "win_gaps_islands",
    ]
    rows, eid = [], 0

    def add(ts, user, etype, value, props):
        nonlocal eid
        rows.append((eid, ts, user, etype, value, props))
        eid += 1

    T0 = dt.datetime(2024, 1, 5, 0, 0, 0)
    for et in ["click", "view", "purchase", "click", "signup"]:
        add(T0, 1, et, 1.0, '{"k": 1}')  # five events, one instant
    add(dt.datetime(2024, 1, 5, 1, 0, 0), 2, "click", 2.0, '{"k": 2}')
    add(dt.datetime(2024, 1, 5, 1, 0, 0), 2, "purchase", 2.5, '{"k": 3}')
    add(dt.datetime(2024, 1, 5, 2, 0, 0), 2, "view", None, None)
    add(dt.datetime(2024, 1, 5, 2, 0, 0, 1), 2, "purchase", 0.0, "not json")
    add(dt.datetime(2024, 1, 5, 0, 0, 0), 3, "click", -1.0, '{"k": -1}')
    add(dt.datetime(2024, 1, 5, 0, 30, 0), 3, "click", -1.0, '{"k": -1}')
    add(dt.datetime(2024, 1, 5, 1, 30, 0), 3, "purchase", 5.0, "{}")
    add(dt.datetime(2024, 1, 5, 1, 30, 0), 3, "purchase", 5.0, "{}")
    add(dt.datetime(2024, 1, 7, 12, 0, 0), 4, "signup", 9.9, '{"k": 100}')
    add(dt.datetime(2024, 1, 8, 6, 0, 0), 5, "click", 1.5, '{"k": 0}')
    add(dt.datetime(2024, 1, 8, 6, 0, 0, 1), 5, "purchase", 1.5, '{"k": 0}')
    for day in (1, 2, 8):  # retention cohort offsets 0/1/7
        add(dt.datetime(2024, 1, day, 10, 0, 0), 6, "view", 3.0, '{"k": 6}')
    # JSON value-type edges (r10): non-int values, floats (DuckDB string
    # casts ROUND '2.7' where Spark try_cast NULLs), JSON nulls, int32
    # overflow, booleans, arrays, quoted numbers, dotted keys, nesting —
    # fn_json/fn_map must degrade to NULL identically, never raise
    for j, props in enumerate([
        '{"k": "abc"}', '{"k": 2.7}', '{"k": null}', '{"k": 3000000000}',
        '{"k": true}', '[1, 2]', '{"k": "1"}', '{"a.b": 2, "k": 3}',
        '{"k": -5}', '{"k": 2147483648}', '{"nested": {"x": 1}, "k": 2}',
        '{"a": "x", "k": 1}',
        # r11: keys containing " and \ — an unescaped splice into a
        # DuckDB JSON path ('$."' || kk || '"') RAISES a path error,
        # while Spark's from_json parses any key; fn_map's oracle must
        # path-escape the key (ADVICE r10)
        '{"a\\"b": 1, "k": 2}', '{"c\\\\d": 3, "k": 4}',
        '{"q\\"": null}', '{"\\\\": 7, "mix\\"\\\\": 8}',
    ]):
        add(dt.datetime(2024, 1, 9, 1, j, 0), 7, "view", 1.0, props)

    d = tmp_path_factory.mktemp("advevents")
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    ).coalesce(1).write.parquet(str(d / "events.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet/*.parquet'"
    )
    for name in queries:
        spec = REGISTRY[name]
        spark_pdf = spec.fn(spark, str(d)).toPandas()
        oracle_pdf = con.execute(spec.oracle).df()
        assert_frames_match(spark_pdf, oracle_pdf, f"adversarial:{name}")


def test_events_pattern_null_ts_ordering(spark, tmp_path_factory):
    """Latent divergence closed in r11 (ADVICE r10): a NULL ts places
    the event FIRST in Spark's array_sort over struct(ts, event_id, sym)
    (null struct fields compare smallest) but LAST under DuckDB's
    default ORDER BY ts (NULLS LAST) — opposite ends of the symbol
    string, so a vc+p match spanning the boundary breaks the hash. The
    oracle now pins ORDER BY ts NULLS FIRST; this fixture puts a NULL-ts
    'view' ahead of a click+purchase run so the match EXISTS only under
    the NULLS FIRST order (user 1), and a NULL-ts 'purchase' that
    completes a pattern only under NULLS LAST (user 2) — wrong ordering
    on either side flips both users' match counts."""
    import datetime as dt

    import duckdb

    T = dt.datetime(2024, 2, 1, 0, 0, 0)
    rows = [
        # user 1: NULL-ts view, then click, purchase -> 'vcp' match only
        # if the NULL sorts first ('cpv' has no match)
        (0, None, 1, "view", 1.0, None),
        (1, T, 1, "click", 1.0, None),
        (2, T + dt.timedelta(minutes=1), 1, "purchase", 1.0, None),
        # user 2: view, click, then NULL-ts purchase -> 'pvc' under
        # NULLS FIRST (no match); 'vcp' (a match) under NULLS LAST
        (3, T, 2, "view", 1.0, None),
        (4, T + dt.timedelta(minutes=1), 2, "click", 1.0, None),
        (5, None, 2, "purchase", 1.0, None),
        # user 3: two NULL-ts events — event_id must break the tie
        # identically on both sides (view id 6 < click id 7 < purchase)
        (6, None, 3, "view", 1.0, None),
        (7, None, 3, "click", 1.0, None),
        (8, T, 3, "purchase", 1.0, None),
    ]
    d = tmp_path_factory.mktemp("nulltsev")
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    ).coalesce(1).write.parquet(str(d / "events.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet/*.parquet'"
    )
    spec = REGISTRY["events_pattern"]
    spark_pdf = spec.fn(spark, str(d)).toPandas()
    oracle_pdf = con.execute(spec.oracle).df()
    assert_frames_match(spark_pdf, oracle_pdf, "null-ts:events_pattern")
    # and the NULLS FIRST order is the one that actually ran: users 1
    # and 3 match, user 2 does not
    got = {int(r.user_id): int(r.n_matches)
           for r in spark_pdf.itertuples(index=False)}
    assert got == {1: 1, 2: 0, 3: 1}


def test_bpe_apply_survives_dry_merge_rounds(spark, tmp_path_factory):
    """Regression: a corpus whose bigram pairs dry up BEFORE BPE_ROUNDS
    rounds (here round 1 merges the only pair, round 2 finds none) must
    still encode every document. The oracle's per-round corpus CTE used
    to CROSS JOIN an empty merge-selection row and wipe the corpus to 0
    rows while Spark (which breaks out of the loop) kept all docs; the
    row-preserving LEFT JOIN keeps both engines at one row per doc."""
    import duckdb

    docs = ["x", "a b", "a b", "y"]  # round 1: (a,b); round 2: nothing
    d = tmp_path_factory.mktemp("drybpe")
    spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in enumerate(docs)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'"
    )
    for name in ("vocab_bpe_apply", "vocab_bpe_train"):
        spec = REGISTRY[name]
        spark_pdf = spec.fn(spark, str(d)).toPandas()
        oracle_pdf = con.execute(spec.oracle).df()
        assert_frames_match(spark_pdf, oracle_pdf, f"dry-rounds:{name}")
    assert len(REGISTRY["vocab_bpe_apply"].fn(spark, str(d)).collect()) == len(docs)


# TPC-H-only oracled queries (their SQL references no events/documents/
# embeddings table), auto-enrolled so new relational queries join the
# net without editing this file.
TPCH_TABLES = ("region", "nation", "customer", "supplier", "part",
               "orders", "lineitem")
TPCH_ONLY = sorted(
    n for n, s in REGISTRY.items()
    if s.oracle is not None
    and any(_re.search(rf"\b{t}\b", s.oracle.lower()) for t in TPCH_TABLES)
    and not any(_re.search(rf"\b{t}\b", s.oracle.lower())
                for t in ("events", "documents", "embeddings"))
)


def test_relational_family_on_adversarial_tables(spark, tmp_path_factory):
    """Fixture-independence net for the relational family (the largest —
    40+ queries): every TPC-H-only oracled query must hash-match DuckDB
    on handcrafted adversarial tables the generated fixtures never
    exhibit — NULL foreign keys and NULL measures, dangling references
    (orders whose customer doesn't exist), join partners with NO matches
    in either direction (a nation with no customers, a region with no
    nations), duplicate keys on the many side, all-tied sort/rank keys,
    zero and negative amounts, zero-discount boundaries, single-row and
    two-row tables, and groups of size one. Catches fixture-shaped
    assumptions (referential integrity, non-null measures, diverse
    group keys, no ties) that the sf sweeps cannot."""
    import datetime as dt

    import duckdb

    d = tmp_path_factory.mktemp("advtpch")
    T = dt.datetime(1995, 6, 15)

    def w(name, rows, schema):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(d / f"{name}.parquet")
        )

    w("region", [(0, "EMPTY REGION"), (1, "ASIA")], "r_regionkey int, r_name string")
    # nation 3 dangles to a missing region; nation 2 has no customers
    w("nation",
      [(0, "JAPAN", 1), (1, "CHINA", 1), (2, "LONELY", 1), (3, "DANGLING", 99)],
      "n_nationkey int, n_name string, n_regionkey int")
    w("customer",
      [(1, "Customer#1", 0, -999.99, "BUILDING"),
       (2, "Customer#2", 0, 0.0, "BUILDING"),      # duplicate segment+nation
       (3, "Customer#3", 1, None, "MACHINERY"),    # NULL acctbal
       (4, "Customer#4", 99, 5.0, "RARESEG"),      # dangling nation
       (5, "Cust", 1, 5.0, "MACHINERY")],          # short name (prefix edge)
      "c_custkey bigint, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string")
    w("supplier",
      [(1, "Supplier#1", 0, 1.0)],
      "s_suppkey bigint, s_name string, s_nationkey int, s_acctbal double")
    w("part",
      [(1, "part one", "B#1", "TYPE A", 1, 10.0),
       (2, "part two", "B#1", "TYPE A", 1, 10.0),  # full tie with part 1
       (3, "part three", "B#2", "TYPE B", 50, 0.0)],  # zero price
      "p_partkey bigint, p_name string, p_brand string, p_type string, p_size int, p_retailprice double")
    w("orders",
      [(10, 1, "O", 100.0, T, "1-URGENT"),
       (11, 1, "O", 100.0, T, "1-URGENT"),          # exact tie, same cust
       (12, None, "F", 50.0, T, "5-LOW"),           # NULL custkey
       (13, 999, "F", None, T, "5-LOW"),            # dangling cust + NULL price
       (14, 3, "P", 0.0, dt.datetime(1992, 1, 1), "3-MEDIUM")],
      "o_orderkey bigint, o_custkey bigint, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string")
    w("lineitem",
      [(10, 1, 1, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", T),   # zero discount/tax
       (10, 2, 1, 2, 0.0, 0.0, 0.06, 0.02, "N", "O", T),   # zero qty+price
       (11, 3, 1, 1, 50.0, 1000.0, 0.1, 0.08, "R", "F", dt.datetime(1999, 1, 1)),  # post-cutoff shipdate
       (99, 1, 1, 1, 5.0, 5.0, 0.02, 0.0, "A", "F", T)],   # dangling order
      "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, l_linenumber int, "
      "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
      "l_returnflag string, l_linestatus string, l_shipdate timestamp")

    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet/*.parquet'"
        )
    for name in TPCH_ONLY:
        spec = REGISTRY[name]
        spark_pdf = spec.fn(spark, str(d)).toPandas()
        oracle_pdf = con.execute(spec.oracle).df()
        assert_frames_match(spark_pdf, oracle_pdf, f"adversarial:{name}")
