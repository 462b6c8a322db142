"""Property-based tests (hypothesis): invariants that must hold for any
input, run on small generated datasets through the real Spark engine."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from spark_graft.compat.mapreduce import mapreduce
from spark_graft.functions import dsum, tokens

lines = st.lists(
    st.text(alphabet="abcdef", min_size=0, max_size=6), min_size=0, max_size=25
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@given(data=lines)
@SETTINGS
def test_shim_dup_detection_equals_python(spark, data):
    """Compat shim's distributed duplicate check == python set check,
    for any partitioning."""
    non_empty = [l for l in data if l]
    out = mapreduce(
        spark, data, lambda l: (l, "1"), lambda prev, kv: prev != kv[0], reducers_count=3
    )
    has_dups = len(set(non_empty)) != len(non_empty)
    assert ("0" in out) == has_dups


@given(data=st.lists(st.integers(min_value=-10**6, max_value=10**6), min_size=1, max_size=40))
@SETTINGS
def test_window_sum_consistent_with_group_sum(spark, data):
    """Last running-sum value per key == groupBy sum (window/agg
    consistency)."""
    from pyspark.sql.window import Window

    rows = [(i % 3, i, v) for i, v in enumerate(data)]
    df = spark.createDataFrame(rows, "k int, seq int, v long")
    w = Window.partitionBy("k").orderBy("seq").rowsBetween(Window.unboundedPreceding, 0)
    last = (
        df.withColumn("rs", F.sum("v").over(w))
        .groupBy("k")
        .agg(F.max_by("rs", "seq").alias("total"))
    )
    direct = df.groupBy("k").agg(F.sum("v").alias("total"))
    assert sorted(map(tuple, last.collect())) == sorted(map(tuple, direct.collect()))


@given(data=lines)
@SETTINGS
def test_dedup_idempotent(spark, data):
    """dropDuplicates twice == once (idempotence)."""
    df = spark.createDataFrame([(l,) for l in data] or [("",)], "s string")
    once = sorted(r[0] for r in df.dropDuplicates().collect())
    twice = sorted(r[0] for r in df.dropDuplicates().dropDuplicates().collect())
    assert once == twice


@given(data=st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=1, max_size=30))
@SETTINGS
def test_dsum_partition_invariance(spark, data):
    """Decimal-exact sum is identical under any repartitioning — the
    property float sums lack and our oracle hashing relies on."""
    df = spark.createDataFrame([(v,) for v in data], "x double")
    a = df.agg(dsum("x").alias("s")).collect()[0]["s"]
    b = df.repartition(5).agg(dsum("x").alias("s")).collect()[0]["s"]
    assert a == b


@given(ids=st.lists(st.integers(min_value=0, max_value=50), min_size=0, max_size=12))
@SETTINGS
def test_pair_combinations_equals_itertools(spark, ids):
    """pair_combinations == itertools.combinations over sorted distinct
    ids, for any bucket contents."""
    import itertools

    from spark_graft.operators.dedup import pair_combinations

    df = spark.createDataFrame([(ids,)], "ds array<bigint>")
    got = sorted(
        (r["p"]["a"], r["p"]["b"])
        for r in df.select(F.explode(pair_combinations(F.col("ds"))).alias("p")).collect()
    )
    # array_sort keeps duplicates; i<j positional pairs over the sorted list
    expect = sorted(itertools.combinations(sorted(ids), 2))
    assert got == expect


@given(
    ids=st.lists(st.integers(min_value=0, max_value=10**6), min_size=0, max_size=40, unique=True)
)
@SETTINGS
def test_exploded_pairs_equals_pair_combinations(spark, ids):
    """exploded_pairs (chunked) == explode(pair_combinations) == itertools
    for any bucket contents — the chunking is memory-shape-only, never
    semantic."""
    import itertools

    from spark_graft.operators.dedup import exploded_pairs

    df = spark.createDataFrame([(ids,)], "ds array<bigint>")
    got = sorted(
        (r["p"]["a"], r["p"]["b"]) for r in exploded_pairs(df, "ds").collect()
    )
    assert got == sorted(itertools.combinations(sorted(ids), 2))


@pytest.mark.parametrize("n", [127, 128, 129, 256, 300])
def test_exploded_pairs_giant_bucket_bounded(spark, n):
    """The adversarial degenerate bucket (the boilerplate-corpus
    LSH-band case), at the exact chunk boundaries (PAIR_CHUNK=128 -1/0/
    +1), a two-chunk multiple, and a ragged multi-chunk size: every i<j
    pair appears exactly once, AND no single pre-explode row ever
    materializes more than PAIR_CHUNK**2 pair structs — the invariant
    that keeps a 1e5-doc bucket at 100 TB from being an executor OOM.
    The per-row bound is measured on the PRODUCTION pair expression
    (`_chunk_pairs_expr`), the one `exploded_pairs` actually explodes."""
    import itertools

    from spark_graft.operators.dedup import (
        PAIR_CHUNK,
        _chunk_pair_rows,
        _chunk_pairs_expr,
        exploded_pairs,
    )

    ids = list(range(n))
    df = spark.createDataFrame([(ids,)], "ds array<bigint>")
    got = sorted(
        (r["p"]["a"], r["p"]["b"]) for r in exploded_pairs(df, "ds").collect()
    )
    assert got == list(itertools.combinations(ids, 2))

    # per-row bound: the pre-explode chunk-pair rows under the production
    # expression
    rows = _chunk_pair_rows(df, "ds")
    sizes = [r["n"] for r in rows.select(F.size(_chunk_pairs_expr()).alias("n")).collect()]
    assert sum(sizes) == n * (n - 1) // 2
    assert max(sizes) <= PAIR_CHUNK**2


def test_dedup_minhash_all_duplicates_corpus(spark, tmp_path_factory):
    """End-to-end adversarial fixture: 300 identical documents put ALL
    doc_ids into one bucket per band (the degenerate-band case the
    chunked expansion exists for). Every i<j pair must come out exactly
    once with jaccard == 1.0."""
    from spark_graft.operators.dedup import dedup_minhash

    n = 300
    text = "the quick brown fox jumps over the lazy dog again and again"
    d = tmp_path_factory.mktemp("alldup")
    spark.createDataFrame(
        [(i, text, "en", "s", len(text)) for i in range(n)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    rows = dedup_minhash(spark, str(d)).collect()
    assert len(rows) == n * (n - 1) // 2
    assert all(r["jaccard"] == 1.0 for r in rows)
    assert all(r["doc_a"] < r["doc_b"] for r in rows)


@given(texts=st.lists(st.text(alphabet="ab c", min_size=0, max_size=30), min_size=1, max_size=8))
@SETTINGS
def test_shingles_match_python_reference(spark, texts):
    """Staged shingling == a plain python n-gram implementation for any
    text (the staging is performance-only, never semantic)."""
    import re

    from spark_graft.functions import shingles_from_tokens, tokens

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    got = {
        r["i"]: sorted(r["sh"])
        for r in df.select("i", tokens("text").alias("toks"))
        .select("i", shingles_from_tokens("toks", 3).alias("sh"))
        .collect()
    }
    for i, t in enumerate(texts):
        toks = [w for w in re.split("[^a-z0-9]+", t.lower()) if w]
        expect = sorted({" ".join(toks[j : j + 3]) for j in range(len(toks) - 2)})
        assert got[i] == expect, (t, got[i], expect)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10**6)), min_size=1, max_size=40
    )
)
@SETTINGS
def test_asof_matches_python_reference(spark, rows):
    """The union+window as-of join == a per-row python scan for any
    event sequence (ties included: latest at-or-before, max id wins)."""
    from pyspark.sql.window import Window

    data = [(i, uid, ts, "click" if i % 2 == 0 else "purchase") for i, (uid, ts) in enumerate(rows)]
    df = spark.createDataFrame(data, "event_id long, user_id long, ts long, event_type string")
    sided = df.filter(F.col("event_type").isin("purchase", "click")).select(
        "event_id", "user_id", "ts",
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("side"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        sided.select(
            "event_id", "user_id", "ts", "side",
            F.last(F.when(F.col("side") == 0, F.struct("ts", "event_id")), ignorenulls=True)
            .over(w).alias("m"),
        )
        .filter(F.col("side") == 1)
        .select("event_id", F.col("m.event_id").alias("click_id"))
    )
    got = {r["event_id"]: r["click_id"] for r in out.collect()}
    clicks = [(e, u, t) for (e, u, t, k) in data if k == "click"]
    for e, u, t, k in data:
        if k != "purchase":
            continue
        cand = [(ct, ce) for (ce, cu, ct) in clicks if cu == u and ct <= t]
        expect = max(cand)[1] if cand else None
        assert got[e] == expect


@given(texts=st.lists(st.text(alphabet="ab c", min_size=0, max_size=40), min_size=1, max_size=6))
@SETTINGS
def test_minhash_signature_matches_python_reference(spark, texts):
    """The fused aggregate-min minhash (minhash_doc_table) == a plain
    python implementation of the same double-hash family, for any text.
    Pins that the codegen'd min() rewrite is arithmetic-identical to
    min-over-the-shingle-set (docs with no shingles drop out in both)."""
    import hashlib
    import re

    from spark_graft.operators.dedup import MINHASH_PRIME, N_PERMS, minhash_doc_table

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {
        r["doc_id"]: [r[f"mh{p}"] for p in range(N_PERMS)]
        for r in minhash_doc_table(df).collect()
    }
    for i, t in enumerate(texts):
        toks = [w for w in re.split("[^a-z0-9]+", t.lower()) if w]
        sh = {" ".join(toks[j : j + 3]) for j in range(len(toks) - 2)}
        if not sh:
            assert i not in got, (t, got.get(i))
            continue
        hs = [
            (int(hashlib.md5(s.encode()).hexdigest()[:8], 16),
             int(hashlib.md5(s.encode()).hexdigest()[8:16], 16))
            for s in sh
        ]
        expect = [min((h1 + p * h2) % MINHASH_PRIME for h1, h2 in hs) for p in range(N_PERMS)]
        assert got[i] == expect, (t, got[i], expect)


@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)).filter(lambda p: p[0] < p[1]),
        min_size=1,
        max_size=20,
        unique=True,
    )
)
@SETTINGS
def test_pagerank_matches_python_reference(spark, pairs):
    """The distributed fixed-point PageRank loop equals a pure-python
    dict implementation exactly — bit-identical integer ranks for any
    graph (the reproducibility claim the fixed-point design makes)."""
    from spark_graft.operators.graph import (
        DAMP_DEN,
        DAMP_NUM,
        N_ITERS,
        UNIT,
        pagerank,
    )

    df = spark.createDataFrame(pairs, "doc_a bigint, doc_b bigint")
    got = {
        r["doc_id"]: r["rank_fx"] for r in pagerank(spark, df, N_ITERS).collect()
    }

    edges: dict[int, list[int]] = {}
    for x, y in pairs:
        edges.setdefault(x, []).append(y)
        edges.setdefault(y, []).append(x)
    init = UNIT // len(edges)
    teleport = ((DAMP_DEN - DAMP_NUM) * init) // DAMP_DEN
    ranks = {n: init for n in edges}
    for _ in range(N_ITERS):
        in_mass = {n: 0 for n in edges}
        for src, dsts in edges.items():
            c = ranks[src] // len(dsts)
            for dst in dsts:
                in_mass[dst] += c
        ranks = {n: teleport + (DAMP_NUM * m) // DAMP_DEN for n, m in in_mass.items()}
    assert got == ranks


@given(
    vecs=st.lists(
        st.tuples(
            *[st.floats(-0.875, 0.875, allow_nan=False, width=32) for _ in range(4)]
        ),
        min_size=8,
        max_size=24,
    )
)
@SETTINGS
def test_kmeans_matches_python_reference(spark, tmp_path_factory, vecs):
    """kmeans_lloyd end-to-end on generated data equals a pure-python
    Lloyd's loop on the same quantization — assignments AND distances,
    exactly, including ties (lowest cluster id) and empty clusters."""
    from spark_graft.operators.clustering import K, N_ITERS, Q_SCALE, Q_SHIFT, kmeans_lloyd

    d = tmp_path_factory.mktemp("km")
    spark.createDataFrame(
        [(i, list(v), 0) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(str(d / "embeddings.parquet"))
    got = {
        r["vec_id"]: (r["cluster"], r["d2"])
        for r in kmeans_lloyd(spark, str(d)).collect()
    }

    import numpy as np

    import math

    # HALF_UP like Spark/DuckDB — python round() is HALF_EVEN and
    # diverges on exact .5 quantization boundaries (e.g. x=0.0078125)
    q = [
        [math.floor((float(np.float32(x)) + Q_SHIFT) * Q_SCALE + 0.5) for x in v]
        for v in vecs
    ]
    cents = {i: q[i] for i in range(K)}

    def assign(cents):
        out = {}
        for vid, vec in enumerate(q):
            best = min(
                (sum((a - b) ** 2 for a, b in zip(vec, cv)), cid)
                for cid, cv in sorted(cents.items())
            )
            out[vid] = (best[1], best[0])
        return out

    for _ in range(N_ITERS - 1):
        a = assign(cents)
        members: dict[int, list[int]] = {}
        for vid, (cid, _) in a.items():
            members.setdefault(cid, []).append(vid)
        cents = {
            cid: [
                sum(q[v][p] for v in vs) // len(vs) for p in range(len(q[0]))
            ]
            for cid, vs in members.items()
        }
    want = {vid: (cid, d2) for vid, (cid, d2) in assign(cents).items()}
    assert got == want


doc_texts = st.lists(
    st.text(alphabet="ab cd", min_size=0, max_size=40), min_size=1, max_size=12
)


@given(texts=doc_texts)
@SETTINGS
def test_text_chunks_cover_and_tile(spark, tmp_path_factory, texts):
    """Chunking invariants for any corpus: chunk starts advance by
    exactly the stride, every token index is covered by some chunk,
    every chunk is non-empty and at most CHUNK_SIZE long, and the tail
    chunk reaches exactly the last token."""
    from spark_graft.operators.vocab import CHUNK_SIZE, CHUNK_STRIDE, text_chunks

    d = tmp_path_factory.mktemp("chunks")
    spark.createDataFrame(
        [(i, t, "en", 0) for i, t in enumerate(texts)],
        "doc_id bigint, text string, lang string, quality int",
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    rows = text_chunks(spark, str(d)).collect()

    import re

    n_tok = {
        i: len([w for w in re.split(r"[^a-z0-9]+", t.lower()) if w])
        for i, t in enumerate(texts)
    }
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, n in n_tok.items():
        chunks = sorted(by_doc.get(i, []), key=lambda r: r["chunk_idx"])
        if n == 0:
            assert not chunks, (texts[i], chunks)
            continue
        assert [c["chunk_idx"] for c in chunks] == list(range(len(chunks)))
        assert [c["start_tok"] for c in chunks] == [
            1 + k * CHUNK_STRIDE for k in range(len(chunks))
        ]
        for c in chunks:
            assert 1 <= c["n_chunk_tokens"] <= CHUNK_SIZE
            assert c["start_tok"] + c["n_chunk_tokens"] - 1 <= n
        last = chunks[-1]
        assert last["start_tok"] + last["n_chunk_tokens"] - 1 == n
        # stride coverage: next chunk starts inside/adjacent to the
        # previous chunk's span, so no token index is skipped
        for a, b in zip(chunks, chunks[1:]):
            assert b["start_tok"] <= a["start_tok"] + CHUNK_SIZE


@given(texts=doc_texts)
@SETTINGS
def test_vocab_pairs_match_python_reference(spark, tmp_path_factory, texts):
    """vocab_pair_counts == a pure-python Counter over adjacent pairs,
    including the (count desc, pair asc) total order and the top-k cut."""
    import re
    from collections import Counter

    from spark_graft.operators.vocab import PAIR_TOP_K, vocab_pair_counts

    d = tmp_path_factory.mktemp("pairs")
    spark.createDataFrame(
        [(i, t, "en", 0) for i, t in enumerate(texts)],
        "doc_id bigint, text string, lang string, quality int",
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    got = [
        (r["pair"], r["n_occurrences"])
        for r in vocab_pair_counts(spark, str(d)).collect()
    ]

    c: Counter = Counter()
    for t in texts:
        ws = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        c.update(f"{a} {b}" for a, b in zip(ws, ws[1:]))
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:PAIR_TOP_K]
    assert got == want


@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(lambda p: p[0] < p[1]),
        min_size=1,
        max_size=25,
        unique=True,
    )
)
@SETTINGS
def test_triangle_counts_match_itertools(spark, pairs):
    """Degree-oriented triangle counting == brute-force enumeration of
    all 3-subsets, for any graph: every triangle found exactly once,
    per-node participation exact."""
    from itertools import combinations

    from spark_graft.operators.graph import triangle_counts

    df = spark.createDataFrame(pairs, "doc_a bigint, doc_b bigint")
    got = {
        r["doc_id"]: r["n_triangles"] for r in triangle_counts(df).collect()
    }

    es = set(pairs)
    nodes = sorted({n for p in pairs for n in p})
    want: dict[int, int] = {}
    for x, y, z in combinations(nodes, 3):
        if (x, y) in es and (y, z) in es and (x, z) in es:
            for n in (x, y, z):
                want[n] = want.get(n, 0) + 1
    assert got == want


def test_results_invariant_under_shuffle_partitioning(spark, sf_dir):
    """The determinism claim behind every hash-gated query: changing the
    shuffle partition count must not change a single byte of output.
    Exercised on the three queries whose designs explicitly argue it —
    fixed-point PageRank (iterated integer sums), kmeans assignment
    (integer argmin), and the decimal-exact Q1 aggregate."""
    from spark_graft.registry import REGISTRY

    saved = spark.conf.get("spark.sql.shuffle.partitions")
    outs = {}
    try:
        for n in ("3", "17"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            for qn in ("graph_pagerank", "kmeans_lloyd", "agg_q1"):
                rows = sorted(
                    tuple(r) for r in REGISTRY[qn].fn(spark, sf_dir).collect()
                )
                outs.setdefault(qn, []).append(rows)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    for qn, (a, b) in outs.items():
        assert a == b, f"{qn} changed under repartitioning"


@given(texts=doc_texts)
@SETTINGS
def test_span_fraction_matches_python_reference(spark, tmp_path_factory, texts):
    """dedup_span_fraction == a pure-python set computation: per doc,
    distinct 8-token spans and how many appear in any other doc."""
    import re

    from spark_graft.operators.dedup import SPAN_N, dedup_span_fraction

    d = tmp_path_factory.mktemp("spans")
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    got = {
        r["doc_id"]: (r["n_spans"], r["n_shared"])
        for r in dedup_span_fraction(spark, str(d)).collect()
    }

    spans = {}
    for i, t in enumerate(texts):
        ws = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        spans[i] = {
            " ".join(ws[j : j + SPAN_N]) for j in range(len(ws) - SPAN_N + 1)
        }
    want = {}
    for i, ss in spans.items():
        if not ss:
            continue
        others = set().union(*(s for j, s in spans.items() if j != i))
        want[i] = (len(ss), len(ss & others))
    assert got == want


def test_ann_recall_gate_planted_pairs(spark, tmp_path_factory):
    """The ANN recall GATE (VERDICT r3 item 5): on a corpus with planted
    near-duplicates of the probe at cos >= 0.95, the REAL sim_ann_lsh
    and sim_ann_ivf_trained queries — run end to end through the
    registry on a planted embeddings table — must retain >= 0.8 of the
    brute-force top-k. This is the high-similarity regime both
    docstrings claim as LSH/IVF territory; the claim is now a gate, not
    narration.

    Fixture layout respects the engine's determinism contracts: the
    probe is vec_id 0 (minimum id), kmeans seeds are the K lowest ids,
    so background vectors occupy low ids (seeding diffuse clusters) and
    the planted near-dups sit at high ids, joining the probe's cluster."""
    import hashlib

    from spark_graft.operators.similarity import TOP_K
    from spark_graft.registry import REGISTRY

    dim = 64

    def h(seed: str, d: int) -> float:
        return int(hashlib.md5(f"{seed}:{d}".encode()).hexdigest()[:8], 16) / 2**32 - 0.5

    probe = [h("probe", d) for d in range(dim)]
    rows = [(0, probe, 0)]
    # background: diffuse vectors at low ids (1..200) — ids 1..7 seed
    # their own kmeans clusters away from the planted blob
    for i in range(1, 201):
        rows.append((i, [h(f"bg{i}", d) for d in range(dim)], i % 8))
    # planted near-dups of the probe at high ids (201..220)
    def cos_py(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(y * y for y in b) ** 0.5
        return dot / (na * nb)

    for i in range(201, 221):
        v = [x + h(f"near{i}", d) * 0.06 for d, x in enumerate(probe)]
        assert cos_py(v, probe) >= 0.95, "fixture must plant genuine near-dups"
        rows.append((i, v, 0))

    d = tmp_path_factory.mktemp("ann_recall")
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(d / "embeddings.parquet"))

    exact = {r["vec_id"] for r in REGISTRY["sim_cosine_topk"].fn(spark, str(d)).collect()}
    assert len(exact) == TOP_K
    lsh = {r["vec_id"] for r in REGISTRY["sim_ann_lsh"].fn(spark, str(d)).collect()}
    ivf = {r["vec_id"] for r in REGISTRY["sim_ann_ivf_trained"].fn(spark, str(d)).collect()}
    lsh_recall = len(lsh & exact) / len(exact)
    ivf_recall = len(ivf & exact) / len(exact)
    assert lsh_recall >= 0.8, f"sim_ann_lsh high-sim recall {lsh_recall}"
    assert ivf_recall >= 0.8, f"sim_ann_ivf_trained high-sim recall {ivf_recall}"


def test_incremental_minhash_degenerate_batch(spark, tmp_path_factory):
    """Adversarial boilerplate batch: hundreds of identical NEW docs.
    Keep-first must accept exactly one when the content is novel, and
    zero when it also duplicates an existing doc — and the candidate
    set stays a distributed band equi-join (rows, never a per-row
    quadratic array)."""
    from spark_graft.registry import REGISTRY

    text = "the quick brown fox jumps over the lazy dog again and again"
    other = "completely different corpus content with many plain words here"
    d = tmp_path_factory.mktemp("incdup")
    # ids ending in 9 = new batch: 150 identical novel docs
    rows = [(i * 10 + 9, text) for i in range(150)]
    rows += [(2, other)]  # one existing doc, unrelated
    spark.createDataFrame(rows, "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(str(d / "documents.parquet"))
    got = {
        r["doc_id"]
        for r in REGISTRY["dedup_incremental_minhash"].fn(spark, str(d)).collect()
    }
    assert got == {9}, got  # keep-first: smallest new id only

    # same batch but the content already exists in the corpus -> zero
    d2 = tmp_path_factory.mktemp("incdup2")
    rows2 = [(i * 10 + 9, text) for i in range(150)] + [(2, text)]
    spark.createDataFrame(rows2, "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(str(d2 / "documents.parquet"))
    got2 = {
        r["doc_id"]
        for r in REGISTRY["dedup_incremental_minhash"].fn(spark, str(d2)).collect()
    }
    assert got2 == set(), got2


@given(
    keys=st.lists(
        st.text(alphabet="abcdefghij0123456789:#-", min_size=0, max_size=24),
        min_size=1,
        max_size=20,
        unique=True,
    )
)
@SETTINGS
def test_md5_bucket_matches_python_reference(spark, keys):
    """The engine-portable hash primitive every deterministic assignment
    and oracle rests on: Spark's conv(substr(md5(x),1,8),16,10) must
    equal python's int(md5(x)[:8], 16) — which is also DuckDB's
    CAST('0x'||substr(md5(x),1,8) AS BIGINT) — for arbitrary keys."""
    import hashlib

    from spark_graft.operators.pipeline import _md5_bucket_raw

    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {
        r["k"]: r["b"]
        for r in df.select("k", _md5_bucket_raw("p:", F.col("k")).alias("b")).collect()
    }
    expect = {
        k: int(hashlib.md5(f"p:{k}".encode()).hexdigest()[:8], 16) for k in keys
    }
    assert got == expect


def test_dedup_embedding_one_label_capped(spark, tmp_path_factory, monkeypatch):
    """Adversarial degenerate clustering (VERDICT r6 item 4): 30
    near-parallel planted vectors that the trained quantizer necessarily
    packs into ONE cell. With EMB_BLOCK_CAP forced below that cell size
    the grid split must kick in (kc > 1 chunks, bipartite + diagonal
    tasks) and produce EXACTLY the same pair set as the single-block
    path — every above-threshold i<j pair once, none dropped at chunk
    boundaries, none duplicated across chunk-pairs."""
    import hashlib

    from spark_graft.operators import dedup

    dim = 16
    n = 300

    def vec(i: int) -> list[float]:
        # deterministic pseudo-random unit-ish vectors; planting every
        # 10th near a shared base guarantees pairs on BOTH sides of the
        # cosine threshold
        base = [1.0] * dim
        if i % 10 == 0:
            return [b + 0.01 * (i % 7) for b in base]
        return [
            int(hashlib.md5(f"{i}:{d}".encode()).hexdigest()[:8], 16) / 2**32 - 0.5
            for d in range(dim)
        ]

    d = tmp_path_factory.mktemp("onelabel")
    spark.createDataFrame(
        [(i, 7, vec(i)) for i in range(n)],
        "vec_id bigint, label int, embedding array<float>",
    ).write.mode("overwrite").parquet(str(d / "embeddings.parquet"))

    def run():
        return {
            (r["vec_a"], r["vec_b"]): (r["cell"], r["cos_sim"])
            for r in dedup.dedup_embedding(spark, str(d)).collect()
        }

    uncapped = run()  # every trained cell < default cap: diagonal blocks
    assert len(uncapped) >= 30 * 29 // 2  # the planted near-dups all pair up
    assert all(a < b for a, b in uncapped)

    # the planted vectors share one trained cell (~30 members); cap 8
    # forces kc >= 4 chunks there
    monkeypatch.setattr(dedup, "EMB_BLOCK_CAP", 8)
    monkeypatch.setattr(dedup, "EMB_PAIR_SLICE", 1000)  # exercise slicing
    capped = run()
    assert capped == uncapped


@given(
    sents=st.lists(
        st.lists(
            st.sampled_from("alpha beta gamma delta epsilon zeta".split()),
            min_size=3,  # >= shingle width, so every doc has a nonempty shingle set
            max_size=8,
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_incremental_minhash_replay_idempotent(spark, tmp_path_factory, sents):
    """VERDICT r6 item 6 — at-least-once delivery semantics of the
    incremental near-dup gate:
    1. the accept-set is invariant to batch-internal ROW order and
       partitioning (keep-first is keyed on doc_id, never on physical
       placement);
    2. REPLAYING the same batch after its accepted docs were appended to
       the index accepts ZERO documents — every replayed doc either
       collides with its own indexed twin (jaccard 1.0) or re-collides
       exactly as it did the first time."""
    from spark_graft.registry import REGISTRY

    texts = [" ".join(s) for s in sents]
    batch = [(i * 10 + 9, t) for i, t in enumerate(texts)]
    existing = [(2, "totally unrelated corpus text about oceans and ships and tides")]

    def run(rows, tag, partitions):
        d = tmp_path_factory.mktemp(tag)
        spark.createDataFrame(rows, "doc_id bigint, text string").repartition(
            partitions
        ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
        return {
            r["doc_id"]
            for r in REGISTRY["dedup_incremental_minhash"].fn(spark, str(d)).collect()
        }

    accepted = run(existing + batch, "inc1", 3)
    # (1) row order / partitioning invariance
    assert run(list(reversed(existing + batch)), "inc2", 1) == accepted

    # (2) replay: accepted docs join the index (re-keyed off the batch
    # decile), the identical batch arrives again -> zero accepts
    accepted_rows = [
        (bid * 10 + 1, t) for bid, t in batch if bid in accepted  # id now ends in 1
    ]
    replay = existing + accepted_rows + batch
    assert run(replay, "inc3", 3) == set()


def _ngram_jaccard_ref(texts: dict[int, str]) -> dict[tuple[int, int], float]:
    """Pure-python mirror of the dedup_ngram_jaccard contract (the
    oracle SQL): distinct word-3-gram shingles as 60-bit md5 ints,
    global doc-frequency, (df, s)-ranked PPJoin prefix of size
    n - ceil(0.8*n) + 1, candidate pairs sharing a prefix shingle,
    exact jaccard >= 0.8, HALF_UP round to 4 decimals."""
    import hashlib
    import re
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    def sh_int(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    sets: dict[int, set[int]] = {}
    for i, t in texts.items():
        ws = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        sh = {sh_int(" ".join(ws[j : j + 3])) for j in range(len(ws) - 2)}
        if sh:
            sets[i] = sh
    df: Counter = Counter(s for ss in sets.values() for s in ss)
    prefix = {}
    for i, ss in sets.items():
        n = len(ss)
        k = n - (4 * n + 4) // 5 + 1
        prefix[i] = set(sorted(ss, key=lambda s: (df[s], s))[:k])
    out = {}
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            if not (prefix[a] & prefix[b]):
                continue
            inter = len(sets[a] & sets[b])
            jac = inter / (len(sets[a]) + len(sets[b]) - inter)
            if jac >= 0.8:
                out[(a, b)] = float(
                    Decimal(repr(jac)).quantize(Decimal("0.0001"), ROUND_HALF_UP)
                )
    return out


def _run_ngram_jaccard(spark, tmp_dir, texts: dict[int, str]):
    from spark_graft.registry import REGISTRY

    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in sorted(texts.items())],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(str(tmp_dir / "documents.parquet"))
    return {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in REGISTRY["dedup_ngram_jaccard"].fn(spark, str(tmp_dir)).collect()
    }


def test_ngram_jaccard_exact_threshold_boundary(spark, tmp_path_factory):
    """Pin the PPJoin length-filter boundary: |shA|=4 subset of |shB|=5
    gives jaccard exactly 4/5 = the threshold, and the integer length
    filter hits equality (5*4 == 4*5). The pair MUST survive — a strict
    (>) filter or a float 0.8*n cutoff would silently drop it. The
    shorter doc C (3 shingles, jaccard 3/5 vs A) must not appear."""
    ws = "alpha bravo charlie delta echo foxtrot golf".split()
    texts = {
        0: " ".join(ws[:7]),  # 5 shingles
        1: " ".join(ws[:6]),  # 4 shingles, subset of doc 0's
        2: " ".join(ws[:5]),  # 3 shingles, subset of both
    }
    got = _run_ngram_jaccard(spark, tmp_path_factory.mktemp("njb"), texts)
    assert got == _ngram_jaccard_ref(texts)
    assert got == {(0, 1): 0.8}


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from("ant bee cat dog elk fox gnu hen".split()),
            min_size=0,
            max_size=14,
        ),
        min_size=0,
        max_size=8,
    )
)
@SETTINGS
def test_ngram_jaccard_matches_python_reference(spark, tmp_path_factory, docs):
    """dedup_ngram_jaccard (prefix filter + PPJoin length filters +
    chunk pruning) == the pure-python contract for arbitrary small-vocab
    corpora — the filters must be conservative for ANY length/overlap
    mix, not just the fixtures."""
    texts = {i: " ".join(ws) for i, ws in enumerate(docs)}
    got = _run_ngram_jaccard(spark, tmp_path_factory.mktemp("njp"), texts)
    assert got == _ngram_jaccard_ref(texts)


def test_ngram_jaccard_giant_boilerplate_bucket(spark, tmp_path_factory):
    """Adversarial boilerplate corpus: 150 docs that are small edits of
    one 24-word template, so prefix buckets exceed PAIR_CHUNK=128 and
    the CHUNKED pair expansion (with pair-level and chunk-range length
    pruning) is the code path that runs. Output must equal the python
    reference exactly — chunking and pruning are memory/shape
    optimizations, never semantic."""
    base = (
        "the quick brown fox jumps over a lazy dog while seven wise "
        "owls watch from tall oak trees near the old stone bridge at dawn"
    ).split()
    assert len(base) == 25
    texts = {}
    for i in range(150):
        ws = list(base)
        ws[i % len(ws)] = f"var{i % 5}"
        if i % 7 == 0:  # length variation arms the length filter
            ws = ws + ["extra", f"tail{i % 3}", "words"]
        texts[i] = " ".join(ws)
    got = _run_ngram_jaccard(spark, tmp_path_factory.mktemp("njg"), texts)
    assert got == _ngram_jaccard_ref(texts)
    assert len(got) > 100  # the bucket really is dense


def test_ngram_jaccard_exact_duplicate_collapse(spark, tmp_path_factory):
    """The round-10 exact-duplicate collapse: 200 byte-identical copies
    of one doc (group larger than PAIR_CHUNK=128, so the group-internal
    jaccard-1.0 expansion runs CHUNKED), a second 3-copy group whose
    content is a near-dup of the first (the rep-level pair must expand
    to all 200x3 cross pairs at the shared jaccard), and an unrelated
    doc that must pair with nothing. Output == the python reference,
    which knows nothing about the collapse."""
    base = (
        "the quick brown fox jumps over a lazy dog while seven wise "
        "owls watch from tall oak trees near the old stone bridge at dawn"
    ).split()
    texts = {i: " ".join(base) for i in range(200)}
    near = list(base)
    near[0] = "variant"  # 23-shingle overlap of 25 -> jaccard > 0.8
    for i in range(200, 203):
        texts[i] = " ".join(near)
    texts[203] = "completely different words about gardening and soup"
    got = _run_ngram_jaccard(spark, tmp_path_factory.mktemp("njd"), texts)
    want = _ngram_jaccard_ref(texts)
    assert got == want
    n_dup_a = 200 * 199 // 2
    n_dup_b = 3
    assert sum(1 for j in got.values() if j == 1.0) == n_dup_a + n_dup_b
    cross = {k: j for k, j in got.items() if k[0] < 200 <= k[1] <= 202}
    assert len(cross) == 600 and len(set(cross.values())) == 1


def _containment_ref(texts: dict[int, str]) -> dict[tuple[int, int], float]:
    """Pure-python mirror of the dedup_containment contract (the oracle
    SQL): distinct word-3-gram shingles as 60-bit md5 ints, global doc-
    frequency, (df, s)-ranked asymmetric prefix of size
    n - ceil(0.9*n) + 1 probing the FULL index, length filter
    |Sb| >= ceil(0.9*|Sa|), exact containment |Sa∩Sb|/|Sa| >= 0.9 over
    ORDERED pairs, HALF_UP round to 4 decimals. Knows nothing about the
    exact-duplicate collapse."""
    import hashlib
    import re
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    def sh_int(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    sets: dict[int, set[int]] = {}
    for i, t in texts.items():
        ws = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        sh = {sh_int(" ".join(ws[j : j + 3])) for j in range(len(ws) - 2)}
        if sh:
            sets[i] = sh
    df: Counter = Counter(s for ss in sets.values() for s in ss)
    prefix = {}
    for i, ss in sets.items():
        n = len(ss)
        k = n - (9 * n + 9) // 10 + 1
        prefix[i] = set(sorted(ss, key=lambda s: (df[s], s))[:k])
    out = {}
    for a, sa in sets.items():
        for b, sb in sets.items():
            if a == b or not (prefix[a] & sb):
                continue
            if len(sb) < (9 * len(sa) + 9) // 10:
                continue
            inter = len(sa & sb)
            if inter * 10 >= 9 * len(sa):
                c = inter / len(sa)
                out[(a, b)] = float(
                    Decimal(repr(c)).quantize(Decimal("0.0001"), ROUND_HALF_UP)
                )
    return out


def test_containment_exact_duplicate_collapse(spark, tmp_path_factory):
    """The round-11 exact-duplicate collapse in dedup_containment
    (VERDICT r10 item 2), against a python reference that knows nothing
    about it: 200 byte-identical copies of one doc (group larger than
    PAIR_CHUNK=128, so the group-internal containment-1.0 expansion runs
    CHUNKED and in BOTH directions), a 3-copy near-dup group (the
    rep-level pair must expand to all 200x3 ORDERED pairs EACH WAY at
    the shared containment), a 2-copy SUPERSET group that exposes the
    asymmetry (contained -> superset qualifies at 1.0, superset ->
    contained falls below t and must not appear), and an unrelated doc
    that pairs with nothing."""
    from spark_graft.registry import REGISTRY

    base = (
        "the quick brown fox jumps over a lazy dog while seven wise "
        "owls watch from tall oak trees near the old stone bridge at dawn"
    ).split()  # 25 words -> 23 shingles
    texts = {i: " ".join(base) for i in range(200)}
    near = list(base)
    near[0] = "variant"  # 22 of 23 shingles shared -> containment 22/23
    for i in range(200, 203):
        texts[i] = " ".join(near)
    sup = base + (
        "and the river runs softly past the mill wheel turning slow"
    ).split()  # superset: S_base subset of S_sup, |S_sup| = 34
    for i in range(203, 205):
        texts[i] = " ".join(sup)
    texts[205] = "completely different words about gardening and soup"
    d = str(tmp_path_factory.mktemp("cnd"))
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in sorted(texts.items())],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(d + "/documents.parquet")
    got = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in REGISTRY["dedup_containment"].fn(spark, d).collect()
    }
    want = _containment_ref(texts)
    assert got == want
    # structural expectations the reference confirms:
    in_a = 200 * 199  # ordered pairs inside the 200-group
    in_b, in_c = 3 * 2, 2 * 1
    a_to_c = 200 * 2  # contained -> superset at exactly 1.0
    assert sum(1 for c in got.values() if c == 1.0) == in_a + in_b + in_c + a_to_c
    # asymmetry: no superset -> contained pair (23/34 < 0.9)
    assert not any(203 <= a <= 204 and b < 203 for a, b in got)
    # rep-pair expansion: every ordered A<->B cross pair present, one value
    ab = {k: c for k, c in got.items() if k[0] < 200 <= k[1] <= 202}
    ba = {k: c for k, c in got.items() if k[1] < 200 <= k[0] <= 202}
    assert len(ab) == 600 and len(ba) == 600
    assert set(ab.values()) == set(ba.values()) == {round(22 / 23, 4)}
    assert 205 not in {i for k in got for i in k}


@given(
    vals=st.lists(
        st.decimals(
            min_value=-999999, max_value=999999, places=2, allow_nan=False
        ).map(float),
        min_size=0,
        max_size=25,
    ),
    scale=st.sampled_from([2, 6]),
)
@SETTINGS
def test_dsum_matches_duckdb_bitwise(spark, vals, scale):
    """dsum (Spark) and dsum_sql (DuckDB) agree bit-for-bit for ANY
    list of contract-conformant values (2-decimal doubles small enough
    that both engines cast each row to the same decimal), at both
    scales in use — the random-input companion to the deterministic
    2^53-boundary case in test_units.py."""
    import duckdb
    import pandas as pd

    from spark_graft.functions import dsum_sql

    (got_spark,) = (
        spark.createDataFrame([(v,) for v in vals] or [(None,)], "v double")
        .agg(dsum("v", scale=scale).alias("s"))
        .collect()[0]
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"v": pd.Series(vals, dtype="float64")}))
    (got_duck,) = con.execute(f"SELECT {dsum_sql('v', scale=scale)} FROM t").fetchone()
    if got_spark is None or got_duck is None:
        assert got_spark is None and got_duck is None
    else:
        assert got_spark == got_duck, (vals, got_spark.hex(), got_duck.hex())


def test_sim_knn_graph_capped_grid_equals_uncapped(spark, tmp_path_factory, monkeypatch):
    """sim_knn_graph's chunk-capped path: the planted near-parallel
    vectors share one trained cell (~30 members); with EMB_BLOCK_CAP
    forced below that, a vector's neighbor candidates split across
    several chunk-pair tasks, and the per-task partial top-k + global
    window merge must reproduce the uncapped result EXACTLY (a neighbor
    in another chunk must not be lost, a same-chunk neighbor must not be
    double-counted)."""
    import hashlib

    from spark_graft.operators import dedup
    from spark_graft.registry import REGISTRY

    dim = 16
    n = 300

    def vec(i: int) -> list[float]:
        base = [1.0] * dim
        if i % 10 == 0:
            return [b + 0.01 * (i % 7) for b in base]
        return [
            int(hashlib.md5(f"{i}:{d}".encode()).hexdigest()[:8], 16) / 2**32 - 0.5
            for d in range(dim)
        ]

    d = tmp_path_factory.mktemp("knncap")
    spark.createDataFrame(
        [(i, 7, vec(i)) for i in range(n)],
        "vec_id bigint, label int, embedding array<float>",
    ).write.mode("overwrite").parquet(str(d / "embeddings.parquet"))

    fn = REGISTRY["sim_knn_graph"].fn

    def run():
        return sorted(
            (r["vec_id"], r["rnk"], r["nbr_id"], r["cos_sim"])
            for r in fn(spark, str(d)).collect()
        )

    uncapped = run()
    assert len(uncapped) > 0
    # every vector has at most 3 neighbors, ranks are 1..k contiguous
    per_vec = {}
    for v, rnk, _, _ in uncapped:
        per_vec.setdefault(v, []).append(rnk)
    assert all(ranks == list(range(1, len(ranks) + 1)) for ranks in per_vec.values())

    monkeypatch.setattr(dedup, "EMB_BLOCK_CAP", 8)
    monkeypatch.setattr(dedup, "EMB_PAIR_SLICE", 1000)
    assert run() == uncapped


@given(
    cvals=st.lists(
        st.lists(st.sampled_from([0, 300000, 1000000, 1700000, 2000000]),
                 min_size=3, max_size=3),
        min_size=2,
        max_size=40,
    ),
    qvals=st.lists(
        st.lists(st.floats(-0.875, 0.875, allow_nan=False, width=32),
                 min_size=3, max_size=3),
        min_size=1,
        max_size=30,
    ),
)
@settings(max_examples=200, deadline=None)
def test_hier_assigner_bit_identical_to_flat(cvals, qvals):
    """The large-k triangle-inequality-pruned assignment kernel
    (_HierAssigner) must equal the flat argmin (_FlatAssigner)
    bit-for-bit — cluster id AND integer distance — for any centroid
    set and any query batch, INCLUDING exact distance ties (the tiny
    5-value centroid grid forces duplicate centroids under different
    cluster ids, where both kernels must pick the lowest id). Pure
    numpy, no Spark: this is the property the Spark-level switch test
    in test_units relies on."""
    import numpy as np

    from spark_graft.operators.clustering import (
        _centroid_matrix,
        _FlatAssigner,
        _HierAssigner,
    )

    cents = {cid * 3 + 1: v for cid, v in enumerate(cvals)}  # non-dense ids
    parts = _centroid_matrix(cents)
    M = np.array(qvals, dtype=np.float32)
    fq, fd2, fcid = _FlatAssigner(*parts).assign(M)
    hq, hd2, hcid = _HierAssigner(*parts).assign(M)
    assert (fq == hq).all()
    assert (fd2 == hd2).all(), (fd2.tolist(), hd2.tolist())
    assert (fcid == hcid).all(), (fcid.tolist(), hcid.tolist())


@given(texts=doc_texts)
@SETTINGS
def test_vocab_bpe_matches_python_reference(spark, tmp_path_factory, texts):
    """vocab_bpe_train == a pure-python BPE trainer: per round, the
    argmax pair under (count desc, (x, y) asc) and a greedy
    left-to-right non-overlapping merge — including the overlap cases
    ((a, a) on 'a a a' merges once) the sentinel-replace trick must get
    right, and the post-merge recount."""
    import re

    from collections import Counter

    from spark_graft.operators.vocab import BPE_ROUNDS, vocab_bpe_train

    d = tmp_path_factory.mktemp("bpe")
    spark.createDataFrame(
        [(i, t, "en", 0) for i, t in enumerate(texts)],
        "doc_id bigint, text string, lang string, quality int",
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    got = [
        (r["merge_round"], r["x"], r["y"], r["n_occurrences"], r["n_tokens_after"])
        for r in vocab_bpe_train(spark, str(d)).collect()
    ]

    corpora = [[w for w in re.split(r"[^a-z0-9]+", t.lower()) if w] for t in texts]
    want = []
    for rnd in range(1, BPE_ROUNDS + 1):
        c: Counter = Counter()
        for ws in corpora:
            c.update(zip(ws, ws[1:]))
        if not c:
            break
        (x, y), n = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        merged = []
        for ws in corpora:
            out, i = [], 0
            while i < len(ws):
                if i + 1 < len(ws) and ws[i] == x and ws[i + 1] == y:
                    out.append(f"{x} {y}")
                    i += 2
                else:
                    out.append(ws[i])
                    i += 1
            merged.append(out)
        corpora = merged
        want.append((rnd, x, y, n, sum(len(ws) for ws in corpora)))
    assert got == want


@given(texts=doc_texts)
@SETTINGS
def test_vocab_bpe_apply_matches_python_encoder(spark, tmp_path_factory, texts):
    """vocab_bpe_apply == a pure-python train-then-encode: learn
    BPE_ROUNDS merges exactly like the trainer, apply them greedily
    left-to-right per document, and the per-doc (n_tokens, n_merged,
    md5 of the '#'-joined pieces) must all agree — the md5 pins the
    complete encoded sequence, not just its length."""
    import hashlib
    import re

    from collections import Counter

    from spark_graft.operators.vocab import BPE_ROUNDS, vocab_bpe_apply

    d = tmp_path_factory.mktemp("bpe_apply")
    spark.createDataFrame(
        [(i, t, "en", 0) for i, t in enumerate(texts)],
        "doc_id bigint, text string, lang string, quality int",
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    got = sorted(
        (r["doc_id"], r["n_tokens"], r["n_merged"], r["enc_md5"])
        for r in vocab_bpe_apply(spark, str(d)).collect()
    )

    corpora = [[w for w in re.split(r"[^a-z0-9]+", t.lower()) if w] for t in texts]
    for _ in range(BPE_ROUNDS):
        c: Counter = Counter()
        for ws in corpora:
            c.update(zip(ws, ws[1:]))
        if not c:
            break
        (x, y), _n = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        merged = []
        for ws in corpora:
            out, i = [], 0
            while i < len(ws):
                if i + 1 < len(ws) and ws[i] == x and ws[i + 1] == y:
                    out.append(f"{x} {y}")
                    i += 2
                else:
                    out.append(ws[i])
                    i += 1
            merged.append(out)
        corpora = merged
    want = sorted(
        (
            i,
            len(ws),
            sum(1 for p in ws if " " in p),
            hashlib.md5("#".join(ws).encode()).hexdigest(),
        )
        for i, ws in enumerate(corpora)
    )
    assert got == want


@given(
    sup_keys=st.lists(st.integers(min_value=0, max_value=200), min_size=1, max_size=40, unique=True),
    fact_keys=st.lists(st.integers(min_value=0, max_value=200), min_size=0, max_size=80),
)
@SETTINGS
def test_join_bloom_bitmap_has_no_false_negatives(spark, sup_keys, fact_keys):
    """The bloom bitmap construction (k positions per key, int32 word
    packing, signed-literal conversion, per-row bit-tests) must never
    drop a true key: for ANY build-side key set, every fact row whose
    key IS in the set passes the filter. False positives are allowed
    (the residual join removes them); a false negative silently loses
    rows — so this pins the bit arithmetic on arbitrary keys, not just
    the fixture's."""
    from pyspark.sql import functions as F

    from spark_graft.operators.joins import BLOOM_K, _BLOOM_WORDS, _bloom_pos_spark

    build = spark.createDataFrame([(k,) for k in sup_keys], "key bigint")
    pos_rows = (
        build.select(
            F.explode(
                F.array(*[_bloom_pos_spark(F.col("key"), s) for s in range(BLOOM_K)])
            ).alias("pos")
        )
        .distinct()
        .collect()
    )
    words = [0] * _BLOOM_WORDS
    for r in pos_rows:
        words[r.pos >> 5] |= 1 << (r.pos & 31)
    words = [w - (1 << 32) if w >= (1 << 31) else w for w in words]
    bitmap = F.lit(words)

    fact = spark.createDataFrame([(k,) for k in fact_keys] or [(None,)], "key bigint").filter(
        F.col("key").isNotNull()
    )
    cond = F.lit(True)
    for s in range(BLOOM_K):
        p = _bloom_pos_spark(F.col("key"), s)
        word = F.element_at(bitmap, F.shiftright(p, 5) + 1)
        mask = F.call_function("shiftleft", F.lit(1), p % 32)
        cond = cond & (word.bitwiseAND(mask) != F.lit(0))
    passed = {r.key for r in fact.filter(cond).collect()}
    required = set(fact_keys) & set(sup_keys)
    assert required <= passed, (sorted(required - passed), sorted(passed))


def test_multimodal_neardup_planted_pairs(spark, tmp_path_factory):
    """multimodal_neardup's pair path on PLANTED near-dups (the
    committed fixtures have none at sf0.01, so the driver hash-gate
    only pins per-doc hash arithmetic there): a 200-copy identical
    group (hamming 0 through the CHUNKED expansion — group bigger than
    PAIR_CHUNK), a single-char-substituted variant whose sampled pixel
    strip differs in 1-3 of 64 bits (caught only via the band join +
    hamming verify, never an exact-hash match — the "one corrupted
    pixel" analogue; an APPEND would shift every sample position like a
    resize and land far outside the budget), a heavily different doc
    (must pair with nothing), and an empty doc (undecodable — excluded
    from output entirely). Verified against the DuckDB oracle AND
    structurally."""
    import duckdb

    from spark_graft.operators.multimodal import AHASH_HAM_T, ahash_pixels
    from tests.compare import assert_frames_match

    base = ("the quick brown fox jumps over the lazy dog and runs far " * 40).strip()
    texts = {i: base for i in range(200)}

    def bits(t):
        p = ahash_pixels(t)
        s = sum(p)
        return [1 if 64 * q > s else 0 for q in p]

    # find a same-length single-char substitution with hamming in (0, T]
    b0, variant = bits(base), None
    for pos in range(0, len(base), 37):
        for ch in "a0 ":
            if base[pos] == ch:
                continue
            cand = base[:pos] + ch + base[pos + 1:]
            ham = sum(x != y for x, y in zip(b0, bits(cand)))
            if 0 < ham <= AHASH_HAM_T:
                variant = cand
                break
        if variant:
            break
    assert variant is not None, "no substitution landed in (0, T]"
    texts[200] = variant
    texts[201] = "completely different words about gardening and soup " * 20
    texts[202] = ""  # undecodable
    d = str(tmp_path_factory.mktemp("mmnd"))
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in sorted(texts.items())],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(d + "/documents.parquet")
    from spark_graft.registry import REGISTRY

    spec = REGISTRY["multimodal_neardup"]
    got = spec.fn(spark, d).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'")
    assert_frames_match(got, con.execute(spec.oracle).df(), "planted:neardup")
    by_id = got.set_index("doc_id")
    # the identical group: 199 partners each + the variant = 200
    assert (by_id.loc[range(200), "n_neardups"] == 200).all()
    assert (by_id.loc[range(1, 200), "nearest_id"] == 0).all()
    assert by_id.loc[0, "nearest_id"] == 1
    # the variant pairs with the whole group but NOT via identical hash
    assert by_id.loc[200, "n_neardups"] == 200
    assert by_id.loc[200, "ahash_hex"] != by_id.loc[0, "ahash_hex"]
    # the unrelated doc pairs with nothing; the empty doc has no row
    assert by_id.loc[201, "n_neardups"] == 0
    assert 202 not in by_id.index


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=20),
        min_size=1,
        max_size=8,
    ),
    long_reps=st.sampled_from([0, 0, 0, 300, 700]),
)
@SETTINGS
def test_dedup_substring_matches_python_reference(spark, docs, long_reps):
    """The span-mask rewrite == a plain python implementation of the
    ExactSubstr semantics for ANY corpus: a token is removed iff some
    8-token span covering it occurs in >= 2 documents. The 3-letter
    vocabulary makes shared spans common, exercising partial masks,
    full removals, and untouched docs in one draw. When long_reps > 0
    the draw additionally appends a BOOK-LENGTH document (>= 5k tokens
    at 700 reps: the first drawn doc tiled with unique separators, so
    it mixes cross-doc-shared spans with unique prose) — the r13
    sorted-starts sweep must stay exact AND subquadratic there; the
    old per-token array probes took minutes on docs this long."""
    from spark_graft.operators.dedup import SPAN_N, dedup_substring

    if long_reps:
        tile = (docs[0] or ["a", "b"])[:10]
        book = []
        for r in range(long_reps):
            book.extend(tile)
            book.append(f"u{r}")  # unique separator breaks span runs
        docs = docs + [book]
    texts = [" ".join(d) for d in docs]
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
            "doc_id bigint, text string, lang string, source string, n_chars bigint",
        ).write.mode("overwrite").parquet(f"{td}/documents.parquet")
        got = {
            r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
            for r in dedup_substring(spark, td).collect()
        }

    span_docs: dict[str, set[int]] = {}
    for i, d in enumerate(docs):
        for j in range(len(d) - SPAN_N + 1):
            span_docs.setdefault(" ".join(d[j : j + SPAN_N]), set()).add(i)
    for i, d in enumerate(docs):
        covered: set[int] = set()
        for j in range(len(d) - SPAN_N + 1):
            if len(span_docs[" ".join(d[j : j + SPAN_N])]) > 1:
                covered.update(range(j, j + SPAN_N))
        kept = [t for p, t in enumerate(d) if p not in covered]
        assert got[i] == (len(d), len(covered), " ".join(kept)), (i, d, got[i])


def test_pretrain_pipeline_each_gate_drops_its_doc(spark, tmp_path):
    """Adversarial end-to-end fixture for pipeline_pretrain_corpus: one
    document per gate, engineered so exactly that gate (and no other)
    removes it — quality floor (7 tokens), langid (Spanish), exact dup
    (byte-identical copy), minhash near-dup (1-token edit of a 50-token
    doc), decontamination (shares a 4-gram with the eval-decile doc),
    plus the eval doc itself — and the survivors come out packed with
    exact chunk offsets."""
    from spark_graft.registry import REGISTRY

    filler = {
        i: f"the w{i}a w{i}b w{i}c w{i}d w{i}e w{i}f w{i}g w{i}h"
        for i in range(1, 15)
    }
    big = "the " + " ".join(f"alpha{i} beta{i}" for i in range(25))  # 51 toks
    texts = dict(filler)
    texts[10] = "held out benchmark prompt " + "evalpad " * 8  # eval decile
    texts[1] = "the too short seven tokens"  # 5 < MIN_TOKENS=8
    texts[2] = "el perro la casa de los gatos y el sol y la luna es bonita"
    texts[3] = filler[4]  # exact dup pair (3, 4): keep-first keeps id 3
    texts[5] = big
    texts[6] = big.replace("alpha12", "gamma12")  # near-dup of doc 5
    texts[7] = "the quick tour then held out benchmark prompt plus trailing pads"
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in sorted(texts.items())],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    rows = REGISTRY["pipeline_pretrain_corpus"].fn(spark, str(tmp_path)).collect()
    out_ids = {r["doc_id"] for r in rows}
    assert 10 not in out_ids  # eval decile never enters training
    assert 1 not in out_ids  # quality floor
    assert 2 not in out_ids  # langid
    assert 3 in out_ids and 4 not in out_ids  # exact dup: keep-first (min id)
    assert 5 in out_ids and 6 not in out_ids  # near-dup gate: keep lower id
    assert 7 not in out_ids  # decontaminated (shares a 4-gram with doc 10)
    # every untouched filler doc survives
    assert {8, 9, 11, 12, 13, 14} <= out_ids
    # packing invariant: within each shard, offsets are the exact
    # running sum of token counts in doc_id order
    from collections import defaultdict

    by_shard = defaultdict(list)
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        by_shard[r["shard"]].append(r)
    from spark_graft.operators.pipeline import PACK_BUDGET

    for shard, rs in by_shard.items():
        run = 0
        for r in rs:
            assert r["chunk_id"] == run // PACK_BUDGET and r["tok_offset"] == run % PACK_BUDGET, r
            run += r["n_tokens"]


def test_media_pipeline_each_gate_drops_its_doc(spark, tmp_path):
    """Adversarial end-to-end fixture for pipeline_media_corpus (the
    media twin of the pretrain per-gate fixture above): one document
    per gate, engineered so exactly that gate (and no other) removes it
    — exact digest dup (byte-identical payload), decodability (empty
    payload, the codec-failure path), aHash near-dup (single-char
    substitution with hamming in (0, T], so it can ONLY pair via the
    band LSH, never via an identical hash) — plus a video-modality doc
    whose frame deliverables and a survivor's thumbnail are checked
    against the stub arithmetic, and the whole fixture hash-gated
    against the oracle."""
    import duckdb

    from spark_graft.operators.multimodal import (
        AHASH_HAM_T,
        FRAME_STRIDE,
        ahash_pixels,
        resize_payload,
    )
    from spark_graft.registry import REGISTRY
    from tests.compare import assert_frames_match

    def bits(t):
        p = ahash_pixels(t)
        s = sum(p)
        return [1 if 64 * q > s else 0 for q in p]

    base = ("media payload body with many repeated sampled characters " * 12).strip()
    while len(base.encode()) % 3 == 2:  # keep the near-dup pair non-video
        base += "q"
    # a same-length single-char substitution with hamming in (0, T]
    b0, variant = bits(base), None
    for pos in range(0, len(base), 23):
        for ch in "a0 ":
            if base[pos] == ch:
                continue
            cand = base[:pos] + ch + base[pos + 1 :]
            ham = sum(x != y for x, y in zip(b0, bits(cand)))
            if 0 < ham <= AHASH_HAM_T:
                variant = cand
                break
        if variant:
            break
    assert variant is not None, "no substitution landed in (0, T]"

    texts = {
        i: " ".join(f"w{i}x{j}v{(i * 37 + j * 11) % 97}" for j in range(3 + i % 5))
        for i in range(10, 20)
    }
    texts[1] = base  # near-dup pair survivor (lowest id wins)
    texts[2] = variant  # dropped by the aHash gate, NOT by digest
    texts[3] = texts[11]  # exact copy of doc 11 -> digest gate keeps 3? no: min id
    texts[4] = ""  # undecodable -> codec gate
    # force a video: kind = n_bytes % 3 == 2
    v = "video payload content xyz"
    while len(v.encode()) % 3 != 2:
        v += "x"
    texts[5] = v
    texts[6] = None  # NULL payload: normalizes to '' -> undecodable drop
    d = str(tmp_path)
    spark.createDataFrame(
        [(i, t, "en", "s", len(t or "")) for i, t in sorted(texts.items())],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(d + "/documents.parquet")

    spec = REGISTRY["pipeline_media_corpus"]
    got = spec.fn(spark, d).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'"
    )
    assert_frames_match(got, con.execute(spec.oracle).df(), "planted:media_corpus")

    by_id = got.set_index("doc_id")
    # exact-dup collapse: 3 < 11, keep-first keeps 3 with n_copies=2
    assert 3 in by_id.index and 11 not in by_id.index
    assert by_id.loc[3, "n_copies"] == 2
    # undecodable payloads dropped even though digest-unique — doc 4
    # (empty) and doc 6 (NULL, normalized to '' rather than crashing
    # the Arrow batch or mislabeling as video; they also share the
    # md5('') digest group, so only min-id 4 even reaches the gate)
    assert 4 not in by_id.index and 6 not in by_id.index
    # near-dup collapse: min-id survivor keeps 1, drops 2; the pair is
    # NOT digest-identical (different text), so only the aHash gate
    # can have removed it
    assert 1 in by_id.index and 2 not in by_id.index
    assert by_id.loc[1, "n_near_partners"] == 1
    # video deliverables follow the stub arithmetic
    nb = len(texts[5].encode())
    want_fps = [(5 * 31 + i) % 256 for i in range(0, nb % 30 + 1, FRAME_STRIDE)]
    assert by_id.loc[5, "kind"] == "video"
    assert by_id.loc[5, "n_frames_sampled"] == len(want_fps)
    assert by_id.loc[5, "frame_fps"] == ",".join(str(x) for x in want_fps)
    # non-video survivors carry no frames
    assert by_id.loc[1, "n_frames_sampled"] == 0 and by_id.loc[1, "frame_fps"] == ""
    # a survivor's thumbnail equals the stub resize arithmetic
    w, thumb = resize_payload(texts[1])
    assert by_id.loc[1, "src_w"] == w
    assert by_id.loc[1, "thumb_hex"] == "".join(f"{p:02x}" for p in thumb)
    # untouched fillers all survive
    assert all(i in by_id.index for i in range(12, 20))


def test_profile_skew_detects_planted_hot_key(spark, tmp_path):
    """profile_skew on an engineered distribution: one user owns half
    the rows, the rest spread uniformly. The hot key must rank 1 with
    the exact fixed-point share, the skew factor must equal the exact
    integer formula, and a perfectly uniform corpus must report
    skew_fx == 1000 (the 'plain hash shuffle is fine' reading)."""
    from spark_graft.registry import REGISTRY

    def write_events(rows, d):
        spark.createDataFrame(
            [(i, "2024-01-01 00:00:00", u, "view", 1.0, "{}") for i, u in enumerate(rows)],
            "event_id bigint, ts string, user_id bigint, event_type string, "
            "value double, props string",
        ).selectExpr(
            "event_id", "CAST(ts AS TIMESTAMP) ts", "user_id", "event_type",
            "value", "props"
        ).write.mode("overwrite").parquet(str(d / "events.parquet"))

    # planted: user 7 has 500 rows, users 0..99 have 5 each -> 1000 rows
    hot = tmp_path / "hot"
    hot.mkdir()
    rows = [7] * 500 + [u for u in range(100) for _ in range(5)]
    write_events(rows, hot)
    got = {r["rank"]: r for r in REGISTRY["profile_skew"].fn(spark, str(hot)).collect()}
    n_rows, n_keys = 1000, 100  # user 7 is also in 0..99
    top = got[1]
    assert top["user_id"] == 7 and top["cnt"] == 505
    assert top["share_fx"] == (505 * 10000) // n_rows
    assert top["skew_fx"] == (505 * 1000 * n_keys) // n_rows  # ~50x uniform
    assert top["n_rows"] == n_rows and top["n_keys"] == n_keys

    # uniform: every key exactly 4 rows -> skew_fx exactly 1000
    uni = tmp_path / "uni"
    uni.mkdir()
    write_events([u for u in range(50) for _ in range(4)], uni)
    u1 = REGISTRY["profile_skew"].fn(spark, str(uni)).collect()[0]
    assert u1["skew_fx"] == 1000


def _write_docs(spark, rows, d):
    """rows: list of (doc_id, text, lang, source)."""
    spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in rows],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))


def _md5_raw_py(prefix: str, key) -> int:
    import hashlib

    return int(hashlib.md5(f"{prefix}{key}".encode()).hexdigest()[:8], 16)


def test_sample_temperature_matches_exact_formula(spark, tmp_path):
    """sample_temperature on a planted 2-language mixture: every doc's
    copy count must equal the pure-Python evaluation of the declared
    integer contract, and the alpha=0.5 rebalance must give the rare
    language a strictly higher per-doc rate than the dominant one."""
    import math

    from spark_graft.operators.pipeline import TEMP_SQRT_SCALE
    from spark_graft.registry import REGISTRY

    d = tmp_path / "mix"
    d.mkdir()
    counts = {"big": 160, "small": 10}
    rows, i = [], 0
    for lang, n in counts.items():
        for _ in range(n):
            rows.append((i, f"doc {i}", lang, "s"))
            i += 1
    _write_docs(spark, rows, d)

    s = {l: math.floor(math.sqrt(n) * TEMP_SQRT_SCALE) for l, n in counts.items()}
    n_total, s_total = sum(counts.values()), sum(s.values())
    expected = {}
    for doc_id, _, lang, _ in rows:
        num, den = n_total * s[lang], s_total * counts[lang]
        frac_fx = math.floor((num % den) / den * 4294967296.0)
        n_copies = num // den + (1 if _md5_raw_py("temp:", doc_id) < frac_fx else 0)
        if n_copies > 0:
            expected[doc_id] = (lang, n_copies)

    got = {
        r["doc_id"]: (r["lang"], r["n_copies"])
        for r in REGISTRY["sample_temperature"].fn(spark, str(d)).collect()
    }
    assert got == expected
    # rebalance direction: rare lang rate (expected copies per doc) must
    # exceed the dominant lang's
    rate = {
        l: (n_total * s[l]) / (s_total * counts[l]) for l in counts
    }
    assert rate["small"] > 1 > rate["big"]
    # resampled total ~= corpus size: floor+Bernoulli rounding costs at
    # most ~1 expected copy per language, and md5 sampling noise on this
    # fixed fixture stays within another — 2 docs of slack per language
    total = sum(c for _, c in expected.values())
    assert abs(total - n_total) <= 2 * len(counts)


def test_sample_reservoir_fixed_size_and_append_stability(spark, tmp_path):
    """sample_reservoir: exactly min(K, stratum size) rows per source,
    membership == the K lowest md5 ranks (python-verified), and growing
    a stratum can only DISPLACE members — any sampled doc from the old
    universe must already have been in the old sample."""
    from spark_graft.operators.pipeline import RESERVOIR_K
    from spark_graft.registry import REGISTRY

    d1 = tmp_path / "v1"
    d1.mkdir()
    small = [(i, f"t {i}", "en", "small") for i in range(5)]
    big = [(100 + i, f"t {100 + i}", "en", "big") for i in range(100)]
    _write_docs(spark, small + big, d1)
    out = REGISTRY["sample_reservoir"].fn(spark, str(d1)).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    assert len(by_src["small"]) == 5
    assert len(by_src["big"]) == RESERVOIR_K
    expect_big = set(
        sorted((i for i, *_ in big), key=lambda i: (_md5_raw_py("res:", i), i))[
            :RESERVOIR_K
        ]
    )
    assert by_src["big"] == expect_big

    d2 = tmp_path / "v2"
    d2.mkdir()
    grown = big + [(300 + i, f"t {300 + i}", "en", "big") for i in range(50)]
    _write_docs(spark, small + grown, d2)
    out2 = REGISTRY["sample_reservoir"].fn(spark, str(d2)).collect()
    big2 = {r["doc_id"] for r in out2 if r["source"] == "big"}
    assert len(big2) == RESERVOIR_K
    # append-only displacement: survivors from the old universe were
    # already sampled before the append
    assert big2 & {i for i, *_ in big} <= expect_big


def test_text_diversity_exact_small_docs(spark, tmp_path):
    """text_diversity on hand-computed docs: uniform repetition gives
    simpson_fx = SCALE and eff_tokens = 1; all-distinct gives
    eff_tokens = n; token-less docs are absent."""
    from spark_graft.registry import REGISTRY

    d = tmp_path / "docs"
    d.mkdir()
    _write_docs(
        spark,
        [
            (0, "a a a a", "en", "s"),
            (1, "a b c d", "en", "s"),
            (2, "a a b", "en", "s"),
            (3, "...", "en", "s"),  # no tokens
        ],
        d,
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["simpson_fx"], r["eff_tokens"])
        for r in REGISTRY["text_diversity"].fn(spark, str(d)).collect()
    }
    assert got[0] == (4, 1000000, 1.0)
    assert got[1] == (4, 4 * 1000000 // 16, 4.0)
    assert got[2] == (3, 5 * 1000000 // 9, round(9 / 5, 4))
    assert 3 not in got


def test_agg_weighted_quantile_weight_dominance(spark, tmp_path):
    """agg_weighted_quantile on a planted histogram: a 9:1 weight mass
    at the low price pulls BOTH wq50 and wq90 to it (where the
    unweighted quantiles would not), and uniform weights reduce to the
    plain lower quantile."""
    from spark_graft.registry import REGISTRY

    d = tmp_path / "li"
    d.mkdir()
    rows = []
    # flag A: prices 1..10, weight 1 each -> wq50=5, wq90=9
    rows += [("A", float(p), 1.0) for p in range(1, 11)]
    # flag B: price 1 carries weight 9, price 100 weight 1 -> both
    # quantiles sit at 1
    rows += [("B", 1.0, 9.0), ("B", 100.0, 1.0)]
    spark.createDataFrame(
        [(1, 1, 1, i, q, p, 0.0, 0.0, f, "O", "1996-01-01") for i, (f, p, q) in enumerate(rows)],
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate string",
    ).selectExpr(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "CAST(l_shipdate AS DATE) l_shipdate",
    ).write.mode("overwrite").parquet(str(d / "lineitem.parquet"))
    got = {
        r["l_returnflag"]: (r["wq50"], r["wq90"], r["total_weight"])
        for r in REGISTRY["agg_weighted_quantile"].fn(spark, str(d)).collect()
    }
    assert got["A"] == (5.0, 9.0, 10)
    assert got["B"] == (1.0, 1.0, 10)


def test_rank_fusion_doc_top_in_both_legs_wins(spark, tmp_path):
    """rank_fusion on a planted corpus where doc 0 is rank 1 on BOTH
    legs (stuffed with the mid-frequency query terms; embedding equal to
    the probe): it must be the fused top-1, and the rank columns must
    report 1/1."""
    from spark_graft.registry import REGISTRY

    d = tmp_path / "corpus"
    d.mkdir()
    # 30 background docs set the df ranking: terms bg0..bg8 appear in
    # all 30 (df ranks 1..9), qa/qb/qc in 20 (ranks 10..12), rare terms
    # below. doc 0 stuffs qa/qb/qc.
    bg = " ".join(f"bg{j}" for j in range(9))
    rows = [(0, "qa qb qc " * 5 + bg, "en", "s")]
    for i in range(1, 31):
        text = bg + (" qa qb qc" if i <= 19 else " rare" + str(i))
        rows.append((i, text, "en", "s"))
    _write_docs(spark, rows, d)
    vecs = [(0, [1.0] + [0.0] * 7, 0)]
    rng_free = [(i, [0.1 * (i % 5), 1.0] + [0.0] * 6, 0) for i in range(1, 31)]
    spark.createDataFrame(
        [(v, [float(x) for x in e], l) for v, e, l in vecs + rng_free],
        "vec_id bigint, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(str(d / "embeddings.parquet"))

    out = REGISTRY["rank_fusion"].fn(spark, str(d)).collect()
    top = out[0]
    assert top["doc_id"] == 0
    assert top["lex_rank"] == 1 and top["dense_rank"] == 1


def test_pipeline_curriculum_exact_quartiles(spark, tmp_path):
    """pipeline_curriculum on planted lengths 1..8 (one doc each): the
    integer ceil-quartile contract puts lengths 1-2 in stage 1, 3-4 in
    2, 5-6 in 3, 7-8 in 4; a corpus with ONE distinct length is all
    stage 4 (its single value IS the top of the distribution)."""
    from spark_graft.registry import REGISTRY

    d = tmp_path / "lens"
    d.mkdir()
    _write_docs(
        spark,
        [(i, " ".join(f"w{j}" for j in range(i)), "en", "s") for i in range(1, 9)],
        d,
    )
    got = {
        r["doc_id"]: r["stage"]
        for r in REGISTRY["pipeline_curriculum"].fn(spark, str(d)).collect()
    }
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 3, 6: 3, 7: 4, 8: 4}

    u = tmp_path / "uniform"
    u.mkdir()
    _write_docs(spark, [(i, "a b c", "en", "s") for i in range(4)], u)
    stages = {
        r["stage"] for r in REGISTRY["pipeline_curriculum"].fn(spark, str(u)).collect()
    }
    assert stages == {4}


def test_pipeline_preference_pairs_strict_gap_no_self_pairs(spark, tmp_path):
    """pipeline_preference_pairs on a planted source: the most-diverse
    doc pairs with the most-repetitive, a single-doc source emits
    NOTHING (the strict-gap filter kills the self-pair), and every
    emitted gap is positive."""
    from spark_graft.registry import REGISTRY

    d = tmp_path / "pref"
    d.mkdir()
    _write_docs(
        spark,
        [
            (0, "a b c d e", "en", "s1"),  # simpson 200000 (most diverse)
            (1, "a a b b", "en", "s1"),    # simpson 500000
            (2, "a a a a", "en", "s1"),    # simpson 1000000 (most repetitive)
            (3, "x y z", "en", "lone"),    # single-doc source
        ],
        d,
    )
    rows = REGISTRY["pipeline_preference_pairs"].fn(spark, str(d)).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    assert "lone" not in by_src
    s1 = sorted(by_src["s1"], key=lambda r: r["pair_rank"])
    assert (s1[0]["chosen_id"], s1[0]["rejected_id"]) == (0, 2)
    assert s1[0]["gap_fx"] == 800000
    assert all(r["gap_fx"] > 0 for r in rows)
    # the middle doc (rank 2 on both legs) would self-pair at gap 0 —
    # the strict filter must have dropped it
    assert all(r["chosen_id"] != r["rejected_id"] for r in rows)


def test_rank_fusion_empty_documents_keeps_dense_leg(spark, tmp_path):
    """rank_fusion with an EMPTY documents table and nonzero embeddings:
    the dense leg reads embeddings independently of documents (exactly
    like the oracle's dense_top CTE), so the fused result must be the
    dense-only ranking — a doc-count early-return here once diverged
    from the oracle (code-review r14)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_graft.registry import REGISTRY

    d = tmp_path / "emptydocs"
    d.mkdir()
    schema = pa.schema(
        [("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string()),
         ("source", pa.string()), ("n_chars", pa.int64())]
    )
    (d / "documents.parquet").mkdir()
    pq.write_table(
        pa.table({f.name: pa.array([], f.type) for f in schema}, schema=schema),
        str(d / "documents.parquet" / "part-0.parquet"),
    )
    spark.createDataFrame(
        [(i, [float(i % 3 + 1)] * 8, 0) for i in range(5)],
        "vec_id bigint, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(os.path.join(str(d), "embeddings.parquet"))
    rows = REGISTRY["rank_fusion"].fn(spark, str(d)).collect()
    assert len(rows) == 5
    assert all(r["lex_rank"] is None for r in rows)
    assert {r["dense_rank"] for r in rows} == {1, 2, 3, 4, 5}
    assert all(r["rrf_fx"] == 1000000 // (60 + r["dense_rank"]) for r in rows)


def _write_events(spark, rows, d):
    """rows: list of (event_id, ts_str, user_id, event_type, value)."""
    spark.createDataFrame(
        [(i, ts, u, et, v, "{}") for i, ts, u, et, v in rows],
        "event_id bigint, ts string, user_id bigint, event_type string, "
        "value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) ts", "user_id", "event_type",
        "value", "props"
    ).write.mode("overwrite").parquet(str(d / "events.parquet"))


def test_events_transitions_exact_matrix_no_cross_user(spark, tmp_path):
    """events_transitions on a planted two-user timeline: exact counts
    and fixed-point probabilities, and NO transition across the user
    boundary (user 1 ends with purchase, user 2 starts with view — a
    global sequence would fabricate purchase->view)."""
    from spark_graft.registry import REGISTRY

    d = tmp_path / "ev"
    d.mkdir()
    rows = [
        (0, "2024-01-01 10:00:00", 1, "view", 1.0),
        (1, "2024-01-01 10:01:00", 1, "view", 1.0),
        (2, "2024-01-01 10:02:00", 1, "purchase", 5.0),
        (3, "2024-01-01 09:00:00", 2, "view", 1.0),
        (4, "2024-01-01 09:01:00", 2, "click", 1.0),
        (5, "2024-01-01 09:02:00", 2, "view", 1.0),
    ]
    _write_events(spark, rows, d)
    got = {
        (r["cur_type"], r["next_type"]): (r["n_transitions"], r["prob_fx"])
        for r in REGISTRY["events_transitions"].fn(spark, str(d)).collect()
    }
    # user1: view->view, view->purchase; user2: view->click, click->view
    assert got == {
        ("view", "view"): (1, 1000000 // 3),
        ("view", "purchase"): (1, 1000000 // 3),
        ("view", "click"): (1, 1000000 // 3),
        ("click", "view"): (1, 1000000),
    }
    assert ("purchase", "view") not in got  # the cross-user fabrication


def test_ts_ewma_exact_values_and_start_renormalization(spark, tmp_path):
    """ts_ewma on a planted series: hand-computed exact values — the
    first event's EWMA is its own value (renormalized), and a constant
    series smooths to the constant."""
    from spark_graft.registry import REGISTRY

    d = tmp_path / "ev"
    d.mkdir()
    rows = [
        (0, "2024-01-01 10:00:00", 1, "view", 4.0),
        (1, "2024-01-01 10:01:00", 1, "view", 8.0),
        (2, "2024-01-01 10:02:00", 1, "view", 2.0),
    ] + [(10 + i, f"2024-01-01 11:0{i}:00", 2, "view", 7.0) for i in range(4)]
    _write_events(spark, rows, d)
    got = {
        r["event_id"]: r["ewma"]
        for r in REGISTRY["ts_ewma"].fn(spark, str(d)).collect()
    }
    assert got[0] == 4.0  # first event: its own value
    # event 1: (8 + 4/2) / (1 + 1/2) = 10 / 1.5
    assert got[1] == round(10 / 1.5, 6)
    # event 2: (2 + 8/2 + 4/4) / (1 + 1/2 + 1/4) = 7 / 1.75 = 4.0
    assert got[2] == 4.0
    # constant series stays the constant at every depth
    assert all(got[10 + i] == 7.0 for i in range(4))


def test_dedup_url_normalizer_litmus_cases(spark):
    """normalize_url on literal URLs: every crawler-noise variant of a
    page collapses to one canonical form, while a REAL (non-tracking)
    query parameter survives — stripping it would merge distinct
    pages."""
    from spark_graft.operators.dedup import normalize_url

    canon = "https://host.example.com/page/3"
    cases = {
        "HTTP://Host.Example.COM/page/3?utm_source=feed": canon,
        "https://host.example.com/page/3#sec2": canon,
        "https://host.example.com/page/3/": canon,
        "https://host.example.com/page/3?utm_campaign=c1&utm_medium=m": canon,
        "http://host.example.com/page/3": canon,
        "https://host.example.com/page/3?id=7": canon + "?id=7",
    }
    df = spark.createDataFrame([(u,) for u in cases], "u string")
    got = {
        r["u"]: r["n"]
        for r in df.select("u", normalize_url(F.col("u")).alias("n")).collect()
    }
    assert got == cases


def test_dedup_url_scorecard_matches_pure_python(spark, tmp_path):
    """dedup_url on a planted corpus == an independent pure-Python
    replay of the whole contract (synthesis, normalization, keep-first,
    per-host rates) — including at least one host where collisions are
    KNOWN to exist so keep-first is actually exercised."""
    import re
    from collections import defaultdict

    from spark_graft.operators.dedup import URL_RATE_SCALE
    from spark_graft.registry import REGISTRY

    d = tmp_path / "urls"
    d.mkdir()
    # 'common_crawl-2' exercises the host sanitizer: '_' must be
    # stripped on both engines (and by parse_url's URI rules in fn_url)
    sources = ["s0", "s1", "common_crawl-2"]
    rows = [(i, f"doc {i}", "en", sources[i % 3]) for i in range(90)]
    _write_docs(spark, rows, d)

    def synth(doc_id, source):
        scheme = "https" if doc_id % 2 == 0 else "HTTP"
        host = source.upper() if doc_id % 3 == 0 else source
        host = "s" + re.sub(r"[^a-zA-Z0-9]", "", host)
        bucket = _md5_raw_py("url:", doc_id) % 12
        junk = {
            0: "?utm_source=feed",
            1: f"?utm_campaign=c{doc_id % 4}&utm_medium=m",
            2: f"#sec{doc_id % 7}",
            3: "/",
        }.get(doc_id % 5, "")
        # 's' prefix + alnum body mirror _URL_RAW_SQL's
        # always-valid-domainlabel construction
        return f"{scheme}://{host}.Example.COM/page/{bucket}{junk}"

    def norm(u):
        u = u.lower()
        u = re.sub(r"^http://", "https://", u)
        u = re.sub(r"#.*$", "", u)
        u = re.sub(r"\?utm_[a-z]+=[a-z0-9]*(&utm_[a-z]+=[a-z0-9]*)*$", "", u)
        return re.sub(r"/$", "", u)

    per_url = defaultdict(list)
    for i, _, _, src in rows:
        per_url[norm(synth(i, src))].append(i)
    want = defaultdict(lambda: [0, 0, 0])  # host -> [docs, urls, kept_sum]
    for u, ids in per_url.items():
        host = re.match(r"^https://([^/]+)", u).group(1)
        want[host][0] += len(ids)
        want[host][1] += 1
        want[host][2] += min(ids)
    got = {
        r["host"]: r
        for r in REGISTRY["dedup_url"].fn(spark, str(d)).collect()
    }
    assert set(got) == set(want)
    for host, (n_docs, n_urls, kept) in want.items():
        r = got[host]
        assert (r["n_docs"], r["n_urls"], r["kept_doc_id_sum"]) == (
            n_docs, n_urls, kept,
        ), host
        assert r["n_dupes"] == n_docs - n_urls
        assert r["dup_rate_fx"] == (n_docs - n_urls) * URL_RATE_SCALE // n_docs
    # the planted corpus must actually contain collisions, or keep-first
    # went untested
    assert sum(r["n_dupes"] for r in got.values()) > 0


def test_gopher_rules_each_rule_fails_independently(spark, tmp_path):
    """pipeline_gopher_rules on planted docs: one doc per failure mode,
    each tripping exactly the rules it was built to trip (the corpus
    data only ever exercises the stopword rule, so the other three need
    planted negatives), plus a clean doc passing all four."""
    from spark_graft.registry import REGISTRY

    d = tmp_path / "gopher"
    d.mkdir()
    rows = [
        (0, "the cat and the dog walk to the park in the morning", "en", "s"),
        (1, "hi there", "en", "s"),  # too short + no stopwords
        (2, "pneumonoultramicroscopic silicovolcanoconiosis "
            "supercalifragilistic expialidocious "
            "antidisestablishmentarianism", "en", "s"),  # mwl > 12
        (3, "a1 b2 c3 d4 e5 f6 g7 h8 i9 j0", "en", "s"),  # digits: alpha fail
    ]
    _write_docs(spark, rows, d)
    got = {
        r["doc_id"]: r
        for r in REGISTRY["pipeline_gopher_rules"].fn(spark, str(d)).collect()
    }
    flags = lambda r: (
        r["r_word_count"], r["r_mean_word_len"], r["r_alpha_ratio"],
        r["r_stopwords"],
    )
    assert flags(got[0]) == (True, True, True, True)
    assert got[0]["keep"] and got[0]["n_fail"] == 0
    assert flags(got[1]) == (False, True, True, False)
    assert flags(got[2]) == (True, False, True, False)
    assert flags(got[3]) == (True, True, False, False)
    for i in (1, 2, 3):
        assert not got[i]["keep"]
        assert got[i]["n_fail"] == 4 - sum(flags(got[i]))


def test_train_eval_split_counts_planted_cross_leak(spark, tmp_path):
    """pipeline_train_eval_split on a planted corpus: two IDENTICAL docs
    whose md5 split buckets land in train and test must register one
    cross-leak pair on each of those splits; a same-split duplicate
    pair and unique docs must not. Split assignment itself must equal
    the pure-Python bucket computation."""
    from spark_graft.operators.text import SPLIT_PCT_TRAIN, SPLIT_PCT_VAL
    from spark_graft.registry import REGISTRY

    def split_of(i):
        b = _md5_raw_py("split:", i) % 100
        return ("train" if b < SPLIT_PCT_TRAIN
                else "val" if b < SPLIT_PCT_TRAIN + SPLIT_PCT_VAL else "test")

    ids = {"train": [], "val": [], "test": []}
    for i in range(400):
        ids[split_of(i)].append(i)
    a, a2 = ids["train"][0], ids["train"][1]
    b, c = ids["test"][0], ids["val"][0]
    dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    same = "one two three four five six seven eight nine ten"
    d = tmp_path / "split"
    d.mkdir()
    rows = [
        (a, dup, "en", "s"),          # train twin of the test doc
        (b, dup, "en", "s"),          # test twin -> 1 cross pair
        (a2, same, "en", "s"),        # same-split duplicate pair:
        (ids["train"][2], same, "en", "s"),  # NOT a leak
        (c, "lonely unique val document with many distinct words here",
         "en", "s"),
    ]
    _write_docs(spark, rows, d)
    got = {
        r["split"]: r
        for r in REGISTRY["pipeline_train_eval_split"].fn(spark, str(d)).collect()
    }
    assert got["train"]["n_docs"] == 3 and got["test"]["n_docs"] == 1
    assert got["val"]["n_docs"] == 1
    assert got["train"]["n_cross_leak_pairs"] == 1
    assert got["test"]["n_cross_leak_pairs"] == 1
    assert got["val"]["n_cross_leak_pairs"] == 0
    assert got["train"]["sum_chars"] == len(dup) + 2 * len(same)


def test_sim_maxsim_late_interaction_hand_check(spark, tmp_path):
    """sim_maxsim on planted vectors: a doc whose ONLY matching content
    lives in a different subvector slot than the query's must still
    score 1.0 (the max over doc subvectors — the late-interaction
    property single-vector cosine lacks), zero subvectors are guarded
    on both sides (the probe itself has three all-zero slices), and an
    anti-parallel slice scores -1."""
    from spark_graft.operators.similarity import SUB_DIM, M_SUB, sim_maxsim

    d = tmp_path / "maxsim"
    d.mkdir()
    dim = SUB_DIM * M_SUB
    e0 = [0.0] * dim
    e0[0] = 1.0  # probe: nonzero only in slice 0
    v1 = [0.0] * dim
    v1[SUB_DIM] = 1.0  # matching direction, but in slice 1
    v2 = [0.0] * dim
    v2[0] = -1.0  # anti-parallel in slice 0
    spark.createDataFrame(
        [(0, e0, 0), (1, v1, 0), (2, v2, 0)],
        "vec_id bigint, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(str(d / "embeddings.parquet"))
    got = {r["vec_id"]: r["maxsim"] for r in sim_maxsim(spark, str(d)).collect()}
    assert got == {0: 1.0, 1: 1.0, 2: -1.0}


def test_events_rfm_matches_pure_python_quantiles(spark, tmp_path):
    """events_rfm on a planted timeline == a pure-Python replay of the
    whole contract (day recency vs the corpus-max anchor, purchase
    cents, exact integer ceil-quantiles, recency polarity flip) — with
    metric values spread so every dimension has a non-degenerate
    quintile assignment, and the most-recent / highest-value users
    provably score 5."""
    from spark_graft.operators.events import RFM_BINS
    from spark_graft.registry import REGISTRY

    d = tmp_path / "rfm"
    d.mkdir()
    # 10 users: user u's last event is u days before the anchor, u+1
    # events total, and one purchase of (10 - u) dollars
    rows, eid = [], 0
    for u in range(10):
        for k in range(u + 1):
            rows.append(
                (eid, f"2024-03-{20 - u:02d} 10:{k:02d}:00", u, "view", None)
            )
            eid += 1
        rows.append(
            (eid, f"2024-03-{20 - u:02d} 11:00:00", u, "purchase",
             float(10 - u)),
        )
        eid += 1
    from datetime import datetime

    spark.createDataFrame(
        [
            (e, datetime.strptime(t, "%Y-%m-%d %H:%M:%S"), u, ty, v)
            for e, t, u, ty, v in rows
        ],
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double",
    ).write.mode("overwrite").parquet(str(d / "events.parquet"))

    per_user = {
        u: (u, u + 2, (10 - u) * 100) for u in range(10)
    }  # r_days, freq(u+1 views + 1 purchase), mon_cents

    def quint(vals):
        hist = sorted(set(vals))
        n = len(vals)
        cum, stage = 0, {}
        from collections import Counter

        c = Counter(vals)
        for v in hist:
            cum += c[v]
            stage[v] = (RFM_BINS * cum + n - 1) // n
        return stage

    sr = quint([m[0] for m in per_user.values()])
    sf_ = quint([m[1] for m in per_user.values()])
    sm = quint([m[2] for m in per_user.values()])
    got = {
        r["user_id"]: r for r in REGISTRY["events_rfm"].fn(spark, str(d)).collect()
    }
    for u, (rd, fq, mc) in per_user.items():
        r = got[u]
        assert (r["r_days"], r["freq"], r["mon_cents"]) == (rd, fq, mc), u
        want_r = RFM_BINS + 1 - sr[rd]
        assert r["r_score"] == want_r
        assert r["f_score"] == sf_[fq] and r["m_score"] == sm[mc]
        assert r["rfm_segment"] == want_r * 100 + sf_[fq] * 10 + sm[mc]
    # polarity: user 0 (most recent, fewest events, biggest spend)
    assert got[0]["r_score"] == 5 and got[0]["m_score"] == 5
    assert got[9]["r_score"] == 1 and got[9]["f_score"] == 5


def test_text_hash_features_signed_fold_hand_check(spark, tmp_path):
    """text_hash_features on a planted doc == the signed hashing trick
    replayed in pure Python (dim = md5 % D, sign = 9th-hex-digit
    parity), including a collision-cancellation doc where two terms of
    opposite sign land in the same dim and the zero row is dropped."""
    from spark_graft.operators.text import FEATURE_DIM
    from spark_graft.registry import REGISTRY

    d = tmp_path / "fh"
    d.mkdir()
    # find two terms with same dim, opposite signs, for the cancel doc
    import hashlib
    import itertools

    def dim_sign(t):
        h = hashlib.md5(f"fh:{t}".encode()).hexdigest()
        return int(h[:8], 16) % FEATURE_DIM, 1 if int(h[8], 16) % 2 == 0 else -1

    words = [f"w{i}" for i in range(200)]
    cancel = next(
        (a, b) for a, b in itertools.combinations(words, 2)
        if dim_sign(a)[0] == dim_sign(b)[0] and dim_sign(a)[1] == -dim_sign(b)[1]
    )
    rows = [
        (0, "alpha alpha beta", "en", "s"),
        (1, f"{cancel[0]} {cancel[1]}", "en", "s"),  # exact cancellation
    ]
    _write_docs(spark, rows, d)
    got = {
        (r["doc_id"], r["dim"]): r["weight"]
        for r in REGISTRY["text_hash_features"].fn(spark, str(d)).collect()
    }
    from collections import defaultdict

    want = defaultdict(int)
    for tok in "alpha alpha beta".split():
        dm, sg = dim_sign(tok)
        want[(0, dm)] += sg
    want = {k: v for k, v in want.items() if v != 0}
    assert {k: v for k, v in got.items() if k[0] == 0} == want
    # the cancellation doc emits NOTHING for the collided dim
    assert not [k for k in got if k[0] == 1]


def test_fn_url_parse_url_survives_hostile_source_names(spark, tmp_path):
    """fn_url's Spark side is java.net.URI-backed parse_url, which
    returns NULL for hosts containing URI-invalid characters — the
    synthesis must therefore sanitize source names ('common_crawl',
    'web.archive/dump') into RFC host labels so HOST/QUERY never go
    NULL where the regex oracle would still extract them."""
    from spark_graft.registry import REGISTRY

    d = tmp_path / "hostile"
    d.mkdir()
    rows = [
        (0, "doc a", "en", "common_crawl"),
        (1, "doc b", "en", "web.archive/dump"),
        (2, "doc c", "en", "ok-source9"),
        (3, "doc d", "en", "-archive"),  # leading hyphen: invalid label raw
        (4, "doc e", "en", "__"),  # sanitizes to empty without the prefix
    ]
    _write_docs(spark, rows, d)
    got = {r["doc_id"]: r for r in REGISTRY["fn_url"].fn(spark, str(d)).collect()}
    assert got[0]["host"] is not None and "_" not in got[0]["host"]
    assert got[1]["host"] is not None and "/" not in got[1]["host"]
    assert got[3]["host"] is not None and not got[3]["host"].startswith("-")
    assert got[4]["host"] is not None  # 's.example.com', never '.example.com'
    for r in got.values():
        assert r["host"] is not None
        assert r["protocol"] is not None and r["path"] is not None
        assert r["canon"].startswith("https://")


def test_dedup_report_funnel_on_planted_stage_failures(spark, tmp_path):
    """pipeline_dedup_report on a corpus planted with one removal per
    stage: a short doc (quality), an exact duplicate, a one-token-off
    near duplicate, and a doc sharing a 4-gram with the eval decile
    (decontamination) — each stage's n_removed and removal rate must
    match the hand count, and n_docs must telescope (prev - removed ==
    cur)."""
    from spark_graft.operators.pipeline import REPORT_SCALE
    from spark_graft.registry import REGISTRY

    d = tmp_path / "funnel"
    d.mkdir()
    base = ("the quick brown fox jumps over the lazy dog while the "
            "other animals watch in the warm afternoon sun")
    # only the FINAL token differs: that perturbs exactly one 3-gram
    # shingle, so jaccard = (S-1)/(S+1) = 16/18 ≈ 0.889 >= 0.8 (a
    # mid-text change breaks 3 shingles and falls below the threshold)
    near = base.replace("sun", "moon")
    eval_text = ("benchmark secret holdout sequence alpha beta gamma delta "
                 "with the usual answer in the end")
    # a 4-gram of the eval doc embedded in an otherwise-unique train doc
    contaminated = ("completely different text about trains in the yard but "
                    "quoting secret holdout sequence alpha for flavor and "
                    "padding words to pass the quality gate")
    rows = [
        # non-eval ids avoid doc_id % 10 == 0 (the eval decile).
        # Near-pair direction: exploded_pairs emits i<j and the gate
        # drops doc_b — the HIGHER id — so 21 (the exact-dup rep that
        # survives s1) is the one removed at s2, and 11 survives.
        (21, base, "en", "s"),            # exact-dup rep; dropped at s2
        (31, base, "en", "s"),            # exact duplicate -> dropped at s1
        (11, near, "en", "s"),            # near twin -> SURVIVES (lower id)
        (12, "too short the end", "en", "s"),  # < 8 tokens -> quality drop
        (0, eval_text, "en", "s"),        # eval decile (doc_id % 10 == 0)
        (13, contaminated, "en", "s"),    # shares a 4-gram -> decontam drop
        (14, "the archive holds many of the fine and old maps in a "
             "long hall", "en", "s"),     # clean keeper
    ]
    _write_docs(spark, rows, d)
    got = {
        r["stage"]: r
        for r in REGISTRY["pipeline_dedup_report"].fn(spark, str(d)).collect()
    }
    assert got["input"]["n_docs"] == 7 and got["input"]["n_removed"] == 0
    # eval doc + short doc leave at the first gate
    assert got["quality_langid_eval"]["n_docs"] == 5
    assert got["quality_langid_eval"]["n_removed"] == 2
    assert got["exact_dedup"]["n_docs"] == 4
    assert got["exact_dedup"]["n_removed"] == 1
    assert got["near_dedup"]["n_docs"] == 3
    assert got["near_dedup"]["n_removed"] == 1
    assert got["decontaminate"]["n_docs"] == 2
    assert got["decontaminate"]["n_removed"] == 1
    # rates: removed * SCALE div prev, telescoping counts
    order = ["input", "quality_langid_eval", "exact_dedup", "near_dedup",
             "decontaminate"]
    for prev, cur in zip(order, order[1:]):
        p, c = got[prev], got[cur]
        assert p["n_docs"] - c["n_removed"] == c["n_docs"]
        assert c["removed_fx"] == c["n_removed"] * REPORT_SCALE // p["n_docs"]


def test_dedup_paragraph_keep_first_and_reassembly(spark, tmp_path):
    """dedup_paragraph on a planted corpus == a pure-Python evaluation
    of the declared contract: paragraphs are PARA_W-token windows,
    keep-first is lexicographic (doc_id, pos) across the corpus
    (within-doc repeats drop too), and each doc reassembles from its
    surviving paragraphs in order. Covers: cross-doc boilerplate, a
    within-doc repeat, a ragged tail window, a doc losing everything,
    and a zero-token doc."""
    from collections import defaultdict

    from spark_graft.operators.dedup import PARA_RATE_SCALE, PARA_W
    from spark_graft.registry import REGISTRY

    A = "alpha beta gamma delta epsilon zeta eta theta"      # 8 tokens
    B = "one two three four five six seven eight"            # 8 tokens
    rows = [
        (1, f"{A} {B}", "en", "s"),          # A@1, B@2 — both originals
        (2, f"{A} unique words here", "en", "s"),   # A dup; ragged tail kept
        (3, f"{B} {A} {A}", "en", "s"),      # all three windows are dups
        (4, "totally fresh prose with nine little tokens", "en", "s"),
        (5, "!!! ...", "en", "s"),           # zero tokens
    ]
    d = tmp_path / "paras"
    d.mkdir()
    _write_docs(spark, rows, d)

    # pure-Python contract evaluation
    import re

    paras = {}
    for doc_id, text, _, _ in rows:
        ts = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        paras[doc_id] = [
            " ".join(ts[i : i + PARA_W]) for i in range(0, len(ts), PARA_W)
        ]
    first = {}
    for doc_id in sorted(paras):
        for pos, p in enumerate(paras[doc_id], start=1):
            first.setdefault(p, (doc_id, pos))
    expected = {}
    for doc_id, ps in paras.items():
        kept = [
            p for pos, p in enumerate(ps, start=1) if first[p] == (doc_id, pos)
        ]
        n, r = len(ps), len(ps) - len(kept)
        expected[doc_id] = (
            n, r, (r * PARA_RATE_SCALE // n) if n else 0, " ".join(kept)
        )

    got = {
        row["doc_id"]: (
            row["n_paras"], row["n_removed"], row["removed_fx"], row["kept_text"]
        )
        for row in REGISTRY["dedup_paragraph"].fn(spark, str(d)).collect()
    }
    assert got == expected
    # spot-assert the planted semantics so the test fails loudly if the
    # fixture stops exercising them
    assert got[3] == (3, 3, PARA_RATE_SCALE, "")   # doc 3 loses everything
    assert got[2][3] == "unique words here"        # ragged tail survives
    assert got[5] == (0, 0, 0, "")                 # zero-token doc

    # NULL text counts as zero paragraphs on BOTH engines: Spark's
    # size(NULL) slips past an == 0 guard and greatest() skips NULLs,
    # which minted one [NULL] paragraph before paragraph_index's
    # coalesce (r16 self-review); the oracle unnests zero rows.
    nd = tmp_path / "paras_null"
    nd.mkdir()
    spark.createDataFrame(
        [(1, None, "en", "s", 0), (2, "real words here", "en", "s", 15)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(str(nd / "documents.parquet"))
    import duckdb

    sp = REGISTRY["dedup_paragraph"].fn(spark, str(nd)).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{nd}/documents.parquet/*.parquet'"
    )
    from compare import assert_frames_match

    assert_frames_match(
        sp, con.execute(REGISTRY["dedup_paragraph"].oracle).df(),
        "dedup_paragraph:null-text",
    )
    byid = {r.doc_id: r for r in sp.itertuples()}
    assert (byid[1].n_paras, byid[1].kept_text) == (0, "")


def test_decontaminate_semantic_flags_planted_paraphrase_leak(spark, tmp_path):
    """decontaminate_semantic on a planted embedding corpus: a train
    vector sitting next to an eval-decile vector (the paraphrase-leak
    case the n-gram `decontaminate` misses) MUST be flagged with that
    eval item as its nearest hit; every flagged row must respect the
    train/eval decile convention; and the flag set must be a subset of
    the global (blocking-free) brute-force answer."""
    import hashlib

    import numpy as np

    from spark_graft.operators.pipeline import EVAL_MOD, SEM_DECON_THRESHOLD
    from spark_graft.registry import REGISTRY

    dim, n = 8, 48

    def vec(i: int) -> list[float]:
        if i == 10:   # eval decile item: a fixed distinctive direction
            return [3.0, 1.0, 0.0, 0.0, 2.0, 0.0, 1.0, 0.0]
        if i == 11:   # the paraphrase leak: eval item + one tiny nudge
            return [3.0, 1.0, 0.05, 0.0, 2.0, 0.0, 1.0, 0.0]
        return [
            int(hashlib.md5(f"{i}:{k}".encode()).hexdigest()[:8], 16) / 2**31
            - 1.0
            for k in range(dim)
        ]

    d = tmp_path / "semleak"
    d.mkdir()
    spark.createDataFrame(
        [(i, i % 4, vec(i)) for i in range(n)],
        "vec_id bigint, label int, embedding array<float>",
    ).write.mode("overwrite").parquet(str(d / "embeddings.parquet"))

    out = REGISTRY["decontaminate_semantic"].fn(spark, str(d)).collect()
    flagged = {r["vec_id"]: r for r in out}
    assert 11 in flagged, out
    assert flagged[11]["near_eval_id"] == 10
    assert flagged[11]["max_cos"] >= 0.999
    for r in out:
        assert r["vec_id"] % EVAL_MOD != 0          # only train rows flag
        assert r["near_eval_id"] % EVAL_MOD == 0    # against eval items
        assert r["n_eval_hits"] >= 1 and r["max_cos"] <= 1.0

    # blocking can only NARROW the brute-force answer, never invent hits
    M = np.array([vec(i) for i in range(n)], dtype=np.float64)
    nrm = np.linalg.norm(M, axis=1)
    ids = np.arange(n)
    brute = set()
    for t in ids[ids % EVAL_MOD != 0]:
        for e in ids[ids % EVAL_MOD == 0]:
            if nrm[t] and nrm[e]:
                cos = float(M[t] @ M[e] / (nrm[t] * nrm[e]))
                if cos >= SEM_DECON_THRESHOLD:
                    brute.add((int(t), int(e)))
    assert set(flagged) <= {t for t, _ in brute}
    for v, r in flagged.items():
        assert (v, r["near_eval_id"]) in brute


def test_dsir_select_matches_exact_formula_and_discriminates(spark, tmp_path):
    """dsir_select on a planted two-vocabulary corpus: every returned
    row (membership, n_feat, score, weight) must equal the pure-Python
    evaluation of the declared integer contract, every target-like
    candidate must strictly outscore every off-vocabulary candidate,
    and off-vocabulary scores must sit below parity (SCALE)."""
    import re

    from spark_graft.operators.pipeline import (
        DSIR_CAP,
        DSIR_DIM,
        DSIR_PIVOT,
        DSIR_SCALE,
        DSIR_TARGET_SOURCES,
    )
    from spark_graft.registry import REGISTRY

    d = tmp_path / "dsir"
    d.mkdir()
    vocab_a = ["alpha", "beta", "gamma", "delta", "epsilon"]
    vocab_b = ["zulu", "yankee", "xray", "whiskey", "victor"]
    rows, like, unlike = [], [], []
    i = 0
    for _ in range(30):  # target exemplars: vocabulary A
        rows.append(
            (i, " ".join(vocab_a[(i + j) % 5] for j in range(12)), "en",
             DSIR_TARGET_SOURCES[0])
        )
        i += 1
    for _ in range(20):  # target-like candidates
        rows.append(
            (i, " ".join(vocab_a[(i + j) % 5] for j in range(12)), "en", "raw")
        )
        like.append(i)
        i += 1
    for _ in range(20):  # off-vocabulary candidates
        rows.append(
            (i, " ".join(vocab_b[(i + j) % 5] for j in range(12)), "en", "raw")
        )
        unlike.append(i)
        i += 1
    _write_docs(spark, rows, d)

    # pure-Python evaluation of the declared integer contract
    def toks(t):
        return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]

    feats, is_t = {}, {}
    for doc_id, text, _, src in rows:
        ts = toks(text)
        grams = ts + [f"{a} {b}" for a, b in zip(ts, ts[1:])]
        cnt = {}
        for g in grams:
            k = _md5_raw_py("dsirf:", g) % DSIR_DIM
            cnt[k] = cnt.get(k, 0) + 1
        feats[doc_id] = cnt
        is_t[doc_id] = src in DSIR_TARGET_SOURCES
    t_b, r_b = [0] * DSIR_DIM, [0] * DSIR_DIM
    for doc_id, cnt in feats.items():
        acc = t_b if is_t[doc_id] else r_b
        for k, c in cnt.items():
            acc[k] += c
    T, R = sum(t_b), sum(r_b)
    w = [
        min(
            ((t_b[k] + 1) * (R + DSIR_DIM) * DSIR_SCALE)
            // ((r_b[k] + 1) * (T + DSIR_DIM)),
            DSIR_CAP * DSIR_SCALE,
        )
        for k in range(DSIR_DIM)
    ]
    expected, scores = {}, {}
    for doc_id, cnt in feats.items():
        if is_t[doc_id]:
            continue
        n_feat = sum(cnt.values())
        score = sum(c * w[k] for k, c in cnt.items()) // n_feat
        scores[doc_id] = score
        thresh = (
            min(score, DSIR_PIVOT * DSIR_SCALE) * 4294967296
            // (DSIR_PIVOT * DSIR_SCALE)
        )
        if _md5_raw_py("dsir:", doc_id) < thresh:
            expected[doc_id] = (n_feat, score, thresh)

    got = {
        r["doc_id"]: r
        for r in REGISTRY["dsir_select"].fn(spark, str(d)).collect()
    }
    assert set(got) == set(expected)
    for doc_id, (n_feat, score, thresh) in expected.items():
        assert got[doc_id]["n_feat"] == n_feat
        assert got[doc_id]["score"] == score
        assert abs(got[doc_id]["weight"] - 4294967296.0 / thresh) < 1e-6
    # discrimination: the two candidate populations must separate
    assert min(scores[i] for i in like) > max(scores[i] for i in unlike)
    assert max(scores[i] for i in unlike) < DSIR_SCALE


def test_dedup_paragraph_newline_boundary_mode(spark, tmp_path):
    """dedup_paragraph(boundary="newline") on a planted multi-paragraph
    corpus (real blank-line marks) == a pure-Python evaluation of the
    contract: paragraphs are 2+-newline-separated blocks normalized
    exactly like the window form, single newlines stay INSIDE a
    paragraph, punctuation/case variants of a block fingerprint
    identically, whitespace-only blocks vanish, and keep-first +
    reassembly behave as in window mode. Window mode on the same
    corpus must differ (the fixture's paragraphs are not 8-token
    aligned), proving the boundary parameter changes only the
    boundary."""
    import re

    from spark_graft.operators.dedup import PARA_RATE_SCALE
    from spark_graft.registry import REGISTRY

    boiler = "All Rights Reserved.\nSee license for details."  # internal \n
    rows = [
        (1, f"first unique prose here\n\n{boiler}\n\nmore unique text", "en", "s"),
        # same boilerplate, different case/punct — must still dedup
        (2, f"second document opening\n\n{boiler.upper()}!!!", "en", "s"),
        # within-doc repeated paragraph + a whitespace-only block
        (3, "repeat me now\n\n   \n\nrepeat me now\n\nfresh tail", "en", "s"),
        # one paragraph only (no blank lines at all)
        (4, "single block\nwith internal newline", "en", "s"),
        (5, "!!! ...", "en", "s"),  # zero-token doc
    ]
    d = tmp_path / "nl"
    d.mkdir()
    _write_docs(spark, rows, d)

    def norm_blocks(text):
        out = []
        for block in re.split(r"\n{2,}", text):
            ts = [t for t in re.split(r"[^a-z0-9]+", block.lower()) if t]
            if ts:
                out.append(" ".join(ts))
        return out

    paras = {doc_id: norm_blocks(text) for doc_id, text, _, _ in rows}
    first = {}
    for doc_id in sorted(paras):
        for pos, p in enumerate(paras[doc_id], start=1):
            first.setdefault(p, (doc_id, pos))
    expected = {}
    for doc_id, ps in paras.items():
        kept = [
            p for pos, p in enumerate(ps, start=1) if first[p] == (doc_id, pos)
        ]
        n, r = len(ps), len(ps) - len(kept)
        expected[doc_id] = (
            n, r, (r * PARA_RATE_SCALE // n) if n else 0, " ".join(kept)
        )

    got = {
        row["doc_id"]: (
            row["n_paras"], row["n_removed"], row["removed_fx"], row["kept_text"]
        )
        for row in REGISTRY["dedup_paragraph"]
        .fn(spark, str(d), boundary="newline")
        .collect()
    }
    assert got == expected
    # planted semantics, asserted loudly
    assert got[1][0] == 3 and got[1][1] == 0          # all 3 paras original
    assert got[2] == (2, 1, PARA_RATE_SCALE // 2,
                      "second document opening")       # boilerplate deduped
    assert got[3] == (3, 1, PARA_RATE_SCALE // 3,
                      "repeat me now fresh tail")      # within-doc repeat
    assert got[4][0] == 1                              # single \n: ONE para
    assert got[5] == (0, 0, 0, "")

    # the boundary parameter changes ONLY the boundary: window mode on
    # the same corpus draws different paragraphs for the multi-block doc
    win = {
        row["doc_id"]: row["n_paras"]
        for row in REGISTRY["dedup_paragraph"].fn(spark, str(d)).collect()
    }
    assert win[1] != got[1][0]


def test_null_text_hardening_dedup_exact_and_text_fingerprint(spark, tmp_path):
    """r17 NULL-hardening (2 of the 8 FIXTURES.md-flagged queries):
    on an out-of-fixture-contract corpus carrying a NULL text row,
    dedup_exact and text_fingerprint must hash-match their oracles —
    NULL text normalizes to '' before hashing, so NULL-text and
    empty-text docs share one content fingerprint group instead of
    Spark minting a separate md5(NULL) = NULL class."""
    import duckdb

    from compare import assert_frames_match
    from spark_graft.registry import REGISTRY

    d = tmp_path / "nullsafe"
    d.mkdir()
    spark.createDataFrame(
        [
            (1, None, "en", "s", 0),
            (2, "", "en", "s", 0),
            (3, "!!! ...", "en", "s", 7),       # tokenizes empty too
            (4, "real words here", "en", "s", 15),
            (5, "real words here", "en", "s", 15),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'"
    )
    for name in ("dedup_exact", "text_fingerprint"):
        sp = REGISTRY[name].fn(spark, str(d)).toPandas()
        assert_frames_match(sp, con.execute(REGISTRY[name].oracle).df(), name)
    # the NULL/empty/punct-only docs form ONE exact-dup group (keep 1)
    groups = {
        (r["keep_doc_id"], r["n_copies"])
        for r in REGISTRY["dedup_exact"].fn(spark, str(d)).collect()
    }
    assert groups == {(1, 3), (4, 2)}


def test_dedup_paragraph_both_modes_random_corpus_vs_python(spark, tmp_path):
    """Seeded randomized cross-check of BOTH boundary modes against a
    pure-Python evaluation of the full contract: 80 docs of random
    tokens from a small vocabulary (so cross-doc and within-doc window
    repeats occur organically), random single/double newlines, random
    punctuation, a few empty and whitespace-only docs. Catches
    boundary-drawing bugs the handcrafted fixtures don't reach
    (deterministic seed — no flakes)."""
    import random
    import re

    from spark_graft.operators.dedup import PARA_RATE_SCALE, PARA_W
    from spark_graft.registry import REGISTRY

    rng = random.Random(170817)
    vocab = ["ad", "be", "cat", "dog", "eel", "fox", "gnu", "hen"]
    seps = [" ", " ", " ", "\n", "\n\n", ", ", "! ", "\n\n\n"]
    rows = []
    for i in range(80):
        if i % 23 == 0:
            rows.append((i, "", "en", "s"))
            continue
        if i % 29 == 0:
            rows.append((i, " \n\n  \n ", "en", "s"))
            continue
        n = rng.randint(1, 40)
        parts = []
        for j in range(n):
            parts.append(rng.choice(vocab))
            parts.append(rng.choice(seps))
        rows.append((i, "".join(parts), "en", "s"))
    d = tmp_path / "randpara"
    d.mkdir()
    _write_docs(spark, rows, d)

    def eval_contract(paras_by_doc):
        first = {}
        for doc_id in sorted(paras_by_doc):
            for pos, p in enumerate(paras_by_doc[doc_id], start=1):
                first.setdefault(p, (doc_id, pos))
        out = {}
        for doc_id, ps in paras_by_doc.items():
            kept = [
                p for pos, p in enumerate(ps, start=1)
                if first[p] == (doc_id, pos)
            ]
            n, r = len(ps), len(ps) - len(kept)
            out[doc_id] = (
                n, r, (r * PARA_RATE_SCALE // n) if n else 0, " ".join(kept)
            )
        return out

    def toks(t):
        return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]

    win = {
        i: [" ".join(toks(t)[k:k + PARA_W]) for k in range(0, len(toks(t)), PARA_W)]
        for i, t, _, _ in rows
    }
    nl = {}
    for i, t, _, _ in rows:
        ps = []
        for block in re.split(r"\n{2,}", t):
            bt = toks(block)
            if bt:
                ps.append(" ".join(bt))
        nl[i] = ps

    for boundary, expected in (("window", eval_contract(win)), ("newline", eval_contract(nl))):
        got = {
            r["doc_id"]: (
                r["n_paras"], r["n_removed"], r["removed_fx"], r["kept_text"]
            )
            for r in REGISTRY["dedup_paragraph"]
            .fn(spark, str(d), boundary=boundary)
            .collect()
        }
        assert got == expected, boundary
    # the random corpus must actually exercise dedup in both modes
    assert any(v[1] > 0 for v in eval_contract(win).values())
    assert any(v[1] > 0 for v in eval_contract(nl).values())


def test_null_text_hardening_curriculum_and_pandas_tokens(spark, tmp_path):
    """r18 NULL-hardening (2 more of the FIXTURES.md-flagged queries;
    4 remain): on an out-of-fixture-contract corpus carrying a NULL
    text row, pipeline_curriculum and udf_pandas_tokens must hash-match
    their oracles. pipeline_curriculum counts NULL text as ZERO tokens
    on both engines — the unhardened form both DROPPED the NULL row
    from the stage equi-join and shifted every stage boundary
    differently (Spark cumulative windows order NULLS FIRST, DuckDB
    NULLS LAST); udf_pandas_tokens's pandas UDF goes through nullable
    Int32 so NULL-in emits an Arrow null (the oracle's len(NULL)
    semantics) instead of raising IntCastingNaNError mid-batch."""
    import duckdb

    from compare import assert_frames_match
    from spark_graft.registry import REGISTRY

    d = tmp_path / "nullsafe18"
    d.mkdir()
    spark.createDataFrame(
        [
            (1, None, "en", "s", 0),
            (2, "", "en", "s", 0),
            (3, "!!! ...", "en", "s", 7),       # tokenizes empty too
            (4, "one two", "en", "s", 7),
            (5, "one two three four five six", "en", "s", 27),
            (6, "a b c d e f g h i j k l", "en", "s", 23),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'"
    )
    for name in ("pipeline_curriculum", "udf_pandas_tokens"):
        sp = REGISTRY[name].fn(spark, str(d)).toPandas()
        assert_frames_match(sp, con.execute(REGISTRY[name].oracle).df(), name)
    # NULL text shares the ZERO-length bucket with the empty/punct-only
    # docs (lengths 0,0,0,2,6,12: cum(0)=3 of 6 -> stage ceil(4*3/6)=2,
    # same for all three) and the NULL row must APPEAR in the output,
    # not drop from the join
    stages = {
        r["doc_id"]: (r["n_tokens"], r["stage"])
        for r in REGISTRY["pipeline_curriculum"].fn(spark, str(d)).collect()
    }
    assert set(stages) == {1, 2, 3, 4, 5, 6}
    assert stages[1] == (0, 2) and stages[1] == stages[2] == stages[3]
    # and the pandas tokenizer is NULL-in/NULL-out like its SQL twin
    toks = {
        r["doc_id"]: r["n_tokens"]
        for r in REGISTRY["udf_pandas_tokens"].fn(spark, str(d)).collect()
    }
    assert toks[1] is None and toks[2] == 0 and toks[5] == 6


def test_dedup_paragraph_newline_fixture_differential(spark, tmp_path):
    """VERDICT r17 item 3: oracle-check `dedup_paragraph(
    boundary="newline")` on REAL blank-line boundaries — the generated
    fixture's `text_nl` column (scripts/gen_testdata.py, r18: blocks of
    4-11 tokens separated by blank lines, with cross-doc boilerplate
    paragraphs planted in ~45% of docs) — against the newline-mode
    DuckDB oracle (`paragraph_newline_oracle`), the same strict
    rows+schema+hash comparator the driver gate uses. Previously the
    newline arm was exercised only on planted pytest corpora; this runs
    it over a full 500-doc corpus shaped like a crawl."""
    import os
    import sys

    import duckdb

    from compare import assert_frames_match
    from spark_graft.operators.dedup import paragraph_newline_oracle
    from spark_graft.registry import REGISTRY

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from gen_testdata import gen

    fix = tmp_path / "fixture"
    gen(0.001, str(fix))
    # a documents table whose `text` IS the newline-marked column, so
    # the operator (which reads documents.text) sees real boundaries
    nl_dir = tmp_path / "nl_docs"
    nl_dir.mkdir()
    con = duckdb.connect()
    con.execute(
        f"""COPY (SELECT doc_id, text_nl AS text, lang, source, n_chars
                  FROM '{fix}/documents.parquet')
            TO '{nl_dir}/documents.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{nl_dir}/documents.parquet'"
    )
    sp = (
        REGISTRY["dedup_paragraph"]
        .fn(spark, str(nl_dir), boundary="newline")
        .toPandas()
    )
    ora = con.execute(paragraph_newline_oracle()).df()
    assert_frames_match(sp, ora, "dedup_paragraph_newline")
    # the fixture must actually exercise the dedup: planted boilerplate
    # repeats across docs, so removals happen and most docs multi-block
    assert sp["n_removed"].sum() > 50
    assert (sp["n_paras"] > 1).sum() > 400
    # cross-DOC dups exist: some doc lost a paragraph it never repeats
    # internally (its own paras are distinct yet something was removed)
    import re

    texts = con.execute(
        "SELECT doc_id, text FROM documents ORDER BY doc_id"
    ).fetchall()
    removed = {r.doc_id: r.n_removed for r in sp.itertuples()}

    def paras(t):
        out = []
        for b in re.split(r"\n{2,}", t or ""):
            toks = [w for w in re.split(r"[^a-z0-9]+", b.lower()) if w]
            if toks:
                out.append(" ".join(toks))
        return out

    assert any(
        removed[i] > 0 and len(set(paras(t))) == len(paras(t))
        for i, t in texts
    )


def test_preference_rating_differential_vs_oracle(spark, sf_dir):
    """r18 (VERDICT r17 item 5, pytest-only until declared):
    `preference_rating` — Bradley-Terry ratings over the corpus's noisy
    KxK preference-judgment stream — must hash-match its unrolled-CTE
    DuckDB oracle on the fixture, through the driver gate's strict
    comparator. Also pins that the judgment graph is non-degenerate
    (every item holds K games, ratings spread beyond won/lost)."""
    import duckdb

    from compare import assert_frames_match
    from spark_graft.operators.curriculum import (
        PREF_PAIRS_PER_SOURCE,
        preference_rating,
        preference_rating_oracle,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    ora = con.execute(preference_rating_oracle()).df()
    sp = preference_rating(spark, sf_dir).toPandas()
    assert_frames_match(sp, ora, "preference_rating")
    assert (sp["n_games"] == PREF_PAIRS_PER_SOURCE).all()
    assert sp["rating_fx"].nunique() > 2 * sp["n_wins"].nunique()


def test_preference_rating_planted_vs_python_reference(spark):
    """The full integer minorization contract, re-evaluated in pure
    Python (arbitrary-precision ints == the oracle's HUGEINT) on a
    planted judgment graph with noise and an all-loser: Spark must
    reproduce it BIT-exactly, the fit must order A > B > C despite the
    contradictory minority judgments (transitive aggregation — the
    point of the operator), and the never-winning item must floor at
    the bottom."""
    from spark_graft.operators.curriculum import (
        BT_ROUNDS,
        BT_SCALE,
        preference_rating_frame,
    )

    judgments = (
        [(1, 2)] * 9 + [(2, 1)] * 1       # A beats B 9:1
        + [(2, 3)] * 9 + [(3, 2)] * 1     # B beats C 9:1
        + [(1, 3)] * 9 + [(3, 1)] * 1     # A beats C 9:1
        + [(1, 4)] * 5 + [(2, 4)] * 5     # D never wins
    )

    def bt_ref(js, rounds=BT_ROUNDS, S=BT_SCALE):
        from collections import Counter

        d = Counter((c, r) for c, r in js if c != r)
        keys = {k for k in d} | {(j, i) for i, j in d}
        g = {k: d.get(k, 0) for k in keys}
        n = {(i, j): g[(i, j)] + g[(j, i)] for (i, j) in keys}
        items = sorted({i for i, _ in keys})
        wins = {i: sum(w for (a, _), w in g.items() if a == i) for i in items}
        games = {i: sum(n[k] for k in keys if k[0] == i) for i in items}
        p = {i: S for i in items}
        for _ in range(rounds):
            den = {
                i: sum(
                    (n[(a, j)] * S * S) // (p[a] + p[j])
                    for (a, j) in keys
                    if a == i
                )
                for i in items
            }
            u = {i: max((wins[i] * S * S) // den[i], 1) for i in items}
            tot, m = sum(u.values()), len(items)
            p = {i: (u[i] * m * S) // tot for i in items}
        return {i: (wins[i], games[i], p[i]) for i in items}

    expect = bt_ref(judgments)
    pairs = spark.createDataFrame(
        judgments, "chosen_id bigint, rejected_id bigint"
    )
    got = {
        r["doc_id"]: (r["n_wins"], r["n_games"], r["rating_fx"])
        for r in preference_rating_frame(pairs).collect()
    }
    assert got == expect
    ratings = {i: got[i][2] for i in got}
    assert ratings[1] > ratings[2] > ratings[3] > ratings[4]
    # the rating uses ALL judgments, not just the sign: the minority
    # (flipped) judgments keep every rating strictly inside (0, max)
    assert ratings[3] > ratings[4] >= 0


def test_preference_rating_empty_and_self_judgments(spark):
    """Degenerate inputs: an empty judgment stream (or one made
    entirely of self-judgments, which the frame filters) yields an
    EMPTY rating table with the output schema intact — not a SQL
    error from interpolating a NULL renormalization total."""
    from spark_graft.operators.curriculum import preference_rating_frame

    empty = spark.createDataFrame([], "chosen_id bigint, rejected_id bigint")
    selfj = spark.createDataFrame(
        [(7, 7), (8, 8)], "chosen_id bigint, rejected_id bigint"
    )
    for pairs in (empty, selfj):
        out = preference_rating_frame(pairs)
        assert out.columns == ["doc_id", "n_wins", "n_games", "rating_fx"]
        assert out.count() == 0


def test_preference_rating_random_graphs_vs_python_reference(spark):
    """Seeded randomized cross-check of the full Bradley-Terry integer
    contract (the dedup_paragraph randomized-cross-check discipline):
    three random judgment graphs — including DISCONNECTED components,
    repeated pairs, mutual (contradictory) judgments, and heavy skew —
    must match the pure-Python arbitrary-precision replay BIT-exactly.
    Randomized shapes catch floor/renormalization edge interactions a
    single planted graph cannot."""
    import random

    from spark_graft.operators.curriculum import (
        BT_ROUNDS,
        BT_SCALE,
        preference_rating_frame,
    )

    def bt_ref(js, rounds=BT_ROUNDS, S=BT_SCALE):
        from collections import Counter

        d = Counter((c, r) for c, r in js if c != r)
        keys = {k for k in d} | {(j, i) for i, j in d}
        g = {k: d.get(k, 0) for k in keys}
        n = {(i, j): g[(i, j)] + g[(j, i)] for (i, j) in keys}
        items = sorted({i for i, _ in keys})
        wins = {i: sum(w for (a, _), w in g.items() if a == i) for i in items}
        games = {i: sum(n[k] for k in keys if k[0] == i) for i in items}
        p = {i: S for i in items}
        for _ in range(rounds):
            den = {
                i: sum(
                    (n[(a, j)] * S * S) // (p[a] + p[j])
                    for (a, j) in keys
                    if a == i
                )
                for i in items
            }
            u = {i: max((wins[i] * S * S) // den[i], 1) for i in items}
            tot, m = sum(u.values()), len(items)
            p = {i: (u[i] * m * S) // tot for i in items}
        return {i: (wins[i], games[i], p[i]) for i in items}

    for seed in (7, 18, 2026):
        rng = random.Random(seed)
        judgments = []
        # two disconnected communities (1..12 and 100..106) plus a
        # dominant item that wins nearly everything it plays
        for _ in range(250):
            a, b = rng.sample(range(1, 13), 2)
            judgments.append((a, b) if rng.random() < 0.7 else (b, a))
        for _ in range(60):
            a, b = rng.sample(range(100, 107), 2)
            judgments.append((a, b))
        judgments += [(1, rng.randrange(2, 13)) for _ in range(40)]
        got = {
            r["doc_id"]: (r["n_wins"], r["n_games"], r["rating_fx"])
            for r in preference_rating_frame(
                spark.createDataFrame(
                    judgments, "chosen_id bigint, rejected_id bigint"
                )
            ).collect()
        }
        assert got == bt_ref(judgments), seed
