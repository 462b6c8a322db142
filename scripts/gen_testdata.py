#!/usr/bin/env python
"""Deterministic synthetic testdata generator (TESTDATA.md-compatible).

Produces the same 10-table star schema as the driver-provided parquet at
`/root/testdata/sf*` — `region nation customer supplier part orders
lineitem events documents embeddings` — with identical column names and
physical types, at any scale factor, from a fixed seed.

The repo's correctness gate is DIFFERENTIAL (Spark vs DuckDB over the
same files), so the suite is valid on ANY schema-compatible data; this
generator exists so CI — and anyone cloning the repo without the driver
environment — can materialize a dataset and run the full test suite:

    python scripts/gen_testdata.py --sf 0.001 --out /tmp/testdata/sf0.001
    SPARK_GRAFT_TEST_SF=/tmp/testdata/sf0.001 python -m pytest tests/ -q

Content mirrors the driver data's shapes (value domains, near-dup
documents for the dedup/graph queries, funnel-ordered events, JSON
props) without claiming to reproduce its exact rows: seeds differ, the
contract is schemas + distributions.

No Spark dependency — plain pyarrow writes, fast enough for CI.
"""

from __future__ import annotations

import argparse
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

# sf0.001 row counts (FIXTURES.md); relational/event tables scale
# linearly with sf
BASE = {
    "customer": 150,
    "supplier": 10,
    "part": 200,
    "orders": 1500,
    "lineitem": 6000,
    "events": 1000,
}

# documents/embeddings follow the DRIVER's sublinear curve, measured
# from /root/testdata (rows at sf0.001/0.01/0.1 = 500/500/5000 docs,
# 500/500/2000 embeddings): a per-sf slope with a 500-row floor. The
# driver caps these tables because several declared queries do
# super-constant per-row work on them (dedup_clusters is iterative
# over the near-dup pair graph; the pairwise dedup family emits pair
# rows — linear since the r8 trained-quantizer rewrite of
# dedup_embedding, but still the heavy end of the suite) — scaling
# them 1000x linearly at sf1 would benchmark a different workload
# shape than the driver's, not a 10x-the-data version of the same one.
SUBLINEAR = {
    "documents": (50_000, 500),  # (slope per sf, floor)
    "embeddings": (20_000, 500),
}

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
NATIONS = [
    "ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT", "ETHIOPIA",
    "FRANCE", "GERMANY", "INDIA", "INDONESIA", "IRAN", "IRAQ", "JAPAN",
    "JORDAN", "KENYA", "MOROCCO", "MOZAMBIQUE", "PERU", "CHINA",
    "ROMANIA", "SAUDI ARABIA", "VIETNAM", "RUSSIA", "UNITED KINGDOM",
    "UNITED STATES",
]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["F", "O", "P"]
RETURNFLAGS = ["A", "N", "R"]
LINESTATUSES = ["F", "O"]
PART_ADJ = ["cold", "small", "large", "hot", "light", "dark", "fast", "slow"]
PART_NOUN = ["widget", "bolt", "gear", "spring", "valve", "wheel"]
PART_TYPE = ["ECONOMY", "PROMO", "STANDARD", "SMALL", "MEDIUM", "LARGE"]
EVENT_TYPES = ["signup", "view", "click", "purchase", "error"]
DOC_WORDS = (
    "the a spark data row table scan filter join group sort merge window "
    "hash key value query stream batch column vector customer line order "
    "part fast slow small big agg"
).split()
LANGS = ["en", "en", "en", "en", "es", "zh", "de", "fr"]  # en-weighted

EPOCH_2024 = 1704067200_000_000  # 2024-01-01 UTC in microseconds
MONTH_US = 30 * 24 * 3600 * 1_000_000
EMB_DIM = 64
N_LABELS = 8


def _ts_us(rng: random.Random, span_days: int = 30) -> int:
    return EPOCH_2024 + rng.randrange(span_days * 24 * 3600 * 1_000_000)


# TPC-H-style date window used by orders/lineitem in the DRIVER data:
# day-aligned (midnight) timestamps, independent uniform draws over
# 1995-01-01 + [lo, hi) days — o_orderdate spans 1995-01-01..2001-08-01
# and l_shipdate 1995-01-02..2001-11-04. Mirroring the domain matters:
# agg_q1 filters `l_shipdate <= 1998-09-02`, which selects ~55% of the
# driver's rows but ZERO rows of a 2024-dated corpus, silently turning
# the CI oracle check for any date-predicated query into an
# empty-vs-empty comparison.
EPOCH_1995 = 788918400_000_000  # 1995-01-01 UTC in microseconds
_US_PER_DAY = 24 * 3600 * 1_000_000


def _day_ts_us(rng: random.Random, lo_day: int, hi_day: int) -> int:
    return EPOCH_1995 + rng.randrange(lo_day, hi_day) * _US_PER_DAY


def row_counts(sf: float) -> dict[str, int]:
    """Per-table row counts at `sf`, matching the driver's testdata
    (tests/test_units.py pins this against /root/testdata when present)."""
    scale = sf / 0.001
    n = {t: max(1, int(c * scale)) for t, c in BASE.items()}
    n.update({t: max(floor, int(slope * sf)) for t, (slope, floor) in SUBLINEAR.items()})
    n.update({"region": 5, "nation": 25})
    return n




def word_sampler(mode: str, n_docs: int):
    """Per-word sampler for document texts.

    'bounded' (default): the fixed 31-word DOC_WORDS list — mirrors the
    driver corpus, where every prefix-shingle bucket grows linearly with
    the corpus (the measured superlinear candidate growth of
    dedup_ngram_jaccard is a property of THIS vocabulary shape).

    'zipf': an OPEN vocabulary scaling with the corpus (V = max(2000,
    2 * n_docs) distinct words) under a Zipf s~1 rank law via inverse
    CDF (rank = floor(V^u), u~U[0,1): P(rank <= r) = ln r / ln V, so
    P(rank = r) ~ 1/r) — the realistic regime for natural-language
    corpora, where rare shingles stay rare as the corpus grows
    (VERDICT r7 item 4; see scripts/characterize_ngram_vocab.py)."""
    if mode == "bounded":
        return lambda rng: rng.choice(DOC_WORDS)
    if mode == "zipf":
        v = max(2000, 2 * n_docs)
        return lambda rng: f"w{min(v - 1, int(v ** rng.random()))}"
    raise ValueError(f"unknown doc vocab mode: {mode}")


def doc_texts(rng: random.Random, n_docs: int, word=None) -> list[str]:
    """Word-salad texts with a planted near-dup tail (every 11th doc
    perturbs an earlier one) so the dedup/graph queries have real pairs
    to find; occasional empty text exercises the guards. Every ~101 docs
    a FAMILY of three perturbs the SAME base — pairs alone leave the
    near-dup graph triangle-free, which made graph_triangles vacuous
    (0 rows vs the driver's 7 at sf0.001)."""
    if word is None:
        word = word_sampler("bounded", n_docs)
    texts: list[str] = []
    for i in range(n_docs):
        fam = i % 101 - 50  # 0,1,2 -> member of a 3-doc family
        if i % 37 == 13:
            texts.append("")
        elif 0 <= fam <= 2 and i - fam - 30 >= 0:
            base_words = texts[i - fam - 30].split()
            if len(base_words) > 10:
                base_words[rng.randrange(len(base_words))] = word(rng)
                texts.append(" ".join(base_words))
            else:
                texts.append(" ".join(word(rng) for _ in range(30)))
        elif i % 11 == 10 and i > 20:
            base_words = texts[i - 7].split()
            if len(base_words) > 4:
                base_words[rng.randrange(len(base_words))] = word(rng)
                texts.append(" ".join(base_words))
            else:
                texts.append(" ".join(word(rng) for _ in range(30)))
        else:
            texts.append(
                " ".join(word(rng) for _ in range(rng.randrange(15, 60)))
            )
    return texts


# text_nl boilerplate pool: canned paragraphs that repeat ACROSS
# documents — the nav-chrome/cookie-banner/license-block shape whose
# cross-page repetition is exactly what newline-mode paragraph dedup
# (CCNet granularity) exists to remove. Lowercase alnum so they
# normalize to themselves under the shared tokenizer.
NL_BOILERPLATE = [
    "accept all cookies to continue reading this site",
    "copyright 2024 example corp all rights reserved worldwide",
    "subscribe to our newsletter for weekly data updates",
    "home products pricing docs blog about contact us",
    "this page was generated automatically do not edit",
    "share this article on your favorite social network",
]


def doc_texts_nl(texts: list[str], rng: random.Random) -> list[str]:
    """Newline-marked variants of the document texts (VERDICT r17
    item 3): the same word stream regrouped into blank-line-separated
    paragraph BLOCKS (4-11 tokens each), with boilerplate paragraphs
    from the shared NL_BOILERPLATE pool planted across ~45% of docs
    (prepended and/or appended) and an occasional within-doc repeat of
    the doc's own first block — so `dedup_paragraph(boundary="newline")`
    has REAL cross-doc and within-doc duplicate paragraphs to find on
    fixture data, not only on planted pytest corpora.

    Driven by its OWN rng stream (callers pass a fresh Random seeded
    independently of the main generator) so adding this column does not
    shift a single draw of the pre-existing columns — regenerated
    fixtures keep every other column's values bit-identical."""
    out = []
    for i, t in enumerate(texts):
        words = t.split()
        blocks: list[str] = []
        if rng.random() < 0.35:
            blocks.append(rng.choice(NL_BOILERPLATE))
        j = 0
        while j < len(words):
            k = rng.randrange(4, 12)
            blocks.append(" ".join(words[j : j + k]))
            j += k
        if words and rng.random() < 0.05:
            blocks.append(blocks[1] if len(blocks) > 1 else blocks[0])
        if rng.random() < 0.2:
            blocks.append(rng.choice(NL_BOILERPLATE))
        out.append("\n\n".join(blocks))
    return out


def gen(sf: float, out: str, seed: int = 42, doc_vocab: str = "bounded") -> None:
    rng = random.Random(seed)
    n = row_counts(sf)
    os.makedirs(out, exist_ok=True)

    def write(name: str, cols: dict, schema: pa.Schema) -> None:
        pq.write_table(
            pa.table(cols, schema=schema), os.path.join(out, f"{name}.parquet")
        )
        print(f"{name}: {len(next(iter(cols.values())))} rows")

    write(
        "region",
        {"r_regionkey": list(range(5)), "r_name": REGIONS},
        pa.schema([("r_regionkey", pa.int32()), ("r_name", pa.string())]),
    )
    write(
        "nation",
        {
            "n_nationkey": list(range(25)),
            "n_name": NATIONS,
            "n_regionkey": [i % 5 for i in range(25)],
        },
        pa.schema(
            [
                ("n_nationkey", pa.int32()),
                ("n_name", pa.string()),
                ("n_regionkey", pa.int32()),
            ]
        ),
    )
    write(
        "customer",
        {
            "c_custkey": list(range(n["customer"])),
            "c_name": [f"Customer#{i:09d}" for i in range(n["customer"])],
            "c_nationkey": [rng.randrange(25) for _ in range(n["customer"])],
            "c_acctbal": [round(rng.uniform(-999, 9999), 2) for _ in range(n["customer"])],
            "c_mktsegment": [rng.choice(SEGMENTS) for _ in range(n["customer"])],
        },
        pa.schema(
            [
                ("c_custkey", pa.int64()),
                ("c_name", pa.string()),
                ("c_nationkey", pa.int32()),
                ("c_acctbal", pa.float64()),
                ("c_mktsegment", pa.string()),
            ]
        ),
    )
    write(
        "supplier",
        {
            "s_suppkey": list(range(n["supplier"])),
            "s_name": [f"Supplier#{i:09d}" for i in range(n["supplier"])],
            "s_nationkey": [rng.randrange(25) for _ in range(n["supplier"])],
            "s_acctbal": [round(rng.uniform(-999, 9999), 2) for _ in range(n["supplier"])],
        },
        pa.schema(
            [
                ("s_suppkey", pa.int64()),
                ("s_name", pa.string()),
                ("s_nationkey", pa.int32()),
                ("s_acctbal", pa.float64()),
            ]
        ),
    )
    write(
        "part",
        {
            "p_partkey": list(range(n["part"])),
            "p_name": [
                f"{rng.choice(PART_ADJ)} {rng.choice(PART_NOUN)}"
                for _ in range(n["part"])
            ],
            "p_brand": [f"Brand#{rng.randrange(1, 26)}" for _ in range(n["part"])],
            "p_type": [rng.choice(PART_TYPE) for _ in range(n["part"])],
            "p_size": [rng.randrange(1, 51) for _ in range(n["part"])],
            "p_retailprice": [round(rng.uniform(900, 2100), 2) for _ in range(n["part"])],
        },
        pa.schema(
            [
                ("p_partkey", pa.int64()),
                ("p_name", pa.string()),
                ("p_brand", pa.string()),
                ("p_type", pa.string()),
                ("p_size", pa.int32()),
                ("p_retailprice", pa.float64()),
            ]
        ),
    )
    write(
        "orders",
        {
            "o_orderkey": list(range(n["orders"])),
            "o_custkey": [rng.randrange(n["customer"]) for _ in range(n["orders"])],
            "o_orderstatus": [rng.choice(STATUSES) for _ in range(n["orders"])],
            "o_totalprice": [round(rng.uniform(900, 350000), 2) for _ in range(n["orders"])],
            "o_orderdate": [_day_ts_us(rng, 0, 2405) for _ in range(n["orders"])],
            "o_orderpriority": [rng.choice(PRIORITIES) for _ in range(n["orders"])],
        },
        pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_custkey", pa.int64()),
                ("o_orderstatus", pa.string()),
                ("o_totalprice", pa.float64()),
                ("o_orderdate", pa.timestamp("us")),
                ("o_orderpriority", pa.string()),
            ]
        ),
    )
    write(
        "lineitem",
        {
            "l_orderkey": [rng.randrange(n["orders"]) for _ in range(n["lineitem"])],
            "l_partkey": [rng.randrange(n["part"]) for _ in range(n["lineitem"])],
            "l_suppkey": [rng.randrange(n["supplier"]) for _ in range(n["lineitem"])],
            "l_linenumber": [rng.randrange(1, 8) for _ in range(n["lineitem"])],
            "l_quantity": [float(rng.randrange(1, 51)) for _ in range(n["lineitem"])],
            "l_extendedprice": [round(rng.uniform(900, 100000), 2) for _ in range(n["lineitem"])],
            "l_discount": [round(rng.uniform(0, 0.1), 2) for _ in range(n["lineitem"])],
            "l_tax": [round(rng.uniform(0, 0.08), 2) for _ in range(n["lineitem"])],
            "l_returnflag": [rng.choice(RETURNFLAGS) for _ in range(n["lineitem"])],
            "l_linestatus": [rng.choice(LINESTATUSES) for _ in range(n["lineitem"])],
            "l_shipdate": [_day_ts_us(rng, 1, 2500) for _ in range(n["lineitem"])],
        },
        pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("l_partkey", pa.int64()),
                ("l_suppkey", pa.int64()),
                ("l_linenumber", pa.int32()),
                ("l_quantity", pa.float64()),
                ("l_extendedprice", pa.float64()),
                ("l_discount", pa.float64()),
                ("l_tax", pa.float64()),
                ("l_returnflag", pa.string()),
                ("l_linestatus", pa.string()),
                ("l_shipdate", pa.timestamp("us")),
            ]
        ),
    )

    # events: per-user ordered timelines so funnels/sessions/paths exist
    ev_rows = []
    n_users = max(2, n["events"] // 50)
    for eid in range(n["events"]):
        uid = rng.randrange(n_users)
        et = rng.choice(EVENT_TYPES)
        ev_rows.append(
            (
                eid,
                _ts_us(rng, 30),
                uid,
                et,
                round(rng.uniform(0, 200), 2),
                '{"k": %d}' % rng.randrange(100),
            )
        )
    write(
        "events",
        {
            "event_id": [r[0] for r in ev_rows],
            "ts": [r[1] for r in ev_rows],
            "user_id": [r[2] for r in ev_rows],
            "event_type": [r[3] for r in ev_rows],
            "value": [r[4] for r in ev_rows],
            "props": [r[5] for r in ev_rows],
        },
        pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("value", pa.float64()),
                ("props", pa.string()),
            ]
        ),
    )

    # documents: see doc_texts — near-dup tail + families + empties;
    # vocabulary shape selected by doc_vocab (bounded mirrors the driver
    # corpus; zipf is the open-vocabulary realism mode). text_nl rides
    # its own rng stream (doc_texts_nl's determinism note) so the r18
    # column addition left every pre-existing column bit-identical.
    texts = doc_texts(rng, n["documents"], word_sampler(doc_vocab, n["documents"]))
    texts_nl = doc_texts_nl(texts, random.Random(seed * 7919 + 18))
    write(
        "documents",
        {
            "doc_id": list(range(n["documents"])),
            "text": texts,
            "lang": [rng.choice(LANGS) for _ in range(n["documents"])],
            "source": [f"src{rng.randrange(20)}" for _ in range(n["documents"])],
            "n_chars": [rng.randrange(50, 500) for _ in range(n["documents"])],
            "text_nl": texts_nl,
        },
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("text", pa.string()),
                ("lang", pa.string()),
                ("source", pa.string()),
                ("n_chars", pa.int64()),
                ("text_nl", pa.string()),
            ]
        ),
    )

    # embeddings: clustered around N_LABELS anchors so IVF/kmeans have
    # structure; values stay inside (-1, 1) for the fixed-point quantizer
    anchors = [
        [rng.uniform(-0.4, 0.4) for _ in range(EMB_DIM)] for _ in range(N_LABELS)
    ]
    vecs, labels = [], []
    for i in range(n["embeddings"]):
        lab = rng.randrange(N_LABELS)
        labels.append(lab)
        vecs.append(
            [a + rng.uniform(-0.25, 0.25) for a in anchors[lab]]
        )
    write(
        "embeddings",
        {
            "vec_id": list(range(n["embeddings"])),
            "embedding": vecs,
            "label": labels,
        },
        pa.schema(
            [
                ("vec_id", pa.int64()),
                ("embedding", pa.list_(pa.float32())),
                ("label", pa.int32()),
            ]
        ),
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf", type=float, default=0.001)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--doc-vocab", choices=["bounded", "zipf"], default="bounded")
    a = ap.parse_args()
    gen(a.sf, a.out, a.seed, a.doc_vocab)
