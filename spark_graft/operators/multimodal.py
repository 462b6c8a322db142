"""Multimodal columns: opaque binary payloads + typed metadata, with the
decode/feature-extract stage as an Arrow-batched mapInPandas operator.

This container has no image/audio codecs, so the actual byte->pixels
decode is STUBBED (see `decode_payload`) behind a deterministic fake that
derives plausible metadata from the payload bytes. Everything Spark-side
— binary column handling, schema, partitioning, Arrow batch shape, UDF
signature — is real and oracle-tested, so swapping in a real decoder
(PIL/ffmpeg) changes one marked function and nothing else.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_graft.registry import query
from spark_graft.sources import table

DECODE_SCHEMA = "doc_id long, n_bytes int, width int, height int, n_frames int"


@query(
    "multimodal_meta",
    oracle="""
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               md5(text) AS digest,
               CASE octet_length(encode(text)) % 3
                    WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind
        FROM documents
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over an opaque binary column. The payload is the
    utf-8 bytes of `text` standing in for real media bytes; metadata
    (size, digest, modality tag) is computed JVM-side without ever
    decoding — the pattern that lets 100 TB of media flow through
    relational plumbing with metadata-only predicates pushed to parquet."""
    docs = table(spark, sf_dir, "documents").withColumn(
        "payload", F.encode("text", "utf-8")
    )
    nb = F.octet_length("payload")
    return docs.select(
        "doc_id",
        nb.alias("n_bytes"),
        F.md5("payload").alias("digest"),
        F.when(nb % 3 == 0, "image").when(nb % 3 == 1, "audio").otherwise("video").alias("kind"),
    )


def decode_payload(payload: bytes) -> tuple[int, int, int]:
    """STUB — deterministic fake decoder.

    A real implementation would decode image/video bytes (PIL, ffmpeg)
    and return (width, height, n_frames); those libraries are not in
    this container. The fake derives stable pseudo-dimensions from the
    byte length so the full pipeline stays testable end-to-end. Replace
    the body (and delete the fake) to productionize:

        raise NotImplementedError("real codec goes here")
    """
    n = len(payload)
    return (n * 7919) % 640 + 16, (n * 104729) % 480 + 16, n % 30 + 1


@query(
    "multimodal_decode",
    oracle="""
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               (octet_length(encode(text)) * 7919) % 640 + 16 AS width,
               (octet_length(encode(text)) * 104729) % 480 + 16 AS height,
               octet_length(encode(text)) % 30 + 1 AS n_frames
        FROM documents
    """,
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract via mapInPandas: binary payloads arrive as
    Arrow batches, the (stubbed) decoder runs per element, and results
    come back as a typed DataFrame. mapInPandas (not a scalar UDF)
    because real decoders return variable-shape data and may need to
    drop/expand rows (frame sampling). The oracle reproduces the fake
    decoder's arithmetic — proving batch shape, schema, and plumbing."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [decode_payload(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "n_frames": [m[2] for m in meta],
                }
            )

    return docs.mapInPandas(decode_batches, DECODE_SCHEMA)


FRAME_STRIDE = 10


@query(
    "multimodal_frames",
    oracle=f"""
        WITH meta AS (
            SELECT doc_id,
                   octet_length(encode(text)) % 30 + 1 AS n_frames
            FROM documents
            WHERE octet_length(encode(text)) % 3 = 2
        )
        SELECT m.doc_id, f.frame_idx,
               (m.doc_id * 31 + f.frame_idx) % 256 AS frame_fp
        FROM meta m,
             LATERAL (SELECT unnest(range(0, m.n_frames, {FRAME_STRIDE})) AS frame_idx) f
    """,
)
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling — the ROW-EXPANDING multimodal case: each video
    payload yields one row per sampled frame (every FRAME_STRIDE-th).
    mapInPandas is the right operator because the output row count is
    data-dependent (a scalar UDF can't change cardinality); each Arrow
    batch expands in memory-bounded chunks, and downstream ops see an
    ordinary (doc_id, frame_idx, frame_fp) DataFrame. The frame
    "fingerprint" is the stubbed stand-in for a real per-frame decode
    (see decode_payload's contract)."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )

    def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids, idxs, fps = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(p)
                if len(payload) % 3 != 2:  # only 'video' modality
                    continue
                n_frames = len(payload) % 30 + 1
                for i in range(0, n_frames, FRAME_STRIDE):
                    doc_ids.append(doc_id)
                    idxs.append(i)
                    fps.append((int(doc_id) * 31 + i) % 256)
            yield pd.DataFrame(
                {"doc_id": doc_ids, "frame_idx": idxs, "frame_fp": fps},
            ).astype({"doc_id": "int64", "frame_idx": "int32", "frame_fp": "int32"})

    return docs.mapInPandas(
        sample_frames, "doc_id long, frame_idx int, frame_fp int"
    )


@query(
    "multimodal_dedup",
    oracle="""
        WITH meta AS (
            SELECT doc_id,
                   md5(text) AS digest,
                   octet_length(encode(text)) AS n_bytes
            FROM documents
        )
        SELECT digest,
               min(doc_id) AS keep_id,
               count(*) AS n_copies,
               CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
               CAST(sum(n_bytes) - min(n_bytes) AS BIGINT) AS reclaimable_bytes
        FROM meta
        GROUP BY digest
    """,
)
def multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact media dedup by content digest — the first stage of every
    multimodal pipeline: identical payload bytes (re-crawled images,
    mirrored videos) collapse to one keep-first representative per
    md5 group, with the copy count and the storage the collapse
    reclaims. Runs entirely on metadata (digest + size) — the payload
    is hashed JVM-side during the scan and never shuffled, which is
    what makes this viable when the payloads are the 100 TB: the
    groupBy moves 16-byte digests, not media bytes. Keep-first =
    min(doc_id), the same deterministic survivor rule as dedup_exact
    (dedup.py:214); near-dup (perceptual-hash) media dedup would slot
    in by replacing the digest with a pHash from `decode_payload`'s
    real decoder."""
    docs = table(spark, sf_dir, "documents").withColumn(
        "payload", F.encode("text", "utf-8")
    )
    meta = docs.select(
        "doc_id",
        F.md5("payload").alias("digest"),
        F.octet_length("payload").alias("n_bytes"),
    )
    return meta.groupBy("digest").agg(
        F.min("doc_id").alias("keep_id"),
        F.count(F.lit(1)).alias("n_copies"),
        F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        (F.sum("n_bytes") - F.min("n_bytes")).cast("bigint").alias("reclaimable_bytes"),
    )


# ------------------------------------------------------ perceptual near-dup

AHASH_HAM_T = 3  # near-dup hamming threshold over the 64-bit average-hash
# 4 bands x 16 bits: any pair within hamming<=3 shares at least one full
# band (pigeonhole), so the band join has NO false negatives at this
# threshold — the same completeness argument as simhash band tables.
_AHASH_BANDS = 4
_AHASH_BITS = 64


def _ahash_band_sql(i: int) -> str:
    terms = " + ".join(
        f"(CASE WHEN {_AHASH_BITS} * pix[{16 * i + j + 1}] > ps "
        f"THEN {1 << j} ELSE 0 END)"
        for j in range(16)
    )
    return f"CAST({terms} AS BIGINT) AS b{i}"


_AHASH_ORACLE = f"""
    WITH base AS (
        SELECT doc_id, text, length(text) AS n
        FROM documents WHERE length(text) > 0
    ),
    px AS (
        SELECT doc_id,
               list_transform(range(0, {_AHASH_BITS}),
                   k -> (unicode(substr(text, (k * n) // {_AHASH_BITS} + 1, 1))
                         * 131 + k * 31) % 256) AS pix
        FROM base
    ),
    withsum AS (SELECT doc_id, pix, list_sum(pix) AS ps FROM px),
    sigs AS (
        SELECT doc_id,
               {", ".join(_ahash_band_sql(i) for i in range(_AHASH_BANDS))}
        FROM withsum
    ),
    bands AS (
        SELECT doc_id, u.bi,
               CASE u.bi WHEN 0 THEN b0 WHEN 1 THEN b1
                         WHEN 2 THEN b2 ELSE b3 END AS bv
        FROM sigs, unnest([0, 1, 2, 3]) AS u(bi)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        FROM bands a JOIN bands b
          ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id
    ),
    ver AS (
        SELECT c.da, c.db
        FROM cand c
        JOIN sigs sa ON sa.doc_id = c.da
        JOIN sigs sb ON sb.doc_id = c.db
        WHERE bit_count(xor(sa.b0, sb.b0)) + bit_count(xor(sa.b1, sb.b1))
            + bit_count(xor(sa.b2, sb.b2)) + bit_count(xor(sa.b3, sb.b3))
            <= {AHASH_HAM_T}
    ),
    part AS (
        SELECT da AS doc_id, db AS p FROM ver
        UNION ALL SELECT db AS doc_id, da AS p FROM ver
    ),
    agg AS (
        SELECT doc_id, count(*) AS n_neardups, min(p) AS nearest_id
        FROM part GROUP BY doc_id
    )
    SELECT s.doc_id,
           printf('%04x%04x%04x%04x', s.b3, s.b2, s.b1, s.b0) AS ahash_hex,
           CAST(coalesce(a.n_neardups, 0) AS BIGINT) AS n_neardups,
           a.nearest_id
    FROM sigs s LEFT JOIN agg a ON a.doc_id = s.doc_id
"""


def ahash_pixels(text: str) -> list[int] | None:
    """STUB pixel model for the perceptual hash — the deterministic
    stand-in for `decode_payload`'s real decoder: the "image" of a
    payload is {_AHASH_BITS} evenly-sampled codepoints, each mixed with
    its position ((cp*131 + k*31) % 256 — a 1x64 high-variance
    grayscale strip). Two payloads sharing most of their content sample
    mostly-equal pixels, so near-identical media get hamming-close
    hashes — the property a real aHash has over real pixels. The
    position-mixing matters for the SCALE shape, not the semantics:
    raw codepoints of same-language text are heavily biased (letters
    above the space-dragged mean), which concentrates the thresholded
    bits and made band buckets grow quadratically (measured 5.78M
    candidate pairs at sf1, max bucket 783, 12.9x wall per 10x docs);
    the mixed pixels spread like real image content (165k pairs, max
    bucket 18, same near-dup recall — locality is untouched: identical
    payloads still hash identically and a local edit still flips only
    the affected samples). Undecodable (empty) payloads return None and
    are excluded, like a codec failure would be. Swap this body for a
    real decode+resize to productionize; everything downstream
    (banding, candidate join, hamming verify) is payload-agnostic."""
    n = len(text)
    if n == 0:
        return None
    return [
        (ord(text[(k * n) // _AHASH_BITS]) * 131 + k * 31) % 256
        for k in range(_AHASH_BITS)
    ]


@query("multimodal_neardup", oracle=_AHASH_ORACLE)
def multimodal_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual (average-hash) NEAR-dup media detection — the
    promised second stage after `multimodal_dedup`'s exact digests
    (VERDICT r10 item 5): per decodable payload, a 64-bit aHash (each
    sampled pixel thresholded against the integer pixel mean — strict
    `64*pix > sum` so both engines agree on the boundary), and the
    near-dup neighborhood at hamming <= {AHASH_HAM_T}: partner count
    and lowest partner id (the keep-candidate under the min-id survivor
    rule). Output is one row per decodable doc, so the hash gate pins
    the FULL hash arithmetic even on corpora with zero near-dups.

    Spark-first shape: hashing is one Arrow-batched mapInPandas over
    the payload scan (the decode stage — a real decoder changes
    `ahash_pixels` only), localCheckpoint-materialized so the Python
    stage runs once. Pairing is the simhash/minhash band discipline:
    the 64-bit hash splits into 4 x 16-bit bands (LSH-COMPLETE for
    hamming <= {AHASH_HAM_T}: <= 3 differing bits cannot touch all 4
    bands), candidates group on (band_idx, band_value) moving 5-int
    structs — never payloads — and the hamming verify runs INSIDE the
    chunked pair expansion (exploded_pairs), so a degenerate corpus of
    1e5 identical images costs bounded 128x128 chunk tasks, not one
    quadratic row. Partner aggregation is one groupBy over verified
    pairs. At 100 TB: hash once at ingest next to the exact digest
    (multimodal_dedup's staging asset), and the band index is the
    persisted search structure — rehashing is never needed to re-query
    at a different threshold <= 3."""
    from spark_graft.operators.dedup import exploded_pairs

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")

    def ahash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                pix = ahash_pixels(text if text is not None else "")
                if pix is None:
                    continue
                ps = sum(pix)
                bands = []
                for i in range(_AHASH_BANDS):
                    b = 0
                    for j in range(16):
                        if _AHASH_BITS * pix[16 * i + j] > ps:
                            b |= 1 << j
                    bands.append(b)
                rows.append((int(doc_id), *bands))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["doc_id", "b0", "b1", "b2", "b3"]
                )

    sigs = docs.mapInPandas(
        ahash_batches, "doc_id long, b0 long, b1 long, b2 long, b3 long"
    ).localCheckpoint()

    member = F.struct("doc_id", "b0", "b1", "b2", "b3")
    buckets = (
        sigs.select(
            member.alias("m"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("bi"), F.col(f"b{i}").alias("bv")
                        )
                        for i in range(_AHASH_BANDS)
                    ]
                )
            ).alias("bb"),
        )
        .select(F.col("bb.bi").alias("bi"), F.col("bb.bv").alias("bv"), "m")
        .groupBy("bi", "bv")
        .agg(F.collect_list("m").alias("ds"))
        .filter(F.size("ds") > 1)
    )

    def _ham_ok(p):
        ham = sum(
            F.bit_count(p["a"][f"b{i}"].bitwiseXOR(p["b"][f"b{i}"]))
            for i in range(_AHASH_BANDS)
        )
        return ham <= AHASH_HAM_T

    pairs = (
        exploded_pairs(buckets, "ds", pair_filter=_ham_ok)
        .select(
            F.least("p.a.doc_id", "p.b.doc_id").alias("da"),
            F.greatest("p.a.doc_id", "p.b.doc_id").alias("db"),
        )
        .distinct()
    )
    # ONE reference to `pairs` (r18): the two-branch union re-executed
    # the band-bucket + chunked-pair-verify pipeline once per branch;
    # exploding each pair into both (doc, partner) directions yields the
    # identical multiset from a single pass.
    partners = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("da").alias("doc_id"), F.col("db").alias("p")),
                F.struct(F.col("db").alias("doc_id"), F.col("da").alias("p")),
            )
        ).alias("e")
    ).select("e.doc_id", "e.p")
    agg = partners.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_neardups"), F.min("p").alias("nearest_id")
    )
    return sigs.join(agg, "doc_id", "left").select(
        "doc_id",
        F.format_string("%04x%04x%04x%04x", "b3", "b2", "b1", "b0").alias(
            "ahash_hex"
        ),
        F.coalesce("n_neardups", F.lit(0)).cast("bigint").alias("n_neardups"),
        "nearest_id",
    )


RESIZE_OUT_W = 16  # thumbnail width (the stub pixel model is a 1-D strip)


def resize_payload(text: str) -> tuple[int, list[int]] | None:
    """STUB decode+resize — the deterministic stand-in for a real
    PIL/ffmpeg thumbnail pass: the "image" is a 1-D grayscale strip of
    `decode_payload`-width pixels sampled from the payload (the same
    position-mixed model as `ahash_pixels`, at the payload's own
    decoded width instead of a fixed 64), and the RESIZE is an exact
    integer box filter down to {RESIZE_OUT_W} pixels — each output
    pixel the integer mean of its source segment, the arithmetic a
    real area-average downscale performs per channel. Returns
    (src_width, thumbnail) or None for undecodable (empty) payloads.
    Swap the body for a real decode + `Image.resize` to productionize;
    the operator's plumbing (Arrow batches, schema, row drops) is
    payload-agnostic."""
    n = len(text)
    if n == 0:
        return None
    w = (n * 7919) % 640 + 16  # decode_payload's width model
    pix = [(ord(text[(k * n) // w]) * 131 + k * 31) % 256 for k in range(w)]
    out = []
    for j in range(RESIZE_OUT_W):
        a, b = (j * w) // RESIZE_OUT_W, ((j + 1) * w) // RESIZE_OUT_W
        seg = pix[a:b]
        out.append(sum(seg) // len(seg))
    return w, out


@query(
    "multimodal_resize",
    oracle=f"""
        WITH base AS (
            SELECT doc_id, text, length(text) AS n
            FROM documents WHERE length(text) > 0
        ),
        dims AS (SELECT doc_id, text, n, (n * 7919) % 640 + 16 AS w FROM base),
        px AS (
            SELECT doc_id, w,
                   list_transform(range(0, w),
                       k -> (unicode(substr(text, (k * n) // w + 1, 1))
                             * 131 + k * 31) % 256) AS pix
            FROM dims
        ),
        th AS (
            SELECT doc_id, w,
                   list_transform(range(0, {RESIZE_OUT_W}), j ->
                       list_sum(pix[(j * w) // {RESIZE_OUT_W} + 1
                                    : ((j + 1) * w) // {RESIZE_OUT_W}])
                       // (((j + 1) * w) // {RESIZE_OUT_W}
                           - (j * w) // {RESIZE_OUT_W})) AS t
            FROM px
        )
        SELECT doc_id, w AS src_w, {RESIZE_OUT_W} AS out_w,
               array_to_string(
                   list_transform(t, p -> printf('%02x', CAST(p AS BIGINT))),
                   '') AS thumb_hex
        FROM th
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/thumbnail via mapInPandas — the remaining stage of the
    decode / feature-extract / RESIZE / frame-sample multimodal quartet
    (`multimodal_decode` and `multimodal_frames` cover the others):
    binary payloads arrive as Arrow batches, the (stubbed) decoder
    yields the source pixel strip at the payload's decoded width, an
    exact integer box filter downsamples it to {RESIZE_OUT_W} pixels,
    and the thumbnail leaves as a hex string (a real pipeline writes
    the re-encoded bytes — same column shape). Undecodable payloads
    drop, like a codec failure would — mapInPandas because the output
    cardinality is data-dependent.

    At 100 TB: thumbnailing is a pure map stage — no shuffle, no state,
    Arrow-batched per partition — so it pipelines with the scan and
    scales with executors alone. The oracle reproduces the stub's
    integer sampling + box-mean arithmetic in SQL, so schema, batch
    plumbing, AND the resample arithmetic are hash-gated; only the
    pixel source is fake (the marked function swaps for PIL)."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text")
    )

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hexes = [], [], []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                r = resize_payload(text if text is not None else "")
                if r is None:
                    continue
                w, thumb = r
                ids.append(did)
                ws.append(w)
                hexes.append("".join(f"{p:02x}" for p in thumb))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "src_w": ws,
                    "out_w": [RESIZE_OUT_W] * len(ids),
                    "thumb_hex": hexes,
                }
            )

    return docs.mapInPandas(
        resize_batches, "doc_id long, src_w int, out_w int, thumb_hex string"
    )


# ------------------------------------------------- fused media curation chain

_MEDIA_DECODE_SCHEMA = (
    "doc_id long, n_bytes int, digest string, kind string, decodable boolean, "
    "b0 long, b1 long, b2 long, b3 long, src_w int, thumb_hex string, "
    "n_frames_sampled int, frame_fps string"
)


def media_decode_stage(docs: DataFrame) -> DataFrame:
    """The fused pipeline's SINGLE decode pass: one scan of the payload
    column, one Arrow-batched mapInPandas computing EVERYTHING any later
    stage needs — exact digest + modality (JVM-side, riding through the
    Python stage untouched), the 4x16-bit aHash bands, the box-filter
    thumbnail, and the sampled-frame fingerprints. Every downstream
    stage of pipeline_media_corpus is pure relational work over this
    table; the (expensive) payload bytes are never read, decoded, or
    shuffled again. Exposed un-checkpointed so the plan test can pin
    the one-scan/one-Python-stage contract directly."""
    # NULL payloads normalize to empty bytes up front (code-review r13:
    # without this, n_bytes arrives as NaN in the Arrow batch — int()
    # raises and one NULL row kills the job — and NULL%3's when-chain
    # fall-through mislabeled the row 'video'); an empty payload then
    # takes the ordinary undecodable-drop path, like a codec failure
    payload = F.coalesce("text", F.lit(""))
    staged = docs.select(
        "doc_id",
        payload.alias("text"),
        F.octet_length(F.encode(payload, "utf-8")).alias("n_bytes"),
        F.md5(F.encode(payload, "utf-8")).alias("digest"),
        F.when(F.octet_length(F.encode(payload, "utf-8")) % 3 == 0, "image")
        .when(F.octet_length(F.encode(payload, "utf-8")) % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
    )

    def decode_all(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, text, n_bytes, digest, kind in zip(
                pdf["doc_id"], pdf["text"], pdf["n_bytes"], pdf["digest"], pdf["kind"]
            ):
                t = text if text is not None else ""
                pix = ahash_pixels(t)
                if pix is None:
                    rows.append(
                        (int(did), int(n_bytes), digest, kind, False,
                         None, None, None, None, None, None, 0, "")
                    )
                    continue
                ps = sum(pix)
                bands = []
                for i in range(_AHASH_BANDS):
                    b = 0
                    for j in range(16):
                        if _AHASH_BITS * pix[16 * i + j] > ps:
                            b |= 1 << j
                    bands.append(b)
                w, thumb = resize_payload(t)
                if kind == "video":
                    nf = int(n_bytes) % 30 + 1
                    fps = [(int(did) * 31 + i) % 256 for i in range(0, nf, FRAME_STRIDE)]
                else:
                    fps = []
                rows.append(
                    (int(did), int(n_bytes), digest, kind, True, *bands,
                     w, "".join(f"{p:02x}" for p in thumb),
                     len(fps), ",".join(str(x) for x in fps))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_bytes", "digest", "kind", "decodable",
                    "b0", "b1", "b2", "b3", "src_w", "thumb_hex",
                    "n_frames_sampled", "frame_fps",
                ],
            )

    return staged.mapInPandas(decode_all, _MEDIA_DECODE_SCHEMA)


_MEDIA_ORACLE = f"""
    WITH base AS (
        -- NULL payloads normalize to '' exactly like the Spark side,
        -- so a NULL-text doc is one more undecodable drop, not a
        -- separate NULL-digest group
        SELECT doc_id, coalesce(text, '') AS text,
               CAST(octet_length(encode(coalesce(text, ''))) AS INTEGER) AS n_bytes,
               md5(coalesce(text, '')) AS digest,
               CASE octet_length(encode(coalesce(text, ''))) % 3
                    WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
               length(coalesce(text, '')) AS n
        FROM documents
    ),
    keep AS (
        SELECT digest, min(doc_id) AS keep_id,
               CAST(count(*) AS BIGINT) AS n_copies
        FROM base GROUP BY digest
    ),
    surv AS (
        SELECT b.*, k.n_copies
        FROM base b JOIN keep k ON b.digest = k.digest AND b.doc_id = k.keep_id
        WHERE b.n > 0
    ),
    px AS (
        SELECT doc_id,
               list_transform(range(0, {_AHASH_BITS}),
                   k -> (unicode(substr(text, (k * n) // {_AHASH_BITS} + 1, 1))
                         * 131 + k * 31) % 256) AS pix
        FROM surv
    ),
    withsum AS (SELECT doc_id, pix, list_sum(pix) AS ps FROM px),
    sigs AS (
        SELECT doc_id,
               {", ".join(_ahash_band_sql(i) for i in range(_AHASH_BANDS))}
        FROM withsum
    ),
    bands AS (
        SELECT doc_id, u.bi,
               CASE u.bi WHEN 0 THEN b0 WHEN 1 THEN b1
                         WHEN 2 THEN b2 ELSE b3 END AS bv
        FROM sigs, unnest([0, 1, 2, 3]) AS u(bi)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        FROM bands a JOIN bands b
          ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id
    ),
    ver AS (
        SELECT c.da, c.db
        FROM cand c
        JOIN sigs sa ON sa.doc_id = c.da
        JOIN sigs sb ON sb.doc_id = c.db
        WHERE bit_count(xor(sa.b0, sb.b0)) + bit_count(xor(sa.b1, sb.b1))
            + bit_count(xor(sa.b2, sb.b2)) + bit_count(xor(sa.b3, sb.b3))
            <= {AHASH_HAM_T}
    ),
    deg AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS nd FROM (
            SELECT da AS doc_id FROM ver
            UNION ALL SELECT db FROM ver
        ) GROUP BY doc_id
    ),
    dropped AS (SELECT DISTINCT db AS doc_id FROM ver),
    kept AS (
        SELECT s.* FROM surv s
        LEFT JOIN dropped x ON x.doc_id = s.doc_id
        WHERE x.doc_id IS NULL
    ),
    dims AS (SELECT doc_id, text, n, (n * 7919) % 640 + 16 AS w FROM kept),
    rpx AS (
        SELECT doc_id, w,
               list_transform(range(0, w),
                   k -> (unicode(substr(text, (k * n) // w + 1, 1))
                         * 131 + k * 31) % 256) AS pix
        FROM dims
    ),
    th AS (
        SELECT doc_id, w,
               list_transform(range(0, {RESIZE_OUT_W}), j ->
                   list_sum(pix[(j * w) // {RESIZE_OUT_W} + 1
                                : ((j + 1) * w) // {RESIZE_OUT_W}])
                   // (((j + 1) * w) // {RESIZE_OUT_W}
                       - (j * w) // {RESIZE_OUT_W})) AS t
        FROM rpx
    ),
    frames AS (
        SELECT k.doc_id,
               CASE WHEN k.kind = 'video'
                    THEN list_transform(
                        range(0, k.n_bytes % 30 + 1, {FRAME_STRIDE}),
                        i -> (k.doc_id * 31 + i) % 256)
                    ELSE CAST([] AS BIGINT[]) END AS fps
        FROM kept k
    )
    SELECT k.doc_id, k.digest, k.kind, k.n_bytes, k.n_copies,
           CAST(coalesce(d.nd, 0) AS BIGINT) AS n_near_partners,
           CAST(t.w AS INTEGER) AS src_w,
           array_to_string(
               list_transform(t.t, p -> printf('%02x', CAST(p AS BIGINT))),
               '') AS thumb_hex,
           CAST(len(f.fps) AS INTEGER) AS n_frames_sampled,
           coalesce(array_to_string(f.fps, ','), '') AS frame_fps
    FROM kept k
    LEFT JOIN deg d ON d.doc_id = k.doc_id
    JOIN th t ON t.doc_id = k.doc_id
    JOIN frames f ON f.doc_id = k.doc_id
"""


@query("pipeline_media_corpus", oracle=_MEDIA_ORACLE)
def pipeline_media_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FUSED multimodal curation chain (VERDICT r12 missing-item 2
    — the media twin of pipeline_pretrain_corpus): digest exact-dedup
    -> perceptual near-dup collapse -> thumbnail the survivors ->
    frame-sample the video survivors, as ONE declared query whose
    stages share a SINGLE decode pass. Run separately
    (multimodal_dedup, multimodal_neardup, multimodal_resize,
    multimodal_frames — all retained as the per-stage contracts), the
    four stages scan and decode the expensive binary payloads four
    times; at 100 TB of media the payload scans ARE the pipeline cost,
    so the fused form decodes once into a narrow staging table
    (media_decode_stage: digest + bands + thumbnail + frame
    fingerprints per doc, ~100 bytes/row) and every gate after that is
    relational work on metadata — the plan test pins exactly one
    parquet scan and exactly one Python stage, both BEFORE the staging
    checkpoint, and zero of either after it.

    Gates, in pipeline order (each survivor row carries its
    provenance):
    1. exact collapse — keep-first min(doc_id) per md5 digest
       (multimodal_dedup's rule); n_copies = collapsed group size.
    2. decodability — undecodable payloads drop, like a codec failure.
    3. near-dup collapse over exact survivors — the 4x16-bit aHash
       band LSH + hamming<={AHASH_HAM_T} verify (multimodal_neardup's
       machinery: pigeonhole-complete banding, chunked pair expansion,
       structs-not-payloads through the shuffle), with the greedy
       min-id survivor rule of dedup_semantic: a doc drops iff some
       LOWER-id exact-survivor is hamming-close (no transitive
       closure — same argument as dedup_semantic's docstring);
       n_near_partners = the doc's verified-pair degree.
    4. deliverables — the thumbnail (exact integer box filter) and,
       for videos, every {FRAME_STRIDE}-th frame fingerprint — both
       computed in the shared decode pass, emitted only for survivors.

    The localCheckpoint is the staging table a real run persists
    (pipeline_pretrain_corpus's pattern); the decode stage is the one
    marked swap point for real codecs (ahash_pixels / resize_payload /
    decode_payload share it). Oracle: the full chain in SQL over the
    same stub arithmetic — schema, gating, banding, hamming, resize
    and frame math all hash-gated."""
    from spark_graft.operators.dedup import exploded_pairs

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    decoded = media_decode_stage(docs).localCheckpoint()

    keep = decoded.groupBy("digest").agg(
        F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies")
    )
    surv = (
        decoded.join(keep, "digest")
        .filter(F.col("doc_id") == F.col("keep_id"))
        .filter(F.col("decodable"))
    )

    member = F.struct("doc_id", "b0", "b1", "b2", "b3")
    buckets = (
        surv.select(
            member.alias("m"),
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(i).alias("bi"), F.col(f"b{i}").alias("bv"))
                        for i in range(_AHASH_BANDS)
                    ]
                )
            ).alias("bb"),
        )
        .select(F.col("bb.bi").alias("bi"), F.col("bb.bv").alias("bv"), "m")
        .groupBy("bi", "bv")
        .agg(F.collect_list("m").alias("ds"))
        .filter(F.size("ds") > 1)
    )

    def _ham_ok(p):
        ham = sum(
            F.bit_count(p["a"][f"b{i}"].bitwiseXOR(p["b"][f"b{i}"]))
            for i in range(_AHASH_BANDS)
        )
        return ham <= AHASH_HAM_T

    pairs = (
        exploded_pairs(buckets, "ds", pair_filter=_ham_ok)
        .select(
            F.least("p.a.doc_id", "p.b.doc_id").alias("da"),
            F.greatest("p.a.doc_id", "p.b.doc_id").alias("db"),
        )
        .distinct()
    )
    # ONE reference to `pairs`, ONE aggregation, ONE join (r18): the
    # deg-union (2 refs) + dropped-distinct (3rd ref) re-executed the
    # band/verify pair pipeline per reference. A doc drops iff it ever
    # appears as the greater id db (max(is_b)); its degree is its
    # endpoint count — same values as the union + anti-join form.
    ends = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("da").alias("doc_id"), F.lit(False).alias("is_b")),
                F.struct(F.col("db").alias("doc_id"), F.lit(True).alias("is_b")),
            )
        ).alias("e")
    ).select("e.doc_id", "e.is_b")
    nd = ends.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_near_partners"), F.max("is_b").alias("_drop")
    )

    kept = surv.join(nd, "doc_id", "left").filter(
        ~F.coalesce("_drop", F.lit(False))
    )
    return kept.select(
        "doc_id",
        "digest",
        "kind",
        "n_bytes",
        "n_copies",
        F.coalesce("n_near_partners", F.lit(0)).cast("bigint").alias("n_near_partners"),
        "src_w",
        "thumb_hex",
        "n_frames_sampled",
        "frame_fps",
    )
