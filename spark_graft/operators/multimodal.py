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
