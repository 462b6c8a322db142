"""Trained-artifact save/load round trips (VERDICT r10 item 3): for
each of the three trained models — BPE merges, kmeans centroids, PQ
codebooks — train -> save -> load -> serve must be bit-identical to the
fused train+serve path, the serve-only bpe_apply plan must be
shuffle-free, and a stale/mismatched artifact must refuse to serve."""

from __future__ import annotations

import pytest

from spark_graft import artifacts
from spark_graft.registry import REGISTRY


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_bpe_merges_roundtrip_and_shufflefree_serve(spark, sf_dir, tmp_path):
    from spark_graft.plans import executed_plan_str

    path = str(tmp_path / "bpe")
    merges = artifacts.train_and_save_bpe(spark, sf_dir, path)
    assert merges == artifacts.load_bpe_merges(path, sf_dir=sf_dir)
    fused = REGISTRY["vocab_bpe_apply"].fn(spark, sf_dir)
    served = REGISTRY["vocab_bpe_apply"].fn(spark, sf_dir, merges_path=path)
    assert _rows(served) == _rows(fused)
    # the fertility scorecard serves from the same artifact
    assert _rows(
        REGISTRY["vocab_fertility"].fn(spark, sf_dir, merges_path=path)
    ) == _rows(REGISTRY["vocab_fertility"].fn(spark, sf_dir))
    # the serve-only encode is a pure narrow replace() chain: no
    # Exchange anywhere in the executed plan (the fused path pays one
    # pair-count shuffle per training round; serving pays none)
    physical = executed_plan_str(served)
    assert "Exchange" not in physical, physical


def test_kmeans_centroids_roundtrip(spark, sf_dir, tmp_path):
    path = str(tmp_path / "cents")
    cents = artifacts.train_and_save_centroids(spark, sf_dir, path)
    assert cents == artifacts.load_kmeans_centroids(path, sf_dir=sf_dir)
    fused = REGISTRY["sim_ann_ivf_trained"].fn(spark, sf_dir)
    served = REGISTRY["sim_ann_ivf_trained"].fn(spark, sf_dir, centroids_path=path)
    assert _rows(served) == _rows(fused)


def test_pq_codebooks_roundtrip(spark, sf_dir, tmp_path):
    path = str(tmp_path / "pq")
    cb = artifacts.train_and_save_pq(spark, sf_dir, path)
    assert cb == artifacts.load_pq_codebooks(path, sf_dir=sf_dir)
    fused = REGISTRY["sim_ann_pq"].fn(spark, sf_dir)
    served = REGISTRY["sim_ann_pq"].fn(spark, sf_dir, codebooks_path=path)
    assert _rows(served) == _rows(fused)


def test_quality_weights_roundtrip_and_shufflefree_serve(spark, sf_dir, tmp_path):
    from spark_graft.plans import executed_plan_str

    path = str(tmp_path / "qw")
    w = artifacts.train_and_save_quality(spark, sf_dir, path)
    assert w == artifacts.load_quality_weights(path, sf_dir=sf_dir)
    assert any(v != 0 for v in w)  # training moved off the zero init
    fused = REGISTRY["quality_classifier"].fn(spark, sf_dir)
    served = REGISTRY["quality_classifier"].fn(spark, sf_dir, weights_path=path)
    assert _rows(served) == _rows(fused)
    # serving is one narrow pass over the corpus: no Exchange at all
    physical = executed_plan_str(served)
    assert "Exchange" not in physical, physical


def test_fingerprint_mismatch_refuses_to_serve(spark, sf_dir, tmp_path):
    """An artifact trained on corpus A must raise when validated against
    corpus B (stale/wrong-data protection), and still serve with
    validate=False — the explicit cross-corpus train-once/serve-many
    path."""
    import shutil

    other = tmp_path / "otherdata"
    other.mkdir()
    # same schema, different bytes -> different fingerprint
    spark.createDataFrame(
        [(0, [0.1] * 8 + [0.2] * 56)], "vec_id bigint, embedding array<float>"
    ).coalesce(1).write.parquet(str(other / "embeddings.parquet"))
    path = str(tmp_path / "cents")
    artifacts.train_and_save_centroids(spark, sf_dir, path)
    with pytest.raises(artifacts.ArtifactMismatch):
        artifacts.load_kmeans_centroids(path, sf_dir=str(other))
    assert artifacts.load_kmeans_centroids(
        path, sf_dir=str(other), validate=False
    ) == artifacts.load_kmeans_centroids(path, sf_dir=sf_dir)
    # kind confusion is caught even without any fingerprint check
    with pytest.raises(artifacts.ArtifactMismatch):
        artifacts.load_bpe_merges(path, validate=False)
    shutil.rmtree(other)


def test_novelty_seed_index_artifact_contract(spark, sf_dir, tmp_path):
    """The novelty-gate seed index (VERDICT r12 item 6) carries the
    full artifact contract: save/load round-trips the band index
    bit-exactly, a fingerprint-validated load against the training
    corpus passes, validating against a DIFFERENT corpus raises
    ArtifactMismatch (the redeploy-against-wrong-corpus hole), and
    kind confusion with another artifact is refused."""
    import shutil

    from spark_graft.streaming import build_novelty_seed_index

    from spark_graft.sources import table as load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(50)
    seed = build_novelty_seed_index(docs)
    path = str(tmp_path / "seed")
    artifacts.save_novelty_seed_index(path, seed, sf_dir=sf_dir)

    t = artifacts.load_novelty_seed_index(path, sf_dir=sf_dir)  # validated
    want = sorted(map(tuple, seed.collect()))
    got = sorted(zip(t["band"].to_pylist(), t["sig"].to_pylist(),
                     t["doc_id"].to_pylist(), t["sh"].to_pylist()))
    assert got == want and len(got) > 0

    other = tmp_path / "otherdocs"
    other.mkdir()
    spark.createDataFrame(
        [(0, "completely different corpus", "en", "s", 27)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.parquet(str(other / "documents.parquet"))
    with pytest.raises(artifacts.ArtifactMismatch):
        artifacts.load_novelty_seed_index(path, sf_dir=str(other))
    # cross-corpus serve stays possible, explicitly
    assert artifacts.load_novelty_seed_index(path, validate=False).num_rows == len(want)
    # kind confusion refused
    with pytest.raises(artifacts.ArtifactMismatch):
        artifacts.load_bpe_merges(path, validate=False)
    shutil.rmtree(other)


def test_artifact_fingerprint_survives_swap_window(tmp_path):
    """artifact_fingerprint must serve through the atomic-swap window
    (primary path briefly absent, previous artifact at .old-<pid>) —
    the race an mtime stat on the primary path cannot survive
    (code-review r13). It must also track a re-save: the sha is the
    version, so a new payload yields a new cache key."""
    import os

    path = str(tmp_path / "bpe")
    artifacts.save_bpe_merges(path, [("a", "b")])
    sha1 = artifacts.artifact_fingerprint(path)
    assert sha1
    # simulate the mid-swap instant: primary renamed away, only the
    # .old-* sibling exists
    os.rename(path, path + ".old-99999")
    assert artifacts.artifact_fingerprint(path) == sha1
    os.rename(path + ".old-99999", path)
    artifacts.save_bpe_merges(path, [("a", "b"), ("ab", "c")])
    sha2 = artifacts.artifact_fingerprint(path)
    assert sha2 and sha2 != sha1


def test_explicit_validate_without_sf_dir_refuses(tmp_path):
    """validate=True with no sf_dir used to silently skip validation
    (ADVICE r11); it must now raise, so a caller who believes the
    staleness check is on never runs without it."""
    path = str(tmp_path / "bpe")
    artifacts.save_bpe_merges(path, [("a", "b")])
    with pytest.raises(artifacts.ArtifactMismatch, match="requires sf_dir"):
        artifacts.load_bpe_merges(path, validate=True)
    # the default (validate=None) still means "skip when no sf_dir"
    assert artifacts.load_bpe_merges(path) == [("a", "b")]


def test_torn_payload_refuses_and_resave_is_atomic(tmp_path):
    """meta.json records a sha256 of data.parquet: a payload swapped
    out from under its meta (torn copy, crashed half-save) raises; a
    re-save over an existing artifact swaps atomically and leaves no
    temp debris (ADVICE r11)."""
    import os

    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    artifacts.save_bpe_merges(a, [("a", "b")])
    artifacts.save_bpe_merges(b, [("x", "y"), ("xy", "z")])
    # overwrite in place: loader sees the new payload, no stale tmp/old
    artifacts.save_bpe_merges(a, [("p", "q")])
    assert artifacts.load_bpe_merges(a) == [("p", "q")]
    assert sorted(os.listdir(tmp_path)) == ["a", "b"]
    # tear: b's payload under a's meta -> checksum mismatch
    os.replace(os.path.join(b, "data.parquet"), os.path.join(a, "data.parquet"))
    with pytest.raises(artifacts.ArtifactMismatch, match="sha256"):
        artifacts.load_bpe_merges(a)


def test_quality_classifier_generalizes_to_held_out_docs(spark, sf_dir):
    """Train accuracy alone could be memorization; with 4 fixed-point
    weights it cannot be, and this pins it: weights trained on the
    ~80% md5-bucketed train split score the UNSEEN 20% well above the
    base rate. The split is content-stable (md5 of doc_id), the same
    discipline as every sampler in the repo."""
    from pyspark.sql import functions as F

    from spark_graft.functions import md5_bucket
    from spark_graft.operators.pipeline import (
        QC_S,
        _qc_features,
        _qc_p_expr,
        _qc_train,
    )

    feat = _qc_features(spark, sf_dir).withColumn(
        "holdout", md5_bucket("qsplit:", F.col("doc_id")) < 20
    )
    w = _qc_train(feat.filter(~F.col("holdout")).localCheckpoint())
    held = feat.filter(F.col("holdout")).selectExpr(
        "y", f"CAST({_qc_p_expr(w)} >= {QC_S // 2} AS INT) AS pred"
    )
    n, correct, pos = held.selectExpr(
        "count(*)", "sum(CAST(pred = y AS INT))", "sum(y)"
    ).first()
    assert n >= 50, n  # the holdout is not vacuous
    acc = correct / n
    base = max(pos / n, 1 - pos / n)
    assert acc >= 0.8 and acc > base + 0.1, (acc, base, n, w)


def test_crashed_swap_serves_previous_artifact(tmp_path):
    """A save that dies between its two renames leaves no directory at
    `path` and the previous complete artifact at `<path>.old-<pid>`;
    the loader must transparently serve that sibling, and the next
    successful save must clear the debris (code-review r12)."""
    import os
    import shutil

    a = str(tmp_path / "a")
    artifacts.save_bpe_merges(a, [("a", "b")])
    # simulate the crash window: the first rename happened, the second
    # never did
    os.rename(a, a + ".old-99999")
    shutil.rmtree(a, ignore_errors=True)
    assert artifacts.load_bpe_merges(a) == [("a", "b")]
    # recovery: a fresh save wins and removes the orphaned sibling
    artifacts.save_bpe_merges(a, [("x", "y")])
    assert artifacts.load_bpe_merges(a) == [("x", "y")]
    assert sorted(os.listdir(tmp_path)) == ["a"]


def test_pq_wrong_shape_artifact_refuses(spark, sf_dir, tmp_path):
    """A codebook whose subspace count / sub-dimension doesn't match the
    serving corpus raises instead of silently computing garbage ADC."""
    path = str(tmp_path / "badpq")
    artifacts.save_pq_codebooks(path, [{0: [1, 2, 3]}])  # 1 subspace, sub_d 3
    with pytest.raises(artifacts.ArtifactMismatch):
        REGISTRY["sim_ann_pq"].fn(spark, sf_dir, codebooks_path=path).collect()


def test_reader_racing_end_of_swap_rmtree_serves_complete(tmp_path, monkeypatch):
    """VERDICT r13 item 1 — the exact interleaving the atomic-swap
    contract must survive: a reader that resolved its directory to the
    `.old-*` sibling (mid-swap window) reads meta.json, then the
    writer COMPLETES — installs the new primary and rmtree's the
    sibling — before the reader opens data.parquet. The reader must
    retry the primary and serve the last COMPLETE artifact (the new
    one), never a torn meta/payload pair and never FileNotFoundError.
    The interleave is injected by hooking json.load inside artifacts."""
    import json as _json
    import os
    import shutil
    import types

    a = str(tmp_path / "a")
    artifacts.save_bpe_merges(a, [("a", "b")])  # v1
    # stage v2 as a complete directory the "writer" will install
    v2 = str(tmp_path / "v2")
    artifacts.save_bpe_merges(v2, [("x", "y"), ("xy", "z")])
    # freeze the mid-swap instant: primary renamed away, v1 at .old-*
    os.rename(a, a + ".old-777")

    fired = {"n": 0}
    real_load = _json.load

    def hooked_load(f, *args, **kw):
        meta = real_load(f, *args, **kw)
        if not fired["n"] and ".old-777" in getattr(f, "name", ""):
            fired["n"] += 1
            # writer completes between the reader's meta and payload
            # reads: new primary installed, sibling destroyed
            os.rename(v2, a)
            shutil.rmtree(a + ".old-777")
        return meta

    monkeypatch.setattr(
        artifacts,
        "json",
        types.SimpleNamespace(load=hooked_load, dump=_json.dump,
                              loads=_json.loads, dumps=_json.dumps),
    )
    assert artifacts.load_bpe_merges(a) == [("x", "y"), ("xy", "z")]
    assert fired["n"] == 1  # the interleave actually happened
    assert sorted(os.listdir(tmp_path)) == ["a"]


def test_fingerprint_pre_r12_artifact_hashes_payload(tmp_path):
    """artifact_fingerprint must distinguish versions of artifacts
    saved WITHOUT payload_sha256 in meta.json (pre-r12 format) by
    hashing data.parquet, instead of returning "" and colliding every
    version on one cache key (ADVICE r13)."""
    import json as _json
    import os

    a = str(tmp_path / "a")

    def strip_sha(path):
        mp = os.path.join(path, "meta.json")
        with open(mp) as f:
            meta = _json.load(f)
        del meta["payload_sha256"]
        with open(mp, "w") as f:
            _json.dump(meta, f)

    artifacts.save_bpe_merges(a, [("a", "b")])
    strip_sha(a)
    f1 = artifacts.artifact_fingerprint(a)
    artifacts.save_bpe_merges(a, [("x", "y")])
    strip_sha(a)
    f2 = artifacts.artifact_fingerprint(a)
    assert f1 and f2 and f1 != f2
    # and it still survives the swap window in sha-less form
    os.rename(a, a + ".old-99999")
    assert artifacts.artifact_fingerprint(a) == f2


def test_seed_cache_key_matches_payload_actually_read(tmp_path, monkeypatch):
    """ADVICE r13 TOCTOU: a re-save landing between _seed_index's
    fingerprint probe and its load must NOT cache the new payload under
    the old sha — the cache key is re-derived from the meta of the
    payload actually read."""
    from spark_graft.streaming import structured

    path = str(tmp_path / "seed")

    def save(rows):
        import pyarrow as pa

        artifacts._write(
            path,
            "novelty_seed_index",
            pa.table(
                {
                    "band": pa.array([0] * len(rows), pa.int32()),
                    "sig": pa.array([r[0] for r in rows], pa.string()),
                    "doc_id": pa.array([r[1] for r in rows], pa.int64()),
                    "sh": pa.array([r[0] for r in rows], pa.string()),
                },
            ),
            {"n_rows": len(rows)},
            None,
        )

    save([("s1", 1)])
    sha1 = artifacts.artifact_fingerprint(path)
    save([("s2", 2)])
    sha2 = artifacts.artifact_fingerprint(path)
    assert sha1 != sha2

    # interleave: probe sees the OLD sha, the load reads the NEW payload
    monkeypatch.setattr(structured, "_SEED_CACHE", {})
    calls = {"n": 0}

    def stale_probe(p):
        calls["n"] += 1
        return sha1 if calls["n"] == 1 else sha2

    import spark_graft.artifacts as amod

    monkeypatch.setattr(amod, "artifact_fingerprint", stale_probe)
    idx = structured._seed_index(path)
    assert any(ids == [2] for ids, _ in idx.values())  # new payload served
    # the cache key carries the sha of the payload ACTUALLY READ
    assert list(structured._SEED_CACHE) == [(path, sha2)]
