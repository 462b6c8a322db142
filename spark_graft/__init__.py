"""spark_graft — a PySpark-native analytics engine with the capabilities of
AlexShneur/12_mapreduce, rebuilt Spark-first.

The reference (/root/reference) is an educational single-machine MapReduce
framework (split -> map -> sort -> k-way merge -> key-grouped partition ->
reduce, plus an iterative driver; see SURVEY.md). This package re-expresses
that computational model — and the full relational + LLM-data-pipeline
operator surface it implies — on the Spark DataFrame/Catalyst stack:

- ``spark_graft.session``   SparkSession factory with scale-aware defaults
- ``spark_graft.sources``   readers/writers (parquet tables, text lines)
- ``spark_graft.registry``  declared query contract (name -> fn + DuckDB oracle)
- ``spark_graft.operators`` the query/operator implementations
- ``spark_graft.functions`` reusable column expressions (tokenize, cosine, minhash...)
- ``spark_graft.plans``     physical-plan introspection helpers
- ``spark_graft.streaming`` Structured Streaming variants of the event queries
- ``spark_graft.compat``    RDD shim reproducing the reference's exact
                            map/shuffle/reduce semantics (MapReduce.h:51-125)
"""

from spark_graft.registry import REGISTRY, QuerySpec, query

__all__ = ["REGISTRY", "QuerySpec", "query", "load_all_queries"]


# The external driver's per-round correctness budget hash-checks only
# the FIRST ~50 registered queries, so registration order is a
# verification SCHEDULE. load_all_queries() orders the registry by
# staleness tier:
#   tier 0 — never driver-verified, or modified this round (an edit to
#            a query fn or its oracle invalidates prior verification,
#            so edited queries must re-enter the window);
#   tier 1 — hash-green last in CORRECTNESS_r07 (2 rounds stale,
#            highest priority among unmodified queries);
#   tier 2 — hash-green last in CORRECTNESS_r08 (1 round stale);
#   tier 3 — hash-green in CORRECTNESS_r09 on code unchanged since.
# Refresh these sets from CORRECTNESS_r{N}.json at the start of each
# round, and add every query touched during the round to
# _MODIFIED_THIS_ROUND.

# Queries whose implementation or shared plumbing changed during
# ROUND 10 — tier 0, the driver must re-verify them on the new code:
# - NEW this round (never driver-verified, so tier 0 by both rules):
#   vocab_bpe_apply (corpus encoding with the trained BPE merges),
#   sim_ann_pq (product-quantized asymmetric-distance ANN),
#   events_pattern (CEP row-pattern matching), sample_importance
#   (Horvitz-Thompson quality-weighted sampling), agg_sketch_kmv
#   (theta-sketch set algebra), dedup_containment (asymmetric
#   near-superset pairs), multimodal_dedup (content-digest media
#   dedup), text_lm_score (corpus-bigram LM quality scoring),
#   events_attribution (last-touch batch twin of the stream-stream
#   join).
# - fn_json / fn_map: JSON value-type semantics pinned (try_cast for
#   non-integral k; the map oracle now requires every value to be a
#   JSON null or int32 exactly like from_json('map<string,int>')) —
#   both Spark exprs and oracles changed, so tier 0.
# - agg_corr_exact / win_dist: relational adversarial net fixes
#   (explicit NULL for zero-variance correlation; NULLS FIRST pinned
#   in the distribution-window oracle) — tier 0.
# - dedup_ngram_jaccard: exact-duplicate token-array collapse before
#   PPJoin candidate generation (VERDICT r9 item 4) — output pair set
#   unchanged by construction, but the candidate pipeline changed.
# - kmeans_lloyd / sim_ann_ivf_trained / dedup_embedding /
#   dedup_semantic / sim_knn_graph / sim_hardneg / sample_coreset:
#   the trained-quantizer consumers — clustering's broadcast-assigner
#   lifecycle (ADVICE r9 broadcast-leak fix) and _data_fingerprint
#   (relpath + sorted walk) are shared plumbing on their executed path.
_MODIFIED_THIS_ROUND = frozenset(
    """vocab_bpe_apply sim_ann_pq events_pattern sample_importance
    agg_sketch_kmv dedup_containment multimodal_dedup text_lm_score
    events_attribution fn_json fn_map agg_corr_exact win_dist
    dedup_ngram_jaccard
    kmeans_lloyd sim_ann_ivf_trained dedup_embedding dedup_semantic
    sim_knn_graph sim_hardneg sample_coreset""".split()
)

# Green last in CORRECTNESS_r07.json — 2 rounds stale; the 13 VERDICT
# r9 item 1 names. They go first among unmodified queries in round
# 10's window.
_VERIFIED_R7 = frozenset(
    """agg_approx agg_approx_percentile agg_bool_all
    agg_distinct agg_percentile filter_in_null filter_pred
    grouping_sets profile_table scan_project text_lines
    word_count""".split()
)

# Green last in CORRECTNESS_r08.json — 1 round stale. With 21
# modified/new + 12 r7-stale ahead of them (simulated this round:
# window = 21 tier-0 + 12 tier-1 + 17 of these 42), 17 fit the
# 50-query window; the stable sort admits them in registration order
# and the remaining 25 become round 11's top priority.
_VERIFIED_R8 = frozenset(
    """agg_pivot agg_q1 agg_sketch_hll agg_skew_salted dedup_exact
    dedup_incremental dedup_incremental_minhash dedup_minhash
    dedup_span_fraction events_funnel events_paths events_retention
    fill_forward global_sort grouping_cube grouping_rollup
    join_broadcast join_multi join_outer join_skew_salted lm_next_token
    min_unique_prefix multimodal_decode multimodal_frames
    multimodal_meta sample_stratified set_ops stream_session
    stream_sliding stream_tumbling text_chunks text_fingerprint
    text_repetition text_split text_tfidf topk_per_group ts_anomaly
    ts_resample udf_compat unpivot_measures vocab_pair_counts
    win_gaps_islands""".split()
)

# Green (rows+schema+hash) in CORRECTNESS_r09.json — freshest; these
# can sit out round 10's window provided their code does not change.
# (The trained-quantizer consumers + dedup_ngram_jaccard verified in
# r09 are EXCLUDED here because round-10 edits moved them to
# _MODIFIED_THIS_ROUND.)
_VERIFIED_R9 = frozenset(
    """agg_histogram agg_sketch_cms decontaminate dedup_clusters
    dedup_simhash fn_array fn_datetime fn_math_decimal
    fn_string fn_struct graph_pagerank graph_triangles join_asof
    join_bloom join_inner join_q2_shape join_semi_anti join_theta_range
    mixture_weights pipeline_clean_corpus pipeline_pack_sequences
    recursive_reachability sim_ann_ivf sim_ann_lsh sim_cosine_topk
    source_stats text_bm25 text_langid text_quality text_scrub
    text_stats text_tokens udf_compat_iterative udf_pandas_tokens
    vocab_bpe_train win_lag win_range win_rank
    win_running""".split()
)


def _staleness_tier(name: str) -> int:
    """0 = needs verification now … 3 = freshest verification."""
    if name in _MODIFIED_THIS_ROUND:
        return 0
    if name in _VERIFIED_R7:
        return 1
    if name in _VERIFIED_R8:
        return 2
    if name in _VERIFIED_R9:
        return 3
    return 0  # never driver-verified


def load_all_queries() -> None:
    """Import every operator module so its @query decorators register,
    then reorder the registry stalest-verification-first (see
    _staleness_tier)."""
    # Imported lazily so `import spark_graft` stays cheap.
    from spark_graft.operators import (  # noqa: F401
        vocab,
        skew,
        multimodal,
        events,
        compat_queries,
        pipeline,
        graph,
        clustering,
        text,
        scalar,
        similarity,
        dedup,
        joins,
        windows,
        relational,
    )

    # stable sort: queries keep their relative registration order
    # within each staleness tier
    ordered = sorted(REGISTRY, key=_staleness_tier)
    snapshot = dict(REGISTRY)
    REGISTRY.clear()
    REGISTRY.update({n: snapshot[n] for n in ordered})
