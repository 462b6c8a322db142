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
#   tier 1 — hash-green last in CORRECTNESS_r10 (3 rounds stale,
#            highest priority among unmodified queries);
#   tier 2 — hash-green last in CORRECTNESS_r11 (2 rounds stale);
#   tier 3 — hash-green in CORRECTNESS_r12 on code unchanged since.
# Refresh these sets from CORRECTNESS_r{N}.json at the start of each
# round, and add every query touched during the round to
# _MODIFIED_THIS_ROUND.

# Queries whose implementation changed during ROUND 13 — tier 0, the
# driver must re-verify them on the new code. All five are the VERDICT
# r12 window-df conversions (items 1 and 5): document/span/bucket
# frequency moved from `count().over(Window.partitionBy(<power-law
# key>))` — which funnels the hottest key's entire row set into ONE
# task with no partial aggregation and no AQE skew split — to the
# partial-aggregated groupBy+join form text_bm25/dedup_containment
# already used (value-identical rows, strictly skew-safe plan;
# AB_WINDOW_DF_SKEW.json holds the skewed-fixture A/B):
# - text_tfidf: term df now tf.groupBy(term) joined back;
# - dedup_span_fraction / dedup_substring: span df now the
#   df>1-filtered groupBy(g) freq table joined back;
# - dedup_simhash: bucket population via groupBy(simhash) + explicit
#   broadcast (<=65536 rows by construction);
# - dedup_clusters: member counts via groupBy(label) + join.
# - NEW: pipeline_media_corpus (the fused multimodal curation chain,
#   VERDICT r12 missing-item 2), profile_skew (the shuffle-key
#   heavy-hitter/skew-factor diagnostic), and pipeline_embed_index
#   (the fused retrieval pipeline: semantic dedup -> trained-cell
#   assignment -> IVF postings -> served top-k) — never
#   driver-verified.
# - dedup_substring additionally replaced the per-token covered-probe
#   with the sorted-starts sweep (VERDICT r12 item 3).
# - sim_ann_ivf_trained: the r13 code-review extracted its probe-
#   cluster selection (SQL CTEs + driver argmin) into shared
#   PROBE_SELECT_CTES/_nearest_trained_clusters so pipeline_embed_index
#   reuses rather than copies the hash-gated tie-breaks — behavior-
#   identical, but the executed path changed, so it re-enters the
#   window.
# - NEW: events_user_features (per-user feature rollup: sessions,
#   funnel stage, activity span, value — one user-keyed Exchange).
_MODIFIED_THIS_ROUND = frozenset(
    """text_tfidf dedup_span_fraction dedup_substring dedup_simhash
    dedup_clusters pipeline_media_corpus profile_skew
    pipeline_embed_index sim_ann_ivf_trained
    events_user_features""".split()
)

# Green last in CORRECTNESS_r10.json — 3 rounds stale, the 21 names
# VERDICT r12 item 2 lists; they rotate into round 13's window right
# after the tier-0 set (10 + 21 = 31, leaving 19 slots for tier 2).
_VERIFIED_R10_ONLY = frozenset(
    """agg_approx agg_approx_percentile agg_bool_all agg_corr_exact
    agg_distinct agg_percentile agg_sketch_kmv dedup_semantic
    filter_in_null filter_pred fn_json grouping_sets profile_table
    sample_coreset sample_importance scan_project sim_hardneg
    sim_knn_graph text_lines win_dist word_count""".split()
)

# Green last in CORRECTNESS_r11.json — 2 rounds stale (49 r11-green
# queries sat out r12's window; the 4 of them modified this round —
# dedup_clusters, dedup_simhash, dedup_span_fraction,
# sim_ann_ivf_trained — are EXCLUDED here and live in
# _MODIFIED_THIS_ROUND so the sets stay disjoint and the simulated
# window arithmetic is exact). 19 of these 45 fit round 13's 50-query
# window in registration order; the remaining 26 — still
# r11-green, nothing-older-than-r11 after this round's rotation of the
# r10 set — become round 14's top priority.
_VERIFIED_R11_ONLY = frozenset(
    """agg_pivot agg_q1 agg_sketch_hll decontaminate dedup_exact
    dedup_incremental dedup_incremental_minhash dedup_minhash
    events_paths events_pattern events_retention fn_map global_sort
    graph_pagerank graph_triangles grouping_cube grouping_rollup
    join_broadcast join_multi join_outer min_unique_prefix
    mixture_weights multimodal_neardup pipeline_clean_corpus
    pipeline_pack_sequences sample_stratified set_ops
    sim_ann_pq source_stats stream_sliding
    text_bm25 text_langid text_quality text_scrub text_stats
    text_tokens topk_per_group ts_anomaly udf_compat
    udf_compat_iterative udf_pandas_tokens unpivot_measures
    vocab_bpe_apply vocab_bpe_train win_gaps_islands""".split()
)

# Green (rows+schema+hash) in CORRECTNESS_r12.json — freshest; these
# sit out round 13's window provided their code does not change.
# (text_tfidf and dedup_substring, r12-green, are EXCLUDED because the
# round-13 window-df conversion moved them to _MODIFIED_THIS_ROUND.)
_VERIFIED_R12 = frozenset(
    """agg_histogram agg_sketch_cms agg_skew_salted dedup_containment
    dedup_embedding dedup_ngram_jaccard events_attribution events_funnel
    fill_forward fn_array fn_datetime fn_math_decimal fn_string
    fn_struct join_asof join_bloom join_inner join_q2_shape
    join_semi_anti join_skew_salted join_theta_range kmeans_lloyd
    lm_next_token multimodal_decode multimodal_dedup multimodal_frames
    multimodal_meta multimodal_resize pipeline_pretrain_corpus
    quality_classifier recursive_reachability sim_ann_ivf sim_ann_lsh
    sim_cosine_topk stream_session stream_tumbling text_chunks
    text_fingerprint text_lm_score text_repetition text_split
    ts_resample vocab_fertility vocab_pair_counts win_lag win_range
    win_rank win_running""".split()
)


def _staleness_tier(name: str) -> int:
    """0 = needs verification now … 3 = freshest verification."""
    if name in _MODIFIED_THIS_ROUND:
        return 0
    if name in _VERIFIED_R10_ONLY:
        return 1
    if name in _VERIFIED_R11_ONLY:
        return 2
    if name in _VERIFIED_R12:
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
