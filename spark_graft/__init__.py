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
#   tier 1 — hash-green last in CORRECTNESS_r08 (2 rounds stale,
#            highest priority among unmodified queries);
#   tier 2 — hash-green last in CORRECTNESS_r09 (1 round stale);
#   tier 3 — hash-green in CORRECTNESS_r10 on code unchanged since.
# Refresh these sets from CORRECTNESS_r{N}.json at the start of each
# round, and add every query touched during the round to
# _MODIFIED_THIS_ROUND.

# Queries whose implementation or oracle changed during ROUND 11 —
# tier 0, the driver must re-verify them on the new code:
# - NEW this round: multimodal_neardup (perceptual average-hash
#   near-dup over the stub decoder's pixels, VERDICT r10 item 5).
# - fn_map: oracle now path-escapes \\ and " in JSON keys before
#   splicing them into json_type/json_extract paths (ADVICE r10).
# - events_pattern: oracle pins ORDER BY ts NULLS FIRST to match
#   Spark's null-struct-field-first array_sort (ADVICE r10).
# - dedup_containment: exact-duplicate collapse — identical shingle
#   sets pair as representatives; group-internal ordered pairs emit at
#   containment 1.0 unverified (VERDICT r10 item 2).
# - vocab_bpe_apply / sim_ann_ivf_trained / sim_ann_pq: accept a
#   persisted spark_graft.artifacts model (merges/centroids/codebooks)
#   and skip training when given one; the default fused path is
#   restructured around the shared serve code (VERDICT r10 item 3).
# - graph_pagerank: pagerank() split into edges_with_degrees /
#   pagerank_round / _pagerank_rounds so the bucketed-edge-table layout
#   (save_bucketed_edges + pagerank_from_table, VERDICT r10 item 6)
#   shares the exact round join — same expressions, but the executed
#   path was restructured, so it re-enters the window.
# NOT tier-0: the kmeans-family consumers of clustering's
# _data_fingerprint — round 11 only added a defaulted table_name
# parameter (artifacts passes "documents"); every existing call site
# evaluates byte-identically, unlike r10's relpath+sort change which
# altered returned values.
_MODIFIED_THIS_ROUND = frozenset(
    """multimodal_neardup fn_map events_pattern dedup_containment
    vocab_bpe_apply sim_ann_ivf_trained sim_ann_pq graph_pagerank""".split()
)

# Green last in CORRECTNESS_r08.json — 2 rounds stale; the 25 VERDICT
# r10 item 1 names. They go first among unmodified queries in round
# 11's window: 8 tier-0 + 25 of these = 33, leaving 17 slots.
_VERIFIED_R8 = frozenset(
    """agg_pivot agg_q1 agg_sketch_hll dedup_exact dedup_incremental
    dedup_incremental_minhash dedup_minhash dedup_span_fraction
    events_paths events_retention global_sort grouping_cube
    grouping_rollup join_broadcast join_multi join_outer
    min_unique_prefix sample_stratified set_ops stream_sliding
    topk_per_group ts_anomaly udf_compat unpivot_measures
    win_gaps_islands""".split()
)

# Green last in CORRECTNESS_r09.json — 1 round stale (graph_pagerank,
# r9-green, is EXCLUDED here because the round-11 bucketed-layout
# refactor moved it to _MODIFIED_THIS_ROUND — the sets must stay
# disjoint so the simulated window arithmetic is exact). With 8
# modified/new + 25 r8-stale ahead of them, 17 of these 38 fit the
# 50-query window (simulated this round); the stable sort admits them
# in registration order and the remaining 21 become round 12's top
# priority.
_VERIFIED_R9 = frozenset(
    """agg_histogram agg_sketch_cms decontaminate dedup_clusters
    dedup_simhash fn_array fn_datetime fn_math_decimal
    fn_string fn_struct graph_triangles join_asof
    join_bloom join_inner join_q2_shape join_semi_anti join_theta_range
    mixture_weights pipeline_clean_corpus pipeline_pack_sequences
    recursive_reachability sim_ann_ivf sim_ann_lsh sim_cosine_topk
    source_stats text_bm25 text_langid text_quality text_scrub
    text_stats text_tokens udf_compat_iterative udf_pandas_tokens
    vocab_bpe_train win_lag win_range win_rank
    win_running""".split()
)

# Green (rows+schema+hash) in CORRECTNESS_r10.json — freshest; these
# can sit out round 11's window provided their code does not change.
# (fn_map, events_pattern, dedup_containment, vocab_bpe_apply,
# sim_ann_ivf_trained, and sim_ann_pq verified in r10 are EXCLUDED
# here because round-11 edits moved them to _MODIFIED_THIS_ROUND.)
_VERIFIED_R10 = frozenset(
    """agg_approx agg_approx_percentile agg_bool_all agg_corr_exact
    agg_distinct agg_percentile agg_sketch_kmv agg_skew_salted
    dedup_embedding dedup_ngram_jaccard dedup_semantic
    events_attribution events_funnel fill_forward filter_in_null
    filter_pred fn_json grouping_sets join_skew_salted kmeans_lloyd
    lm_next_token multimodal_decode multimodal_dedup multimodal_frames
    multimodal_meta profile_table sample_coreset sample_importance
    scan_project sim_hardneg sim_knn_graph stream_session
    stream_tumbling text_chunks text_fingerprint text_lines
    text_lm_score text_repetition text_split text_tfidf ts_resample
    vocab_pair_counts win_dist word_count""".split()
)


def _staleness_tier(name: str) -> int:
    """0 = needs verification now … 3 = freshest verification."""
    if name in _MODIFIED_THIS_ROUND:
        return 0
    if name in _VERIFIED_R8:
        return 1
    if name in _VERIFIED_R9:
        return 2
    if name in _VERIFIED_R10:
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
