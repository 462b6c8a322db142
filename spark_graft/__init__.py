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
#   tier 1 — hash-green last in CORRECTNESS_r05 (3 rounds stale,
#            highest priority among unmodified queries);
#   tier 2 — hash-green last in CORRECTNESS_r06 (2 rounds stale);
#   tier 3 — hash-green in CORRECTNESS_r07 on code unchanged since.
# Refresh these sets from CORRECTNESS_r{N}.json at the start of each
# round, and add every query touched during the round to
# _MODIFIED_THIS_ROUND.

# Queries whose implementation or oracle changed during ROUND 8 —
# tier 0, the driver must re-verify them on the new code:
# - dedup_embedding: REWRITTEN (VERDICT r7 item 1) — blocking key is no
#   longer the fixed `label` column (quadratic output by contract;
#   measured 12.4x per 10x data) but the cell of a TRAINED kmeans
#   quantizer with k = max(8, ceil(n/256)), so expected cell size is
#   constant and pair work/output are linear (measured 1.6x per 10x).
#   New output schema: (vec_a, vec_b, cell, cos_sim).
# - agg_q1 / grouping_rollup / grouping_cube / agg_pivot /
#   unpivot_measures / join_broadcast / join_multi / join_outer: the
#   dsum() helper these build their aggregates from gained a loud
#   overflow guard (ADVICE r7: past +-2^63 scaled units the non-ANSI
#   bigint cast silently returned NULL; it now raises) — results are
#   identical below the limit, but the Spark expression tree changed,
#   so prior verification is invalidated by the module's own rule.
#   (grouping_sets inlines its SQL and does not call the helper.)
# - agg_sketch_hll: envelope re-derived from the sketch's published rsd
#   (4 sigma at 1.04/sqrt(2^12) ~= 6.5%, absolute floor of 8 keys) and
#   the contract column renamed hll_within_envelope (VERDICT r7 item 6).
# - sim_knn_graph: NEW this round (never driver-verified) — per-vector
#   top-3 neighbors within trained quantizer cells.
# - kmeans_lloyd / sim_ann_ivf_trained: outputs unchanged, but their
#   shared trainer (clustering.lloyd_centroids) gained per-(sf_dir, k)
#   memoization and an empty-input guard — plumbing edits re-enter the
#   window under this module's own invalidation rule.
# - sim_cosine_topk / sim_ann_lsh / sim_ann_ivf: same rule — the shared
#   probe lookup gained an empty-table guard (typed empty result instead
#   of an IndexError); outputs on non-empty data unchanged.
_MODIFIED_THIS_ROUND = frozenset(
    """dedup_embedding agg_sketch_hll sim_knn_graph
    kmeans_lloyd sim_ann_ivf_trained
    sim_cosine_topk sim_ann_lsh sim_ann_ivf
    agg_q1 grouping_rollup grouping_cube agg_pivot unpivot_measures
    join_broadcast join_multi join_outer""".split()
)

# Green last in CORRECTNESS_r05.json — these four have ridden on an r5
# driver check for three rounds (code unchanged, bit-exact in the sf1
# sweep): cycle them into the r8 window first (VERDICT r7 item 3).
_VERIFIED_R5_ONLY = frozenset(
    """global_sort min_unique_prefix set_ops topk_per_group""".split()
)

# Green last in CORRECTNESS_r06.json — 2 rounds stale.
_VERIFIED_R6 = frozenset(
    """agg_histogram agg_skew_salted dedup_exact
    dedup_incremental dedup_incremental_minhash dedup_minhash
    dedup_span_fraction events_funnel events_paths events_retention
    fill_forward fn_map fn_struct graph_pagerank graph_triangles
    join_q2_shape join_skew_salted lm_next_token mixture_weights
    multimodal_decode multimodal_frames multimodal_meta
    pipeline_clean_corpus pipeline_pack_sequences recursive_reachability
    sample_stratified source_stats
    stream_session stream_sliding stream_tumbling text_chunks
    text_fingerprint text_repetition text_split text_tfidf ts_anomaly
    ts_resample udf_compat vocab_pair_counts win_gaps_islands""".split()
)

# Green (rows+schema+hash) in CORRECTNESS_r07.json — freshest; these
# can sit out round 8's window provided their code does not change.
_VERIFIED_R7 = frozenset(
    """agg_approx agg_approx_percentile agg_bool_all agg_corr_exact
    agg_distinct agg_percentile decontaminate dedup_clusters
    dedup_ngram_jaccard dedup_simhash filter_in_null filter_pred
    fn_array fn_datetime fn_json fn_math_decimal fn_string
    grouping_sets join_asof join_inner join_semi_anti join_theta_range
    profile_table scan_project
    text_langid text_lines text_quality text_scrub
    text_stats text_tokens udf_compat_iterative udf_pandas_tokens
    win_dist win_lag win_range win_rank win_running word_count""".split()
)


def _staleness_tier(name: str) -> int:
    """0 = needs verification now … 3 = freshest verification."""
    if name in _MODIFIED_THIS_ROUND:
        return 0
    if name in _VERIFIED_R5_ONLY:
        return 1
    if name in _VERIFIED_R6:
        return 2
    if name in _VERIFIED_R7:
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
