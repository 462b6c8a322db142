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
#   tier 0 — never driver-verified, or modified this round (ADVICE r02:
#            an edit to a query fn or its oracle invalidates prior
#            verification, so edited queries must re-enter the window);
#   tier 1 — hash-green in CORRECTNESS_r01 only (verified on OLDER
#            code — re-verify on current code);
#   tier 2 — hash-green in CORRECTNESS_r02 (current code as of round-3
#            start);
#   tier 3 — oracle=None rows-only queries (the driver can never
#            hash-check these; they'd burn window slots for a weaker
#            signal covered by pytest).
# Refresh _VERIFIED_R2 / _VERIFIED_R1_ONLY from CORRECTNESS_r{N}.json
# at the start of each round, and add every query touched during the
# round to _MODIFIED_THIS_ROUND.

# Green (rows+schema+hash) rows in CORRECTNESS_r02.json — verified on
# the code this round starts from.
_VERIFIED_R2 = frozenset(
    """agg_corr_exact agg_histogram agg_skew_salted decontaminate
    dedup_incremental dedup_span_fraction events_funnel events_paths
    events_retention fill_forward fn_map fn_struct graph_pagerank
    graph_triangles join_q2_shape join_skew_salted kmeans_lloyd lm_next_token
    mixture_weights multimodal_decode multimodal_frames multimodal_meta
    pipeline_clean_corpus pipeline_pack_sequences profile_table
    recursive_reachability sample_stratified sim_ann_ivf_trained source_stats
    stream_session stream_sliding stream_tumbling text_chunks text_fingerprint
    text_quality text_repetition text_scrub text_split text_stats text_tfidf
    text_tokens ts_anomaly ts_resample udf_compat udf_compat_iterative
    udf_pandas_tokens unpivot_measures vocab_pair_counts win_gaps_islands""".split()
)

# Green in CORRECTNESS_r01.json but NOT re-verified since (rotated out
# of the r02 window); their round-1 verification predates the current
# code, so they take priority over _VERIFIED_R2.
_VERIFIED_R1_ONLY = frozenset(
    """scan_project text_lines filter_pred filter_in_null agg_q1 agg_distinct
    agg_bool_all agg_percentile agg_pivot grouping_rollup grouping_cube
    grouping_sets word_count min_unique_prefix join_inner join_broadcast
    join_multi join_semi_anti join_outer join_theta_range join_asof win_rank
    win_running win_lag win_range win_dist global_sort topk_per_group set_ops
    dedup_exact dedup_minhash dedup_clusters dedup_simhash dedup_ngram_jaccard
    dedup_embedding fn_string fn_datetime fn_math_decimal fn_json fn_array
    sim_cosine_topk text_langid""".split()
)

# Queries whose implementation or oracle changed during ROUND 3 —
# demoted to tier 0 so the driver re-verifies them on the new code.
_MODIFIED_THIS_ROUND = frozenset(
    """dedup_minhash dedup_ngram_jaccard agg_histogram
    recursive_reachability""".split()
)


def _staleness_tier(name: str) -> int:
    """0 = needs verification now … 3 = can never be hash-verified."""
    if REGISTRY[name].oracle is None:
        return 3
    if name in _MODIFIED_THIS_ROUND:
        return 0
    if name in _VERIFIED_R2:
        return 2
    if name in _VERIFIED_R1_ONLY:
        return 1
    return 0


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
