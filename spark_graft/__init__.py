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
#   tier 1 — hash-green last in CORRECTNESS_r02 (these three missed
#            every window since — 5 rounds stale, highest priority);
#   tier 2 — hash-green last in CORRECTNESS_r05 (2 rounds stale);
#   tier 3 — hash-green in CORRECTNESS_r06 on code unchanged since.
# Refresh these sets from CORRECTNESS_r{N}.json at the start of each
# round, and add every query touched during the round to
# _MODIFIED_THIS_ROUND.

# Queries whose implementation or oracle changed during ROUND 7 —
# tier 0, the driver must re-verify them on the new code:
# - agg_approx / agg_approx_percentile: exact yardstick now computed on
#   an md5-sampled subset (VERDICT r6 item 3)
# - dedup_embedding: per-block pairwise now chunk-capped (item 4)
# - agg_percentile: rewritten scale-safe (distinct-value running count +
#   interpolation) after the built-in percentile() OOMed the sf1 bench
# - udf_compat_iterative: driver now gallop+binary-searches the prefix
#   length (O(log answer) jobs; per-job semantics unchanged)
# - dedup_ngram_jaccard: PPJoin length filter at pair + chunk level
#   (output-preserving; sf1 scale fix)
# - decontaminate: gram join keys hashed to int64 in both engines
#   (sf1 scale fix)
# - kmeans_lloyd / sim_ann_ivf_trained: nearest-centroid assignment is
#   now an Arrow-batched numpy matmul (clustering.assignment_udf) —
#   bit-identical output, 40x faster at sf1
# - agg_q1 / grouping_rollup / grouping_cube / grouping_sets /
#   agg_pivot / unpivot_measures / join_broadcast / join_multi /
#   join_outer: dsum/davg decimal->double conversion now routes through
#   exact int64 scaled units in BOTH engines (direct CAST(decimal AS
#   DOUBLE) diverges by 1 ulp between Spark and DuckDB once the scaled
#   sum exceeds 2^53 — surfaced by agg_q1's sum_charge at sf1)
_MODIFIED_THIS_ROUND = frozenset(
    """agg_approx agg_approx_percentile agg_percentile dedup_embedding
    udf_compat_iterative dedup_ngram_jaccard decontaminate
    kmeans_lloyd sim_ann_ivf_trained
    agg_q1 grouping_rollup grouping_cube grouping_sets agg_pivot
    unpivot_measures join_broadcast join_multi join_outer""".split()
)

# Green last in CORRECTNESS_r02.json — these three have missed every
# verification window since round 2 (5 rounds stale): re-verify first.
_VERIFIED_R2_ONLY = frozenset(
    """agg_corr_exact profile_table unpivot_measures""".split()
)

# Green last in CORRECTNESS_r05.json — code unchanged through round 6,
# now 2 rounds stale.
_VERIFIED_R5_ONLY = frozenset(
    """agg_bool_all agg_distinct agg_percentile agg_pivot agg_q1
    dedup_clusters dedup_embedding dedup_simhash filter_in_null
    filter_pred fn_array fn_datetime fn_json fn_math_decimal fn_string
    global_sort grouping_cube grouping_rollup grouping_sets join_asof
    join_broadcast join_inner join_multi join_outer join_semi_anti
    join_theta_range min_unique_prefix scan_project set_ops
    sim_cosine_topk text_langid text_lines text_quality text_scrub
    text_stats text_tokens topk_per_group udf_pandas_tokens win_dist
    win_lag win_range win_rank win_running word_count""".split()
)

# Green (rows+schema+hash) in CORRECTNESS_r06.json — freshest; these
# can sit out round 7's window provided their code does not change.
_VERIFIED_R6 = frozenset(
    """agg_approx agg_approx_percentile agg_histogram agg_sketch_hll
    agg_skew_salted decontaminate dedup_exact dedup_incremental
    dedup_incremental_minhash dedup_minhash dedup_ngram_jaccard
    dedup_span_fraction events_funnel events_paths events_retention
    fill_forward fn_map fn_struct graph_pagerank graph_triangles
    join_q2_shape join_skew_salted kmeans_lloyd lm_next_token
    mixture_weights multimodal_decode multimodal_frames multimodal_meta
    pipeline_clean_corpus pipeline_pack_sequences recursive_reachability
    sample_stratified sim_ann_ivf sim_ann_ivf_trained sim_ann_lsh
    source_stats stream_session stream_sliding stream_tumbling
    text_chunks text_fingerprint text_repetition text_split text_tfidf
    ts_anomaly ts_resample udf_compat udf_compat_iterative
    vocab_pair_counts win_gaps_islands""".split()
)


def _staleness_tier(name: str) -> int:
    """0 = needs verification now … 3 = freshest verification."""
    if name in _MODIFIED_THIS_ROUND:
        return 0
    if name in _VERIFIED_R2_ONLY:
        return 1
    if name in _VERIFIED_R5_ONLY:
        return 2
    if name in _VERIFIED_R6:
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
