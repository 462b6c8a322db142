"""Physical-plan assertions: the properties that make these queries
scale are pinned here, so a regression (lost pushdown, lost broadcast,
a full sort sneaking in) fails CI instead of melting a cluster."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_graft.plans import assert_in_plan, explain_str, has_broadcast_join
from spark_graft.registry import REGISTRY
from spark_graft.sources import table


def q(name, spark, sf_dir):
    return REGISTRY[name].fn(spark, sf_dir)


def test_scan_project_prunes_columns(spark, sf_dir):
    """Column pruning must reach the parquet scan: ReadSchema lists only
    the 3 projected columns (of lineitem's 11)."""
    plan = explain_str(q("scan_project", spark, sf_dir))
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema and "l_shipdate" not in read_schema


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = explain_str(q("filter_pred", spark, sf_dir))
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "GreaterThan(l_quantity" in pushed
    assert "GreaterThanOrEqual(l_discount" in pushed


def test_broadcast_join_is_broadcast(spark, sf_dir):
    assert has_broadcast_join(q("join_broadcast", spark, sf_dir))


def test_multi_join_broadcasts_dims(spark, sf_dir):
    """region/nation sides must be broadcast, not shuffled."""
    plan = explain_str(q("join_multi", spark, sf_dir), "simple")
    assert plan.count("BroadcastHashJoin") >= 2


def test_global_sort_is_topk_not_full_sort(spark, sf_dir):
    """orderBy().limit() must plan as TakeOrderedAndProject — a full
    global Sort+Exchange on 100 TB for a LIMIT 100 is the classic
    scale-killer."""
    assert_in_plan(q("global_sort", spark, sf_dir), "TakeOrderedAndProject", mode="simple")


def test_agg_has_partial_aggregation(spark, sf_dir):
    """Map-side combine (the combiner the reference lacks): two
    HashAggregate levels around the exchange."""
    plan = explain_str(q("agg_q1", spark, sf_dir), "simple")
    assert plan.count("HashAggregate") >= 2
    assert "partial_" in plan


def test_wordcount_wholestage_codegen(spark, sf_dir):
    """The tokenize-explode-count hot path stays inside whole-stage
    codegen (no Python boundary)."""
    from spark_graft.plans import executed_plan_str

    plan = executed_plan_str(q("word_count", spark, sf_dir))
    assert "*(" in plan  # whole-stage codegen stage markers
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sql_only_queries_have_no_python_udfs(spark, sf_dir):
    """Everything except the declared UDF/pandas operators must stay
    JVM-side — Python in the hot path is the #1 silent 100x slowdown.
    kmeans_lloyd / sim_ann_ivf_trained are allowed ON PURPOSE: their
    nearest-centroid assignment is an Arrow-batched numpy matmul
    (clustering.assignment_udf), which measured 40x faster at sf1 than
    the same k x dim arithmetic as a Catalyst expression tree (the tree
    exceeds codegen limits and falls back to interpreted eval)."""
    allowed_python = {
        "udf_pandas_tokens",
        "multimodal_decode",
        "udf_compat",
        "kmeans_lloyd",
        "sim_ann_ivf_trained",
        # r8: block by the trained quantizer's cell, so their plans carry
        # the same Arrow-batched assignment matmul as the two above (plus
        # their applyInPandas pairwise stages)
        "dedup_embedding",
        "sim_knn_graph",
        "dedup_semantic",
        # r9: same trained-cell staging + applyInPandas pair math
        "sim_hardneg",
        # r9: same Arrow-batched assignment kernel (no pair stage)
        "sample_coreset",
        # r10: PQ training is one mapInPandas stats pass; serving is an
        # Arrow UDF doing 8 int codebook lookups/row (see sim_ann_pq
        # docstring — the codebook matmul exceeds codegen limits as a
        # Catalyst tree, same rationale as kmeans_lloyd)
        "sim_ann_pq",
        # r16: same trained-cell staging + applyInPandas bipartite
        # train-vs-eval pair math as dedup_embedding
        "decontaminate_semantic",
    }
    for name, spec in REGISTRY.items():
        if name in allowed_python:
            continue
        plan = explain_str(spec.fn(spark, sf_dir), "simple")
        assert "EvalPython" not in plan, f"{name} runs Python in the plan"


def test_topk_per_group_uses_window_group_limit(spark, sf_dir):
    """rank<=k filter should plan WindowGroupLimit (partial top-k before
    the shuffle) on Spark 3.5+."""
    plan = explain_str(q("topk_per_group", spark, sf_dir), "simple")
    assert "WindowGroupLimit" in plan


def test_kmv_bottom_k_plans_partial_window_group_limit(spark, sf_dir):
    """agg_sketch_kmv's bottom-k stage must plan a PARTIAL
    WindowGroupLimit before the per-priority exchange — the map-side
    eviction that makes the KMV sketch mergeable (each map task ships
    at most K rows per set, however large the distinct-hash stream).
    Asserted on the SHIPPED pre-checkpoint fragment (the query fn
    materializes it so the 7 output rows reuse one <=5K-row sketch
    instead of 7 scans) — kmv_bottom_k is the same function the query
    calls, so this cannot go stale against the production plan."""
    from spark_graft.operators.relational import kmv_bottom_k

    plan = explain_str(kmv_bottom_k(spark, sf_dir), "simple")
    assert "WindowGroupLimit" in plan and "Partial" in plan


def test_semi_anti_plan_shapes(spark, sf_dir):
    plan = explain_str(q("join_semi_anti", spark, sf_dir), "simple")
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_asof_join_has_no_join_operator(spark, sf_dir):
    """join_asof must stay the union+window plan — a single shuffle on
    user_id, never a physical join (the naive range-join shape)."""
    df = REGISTRY["join_asof"].fn(spark, sf_dir)
    plan = explain_str(df, "formatted")
    assert "Window" in plan
    for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin", "NestedLoop"):
        assert j not in plan, f"unexpected {j} in as-of plan:\n{plan}"


def test_theta_range_joins_on_time_bucket(spark, sf_dir):
    """The interval self-join's equi key must include the hour bucket —
    that composite key is what bounds per-match comparisons."""
    df = REGISTRY["join_theta_range"].fn(spark, sf_dir)
    plan = explain_str(df, "formatted")
    assert "bkt" in plan and ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan)


def test_dedup_queries_never_cross_product(spark, sf_dir):
    """Every dedup variant must reduce pair discovery to equi-join /
    bucket-aggregate shapes — a nested-loop or cartesian node means an
    O(n^2) cross product snuck in."""
    for name in ("dedup_exact", "dedup_minhash", "dedup_ngram_jaccard",
                 "dedup_simhash", "dedup_embedding", "dedup_semantic",
                 "sim_knn_graph", "sim_hardneg", "dedup_paragraph",
                 "decontaminate_semantic"):
        plan = explain_str(REGISTRY[name].fn(spark, sf_dir), "formatted")
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_ngram_jaccard_freq_join_not_hint_broadcast(spark, sf_dir):
    """The shingle-frequency join must not carry a hard broadcast HINT:
    distinct shingles grow with the corpus, so a hint is a scale
    ceiling. The optimized logical plan must contain no broadcast hint
    resolution (AQE may still choose a runtime broadcast from measured
    size — that's the scalable behavior)."""
    df = REGISTRY["dedup_ngram_jaccard"].fn(spark, sf_dir)
    logical = df._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in logical, logical


def test_dedup_clusters_stays_distributed(spark, sf_dir):
    """dedup_clusters must never funnel the label table through the
    driver: no full-result collect(), no Counter, no createDataFrame in
    the query path (the round-scalar convergence aggregate is the one
    permitted driver value). Pinned at the source level because the
    final frame is localCheckpoint-backed (its physical plan is an RDD
    scan either way, so plan text can't distinguish driver round-trips)."""
    import inspect

    from spark_graft.operators import dedup

    src = inspect.getsource(dedup.dedup_clusters)
    assert ".collect()" not in src, src
    assert "createDataFrame" not in src, src
    cc = inspect.getsource(dedup.connected_components)
    # the only collects in the CC loop are single-row scalar aggregates
    for line in cc.splitlines():
        if ".collect()" in line:
            assert "agg(" in line, f"non-scalar collect in connected_components: {line}"


def test_full_sort_is_range_partitioned(spark, sf_dir):
    """A no-limit global orderBy must plan a rangepartitioning Exchange
    (sampled boundaries, parallel sort) — the built-in equivalent of the
    reference's k-way ExternalMergeSort — not a single partition."""
    from spark_graft.sources import table

    df = table(spark, sf_dir, "lineitem").orderBy("l_extendedprice", "l_orderkey")
    plan = explain_str(df, "formatted")
    assert "rangepartitioning" in plan, plan
    assert "SinglePartition" not in plan, plan


def test_win_dist_avoids_single_partition_window(spark, sf_dir):
    """The distribution-function query must use the bucketed two-pass
    rank — a SinglePartition window would bottleneck one task."""
    df = REGISTRY["win_dist"].fn(spark, sf_dir)
    plan = explain_str(df, "formatted")
    assert "SinglePartition" not in plan, plan


def test_pipeline_clean_corpus_single_shuffle(spark, sf_dir):
    """The composed corpus pipeline must fuse to ONE shuffle (the dedup
    window on the 16-byte fingerprint) — every other stage is a narrow
    expression Catalyst folds into the scan pass. A second Exchange
    means a stage broke fusion and the pipeline re-shuffles documents."""
    df = q("pipeline_clean_corpus", spark, sf_dir)
    physical = df._jdf.queryExecution().executedPlan().toString()
    n_exchanges = sum(
        1 for line in physical.splitlines() if "Exchange" in line and "Reused" not in line
    )
    assert n_exchanges == 1, physical


def test_sample_stratified_is_shuffle_free_and_pushes_scan(spark, sf_dir):
    """Stratified sampling is a pure narrow filter: zero Exchanges, and
    column pruning reaches the parquet scan."""
    df = q("sample_stratified", spark, sf_dir)
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in physical, physical
    plan = explain_str(df)
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "c_name" not in read_schema and "c_custkey" in read_schema


def test_decontaminate_no_hint_and_pushdown(spark, sf_dir):
    """decontaminate: the eval-gram side must not carry a broadcast HINT
    (in-corpus eval split is unbounded; AQE may still promote at
    runtime), the eval/train doc_id predicates must push to the scans,
    and pair matching must stay an equi-join."""
    df = q("decontaminate", spark, sf_dir)
    logical = df._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in logical, logical
    plan = explain_str(df, "formatted")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "PushedFilters: [IsNotNull(doc_id)]" in plan


def _window_partition_keys(df):
    """Partition-key column names of every Window node in the optimized
    plan (the window-df scale-killer detector: a count window partitioned
    on a power-law key gets no partial aggregation and no AQE skew split,
    so the hottest key's whole row set lands in ONE task)."""
    import re

    logical = df._jdf.queryExecution().optimizedPlan().toString()
    keys = set()
    for line in logical.splitlines():
        if "windowspecdefinition(" not in line:
            continue
        inner = line.split("windowspecdefinition(", 1)[1]
        # args are: partition cols, then sort orders (`x#1 ASC|DESC ...`),
        # then the frame — partition keys are the refs BEFORE the first
        # sort-order token
        for part in inner.split("specifiedwindowframe")[0].split(","):
            if " ASC" in part or " DESC" in part:
                break
            m = re.search(r"(\w+)#\d+", part)
            if m:
                keys.add(m.group(1))
    return keys


def test_text_tfidf_topk_is_window_group_limit_and_df_is_partial_agg(spark, sf_dir):
    """text_tfidf's per-doc top-k must plan as WindowGroupLimit (rank
    filter pushed into the window's map side); document frequency must
    come from a partial-aggregated groupBy(term) joined back — NOT a
    count window over term, whose hottest key (a stopword, df ~ n_docs)
    would serialize into one task at 100 TB."""
    df = q("text_tfidf", spark, sf_dir)
    plan = explain_str(df, "formatted")
    assert "WindowGroupLimit" in plan, plan
    assert "term" not in _window_partition_keys(df), plan
    # the df aggregate must partial-combine map-side
    assert plan.count("HashAggregate") >= 4, plan  # tf (2 levels) + df (2 levels)
    assert "partial_count" in plan, plan


def test_span_df_queries_have_no_window_over_span_key(spark, sf_dir):
    """dedup_span_fraction / dedup_substring: span doc-frequency must be
    the partial-agg groupBy(g) + join form — no count window partitioned
    on the span key (a boilerplate block shared by half the corpus is a
    power-law-hot span; WindowExec would shuffle all of it to one task)."""
    for name in ("dedup_span_fraction", "dedup_substring"):
        df = q(name, spark, sf_dir)
        keys = _window_partition_keys(df)
        assert "g" not in keys, (name, keys)
        plan = explain_str(df, "formatted")
        assert "partial_count" in plan, (name, plan)


def test_simhash_and_clusters_population_not_window(spark, sf_dir):
    """dedup_simhash's bucket population and dedup_clusters' member count
    must come from groupBy+join, not a count window over sig/label (the
    r12 watch items: a degenerate all-dup corpus / mega-cluster would
    serialize one task)."""
    df = q("dedup_simhash", spark, sf_dir)
    assert "simhash" not in _window_partition_keys(df)
    assert has_broadcast_join(df)  # <=65536-row population table
    dc = q("dedup_clusters", spark, sf_dir)
    assert "label" not in _window_partition_keys(dc)


def test_kmeans_assignment_is_narrow(spark, sf_dir):
    """kmeans_lloyd's returned assignment plan: centroids ride in the
    UDF closure, so the plan must contain NO join and NO shuffle — one
    narrow Arrow-batched map over the raw vectors (the per-round update
    aggregates run eagerly inside the loop; this pins the assignment
    shape)."""
    df = q("kmeans_lloyd", spark, sf_dir)
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in physical, physical
    assert "Exchange" not in physical, physical
    assert "ArrowEvalPython" in physical, physical  # vectorized, not row-wise


def test_graph_pagerank_stays_distributed(spark, sf_dir):
    """graph_pagerank's loop: only scalar/count driver traffic (the
    node count), ranks localCheckpoint'ed per round, edge+degree table
    persisted once. Source-pinned like dedup_clusters because the
    returned frame is checkpoint-backed."""
    import inspect

    from spark_graft.operators import graph

    for fn in (graph.graph_pagerank, graph.pagerank, graph._pagerank_rounds):
        assert ".collect()" not in inspect.getsource(fn), fn.__name__
    # the round loop (r11: split into _pagerank_rounds so the bucketed
    # layout shares it) checkpoints per round; pagerank owns the cache
    assert "localCheckpoint" in inspect.getsource(graph._pagerank_rounds)
    assert ".persist()" in inspect.getsource(graph.pagerank)


def test_text_chunks_is_shuffle_free(spark, sf_dir):
    """Chunking must pipeline into the scan: tokenize, start-index
    generation, and per-chunk slice/hash are all narrow — an Exchange
    here means chunking stopped being free at scale."""
    df = q("text_chunks", spark, sf_dir)
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in physical, physical


def test_vocab_pair_counts_partial_agg_then_topk(spark, sf_dir):
    """BPE pair counting: the shuffle must carry per-task partial counts
    (HashAggregate below the Exchange), and the top-k must be
    TakeOrderedAndProject, never a global Sort."""
    plan = explain_str(q("vocab_pair_counts", spark, sf_dir), "formatted")
    assert "TakeOrderedAndProject" in plan, plan
    assert "Sort " not in plan.replace("TakeOrderedAndProject", ""), plan
    exchange_at = plan.index("Exchange")
    assert "HashAggregate" in plan[exchange_at:], plan


def test_join_skew_salted_is_sort_merge(spark, sf_dir):
    """The salted join demonstrates the shuffle being spread: the merge
    hint must hold (a broadcast would bypass it), and the dim side must
    carry the salt-replicating Generate."""
    plan = explain_str(q("join_skew_salted", spark, sf_dir), "formatted")
    assert "SortMergeJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan
    assert "Generate" in plan, plan


def test_lm_next_token_uses_window_group_limit(spark, sf_dir):
    """Per-head top-k must be WindowGroupLimit (rank pushed into the
    window sort) — without it every head's full next-token distribution
    materializes before the filter."""
    plan = explain_str(q("lm_next_token", spark, sf_dir), "formatted")
    assert "WindowGroupLimit" in plan, plan


def test_graph_triangles_all_joins_are_equi(spark, sf_dir):
    """Degree-oriented triangle counting must stay equi-join shaped:
    the orientation inequality lives in wedge-join residual conditions,
    never as a nested-loop or cartesian plan."""
    plan = explain_str(q("graph_triangles", spark, sf_dir), "formatted")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_fill_forward_single_exchange(spark, sf_dir):
    """LOCF is one user-keyed window: a second Exchange would mean the
    as-of-join shape crept back in."""
    df = q("fill_forward", spark, sf_dir)
    physical = df._jdf.queryExecution().executedPlan().toString()
    n = sum(1 for l in physical.splitlines() if "Exchange" in l and "Reused" not in l)
    assert n == 1, physical


def test_unpivot_single_scan_single_exchange(spark, sf_dir):
    """The melt must be one Expand over ONE scan (the oracle's UNION ALL
    form re-scans per measure) and one aggregate exchange."""
    df = q("unpivot_measures", spark, sf_dir)
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert physical.count("Scan parquet") == 1, physical
    n = sum(1 for l in physical.splitlines() if "Exchange" in l and "Reused" not in l)
    assert n == 1, physical


def test_aqe_splits_skewed_join_at_runtime(spark):
    """The runtime half of the skew story (join_skew_salted is the
    static half): a hot key whose shuffle partition dwarfs the median
    must be split by AQE's skew-join optimization — the final adaptive
    plan marks the join skew=true. Thresholds are lowered so the local
    fixture trips the same code path a 100 TB hot key would."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        big = spark.range(240_000).select(
            F.when(F.col("id") < 200_000, F.lit(7))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            (F.col("id") * 2).alias("payload"),
        )
        small = spark.range(1000).select(F.col("id").alias("k"), F.lit("x").alias("tag"))
        j = big.join(small, "k").select(F.sum("payload").alias("s"))
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
        assert "skewed" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_runtime_bloom_filter_injects_on_selective_join(spark, sf_dir):
    """Runtime row-level filtering: a selective dimension predicate must
    make the optimizer inject a bloom filter on the fact side
    (bloom_filter_agg on the dim, might_contain on the probe) — the
    scan-size threshold is lowered because the default 10 GB gate is a
    cluster-scale setting the local fixture cannot meet."""
    saved = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    saved_b = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = table(spark, sf_dir, "lineitem")
        pt = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
        j = li.join(pt, li.l_partkey == pt.p_partkey).groupBy("p_brand").count()
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan, plan
        assert "might_contain" in plan, plan
    finally:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            saved,
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved_b)


def test_source_stats_single_scan(spark, sf_dir):
    """The scorecard's one-pass claim: a single documents scan feeds
    the mixed distinct/plain aggregate."""
    df = q("source_stats", spark, sf_dir)
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert physical.count("Scan parquet") == 1, physical


def test_gaps_islands_single_exchange(spark, sf_dir):
    """Distinct days, the island window, and both aggregates must all
    ride one user_id partitioning."""
    df = q("win_gaps_islands", spark, sf_dir)
    physical = df._jdf.queryExecution().executedPlan().toString()
    n = sum(1 for l in physical.splitlines() if "Exchange" in l and "Reused" not in l)
    assert n == 1, physical


def test_corr_exact_is_one_aggregate_pass(spark, sf_dir):
    """All six accumulators must ride one partial-then-final aggregate:
    one scan, one Exchange."""
    df = q("agg_corr_exact", spark, sf_dir)
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert physical.count("Scan parquet") == 1, physical
    n = sum(1 for l in physical.splitlines() if "Exchange" in l and "Reused" not in l)
    assert n == 1, physical


def test_incremental_minhash_never_cross_product(spark, sf_dir):
    """The incremental near-dup gate must stay equi-join shaped: band
    probes against the index and the in-batch lower-id self-join are
    (band, sig) hash joins, the verify is a keyed join, the accept is an
    anti-join — no cartesian/nested-loop anywhere."""
    plan = explain_str(REGISTRY["dedup_incremental_minhash"].fn(spark, sf_dir), "formatted")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftAnti" in plan


def test_sim_ann_candidate_filter_is_narrow(spark, sf_dir):
    """Both ANN serving paths must select candidates with a narrow
    bucket/cluster filter (map-side, partition-prunable at scale) and
    finish with TakeOrderedAndProject — never a global sort of scored
    vectors or a join against the corpus."""
    for name in ("sim_ann_lsh", "sim_ann_ivf"):
        plan = explain_str(REGISTRY[name].fn(spark, sf_dir), "formatted")
        assert "TakeOrderedAndProject" in plan, name
        assert "CartesianProduct" not in plan, name
        assert "SortMergeJoin" not in plan, name


def test_sketch_queries_single_scan(spark, sf_dir):
    """The keys+bounds sketch queries compute the estimate AND its exact
    yardstick in one pass: exactly one parquet scan of the fact table —
    a second scan would double the 100 TB read for a verification
    column."""
    for name in ("agg_approx", "agg_approx_percentile"):
        # simple mode prints each scan node exactly once (formatted
        # repeats it in the details section)
        plan = explain_str(REGISTRY[name].fn(spark, sf_dir), "simple")
        scans = plan.count("Scan parquet")
        assert scans == 1, f"{name}: {scans} scans\n{plan}"


def test_join_bloom_prunes_before_shuffle_join(spark, sf_dir):
    """The bloom bit-tests must be a plain Filter over the lineitem scan
    (codegen'd, before the join exchange), the dims broadcast, and no
    cartesian anywhere. The residual join stays an equi-join."""
    plan = explain_str(q("join_bloom", spark, sf_dir), "formatted")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the k=3 xxhash64 bit-tests are a Filter on the fact side
    assert plan.count("xxhash64") >= 3
    assert "BroadcastHashJoin" in plan  # nation/region dims


def test_agg_sketch_cms_grid_is_bounded_and_broadcast_probed(spark, sf_dir):
    """The probe join against the 4x256 cell grid must be broadcast
    (the grid is fixed-size by construction), probe selection must be
    TakeOrderedAndProject (no SinglePartition window), and nothing may
    cross-product."""
    plan = explain_str(q("agg_sketch_cms", spark, sf_dir), "formatted")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert has_broadcast_join(q("agg_sketch_cms", spark, sf_dir))


def test_text_bm25_topk_and_broadcast_qterms(spark, sf_dir):
    """Final top-10 must be TakeOrderedAndProject (never a global sort
    of all scored docs), the 3-row query-term side must broadcast, and
    scoring must stay in whole-stage codegen (no Python UDFs)."""
    df = q("text_bm25", spark, sf_dir)
    plan = explain_str(df, "formatted")
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan
    assert has_broadcast_join(df)


def test_sample_coreset_per_cell_top1_is_group_limited(spark, sf_dir):
    """The per-cell representative pick must plan WindowGroupLimit
    (partial top-1 before the shuffle — the exchange carries at most one
    candidate per cell per task, never cell memberships), and nothing
    may cross-product."""
    plan = explain_str(REGISTRY["sample_coreset"].fn(spark, sf_dir), "formatted")
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pagerank_bucketed_edge_table_round_join_never_reshuffles_edges(spark, sf_dir):
    """graph_pagerank's 100 TB claim made measured fact (VERDICT r10
    item 6): with the degree-joined edge table persisted bucketBy(src),
    a pagerank round join reads the edge side straight off the bucketed
    scan — the ONLY Exchanges in the round are the tiny ranks side
    moving to the bucket layout and the groupBy(dst) aggregate; the
    SAME round over the SAME data stored unbucketed needs one more
    (the edge side re-shuffles every round). Also: the full bucketed-
    table run is bit-identical to the cached-lineage `pagerank`."""
    from spark_graft.operators.dedup import dedup_minhash
    from spark_graft.operators.graph import (
        UNIT,
        DAMP_DEN,
        DAMP_NUM,
        pagerank,
        pagerank_from_table,
        pagerank_round,
        save_bucketed_edges,
    )
    from spark_graft.operators.graph import edges_with_degrees

    pairs = dedup_minhash(spark, sf_dir).select("doc_a", "doc_b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        from spark_graft.operators.graph import clear_stale_table

        save_bucketed_edges(spark, pairs, "pr_edges_bucketed_t")
        clear_stale_table(spark, "pr_edges_flat_t")
        edges_with_degrees(pairs).write.format("parquet").mode(
            "overwrite"
        ).saveAsTable("pr_edges_flat_t")

        def round_exchanges(table_name):
            ed = spark.table(table_name)
            n = ed.select("src").distinct().count()
            init = UNIT // n
            ranks = ed.select(F.col("src").alias("id")).distinct().select(
                "id", F.lit(init).alias("r")
            ).localCheckpoint()
            rnd = pagerank_round(
                ed, ranks, ((DAMP_DEN - DAMP_NUM) * init) // DAMP_DEN
            )
            physical = rnd._jdf.queryExecution().executedPlan().toString()
            return sum(
                1
                for line in physical.splitlines()
                if "Exchange" in line and "Reused" not in line
            ), explain_str(rnd, "formatted")

        n_bucketed, plan_b = round_exchanges("pr_edges_bucketed_t")
        n_flat, plan_f = round_exchanges("pr_edges_flat_t")
        # bucketed: ranks-to-buckets + aggregate; flat: + edge shuffle
        assert n_bucketed == 2, plan_b
        assert n_flat == 3, plan_f
        # the round join's edge side really is the bucketed scan (the
        # marker only appears when bucketing is exploited by the join)
        assert "Bucketed: true" in plan_b, plan_b
        assert "Bucketed: true" not in plan_f, plan_f
        got = sorted(
            map(tuple, pagerank_from_table(spark, "pr_edges_bucketed_t").collect())
        )
        want = sorted(map(tuple, pagerank(spark, pairs).collect()))
        assert got == want and len(got) > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS pr_edges_bucketed_t")
        spark.sql("DROP TABLE IF EXISTS pr_edges_flat_t")


def test_pretrain_pipeline_plan_is_fused(spark, sf_dir):
    """pipeline_pretrain_corpus composes six stages; the plan contract
    (VERDICT r11 item 7) is that composition does NOT multiply wide
    work: the post-staging plan holds exactly the three declared wide
    ops — the decontamination gram join, the flagged-doc distinct, and
    the per-shard pack window — with the two gate joins broadcast, no
    cartesian product, and no SinglePartition window. The quality/
    langid/exact-dedup/minhash stages run once each into the two
    lineage-cut staging sets (s1/s2 localCheckpoints, the persisted
    staging tables of a production run), so no stage's subtree appears
    twice (pre-fix the executed plan duplicated the whole fp-window +
    minhash chain per consumer: 31 exchanges vs 5)."""
    from spark_graft.registry import REGISTRY

    df = REGISTRY["pipeline_pretrain_corpus"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = [l for l in plan.splitlines() if "Exchange" in l and "Reused" not in l]
    shuffles = [l for l in lines if "BroadcastExchange" not in l]
    assert len(shuffles) == 3, plan
    keys = "".join(shuffles)
    assert "hashpartitioning(g#" in keys, plan  # gram join
    assert "hashpartitioning(doc_id#" in keys, plan  # flagged distinct
    assert "hashpartitioning(shard#" in keys, plan  # pack window
    assert len(lines) - len(shuffles) == 2, plan  # both gates broadcast
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan
    # and the composition is not vacuous at test scale
    assert 0 < df.count() < 500


def test_profile_skew_plan_shape(spark, sf_dir):
    """profile_skew: the key profile must partial-aggregate map-side,
    the top-k must be TakeOrderedAndProject (never a full global sort),
    and the 1-row stats side must broadcast — the profiler must itself
    be immune to the skew it measures."""
    df = q("profile_skew", spark, sf_dir)
    plan = explain_str(df, "formatted")
    assert "partial_count" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    # the 1-row stats side rides a BroadcastNestedLoopJoin (a broadcast
    # cross of one row — the profile_table pattern), never a cartesian
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan


def _exchange_input_cols(df):
    """The Input column list of every Exchange node in the formatted
    plan. The one-line plan string prints only an Exchange's
    PARTITIONING expressions — never the payload it shuffles — so a
    'col# not in <Exchange line>' assertion is vacuous (code-review
    r13, verified empirically); the formatted explain's per-node
    `Input [n]: [...]` is what actually lists the shuffled columns."""
    import re

    blocks = re.split(r"\n\(\d+\) ", explain_str(df, "formatted"))
    out = []
    for b in blocks:
        if b.startswith("Exchange"):
            m = re.search(r"Input \[\d+\]: \[(.*?)\]", b)
            out.append(m.group(1) if m else "")
    return out


def test_exchange_input_detector_sees_shuffled_payload(spark, sf_dir):
    """Negative control for _exchange_input_cols: a repartition that
    genuinely shuffles the embedding vectors must be detected."""
    df = (
        table(spark, sf_dir, "embeddings")
        .repartition("vec_id")
        .select("vec_id", "embedding")
    )
    cols = _exchange_input_cols(df)
    assert cols and any("embedding#" in c for c in cols), cols


def test_embed_index_pipeline_plan(spark, sf_dir):
    """pipeline_embed_index's scale contract: after the two staged
    assets (the survivor keep set and the postings table — the things a
    real run persists), the served plan is pure relational work: ZERO
    Python stages (the Arrow assignment ran once into the postings
    stage; without that stage its subtree executed once per consumer),
    no cartesian product, and NO Exchange ever carries the embedding
    vectors — index stats and rescore both reduce before any shuffle,
    so only ids/cells/scalars move."""
    df = q("pipeline_embed_index", spark, sf_dir)
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in physical and "EvalPython" not in physical, physical
    assert "CartesianProduct" not in physical, physical
    for cols in _exchange_input_cols(df):
        assert "embedding#" not in cols, cols
    assert 0 < df.count() <= 10


def test_media_pipeline_single_decode_pass(spark, sf_dir):
    """pipeline_media_corpus's plan contract (VERDICT r12 missing-item
    2): the four media stages share ONE decode pass. The staging stage
    (media_decode_stage) must hold exactly one parquet scan and exactly
    one Arrow Python stage; the composed query runs everything after
    the staging checkpoint as pure relational work — zero parquet scans
    and zero Python nodes in its executed plan, and no cartesian
    product anywhere."""
    from spark_graft.operators.multimodal import media_decode_stage
    from spark_graft.registry import REGISTRY
    from spark_graft.sources import table as load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    stage_plan = media_decode_stage(docs)._jdf.queryExecution().executedPlan().toString()
    assert stage_plan.count("Scan parquet") == 1, stage_plan
    assert stage_plan.count("MapInPandas") == 1, stage_plan

    df = REGISTRY["pipeline_media_corpus"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" not in plan, plan  # payloads read once, upstream
    assert "MapInPandas" not in plan and "EvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    # no shuffle ever carries the payload: every Exchange's Input list
    # holds metadata columns only (`text` never leaves the decode
    # stage — the decoded staging schema simply has no payload column,
    # and this pins that it stays that way)
    for cols in _exchange_input_cols(df):
        assert "text#" not in cols, cols
    # composition not vacuous: survivors exist and some collapsing happened
    assert df.count() > 0


def test_save_bucketed_edges_recovers_from_orphaned_location(spark, sf_dir):
    """An interrupted run leaves the table directory on disk with no
    catalog entry; a later `saveAsTable` then dies with
    LOCATION_ALREADY_EXISTS (VERDICT r11 item 1). `save_bucketed_edges`
    must clear both catalog and orphan location, succeed twice in a
    row, and produce a readable table each time."""
    import os
    from urllib.parse import urlparse

    from spark_graft.operators.graph import (
        pagerank_from_table,
        save_bucketed_edges,
    )

    table = "pr_edges_orphan_t"
    warehouse = urlparse(
        spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    ).path
    location = os.path.join(warehouse, table)
    try:
        # simulate the interrupt: directory present, catalog empty
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        os.makedirs(os.path.join(location, "stale-subdir"), exist_ok=True)
        with open(os.path.join(location, "part-stale.parquet"), "w") as f:
            f.write("not parquet")

        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 1)], "doc_a bigint, doc_b bigint"
        )
        for _ in range(2):  # twice in a row: overwrite path is also clean
            save_bucketed_edges(spark, pairs, table)
            got = pagerank_from_table(spark, table).collect()
            assert len(got) == 3
        assert not os.path.exists(os.path.join(location, "part-stale.parquet"))
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_clear_stale_table_never_deletes_external_data(spark, tmp_path):
    """clear_stale_table's rmtree targets ONLY orphaned directories
    (ADVICE r12): when the name is cataloged as an EXTERNAL table, the
    DROP must leave the external data untouched, and a same-named
    directory in the warehouse — which belongs to whatever put it
    there, not to this table — must survive too."""
    import os

    from spark_graft.operators.graph import clear_stale_table

    name = "ext_guard_t"
    ext_loc = str(tmp_path / "external_data")
    spark.createDataFrame([(1,)], "x bigint").write.parquet(ext_loc)
    warehouse_dir = os.path.join(
        spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").replace(
            "file:", ""
        ),
        name,
    )
    os.makedirs(warehouse_dir, exist_ok=True)
    bystander = os.path.join(warehouse_dir, "unrelated.txt")
    with open(bystander, "w") as f:
        f.write("not this table's data")
    try:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        spark.sql(
            f"CREATE TABLE {name} (x BIGINT) USING parquet LOCATION '{ext_loc}'"
        )
        clear_stale_table(spark, name)
        # external payload intact, catalog entry gone, bystander intact
        assert os.path.exists(ext_loc) and os.listdir(ext_loc)
        assert not spark.catalog.tableExists(name)
        assert os.path.exists(bystander)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        import shutil

        shutil.rmtree(warehouse_dir, ignore_errors=True)


def test_clear_stale_table_ignores_same_named_temp_view(spark, tmp_path):
    """A TEMP VIEW sharing the name must not mask an orphaned warehouse
    directory (code-review r13): tableExists matches temp views, but a
    view owns no warehouse location — the orphan must still be cleared
    or the saveAsTable this function guards dies with
    LOCATION_ALREADY_EXISTS."""
    import os
    import shutil

    from spark_graft.operators.graph import clear_stale_table

    name = "tempview_guard_t"
    warehouse_dir = os.path.join(
        spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").replace(
            "file:", ""
        ),
        name,
    )
    os.makedirs(warehouse_dir, exist_ok=True)
    with open(os.path.join(warehouse_dir, "part-stale.parquet"), "w") as f:
        f.write("orphan")
    try:
        spark.createDataFrame([(1,)], "x bigint").createOrReplaceTempView(name)
        clear_stale_table(spark, name)
        assert not os.path.isdir(warehouse_dir)  # orphan cleared
    finally:
        spark.catalog.dropTempView(name)
        shutil.rmtree(warehouse_dir, ignore_errors=True)


def test_clear_stale_table_recovers_failed_saveastable(spark):
    """Failed-saveAsTable recovery (VERDICT r13 item 3): a crash
    mid-saveAsTable leaves the data directory on disk with NO catalog
    entry — exactly the LOCATION_ALREADY_EXISTS state clear_stale_table
    exists to clear. The guarded write path (save_bucketed_edges) must
    succeed from that dirty state and produce a healthy bucketed
    table."""
    import os
    import shutil

    from spark_graft.operators.graph import save_bucketed_edges

    name = "failed_save_recovery_t"
    warehouse_dir = os.path.join(
        spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").replace(
            "file:", ""
        ),
        name,
    )
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    shutil.rmtree(warehouse_dir, ignore_errors=True)
    os.makedirs(warehouse_dir)
    with open(os.path.join(warehouse_dir, "part-00000-dead.parquet"), "w") as f:
        f.write("half-written by a crashed save")
    try:
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (1, 3)], "doc_a bigint, doc_b bigint"
        )
        save_bucketed_edges(spark, pairs, name)
        assert spark.catalog.tableExists(name)
        assert spark.table(name).count() == 6  # symmetrized edges
        # the dead partial file did not survive into the new table
        assert not os.path.exists(
            os.path.join(warehouse_dir, "part-00000-dead.parquet")
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(warehouse_dir, ignore_errors=True)


def test_user_features_single_exchange(spark, sf_dir):
    """events_user_features: the lag window, both whole-partition
    funnel windows, and the final aggregate must all inherit ONE
    hashpartitioning(user_id) — a second Exchange would mean a stage
    re-keyed off the user partitioning (the fill_forward contract,
    over a four-derivation feature rollup)."""
    df = q("events_user_features", spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    ex = [
        l for l in plan.splitlines()
        if "Exchange" in l and "Reused" not in l and "Broadcast" not in l
    ]
    assert len(ex) == 1, plan
    assert "hashpartitioning(user_id#" in ex[0], ex[0]


def test_sample_reservoir_rank_is_group_limited_map_side(spark, sf_dir):
    """sample_reservoir's scale contract: the rank filter must plan as
    WindowGroupLimit with a PARTIAL pass BEFORE the exchange, so each
    input partition ships at most K rows per stratum instead of the
    stratum's full population."""
    df = q("sample_reservoir", spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    limits = [l for l in plan.splitlines() if "WindowGroupLimit" in l]
    assert any("Partial" in l for l in limits), plan
    assert any("Final" in l for l in limits), plan
    # the partial limit must sit below (after, in toString order) the
    # exchange: partition-local top-K first, shuffle the survivors
    lines = plan.splitlines()
    ex_idx = [i for i, l in enumerate(lines) if "Exchange hashpartitioning(source" in l]
    partial_idx = [i for i, l in enumerate(lines) if "WindowGroupLimit" in l and "Partial" in l]
    assert ex_idx and partial_idx and partial_idx[0] > ex_idx[0], plan


def test_sample_temperature_no_wide_shuffle_of_documents(spark, sf_dir):
    """sample_temperature's per-doc pass must be a BroadcastHashJoin on
    lang (rates side broadcast); the only hash exchanges carry the
    lang-only aggregate (a handful of rows), never documents."""
    df = q("sample_temperature", spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            # lang-only aggregation exchanges are fine; a doc_id-carrying
            # exchange would mean the corpus itself is being shuffled
            assert "doc_id" not in line, line


def test_agg_weighted_quantile_windows_over_histogram_not_rows(spark, sf_dir):
    """agg_weighted_quantile applies the r12 window-df lesson from the
    start: the cumulative window's input must be the collapsed
    (flag, price) histogram (HashAggregate with partial_sum below the
    window), never raw lineitem rows."""
    df = q("agg_weighted_quantile", spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    win_idx = [i for i, l in enumerate(lines) if l.strip().startswith(("+- Window", ":- Window")) or " Window [" in l]
    agg_idx = [i for i, l in enumerate(lines) if "HashAggregate" in l and "partial_sum" in l]
    assert win_idx, plan
    assert agg_idx, plan
    # at least one partial aggregate sits below the first window
    assert any(a > win_idx[0] for a in agg_idx), plan


def test_rank_fusion_legs_are_topk_not_full_sort(spark, sf_dir):
    """rank_fusion's legs must each collapse via TakeOrderedAndProject
    (per-partition heaps) — a full global Sort of scores on either leg
    is the classic scale-killer this operator is shaped to avoid."""
    df = q("rank_fusion", spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # 3 = lexical leg + dense leg + the final fused top-20; >= 2 would
    # let one leg silently regress to a global Sort (the final
    # orderBy().limit() is itself a TakeOrderedAndProject)
    assert plan.count("TakeOrderedAndProject") >= 3, plan


def test_pipeline_curriculum_windows_over_length_histogram(spark, sf_dir):
    """pipeline_curriculum: the cumulative window's input must be the
    distinct-length histogram (partial-agg HashAggregate below the
    window), and the stage map must come back as a broadcast join —
    raw documents never enter a window or a wide shuffle keyed on
    anything but n_tokens."""
    from spark_graft.operators import curriculum  # registers on import

    df = q("pipeline_curriculum", spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    lines = plan.splitlines()
    win_idx = [i for i, l in enumerate(lines) if " Window [" in l or l.strip().startswith(("+- Window", ":- Window"))]
    agg_idx = [i for i, l in enumerate(lines) if "HashAggregate" in l and "partial_count" in l]
    assert win_idx and agg_idx and any(a > win_idx[0] for a in agg_idx), plan


def test_pipeline_preference_pairs_rank_is_group_limited(spark, sf_dir):
    """pipeline_preference_pairs: both rank legs must plan as map-side
    WindowGroupLimit (the sample_reservoir contract) so a hot source
    ships at most K rows per partition into each leg's exchange."""
    from spark_graft.operators import curriculum  # registers on import

    df = q("pipeline_preference_pairs", spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    partials = [l for l in plan.splitlines() if "WindowGroupLimit" in l and "Partial" in l]
    assert len(partials) >= 2, plan


def test_events_transitions_windows_over_bounded_pairs(spark, sf_dir):
    """events_transitions: the row-total window must run over the
    collapsed (cur, next) pair table (partial-agg HashAggregate below
    it), never raw events — pair cardinality is the event-type
    alphabet squared."""
    df = q("events_transitions", spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    win_idx = [i for i, l in enumerate(lines) if " Window [" in l or l.strip().startswith(("+- Window", ":- Window"))]
    agg_idx = [i for i, l in enumerate(lines) if "HashAggregate" in l and "partial_count" in l]
    # two windows: the per-user lead() (below the agg) and the
    # row-total (above it) — the partial agg must sit BETWEEN them
    assert len(win_idx) >= 2 and agg_idx, plan
    assert any(win_idx[0] < a < win_idx[-1] + 50 for a in agg_idx), plan
    assert win_idx[0] < agg_idx[0], plan


def test_ts_ewma_single_window_single_exchange(spark, sf_dir):
    """ts_ewma: all 8 lag() terms share one window spec, so the plan
    must carry exactly ONE Window operator and ONE user-keyed
    Exchange — a per-lag window would multiply the sort cost 8x."""
    df = q("ts_ewma", spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    wins = [l for l in plan.splitlines() if " Window [" in l or l.strip().startswith("+- Window")]
    assert len(wins) == 1, plan
    ex = [
        l for l in plan.splitlines()
        if "Exchange" in l and "Reused" not in l and "Broadcast" not in l
    ]
    assert len(ex) == 1 and "hashpartitioning(user_id#" in ex[0], plan


def test_dedup_url_two_exchanges_text_never_read(spark, sf_dir):
    """dedup_url is the CHEAP first-pass gate: exactly one shuffle on
    the (host, 16-byte md5) key plus the bounded per-host collapse —
    and the parquet scan must NOT read `text` at all (column pruning is
    the whole point of deduping on URLs before any content hashing)."""
    df = q("dedup_url", spark, sf_dir)
    physical = df._jdf.queryExecution().executedPlan().toString()
    n_exchanges = sum(
        1 for line in physical.splitlines()
        if "Exchange" in line and "Reused" not in line
    )
    assert n_exchanges == 2, physical
    plan = explain_str(df, "formatted")
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "doc_id" in read_schema and "source" in read_schema
    assert "text" not in read_schema, read_schema


def test_ts_resample_join_adds_no_extra_counts_shuffle(spark, sf_dir):
    """VERDICT r14 item 6: the gap-fill join must ride the existing
    Exchanges — the physical plan carries exactly the two aggregate
    shuffles (bucket counts on (user, hour); spans on user_id) and
    satisfies the final left join from those distributions (via an AQE
    broadcast of the thin side at small sf, or a grid-side-only
    re-shuffle at scale). A THIRD hashpartitioning of the counts
    lineage would mean the join re-shuffles corpus-sized data for a
    grid 5 orders of magnitude smaller."""
    df = q("ts_resample", spark, sf_dir)
    physical = df._jdf.queryExecution().executedPlan().toString()
    hash_ex = [
        l for l in physical.splitlines()
        if "Exchange hashpartitioning" in l and "Reused" not in l
    ]
    assert len(hash_ex) == 2, physical
    assert "CartesianProduct" not in physical


def test_fn_url_and_gopher_rules_are_map_only(spark, sf_dir):
    """fn_url and pipeline_gopher_rules are pure narrow expression
    batteries: ZERO Exchanges (scoring 100 TB is a map-only stage), and
    pipeline_gopher_rules' scan reads only (doc_id, text) — the rules
    never touch the other columns."""
    for name in ("fn_url", "pipeline_gopher_rules"):
        df = q(name, spark, sf_dir)
        physical = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in physical, name
    plan = explain_str(q("pipeline_gopher_rules", spark, sf_dir), "formatted")
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "doc_id" in read_schema and "text" in read_schema
    assert "n_chars" not in read_schema and "source" not in read_schema


def test_sim_maxsim_topk_heap_no_vector_shuffle(spark, sf_dir):
    """sim_maxsim keeps sim_cosine_topk's shape: the top-k is a
    TakeOrderedAndProject (per-partition heaps, single merge) and the
    plan contains no Exchange — the 16 slice-cosines are narrow
    codegen expressions, vectors never shuffle."""
    df = q("sim_maxsim", spark, sf_dir)
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in physical, physical
    assert "Exchange" not in physical, physical


def test_train_eval_split_audit_rides_banded_pairs(spark, sf_dir):
    """pipeline_train_eval_split's leakage audit must stay inside the
    banded-LSH pair pipeline — no cartesian/nested-loop anywhere, and
    the split-assignment joins are equi-joins on doc ids."""
    df = q("pipeline_train_eval_split", spark, sf_dir)
    plan = explain_str(df, "formatted")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_events_rfm_windows_only_over_histograms(spark, sf_dir):
    """events_rfm's three quantile windows must read COLLAPSED
    distinct-value histograms, never raw user rows: no Window
    partitioned by user_id, the score maps join back broadcast, and
    the corpus-scale work is exactly one user aggregate (plus the
    1-row anchor)."""
    import inspect

    from spark_graft.operators import events

    df = q("events_rfm", spark, sf_dir)
    assert "user_id" not in _window_partition_keys(df)
    plan = explain_str(df, "formatted")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # pu is localCheckpointed (events scanned once, user agg run once);
    # the downstream plan therefore reads the materialized user table
    # with NO user_id re-aggregation Exchange of its own
    assert ".localCheckpoint()" in inspect.getsource(events.events_rfm)
    physical = df._jdf.queryExecution().executedPlan().toString()
    user_ex = [
        l for l in physical.splitlines()
        if "Exchange hashpartitioning(user_id" in l and "Reused" not in l
    ]
    assert len(user_ex) == 0, physical


def test_text_hash_features_two_partial_aggs_no_window(spark, sf_dir):
    """text_hash_features is two partial-combining aggregates — (doc,
    term) then (doc, dim) — with zero windows and zero joins; the
    vocabulary never materializes anywhere."""
    df = q("text_hash_features", spark, sf_dir)
    plan = explain_str(df, "formatted")
    assert "Window" not in plan and "Join" not in plan, plan
    assert "partial_count" in plan or "partial_sum" in plan, plan
    assert _window_partition_keys(df) == set()


def test_topk_terms_window_group_limit_over_collapsed_counts(spark, sf_dir):
    """topk_terms' rank filter must plan as WindowGroupLimit (map-side
    per-partition top-K before the exchange) over the collapsed
    (source, term) count table — `term` must never be a window
    partition key (the r12 power-law-key lesson)."""
    df = q("topk_terms", spark, sf_dir)
    plan = explain_str(df, "formatted")
    assert "WindowGroupLimit" in plan, plan
    assert "term" not in _window_partition_keys(df)
    assert "partial_count" in plan, plan


def test_dedup_report_shares_pretrain_stage_frames(spark, sf_dir):
    """pipeline_dedup_report must build on the SAME stage chain as
    pipeline_pretrain_corpus (the shared _pretrain_stage_frames /
    _pretrain_ctes pair) — source-pinned so the report can never drift
    from the pipeline it describes — and its plan must stay free of
    cartesian shapes."""
    import inspect

    from spark_graft.operators import pipeline

    for fn in (pipeline.pipeline_dedup_report, pipeline.pipeline_pretrain_corpus):
        assert "_pretrain_stage_frames(spark, sf_dir)" in inspect.getsource(fn)
    assert "_pretrain_ctes()" in inspect.getsource(pipeline._dedup_report_oracle)
    assert "_pretrain_ctes()" in inspect.getsource(pipeline._pretrain_oracle)
    plan = explain_str(q("pipeline_dedup_report", spark, sf_dir), "formatted")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dedup_paragraph_text_never_shuffles_on_fp(spark, sf_dir):
    """dedup_paragraph's keep-first decision stream must shuffle ONLY
    (doc_id, pos, 16-byte md5): exactly two non-reused hashpartitioning
    Exchanges — the min-(doc_id,pos) aggregate on fp and the per-doc
    drop-list collapse on doc_id — paragraph text rides at most the
    final doc_id join (broadcast at this sf). The (doc_id, paras)
    table must be checkpoint-staged: downstream of it the plan has
    ZERO FileScans (text read once) and ZERO tokenizer re-derivations —
    the r16 InferFiltersFromGenerate lesson: posexplode over a derived
    array pushes size(input) > 0 below the projection, inlining the
    whole tokenize+window chain into a per-row interpreted filter
    (measured 8.7 -> 2.9 s at sf1 when staged)."""
    df = q("dedup_paragraph", spark, sf_dir)
    physical = df._jdf.queryExecution().executedPlan().toString()
    hash_ex = [
        l for l in physical.splitlines()
        if "Exchange hashpartitioning" in l and "Reused" not in l
    ]
    assert len(hash_ex) == 2, physical
    assert any("fp#" in l for l in hash_ex), hash_ex
    assert any("doc_id#" in l for l in hash_ex), hash_ex
    assert "FileScan" not in physical, physical   # staged: text read once
    assert "split(lower" not in physical, physical  # tokenizer never re-runs
    assert "Scan ExistingRDD" in physical, physical
    # the staging fragment itself prunes columns: only (doc_id, text)
    import inspect

    from spark_graft.operators import dedup

    assert ".localCheckpoint()" in inspect.getsource(dedup.dedup_paragraph)


def test_decontaminate_semantic_blocked_bipartite(spark, sf_dir):
    """decontaminate_semantic must stay inside dedup_embedding's
    trained-cell blocking: train x eval pairs live in the
    applyInPandas (cell, pi, pj) tasks (FlatMapGroupsInPandas in the
    plan), never a physical train-vs-eval join — no cartesian, no
    nested loop, and the embeddings scan reads only (vec_id,
    embedding). The per-vector merge of task partials must carry
    map-side partial aggregation."""
    df = q("decontaminate_semantic", spark, sf_dir)
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in physical
    assert "CartesianProduct" not in physical
    assert "BroadcastNestedLoopJoin" not in physical
    assert "partial_sum" in physical or "partial_max" in physical, physical
    plan = explain_str(df, "formatted")
    emb_rs = [
        l for l in plan.splitlines()
        if "ReadSchema" in l and "embedding" in l
    ]
    assert emb_rs and all("label" not in l for l in emb_rs), emb_rs


def test_dsir_select_three_partial_aggs_broadcast_ratios(spark, sf_dir):
    """dsir_select is three partial-combining hash aggregates with zero
    windows; the 64-row ratio table attaches via BroadcastHashJoin (and
    the 1-row totals via a broadcast nested loop) — never a sort-merge
    join, and gram strings never appear as an Exchange key: the only
    corpus-sized shuffle carries (doc_id, is_t, dim) partial counts.
    The feat table must be localCheckpoint-staged (three consumer
    branches would otherwise each re-run the scan + tokenize + gram
    explode — measured 3 FileScans without it), so the post-staging
    plan reads ExistingRDD and never re-scans parquet or re-tokenizes."""
    import inspect

    from spark_graft.operators import pipeline

    assert ".localCheckpoint()" in inspect.getsource(pipeline.dsir_select)
    df = q("dsir_select", spark, sf_dir)
    plan = explain_str(df, "formatted")
    assert "Window" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("partial_count") + plan.count("partial_sum") >= 3, plan
    assert _window_partition_keys(df) == set()
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in physical, physical
    assert "FileScan" not in physical, physical   # staged: text read once
    assert "split(lower" not in physical, physical  # tokenizer never re-runs
    ex_on_gram = [
        l for l in physical.splitlines()
        if "Exchange hashpartitioning(g#" in l
    ]
    assert not ex_on_gram, physical


def test_preference_rating_iterative_shape(spark, sf_dir):
    """preference_rating's minorization loop (the R12 iterative-driver
    family): judgments collapse to per-pair counts BEFORE the loop, the
    per-round driver traffic is exactly the two renormalization scalars
    (one .first(), no .collect()), rounds cut lineage with
    localCheckpoint, and the returned frame is checkpoint-backed on
    both join sides — no FileScan, no cartesian."""
    import inspect

    from spark_graft.operators import curriculum as cur

    src = inspect.getsource(cur.preference_rating_frame)
    assert "localCheckpoint" in src
    assert src.count(".first()") == 1 and ".collect()" not in src
    df = cur.preference_rating(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "FileScan" not in plan, plan
