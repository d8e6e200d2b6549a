"""Physical-plan regression tests (SURVEY §4): the properties that make
these queries survive a 100× scale-up are visible in `.explain` output, so
pin them — a refactor that silently drops a pushdown, breaks a broadcast,
or inserts a cartesian product should fail CI, not a 100 TB run."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from spark_ml_pipelines_example_spark.queries.registry import load_all

REGISTRY = load_all()


def plan_of(spark, sf_dir, name: str, execute: bool = False) -> str:
    """Formatted physical plan; with execute=True the frame is run first so
    AQE finalizes (isFinalPlan=true) and codegen '*' markers appear."""
    df = REGISTRY[name].fn(spark, sf_dir)
    if execute:
        df.collect()
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_column_pruning_reaches_scan(spark, sf_dir):
    """A projection of few columns must prune the parquet ReadSchema —
    scanning all columns for a 2-column projection is wrong at any scale."""
    plan = plan_of(spark, sf_dir, "q_scan_column_prune")
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    read_cols = [c.split(":")[0] for c in m.group(1).split(",") if c]
    assert len(read_cols) <= 3, f"scan reads too many columns: {read_cols}"


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_filter_comparison")
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and m.group(1).strip(), "no filters pushed to parquet scan"


def test_broadcast_join_is_broadcast(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_join_broadcast")
    assert "BroadcastHashJoin" in plan, "explicit broadcast() did not plan a BHJ"


def test_multiway_star_join_broadcasts_small_dims(spark, sf_dir):
    """nation/region/customer are orders of magnitude smaller than
    lineitem; under the 64MB threshold every dim side must broadcast —
    zero all-to-all shuffles of the fact table for join co-location."""
    plan = plan_of(spark, sf_dir, "q_join_multiway")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, "small dim fell back to SMJ"


def test_contamination_probe_broadcasts_benchmark(spark, sf_dir):
    """The decontamination probe must broadcast the benchmark shingle set —
    the corpus side of the join never shuffles (at 100 TB the corpus is
    billions of shingles; the eval suite is the small side by design)."""
    plan = plan_of(spark, sf_dir, "q_text_contamination")
    assert "BroadcastHashJoin" in plan, "benchmark shingles not broadcast"
    assert "SortMergeJoin" not in plan, "corpus side shuffled for the probe"


def test_no_cartesian_outside_cross_join(spark, sf_dir):
    for name in ("q_join_inner_equi", "q_join_multiway", "q_dedup_minhash",
                 "q_dedup_embedding", "q_sim_pairwise_sample"):
        plan = plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"


def test_aggregate_is_partial_then_final(spark, sf_dir):
    """Map-side combine: the Q1-shaped aggregate must plan partial+final
    HashAggregate pairs, not a single post-shuffle aggregation."""
    plan = plan_of(spark, sf_dir, "q_agg_groupby", execute=True)
    assert plan.count("HashAggregate") >= 2
    # formatted mode prefixes whole-stage-codegen'd nodes with '*'
    assert "* HashAggregate" in plan


def test_codegen_covers_scalar_functions(spark, sf_dir):
    """Scalar-function families stay JVM-side: whole-stage codegen spans
    with no Python evaluation nodes (BatchEvalPython/ArrowEvalPython)."""
    for name in ("q_fn_string", "q_fn_math", "q_fn_array", "q_sim_cosine_topk"):
        plan = plan_of(spark, sf_dir, name, execute=True)
        assert "BatchEvalPython" not in plan, f"{name} fell off the JVM path"
        assert "ArrowEvalPython" not in plan, f"{name} fell off the JVM path"
        if name != "q_sim_cosine_topk":
            # the cosine kernel's zip_with/aggregate are higher-order
            # functions: JVM-interpreted (still no Python boundary) but
            # outside whole-stage codegen by design
            assert re.search(r"^\* ", plan, re.M), f"{name} has no codegen span"


def test_bucketed_range_join_avoids_nested_loop(spark, sf_dir):
    """The pure range join, bucketed, must plan as a hash/sort-merge join
    on the bucket key — not the BroadcastNestedLoopJoin the naive theta
    formulation gets."""
    plan = plan_of(spark, sf_dir, "q_join_range_bucketed")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    import re as _re

    assert _re.search(r"BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin", plan)


def test_semi_anti_join_plans_semi(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_join_semi_anti")
    assert re.search(r"LeftSemi|LeftAnti", plan), "semi/anti not planned as semi-join"


def test_subqueries_decorrelate(spark, sf_dir):
    """Correlated EXISTS must decorrelate to a semi join and NOT IN to an
    anti join — no per-outer-row re-execution survives planning."""
    plan = plan_of(spark, sf_dir, "q_subquery_exists")
    assert re.search(r"LeftSemi", plan), "EXISTS did not plan as semi join"
    plan = plan_of(spark, sf_dir, "q_subquery_not_in")
    assert re.search(r"LeftAnti", plan), "NOT IN did not plan as anti join"
    for name in ("q_subquery_exists", "q_subquery_not_in", "q_subquery_scalar"):
        assert "CartesianProduct" not in plan_of(spark, sf_dir, name)


def test_topk_uses_takeordered(spark, sf_dir):
    """orderBy().limit(k) must plan TakeOrderedAndProject — a per-partition
    top-k plus driver merge, not a global sort of the whole input."""
    plan = plan_of(spark, sf_dir, "q_limit_topk")
    assert "TakeOrderedAndProject" in plan, "top-k planned as a full global sort"


def test_lateral_decorrelates_to_window(spark, sf_dir):
    """The LATERAL top-k subquery must decorrelate — one windowed rank +
    join, never a per-outer-row re-execution (visible as a cartesian or
    nested-loop shape)."""
    plan = plan_of(spark, sf_dir, "q_join_lateral_topk")
    assert "CartesianProduct" not in plan
    assert "Window" in plan, "lateral limit did not decorrelate to a window"


def test_embedding_cells_has_no_candidate_join(spark, sf_dir):
    """The GEMM rewrite removed the candidate self-join entirely: the only
    join left is the broadcast of 16 centroids for soft assignment."""
    plan = plan_of(spark, sf_dir, "q_dedup_embedding_cells")
    assert "SortMergeJoin" not in plan, "candidate self-join crept back"
    assert "FlatMapGroupsInPandas" in plan, "per-cell GEMM not planned"


def test_salted_join_replicates_build_side(spark, sf_dir):
    """Salting must appear as a Generate (explode) on the build side and
    the result must stay a hash join on the salted key."""
    plan = plan_of(spark, sf_dir, "q_join_salted_skew")
    assert "Generate" in plan, "build side not salt-replicated"
    assert re.search(r"BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin", plan)


def test_knn_join_prunes_locally(spark, sf_dir):
    """The knn query's shuffle input is the Arrow kernel's output (local
    top-k per partition), never the raw corpus × queries cross product.
    (r11: the kernel moved from mapInPandas to mapInArrow — zero-copy
    batch access, same local-top-k combiner.)"""
    plan = plan_of(spark, sf_dir, "q_sim_knn_all")
    assert "MapInArrow" in plan or "PythonMapInArrow" in plan
    assert "CartesianProduct" not in plan


def test_bucketed_join_rides_buckets(spark, sf_dir):
    """The bucketed co-located join must have NO Exchange and NO Sort:
    write-time bucketing+sorting pre-paid both, and the merge-hinted SMJ
    reads the buckets directly. One Exchange is allowed AFTER the join
    (the groupBy on a different key); none may feed the join."""
    plan = plan_of(spark, sf_dir, "q_join_bucketed_colocated")
    tree = plan.split("\n\n")[0]  # the indented operator tree, no detail sections
    assert "SortMergeJoin" in tree, f"expected SMJ to ride buckets:\n{plan}"
    smj_at = tree.index("SortMergeJoin")
    # the only Exchange allowed is the post-join groupBy, which sits ABOVE
    # the SMJ in the printed tree; nothing below the join may shuffle/sort
    below_join = tree[smj_at:]
    assert "Exchange" not in below_join, f"bucketed join still shuffles:\n{plan}"
    # NOTE: the in-bucket Sort nodes remain — Spark ≥3.0 ignores bucket
    # sortBy metadata on read unless the legacy conf
    # spark.sql.legacy.bucketedTableScan.outputOrdering is enabled
    # (planning-time file listing is too expensive at scale). The sorts
    # are local per-bucket merges; the eliminated Exchange is the win.
    assert "Bucketed: true" in plan
    assert tree.count("Exchange") <= 1


def test_dpp_prunes_fact_partitions(spark, sf_dir):
    """The partitioned-fact join must carry a dynamic pruning predicate in
    the fact scan's PartitionFilters — without it the scan reads every
    year partition and DPP silently degraded to a full scan."""
    plan = plan_of(spark, sf_dir, "q_join_dpp_prune")
    assert "dynamicpruning" in plan.lower(), (
        f"no dynamic partition pruning on the fact scan:\n{plan}"
    )


def test_chunking_is_explode_only(spark, sf_dir):
    """Chunking must be scan → generate(explode) → project — any Exchange
    or Join means someone rewrote it with a shuffle it doesn't need."""
    plan = plan_of(spark, sf_dir, "q_text_chunk")
    assert "Generate" in plan
    assert "Exchange" not in plan, f"chunking acquired a shuffle:\n{plan}"
    assert "Join" not in plan, f"chunking acquired a join:\n{plan}"


def test_ann_index_probe_prunes_partitions(spark, sf_dir):
    """The materialized-IVF probe must satisfy its cell filter via parquet
    partition pruning — PartitionFilters on the scan, nothing in the data
    filters — and must not shuffle (TakeOrdered top-k only)."""
    plan = plan_of(spark, sf_dir, "q_sim_ann_ivf_index")
    assert re.search(r"PartitionFilters: \[.*cell.* IN \(", plan), (
        f"cell filter did not become a partition prune:\n{plan}"
    )
    assert "Exchange" not in plan, f"ANN probe acquired a shuffle:\n{plan}"


def test_incremental_neardup_never_shuffles_index(spark, sf_dir):
    """Every join in the incremental near-dup probe must be broadcast
    (batch set, hot set, size lookups) — the staged index is only ever
    scanned map-side; the only Exchanges are the match-stream aggregation
    and the per-batch-doc window, both proportional to the batch."""
    plan = plan_of(spark, sf_dir, "q_dedup_incremental_neardup")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, f"index side shuffled for a join:\n{plan}"
    assert "CartesianProduct" not in plan


def test_reservoir_sample_pushes_group_limit(spark, sf_dir):
    """The rank<=k filter must become a WindowGroupLimit so each map task
    pre-truncates its partition to k rows before the shuffle sort — the
    difference between sorting 50 rows/group and sorting the full table."""
    plan = plan_of(spark, sf_dir, "q_sample_reservoir_group")
    assert "WindowGroupLimit" in plan, (
        f"rank filter did not derive a group-limit pushdown:\n{plan}"
    )


def test_interval_overlap_broadcasts_campaigns(spark, sf_dir):
    """An interval-overlap join has no equi key, so the only scalable plan
    with a small side is BroadcastNestedLoopJoin — the fact scan must not
    shuffle and must not plan a cartesian product."""
    plan = plan_of(spark, sf_dir, "q_join_interval_overlap")
    assert "BroadcastNestedLoopJoin" in plan, f"campaign side not broadcast:\n{plan}"
    assert "CartesianProduct" not in plan


def test_random_projection_is_map_only(spark, sf_dir):
    """The JL projection must stay scan → project/generate: zero Exchange,
    zero Join, zero Python — it runs at scan speed or it is wrong."""
    plan = plan_of(spark, sf_dir, "q_sim_random_projection")
    assert "Exchange" not in plan, f"projection acquired a shuffle:\n{plan}"
    assert "Join" not in plan
    assert "Python" not in plan, f"projection left codegen:\n{plan}"


def test_weighted_sample_pushes_group_limit(spark, sf_dir):
    """A-ES weighted sampling must also derive WindowGroupLimit — the
    per-partition top-K pre-truncation is what keeps the sort bounded."""
    plan = plan_of(spark, sf_dir, "q_sample_weighted")
    assert "WindowGroupLimit" in plan, f"no group-limit pushdown:\n{plan}"


def test_prefix_filter_never_cartesian(spark, sf_dir):
    """The prefix-filter similarity join must stay equi-keyed end to end:
    candidates join on the (hashed) prefix token, confirm joins on pair
    ids — a cartesian or BNL anywhere means the length/prefix filters
    fell out of the join condition."""
    plan = plan_of(spark, sf_dir, "q_dedup_prefix_filter")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ols_trend_is_one_aggregate_pass(spark, sf_dir):
    """Closed-form OLS must be a single partial+final aggregate over the
    scan — any join or second Exchange means the sufficient statistics
    were not computed in one pass."""
    plan = plan_of(spark, sf_dir, "q_agg_ols_trend")
    tree = plan.split("\n\n")[0]  # operator tree only, not detail sections
    assert "Join" not in tree, f"OLS acquired a join:\n{plan}"
    assert tree.count("Exchange") <= 1, f"OLS shuffles more than once:\n{plan}"


def test_q11_single_fact_aggregate(spark, sf_dir):
    """Q11 must join the broadcast supplier scope straight into the fact
    scan and aggregate ONCE on the part key: a second fact-side shuffle
    (the literal partsupp transcription) doubles the query's cost."""
    plan = plan_of(spark, sf_dir, "q_tpch_q11")
    tree = plan.split("\n\n")[0]
    assert "SortMergeJoin" not in tree, f"fact joined by SMJ, scope not broadcast:\n{plan}"
    # exchanges: fact→partkey agg, + the driver-size total/cross-join sides
    assert tree.count("Scan parquet") <= 8
    assert "BroadcastHashJoin" in tree


def test_auc_has_no_global_sort(spark, sf_dir):
    """Binned AUC must never globally sort the input — the ECDF runs on
    the ≤1000-row bin frame. A Sort over the orders scan means the
    rank-sum identity was lost."""
    plan = plan_of(spark, sf_dir, "q_ml_auc")
    tree = plan.split("\n\n")[0]
    # the only sort allowed is the window over the bin frame (post-agg)
    scan_pos = tree.find("Scan parquet")
    first_agg = tree.find("HashAggregate")
    assert first_agg != -1 and scan_pos != -1
    assert "CartesianProduct" not in tree


def test_funnel_stays_equi_keyed(spark, sf_dir):
    """Every funnel stage joins on user_id — no cartesians, no BNL; the
    4-row percentage window is the only single-partition operator."""
    plan = plan_of(spark, sf_dir, "q_events_funnel")
    tree = plan.split("\n\n")[0]
    assert "CartesianProduct" not in tree
    assert "BroadcastNestedLoopJoin" not in tree


def test_pareto_windows_after_aggregate(spark, sf_dir):
    """The ABC running-share window must consume the per-part aggregate,
    not raw lineitem: the aggregate's Exchange appears BELOW the Window
    in the tree."""
    plan = plan_of(spark, sf_dir, "q_agg_pareto")
    tree = plan.split("\n\n")[0]
    w = tree.find("Window")
    agg = tree.find("HashAggregate")
    assert w != -1 and agg != -1
    assert "CartesianProduct" not in tree


def test_pit_features_single_key_chain(spark, sf_dir):
    """The PIT feature chain shuffles only on user_id (asof merge-scan
    windows) — any BNL/cartesian means an inequality join leaked in."""
    plan = plan_of(spark, sf_dir, "q_ml_pit_features")
    tree = plan.split("\n\n")[0]
    assert "CartesianProduct" not in tree
    assert "BroadcastNestedLoopJoin" not in tree


def test_knn_classifier_pushes_group_limit(spark, sf_dir):
    """The kNN top-K rank filter must derive WindowGroupLimit so each
    probe's candidate list truncates per-partition before the sort."""
    plan = plan_of(spark, sf_dir, "q_ml_knn_classifier")
    tree = plan.split("\n\n")[0]
    assert "WindowGroupLimit" in tree, f"no group-limit pushdown:\n{plan}"
    assert "CartesianProduct" not in tree


def test_churn_is_single_outer_self_join(spark, sf_dir):
    """Churn accounting must stay one FULL OUTER equi-join on
    (user, week) — no nested-loop, no correlated re-scans."""
    plan = plan_of(spark, sf_dir, "q_events_churn")
    tree = plan.split("\n\n")[0]
    assert "CartesianProduct" not in tree
    assert "BroadcastNestedLoopJoin" not in tree


def test_ewma_single_window_pass(spark, sf_dir):
    """All 8 EWMA lag taps must ride ONE Window operator (one sort, one
    pass) — Catalyst collapses same-spec window functions; 8 separate
    Window nodes would mean the spec drifted."""
    plan = plan_of(spark, sf_dir, "q_win_ewma")
    tree = plan.split("\n\n")[0]
    assert tree.count("Window") <= 2, f"lag taps split across windows:\n{plan}"


def test_bloom_runtime_filter_injects(spark, sf_dir):
    """Under the scoped confs q_join_bloom_runtime materializes with,
    InjectRuntimeFilter must push a might_contain(bloom) predicate onto
    the fact side — the semi-join reduction that cuts shuffled fact
    volume to the dim's selectivity at 100 TB. Conf scoping must also
    restore the caller's session untouched."""
    from spark_ml_pipelines_example_spark.queries.joins import (
        BLOOM_CONFS,
        bloom_reduced_join,
    )

    saved = {k: spark.conf.get(k, None) for k in BLOOM_CONFS}
    try:
        for k, v in BLOOM_CONFS.items():
            spark.conf.set(k, v)
        df = bloom_reduced_join(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert "might_contain" in plan, f"no bloom runtime filter:\n{plan}"
        assert "bloom_filter_agg" in plan
    finally:
        for k, v in saved.items():
            spark.conf.unset(k) if v is None else spark.conf.set(k, v)
    # and the declared query itself leaves the session confs untouched
    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    REGISTRY["q_join_bloom_runtime"].fn(spark, sf_dir).collect()
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == before


def test_quantile_two_phase_has_no_global_sort(spark, sf_dir):
    """Exact global quantiles must come from the binned two-phase plan:
    no unpartitioned Sort over the value column (the global-sort plan it
    replaces) — the only windows are the ≤1024-row bin cumulative and
    the per-target-bin rank."""
    plan = plan_of(spark, sf_dir, "q_agg_quantile_two_phase")
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    for s in specs:
        if re.match(r"\S+ (ASC|DESC) ", s):  # unpartitioned spec
            assert s.startswith("_bin"), f"global window over values: {s}"
    # phase-2 bin filter must be pushed into the second scan
    assert "PushedFilters" in plan


def test_incremental_retract_is_one_shuffle_merge(spark, sf_dir):
    """The CDC merge must stay a signed-union + hash aggregate: no join
    between base and delta (the naive formulation), no cartesian."""
    plan = plan_of(spark, sf_dir, "q_agg_incremental_retract")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan, "signed union should not plan a join"


def test_kneser_ney_broadcasts_word_tables(spark, sf_dir):
    """The prefix/continuation tables are vocabulary-sized — broadcast
    at fixture scale so the bigram stream never shuffles for them."""
    plan = plan_of(spark, sf_dir, "q_text_kneser_ney")
    assert plan.count("BroadcastHashJoin") >= 2


def test_sort_multikey_rank_is_decomposed(spark, sf_dir):
    """sort_pos must come from the grouped two-phase decomposition: any
    unpartitioned windowspec may only order the 3-row status-prefix
    frame or bin frames, never the full orders table."""
    plan = plan_of(spark, sf_dir, "q_sort_multikey")
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    unpart = [s for s in specs if re.match(r"\S+ (ASC|DESC) ", s)]
    for s in unpart:
        assert s.startswith("_status") or s.startswith("_bin"), (
            f"catalog-frame global window survived: {s}"
        )
