"""Regenerate PLANS.md: executed physical plans (AQE-final, codegen
markers visible) for a representative query per operator family, at the
bench scale factor.

    python tools/generate_plans.py [sf_dir]

The artifact is the evidence trail for the plan-shape claims in
docstrings: broadcasts, pushdowns, partial aggregation, semi joins,
bucket equi-joins — reviewable without running Spark.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SHOWCASE = [
    ("q_scan_column_prune", "projection + predicate pushdown into the parquet scan"),
    ("q_agg_groupby", "TPC-H Q1 shape: partial+final hash aggregate, decimal sums"),
    ("q_join_multiway", "star join: every dim side broadcast, zero fact-table SMJ"),
    ("q_tpch_q5", "TPC-H Q5 composite: 6-table star, one fact shuffle, 5 broadcast hops"),
    ("q_tpch_q6", "TPC-H Q6: all predicates in PushedFilters, single-row combine"),
    ("q_join_semi_anti", "semi/anti join planning"),
    ("q_join_range_bucketed", "pure range join as bucket equi-join (no nested loop)"),
    ("q_join_asof_event", "as-of join: union + single-shuffle merge-scan window"),
    ("q_join_asof_tolerance", "as-of with max-gap tolerance: same merge-scan, struct-carried ref ts, exact interval test"),
    ("q_join_asof_forward", "forward as-of: the merge-scan run in reverse time order"),
    ("q_dq_join_key_skew", "join-key skew audit: one hash agg + broadcast scalar total + TakeOrdered top-10"),
    ("q_agg_hll_rolling", "rolling 7-day HLL merge: one fact scan to day-registers, broadcast range join over the KB register frame"),
    ("q_subquery_exists", "correlated EXISTS decorrelated to LeftSemi"),
    ("q_win_topk_per_group", "ranked window + filter"),
    ("q_limit_topk", "TakeOrderedAndProject (no global sort)"),
    ("q_dedup_paragraph", "sentence dedup: min(struct) partial-agg winner, no sentence window"),
    ("q_stream_interval_join", "interval join: equi-keyed hash join, time bound as join filter"),
    ("q_dedup_minhash", "banded LSH candidate join, exact size prefilter, union-free Jaccard confirm"),
    ("q_dedup_simhash", "64-bit simhash: map-side-combined bit votes, 16-bit banded join"),
    ("q_dedup_embedding_cells", "IVF-cell-blocked near-dup: one GEMM per cell, grouped-max dedup"),
    ("q_pack_shards", "blockwise exclusive-cumsum shard packing (parallel per source)"),
    ("q_sim_cosine_topk", "probe cosine scan + TakeOrdered"),
    ("q_sim_knn_all", "block-GEMM knn join: local top-k combiner + global window rank"),
    ("q_join_salted_skew", "salted equi-join: hot keys spread over SALT shuffle partitions"),
    ("q_shuffle_global", "two-phase global index: range partition + offset join, no serial stage"),
    ("q_text_contamination", "corpus shingles probed against a broadcast benchmark set"),
    ("q_stream_tumbling", "event-time tumbling window (batch twin)"),
    ("q_join_bucketed_colocated", "bucketed co-located SMJ: zero Exchange below the join"),
    ("q_join_dpp_prune", "dynamic partition pruning: runtime dim keys filter the fact scan"),
    ("q_text_chunk", "token-budget chunking: sequence+explode+slice, shuffle-free"),
    ("q_sim_ann_ivf_index", "materialized IVF probe: PartitionFilters on cell, no shuffle"),
    ("q_dedup_incremental_neardup", "standing-index probe: all joins broadcast, index never shuffles"),
    ("q_text_domain_cap", "per-domain cap: parse_url + one window on the domain key"),
    ("q_events_retention", "cohort retention: one user_id shuffle, broadcast cohort sizes"),
    ("q_join_interval_overlap", "interval overlap: BroadcastNestedLoopJoin, fact never shuffles"),
    ("q_sample_reservoir_group", "exact-k group sample: WindowGroupLimit pre-truncates partitions"),
    ("q_sim_random_projection", "JL sign projection: nested HOFs, map-only, zero Exchange"),
    ("q_tpch_q21", "sole-blame double correlation: semi + anti on one shuffle key"),
    ("q_graph_pagerank", "3 power iterations: dst-keyed shuffles, broadcast dangling mass"),
    ("q_layout_zorder", "Z-ordered staging read: 2-D range filter over tight file stats"),
    ("q_embed_quantize", "int8 quantization: nested HOFs, map-only"),
    ("q_ml_knn_classifier_ivf", "IVF-routed kNN eval: one cell equi-join, broadcast probe side"),
    ("q_sim_hard_negatives", "hard-negative mining over the IVF routing spine"),
    ("q_sim_ann_recall_curve", "nprobe/recall curve: ONE pruned scan, nested-cell rank filters"),
    ("q_embed_pq_codes", "PQ assignment: Arrow integer GEMM, batch-partial combinable agg"),
    ("q_sim_ann_ivfpq", "IVF-PQ ADC serving: literal codebook/LUT HOFs, zero Python above the cached index"),
    ("q_sim_ann_ivfpq_eval", "routed PQ recall eval: broadcast probe frame, HOF ADC per pair, per-probe WindowGroupLimit"),
    ("q_embed_isotropy", "per-dim moments: ONE unrolled aggregate, stack-unpivot, no explode"),
    ("q_tpch_q2", "argmin-per-group: scalar-min decorrelated to groupBy + join-back"),
    ("q_tpch_q8", "market share: conditional decimal sums in ONE aggregate pass"),
    ("q_dq_checks", "DQ rule suite: one aggregate per table + anti-join, stack to rows"),
    ("q_dedup_snm", "sorted-neighborhood: LEAD-window probes, no self-join"),
    ("q_text_vocab_coverage", "vocab coverage: TakeOrdered cut before constant-size window"),
    ("q_events_funnel", "funnel: stage chain co-partitioned on user_id, 4-row pct window"),
    ("q_dq_drift_ks", "binned KS drift: bin-collapsed ECDF, no global sort"),
    ("q_tpch_q11", "Q11: broadcast scope into ONE fact aggregate; total reuses its stage"),
    ("q_graph_triangles", "triangles: oriented wedge join + closing-edge equi-join"),
    ("q_ml_lift_table", "lift table: exact-percentile bounds broadcast, map-only bucketing"),
    ("q_scan_text_log", "text-line ingest: codegen regex parse, malformed-drop at scan"),
    ("q_ml_pit_features", "PIT feature join: two asof merge-scans on one user_id key"),
    ("q_events_attribution", "last-touch attribution: struct-payload asof + age cap"),
    ("q_events_abtest", "A/B z-test: per-user collapse, 2-row arm aggregate"),
    ("q_agg_gini", "Gini: rank window over the collapsed per-part frame"),
    ("q_dedup_survivorship", "golden record: per-attribute survival aggregates, no pairs"),
    ("q_multimodal_phash", "pHash dedup: Arrow decode+GEMM, one signature shuffle"),
    ("q_curate_mix_temperature", "temperature mix: one count aggregate + quota arithmetic"),
    ("q_ml_knn_classifier", "kNN eval: prenormed broadcast-probe cosine, WindowGroupLimit top-k"),
    ("q_events_cuped", "CUPED: two aggregates to exact sufficient statistics, closed-form theta"),
    ("q_ml_pr_auc", "PR-AUC: 1000-bin histogram collapse, cumulative sweep on driver-size frame"),
    ("q_ml_calibration", "reliability curve: one hash aggregate to 10 bins"),
    ("q_dq_benford", "Benford audit: digit hash-agg to 9 rows + broadcast scalar total"),
    ("q_win_capped_cumsum", "threshold-reset recurrence: user_id shuffle + sorted mapInPandas stream"),
    ("q_join_spatial_grid", "grid-blocked radius join: 3x3 cell replication, equi-join, no nested loop"),
    ("q_win_concurrency", "sweep line: delta union + per-type hash agg + one-exchange prefix sum"),
    ("q_agg_proration", "largest-remainder allocation: one orderkey shuffle, all-integer arithmetic"),
    ("q_agg_skyline", "sort-based skyline: tiny level-table window + broadcast join back"),
    ("q_dedup_substring_spans", "span explode + span hash-agg + left join, no self-join"),
    ("q_join_fifo_match", "FIFO as cumulative-interval overlap: two windows + partkey equi-join"),
    ("q_join_nearest_event", "banded nearest join: 3-cell replication equi-join + per-probe top-1"),
    ("q_ts_ohlc", "OHLC bars: two rankings + aggregate on one (type,hour) exchange"),
    ("q_ml_naive_bayes", "NB classifier: tiny combo-table scoring joins, broadcast predict, int128 argmax"),
    ("q_ts_cusum", "CUSUM closed form: prefix sum + anchored prefix min on one exchange"),
    ("q_events_lifecycle", "growth accounting: one user_id exchange for three windows + tiny month aggs"),
    ("q_agg_bitmap_distinct", "bitmap distinct: bucketed bitmap construct + popcount reaggregate"),
    ("q_win_streak", "streak islands: date-minus-row-number anchor, one user_id exchange"),
    ("q_events_shapley", "Shapley: user-mask agg to 8 rows, broadcast coalition lattice joins"),
    ("q_events_survival", "KM: per-day endpoints + ordered prefix sums, broadcast scalars"),
    ("q_agg_incremental_maintenance", "MV maintenance: two pre-collapsed rollups + one outer merge join"),
    ("q_dq_table_fingerprint", "table fingerprint: map-side row hashes, decimal mod-sum reaggregate"),
    ("q_sql_recursive_cte", "recursive CTE: per-level self-join closure, then one hash aggregate"),
    ("q_ts_ses", "SES: 10-tap banded self-join on the daily rollup, exact integer weights"),
    ("q_ts_changepoint", "changepoint: prefix-sum windows per type, argmax over candidate rows"),
    ("q_win_hampel", "Hampel: two banded equi-self-joins for nested rolling median/MAD"),
    ("q_ml_fpgrowth", "frequent itemsets: support aggregate + within-basket pair self-join (floor-pruned)"),
    # round-4 additions
    ("q_agg_abc_xyz", "one fact scan: cents ride the weekly rollup; checkpointed globalrank fan-out"),
    ("q_stream_interval_join_full", "full-outer interval join, batch twin: one hash join, coalesced key"),
    ("q_ts_holt", "Holt recursion: one rollup shuffle into per-series applyInPandas"),
    ("q_scan_python_datasource", "Python DataSource connector: BatchScan over 8 planned id-range partitions"),
    ("q_fn_sql_udf", "SQL UDFs inlined by Catalyst: plain codegen expressions, no Python"),
    ("q_agg_listagg", "ordered LISTAGG: broadcast dim join + single hash aggregate"),
    ("q_events_did", "DiD: one 4-cell hash aggregate + scalar min/max pass, no windows"),
    # round-4 second wave
    ("q_cdc_apply", "CDC replay: one keyed window shuffle, latest-wins, deletes dropped"),
    ("q_agg_countmin", "Count-Min: 1024-cell combinable counters + broadcast probe join"),
    ("q_graph_label_propagation", "LPA: broadcast label joins + max_by argmax, no sort windows"),
    ("q_curate_dsir", "DSIR: two fixed-size model aggs, broadcast log-ratio scoring, TakeOrdered"),
    ("q_sql_pipe_syntax", "pipe syntax lowers to the same hash-agg plan as classic SQL"),
    ("q_multimodal_phash", "pHash: map-side Arrow decode+sign GEMM, one signature shuffle"),
    ("q_stream_state_reader", "statestore source: one task per state partition, no stream replay"),
    ("q_agg_bloom_membership", "Bloom: distinct-combinable bit table, broadcast probe join"),
    ("q_agg_hll_replay", "HLL: one combinable max-agg into 1024 registers, scalar finish"),
    ("q_curate_pipeline_funnel", "funnel: one flag pass + stack unpivot, broadcast shingle semi-join"),
    ("q_scan_agg_pushdown", "footer stats: PushedAggregation, statistics-only ReadSchema"),
    ("q_agg_kmv_setops", "KMV: combinable flags agg, TakeOrdered(k) sketches, k-row algebra"),
    ("q_curate_epoch_mix", "epoch mix: broadcast quotas, per-source explode + md5-rank remainder"),
    ("q_stream_foreach_batch_upsert", "foreachBatch: dynamic partition overwrite, final-state read"),
    ("q_text_bpe_train", "BPE train: corpus collapses to word dict once; merge rounds replay on the driver"),
    ("q_text_bpe_apply", "BPE apply: map-side segment explode, one vocab aggregate, TakeOrdered"),
    ("q_scan_time_travel", "time travel: ONE distinct-file scan, per-file partials combined per version on the driver"),
    ("q_ts_ewma_irregular", "gap EWMA: one keyed shuffle + partition state machine, no per-group dispatch"),
    ("q_curate_k_anonymity", "k-anonymity: one combinable quasi-identifier aggregate, scalar flags"),
    ("q_scan_table_history", "history: manifest diffs + parquet footer num_rows on the driver, local result"),
    # round-4 continuation-2 wave
    ("q_dedup_semantic", "SemDeDup: zero-shuffle GEMM assignment, one cluster-id shuffle into per-cluster pairwise GEMM"),
    ("q_text_gopher_rules", "Gopher rules: all seven flags in one zero-shuffle codegen projection"),
    ("q_curate_perplexity_buckets", "CCNet buckets: KN scoring joins + per-lang NTILE window"),
    ("q_stream_python_datasource", "streaming Python DataSource: per-batch planned partitions into the sink"),
    ("q_sql_scripting", "SQL scripting: per-iteration pushed-filter counts, driver-held loop state"),
    ("q_ml_pca_power_exact", "exact PCA: posexplode pair grid, one combinable d^2 Gram aggregate"),
    ("q_ml_cv_stumps_exact", "CV stumps: ONE (fold,f1,f2) grid aggregate; split search + OOF replay on the driver"),
    ("q_events_msprt", "mSPRT: one (day,arm) rollup, windows over the days frame only"),
    # round-7 additions
    ("q_join_asof_bucketed", "skew-resistant as-of: (key,bucket) window + KB carry spine, no fact re-exchange"),
    ("q_join_asof_topk", "k-nearest as-of: ref numbering + spine merge-scan + explode/equi-join, no per-probe sort"),
    ("q_dq_join_cardinality", "join-size pre-flight: two per-key count aggs, KB-scale count-frame join"),
    ("q_win_frame_groups", "GROUPS frame: peer-group collapse + ROWS window on the group frame + broadcast join back"),
    ("q_win_frame_exclude", "EXCLUDE CURRENT ROW: whole-partition agg minus own contribution, no window at all"),
    ("q_agg_heavy_hitters", "exact top-k heavy hitters: mapInPandas MG summaries + broadcast-semi recount"),
    ("q_agg_decay_score", "time-decay score: one combinable integer aggregate, broadcast 1-row anchor"),
    ("q_sim_maxsim", "late-interaction MaxSim: literal probe sub-vectors, shuffle-free codegen scan + TakeOrdered"),
    ("q_set_division", "relational division: counting form, broadcast 1-row universe, no re-scan"),
    ("q_ml_woe_iv", "WOE/IV: one combinable bucket aggregate, all scoring on the buckets frame"),
    ("q_join_asof_nearest", "nearest as-of: ONE exchange, two sorted window scans, interval-compare winner"),
    ("q_sql_group_by_all", "GROUP BY ALL lowers to the explicit spelling's hash aggregate"),
    ("q_ml_linear_shap", "linear SHAP: stats agg + broadcast map-only |n*x - S| pass, 3-way explode"),
    ("q_stream_heavy_hitters", "streaming MG sketch state -> candidate nomination -> broadcast-semi exact recount"),
    ("q_win_frame_exclude_modes", "EXCLUDE GROUP/TIES: two unbounded windows on ONE exchange, algebraic exclusion"),
    ("q_join_asof_topk_bucketed", "skew-resistant k-nearest as-of: bucket windows + bounded array-carry spine"),
    ("q_join_asof_nearest_bucketed", "skew-resistant nearest as-of: (key,bucket) dual scans + ONE dual-direction carry spine"),
    ("q_text_bm25_topk", "BM25: ONE fact pass - term filter before any aggregate, df/N/T folded as literals, TakeOrdered top-10"),
    ("q_text_keyness_loglik", "keyness G2: one fact-scale count aggregate, all G2 math on the KB marginals frame"),
    ("q_sim_rrf_fusion", "RRF fusion: two TakeOrdered retriever runs, all fuse work on <= 100 rows"),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "8")
    from spark_ml_pipelines_example_spark.plans.session import get_spark
    from spark_ml_pipelines_example_spark.queries.registry import load_all

    registry = load_all()
    spark = get_spark(app_name="plan_audit")
    lines = [
        "# PLANS — executed physical plans (representative queries)",
        "",
        f"Generated by `python tools/generate_plans.py {sf_dir}`. Plans are",
        "post-execution (AQE final; `*` prefix = inside whole-stage codegen).",
        "",
    ]
    for name, why in SHOWCASE:
        df = registry[name].fn(spark, sf_dir)
        df.collect()
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        # keep the tree, drop the verbose per-node detail sections
        tree = plan.split("\n\n")[0]
        lines += [f"## {name}", "", f"_{why}_", "", "```", tree, "```", ""]
    Path("PLANS.md").write_text("\n".join(lines))
    print(f"wrote PLANS.md ({len(SHOWCASE)} plans at {sf_dir})")


if __name__ == "__main__":
    main()
