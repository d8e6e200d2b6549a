"""Tests for the iterative connected-components operator and the grouped
pandas surfaces (driver-side oracles — neither is SQL-expressible)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_ml_pipelines_example_spark.operators import grouped_pandas as gp
from spark_ml_pipelines_example_spark.operators.clusters import connected_components
from spark_ml_pipelines_example_spark.queries.registry import load_all

REGISTRY = load_all()


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_connected_components_matches_union_find(spark, sf_dir):
    pairs_df = REGISTRY["q_dedup_ngram_jaccard"].fn(spark, sf_dir).select("doc_a", "doc_b")
    pairs = [(r.doc_a, r.doc_b) for r in pairs_df.collect()]
    assert pairs, "fixture must produce near-dup pairs"
    want = _union_find(pairs)
    got = {r.node: r.comp for r in connected_components(pairs_df).collect()}
    assert got == want


def test_connected_components_chain_converges(spark):
    """A 1000-node path graph with PERMUTED ids (the minimum sits mid-
    chain, so one-hop min propagation would need ~1000 rounds — far past
    max_rounds=20): large-star/small-star must contract it within an
    O(log n) round budget, every node labeled with the global min."""
    n = 1000
    perm = [(i * 389) % n for i in range(n)]  # 389 coprime with 1000
    chain = spark.createDataFrame(
        [(perm[i], perm[i + 1]) for i in range(n - 1)],
        "doc_a long, doc_b long",
    )
    labels, rounds = connected_components(chain, return_rounds=True)
    got = {r.node: r.comp for r in labels.collect()}
    assert set(got.values()) == {0}
    assert len(got) == n
    assert rounds <= 12, f"chain took {rounds} rounds; O(log n) bound broken"


def test_connected_components_raises_on_round_exhaustion(spark):
    """Exhausting max_rounds must raise, not return wrong labels."""
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_rounds=2)


def test_dedup_clusters_canonical_is_component_min(spark, sf_dir):
    out = REGISTRY["q_dedup_clusters"].fn(spark, sf_dir)
    rows = out.collect()
    assert rows
    for r in rows:
        assert r.canonical_doc == r.comp
        assert r.n_docs >= 2  # components come from pairs, never singletons
        assert r.canonical_doc <= r.max_doc


def test_grouped_map_zscore_matches_expression_form(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    via_pandas = {
        (r.l_returnflag, r.l_orderkey, r.l_linenumber): r.qty_z
        for r in gp.zscore_grouped_map(li).collect()
    }
    via_expr = {
        (r.l_returnflag, r.l_orderkey, r.l_linenumber): r.qty_z
        for r in gp.zscore_expression(li).collect()
    }
    assert set(via_pandas) == set(via_expr)
    for k, z in via_expr.items():
        assert via_pandas[k] == pytest.approx(z, abs=1e-9)


def test_group_normalize_moments(spark, sf_dir):
    out = {r.l_returnflag: r for r in REGISTRY["q_group_normalize"].fn(spark, sf_dir).collect()}
    assert out
    for r in out.values():
        assert r.z_mean == pytest.approx(0.0, abs=1e-3)
        assert r.z_sd == pytest.approx(1.0, abs=1e-3)


def test_pipeline_dedup_job(spark, sf_dir):
    """End-to-end dedup job: every cluster keeps exactly its canonical
    (min) doc, non-pair docs all survive, output is lang-partitioned."""
    import os

    from spark_ml_pipelines_example_spark.pipeline import run_dedup
    from spark_ml_pipelines_example_spark.queries._util import scratch_dir

    out = scratch_dir("pipeline_dedup_job", sf_dir)
    stats = run_dedup(spark, sf_dir, out, method="jaccard", overwrite=True)
    assert stats["kept_docs"] <= stats["input_docs"]

    pairs = REGISTRY["q_dedup_ngram_jaccard"].fn(spark, sf_dir).select("doc_a", "doc_b")
    comp = _union_find([(r.doc_a, r.doc_b) for r in pairs.collect()])
    in_pairs = set(comp)
    canonical = {min(n for n in comp if comp[n] == c) for c in set(comp.values())}
    expected_dropped = in_pairs - canonical

    all_ids = {r.doc_id for r in spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id").collect()}
    kept = {r.doc_id for r in spark.read.parquet(out).select("doc_id").collect()}
    assert kept == all_ids - expected_dropped
    assert any(d.startswith("lang=") for d in os.listdir(out))


def test_merge_upsert_semantics(spark, sf_dir):
    """MERGE invariants: updated keys take update values, fresh keys
    insert, untouched keys keep target values, row count = targets +
    inserts."""
    from pyspark.sql import functions as F

    from spark_ml_pipelines_example_spark.operators.merge import merge_upsert

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, s string, v double"
    )
    updates = spark.createDataFrame(
        [(2, "B", 99.0), (9, "z", 1.0)], "k long, s string, v double"
    )
    got = {r.k: (r.s, r.v) for r in merge_upsert(target, updates, "k").collect()}
    assert got == {1: ("a", 10.0), 2: ("B", 99.0), 3: ("c", 30.0), 9: ("z", 1.0)}


def test_scd2_exactly_one_current_per_key(spark, sf_dir):
    out = REGISTRY["q_scd2_history"].fn(spark, sf_dir)
    from pyspark.sql import functions as F

    per_user = out.groupBy("user_id").agg(
        F.sum(F.col("is_current").cast("int")).alias("n_current"),
        F.count("*").alias("n_versions"),
    )
    bad = per_user.filter(F.col("n_current") != 1).count()
    assert bad == 0
    # versions tile the timeline: valid_to of one = valid_from of next
    w_bad = out.filter(
        F.col("valid_to_epoch").isNotNull()
        & (F.col("valid_to_epoch") < F.col("valid_from_epoch"))
    ).count()
    assert w_bad == 0


def test_stratified_sample_proportions(spark, sf_dir):
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    totals = {r.l_returnflag: r.n for r in li.groupBy("l_returnflag").agg(F.count("*").alias("n")).collect()}
    sampled = {r.l_returnflag: r.n_sampled for r in REGISTRY["q_sample_stratified"].fn(spark, sf_dir).collect()}
    want = {"A": 0.5, "N": 0.1, "R": 0.5}
    for flag, frac in want.items():
        got_frac = sampled.get(flag, 0) / totals[flag]
        assert abs(got_frac - frac) < 0.1, (flag, got_frac, frac)


def test_profile_helper_single_job(spark, sf_dir):
    from spark_ml_pipelines_example_spark.operators.profile import profile

    row = profile(spark.read.parquet(f"{sf_dir}/orders.parquet")).head()
    assert row.n_rows > 0
    assert row.o_custkey__nulls == 0
    assert row.o_orderstatus__approx_distinct >= 2


def test_hll_sketch_union_is_lossless(spark, sf_dir):
    """Merging per-lang HLL sketches must estimate the corpus-wide
    distinct count within the sketch's error bound (the union re-targets
    the internal HLL representation, so it is near- but not bit-lossless),
    and every row of the declared query must pass its embedded tolerance."""
    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    per = d.groupBy("lang").agg(F.hll_sketch_agg("doc_id", F.lit(12)).alias("sk"))
    merged = per.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long").alias("est")
    ).head()["est"]
    direct = d.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("doc_id", F.lit(12)))
        .cast("long")
        .alias("est")
    ).head()["est"]
    exact = d.select("doc_id").distinct().count()
    assert abs(merged - direct) / exact < 0.02
    assert abs(merged - exact) / exact < 0.05

    rows = REGISTRY["q_agg_sketch_rollup"].fn(spark, sf_dir).collect()
    assert len(rows) >= 2 and any(r.grp == "ALL" for r in rows)
    assert all(abs(r.rel_error) <= 0.05 or r.exact_keys < 30 for r in rows)
