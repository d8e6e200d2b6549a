"""Semantic invariants for the round-3 second-wave queries (beyond the
oracle hash checks): properties that must hold on ANY corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_ml_pipelines_example_spark.queries.registry import load_all

REGISTRY = load_all()


def test_fd_profiler_true_fd_holds(spark, sf_dir):
    rows = {r.fd: r for r in REGISTRY["q_dq_functional_deps"].fn(spark, sf_dir).collect()}
    assert rows["nation_key_region"].holds  # keys determine attributes
    assert rows["nation_key_region"].n_violating == 0
    assert rows["line_part_supp"].max_rhs_card >= 1


def test_quantiles_ordered_and_bracketed(spark, sf_dir):
    out = {r.p: r for r in REGISTRY["q_agg_quantile_two_phase"].fn(spark, sf_dir).collect()}
    assert set(out) == {0.5, 0.9, 0.99}
    assert out[0.5].value_cents <= out[0.9].value_cents <= out[0.99].value_cents
    assert out[0.5].k <= out[0.9].k <= out[0.99].k


def test_retract_merge_equals_recompute(spark, sf_dir):
    """The signed-union merge must equal a direct recompute done in
    Spark itself (independent of the DuckDB oracle)."""
    from spark_ml_pipelines_example_spark.queries._util import dec, t

    got = REGISTRY["q_agg_incremental_retract"].fn(spark, sf_dir)
    o = t(spark, sf_dir, "orders").select(
        "o_custkey",
        (dec("o_totalprice") * 100).cast("long").alias("c0"),
        "o_orderkey",
    )
    corrected = o.withColumn(
        "c",
        F.when(
            F.col("o_orderkey") % 37 == 0, F.col("c0") + F.expr("c0 div 10")
        ).otherwise(F.col("c0")),
    )
    want = corrected.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"), F.sum("c").alias("cents")
    )
    diff = (
        got.select("o_custkey", "n_orders", "cents")
        .exceptAll(want.select("o_custkey", "n_orders", "cents"))
        .count()
    )
    assert diff == 0


def test_qini_curve_monotone_counts(spark, sf_dir):
    rows = sorted(
        REGISTRY["q_events_uplift_qini"].fn(spark, sf_dir).collect(),
        key=lambda r: -r.bin,
    )
    for a, b in zip(rows, rows[1:]):
        assert b.cum_nt >= a.cum_nt and b.cum_nc >= a.cum_nc
        assert b.cum_conv_t >= a.cum_conv_t
    total = rows[-1]
    assert total.cum_nt + total.cum_nc > 0


def test_kneser_ney_probabilities_positive(spark, sf_dir):
    out = REGISTRY["q_text_kneser_ney"].fn(spark, sf_dir)
    # log-probs strictly negative (p < 1) and finite
    bad = out.filter(
        F.col("avg_kn_logprob").isNull()
        | F.isnan("avg_kn_logprob")
        | (F.col("avg_kn_logprob") >= 0)
    ).count()
    assert bad == 0
