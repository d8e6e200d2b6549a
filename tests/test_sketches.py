"""Invariant tests for the rows-only sketch/mining queries added in the
round-2 final batch: HLL mergeable sketches (q_agg_hll_merge) and the
FPGrowth miner's full (unfiltered) output.

q_ml_fpgrowth / q_ts_ses / q_ts_forecast_naive are SQL-oracled and covered
by test_oracle_differential.py; only the claims their oracles can't see are
pinned here (size-3+ itemsets, sketch accuracy, merge semantics).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_ml_pipelines_example_spark.queries.registry import load_all

REGISTRY = load_all()


def test_hll_estimates_within_envelope(spark, sf_dir):
    """Each per-type audited-HLL estimate (m=1024 → ±1.04/√1024 ≈ 3.3%
    std err; small cardinalities ride the linear-counting branch) lands
    within 3σ of the exact distinct-user count carried in the same row,
    and so does the register-max merged global row. The native
    DataSketches surface keeps its own pin below."""
    rows = REGISTRY["q_agg_hll_merge"].fn(spark, sf_dir).collect()
    assert any(r["grp"] == "ALL" for r in rows)
    for r in rows:
        assert abs(r["approx_keys"] - r["exact_keys"]) <= max(
            3, 0.10 * r["exact_keys"]
        ), (r["grp"], r["approx_keys"], r["exact_keys"])
        assert abs(r["rel_error"]) <= 0.10 or r["exact_keys"] < 30


def test_native_datasketches_hll_surface(spark, sf_dir):
    """Spark's binary-sketch functions (hll_sketch_agg / hll_union_agg /
    hll_sketch_estimate) — the production KB-sized-sketch surface the
    audited queries re-platformed away from — still estimate within the
    DataSketches envelope and merge sketch-level."""
    from spark_ml_pipelines_example_spark.sources.io import load_table

    ev = load_table(spark, sf_dir, "events")
    sk = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk")
    )
    merged = sk.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long").alias("est")
    ).head()["est"]
    exact = ev.select("user_id").distinct().count()
    assert abs(merged - exact) <= max(3, 0.03 * exact)


def test_hll_union_is_sketch_level_not_sum(spark, sf_dir):
    """The merged row estimates |union of users|, not Σ per-type counts —
    the whole point of a mergeable sketch (users overlap across types)."""
    rows = REGISTRY["q_agg_hll_merge"].fn(spark, sf_dir).collect()
    per_type_sum = sum(r["approx_keys"] for r in rows if r["grp"] != "ALL")
    merged = next(r["approx_keys"] for r in rows if r["grp"] == "ALL")
    assert merged < per_type_sum  # heavy cross-type overlap in the fixture


def test_fpgrowth_mines_beyond_pairs(spark, sf_dir):
    """The declared result filters to size<=2 for the closed-form oracle;
    the model itself must mine larger itemsets too, every one respecting
    the absolute support floor of 2 and downward closure vs its items."""
    from pyspark.ml.fpm import FPGrowth

    from spark_ml_pipelines_example_spark.sources.io import load_table

    li = load_table(spark, sf_dir, "lineitem")
    baskets = (
        li.select("l_orderkey", "l_partkey")
        .distinct()
        .groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("items"))
    )
    n = baskets.count()
    model = FPGrowth(itemsCol="items", minSupport=1.5 / n).fit(baskets)
    freq = model.freqItemsets.cache()
    try:
        assert freq.filter(F.size("items") >= 2).count() > 0
        assert freq.filter(F.col("freq") < 2).count() == 0
        # downward closure: a frequent pair's singletons are frequent with
        # at-least-as-large support
        singles = {
            r["items"][0]: r["freq"]
            for r in freq.filter(F.size("items") == 1).collect()
        }
        for r in freq.filter(F.size("items") == 2).limit(50).collect():
            for item in r["items"]:
                assert singles.get(item, 0) >= r["freq"]
    finally:
        freq.unpersist()


def test_markov_attribution_invariants(spark, sf_dir):
    """Removal effects are non-negative, shares are a normalized simplex,
    and the base conversion probability is a probability."""
    rows = REGISTRY["q_events_markov_attribution"].fn(spark, sf_dir).collect()
    assert rows, "fixture journeys must produce channels"
    base = {r["base_conv_prob"] for r in rows}
    assert len(base) == 1 and 0.0 <= next(iter(base)) <= 1.0
    assert all(r["removal_effect"] >= 0.0 for r in rows)
    share_sum = sum(r["attribution_share"] for r in rows)
    assert abs(share_sum - 1.0) < 1e-4
    # purchase is the absorbing event, never a scored channel
    assert all(r["channel"] != "purchase" for r in rows)


def test_isotonic_fit_is_monotone_and_mean_preserving(spark, sf_dir):
    """The fitted step function is non-decreasing and reproduces the
    weighted mean of the training labels (a PAV identity)."""
    import numpy as np

    rows = (
        REGISTRY["q_ml_isotonic"].fn(spark, sf_dir).orderBy("boundary").collect()
    )
    preds = [r["prediction"] for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(preds, preds[1:]))

    from spark_ml_pipelines_example_spark.sources.io import load_table

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("d"))
        .agg(
            (F.sum(F.col("value").cast("decimal(18,2)")).cast("double") / F.count("*")).alias("label"),
            F.count("*").cast("double").alias("weight"),
        )
        .collect()
    )
    want = sum(r["label"] * r["weight"] for r in daily) / sum(r["weight"] for r in daily)
    # evaluate the step function at each training day (piecewise-linear
    # between boundaries, constant outside — MLlib semantics; boundaries
    # here are the training days themselves so lookup is exact)
    bmap = {r["boundary"]: r["prediction"] for r in rows}
    bs = np.array(sorted(bmap))
    ps = np.array([bmap[b] for b in bs])
    got_n = got_d = 0.0
    for r in daily:
        v = float(np.interp(r["d"], bs, ps))
        got_n += v * r["weight"]
        got_d += r["weight"]
    assert abs(got_n / got_d - want) < 1e-2 * abs(want)


def test_hll_rho_log2_equals_bit_length_exhaustive(duck):
    """ADVICE r5: the audited Spark rho is now integer bit-length; the
    DuckDB oracle still states FLOOR(log2(w)) + 1. Prove they agree on
    ALL 2^22 possible remainders on this platform (the 1-ulp risk is
    exactly at powers of two, and this sweep covers every one)."""
    n_diff = duck.execute(
        """
        SELECT COUNT(*) FROM range(1, 4194304) t(w)
        WHERE FLOOR(log2(w)) + 1 <> LENGTH(printf('%b', CAST(w AS BIGINT)))
        """
    ).fetchone()[0]
    assert n_diff == 0
