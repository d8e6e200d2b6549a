"""Semantic invariants for the round-2-close operators — properties the
DuckDB hash comparison can't express (monotonicity, tolerance to an
exact reference, leakage-freedom)."""

from __future__ import annotations

from spark_ml_pipelines_example_spark.queries.registry import load_all

REGISTRY = load_all()


def test_funnel_counts_monotone(spark, sf_dir):
    rows = (
        REGISTRY["q_events_funnel"].fn(spark, sf_dir).orderBy("stage_idx").collect()
    )
    counts = [r["n_users"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert rows[0]["pct_of_start"] == 1.0


def test_binned_auc_close_to_exact(spark, sf_dir):
    """The 1000-bin rank-sum AUC must sit within half a bin's worth of
    probability mass of the exact (per-distinct-score) AUC."""
    row = REGISTRY["q_ml_auc"].fn(spark, sf_dir).collect()[0]
    import duckdb

    exact = duckdb.sql(
        f"""
        WITH scored AS (
            SELECT 1.0 / (1.0 + EXP(-(o_totalprice - 30000.0) / 20000.0)) AS score,
                   CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS label
            FROM read_parquet('{sf_dir}/orders.parquet')
        )
        SELECT (SUM(CASE WHEN label = 1 THEN r END)
                - COUNT(CASE WHEN label = 1 THEN 1 END)
                  * (COUNT(CASE WHEN label = 1 THEN 1 END) + 1) / 2.0)
               / (COUNT(CASE WHEN label = 1 THEN 1 END)
                  * COUNT(CASE WHEN label = 0 THEN 1 END)) AS auc
        FROM (SELECT label,
                     -- average rank over ties
                     (RANK() OVER (ORDER BY score)
                      + COUNT(*) OVER (PARTITION BY score) - 1 + RANK() OVER (ORDER BY score))
                     / 2.0 AS r
              FROM scored)
        """
    ).fetchall()[0][0]
    assert abs(row["auc"] - float(exact)) < 0.005, (row["auc"], exact)


def test_pit_features_leak_free(spark, sf_dir):
    """Every attached feature must equal the user's spend on their most
    recent FULL day strictly before the probe's calendar day (the
    next-midnight availability rule), and probes with no prior purchase
    day must carry NULL — verified against an independent DuckDB
    recomputation."""
    import duckdb

    out = REGISTRY["q_ml_pit_features"].fn(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    con.register("pit", out)
    mism = con.execute(
        """
        WITH expected AS (
            SELECT p.event_id,
                   (SELECT CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE)
                    FROM events e
                    WHERE e.user_id = p.user_id AND e.event_type = 'purchase'
                      AND CAST(e.ts AS DATE) = (
                          SELECT MAX(CAST(e2.ts AS DATE)) FROM events e2
                          WHERE e2.user_id = p.user_id
                            AND e2.event_type = 'purchase'
                            AND CAST(e2.ts AS DATE)
                                < CAST(to_timestamp(p.ts_s) AS DATE))
                   ) AS want
            FROM pit p
        )
        SELECT COUNT(*) FROM expected e JOIN pit p USING (event_id)
        WHERE want IS DISTINCT FROM p.f_spend
          AND NOT (want IS NOT NULL AND p.f_spend IS NOT NULL
                   AND ABS(want - p.f_spend) < 1e-9)
        """
    ).fetchall()[0][0]
    assert mism == 0


def test_mix_temperature_quota_conserves_total(spark, sf_dir):
    rows = REGISTRY["q_curate_mix_temperature"].fn(spark, sf_dir).collect()
    total_docs = sum(r["n_src"] for r in rows)
    total_quota = sum(r["quota"] for r in rows)
    # floor(+0.5) rounding keeps the resampled size within |sources| docs
    assert abs(total_quota - total_docs) <= len(rows)
    for r in rows:
        assert r["quota"] == r["full_epochs"] * r["n_src"] + r["remainder_docs"]


def test_cuped_variance_reduction_is_valid(spark, sf_dir):
    """rho-squared must land in [0,1], and the CUPED adjustment must not
    invent lift: with a pooled theta, adjusted and raw lift differ only
    by theta times the arms' pre-period imbalance."""
    row = REGISTRY["q_events_cuped"].fn(spark, sf_dir).collect()[0]
    assert 0.0 <= row["var_reduction"] <= 1.0
    assert row["n_users"] > 0
    # pre-period counts can't predict sign flips stronger than the raw
    # effect unless arms were imbalanced pre-experiment; on the parity
    # split the imbalance is tiny, so the two lifts stay close
    assert abs(row["lift_cuped"] - row["lift_raw"]) < 0.5


def test_pr_auc_bounds_and_prevalence_floor(spark, sf_dir):
    """PR-AUC of the (informative) logistic score must beat the
    random-classifier baseline (= prevalence) and stay in [0,1]."""
    row = REGISTRY["q_ml_pr_auc"].fn(spark, sf_dir).collect()[0]
    assert 0.0 <= row["pr_auc"] <= 1.0
    assert 0.0 < row["prevalence"] < 1.0
    assert row["pr_auc"] > row["prevalence"]


def test_calibration_bins_partition_input(spark, sf_dir):
    """Reliability bins must partition the scored rows exactly, and each
    bin's mean predicted score must lie inside the bin's bounds."""
    import duckdb

    rows = REGISTRY["q_ml_calibration"].fn(spark, sf_dir).collect()
    n_orders = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/orders.parquet'"
    ).fetchall()[0][0]
    assert sum(r["n"] for r in rows) == n_orders
    for r in rows:
        assert r["bin"] / 10.0 - 1e-6 <= r["mean_score"] <= (r["bin"] + 1) / 10.0 + 1e-6
        assert 0.0 <= r["pos_rate"] <= 1.0


def test_benford_frequencies_sum_to_one(spark, sf_dir):
    """Digits 1-9 only; observed and expected frequencies each sum to 1
    (Benford expected by identity, observed because counts partition)."""
    rows = REGISTRY["q_dq_benford"].fn(spark, sf_dir).collect()
    assert {r["digit"] for r in rows} <= set(range(1, 10))
    assert abs(sum(r["obs_freq"] for r in rows) - 1.0) < 1e-4
    full = sum(__import__("math").log10(1 + 1 / d) for d in range(1, 10))
    assert abs(full - 1.0) < 1e-12
    for r in rows:
        assert r["chi2_term"] >= 0.0


def test_bloom_runtime_matches_plain_join(spark, sf_dir):
    """The bloom-reduced materialization must return exactly what the
    plain (unfiltered-plan) join computes — the runtime filter is an
    optimization, never a semantics change."""
    from spark_ml_pipelines_example_spark.queries.joins import bloom_reduced_join

    got = {
        r["l_returnflag"]: (r["n_items"], r["n_orders"])
        for r in REGISTRY["q_join_bloom_runtime"].fn(spark, sf_dir).collect()
    }
    want = {
        r["l_returnflag"]: (r["n_items"], r["n_orders"])
        for r in bloom_reduced_join(spark, sf_dir).collect()
    }
    assert got == want
