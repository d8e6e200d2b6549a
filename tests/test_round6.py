"""Round-6 additions: as-of tolerance/forward joins and the join-key
skew audit — hash checks plus the edge cases the fixture can't hit
(exact tolerance boundaries, forward ties, empty ref side)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from spark_ml_pipelines_example_spark.queries.registry import REGISTRY, load_all

load_all()


def test_round6_queries_hash(spark, duck, sf_dir):
    from tests.conftest import compare_frames

    for name in (
        "q_join_asof_tolerance",
        "q_join_asof_forward",
        "q_dq_join_key_skew",
    ):
        spec = REGISTRY[name]
        assert spec.oracle is not None
        compare_frames(spec.fn(spark, sf_dir), duck, spec.oracle, name)


def _mk(spark, rows, side):
    return spark.createDataFrame(
        [(k, datetime.datetime(2024, 1, 1, 0, 0, s, us), v) for (k, s, us, v) in rows],
        f"k long, ts timestamp_ntz, {side} long",
    )


def test_asof_gap_tolerance_boundary(spark):
    """A ref EXACTLY at the tolerance bound matches (<=); one microsecond
    beyond decays to null — the exact-µs arithmetic the epoch-second
    formulation would get wrong."""
    from spark_ml_pipelines_example_spark.operators.asof import asof_join_gap

    probes = _mk(spark, [(1, 10, 0, 100), (2, 10, 0, 200)], "probe_id")
    refs = _mk(
        spark,
        [(1, 5, 0, 11), (2, 4, 999_999, 22)],  # gap 5s exact; gap 5.000001s
        "ref_id",
    )
    out = {
        r["probe_id"]: r["m"]
        for r in asof_join_gap(
            probes,
            refs,
            on="k",
            ts="ts",
            payload="ref_id",
            alias="m",
            tolerance_expr="INTERVAL 5 SECONDS",
        ).collect()
    }
    assert out == {100: 11, 200: None}


def test_asof_gap_forward_semantics(spark):
    """Forward: earliest ref at-or-after; equal-ts refs match; ties take
    the largest payload; no future ref -> null."""
    from spark_ml_pipelines_example_spark.operators.asof import asof_join_gap

    probes = _mk(spark, [(1, 10, 0, 100), (1, 20, 0, 101), (1, 30, 0, 102)], "probe_id")
    refs = _mk(
        spark,
        [(1, 10, 0, 7), (1, 10, 0, 9), (1, 25, 0, 5)],
        "ref_id",
    )
    out = {
        r["probe_id"]: r["m"]
        for r in asof_join_gap(
            probes, refs, on="k", ts="ts", payload="ref_id", alias="m",
            direction="forward",
        ).collect()
    }
    # t=10 probe: refs at t=10 match, largest payload 9 wins
    # t=20 probe: earliest at-or-after is t=25 -> 5; t=30 probe: none
    assert out == {100: 9, 101: 5, 102: None}


def test_asof_gap_backward_matches_plain_asof(spark, sf_dir):
    """tolerance=None backward must agree with the certified asof_join on
    the real fixture (same tie conventions)."""
    from spark_ml_pipelines_example_spark.operators.asof import (
        asof_join,
        asof_join_gap,
    )
    from spark_ml_pipelines_example_spark.sources.io import load_table

    ev = load_table(spark, sf_dir, "events")
    probes = ev.filter(F.col("event_type") == "purchase")
    refs = ev.filter(F.col("event_type") == "click")
    a = asof_join(probes, refs, on="user_id", ts="ts", payload="event_id", alias="m")
    b = asof_join_gap(
        probes, refs, on="user_id", ts="ts", payload="event_id", alias="m"
    )
    rows_a = {(r["event_id"], r["m"]) for r in a.select("event_id", "m").collect()}
    rows_b = {(r["event_id"], r["m"]) for r in b.select("event_id", "m").collect()}
    assert rows_a == rows_b


def test_asof_gap_rejects_bad_direction(spark):
    import pytest

    from spark_ml_pipelines_example_spark.operators.asof import asof_join_gap

    df = _mk(spark, [(1, 1, 0, 1)], "x")
    with pytest.raises(ValueError, match="backward|forward"):
        asof_join_gap(df, df, on="k", ts="ts", payload="x", direction="sideways")


def test_join_key_skew_math(spark):
    """share and skew factor are the exact single-division ratios, and
    the top-10 ordering is (cnt desc, key asc)."""
    rows = [(1,)] * 6 + [(2,)] * 3 + [(3,)] * 1
    ev = spark.createDataFrame(rows, "user_id long")
    keyed = ev.groupBy("user_id").agg(F.count("*").alias("cnt"))
    tot = keyed.agg(F.sum("cnt").alias("n_rows"), F.count("*").alias("n_keys"))
    out = (
        keyed.crossJoin(F.broadcast(tot))
        .select(
            "user_id",
            "cnt",
            (F.col("cnt") / F.col("n_rows")).alias("share"),
            ((F.col("cnt") * F.col("n_keys")) / F.col("n_rows")).alias("skew"),
        )
        .orderBy(F.col("cnt").desc(), "user_id")
        .collect()
    )
    assert [(r["user_id"], r["cnt"]) for r in out] == [(1, 6), (2, 3), (3, 1)]
    assert out[0]["share"] == 0.6 and out[0]["skew"] == 1.8
    assert out[2]["skew"] == 0.3


def test_asof_gap_random_parity_with_bruteforce(spark):
    """200 seeded random cases, every (direction, tolerance) combo,
    checked against a per-row brute force — ties, equal timestamps,
    empty ref sides, and boundary gaps included. All cases ride ONE
    Spark job per combo (case id folded into the join key)."""
    import random

    from spark_ml_pipelines_example_spark.operators.asof import asof_join_gap

    rng = random.Random(20260815)
    probes_rows, refs_rows, cases = [], [], []
    for case in range(200):
        key = case  # one key per case -> cases independent in one pass
        ps = sorted(rng.sample(range(0, 50), rng.randint(1, 4)))
        rs = [rng.randrange(0, 50) for _ in range(rng.randint(0, 5))]
        probe = [(key, t, 1000 * case + i) for i, t in enumerate(ps)]
        ref = [(key, t, 2000 * case + i) for i, t in enumerate(rs)]
        probes_rows += probe
        refs_rows += ref
        cases.append((probe, ref))

    def brute(probe, ref, direction, tol):
        out = {}
        for (_, pt, pid) in probe:
            if direction == "backward":
                cand = [(rt, rv) for (_, rt, rv) in ref if rt <= pt and (tol is None or pt - rt <= tol)]
                best = max(cand) if cand else None  # latest ts, then largest payload
            else:
                cand = [(rt, rv) for (_, rt, rv) in ref if rt >= pt and (tol is None or rt - pt <= tol)]
                best = min(cand, key=lambda x: (x[0], -x[1])) if cand else None
            out[pid] = best[1] if best else None
        return out

    mk = lambda rows, col: spark.createDataFrame(  # noqa: E731
        [(k, datetime.datetime(2024, 1, 1, 0, 0, t), v) for (k, t, v) in rows],
        f"k long, ts timestamp_ntz, {col} long",
    )
    probes_df, refs_df = mk(probes_rows, "pid"), mk(refs_rows, "rid")
    for direction in ("backward", "forward"):
        for tol_s in (None, 7):
            got = {
                r["pid"]: r["m"]
                for r in asof_join_gap(
                    probes_df, refs_df, on="k", ts="ts", payload="rid", alias="m",
                    direction=direction,
                    tolerance_expr=None if tol_s is None else f"INTERVAL {tol_s} SECONDS",
                ).collect()
            }
            want = {}
            for probe, ref in cases:
                want.update(brute(probe, ref, direction, tol_s))
            assert got == want, (direction, tol_s)


def test_hll_rolling_invariants(spark, sf_dir):
    """Rolling-merge sanity beyond the hash check: windows are supersets
    of single days (estimate never below the max single-day estimate in
    its window is NOT guaranteed by HLL, but the EXACT trailing distinct
    must be >= any single day's exact distinct), rel_error is small at
    1024 registers, and day 7+ windows cover exactly 7 days of rows."""
    import datetime as dt

    rows = {r["day"]: r for r in REGISTRY["q_agg_hll_rolling"].fn(spark, sf_dir).collect()}
    assert len(rows) == 30
    for day, r in rows.items():
        assert abs(r["rel_error"]) < 0.1, (day, r["rel_error"])
        assert r["exact_users"] > 0 and r["n_rows"] > 0
    days = sorted(rows)
    # trailing window is monotone-ish: a 7-day window's exact distinct
    # >= the same day's single-day distinct (subset relation) — derive
    # single-day from the fixture directly
    from pyspark.sql import functions as F  # noqa: F811

    from spark_ml_pipelines_example_spark.sources.io import load_table

    ev = load_table(spark, sf_dir, "events")
    single = {
        r["day"]: r["u"]
        for r in ev.groupBy(F.to_date("ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("u"))
        .collect()
    }
    for day in days:
        assert rows[day]["exact_users"] >= single[day]
    # interior windows (7 full days available) have n_rows = sum of the
    # 7 single-day row counts
    per_day_n = {
        r["day"]: r["n"]
        for r in ev.groupBy(F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for day in days[6:]:
        want = sum(
            per_day_n.get(day - dt.timedelta(days=k), 0) for k in range(7)
        )
        assert rows[day]["n_rows"] == want, day
