"""Round-9 pins: decimal(38,0) headroom in BM25/keyness integer products
(VERDICT r8 #6, ADVICE r8 #2) and the ewma floor-truncation emission
(the round-8 red driver row)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from spark_ml_pipelines_example_spark.queries.text import bm25_tfn_col, g2_cell_term

# Petabyte-corpus magnitudes: T·tf and t² far beyond 2^63, so the old
# int64 forms would wrap (the whole point of the widening).
PETA_T = 10**15  # total corpus tokens
PETA_N = 10**12  # total documents


def test_bm25_tfn_survives_petabyte_token_totals(spark):
    """44·T·tf / (20·T·tf + 6·T + 18·dl·N) at T=1e15: the numerator alone
    is 4.4e19 > 2^63. The decimal(38,0) path must produce the exact
    double(num)/double(den) of the true integers — int→double conversion
    is correctly rounded, so the expectation is computable exactly in
    Python."""
    tf, dl = 1000, 10**6
    num = 44 * PETA_T * tf
    den = 20 * PETA_T * tf + 6 * PETA_T + 18 * dl * PETA_N
    assert num > 2**63, "test magnitudes must exceed int64 to be binding"
    expected = float(num) / float(den)

    row = (
        spark.createDataFrame([(tf, dl)], "tf long, dl long")
        .select(bm25_tfn_col(PETA_T, PETA_N).alias("tfn"))
        .head()
    )
    assert row.tfn == expected


def test_bm25_tfn_identical_to_int64_form_at_fixture_scale(spark):
    """Wherever int64 suffices, the widened path must be BIT-IDENTICAL to
    the original int64 expression — that is what keeps the certified
    oracle hashes valid without re-certification."""
    tot, n_docs = 123_457, 501
    rows = [(t_, d_) for t_ in (1, 2, 7, 50) for d_ in (3, 40, 1000)]
    df = spark.createDataFrame(rows, "tf long, dl long")
    old = (44 * F.lit(tot) * F.col("tf")).cast("double") / (
        20 * F.lit(tot) * F.col("tf")
        + 6 * F.lit(tot)
        + 18 * F.col("dl") * F.lit(n_docs)
    )
    got = df.select(
        bm25_tfn_col(tot, n_docs).alias("new"), old.alias("old")
    ).collect()
    assert all(r.new == r.old for r in got)


def test_g2_cell_term_survives_petabyte_products(spark):
    """o·t = 1e9·1e15 = 1e24 > 2^63: the decimal path must agree with the
    exact-integer expectation to float64 precision (ln is the one libm
    call; everything feeding it is exactly determined)."""
    t, o, ct, cs = PETA_T, 10**9, 10**12, 10**13
    assert o * t > 2**63
    expected = o * math.log(float(o * t) / float(ct * cs))

    row = (
        spark.createDataFrame([(o, ct, cs, t)], "a long, ct long, cs long, t long")
        .select(g2_cell_term(F.col("a"), F.col("ct"), F.col("cs")).alias("g"))
        .head()
    )
    assert math.isfinite(row.g)
    assert row.g == expected or abs(row.g - expected) <= 1e-9 * abs(expected)


def test_g2_cell_term_zero_cell_and_fixture_scale_identity(spark):
    """O=0 keeps its exact-zero contract, and small-scale values equal the
    original int64 expression bit-for-bit."""
    df = spark.createDataFrame(
        [(0, 10, 20, 100), (5, 10, 20, 100), (7, 21, 9, 63)],
        "a long, ct long, cs long, t long",
    )
    old = F.when(F.col("a") == 0, F.lit(0.0)).otherwise(
        F.col("a")
        * F.log(
            (F.col("a") * F.col("t")).cast("double") / (F.col("ct") * F.col("cs"))
        )
    )
    got = df.select(
        g2_cell_term(F.col("a"), F.col("ct"), F.col("cs")).alias("new"),
        old.alias("old"),
    ).collect()
    assert all(r.new == r.old for r in got)
    assert got[0].new == 0.0


def test_ewma_repro_row_emits_floor_not_round(spark):
    """The round-8 red driver row, pinned at its exact coordinates:
    sf0.01 custkey 1484 / orderkey 12570 (dt=34, dyadic alpha 34/64)
    lands the recursion within 1 ulp of the decimal midpoint
    24303.5878125 — pandas .round(6) emitted ...812 while DuckDB
    round_even emitted ...813. The floor discipline emits ...812 from
    the identical IEEE double in BOTH engines; a future edit back to
    any rounding emission flips this row and fails here fast.

    (Note floor(v*1e6)/1e6 is deliberately NOT asserted as a fixed
    point of the emitted value — k/1e6 rounds, so v*1e6 can land just
    below k; engine-invariance comes from both engines applying the
    identical op sequence to the identical double, not from
    idempotence.)"""
    import os

    import pytest

    from spark_ml_pipelines_example_spark.queries.registry import load_all
    from tests.conftest import SF_DIR

    # ADVICE r9 #3: the repro coordinates exist only in the sf0.01
    # generation — derive its path from the suite's configured SF dir
    # (sibling directory) instead of hardcoding an absolute path, and
    # skip where that generation isn't present.
    sf001 = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.01")
    if not os.path.isdir(sf001):
        pytest.skip(f"repro row requires the sf0.01 generation ({sf001} absent)")
    df = load_all()["q_ts_ewma_irregular"].fn(spark, sf001)
    row = df.filter(
        (F.col("o_custkey") == 1484) & (F.col("o_orderkey") == 12570)
    ).head()
    assert row is not None and row.dt == 34
    assert row.level == 24303.587812


def test_union_spine_rejects_topk_ref_side_internals(spark):
    """ADVICE r8 #1: the top-k variants create __ref_ts/__ref_id on the
    ref side and reference both after the join-back — a probe frame
    carrying either name must hit the crafted ValueError from EVERY
    variant (the uniform-guard contract), not a later
    ambiguous-reference AnalysisException inside asof_join_topk."""
    import pytest

    from spark_ml_pipelines_example_spark.operators.asof import (
        asof_join,
        asof_join_topk,
    )

    for col in ("__ref_ts", "__ref_id"):
        probes = spark.createDataFrame(
            [("k", "2024-01-01 10:00:00", 1)],
            f"key string, ts string, `{col}` int",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        refs = spark.createDataFrame(
            [("k", "2024-01-01 09:00:00", 1.0)], "key string, ts string, px double"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        with pytest.raises(ValueError, match="reserved spine column"):
            asof_join_topk(probes, refs, "key", "ts", "px", k=2)
        with pytest.raises(ValueError, match="reserved spine column"):
            asof_join(probes, refs, "key", "ts", "px")


def test_bucketed_scratch_gc_reclaims_recycled_pid_by_age(spark, sf_dir):
    """ADVICE r8 #3: a dead driver's scratch table whose PID was recycled
    by an unrelated LIVE process (PID 1 here — always alive) must still
    be reclaimed once it is old enough; a FRESH table belonging to a
    live PID must survive (removing it would reintroduce the race the
    PID scheme closed)."""
    import os
    import time

    from spark_ml_pipelines_example_spark.queries._util import SCRATCH
    from spark_ml_pipelines_example_spark.queries.registry import load_all

    bkt_root = f"{SCRATCH}/bkt"
    os.makedirs(bkt_root, exist_ok=True)
    stale = os.path.join(bkt_root, "bkt_lineitem_testgc_p1")
    fresh = os.path.join(bkt_root, "bkt_orders_testgc_p1")
    os.makedirs(stale, exist_ok=True)
    os.makedirs(fresh, exist_ok=True)
    ancient = time.time() - 10 * 24 * 3600
    os.utime(stale, (ancient, ancient))

    try:
        load_all()["q_join_bucketed_colocated"].fn(spark, sf_dir).count()
        assert not os.path.isdir(stale), "aged-out recycled-PID dir kept"
        assert os.path.isdir(fresh), "fresh live-PID dir removed"
    finally:
        import shutil

        shutil.rmtree(stale, ignore_errors=True)
        shutil.rmtree(fresh, ignore_errors=True)
