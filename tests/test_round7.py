"""Round-7 additions pinned by ADVICE r6: the FPGrowth post-prune basket
recount (effective minCount must never fall below the corpus-derived
floor) and the Catalyst-expression-walk rewrite of persist_tracked's
nondeterminism guard (no string-literal false positives, every
genuinely nondeterministic construct still refused)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_fpgrowth_postprune_recount_pins_floor(spark):
    """ADVICE r6 #1. Corpus: 5 baskets; items a,b survive the floor
    (support 2 each) but x,y,z,w are sub-floor and the prune makes
    baskets 4 and 5 vanish entirely (n=5 -> n2=3). Pre-fix,
    minSupport=(2-0.5)/5 against MLlib's POST-prune basket count gave
    minCount=ceil(0.3*3)=1, admitting the pair {a,b} with support 1.
    The recount yields minSupport=1.5/3 -> minCount=2."""
    from spark_ml_pipelines_example_spark.queries.ml import _fpgrowth_fit_floored

    rows = [
        (1, "a"), (1, "b"),          # the only basket containing the pair
        (2, "a"), (2, "x"),
        (3, "b"), (3, "y"),
        (4, "z"),                     # vanishes in the prune
        (5, "w"),                     # vanishes in the prune
    ]
    items = spark.createDataFrame(rows, "basket long, item string")
    model, min_count = _fpgrowth_fit_floored(items, "basket", "item")
    assert min_count == 2
    freqs = {tuple(sorted(r["items"])): r["freq"] for r in model.freqItemsets.collect()}
    assert all(f >= min_count for f in freqs.values()), freqs
    assert ("a", "b") not in freqs  # the support-1 pair the bug admitted
    assert freqs == {("a",): 2, ("b",): 2}


def test_fpgrowth_no_prune_path_unchanged(spark):
    """Dense corpus (every item clears the floor): the prune is skipped,
    no recount job runs, and the support floor is the plain max(2, ...)."""
    from spark_ml_pipelines_example_spark.queries.ml import _fpgrowth_fit_floored

    rows = [(b, it) for b in range(1, 5) for it in ("a", "b")]
    items = spark.createDataFrame(rows, "basket long, item string")
    model, min_count = _fpgrowth_fit_floored(items, "basket", "item")
    assert min_count == 2
    freqs = {tuple(sorted(r["items"])): r["freq"] for r in model.freqItemsets.collect()}
    assert freqs == {("a",): 4, ("b",): 4, ("a", "b"): 4}


def test_persist_tracked_literal_marker_is_not_nondeterministic(spark):
    """ADVICE r6 #2: a fully deterministic frame whose STRING LITERALS
    contain the old substring markers ('rand(', 'Sample ') must persist
    cleanly under the expression-walk guard."""
    from spark_ml_pipelines_example_spark.operators._cache import (
        persist_tracked,
        release_tracked,
    )

    df = (
        spark.range(5)
        .select(
            "id",
            F.lit("compare to rand( literal").alias("x"),
            F.lit("Sample uuid( shuffle(").alias("y"),
        )
        .filter(F.col("x") != "Sample ")
    )
    out = persist_tracked(df)
    assert out.count() == 5
    release_tracked()


@pytest.mark.parametrize(
    "builder",
    [
        pytest.param(lambda df: df.select(F.rand(1).alias("r")), id="rand"),
        pytest.param(
            lambda df: df.select(F.monotonically_increasing_id().alias("m")),
            id="monotonically_increasing_id",
        ),
        pytest.param(lambda df: df.select(F.expr("uuid()").alias("u")), id="uuid"),
        pytest.param(
            lambda df: df.select(
                F.shuffle(F.array(F.lit(1), F.lit(2))).alias("s")
            ),
            id="shuffle",
        ),
        pytest.param(lambda df: df.sample(0.5, seed=7), id="sample"),
        pytest.param(
            lambda df: df.select(F.spark_partition_id().alias("p")),
            id="spark_partition_id",
        ),
        pytest.param(
            lambda df: df.select(F.input_file_name().alias("f")),
            id="input_file_name",
        ),
        pytest.param(
            # nondeterminism below a deterministic projection — the walk
            # must descend through plan children
            lambda df: df.select(F.rand(1).alias("r")).select(
                (F.col("r") * 0).alias("z")
            ),
            id="nested_child",
        ),
    ],
)
def test_persist_tracked_refuses_nondeterministic(spark, builder):
    from spark_ml_pipelines_example_spark.operators._cache import persist_tracked

    with pytest.raises(ValueError, match="nondeterministic"):
        persist_tracked(builder(spark.range(10)))


# ---------------------------------------------------------------------------
# asof_join_bucketed: skew-resistant two-phase as-of (VERDICT r6 task #4)
# ---------------------------------------------------------------------------

def _asof_corpus(spark, seed, n_keys=3, n_probes=120, n_refs=150):
    """Randomized probe/ref frames with timestamp collisions and a hot
    key (key 0 holds ~half the rows) — ties and cross-bucket gaps both
    exercised. Deterministic via `seed`."""
    import random

    rng = random.Random(seed)

    def key():
        return 0 if rng.random() < 0.5 else rng.randrange(n_keys)

    def ts():
        # cluster on a coarse grid so exact-ts ties happen, spanning
        # ~40 buckets at width=3600s
        import datetime

        s = rng.randrange(0, 40 * 3600, 300)
        us = rng.choice([0, 0, 500_000])
        return datetime.datetime(2024, 1, 1) + datetime.timedelta(
            seconds=s, microseconds=us
        )

    probes = spark.createDataFrame(
        [(key(), ts(), i) for i in range(n_probes)],
        "k long, ts timestamp_ntz, probe_id long",
    )
    refs = spark.createDataFrame(
        [(key(), ts(), 1000 + i) for i in range(n_refs)],
        "k long, ts timestamp_ntz, ref_id long",
    )
    return probes, refs


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("tolerance", [None, "INTERVAL 30 MINUTES"])
def test_asof_bucketed_parity_with_merge_scan(spark, direction, tolerance):
    """Property: asof_join_bucketed ≡ asof_join_gap on randomized skewed
    corpora, both directions, with and without tolerance, at a bucket
    width (1h) small enough that many matches cross bucket boundaries."""
    from spark_ml_pipelines_example_spark.operators.asof import (
        asof_join_bucketed,
        asof_join_gap,
    )

    seed = len(direction) * 10 + (0 if tolerance is None else 7)
    probes, refs = _asof_corpus(spark, seed=seed)
    kw = dict(
        on="k", ts="ts", payload="ref_id", alias="m",
        direction=direction, tolerance_expr=tolerance,
    )
    want = {
        r["probe_id"]: r["m"]
        for r in asof_join_gap(probes, refs, **kw).collect()
    }
    got = {
        r["probe_id"]: r["m"]
        for r in asof_join_bucketed(
            probes, refs, bucket_width_us=3_600_000_000, **kw
        ).collect()
    }
    assert got == want
    assert any(v is not None for v in want.values())  # corpus non-trivial


def test_asof_bucketed_single_hot_key_crosses_buckets(spark):
    """All rows on ONE key: the unbucketed plan would run one task; the
    bucketed plan must still answer exactly, including a probe whose
    only ref sits many buckets earlier (long carry chain) and a probe
    with no ref anywhere before it."""
    import datetime

    from spark_ml_pipelines_example_spark.operators.asof import asof_join_bucketed

    base = datetime.datetime(2024, 1, 1)

    def at(h):
        return base + datetime.timedelta(hours=h)

    probes = spark.createDataFrame(
        [(7, at(0.5), 1), (7, at(25.0), 2), (7, at(0.1), 3)],
        "k long, ts timestamp_ntz, probe_id long",
    )
    refs = spark.createDataFrame(
        [(7, at(0.2), 100)],  # only ref: hour 0.2
        "k long, ts timestamp_ntz, ref_id long",
    )
    out = {
        r["probe_id"]: r["m"]
        for r in asof_join_bucketed(
            probes, refs, on="k", ts="ts", payload="ref_id", alias="m",
            bucket_width_us=3_600_000_000,
        ).collect()
    }
    # probe 1 (hour .5): local match; probe 2 (hour 25): carry across 24
    # empty buckets; probe 3 (hour .1): no ref at-or-before -> null
    assert out == {1: 100, 2: 100, 3: None}


def test_q_join_asof_bucketed_hash(spark, duck, sf_dir):
    from spark_ml_pipelines_example_spark.queries.registry import REGISTRY, load_all
    from tests.conftest import compare_frames

    load_all()
    spec = REGISTRY["q_join_asof_bucketed"]
    assert spec.oracle is not None
    compare_frames(spec.fn(spark, sf_dir), duck, spec.oracle, "q_join_asof_bucketed")
