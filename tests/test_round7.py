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
