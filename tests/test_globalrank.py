"""Unit tests for the two-phase binned global running aggregate
(operators/globalrank.py): row-for-row equality with the naive single
unpartitioned window it replaces, across ties, skew, descending order,
and the all-values-equal degenerate (everything in one bin)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from spark_ml_pipelines_example_spark.operators.globalrank import (
    with_global_running,
)


def _naive(df, value_col, tiebreaks, descending):
    ordc = F.col(value_col).desc() if descending else F.col(value_col).asc()
    w = W.orderBy(ordc, *[F.col(c).asc() for c in tiebreaks])
    return df.withColumn("i_ref", F.row_number().over(w)).withColumn(
        "cum_ref", F.sum(value_col).over(w.rowsBetween(W.unboundedPreceding, 0))
    )


CASES = [
    # (rows as (key, value), descending)
    ([(i, (i * 37) % 101) for i in range(500)], False),
    ([(i, (i * 37) % 101) for i in range(500)], True),
    # heavy ties: only 3 distinct values
    ([(i, i % 3) for i in range(300)], False),
    # degenerate: all equal → one bin (never worse than the naive window)
    ([(i, 7) for i in range(100)], True),
    # skewed magnitudes spanning bins
    ([(i, 2**(i % 40)) for i in range(400)], False),
]


@pytest.mark.parametrize("rows,descending", CASES)
def test_matches_naive_window(spark, rows, descending):
    df = spark.createDataFrame(rows, "k long, v long").repartition(8)
    got = with_global_running(
        df, "v", ["k"], descending=descending, cumsum_col="cum", rank_col="i",
        n_bins=16,
    )
    ref = _naive(df, "v", ["k"], descending)
    merged = got.join(ref.select("k", "i_ref", "cum_ref"), "k")
    bad = merged.filter(
        (F.col("i") != F.col("i_ref")) | (F.col("cum") != F.col("cum_ref"))
    ).count()
    assert bad == 0


def test_double_values_rank_exact(spark):
    rows = [(i, float((i * 13) % 47) / 7.0) for i in range(300)]
    df = spark.createDataFrame(rows, "k long, v double").repartition(8)
    got = with_global_running(df, "v", ["k"], rank_col="i", n_bins=16)
    ref = _naive(df, "v", ["k"], False)
    merged = got.join(ref.select("k", "i_ref"), "k")
    assert merged.filter(F.col("i") != F.col("i_ref")).count() == 0


def test_requires_an_output(spark):
    df = spark.range(3).withColumnRenamed("id", "v")
    with pytest.raises(ValueError):
        with_global_running(df, "v", [])


def test_grouped_matches_naive_per_group_window(spark):
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window as W

    rows = [(i, f"g{i % 3}", (i * 37) % 101) for i in range(400)]
    df = spark.createDataFrame(rows, "k long, g string, v long").repartition(8)
    got = with_global_running(
        df, "v", ["k"], descending=True, rank_col="i", cumsum_col="cum",
        n_bins=16, group_cols=["g"],
    )
    w = W.partitionBy("g").orderBy(F.col("v").desc(), F.col("k").asc())
    ref = df.withColumn("i_ref", F.row_number().over(w)).withColumn(
        "cum_ref", F.sum("v").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    merged = got.join(ref.select("k", "i_ref", "cum_ref"), "k")
    bad = merged.filter(
        (F.col("i") != F.col("i_ref")) | (F.col("cum") != F.col("cum_ref"))
    ).count()
    assert bad == 0
