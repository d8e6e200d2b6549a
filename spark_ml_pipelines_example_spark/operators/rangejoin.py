"""Bucketed range join — the scale path for pure interval predicates.

A range join with NO equi component (point ∈ [lo, hi]) is planned by
Spark as BroadcastNestedLoopJoin: every point row tested against every
interval — O(points × intervals), the plan that dies first at scale.

When interval width is bounded, the standard fix buckets the value
domain: a point lands in bucket floor(p/W); an interval [lo, hi] expands
to every bucket it overlaps (≤ ceil((hi-lo)/W)+1 rows — bounded
replication). The join becomes an EQUI join on bucket followed by the
exact containment filter — one hash shuffle, no cross product. This is
how Databricks' range-join optimization and DuckDB's IEJoin-adjacent
strategies shape the problem; here it is pure DataFrame composition.

Choose W ≈ typical interval width: larger W → fewer replicas but more
false candidates per bucket; smaller W → the reverse. Replication factor
and candidate count are both observable in the plan/metrics, so tune W
from data statistics (the interval width distribution), not guesswork.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..queries._util import dec_sum, t
from ..queries.registry import query

_BUCKET = "__range_bucket"


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point: str,
    lo: str,
    hi: str,
    bucket_width: float,
) -> DataFrame:
    """INNER-join each point row to every interval row with
    lo <= point <= hi, via equi-join on overlapping buckets. Columns of
    both inputs survive; callers project afterward.

    Inner only, by design: an outer flavor through this rewrite would be
    wrong twice over — the post-join containment filter discards
    null-extended rows, and bucket replication duplicates matched point
    rows. Outer semantics need inner-match + anti-join union; add that as
    its own operator if a caller ever needs it."""
    p = points.withColumn(_BUCKET, F.floor(F.col(point) / bucket_width))
    i = intervals.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.floor(F.col(lo) / bucket_width), F.floor(F.col(hi) / bucket_width)
            )
        ),
    )
    return (
        p.join(i, _BUCKET)
        .filter((F.col(point) >= F.col(lo)) & (F.col(point) <= F.col(hi)))
        .drop(_BUCKET)
    )


@query(
    "q_join_range_bucketed",
    oracle="""
    SELECT s_suppkey,
           COUNT(*) AS n_in_band,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
    FROM supplier JOIN customer
      ON c_acctbal >= s_acctbal - 100.0 AND c_acctbal <= s_acctbal + 100.0
    GROUP BY s_suppkey
    """,
    tags=("join", "range", "bucketed"),
)
def q_join_range_bucketed(spark, sf_dir):
    """Pure range join (no equi key): customers whose balance falls within
    ±100 of each supplier's balance. Naively a BroadcastNestedLoopJoin;
    bucketing the balance domain at W=200 (= band width) turns it into a
    hash join on bucket + exact filter — each interval replicates to ≤ 2
    buckets. Plan asserted BNL-free in tests/test_plan_quality.py."""
    s = t(spark, sf_dir, "supplier").select(
        "s_suppkey",
        (F.col("s_acctbal") - 100.0).alias("lo"),
        (F.col("s_acctbal") + 100.0).alias("hi"),
    )
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    joined = bucketed_range_join(c, s, point="c_acctbal", lo="lo", hi="hi", bucket_width=200.0)
    return joined.groupBy("s_suppkey").agg(
        F.count("*").alias("n_in_band"), dec_sum("c_acctbal").alias("sum_bal")
    )
