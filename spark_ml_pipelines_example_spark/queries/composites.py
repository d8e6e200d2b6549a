"""Composite analytics queries — TPC-H-shaped end-to-end plans.

Every relational operator family is covered piecewise elsewhere
(SURVEY §2.2); these four run the classic composite shapes users
actually ship — multi-join + filtered aggregate + top-k — through one
plan each, on the TPC-H-ish fixtures (Q3/Q5/Q6/Q10 analogues adapted to
the fixture schema: orders has no o_shippriority, so Q3 carries
o_orderdate instead).

Scale posture mirrors TPC-H practice: the lineitem fact never
broadcasts; dimensions (region/nation/supplier/customer at fixture
scale; region/nation always) broadcast into the fact scan; date filters
sit on the scan side of every join so partition/row-group pruning can
bite; revenue sums go through decimal casts (order-independent at any
shuffle width); top-k carries a unique tiebreak so LIMIT is
deterministic in both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ._util import dec, t
from .registry import query

_Q3_DATE = "1996-03-15"


@query(
    "q_tpch_q3",
    oracle=f"""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
               AS revenue,
           CAST(o_orderdate AS DATE) AS o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '{_Q3_DATE} 00:00:00'
      AND l_shipdate > TIMESTAMP '{_Q3_DATE} 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("composite", "tpch"),
)
def q_tpch_q3(spark, sf_dir):
    """TPC-H Q3 shape (shipping-priority): segment-filtered customers ⋈
    open orders ⋈ unshipped lineitems → top-10 orders by revenue.
    Customer and the date-filtered orders broadcast into the lineitem
    scan; the top-10 is TakeOrderedAndProject (no global sort)."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(f"{_Q3_DATE} 00:00:00").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(f"{_Q3_DATE} 00:00:00").cast("timestamp")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(dec(revenue, 18, 4)).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", F.to_date("o_orderdate").alias("o_orderdate"))
    )


@query(
    "q_tpch_q5",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
               AS revenue,
           COUNT(*) AS n_items
    FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
    tags=("composite", "tpch"),
)
def q_tpch_q5(spark, sf_dir):
    """TPC-H Q5 shape (local-supplier volume): six-table star with the
    customer-nation = supplier-nation locality condition. Lineitem is the
    only fact-size side; region→nation→supplier collapse to one broadcast
    hop each, and the locality equality rides the customer join."""
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = t(spark, sf_dir, "nation")
    s = t(spark, sf_dir, "supplier")
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(
            F.broadcast(c),
            (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(dec(revenue, 18, 4)).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "q_tpch_q6",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE)
               AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("composite", "tpch"),
)
def q_tpch_q6(spark, sf_dir):
    """TPC-H Q6 (forecast-revenue change): pure scan-side predicate
    reduction to a single global aggregate — the query whose entire cost
    is how much the scan prunes. All three predicates reach
    PushedFilters; no shuffle beyond the final 1-row combine."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec(F.col("l_extendedprice") * F.col("l_discount"), 18, 4))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "q_tpch_q10",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
               AS revenue
    FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("composite", "tpch"),
)
def q_tpch_q10(spark, sf_dir):
    """TPC-H Q10 shape (returned-item reporting): quarter of orders ⋈
    returned lineitems ⋈ customer ⋈ nation → top-20 customers by lost
    revenue. Filters push to both fact-side scans before the join."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(dec(revenue, 18, 4)).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )
