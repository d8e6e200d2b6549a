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


@query(
    "q_tpch_q14",
    oracle="""
    SELECT CAST(100.0 *
             SUM(CASE WHEN p_type LIKE 'PROMO%'
                      THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                      ELSE 0 END)
             / SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
           AS DOUBLE) AS promo_revenue_pct,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1995-10-01 00:00:00'
    """,
    tags=("composite", "tpch"),
)
def q_tpch_q14(spark, sf_dir):
    """TPC-H Q14 shape (promotion effect): one month of shipments ⋈ part,
    promo-type revenue share as a conditional-aggregate ratio. The date
    range is scan-side (PushedFilters → row-group pruning), part
    broadcasts into the fact scan, and both the numerator and denominator
    accumulate in exact decimal before ONE double division — the
    order-independence discipline matters double here because the result
    is a ratio of two sums."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-09-01") & (F.col("l_shipdate") < "1995-10-01")
    )
    p = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 18, 4)
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0).cast("decimal(18,4)"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (100.0 * F.sum(promo) / F.sum(rev)).cast("double").alias("promo_revenue_pct"),
            F.count("*").alias("n_items"),
        )
    )


# TPC-H Q18 quantity threshold, adapted to the fixture's ~4 lineitems per
# order (the classic 300 would select nothing): the p99 of per-order
# quantity sums, fixed so both engines compute the same membership.
_Q18_QTY_MIN = 262


@query(
    "q_tpch_q18",
    oracle=f"""
    WITH big AS (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > {_Q18_QTY_MIN}
    )
    SELECT c_custkey, c_name, o_orderkey,
           CAST(o_orderdate AS DATE) AS o_date,
           o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    tags=("composite", "tpch"),
)
def q_tpch_q18(spark, sf_dir):
    """TPC-H Q18 shape (large-volume customers): orders whose summed
    lineitem quantity clears a threshold, re-joined to their customers and
    lines for the report, deterministic top-100 by order value. The big
    orders come from a partial+final hash aggregate with the HAVING on
    the reduced stream; membership then drives a LEFT SEMI join on the
    fact (ids only ride the broadcast), so the full aggregate-filter-
    report runs in two shuffles + broadcasts — no correlated re-scan."""
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > _Q18_QTY_MIN)
        .select("l_orderkey")
    )
    o = t(spark, sf_dir, "orders").join(
        F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"), "left_semi"
    )
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.to_date("o_orderdate").alias("o_date"),
            "o_totalprice",
        )
        .agg(F.sum(dec("l_quantity")).cast("double").alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@query(
    "q_tpch_q4",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    """,
    tags=("composite", "tpch", "semi"),
)
def q_tpch_q4(spark, sf_dir):
    """TPC-H Q4 shape (order-priority checking), adapted to the fixture
    (no l_commitdate/l_receiptdate → 'late' = shipped >30 days after the
    order date): one quarter of orders kept when ANY of their lineitems
    shipped late, counted per priority. The EXISTS decorrelates to a
    LEFT SEMI join on l_orderkey carrying the extra range predicate —
    the lineitem side short-circuits at first match per order instead of
    aggregating all of them, and the date filter prunes the orders scan
    before the join."""
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late_exists = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return late_exists.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count")
    )


@query(
    "q_tpch_q19",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 35)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 50)
    """,
    tags=("composite", "tpch", "pushdown"),
)
def q_tpch_q19(spark, sf_dir):
    """TPC-H Q19 shape (discounted revenue, OR-of-ANDs): three disjunct
    (brand, size-band, quantity-band) clauses across a lineitem ⋈ part
    join. The planner splits the disjunction: the part-only predicate
    union (brand ∈ {1,2,3}) pushes to the dimension scan and the
    quantity envelope (1..50) to the fact scan BEFORE the join, then the
    exact disjunction filters post-join — part stays broadcast-size and
    the fact scan skips row groups on quantity min/max."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    clause = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30)
           & F.col("l_quantity").between(10, 35))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50)
           & F.col("l_quantity").between(20, 50))
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(clause)
        .agg(
            F.sum(dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 18, 4))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "q_tpch_q21",
    oracle="""
    WITH late AS (
        SELECT l_orderkey, l_suppkey
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM late l1 JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    tags=("composite", "tpch", "semi", "anti"),
)
def q_tpch_q21(spark, sf_dir):
    """TPC-H Q21 shape (suppliers who kept orders waiting), adapted:
    'late' = shipped >60 days into a finished order. A late line counts
    only when the order had other suppliers (EXISTS → LEFT SEMI) and
    NONE of them were late too (NOT EXISTS → LEFT ANTI) — the classic
    sole-blame double-correlated shape. Both correlations decorrelate to
    orderkey-hashed joins against the same late set (one shuffle key
    throughout, no per-row re-scan); supplier names broadcast at the
    end, and the top-20 is TakeOrdered."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    late = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    sole_blame = (
        late.join(
            l2,
            (F.col("o2") == F.col("l_orderkey")) & (F.col("s2") != F.col("l_suppkey")),
            "left_semi",
        ).join(
            l3,
            (F.col("o3") == F.col("l_orderkey")) & (F.col("s3") != F.col("l_suppkey")),
            "left_anti",
        )
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole_blame.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@query(
    "q_tpch_q22",
    oracle="""
    WITH bal AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS s,
               COUNT(*) AS n
        FROM customer WHERE c_acctbal > 0
    )
    SELECT c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer, bal
    WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n > s
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    """,
    tags=("composite", "tpch", "anti", "scalar-subquery"),
)
def q_tpch_q22(spark, sf_dir):
    """TPC-H Q22 shape (global sales opportunity): customers with
    above-average positive balance and no orders at all, rolled up per
    nation. The average cut is evaluated as the EXACT cross-multiplied
    decimal inequality `bal·n > Σbal` — a float average would put
    boundary rows on different sides in different engines/partition
    orders. The 1-row aggregate broadcasts into the scan; NOT EXISTS
    decorrelates to a LEFT ANTI join on o_custkey."""
    c = t(spark, sf_dir, "customer")
    bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            F.sum(dec("c_acctbal")).cast("decimal(18,2)").alias("s"),
            F.count("*").alias("n"),
        )
    )
    o = t(spark, sf_dir, "orders").select("o_custkey")
    return (
        c.crossJoin(F.broadcast(bal))
        .filter(dec("c_acctbal") * F.col("n") > F.col("s"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


@query(
    "q_tpch_q2",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    eligible AS (
        SELECT ps.l_partkey, s.s_suppkey, s.s_acctbal, s.s_name, n.n_name
        FROM ps JOIN supplier s ON ps.l_suppkey = s.s_suppkey
                JOIN nation n ON s.s_nationkey = n.n_nationkey
                JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'EUROPE'
    ),
    minbal AS (SELECT l_partkey, MIN(s_acctbal) AS mb FROM eligible GROUP BY 1)
    SELECT e.s_acctbal, e.s_name, e.n_name,
           e.l_partkey AS p_partkey, e.s_suppkey, p.p_type
    FROM eligible e
    JOIN minbal m ON e.l_partkey = m.l_partkey AND e.s_acctbal = m.mb
    JOIN part p ON p.p_partkey = e.l_partkey
    WHERE p.p_size = 15
    ORDER BY e.s_acctbal DESC, e.l_partkey, e.s_suppkey
    LIMIT 100
    """,
    tags=("composite", "tpch", "argmin"),
)
def q_tpch_q2(spark, sf_dir):
    """TPC-H Q2 shape (minimum-cost supplier), adapted: the fixture has
    no partsupp, so distinct (l_partkey, l_suppkey) pairs from lineitem
    play that role, and min s_acctbal plays min ps_supplycost. The
    correlated scalar-min subquery decorrelates to a groupBy-min +
    equality join back on (part, bal) — the argmin-per-group-via-join
    shape (vs the window formulation in q_win_topk_per_group); supplier/
    nation/region dims broadcast, the pair table shuffles once on
    partkey, top-100 is TakeOrdered."""
    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = t(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    eligible = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("l_partkey", "s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    minbal = eligible.groupBy("l_partkey").agg(F.min("s_acctbal").alias("mb"))
    return (
        eligible.join(
            minbal.withColumnRenamed("l_partkey", "mk"),
            (F.col("l_partkey") == F.col("mk")) & (F.col("s_acctbal") == F.col("mb")),
        )
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            "s_suppkey",
            "p_type",
        )
        .orderBy(F.col("s_acctbal").desc(), "p_partkey", "s_suppkey")
        .limit(100)
    )


@query(
    "q_tpch_q7",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue
    FROM (
        SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
               EXTRACT(year FROM l_shipdate) AS l_year,
               l_extendedprice, l_discount
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation nc ON c_nationkey = nc.n_nationkey
        JOIN nation ns ON s_nationkey = ns.n_nationkey
        WHERE ((nc.n_name = 'NATION_1' AND ns.n_name = 'NATION_2')
            OR (nc.n_name = 'NATION_2' AND ns.n_name = 'NATION_1'))
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY 1, 2, 3
    """,
    tags=("composite", "tpch"),
)
def q_tpch_q7(spark, sf_dir):
    """TPC-H Q7 shape (volume shipping): bilateral trade revenue between
    two nations per ship year. The nation-pair disjunction lands AFTER
    the two broadcast nation hops, the date filter pushes into the
    lineitem scan, and the only shuffle is lineitem ⋈ orders — the
    year×direction aggregate is 4 rows."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    nc = n.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation"))
    ns = n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))
    joined = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("ck"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("sk"))
        .filter(
            ((F.col("cust_nation") == "NATION_1") & (F.col("supp_nation") == "NATION_2"))
            | ((F.col("cust_nation") == "NATION_2") & (F.col("supp_nation") == "NATION_1"))
        )
    )
    rev = dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 18, 4)
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


@query(
    "q_tpch_q8",
    oracle="""
    SELECT o_year,
           sum_national, sum_total,
           ROUND(sum_national / sum_total, 6) AS mkt_share
    FROM (
        SELECT EXTRACT(year FROM o_orderdate) AS o_year,
               CAST(SUM(CASE WHEN ns.n_name = 'NATION_10'
                        THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                        ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS sum_national,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                    AS DOUBLE) AS sum_total
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation nc ON c_nationkey = nc.n_nationkey
        JOIN region r ON nc.n_regionkey = r.r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ns ON s_nationkey = ns.n_nationkey
        WHERE r.r_name = 'ASIA'
        GROUP BY 1
    )
    """,
    tags=("composite", "tpch", "market-share"),
)
def q_tpch_q8(spark, sf_dir):
    """TPC-H Q8 shape (national market share): the share of an ASIA
    region's delivered revenue supplied by one nation, per order year.
    The share is a conditional-decimal-sum / decimal-sum ratio inside
    one aggregate — never two scans; both sums are exact so the ratio is
    the same IEEE division in both engines. Customer-side region filter
    prunes before the fact shuffle; all six dims broadcast."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nc = n.select(F.col("n_nationkey").alias("ck"), F.col("n_regionkey").alias("crk"))
    ns = n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))
    rev = dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 18, 4)
    zero = F.lit(0).cast("decimal(18,4)")
    joined = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("ck"))
        .join(F.broadcast(r), F.col("crk") == F.col("r_regionkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("sk"))
    )
    agg = joined.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.sum(F.when(F.col("supp_nation") == "NATION_10", rev).otherwise(zero))
        .cast("double")
        .alias("sum_national"),
        F.sum(rev).cast("double").alias("sum_total"),
    )
    return agg.select(
        "o_year",
        "sum_national",
        "sum_total",
        F.round(F.col("sum_national") / F.col("sum_total"), 6).alias("mkt_share"),
    )


@query(
    "q_tpch_q9",
    oracle="""
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
        SELECT ns.n_name AS nation,
               EXTRACT(year FROM o_orderdate) AS o_year,
               CAST(l_extendedprice * (1 - l_discount)
                    - p_retailprice * l_quantity AS DECIMAL(18,4)) AS amount
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ns ON s_nationkey = ns.n_nationkey
        WHERE p_name LIKE '%gear%'
    )
    GROUP BY 1, 2
    """,
    tags=("composite", "tpch", "profit"),
)
def q_tpch_q9(spark, sf_dir):
    """TPC-H Q9 shape (product-type profit), adapted: the fixture has no
    ps_supplycost, so p_retailprice·quantity stands in as cost. Profit
    per supplier nation per order year for parts matching a name
    pattern. The part filter (LIKE) prunes the broadcast dim BEFORE the
    fact join — at 100 TB that broadcast-side reduction is what keeps
    the fact scan's join selective; per-line amounts go through one
    decimal cast so the profit sums are exact under any shuffle order."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%")).select(
        "p_partkey", "p_retailprice"
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sk"), F.col("n_name").alias("nation")
    )
    amount = dec(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity"),
        18,
        4,
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("sk"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )
