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
    "q_tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
               AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                         AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
               AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
               AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
               AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("tpch", "composite", "flagship"),
)
def q_tpch_q1(spark, sf_dir):
    """LITERAL TPC-H Q1 (pricing summary report): the full 10-column
    measure set — including avg_disc, which the flagship q_agg_groupby
    twin omits — at the spec's DATE '1998-12-01' − 90 days shipdate
    cutoff, grouped by returnflag/linestatus. Completes the literal
    22-of-22 TPC-H shape inventory (Q1 was previously declared only via
    its q_agg_groupby shape twin). One filter → partial/final hash
    aggregate; money sums cast to exact decimal at the per-row product's
    exact scale (2dp·2dp·2dp → 6dp for charge) so results are
    partition-order independent — the §2.4 hash-stability discipline."""
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(
            F.col("l_shipdate").cast("date") <= F.lit("1998-09-02").cast("date")
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(dec(disc_price, 18, 4)).cast("double").alias("sum_disc_price"),
            F.sum(dec(charge, 18, 6)).cast("double").alias("sum_charge"),
            (F.sum(dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(dec("l_extendedprice")).cast("double") / F.count("*")).alias(
                "avg_price"
            ),
            (F.sum(dec("l_discount")).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


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


@query(
    "q_tpch_q11",
    oracle="""
    WITH ps AS (
        SELECT l_partkey, l_suppkey,
               CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(18,4)))
                    AS DECIMAL(18,4)) AS pair_value
        FROM lineitem GROUP BY 1, 2
    ), scoped AS (
        SELECT ps.l_partkey, ps.pair_value
        FROM ps JOIN supplier s ON ps.l_suppkey = s.s_suppkey
                JOIN nation n ON s.s_nationkey = n.n_nationkey
                JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'EUROPE'
    ), total AS (
        SELECT CAST(SUM(pair_value) AS DOUBLE) AS tot FROM scoped
    )
    SELECT l_partkey, CAST(SUM(pair_value) AS DOUBLE) AS value
    FROM scoped CROSS JOIN total
    GROUP BY l_partkey, tot
    HAVING CAST(SUM(pair_value) AS DOUBLE) > tot * 0.001
    """,
    tags=("composite", "tpch", "scalar-subquery"),
)
def q_tpch_q11(spark, sf_dir):
    """TPC-H Q11 shape (important stock identification), adapted: no
    partsupp, so per-(part, supplier) shipped value — Σ(extendedprice ×
    quantity) from lineitem — stands in for supplycost × availqty, and
    the scope filter is the EUROPE region's suppliers. Parts whose
    scoped value exceeds 0.1% of the scoped total survive.

    Scale shape: the original's partsupp intermediate is deliberately
    NOT materialized — the per-part value is a sum over (part, supplier)
    pair values, and a sum of per-pair sums equals the direct per-part
    sum, so the engine joins the broadcast supplier scope straight into
    the fact scan and aggregates ONCE on l_partkey (one fact shuffle
    total, vs shuffle-to-pairs + shuffle-to-parts for a literal
    transcription — measured 2.4s → 1.5s at sf0.1). The oracle keeps the
    pair-level CTE to pin the adapted semantics; exact decimal
    accumulation makes the regrouping provably value-identical. The
    grand total branches from the tiny part-level frame (AQE reuses its
    shuffle stage) and broadcasts back as the decorrelated scalar.
    """
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    scope = (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    part_values = (
        li.join(F.broadcast(scope), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_quantity")).cast("decimal(18,4)")
            )
            .cast("decimal(18,4)")
            .alias("value_dec")
        )
    )
    total = part_values.agg(F.sum("value_dec").cast("double").alias("tot"))
    return (
        part_values.crossJoin(F.broadcast(total))
        .filter(F.col("value_dec").cast("double") > F.col("tot") * 0.001)
        .select("l_partkey", F.col("value_dec").cast("double").alias("value"))
    )


@query(
    "q_tpch_q12",
    oracle="""
    SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) < 30 THEN 'fast'
                WHEN date_diff('day', o_orderdate, l_shipdate) <= 90 THEN 'normal'
                ELSE 'late' END AS latency_band,
           COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS high_line_count,
           COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1
    """,
    tags=("composite", "tpch", "conditional-agg"),
)
def q_tpch_q12(spark, sf_dir):
    """TPC-H Q12 shape (shipping-mode priority analysis), adapted: the
    fixture has no l_shipmode/commitdate/receiptdate, so the grouping
    dimension is a derived ship-latency band (days from order to ship:
    <30 fast, ≤90 normal, else late) and the measures are the classic
    Q12 conditional counts of high- vs low-priority orders per band.

    Scale shape: the date filter prunes the lineitem scan, the
    fact-to-fact join shuffles once on the order key, and the 3-group
    conditional aggregate is a map-side partial — the canonical
    join + CASE-count rollup.
    """
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    days = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.when(days < 30, "fast")
            .when(days <= 90, "normal")
            .otherwise("late")
            .alias("latency_band")
        )
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


@query(
    "q_tpch_q13",
    oracle="""
    WITH c_orders AS (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
             ON c_custkey = o_custkey
            AND o_orderpriority <> '4-NOT SPECIFIED'
        GROUP BY c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders
    GROUP BY c_count
    """,
    tags=("composite", "tpch", "outer-join"),
)
def q_tpch_q13(spark, sf_dir):
    """TPC-H Q13 shape (customer order-count distribution): LEFT join so
    order-less customers keep c_count = 0, with the exclusion predicate
    ('special' orders — adapted to the '4-NOT SPECIFIED' priority, since
    the fixture has no o_comment) inside the join condition, NOT a WHERE
    (a WHERE would silently turn the outer join inner and drop the zero
    bucket). Double aggregation: orders-per-customer, then customers-
    per-count.

    Scale shape: one shuffle on the customer key for join + first
    aggregate (co-partitioned), then a tiny second aggregate over
    |distinct counts| rows.
    """
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    joined = c.join(
        o,
        (F.col("c_custkey") == F.col("o_custkey"))
        & (F.col("o_orderpriority") != "4-NOT SPECIFIED"),
        "left",
    )
    return (
        joined.groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@query(
    "q_tpch_q15",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                    AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY 1
    ), top AS (SELECT MAX(total_revenue) AS mx FROM revenue)
    SELECT s_suppkey, s_name, total_revenue
    FROM revenue JOIN supplier ON s_suppkey = supplier_no
                 CROSS JOIN top
    WHERE total_revenue = mx
    """,
    tags=("composite", "tpch", "scalar-subquery", "argmax"),
)
def q_tpch_q15(spark, sf_dir):
    """TPC-H Q15 (top supplier): quarterly revenue per supplier, return
    the supplier(s) hitting the maximum — the view + scalar-max-subquery
    formulation, decorrelated to a 1-row broadcast cross join. Revenue
    is decimal-accumulated then cast to double, so the max-equality
    comparison is on identical bit patterns in both engines.

    Scale shape: scan-pruned by the date filter, one shuffle on
    supplier key, the max is a driver-size side input; supplier dim
    broadcasts. No global sort — the argmax is a filter, not an order.
    """
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    s = t(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
        )
        .cast("double")
        .alias("total_revenue")
    )
    top = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue.join(F.broadcast(s), F.col("s_suppkey") == F.col("supplier_no"))
        .crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q_tpch_q16",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT ps.l_suppkey) AS supplier_cnt
    FROM ps
    JOIN part ON p_partkey = ps.l_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 23)
      AND ps.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
    tags=("composite", "tpch", "anti", "distinct-agg"),
)
def q_tpch_q16(spark, sf_dir):
    """TPC-H Q16 shape (parts/supplier relationship), adapted: distinct
    (l_partkey, l_suppkey) pairs stand in for partsupp, and the
    complaint exclusion becomes 'suppliers with negative account
    balance' (fixture has no s_comment). Brand/type/size exclusions +
    NOT IN supplier set + count-distinct suppliers per (brand, type,
    size).

    Scale shape: part filter broadcasts into the pair build; the NOT IN
    decorrelates to a broadcast LEFT ANTI join (the excluded-supplier
    set is dimension-size); count-distinct plans as two-phase expand
    aggregate. No fact-side cartesian anywhere.
    """
    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 23))
    )
    bad = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q_tpch_q17",
    oracle="""
    WITH target AS (
        SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#3'
    ), avg_qty AS (
        SELECT l_partkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   / COUNT(l_quantity) AS aq
        FROM target GROUP BY 1
    )
    SELECT CAST(ROUND(
               CAST(SUM(CAST(t.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0,
               2) AS DOUBLE) AS avg_yearly
    FROM target t JOIN avg_qty a ON t.l_partkey = a.l_partkey
    WHERE t.l_quantity < 0.2 * a.aq
    """,
    tags=("composite", "tpch", "correlated-avg"),
)
def q_tpch_q17(spark, sf_dir):
    """TPC-H Q17 (small-quantity-order revenue): lineitems of one brand
    whose quantity is below 20% of that part's average quantity; the
    correlated AVG subquery decorrelates to a groupBy-avg joined back on
    the part key. The average is derived as exact-decimal-sum / count
    (one deterministic IEEE division) so the 0.2×avg threshold is
    bit-identical in both engines.

    Scale shape: brand filter broadcasts into the scan; ONE shuffle on
    l_partkey feeds both the average build and the join back
    (exchange-reused); the final global sum is a driver-size reduce.
    """
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    target = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey")).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avg_qty = target.groupBy("l_partkey").agg(
        (F.sum(dec("l_quantity")).cast("double") / F.count("l_quantity")).alias("aq")
    )
    return (
        target.join(avg_qty.withColumnRenamed("l_partkey", "ak"),
                    F.col("l_partkey") == F.col("ak"))
        .filter(F.col("l_quantity") < 0.2 * F.col("aq"))
        .agg(
            F.round(F.sum(dec("l_extendedprice")).cast("double") / 7.0, 2)
            .cast("double")
            .alias("avg_yearly")
        )
    )


@query(
    "q_tpch_q20",
    oracle="""
    WITH pair_qty AS (
        SELECT l_partkey, l_suppkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY 1, 2
    ), red AS (
        SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
    ), fair AS (
        SELECT l_partkey,
               CAST(SUM(CAST(qty AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_share
        FROM pair_qty JOIN red ON p_partkey = l_partkey
        GROUP BY 1
    ), dominant AS (
        SELECT DISTINCT pq.l_suppkey
        FROM pair_qty pq
        JOIN red ON red.p_partkey = pq.l_partkey
        JOIN fair f ON f.l_partkey = pq.l_partkey
        WHERE pq.qty > 2.0 * f.avg_share
    )
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
      AND s_suppkey IN (SELECT l_suppkey FROM dominant)
    """,
    tags=("composite", "tpch", "semi", "nested-subquery"),
)
def q_tpch_q20(spark, sf_dir):
    """TPC-H Q20 shape (potential part promotion), adapted: no
    ps_availqty, so a supplier is 'dominant' for a red part when their
    1996 shipped quantity for it exceeds 2× the average per-supplier
    share of that part; EUROPE-region suppliers appearing as dominant
    for any red part survive (the nested-IN chain of the original,
    decorrelated to aggregates + a LEFT SEMI join).

    Scale shape: the date filter prunes the pair-quantity scan; the red
    part set broadcasts twice (dimension-size); the fair-share aggregate
    reuses the pair shuffle key; the final supplier membership test is a
    broadcast semi join against a distinct supplier set far smaller than
    the dimension.
    """
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    red = t(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select("p_partkey")
    pair_qty = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(dec("l_quantity")).cast("double").alias("qty"))
        .join(F.broadcast(red), F.col("p_partkey") == F.col("l_partkey"))
        .select("l_partkey", "l_suppkey", "qty")
    )
    fair = pair_qty.groupBy(F.col("l_partkey").alias("fk")).agg(
        (F.sum(dec("qty")).cast("double") / F.count("*")).alias("avg_share")
    )
    dominant = (
        pair_qty.join(fair, F.col("l_partkey") == F.col("fk"))
        .filter(F.col("qty") > 2.0 * F.col("avg_share"))
        .select("l_suppkey")
        .distinct()
    )
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(dominant), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
    )
