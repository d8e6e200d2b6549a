"""Sorts, limits, set operations (SURVEY §2.2 'Sorts / limits / set ops').

The hash check is order-insensitive, so sortedness is made *value-visible*
by projecting the rank a total order assigns to each row. Top-k uses
sort+limit, which Spark executes as a TakeOrdered (per-partition heap +
driver merge of k rows) — no global sort at scale.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ._util import dec, t
from .registry import query


@query(
    "q_sort_multikey",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, status_or_null,
           ROW_NUMBER() OVER (ORDER BY status_or_null DESC NULLS FIRST,
                              o_totalprice DESC, o_orderkey) AS sort_pos
    FROM (
        SELECT o_orderkey, o_orderstatus, o_totalprice,
               NULLIF(o_orderstatus, 'P') AS status_or_null
        FROM orders
    )
    """,
    tags=("sort",),
)
def q_sort_multikey(spark, sf_dir):
    """Multi-key ORDER BY with DESC + NULLS FIRST, made hash-visible by
    embedding each row's position under that order (computed by the same
    total ordering on both engines). The position is NOT a global
    row_number window (that serializes the whole table through one
    sorted task): the leading key has ≤3 values, so sort_pos decomposes
    into per-status prefix counts (a 3-row cumulative) plus a per-status
    rank from the two-phase binned decomposition on the numeric key
    (operators/globalrank.py, grouped mode) — every window in the plan is
    partitioned or ≤1024 rows. The displayed row order still comes from
    the ordinary range-partitioned distributed sort."""
    from ..operators.globalrank import with_global_running

    o = t(spark, sf_dir, "orders").withColumn(
        "status_or_null", F.nullif(F.col("o_orderstatus"), F.lit("P"))
    )
    order = [
        F.col("status_or_null").desc_nulls_first(),
        F.col("o_totalprice").desc(),
        F.col("o_orderkey"),
    ]
    # null-safe group key (a join on the real column would drop NULLs)
    grp = o.withColumn("_grp", F.coalesce("status_or_null", F.lit("(null)")))
    ranked = with_global_running(
        grp,
        "o_totalprice",
        ["o_orderkey"],
        descending=True,
        rank_col="_i",
        group_cols=["_grp"],
    )
    sizes = grp.groupBy("_grp").agg(
        F.count(F.lit(1)).alias("_n"),
        F.max("status_or_null").alias("_status"),  # null for the null group
    )
    w_groups = W.orderBy(F.col("_status").desc_nulls_first()).rowsBetween(
        W.unboundedPreceding, -1
    )  # ≤3 rows
    prefix = sizes.select(
        "_grp", F.coalesce(F.sum("_n").over(w_groups), F.lit(0)).alias("_pre")
    )
    return (
        ranked.join(F.broadcast(prefix), "_grp")
        .select(
            "o_orderkey",
            "o_orderstatus",
            "o_totalprice",
            "status_or_null",
            (F.col("_pre") + F.col("_i")).alias("sort_pos"),
        )
        .orderBy(*order)
    )


@query(
    "q_limit_topk",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 20
    """,
    tags=("sort", "limit"),
)
def q_limit_topk(spark, sf_dir):
    """Deterministic top-20 (unique (orderkey, linenumber) tie-break).
    Plans as TakeOrderedAndProject: each task keeps a 20-row heap, driver
    merges — O(n) scan, no shuffle, the right top-k at any scale."""
    return (
        t(spark, sf_dir, "lineitem")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(20)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


@query(
    "q_set_union_all",
    oracle="""
    SELECT 'c' AS src, c_nationkey AS key FROM customer
    UNION ALL
    SELECT 's' AS src, s_nationkey AS key FROM supplier
    UNION ALL
    SELECT 'd' AS src, key FROM (
        SELECT c_nationkey AS key FROM customer
        UNION
        SELECT s_nationkey AS key FROM supplier
    )
    """,
    tags=("setop", "union"),
)
def q_set_union_all(spark, sf_dir):
    """UNION ALL (bag, no shuffle) vs UNION DISTINCT (hash-dedup shuffle),
    tagged by source; exercises both union and unionByName."""
    c = t(spark, sf_dir, "customer").select(
        F.lit("c").alias("src"), F.col("c_nationkey").alias("key")
    )
    s = t(spark, sf_dir, "supplier").select(
        F.lit("s").alias("src"), F.col("s_nationkey").alias("key")
    )
    dedup = (
        t(spark, sf_dir, "customer")
        .select(F.col("c_nationkey").alias("key"))
        .union(t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("key")))
        .distinct()
        .select(F.lit("d").alias("src"), "key")
    )
    return c.unionByName(s).unionByName(dedup)


@query(
    "q_set_intersect_except",
    oracle="""
    SELECT 'i' AS src, key FROM (
        SELECT c_nationkey AS key FROM customer
        INTERSECT
        SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'e' AS src, key FROM (
        SELECT c_nationkey AS key FROM customer
        EXCEPT
        SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'ia' AS src, key FROM (
        SELECT o_custkey AS key FROM orders
        INTERSECT ALL
        SELECT c_custkey FROM customer)
    UNION ALL
    SELECT 'ea' AS src, key FROM (
        SELECT o_custkey AS key FROM orders
        EXCEPT ALL
        SELECT c_custkey FROM customer)
    """,
    tags=("setop", "intersect"),
)
def q_set_intersect_except(spark, sf_dir):
    """INTERSECT / EXCEPT (set) + INTERSECT ALL / EXCEPT ALL (bag,
    multiplicity-aware: orders.o_custkey carries duplicates, customer keys
    are unique, so EXCEPT ALL keeps m-1 copies per key)."""
    ck = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("key"))
    sk = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("key"))
    ok = t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("key"))
    cu = t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("key"))

    def tag(df, name):
        return df.select(F.lit(name).alias("src"), "key")

    return (
        tag(ck.intersect(sk), "i")
        .unionByName(tag(ck.subtract(sk), "e"))
        .unionByName(tag(ok.intersectAll(cu), "ia"))
        .unionByName(tag(ok.exceptAll(cu), "ea"))
    )


@query(
    "q_set_unpivot",
    oracle="""
    SELECT l_returnflag, measure,
           COUNT(*) AS n,
           CAST(SUM(CAST(val AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM (
        SELECT l_returnflag, 'quantity' AS measure, l_quantity AS val FROM lineitem
        UNION ALL
        SELECT l_returnflag, 'extendedprice', l_extendedprice FROM lineitem
        UNION ALL
        SELECT l_returnflag, 'discount', l_discount FROM lineitem
        UNION ALL
        SELECT l_returnflag, 'tax', l_tax FROM lineitem
    )
    GROUP BY l_returnflag, measure
    """,
    tags=("setop", "unpivot", "melt"),
)
def q_set_unpivot(spark, sf_dir):
    """Unpivot (melt, wide→long) — the inverse of q_agg_pivot: four
    lineitem measure columns become (measure, val) rows via the native
    ``unpivot`` operator (Catalyst Expand node — the same zero-join
    machinery as rollup/cube, one scan, 4× row fan-out map-side, no
    shuffle until the aggregate). The long form then aggregates per
    (flag, measure) — the normalize-then-aggregate shape feature stores
    and metrics pipelines run constantly. The oracle spells it as the
    UNION ALL the Expand is equivalent to."""
    li = t(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=["l_returnflag"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="val",
    ).withColumn("measure", F.expr("substring(measure, 3)"))
    return long.groupBy("l_returnflag", "measure").agg(
        F.count("*").alias("n"),
        F.sum(F.col("val").cast("decimal(18,2)")).cast("double").alias("total"),
    )


@query(
    "q_set_bag_ops",
    oracle="""
    WITH a AS (
        SELECT l_partkey, l_suppkey FROM lineitem WHERE l_linestatus = 'F'
    ), b AS (
        SELECT l_partkey, l_suppkey FROM lineitem WHERE l_linestatus = 'O'
    ), ia AS (
        SELECT l_partkey, l_suppkey FROM a INTERSECT ALL
        SELECT l_partkey, l_suppkey FROM b
    ), ea AS (
        SELECT l_partkey, l_suppkey FROM a EXCEPT ALL
        SELECT l_partkey, l_suppkey FROM b
    )
    SELECT 'intersect_all' AS op, COUNT(*) AS n,
           COUNT(DISTINCT l_partkey) AS n_parts,
           CAST(SUM(l_partkey) AS BIGINT) AS key_sum
    FROM ia
    UNION ALL
    SELECT 'except_all', COUNT(*), COUNT(DISTINCT l_partkey),
           CAST(SUM(l_partkey) AS BIGINT)
    FROM ea
    """,
    tags=("setop", "bag-semantics", "intersect-all", "except-all"),
)
def q_set_bag_ops(spark, sf_dir):
    """Bag-semantics set operations — INTERSECT ALL / EXCEPT ALL keep
    MULTIPLICITY (a (part,supp) pair appearing 3× in 'F' lots and 2× in
    'O' lots intersects 2× and excepts 1×), which is what reconciliation
    jobs actually need: 'how many shipments lack a matching open order'
    is a bag difference, not a set difference. Catalyst plans both as a
    single count-and-replicate aggregate join (generate min/diff of the
    two counts) — one shuffle per side, no row-by-row anti join. The
    result projects checksums over both outputs so multiplicity is
    value-visible to the hash check."""
    li = t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_linestatus") == "F").select("l_partkey", "l_suppkey")
    b = li.filter(F.col("l_linestatus") == "O").select("l_partkey", "l_suppkey")

    def summarize(df, op):
        return df.agg(
            F.lit(op).alias("op"),
            F.count("*").alias("n"),
            F.count_distinct("l_partkey").alias("n_parts"),
            F.sum("l_partkey").alias("key_sum"),
        ).select("op", "n", "n_parts", "key_sum")

    return summarize(a.intersectAll(b), "intersect_all").unionAll(
        summarize(a.exceptAll(b), "except_all")
    )


@query(
    "q_set_transpose",
    oracle="""
    WITH agg AS (
        SELECT l_returnflag,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sum_qty,
               CAST(COUNT(*) AS DOUBLE) AS n_rows,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT m.key,
           MAX(CASE WHEN a.l_returnflag = 'A' THEN v END) AS "A",
           MAX(CASE WHEN a.l_returnflag = 'N' THEN v END) AS "N",
           MAX(CASE WHEN a.l_returnflag = 'R' THEN v END) AS "R"
    FROM agg a CROSS JOIN LATERAL (VALUES
        ('sum_qty', a.sum_qty), ('n_rows', a.n_rows), ('revenue', a.revenue)
    ) m(key, v)
    GROUP BY m.key
    """,
    tags=("setops", "transpose", "spark4"),
)
def q_set_transpose(spark, sf_dir):
    """`DataFrame.transpose()` (new in Spark 4.0): flips a metrics-wide
    aggregate frame so metrics become rows and the (bounded, known)
    group values become columns — the report-layout half of pivot, with
    the first column's VALUES becoming column names. Only valid on
    driver-sized frames by construction (the column count IS the row
    count); here the input is the 3-row per-returnflag aggregate, all
    measures pre-cast to one common DOUBLE type as transpose requires.
    The oracle restates the flip as unpivot-then-repivot (LATERAL VALUES
    + conditional MAX)."""
    li = t(spark, sf_dir, "lineitem")
    agg = (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).cast("double").alias("sum_qty"),
            F.count("*").cast("double").alias("n_rows"),
            F.sum(dec("l_extendedprice")).cast("double").alias("revenue"),
        )
    )
    return agg.transpose()


@query(
    "q_set_division",
    oracle="""
    WITH u AS (SELECT COUNT(DISTINCT o_orderpriority) AS n_universe FROM orders),
    d AS (
        SELECT o_custkey,
               COUNT(DISTINCT o_orderpriority) AS n_prio,
               COUNT(*) AS n_orders
        FROM orders GROUP BY o_custkey
    )
    SELECT d.o_custkey, d.n_orders
    FROM d CROSS JOIN u
    WHERE d.n_prio = u.n_universe
    ORDER BY d.o_custkey
    """,
    tags=("setop", "relational-division", "for-all"),
)
def q_set_division(spark, sf_dir):
    """Relational division (Codd's ÷, the FOR ALL quantifier SQL never
    got): customers whose orders cover EVERY order priority present in
    the corpus. The classic formulations are a double NOT EXISTS (two
    correlated anti-join passes) or a cross join of customers x
    priorities with an anti probe — both re-scan the fact. This is the
    single-pass counting form: one combinable aggregate to (custkey,
    #distinct priorities, #orders), a broadcast 1-row universe count, and
    an equality filter — divisor cardinality is data-derived, never
    hard-coded, and the fact is scanned once. At 100 TB the distinct
    count per key is bounded by the divisor domain (5 here), so the
    partial aggregates stay tiny."""
    o = t(spark, sf_dir, "orders")
    u = o.agg(F.countDistinct("o_orderpriority").alias("n_universe"))
    d = o.groupBy("o_custkey").agg(
        F.countDistinct("o_orderpriority").alias("n_prio"),
        F.count("*").alias("n_orders"),
    )
    # No ORDER BY on the Spark side: the driver's value hash is
    # order-insensitive and a global range sort of the quotient is pure
    # cost at scale (the oracle's ORDER BY runs in DuckDB, not here).
    return (
        d.crossJoin(F.broadcast(u))
        .filter(F.col("n_prio") == F.col("n_universe"))
        .select("o_custkey", "n_orders")
    )
