"""Projection / filter / predicate queries (SURVEY §2.2).

All pure Catalyst expressions — predicates reach the parquet scan as
PushedFilters, projections prune the read schema. No shuffles anywhere in
this module, so these run at scan speed regardless of data size.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ._util import t
from .registry import query


@query(
    "q_project_rename",
    oracle="""
    SELECT p_partkey AS part_id,
           p_name,
           p_retailprice * 1.1 AS price_plus_10pct,
           p_size + 1 AS size_plus_one
    FROM part
    """,
    tags=("project",),
)
def q_project_rename(spark, sf_dir):
    """select + alias + computed columns (per-row IEEE arithmetic is
    bit-deterministic in both engines, so no rounding needed)."""
    return t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("part_id"),
        "p_name",
        (F.col("p_retailprice") * 1.1).alias("price_plus_10pct"),
        (F.col("p_size") + 1).alias("size_plus_one"),
    )


@query(
    "q_filter_comparison",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount
    FROM lineitem
    WHERE l_quantity >= 30.0 AND l_quantity < 45.0 AND l_discount <> 0.0
      AND l_linenumber <= 5 AND l_returnflag = 'A' AND l_tax > 0.01
    """,
    tags=("filter",),
)
def q_filter_comparison(spark, sf_dir):
    """All six comparison predicates in one conjunction."""
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") >= 30.0)
        & (F.col("l_quantity") < 45.0)
        & (F.col("l_discount") != 0.0)
        & (F.col("l_linenumber") <= 5)
        & (F.col("l_returnflag") == "A")
        & (F.col("l_tax") > 0.01)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


@query(
    "q_filter_boolean",
    oracle="""
    SELECT c_custkey, c_acctbal, c_mktsegment, c_nationkey
    FROM customer
    WHERE (c_acctbal > 5000.0 AND c_mktsegment = 'BUILDING')
       OR NOT (c_nationkey < 10)
    """,
    tags=("filter",),
)
def q_filter_boolean(spark, sf_dir):
    """AND / OR / NOT composition."""
    c = t(spark, sf_dir, "customer")
    return c.filter(
        ((F.col("c_acctbal") > 5000.0) & (F.col("c_mktsegment") == "BUILDING"))
        | ~(F.col("c_nationkey") < 10)
    ).select("c_custkey", "c_acctbal", "c_mktsegment", "c_nationkey")


@query(
    "q_filter_in_between_like",
    oracle="""
    SELECT p_partkey, p_brand, p_type, p_size
    FROM part
    WHERE p_type IN ('ECONOMY', 'PROMO', 'STANDARD')
      AND p_size BETWEEN 10 AND 30
      AND p_name LIKE '%a%'
      AND p_brand IS NOT NULL
    """,
    tags=("filter",),
)
def q_filter_in_between_like(spark, sf_dir):
    """IN-list, BETWEEN, LIKE, IS [NOT] NULL."""
    p = t(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").isin("ECONOMY", "PROMO", "STANDARD")
        & F.col("p_size").between(10, 30)
        & F.col("p_name").like("%a%")
        & F.col("p_brand").isNotNull()
    ).select("p_partkey", "p_brand", "p_type", "p_size")


@query(
    "q_filter_conditional",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS bal_band,
           COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'OTHER') AS seg
    FROM customer
    """,
    tags=("filter", "conditional"),
)
def q_filter_conditional(spark, sf_dir):
    """CASE WHEN / COALESCE / NULLIF."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("bal_band"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("OTHER")).alias(
            "seg"
        ),
    )
