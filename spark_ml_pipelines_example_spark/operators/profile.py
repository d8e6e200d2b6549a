"""Data-profiling operator: per-column quality stats in ONE pass.

The first job any ingest pipeline runs over new data: null rates,
distinct counts, ranges. All columns profile in a single aggregation —
one scan, no per-column jobs (profiling 500 columns at 100 TB must not
mean 500 scans). Distinct counts use HyperLogLog sketches
(approx_count_distinct) because exact per-column distincts would each
need their own shuffle; the profile's job is triage, not bookkeeping.

The declared query q_profile_orders keeps the SQL-oracle-able subset
(exact counts/min/max); the sketch-based variant is the `profile()`
helper, rows-only territory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..queries._util import t
from ..queries.registry import query


def profile(df: DataFrame, approx_rsd: float = 0.05) -> DataFrame:
    """Wide one-row profile: per column null count + approx distinct;
    min/max for atomic (orderable) types."""
    aggs = [F.count("*").alias("n_rows")]
    for c, dtype in df.dtypes:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"))
        aggs.append(F.approx_count_distinct(c, rsd=approx_rsd).alias(f"{c}__approx_distinct"))
        if not dtype.startswith(("array", "map", "struct", "binary")):
            aggs.append(F.min(c).alias(f"{c}__min"))
            aggs.append(F.max(c).alias(f"{c}__max"))
    return df.agg(*aggs)


@query(
    "q_profile_orders",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(*) - COUNT(o_custkey) AS custkey_nulls,
           COUNT(DISTINCT o_orderstatus) AS status_distinct,
           MIN(o_totalprice) AS price_min,
           MAX(o_totalprice) AS price_max,
           MIN(CAST(o_orderdate AS DATE)) AS date_min,
           MAX(CAST(o_orderdate AS DATE)) AS date_max,
           COUNT(DISTINCT o_orderpriority) AS priority_distinct
    FROM orders
    """,
    tags=("profile", "data-quality"),
)
def q_profile_orders(spark, sf_dir):
    """Single-pass data-quality profile of orders (exact subset: null
    counts, distincts on low-cardinality columns, ranges). One scan, one
    aggregation — the shape that keeps 500-column profiling at one job."""
    o = t(spark, sf_dir, "orders")
    return o.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("o_custkey").isNull().cast("long")).alias("custkey_nulls"),
        F.countDistinct("o_orderstatus").alias("status_distinct"),
        F.min("o_totalprice").alias("price_min"),
        F.max("o_totalprice").alias("price_max"),
        F.min(F.to_date("o_orderdate")).alias("date_min"),
        F.max(F.to_date("o_orderdate")).alias("date_max"),
        F.countDistinct("o_orderpriority").alias("priority_distinct"),
    )


# Per-stratum keep-fractions as 4-hex-digit md5-prefix thresholds:
# '8000'/65536 = 0.5 exactly, '1999'/65536 ≈ 0.09999. Hex-string compare
# against the md5 prefix is the same engine-portable trick as
# q_split_hash — no RNG, no float conversion, identical in DuckDB.
_STRATA_HEX = {"A": "8000", "N": "1999", "R": "8000"}


@query(
    "q_sample_stratified",
    oracle=f"""
    SELECT l_returnflag, COUNT(*) AS n_sampled,
           CAST(SUM(l_orderkey) AS BIGINT) AS key_sum,
           CAST(SUM(l_linenumber) AS BIGINT) AS line_sum
    FROM lineitem
    WHERE substr(md5(concat_ws('|', l_orderkey, l_linenumber)), 1, 4) <
          CASE l_returnflag
               WHEN 'A' THEN '{_STRATA_HEX["A"]}'
               WHEN 'N' THEN '{_STRATA_HEX["N"]}'
               ELSE '{_STRATA_HEX["R"]}' END
    GROUP BY l_returnflag
    """,
    tags=("sample", "stratified"),
)
def q_sample_stratified(spark, sf_dir):
    """Deterministic stratified sampling: per-stratum Bernoulli keep
    decided by the md5 prefix of the row key, not a seeded RNG —
    downsampling dominant classes is the standard training-data rebalance
    step, and the hash formulation keeps membership reproducible across
    engines, runs, AND repartitionings (sampleBy's seed changes selection
    with partition layout, which silently churns eval sets at scale).
    The per-(stratum) row-key checksums pin exact membership for the
    hash check; proportions are additionally asserted in tests."""
    li = t(spark, sf_dir, "lineitem")
    h4 = F.substring(
        F.md5(F.concat_ws("|", F.col("l_orderkey"), F.col("l_linenumber"))), 1, 4
    )
    thresh = (
        F.when(F.col("l_returnflag") == "A", _STRATA_HEX["A"])
        .when(F.col("l_returnflag") == "N", _STRATA_HEX["N"])
        .otherwise(_STRATA_HEX["R"])
    )
    return (
        li.filter(h4 < thresh)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum("l_orderkey").cast("long").alias("key_sum"),
            F.sum("l_linenumber").cast("long").alias("line_sum"),
        )
    )


@query(
    "q_dq_checks",
    oracle="""
    WITH o AS (
        SELECT COUNT(*) AS n,
               COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) AS n_null_cust,
               COUNT(DISTINCT o_orderkey) AS n_distinct_ok,
               COUNT(CASE WHEN o_orderstatus NOT IN ('F','O','P') THEN 1 END)
                   AS n_bad_status,
               COUNT(CASE WHEN o_totalprice <= 0 THEN 1 END) AS n_bad_price
        FROM orders
    ), l AS (
        SELECT COUNT(*) AS n_li,
               COUNT(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 END)
                   AS n_bad_disc
        FROM lineitem
    ), refint AS (
        SELECT COUNT(*) AS n_orphans
        FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
    )
    SELECT rule, actual, passed FROM (
        SELECT 'orders.custkey_complete' AS rule,
               CAST(n_null_cust AS BIGINT) AS actual, n_null_cust = 0 AS passed
        FROM o
        UNION ALL SELECT 'orders.orderkey_unique', n - n_distinct_ok,
               n = n_distinct_ok FROM o
        UNION ALL SELECT 'orders.status_in_set', n_bad_status,
               n_bad_status = 0 FROM o
        UNION ALL SELECT 'orders.totalprice_positive', n_bad_price,
               n_bad_price = 0 FROM o
        UNION ALL SELECT 'lineitem.discount_in_range', n_bad_disc,
               n_bad_disc = 0 FROM l
        UNION ALL SELECT 'lineitem.orderkey_refint', n_orphans,
               n_orphans = 0 FROM refint
    )
    """,
    tags=("profile", "data-quality", "constraints"),
)
def q_dq_checks(spark, sf_dir):
    """Deequ-style declarative data-quality suite: completeness,
    uniqueness, accepted-values, range, and referential-integrity rules
    evaluated as ONE aggregate per table plus one anti-join — never a
    per-rule scan (500 rules at 100 TB must still be ~2 passes). Each
    rule reports its violation count and verdict as a row; the suite is
    the gate an ingest pipeline runs before promoting a batch
    (cf. q_scan_json_corrupt for the per-record quarantine side)."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    om = o.agg(
        F.count("*").alias("n"),
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("n_null_cust"),
        F.countDistinct("o_orderkey").alias("n_distinct_ok"),
        F.count(F.when(~F.col("o_orderstatus").isin("F", "O", "P"), 1)).alias(
            "n_bad_status"
        ),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("n_bad_price"),
    )
    lm = li.agg(
        F.count(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1), 1)
        ).alias("n_bad_disc"),
    )
    orphans = (
        li.select("l_orderkey")
        .join(o.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey"),
              "left_anti")
        .agg(F.count("*").alias("n_orphans"))
    )
    wide = om.crossJoin(lm).crossJoin(orphans)
    rules = wide.select(
        F.expr(
            "stack(6, "
            "'orders.custkey_complete', n_null_cust, "
            "'orders.orderkey_unique', n - n_distinct_ok, "
            "'orders.status_in_set', n_bad_status, "
            "'orders.totalprice_positive', n_bad_price, "
            "'lineitem.discount_in_range', n_bad_disc, "
            "'lineitem.orderkey_refint', n_orphans"
            ") AS (rule, actual)"
        )
    )
    return rules.select("rule", "actual", (F.col("actual") == 0).alias("passed"))
