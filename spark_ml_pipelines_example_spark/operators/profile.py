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
