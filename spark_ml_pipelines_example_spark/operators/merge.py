"""MERGE / upsert semantics on plain parquet (no transactional format).

The lakehouse MERGE INTO (update matched rows, insert unmatched) is a
full-outer join at heart; without Delta/Iceberg in this environment the
operator expresses exactly that join, and the write-side idempotency
comes from partition-overwrite (see streaming/jobs.run_foreach_batch_
upsert). At scale the join shuffles on the merge key once — same cost
profile as the transactional implementations, minus the log commit.

Semantics implemented (the common MERGE subset):
- matched → take the update row's non-key columns;
- not matched by target → insert the update row;
- not matched by source → keep the target row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..queries._util import t
from ..queries.registry import query


def merge_upsert(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Full-outer merge of `updates` into `target` on `key`; update rows
    win on match. Both inputs must share a schema."""
    assert target.columns == updates.columns, "merge requires aligned schemas"
    cols = [c for c in target.columns if c != key]
    tgt = target.alias("t")
    upd = updates.alias("u")
    joined = tgt.join(upd, F.col(f"t.{key}") == F.col(f"u.{key}"), "full_outer")
    return joined.select(
        F.coalesce(F.col(f"u.{key}"), F.col(f"t.{key}")).alias(key),
        *[
            F.when(F.col(f"u.{key}").isNotNull(), F.col(f"u.{c}"))
            .otherwise(F.col(f"t.{c}"))
            .alias(c)
            for c in cols
        ],
    )


@query(
    "q_merge_upsert",
    oracle="""
    WITH updates AS (
        -- decimal multiply + decimal round: double ROUND(x*1.1, 2) lands
        -- on half-cent boundaries the engines round differently (§2.4)
        SELECT o_orderkey, 'P' AS o_orderstatus,
               CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(2,1)), 2) AS DOUBLE) AS o_totalprice
        FROM orders WHERE o_orderkey % 7 = 0
        UNION ALL
        SELECT o_orderkey + 10000000, 'N', 100.0 FROM orders WHERE o_orderkey % 997 = 0
    ), target AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    )
    SELECT COALESCE(u.o_orderkey, t.o_orderkey) AS o_orderkey,
           CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_orderstatus ELSE t.o_orderstatus END AS o_orderstatus,
           CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_totalprice ELSE t.o_totalprice END AS o_totalprice
    FROM target t FULL OUTER JOIN updates u ON t.o_orderkey = u.o_orderkey
    """,
    tags=("merge", "upsert"),
)
def q_merge_upsert(spark, sf_dir):
    """MERGE INTO semantics: a deterministic update set (priced-up rows
    for keys %7, brand-new keys for %997) merged into orders — matched
    rows take the update, unmatched updates insert, untouched target rows
    survive. One shuffle on the merge key."""
    target = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    priced_up = (
        target.filter(F.col("o_orderkey") % 7 == 0)
        .select(
            "o_orderkey",
            F.lit("P").alias("o_orderstatus"),
            F.round(
                F.col("o_totalprice").cast("decimal(18,2)")
                * F.lit("1.1").cast("decimal(2,1)"),
                2,
            )
            .cast("double")
            .alias("o_totalprice"),
        )
    )
    fresh = (
        target.filter(F.col("o_orderkey") % 997 == 0)
        .select(
            (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
            F.lit("N").alias("o_orderstatus"),
            F.lit(100.0).alias("o_totalprice"),
        )
    )
    return merge_upsert(target, priced_up.unionByName(fresh), key="o_orderkey")
