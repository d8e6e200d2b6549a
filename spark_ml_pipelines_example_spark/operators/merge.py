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


def cdc_apply(changelog: DataFrame, key: str, seq: str = "seq", op: str = "op") -> DataFrame:
    """Collapse an insert/update/delete changelog into the final
    snapshot: latest sequence number wins per key, and a key whose
    winning row is a delete leaves the snapshot. This is the CDC-replay
    core of every table-format MERGE/CDF pipeline (Debezium → Delta/
    Iceberg), expressed engine-side for plain parquet.

    Scale shape: ONE shuffle on the key (the per-key window); ties on
    seq break by op so replays are deterministic. At 100 TB the window
    is the same hash partitioning a MERGE join would need — no extra
    exchange vs the transactional implementations."""
    from pyspark.sql import Window as W

    w = W.partitionBy(key).orderBy(F.col(seq).desc(), F.col(op).desc())
    return (
        changelog.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col(op) != "D"))
        .drop("_rn", op, seq)
    )


@query(
    "q_cdc_apply",
    oracle="""
    WITH log AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice, 1 AS seq, 'I' AS op
        FROM orders
        UNION ALL
        SELECT o_orderkey, 'U',
               CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.05 AS DECIMAL(3,2)), 2) AS DOUBLE),
               2, 'U'
        FROM orders WHERE o_orderkey % 7 = 0
        UNION ALL
        SELECT o_orderkey, o_orderstatus, o_totalprice, 3, 'D'
        FROM orders WHERE o_orderkey % 13 = 0
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY seq DESC, op DESC) AS rn
        FROM log
    )
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM ranked WHERE rn = 1 AND op <> 'D'
    """,
    tags=("cdc", "merge", "changelog", "upsert"),
)
def q_cdc_apply(spark, sf_dir):
    """CDC changelog replay to a snapshot: orders arrive as inserts
    (seq 1), every 7th key is repriced by an update (seq 2, +5% in
    exact decimal cents), every 13th key is deleted (seq 3); `cdc_apply`
    collapses the log latest-wins and drops deleted keys. The oracle
    replays the identical window ranking in DuckDB — the full
    insert→update→delete lifecycle is hash-checked, including keys
    that are both updated and later deleted (%91)."""
    base = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
    updates = base.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        F.round(
            F.col("o_totalprice").cast("decimal(18,2)") * F.lit("1.05").cast("decimal(3,2)"),
            2,
        )
        .cast("double")
        .alias("o_totalprice"),
    )
    deletes = base.filter(F.col("o_orderkey") % 13 == 0)
    log = (
        base.withColumn("seq", F.lit(1)).withColumn("op", F.lit("I"))
        .unionByName(updates.withColumn("seq", F.lit(2)).withColumn("op", F.lit("U")))
        .unionByName(deletes.withColumn("seq", F.lit(3)).withColumn("op", F.lit("D")))
    )
    return cdc_apply(log, key="o_orderkey")
