"""As-of join (backward) as a union + merge-scan window.

Spark has no native ASOF JOIN (SURVEY §2.2 `q_join_asof_event`, §4.4). The
scalable formulation:

1. tag probe rows (side=1) and reference rows (side=0);
2. union them on the shared (key, ts) spine;
3. one window pass per key, ordered by (ts, side, unique-id): running
   ``last(ref_payload, ignorenulls=True)`` assigns every probe row the most
   recent reference at-or-before it (refs sort before probes at equal ts,
   so ties match "<=" semantics);
4. keep the probe rows.

Cost: ONE shuffle on the key + a sort within partitions — linear in input,
no per-row subqueries, no broadcast-nested-loop. This is the plan shape an
as-of join must have to survive 100 TB; a correlated-probe formulation
(what the DuckDB oracle uses) is quadratic.

Alternative for few, coarse keys with dense timestamps: bucketize ts and
equi-join on (key, bucket) — not needed here since the window pass is
already single-shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_PAYLOAD = "__asof_payload"


def asof_join(
    probes: DataFrame,
    refs: DataFrame,
    on: str,
    ts: str,
    payload: str,
    alias: str = "asof_value",
) -> DataFrame:
    """For each probe row, attach `alias` = refs.`payload` of the latest ref
    row with ref.ts <= probe.ts and equal `on` key (null when none).

    Ties: refs at exactly probe.ts match; among same-ts refs the largest
    `payload` wins (deterministic, for any orderable payload type — the
    sentinel null on the probe side takes the payload column's own dtype,
    so double/decimal/string payloads survive untruncated).
    """
    probe_cols = probes.columns
    probe_types = dict(probes.dtypes)
    payload_type = refs.schema[payload].dataType
    p = probes.withColumn(_SIDE, F.lit(1)).withColumn(
        _PAYLOAD, F.lit(None).cast(payload_type)
    )
    r = refs.select(
        *[
            F.col(c) if c in (on, ts) else F.lit(None).cast(probe_types.get(c, "string")).alias(c)
            for c in probe_cols
        ],
        F.lit(0).alias(_SIDE),
        F.col(payload).alias(_PAYLOAD),
    )

    unioned = p.unionByName(r)
    w = (
        W.partitionBy(on)
        .orderBy(F.col(ts), F.col(_SIDE), F.col(_PAYLOAD))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        unioned.withColumn(alias, F.last(_PAYLOAD, ignorenulls=True).over(w))
        .filter(F.col(_SIDE) == 1)
        .drop(_SIDE, _PAYLOAD)
    )


def asof_join_gap(
    probes: DataFrame,
    refs: DataFrame,
    on: str,
    ts: str,
    payload: str,
    alias: str = "asof_value",
    *,
    direction: str = "backward",
    tolerance_expr: str | None = None,
) -> DataFrame:
    """As-of join with pandas-``merge_asof`` semantics extensions: a
    ``direction`` ('backward' = latest ref at-or-before the probe,
    'forward' = earliest ref at-or-after) and an optional ``tolerance``
    (a SQL INTERVAL expression, e.g. ``"INTERVAL 1 HOUR"``) — a match
    farther than the tolerance from the probe becomes null.

    Same single-shuffle merge-scan shape as :func:`asof_join` (one
    window pass per key — the 100 TB plan), generalized by carrying the
    matched ref's timestamp in a struct so the gap test is EXACT
    timestamp arithmetic (µs precision; no epoch-second truncation).
    'forward' is the same scan run in reverse time order: scanning
    descending, ``last(ref, ignorenulls)`` at the probe row is the
    smallest ref ts >= probe ts. Tie rule matches :func:`asof_join`:
    refs at exactly probe.ts match, and among same-ts refs the largest
    payload wins (struct ordering ends on the payload)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    probe_cols = probes.columns
    probe_types = dict(probes.dtypes)
    payload_type = refs.schema[payload].dataType
    ts_type = refs.schema[ts].dataType
    import pyspark.sql.types as T

    pair_type = T.StructType(
        [T.StructField("ts_ref", ts_type), T.StructField("val", payload_type)]
    )
    p = probes.withColumn(_SIDE, F.lit(1)).withColumn(
        _PAYLOAD, F.lit(None).cast(pair_type)
    )
    r = refs.select(
        *[
            F.col(c)
            if c in (on, ts)
            else F.lit(None).cast(probe_types.get(c, "string")).alias(c)
            for c in probe_cols
        ],
        F.lit(0).alias(_SIDE),
        F.struct(
            F.col(ts).alias("ts_ref"), F.col(payload).alias("val")
        ).alias(_PAYLOAD),
    )
    unioned = p.unionByName(r)
    order = (
        [F.col(ts), F.col(_SIDE), F.col(_PAYLOAD)]
        if direction == "backward"
        else [F.col(ts).desc(), F.col(_SIDE), F.col(_PAYLOAD)]
    )
    w = (
        W.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = (
        unioned.withColumn("__m", F.last(_PAYLOAD, ignorenulls=True).over(w))
        .filter(F.col(_SIDE) == 1)
        .drop(_SIDE, _PAYLOAD)
    )
    if tolerance_expr is not None:
        in_range = (
            F.col("__m.ts_ref") >= F.col(ts) - F.expr(tolerance_expr)
            if direction == "backward"
            else F.col("__m.ts_ref") <= F.col(ts) + F.expr(tolerance_expr)
        )
        matched = matched.withColumn(
            "__m", F.when(in_range, F.col("__m"))
        )
    return matched.withColumn(alias, F.col("__m.val")).drop("__m")
