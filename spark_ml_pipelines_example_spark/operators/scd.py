"""Slowly-changing-dimension (SCD Type 2) history from a change log.

The dimension-history pattern every warehouse needs: a stream/log of
(key, ts, attributes) changes becomes one row per version with
[valid_from, valid_to) bounds and an is_current flag. Pure window
functions — one shuffle on the key, no self-join: valid_to is simply the
next change's timestamp (lead), null for the open version.

At scale this composes with MERGE (operators/merge.py): periodic SCD2
maintenance = merge the new log slice, re-window only the affected keys
(changes join back to current rows on key — a fraction of the table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..queries._util import t
from ..queries.registry import query


def scd2_from_changelog(
    changes: DataFrame, key: str, ts: str, tiebreak: str
) -> DataFrame:
    """One row per change with validity bounds: valid_from = change ts,
    valid_to = next change's ts for the key (null while current).
    `tiebreak` orders simultaneous changes deterministically."""
    w = W.partitionBy(key).orderBy(F.col(ts), F.col(tiebreak))
    return (
        changes.withColumn("valid_from", F.col(ts))
        .withColumn("valid_to", F.lead(ts).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )


@query(
    "q_scd2_history",
    oracle="""
    SELECT user_id, event_id,
           CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS valid_from_epoch,
           CAST(epoch(date_trunc('second',
                lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           )) AS BIGINT) AS valid_to_epoch,
           (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL) AS is_current,
           value
    FROM events WHERE event_type = 'purchase'
    """,
    tags=("scd", "window"),
)
def q_scd2_history(spark, sf_dir):
    """SCD2 dimension history built from the 'purchase' events as a
    change log: per user, every change becomes a version row with
    [valid_from, valid_to) epochs and an is_current flag — one window
    pass, no self-join. Exactly one current row per user by
    construction."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    hist = scd2_from_changelog(ev, key="user_id", ts="ts", tiebreak="event_id")
    return hist.select(
        "user_id",
        "event_id",
        F.unix_timestamp("valid_from").alias("valid_from_epoch"),
        F.unix_timestamp("valid_to").alias("valid_to_epoch"),
        "is_current",
        "value",
    )


@query(
    "q_scd2_lookup",
    oracle="""
    WITH hist AS (
        SELECT user_id, event_id AS version_id, value AS version_value,
               ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS valid_to
        FROM events WHERE event_type = 'purchase'
    ), facts AS (
        SELECT user_id, event_id AS fact_id, ts AS fact_ts
        FROM events WHERE event_type = 'click'
    )
    SELECT f.fact_id, f.user_id, h.version_id,
           ROUND(h.version_value, 4) AS version_value,
           CAST(epoch(date_trunc('second', f.fact_ts)) AS BIGINT) AS fact_epoch
    FROM facts f JOIN hist h
      ON f.user_id = h.user_id
     AND f.fact_ts >= h.valid_from
     AND (h.valid_to IS NULL OR f.fact_ts < h.valid_to)
    """,
    tags=("scd", "lookup", "temporal-join"),
)
def q_scd2_lookup(spark, sf_dir):
    """Effective-dated dimension lookup — the OTHER half of SCD2: each
    fact (click) joins to the dimension version (purchase history row)
    valid AT its event time, via equality on the key plus the half-open
    [valid_from, valid_to) containment predicate. The equality key
    carries the shuffle (hash join); the range residual filters within
    each key's versions — never a nested-loop over the table. Where
    q_join_asof_event matches *at-or-before latest*, this matches the
    *containing validity interval* (facts before any version simply
    don't match — the warehouse 'late-arriving dimension' gap, surfaced
    not papered over)."""
    ev = t(spark, sf_dir, "events")
    hist = scd2_from_changelog(
        ev.filter(F.col("event_type") == "purchase"),
        key="user_id", ts="ts", tiebreak="event_id",
    ).select(
        "user_id",
        F.col("event_id").alias("version_id"),
        F.col("value").alias("version_value"),
        "valid_from",
        "valid_to",
    )
    facts = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("f_user_id"),
        F.col("event_id").alias("fact_id"),
        F.col("ts").alias("fact_ts"),
    )
    joined = facts.join(
        hist,
        (F.col("f_user_id") == F.col("user_id"))
        & (F.col("fact_ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("fact_ts") < F.col("valid_to"))),
    )
    return joined.select(
        "fact_id",
        "user_id",
        "version_id",
        F.round("version_value", 4).alias("version_value"),
        F.unix_timestamp("fact_ts").alias("fact_epoch"),
    )
