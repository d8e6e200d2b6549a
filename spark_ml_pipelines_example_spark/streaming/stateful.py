"""Custom stateful streaming operator (SURVEY §2.2 engine-only surface):
per-user running counters via ``applyInPandasWithState``.

The built-in windowed aggregations cover time-bucketed state; this is the
escape hatch for state machines Spark has no primitive for (per-entity
counters, fraud scores, CDC merge logic). Contract demonstrated here:

- state schema is declared up front (a long count + double sum);
- each micro-batch streams the group's rows as Arrow batches through the
  Python worker, folds them into state, and emits the updated totals;
- a processing-time timeout (``GroupStateTimeout``) is how production
  bounds state for entities that go quiet — here NoTimeout, since the
  equivalence test drives a finite availableNow stream;
- at 1000 executors the state store shards by the group key: the operator
  scales exactly like a shuffle on user_id, plus RocksDB-backed state.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, sum_value double"
STATE_SCHEMA = "n long, s double"


def _fold_user_totals(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_value": [s]})


def user_running_totals(events: DataFrame) -> DataFrame:
    """Streaming DataFrame of cumulative (n_events, sum_value) per user;
    each micro-batch emits one updated row per active user."""
    return events.groupBy("user_id").applyInPandasWithState(
        _fold_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_user_totals_available_now(spark, sf_dir: str) -> DataFrame:
    """Drive the stateful operator over the staged events file source to
    completion; return the final cumulative row per user (the last update
    each user emitted — n_events is monotone, so max picks it)."""
    from .jobs import SENTINEL_USER, read_events_stream

    ev = read_events_stream(spark, sf_dir).filter(F.col("user_id") != SENTINEL_USER)
    q = (
        user_running_totals(ev)
        .writeStream.format("memory")
        .queryName("user_totals_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    updates = spark.sql("SELECT * FROM user_totals_out")
    last = updates.groupBy("user_id").agg(F.max_by("sum_value", "n_events").alias("sum_value"), F.max("n_events").alias("n_events"))
    return last.select("user_id", "n_events", "sum_value")


# --- streaming heavy hitters: sketch in the stream, exact confirm in batch

HH_M = 64  # Misra-Gries counters per bucket (capacity = HH_M * HH_BUCKETS)
HH_BUCKETS = 64
HH_OUTPUT_SCHEMA = (
    "bucket int, keys array<string>, cnts array<long>, err long, total long"
)
HH_STATE_SCHEMA = "keys array<string>, cnts array<long>, err long, total long"


def _fold_bucket_sketch(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's keys into the bucket's Misra-Gries state
    (same evict-at-or-below-cut variant and bounds as
    operators/heavyhitters.py — err bounds any evicted key's true count,
    total is the bucket's exact row count)."""
    if state.exists:
        keys, cnts, err, total = state.get
        acc = dict(zip(keys, cnts))
    else:
        acc, err, total = {}, 0, 0
    for pdf in pdfs:
        total += len(pdf)
        for k, c in pdf.groupby("k", sort=False).size().items():
            acc[k] = acc.get(k, 0) + int(c)
        if len(acc) > HH_M:
            cut = sorted(acc.values(), reverse=True)[HH_M]
            err += cut
            acc = {k: v for k, v in acc.items() if v > cut}
    state.update((list(acc.keys()), [int(v) for v in acc.values()], err, total))
    yield pd.DataFrame(
        {
            "bucket": [key[0]],
            "keys": [list(acc.keys())],
            "cnts": [[int(v) for v in acc.values()]],
            "err": [err],
            "total": [total],
        }
    )


def bucket_sketch_stream(events: DataFrame, key_col) -> DataFrame:
    """Streaming DataFrame of per-bucket sketch snapshots. The key space
    shards over HH_BUCKETS hash buckets, so the state store holds
    HH_BUCKETS bounded counter tables (<= HH_M each) — per-bucket state
    is KB-scale no matter how many distinct keys the stream carries, and
    the state store scales like any keyed shuffle at 1000 executors."""
    keyed = events.select(
        key_col.alias("k"),
        F.pmod(F.xxhash64(key_col), F.lit(HH_BUCKETS)).cast("int").alias("bucket"),
    )
    return keyed.groupBy("bucket").applyInPandasWithState(
        _fold_bucket_sketch,
        outputStructType=HH_OUTPUT_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_heavy_hitters_available_now(spark, sf_dir: str, k: int = 10) -> DataFrame:
    """Speed-layer sketch + batch-layer exact confirm: drive the bucketed
    Misra-Gries sketch over the staged events stream to completion, then
    nominate the surviving candidates and EXACTLY recount them against
    the batch table (broadcast semi-join, one combinable aggregate) —
    the streaming twin of operators/heavyhitters.exact_topk_frequency,
    with the same absence-bound certificate and the same exact-groupBy
    fallback, so the final frame is the exact top-k regardless of
    micro-batch boundaries or bucket sharding."""
    from ..queries._util import t as load
    from .jobs import SENTINEL_USER, read_events_stream

    ev = read_events_stream(spark, sf_dir).filter(F.col("user_id") != SENTINEL_USER)
    composite = F.concat_ws("|", F.col("user_id"), F.col("event_type"))
    q = (
        bucket_sketch_stream(ev, composite)
        .writeStream.format("memory")
        .queryName("hh_sketch_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    snaps = spark.sql("SELECT * FROM hh_sketch_out")
    # total is monotone per bucket and emitted once per batch the bucket
    # appears in: the max-total row is each bucket's FINAL state.
    final = snaps.groupBy("bucket").agg(
        F.max_by(F.struct("keys", "err"), "total").alias("s"),
        F.max("total").alias("total"),
    )
    bounds = final.agg(
        F.sum("s.err").alias("err"), F.sum("total").alias("n_rows")
    ).head()
    err_bound, n_rows = int(bounds["err"] or 0), int(bounds["n_rows"] or 0)
    candidates = final.select(F.explode("s.keys").alias("k")).distinct()

    batch = load(spark, sf_dir, "events").select(
        F.col("user_id"), F.col("event_type"), composite.alias("k")
    )
    recount = (
        batch.join(F.broadcast(candidates), "k", "left_semi")
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("cnt"))
    )
    ordered = [F.col("cnt").desc(), F.col("user_id"), F.col("event_type")]
    top = recount.orderBy(*ordered).limit(k).collect()
    kth = int(top[-1]["cnt"]) if len(top) >= k else 0
    if not (err_bound == 0 or (len(top) >= k and kth > err_bound)):
        top = (
            batch.groupBy("user_id", "event_type")
            .agg(F.count("*").alias("cnt"))
            .orderBy(*ordered)
            .limit(k)
            .collect()
        )
    out = spark.createDataFrame(
        [(r["user_id"], r["event_type"], r["cnt"]) for r in top],
        "user_id long, event_type string, cnt long",
    )
    return out.select(
        "user_id",
        "event_type",
        "cnt",
        (F.col("cnt") / F.lit(n_rows).cast("long")).alias("share"),
    )
