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
