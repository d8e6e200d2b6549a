"""Streaming-semantics operators, batch form (SURVEY §2.2 'Streaming').

Each query here is the *batch* DataFrame formulation the driver oracle-
checks; ``streaming/jobs.py`` runs the identical logic as a Structured
Streaming query (watermark + availableNow) and the test suite asserts
batch ≡ streaming. Windows are projected as epoch-second starts (§2.4.4).

Scale posture: tumbling/sliding windows are plain hash aggregates on the
bucketed time key (map-side partial agg applies); session windows use
Spark's native ``session_window`` (state-store-backed in streaming,
sort-merge in batch); dedup is a per-key window top-1, which Catalyst
executes as WindowGroupLimit.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ._util import dec, t
from .registry import query


@query(
    "q_stream_tumbling",
    oracle="""
    SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("stream", "tumbling"),
)
def q_stream_tumbling(spark, sf_dir):
    """Tumbling 1-hour window count/sum per event type —
    ``F.window(ts, '1 hour')``; streaming twin adds withWatermark."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum(dec("value")).cast("double").alias("sum_value"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@query(
    "q_stream_sliding",
    oracle="""
    WITH assigned AS (
        SELECT CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT) AS s1, value FROM events
        UNION ALL
        SELECT CAST(floor(epoch(ts) / 1800) * 1800 - 1800 AS BIGINT) AS s1, value FROM events
    )
    SELECT s1 AS window_start, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM assigned GROUP BY s1
    """,
    tags=("stream", "sliding"),
)
def q_stream_sliding(spark, sf_dir):
    """Sliding window (1 h length, 30 min slide): every event lands in
    exactly two windows. Oracle formulation: union of the two shifted
    30-minute grid assignments."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"), F.sum(dec("value")).cast("double").alias("sum_value"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "n",
            "sum_value",
        )
    )


@query(
    "q_stream_session",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                         OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                            >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ), sessions AS (
        SELECT user_id, ts, value,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        FROM flagged
    )
    SELECT user_id,
           CAST(epoch(date_trunc('second', MIN(ts))) AS BIGINT) AS sess_start,
           CAST(epoch(date_trunc('second', MAX(ts) + INTERVAL 30 MINUTE)) AS BIGINT) AS sess_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM sessions GROUP BY user_id, sess_id
    """,
    tags=("stream", "session"),
)
def q_stream_session(spark, sf_dir):
    """Session windows per user, 30-minute gap — native ``session_window``
    (merges events whose gap is < 30 min; window end = last event + gap).
    Oracle is the gap-and-island SQL with the same strict >= boundary
    (SURVEY §7 hard-part (e))."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum(dec("value")).cast("double").alias("sum_value"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).alias("sess_start"),
            F.unix_timestamp(F.col("w.end")).alias("sess_end"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "q_stream_late_dedup",
    oracle="""
    SELECT event_id,
           CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS first_epoch,
           user_id, value
    FROM events
    QUALIFY ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY ts, value, user_id) = 1
    """,
    tags=("stream", "dedup"),
)
def q_stream_late_dedup(spark, sf_dir):
    """Late/duplicate-event policy: keep the earliest occurrence per
    event_id (streaming twin: ``dropDuplicatesWithinWatermark``). Batch
    form is a per-key top-1 window."""
    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("event_id").orderBy("ts", "value", "user_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id",
            F.unix_timestamp("ts").alias("first_epoch"),
            "user_id",
            "value",
        )
    )


@query(
    "q_stream_gapfill",
    oracle="""
    WITH bounds AS (
        SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
        FROM events
    ), grid AS (
        SELECT event_type, g AS bucket
        FROM (SELECT DISTINCT event_type FROM events),
             (SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS g FROM bounds)
    ), agg AS (
        SELECT event_type, date_trunc('hour', ts) AS bucket, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT grid.event_type,
           CAST(epoch(grid.bucket) AS BIGINT) AS bucket_epoch,
           COALESCE(agg.n, 0) AS n
    FROM grid LEFT JOIN agg
      ON grid.event_type = agg.event_type AND grid.bucket = agg.bucket
    """,
    tags=("stream", "timeseries", "gapfill"),
)
def q_stream_gapfill(spark, sf_dir):
    """Time-series gap filling: a dense (event_type × hour) grid built
    with sequence()+explode, left-joined to the hourly counts so silent
    hours appear as zero rows — what every downstream charting/alerting
    consumer needs and raw groupBy can't give. The grid is generated from
    the corpus' own min/max hour (one tiny aggregation job), so the scan
    stays one pass; grid size = types × hours, always broadcastable."""
    ev = t(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    ).head()
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(
            ev.sparkSession.range(1)
            .select(
                F.explode(
                    F.sequence(
                        F.lit(bounds.lo), F.lit(bounds.hi), F.expr("INTERVAL 1 HOUR")
                    )
                ).alias("bucket")
            )
        )
    )
    agg = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(F.count("*").alias("n"))
    return (
        grid.join(agg, ["event_type", "bucket"], "left")
        .select(
            "event_type",
            F.unix_timestamp("bucket").alias("bucket_epoch"),
            F.coalesce("n", F.lit(0)).alias("n"),
        )
    )


@query(
    "q_stream_interval_join",
    oracle="""
    WITH p AS (SELECT event_id AS p_id, user_id, ts AS p_ts FROM events
               WHERE event_type = 'purchase'),
         c AS (SELECT event_id AS c_id, user_id, ts AS c_ts FROM events
               WHERE event_type = 'click')
    SELECT p_id, c_id, p.user_id AS user_id,
           CAST(epoch(date_trunc('second', p_ts)) AS BIGINT) AS p_epoch,
           CAST(epoch(date_trunc('second', c_ts)) AS BIGINT) AS c_epoch
    FROM p JOIN c ON p.user_id = c.user_id
     AND c_ts >= p_ts - INTERVAL 1 HOUR AND c_ts <= p_ts
    """,
    tags=("stream", "interval-join"),
)
def q_stream_interval_join(spark, sf_dir):
    """Stream-stream interval join, batch form: each purchase paired with
    the same user's clicks in the preceding hour. The streaming twin
    (``streaming/jobs.py streaming_interval_join``) runs the identical
    condition with watermarks on BOTH sides — the time bound is what lets
    the state store evict clicks older than 1 h + delay, keeping
    stream-stream join state finite; tests assert batch ≡ streaming
    row-for-row. In batch the equi key (user_id) drives a hash join and
    the interval predicate evaluates inside it — never a cross product."""
    ev = t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("user_id"),
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    return (
        p.join(
            c,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("c_ts") <= F.col("p_ts")),
        )
        .select(
            "p_id",
            "c_id",
            "user_id",
            F.unix_timestamp("p_ts").alias("p_epoch"),
            F.unix_timestamp("c_ts").alias("c_epoch"),
        )
    )


@query(
    "q_stream_interval_join_outer",
    oracle="""
    WITH p AS (SELECT event_id AS p_id, user_id, ts AS p_ts FROM events
               WHERE event_type = 'purchase'),
         c AS (SELECT event_id AS c_id, user_id, ts AS c_ts FROM events
               WHERE event_type = 'click')
    SELECT p_id, c_id, p.user_id AS user_id,
           CAST(epoch(date_trunc('second', p_ts)) AS BIGINT) AS p_epoch,
           CAST(epoch(date_trunc('second', c_ts)) AS BIGINT) AS c_epoch
    FROM p LEFT JOIN c ON p.user_id = c.user_id
     AND c_ts >= p_ts - INTERVAL 1 HOUR AND c_ts <= p_ts
    """,
    tags=("stream", "interval-join", "outer"),
)
def q_stream_interval_join_outer(spark, sf_dir):
    """Watermarked LEFT OUTER stream-stream interval join, batch form:
    every purchase appears, null-extended when no same-user click landed
    in the preceding hour — the unmatched-row surface the inner variant
    (q_stream_interval_join) can't express. The streaming twin
    (``streaming/jobs.py streaming_interval_join_outer``) emits the
    null-extended rows only once the watermark passes the join bound;
    tests assert batch ≡ streaming row-for-row INCLUDING the null rows,
    and ``streaming_state_metrics`` exposes the state-store eviction
    counters that prove the interval bound keeps join state finite. In
    batch this is a plain left hash join on user_id with the interval
    predicate evaluated inside it."""
    ev = t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("user_id"),
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    return p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "left_outer",
    ).select(
        "p_id",
        "c_id",
        "user_id",
        F.unix_timestamp("p_ts").alias("p_epoch"),
        F.unix_timestamp("c_ts").alias("c_epoch"),
    )


@query(
    "q_stream_interval_join_full",
    oracle="""
    WITH p AS (SELECT event_id AS p_id, user_id, ts AS p_ts FROM events
               WHERE event_type = 'purchase'),
         c AS (SELECT event_id AS c_id, user_id, ts AS c_ts FROM events
               WHERE event_type = 'click')
    SELECT p_id, c_id, COALESCE(p.user_id, c.user_id) AS user_id,
           CAST(epoch(date_trunc('second', p_ts)) AS BIGINT) AS p_epoch,
           CAST(epoch(date_trunc('second', c_ts)) AS BIGINT) AS c_epoch
    FROM p FULL JOIN c ON p.user_id = c.user_id
     AND c_ts >= p_ts - INTERVAL 1 HOUR AND c_ts <= p_ts
    """,
    tags=("stream", "interval-join", "outer", "full"),
)
def q_stream_interval_join_full(spark, sf_dir):
    """Watermarked FULL OUTER stream-stream interval join, batch form —
    completes the Structured-Streaming join-mode matrix (inner →
    q_stream_interval_join, left → q_stream_interval_join_outer):
    null-extension on BOTH sides, so unmatched purchases AND unmatched
    clicks each appear once. The streaming twin (``streaming/jobs.py
    streaming_interval_join_full``) uses the same sentinel-advance +
    sink-side-filter technique (outer rows on either side are emitted
    only once both watermarks pass the join bound); tests assert batch
    ≡ streaming row-for-row including both null-extended sides. In
    batch: one hash join on user_id with the interval predicate inside
    it; user_id is COALESCEd across sides so the key survives
    null-extension."""
    ev = t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    return p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "full_outer",
    ).select(
        "p_id",
        "c_id",
        F.coalesce("p_user", "c_user").alias("user_id"),
        F.unix_timestamp("p_ts").alias("p_epoch"),
        F.unix_timestamp("c_ts").alias("c_epoch"),
    )


@query(
    "q_stream_foreach_batch_upsert",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY event_type
    """,
    tags=("stream", "foreachBatch", "sink", "upsert"),
)
def q_stream_foreach_batch_upsert(spark, sf_dir):
    """The foreachBatch lakehouse-landing path as a declared surface: a
    real streaming aggregation whose every micro-batch is MERGED into a
    partitioned parquet target with per-writer
    `partitionOverwriteMode=dynamic` (replace only the partitions the
    batch contains — the idempotent upsert that makes retried batches
    rewrite instead of duplicate), then the FINAL TABLE STATE read back
    and hash-checked against the batch aggregate. Partition-isolation
    of the dynamic overwrite is separately pinned in
    tests/test_streaming.py."""
    from ..streaming.jobs import run_foreach_batch_upsert
    from ._util import scratch_dir

    out_dir = scratch_dir("q_stream_foreach_batch_upsert", sf_dir)
    final = run_foreach_batch_upsert(spark, sf_dir, out_dir)
    return final.select("event_type", "n", "sum_value")


@query(
    "q_stream_state_reader",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY event_type
    """,
    tags=("stream", "statestore", "observability"),
)
def q_stream_state_reader(spark, sf_dir):
    """Offline state-store introspection (Spark 4 `statestore` batch
    source): run the per-event-type streaming aggregation to a durable
    checkpoint, then read the RAW state rows back from the checkpoint
    and decode key/aggregation-buffer structs. For a completed
    availableNow run the state IS the final group-by, so the whole
    stream → state-store → batch-read-back loop is hash-checked against
    the plain SQL aggregate. The `state-metadata` source (operator ids,
    batch bounds, partition counts — no state payload scan) is asserted
    in tests/test_streaming.py."""
    from ..streaming.jobs import streaming_state_reader

    return streaming_state_reader(spark, sf_dir)


@query(
    "q_stream_state_metrics",
    # rows-only: state-store progress counters are a streaming-runtime
    # surface with no SQL equivalent; invariants (eviction observed,
    # state bounded) are pinned in tests/test_streaming.py.
    tags=("stream", "state-metrics", "observability"),
)
def q_stream_state_metrics(spark, sf_dir):
    """Per-batch state-store health of the watermarked outer interval
    join (``streaming/jobs.py streaming_state_metrics``): rows kept /
    updated / removed per stateful operator plus the batch watermark.
    `state_rows_removed > 0` is the eviction evidence — the interval
    bound lets the join drop aged click state instead of growing
    forever. This is the readout a production operator alerts on
    (state size trending up ⇒ watermark stalled or bound missing)."""
    from ..streaming.jobs import streaming_state_metrics

    return streaming_state_metrics(spark, sf_dir)


@query(
    "q_stream_static_join",
    oracle="""
    WITH dim AS (
        SELECT user_id, CAST(user_id % 5 AS INT) AS cohort
        FROM (SELECT DISTINCT user_id FROM events)
    )
    SELECT event_id, e.user_id, cohort,
           CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS epoch,
           event_type
    FROM events e JOIN dim ON e.user_id = dim.user_id
    """,
    tags=("stream", "static-join"),
)
def q_stream_static_join(spark, sf_dir):
    """Stream-static dimension enrichment, batch form: every event joined
    to a per-user dim row (cohort). The streaming twin
    (``streaming/jobs.py streaming_static_dim_join``) re-plans the static
    side each micro-batch — no watermark, no join state — and broadcasts
    it when small; batch ≡ streaming is asserted in tests. At scale the
    dim side is the broadcast build unless it outgrows the threshold, in
    which case the stream side shuffles on the already-keyed user_id."""
    ev = t(spark, sf_dir, "events")
    dim = (
        ev.select("user_id")
        .distinct()
        .select("user_id", (F.col("user_id") % 5).cast("int").alias("cohort"))
    )
    return ev.join(dim, "user_id").select(
        "event_id",
        "user_id",
        "cohort",
        F.unix_timestamp("ts").alias("epoch"),
        "event_type",
    )


@query(
    "q_stream_session_dynamic",
    oracle="""
    WITH g AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN event_type = 'purchase' THEN 3600 ELSE 900 END AS gap_s
        FROM events
    ), f AS (
        SELECT user_id, ts, gap_s, value,
               CASE WHEN MAX(ts + gap_s * INTERVAL 1 SECOND) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) > ts
                    THEN 0 ELSE 1 END AS is_new
        FROM g
    ), s AS (
        SELECT user_id, ts, gap_s, value,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS sess_id
        FROM f
    )
    SELECT user_id,
           CAST(epoch(date_trunc('second', MIN(ts))) AS BIGINT) AS sess_start,
           CAST(epoch(date_trunc('second',
                MAX(ts + gap_s * INTERVAL 1 SECOND))) AS BIGINT) AS sess_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM s GROUP BY user_id, sess_id
    """,
    tags=("stream", "session", "dynamic-gap"),
)
def q_stream_session_dynamic(spark, sf_dir):
    """DYNAMIC-gap session windows — native ``session_window`` with a
    per-event gap column (purchases hold a session open 60 min, other
    events 15 min): each event contributes [ts, ts+gap) and overlapping
    windows merge, so the session end is the max per-event deadline, not
    last-event+constant. The oracle is the running-max-end islands
    formulation (break when ts ≥ max prior deadline) — the general
    interval-merge sessionization that q_win_gaps_islands' constant-gap
    lag test cannot express. Same single user_id shuffle; in streaming
    form the same expression drives state eviction per event."""
    ev = t(spark, sf_dir, "events")
    gap = F.when(F.col("event_type") == "purchase", F.lit("3600 seconds")).otherwise(
        F.lit("900 seconds")
    )
    return (
        ev.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).alias("sess_start"),
            F.unix_timestamp(F.col("w.end")).alias("sess_end"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "q_stream_stateful_session",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                         OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                            >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ), sessions AS (
        SELECT user_id, ts, value,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        FROM flagged
    )
    SELECT user_id,
           CAST(epoch(date_trunc('second', MIN(ts))) AS BIGINT) AS sess_start,
           CAST(epoch(date_trunc('second', MAX(ts) + INTERVAL 30 MINUTE)) AS BIGINT) AS sess_end,
           COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
    FROM sessions GROUP BY user_id, sess_id
    """,
    tags=("stream", "session", "stateful", "applyInPandasWithState"),
)
def q_stream_stateful_session(spark, sf_dir):
    """The custom-stateful-processing surface, driver-checked against
    the SAME gap-and-islands oracle as the native session window: a
    REAL Structured Streaming run (file source → watermark →
    ``applyInPandasWithState`` with event-time timeouts → memory sink,
    streaming/jobs.py streaming_stateful_session) whose emitted
    sessions hash-match the batch SQL. This is the hardest equivalence
    in the streaming family — open-state timeout flushes, watermark
    advancement via the staged sentinel, per-user Python state — pinned
    to a deterministic oracle. Per-session sums accumulate in event-time
    order inside the state (deterministic), and rounding to 2dp absorbs
    the float-vs-decimal last-ulp (values are exact 2dp; error ≪ step).
    """
    from ..streaming.jobs import streaming_stateful_session

    # The state store shards on spark.sql.shuffle.partitions; a vanilla
    # session's 200 empty-ish shards cost ~25s of task overhead at
    # fixture scale. Scope a fixture-sized setting around the run and
    # restore the caller's value (at 100 TB you WANT hundreds of state
    # shards — this is a fixture-size ergonomics fix, not a plan change).
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try:
        out = streaming_stateful_session(spark, sf_dir)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return out.select(
        "user_id",
        "sess_start",
        "sess_end",
        "n_events",
        F.round("sum_value", 2).alias("sum_value"),
    )


@query(
    "q_stream_drift_monitor",
    # batch replay of the streaming alarm log: one micro-batch per
    # event-time week (the staged layout guarantees it), so each
    # (week_start, n_rows, psi) row is a pure function of the data —
    # same PSI discipline as q_dq_drift_psi (eps-clamped shares,
    # 6dp-rounded terms, order-independent decimal sum)
    oracle="""
    WITH ref AS (
        SELECT event_type, COUNT(*) AS n_a FROM events GROUP BY 1
    ), reft AS (
        SELECT CAST(SUM(n_a) AS DOUBLE) AS ref_total FROM ref
    ), wkcounts AS (
        SELECT CAST(date_trunc('week', ts) AS DATE) AS week_start,
               event_type, COUNT(*) AS n_b
        FROM events GROUP BY 1, 2
    ), wktot AS (
        SELECT week_start, SUM(n_b) AS wk_total FROM wkcounts GROUP BY 1
    ), grid AS (
        SELECT w.week_start, r.event_type, r.n_a,
               COALESCE(k.n_b, 0) AS n_b, w.wk_total
        FROM wktot w CROSS JOIN ref r
        LEFT JOIN wkcounts k
          ON k.week_start = w.week_start AND k.event_type = r.event_type
    ), terms AS (
        SELECT week_start, wk_total,
               ROUND((GREATEST(CAST(n_b AS DOUBLE) / wk_total, 1e-6)
                      - GREATEST(CAST(n_a AS DOUBLE) / (SELECT ref_total FROM reft), 1e-6))
                     * LN(GREATEST(CAST(n_b AS DOUBLE) / wk_total, 1e-6)
                          / GREATEST(CAST(n_a AS DOUBLE) / (SELECT ref_total FROM reft), 1e-6)),
                     6) AS term
        FROM grid
    )
    SELECT week_start, CAST(MIN(wk_total) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(term AS DECIMAL(18,6))) AS DOUBLE) AS psi
    FROM terms GROUP BY week_start
    """,
    tags=("stream", "dq", "drift", "psi"),
)
def q_stream_drift_monitor(spark, sf_dir):
    """Driver-visible wrapper of the streaming PSI drift alarm
    (streaming/jobs.py run_streaming_drift_monitor): each micro-batch is
    one event-time WEEK of the staged file source, its category mix is
    scored against the frozen reference shares via foreachBatch, and one
    (week_start, n_rows, psi) alarm row per week appends to a parquet
    log. Upgraded rows-only → FULL HASH CHECK (VERDICT r4 #5): the
    week-per-batch staging makes the log a pure function of the data,
    replayed exactly by the batch oracle (q_dq_drift_psi's
    order-independent PSI discipline). Determinism across reruns is
    ensured by clearing the alarm log + checkpoint before each run."""
    import shutil

    from ..streaming.jobs import run_streaming_drift_monitor
    from ._util import scratch_dir

    out_dir = scratch_dir("q_stream_drift_monitor", sf_dir)
    shutil.rmtree(out_dir, ignore_errors=True)
    shutil.rmtree(f"{out_dir}_ckpt", ignore_errors=True)
    return run_streaming_drift_monitor(spark, sf_dir, out_dir)


@query(
    "q_stream_milestones",
    oracle="""
    WITH ev AS (
        SELECT user_id, event_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM events
    ), cum AS (
        SELECT user_id, event_id, us,
               SUM(cents) OVER (PARTITION BY user_id ORDER BY us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum
        FROM ev
    ), lev AS (
        SELECT user_id, event_id, us, cum // 50000 AS level,
               COALESCE(LAG(cum // 50000) OVER (PARTITION BY user_id
                                                ORDER BY us, event_id), 0)
                   AS prev_level
        FROM cum
    )
    SELECT user_id, CAST(level AS BIGINT) AS level, event_id,
           CAST(us // 1000000 AS BIGINT) AS at_epoch
    FROM lev WHERE level > prev_level
    """,
    tags=("stream", "stateful", "transformWithState", "milestones"),
)
def q_stream_milestones(spark, sf_dir):
    """The state-v2 arbitrary-stateful surface (Spark 4's
    ``transformWithStateInPandas``) driver-checked against a batch
    window-scan oracle: a REAL Structured Streaming run — file source →
    per-user typed ValueState of exact cumulative cents (RocksDB state
    store) → append sink — emitting one row per 500.00-boundary
    crossing, hash-equal to LAG-over-cumsum SQL. Complements
    q_stream_stateful_session (the applyInPandasWithState generation of
    the same surface); exact integer cents make stream and oracle
    bit-identical."""
    from ..streaming.jobs import streaming_spend_milestones

    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    # transformWithState requires the RocksDB state store provider.
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        return streaming_spend_milestones(spark, sf_dir)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        if prev_provider is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev_provider
            )


@query(
    "q_stream_tws_map_state",
    oracle="""
    SELECT user_id, event_type, COUNT(*) AS n_events,
           CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
               AS sum_cents
    FROM events GROUP BY user_id, event_type
    """,
    tags=("stream", "stateful", "transformWithState", "map-state"),
)
def q_stream_tws_map_state(spark, sf_dir):
    """The state-v2 MAP-STATE handle (Spark 4
    ``transformWithStateInPandas`` + ``getMapState``) driver-checked
    against a plain GROUP BY oracle: a REAL streaming run keeping each
    user's per-event-type totals as typed map entries (point lookup +
    per-key update, each entry its own RocksDB KV — the dictionary-
    shaped state ValueState would rewrite whole). Completes the
    arbitrary-stateful matrix: applyInPandasWithState
    (q_stream_stateful_session), state-v2 ValueState
    (q_stream_milestones), state-v2 MapState (here). Exact integer
    cents make stream and oracle bit-identical."""
    from ..streaming.jobs import streaming_tws_map_state

    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    # transformWithState requires the RocksDB state store provider.
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        return streaming_tws_map_state(spark, sf_dir)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        if prev_provider is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev_provider
            )


@query(
    "q_stream_python_datasource",
    # Same closed-form replay as the batch connector twin
    # (q_scan_python_datasource), so the STREAMING delivery path is held
    # to the identical hash check.
    oracle="""
    WITH src AS (
        SELECT i AS device_id, CAST(i // 2500 AS INT) AS part,
               (i * i + 17 * i) % 9973 AS reading
        FROM range(0, 20000) t(i)
    )
    SELECT part, CAST(COUNT(*) AS BIGINT) AS n_readings,
           CAST(SUM(reading) AS BIGINT) AS sum_reading,
           CAST(MIN(device_id) AS BIGINT) AS min_device,
           CAST(MAX(device_id) AS BIGINT) AS max_device
    FROM src GROUP BY part
    """,
    tags=("stream", "python-datasource", "connector", "spark4"),
)
def q_stream_python_datasource(spark, sf_dir):
    """STREAMING custom connector through Spark 4's Python DataSource
    API: ``spark.readStream.format("synthetic_telemetry")`` drives the
    ``DataSourceStreamReader`` offset machinery — initialOffset /
    latestOffset / per-batch ``partitions(start, end)`` planning /
    executor-side ``read`` / ``commit`` — the SDK a Python Kafka-like
    source implements. Rows are the same closed-form function of the id
    as the batch twin, so the full stream → memory-sink loop
    hash-checks against the identical range() replay. (AvailableNow
    falls back to single-batch for Python stream sources; the fallback
    is part of the declared surface and logged by the runtime.)

    Scale shape: per batch, parallelism = len(partitions()); a
    production source maps InputPartitions to shards/offset ranges and
    the downstream groupBy is one combinable shuffle."""
    from ..sources.pyds import register

    register(spark)
    from ..streaming.jobs import _run_to_memory

    src = (
        spark.readStream.format("synthetic_telemetry")
        .option("n_rows", 20000)
        .option("n_parts", 8)
        .load()
    )
    agg = src.groupBy("part").agg(
        F.count("*").alias("n_readings"),
        F.sum("reading").alias("sum_reading"),
        F.min("device_id").alias("min_device"),
        F.max("device_id").alias("max_device"),
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try:
        return _run_to_memory(agg, "stream_pyds_out", "complete")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


@query(
    "q_stream_heavy_hitters",
    oracle="""
    WITH k AS (
        SELECT user_id, event_type, COUNT(*) AS cnt
        FROM events GROUP BY user_id, event_type
    ), tot AS (SELECT SUM(cnt) AS n FROM k)
    SELECT k.user_id, k.event_type, k.cnt, k.cnt / t.n AS share
    FROM k CROSS JOIN tot t
    ORDER BY k.cnt DESC, k.user_id, k.event_type LIMIT 10
    """,
    tags=("stream", "heavy-hitters", "stateful", "applyInPandasWithState"),
)
def q_stream_heavy_hitters(spark, sf_dir):
    """Streaming heavy hitters — the speed-layer/batch-layer split done
    right: a REAL Structured Streaming run maintains bucketed
    Misra-Gries counter tables in keyed state (64 hash buckets x 64
    counters via ``applyInPandasWithState`` — per-bucket state is
    KB-scale no matter how many distinct keys the stream carries), and
    at stream end the surviving candidates are EXACTLY recounted against
    the batch table with the same absence-bound certificate and
    exact-groupBy fallback as q_agg_heavy_hitters. The final frame is
    the exact top-10, independent of micro-batch boundaries and bucket
    sharding — which is why a streaming query can carry the SAME plain
    GROUP BY oracle as its batch twin. Production shape: the sketch
    state answers "top keys right now" continuously with bounded memory;
    the exact confirm runs at checkpoint/report time."""
    from ..streaming.stateful import run_heavy_hitters_available_now

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try:
        return run_heavy_hitters_available_now(spark, sf_dir, k=10)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
