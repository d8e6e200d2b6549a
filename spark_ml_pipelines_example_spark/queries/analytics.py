"""Event/behavioral analytics queries — cohort retention, rolling
time-window features, rolling DAU/WAU, event-transition matrices,
deterministic mode/median, MAD robust outliers, interval-overlap joins,
exact-k group sampling, and snapshot diff/reconciliation.

These extend the engine past the reference's batch-ML surface into the
product-analytics shapes every event-log deployment runs (reference
parity: the `events` fixture mirrors the reference's event stream,
SURVEY §2.2b). Scale notes per query; the common theme is that every
shape resolves to ONE shuffle on a real key plus broadcast-size side
inputs — no global sorts, no driver loops.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ._util import ORACLE_EPOCH_S, dec, epoch_s, t
from .registry import query


@query(
    "q_events_retention",
    oracle="""
    WITH user_day AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), cohort AS (
        SELECT user_id, MIN(day) AS cohort_day FROM user_day GROUP BY user_id
    ), act AS (
        SELECT c.cohort_day,
               datediff('day', c.cohort_day, d.day) AS day_offset,
               COUNT(DISTINCT d.user_id) AS n_active
        FROM user_day d JOIN cohort c USING (user_id)
        GROUP BY 1, 2
    ), sizes AS (
        SELECT cohort_day, COUNT(*) AS n_cohort FROM cohort GROUP BY 1
    )
    SELECT a.cohort_day, a.day_offset, a.n_active, s.n_cohort,
           ROUND(CAST(a.n_active AS DOUBLE) / s.n_cohort, 4) AS retention_pct
    FROM act a JOIN sizes s USING (cohort_day)
    """,
    tags=("events", "retention", "cohort"),
)
def q_events_retention(spark, sf_dir):
    """Cohort retention matrix: cohort = first active day per user;
    each (cohort_day, day_offset) cell counts users still active that
    many days later. The classic growth-analytics rollup.

    Scale shape: one shuffle on user_id produces both the per-user
    cohort day and the distinct (user, day) activity set; the final
    matrix is |days|² rows — driver-size output from any input volume.
    The cohort-size side of the last join is tiny → broadcast.
    """
    ev = t(spark, sf_dir, "events")
    user_day = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    cohort = user_day.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    act = (
        user_day.join(cohort, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff("day", "cohort_day").alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
    sizes = cohort.groupBy("cohort_day").agg(F.count("*").alias("n_cohort"))
    return act.join(F.broadcast(sizes), "cohort_day").select(
        "cohort_day",
        "day_offset",
        "n_active",
        "n_cohort",
        F.round(F.col("n_active") / F.col("n_cohort"), 4).alias("retention_pct"),
    )


@query(
    "q_win_rolling_time",
    oracle=f"""
    SELECT event_id, user_id,
           {ORACLE_EPOCH_S.format(col="ts")} AS ts_s,
           COUNT(*) OVER w AS n_prev_hour,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_prev_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY {ORACLE_EPOCH_S.format(col="ts")}
                 RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "frame", "timeseries", "feature-engineering"),
)
def q_win_rolling_time(spark, sf_dir):
    """Rolling 1-hour event count and value sum per user — the RANGE
    frame over event-time epoch seconds (feature engineering's "activity
    in the trailing hour" signal). RANGE (not ROWS) so same-second peers
    always land in the same frame regardless of tie order — the result
    is deterministic without a tie-break key. Decimal accumulation keeps
    the rolling sums exact under any partition order; one shuffle on
    user_id, per-partition sort, no global ordering anywhere.
    """
    ev = t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(epoch_s("ts"))
        .rangeBetween(-3599, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        epoch_s("ts").alias("ts_s"),
        F.count("*").over(w).alias("n_prev_hour"),
        F.sum(dec("value")).over(w).cast("double").alias("sum_prev_hour"),
    )


@query(
    "q_agg_mode_median",
    oracle="""
    WITH counts AS (
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS cnt
        FROM orders GROUP BY 1, 2
    ), mode AS (
        SELECT o_orderpriority, o_orderstatus AS mode_status, cnt AS mode_count,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                  ORDER BY cnt DESC, o_orderstatus) AS rn
        FROM counts
    ), stats AS (
        SELECT o_orderpriority,
               ROUND(median(o_totalprice), 2) AS median_price,
               COUNT(*) AS n_orders
        FROM orders GROUP BY 1
    )
    SELECT s.o_orderpriority, s.median_price, s.n_orders,
           m.mode_status, m.mode_count
    FROM stats s JOIN mode m USING (o_orderpriority)
    WHERE m.rn = 1
    """,
    tags=("agg", "mode", "median"),
)
def q_agg_mode_median(spark, sf_dir):
    """Deterministic mode + exact median per group. Spark's built-in
    ``mode()`` returns an arbitrary value on frequency ties, so the mode
    is derived as count-per-value → row_number with a lexicographic
    tie-break — same two-shuffle shape, deterministic at any scale.
    ``median`` is the exact interpolated percentile (both engines
    implement percentile_cont(0.5)); rounded to cents for hash safety.
    The 5-row mode/stats join is broadcast-size by construction.
    """
    o = t(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("cnt")
    )
    w = W.partitionBy("o_orderpriority").orderBy(
        F.desc("cnt"), F.col("o_orderstatus")
    )
    mode = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderpriority",
            F.col("o_orderstatus").alias("mode_status"),
            F.col("cnt").alias("mode_count"),
        )
    )
    stats = o.groupBy("o_orderpriority").agg(
        F.round(F.median("o_totalprice"), 2).alias("median_price"),
        F.count("*").alias("n_orders"),
    )
    return stats.join(F.broadcast(mode), "o_orderpriority").select(
        "o_orderpriority", "median_price", "n_orders", "mode_status", "mode_count"
    )


@query(
    "q_join_interval_overlap",
    oracle="""
    WITH spans AS (
        SELECT o_orderkey, o_totalprice,
               CAST(o_orderdate AS DATE) AS o_start,
               CAST(o_orderdate AS DATE) + 7 AS o_end
        FROM orders
    ), campaigns AS (
        SELECT DISTINCT CAST(date_trunc('quarter', o_orderdate) AS DATE) AS c_start,
               CAST(date_trunc('quarter', o_orderdate) AS DATE) + 45 AS c_end
        FROM orders
    )
    SELECT c.c_start, c.c_end,
           COUNT(*) AS n_overlapping,
           CAST(SUM(CAST(s.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM spans s JOIN campaigns c
      ON s.o_start < c.c_end AND c.c_start < s.o_end
    GROUP BY 1, 2
    """,
    tags=("join", "interval", "overlap"),
)
def q_join_interval_overlap(spark, sf_dir):
    """Interval-overlap join: order activity spans [orderdate, +7d)
    against quarterly campaign windows [quarter_start, +45d), half-open
    overlap predicate ``a.start < b.end AND b.start < a.end``. The
    campaign side is derived (distinct quarters → dozens of rows) and
    broadcast, so the fact side streams through with zero shuffle — the
    only scalable plan for interval joins where one side is small. When
    BOTH sides are large, the bucketed-range-join operator
    (operators/rangejoin.py) is the right tool instead.
    """
    o = t(spark, sf_dir, "orders")
    spans = o.select(
        "o_orderkey",
        "o_totalprice",
        F.to_date("o_orderdate").alias("o_start"),
        F.date_add(F.to_date("o_orderdate"), 7).alias("o_end"),
    )
    campaigns = (
        o.select(F.date_trunc("quarter", "o_orderdate").cast("date").alias("c_start"))
        .distinct()
        .withColumn("c_end", F.date_add("c_start", 45))
    )
    joined = spans.join(
        F.broadcast(campaigns),
        (F.col("o_start") < F.col("c_end")) & (F.col("c_start") < F.col("o_end")),
    )
    return joined.groupBy("c_start", "c_end").agg(
        F.count("*").alias("n_overlapping"),
        F.sum(dec("o_totalprice")).cast("double").alias("revenue"),
    )


@query(
    "q_sample_reservoir_group",
    oracle="""
    SELECT lang, doc_id, rn FROM (
        SELECT lang, doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY md5(concat_ws('|', 'rsv', CAST(doc_id AS VARCHAR))),
                            doc_id) AS rn
        FROM documents
    ) WHERE rn <= 50
    """,
    tags=("sample", "reservoir", "training-data"),
)
def q_sample_reservoir_group(spark, sf_dir):
    """Exact-k uniform sample per group (reservoir-sampling semantics,
    deterministic): rank every doc within its language by the md5 of a
    keyed salt and keep the first 50. Unlike Bernoulli stratified
    sampling (q_sample_stratified) this guarantees EXACTLY k per group,
    and unlike ``rand()`` it is reproducible across runs/engines. One
    shuffle on lang; at 100 TB the per-group sort is bounded by a
    top-k-per-partition pre-filter Catalyst derives from the rank
    filter (WindowGroupLimit in the physical plan).
    """
    d = t(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(
        F.md5(F.concat_ws("|", F.lit("rsv"), F.col("doc_id"))), F.col("doc_id")
    )
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 50)
        .select("lang", "doc_id", "rn")
    )


@query(
    "q_events_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events
    ), edges AS (
        SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY 1, 2
    ), tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS t FROM edges)
    SELECT from_type, to_type, n, ROUND(n / tot.t, 6) AS share
    FROM edges, tot
    """,
    tags=("events", "transitions", "funnel", "graph"),
)
def q_events_transitions(spark, sf_dir):
    """Event-transition matrix (the Sankey/journey-graph aggregate):
    consecutive event-type pairs per user, counted and normalized to
    transition shares. One user_id shuffle for the LEAD window, then a
    |event_types|²-sized aggregate — driver-scale output from any event
    volume. The transition total re-aggregates the tiny edge table
    (broadcast), not the event stream."""
    from pyspark.sql import Window as W

    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    edges = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count("*").alias("n"))
    )
    tot = edges.agg(F.sum("n").cast("double").alias("t"))
    return edges.crossJoin(F.broadcast(tot)).select(
        "from_type", "to_type", "n", F.round(F.col("n") / F.col("t"), 6).alias("share")
    )


MAD_K = 1.4826  # normal-consistency constant
MAD_CUT = 3.0


@query(
    "q_agg_mad_outliers",
    oracle=f"""
    WITH med AS (
        SELECT o_orderpriority, median(o_totalprice) AS m
        FROM orders GROUP BY 1
    ), dev AS (
        SELECT o.o_orderpriority, o.o_totalprice, m.m,
               ABS(o.o_totalprice - m.m) AS ad
        FROM orders o JOIN med m USING (o_orderpriority)
    ), mad AS (
        SELECT o_orderpriority, median(ad) AS mad FROM dev GROUP BY 1
    )
    SELECT d.o_orderpriority,
           ROUND(d.m, 2) AS med_price,
           ROUND(a.mad, 2) AS mad,
           COUNT(*) AS n,
           COUNT(CASE WHEN d.ad > {MAD_CUT} * {MAD_K} * a.mad THEN 1 END)
               AS n_outliers
    FROM dev d JOIN mad a USING (o_orderpriority)
    GROUP BY d.o_orderpriority, d.m, a.mad
    """,
    tags=("agg", "robust-stats", "outliers", "data-quality"),
)
def q_agg_mad_outliers(spark, sf_dir):
    """Robust outlier detection via median absolute deviation: per
    group, MAD = median(|x − median(x)|), outlier ⇔ |x − med| >
    3·1.4826·MAD — the robust z-score that survives the heavy tails that
    wreck stddev-based cuts (cf. q_fn_winsorize's quantile clamp). Two
    exact-median aggregates; each median table is group-count-sized and
    broadcasts back over the same group key, so the data shuffles once
    and the plan never re-sorts the fact rows."""
    o = t(spark, sf_dir, "orders")
    med = o.groupBy("o_orderpriority").agg(F.median("o_totalprice").alias("m"))
    dev = o.join(F.broadcast(med), "o_orderpriority").select(
        "o_orderpriority",
        "m",
        F.abs(F.col("o_totalprice") - F.col("m")).alias("ad"),
    )
    mad = dev.groupBy("o_orderpriority").agg(F.median("ad").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "o_orderpriority")
        .groupBy("o_orderpriority", "m", "mad")
        .agg(
            F.count("*").alias("n"),
            F.count(
                F.when(F.col("ad") > MAD_CUT * MAD_K * F.col("mad"), 1)
            ).alias("n_outliers"),
        )
        .select(
            "o_orderpriority",
            F.round("m", 2).alias("med_price"),
            F.round("mad", 2).alias("mad"),
            "n",
            "n_outliers",
        )
    )


@query(
    "q_events_rolling_dau",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), maxd AS (SELECT MAX(day) AS md FROM ud),
    expanded AS (
        SELECT u.user_id, u.day + CAST(g.i AS INTEGER) AS wday, g.i
        FROM ud u, range(7) g(i)
    )
    SELECT wday,
           COUNT(DISTINCT user_id) AS wau7,
           COUNT(DISTINCT CASE WHEN i = 0 THEN user_id END) AS dau
    FROM expanded, maxd WHERE wday <= maxd.md
    GROUP BY wday
    """,
    tags=("events", "dau", "rolling-distinct"),
)
def q_events_rolling_dau(spark, sf_dir):
    """Rolling 7-day active users (WAU) next to daily actives (DAU) —
    the sliding-window DISTINCT that window functions cannot express
    (COUNT(DISTINCT) OVER a frame is unsupported in both engines). The
    scalable formulation: each distinct (user, day) fact is exploded
    into the 7 window-days it contributes to (a map-side ×7 fan-out of
    an already-deduped, tiny-per-user stream), then one distinct
    aggregate per window-day — never a per-day self-join over the event
    log. DAU rides the same pass as a conditional distinct."""
    ev = t(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    maxd = ud.agg(F.max("day").alias("md"))
    expanded = ud.select(
        "user_id", "day", F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i")
    ).select("user_id", F.expr("date_add(day, i)").alias("wday"), "i")
    return (
        expanded.crossJoin(F.broadcast(maxd))
        .filter(F.col("wday") <= F.col("md"))
        .groupBy("wday")
        .agg(
            F.countDistinct("user_id").alias("wau7"),
            F.countDistinct(F.when(F.col("i") == 0, F.col("user_id"))).alias("dau"),
        )
    )


@query(
    "q_diff_tables",
    oracle="""
    WITH newv AS (
        SELECT o_orderkey, o_totalprice + 1.0 AS o_totalprice
        FROM orders WHERE o_orderkey % 7 = 0 AND o_orderkey % 13 <> 0
        UNION ALL
        SELECT o_orderkey, o_totalprice
        FROM orders WHERE o_orderkey % 7 <> 0 AND o_orderkey % 13 <> 0
        UNION ALL
        SELECT o_orderkey + 10000000, 100.0 FROM orders WHERE o_orderkey % 997 = 0
    )
    SELECT status, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS key_sum
    FROM (
        SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS k,
               CASE WHEN o.o_orderkey IS NULL THEN 'added'
                    WHEN n.o_orderkey IS NULL THEN 'removed'
                    WHEN o.o_totalprice <> n.o_totalprice THEN 'changed'
                    ELSE 'same' END AS status
        FROM orders o FULL OUTER JOIN newv n ON o.o_orderkey = n.o_orderkey
    )
    GROUP BY status
    """,
    tags=("diff", "reconciliation", "data-quality"),
)
def q_diff_tables(spark, sf_dir):
    """Table diff / reconciliation — the "what changed between snapshot
    A and snapshot B" audit (data-diff): FULL OUTER join on the key,
    each row classified added / removed / changed / same, summarized as
    counts + key-sum membership pins (never materializing the diff
    itself in the declared result). The synthetic B-side reuses
    q_merge_upsert's deterministic mutation recipe (%7 price bump, %13
    delete, %997 insert) so merge and diff cross-validate. One shuffle
    on the key; at 100 TB both sides bucket on the key and even that
    shuffle disappears (cf. q_join_bucketed_colocated)."""
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    kept = o.filter(F.col("o_orderkey") % 13 != 0)
    newv = (
        kept.filter(F.col("o_orderkey") % 7 == 0)
        .select("o_orderkey", (F.col("o_totalprice") + 1.0).alias("o_totalprice"))
        .unionAll(kept.filter(F.col("o_orderkey") % 7 != 0))
        .unionAll(
            o.filter(F.col("o_orderkey") % 997 == 0).select(
                (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
                F.lit(100.0).alias("o_totalprice"),
            )
        )
    )
    a = o.select(F.col("o_orderkey").alias("ka"), F.col("o_totalprice").alias("va"))
    b = newv.select(F.col("o_orderkey").alias("kb"), F.col("o_totalprice").alias("vb"))
    diff = a.join(b, F.col("ka") == F.col("kb"), "full_outer").select(
        F.coalesce("ka", "kb").alias("k"),
        F.when(F.col("ka").isNull(), "added")
        .when(F.col("kb").isNull(), "removed")
        .when(F.col("va") != F.col("vb"), "changed")
        .otherwise("same")
        .alias("status"),
    )
    return diff.groupBy("status").agg(
        F.count("*").alias("n"),
        F.sum("k").cast("long").alias("key_sum"),
    )


TS_BAR_S = 900  # 15-minute resample bars


@query(
    "q_ts_interpolate",
    oracle=f"""
    WITH ev AS (
        SELECT event_type,
               CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es, value
        FROM events
    ), b AS (
        SELECT event_type, (es // {TS_BAR_S}) * {TS_BAR_S} AS bar,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                     / COUNT(*), 6) AS v
        FROM ev GROUP BY 1, 2
    ), bounds AS (SELECT MIN(bar) AS lo, MAX(bar) AS hi FROM b),
    grid AS (
        SELECT t.event_type, g.bar
        FROM (SELECT DISTINCT event_type FROM ev) t,
             (SELECT UNNEST(range(lo, hi + {TS_BAR_S}, {TS_BAR_S})) AS bar
              FROM bounds) g
    ), j AS (
        SELECT g.event_type, g.bar, b.v
        FROM grid g LEFT JOIN b ON g.event_type = b.event_type AND g.bar = b.bar
    ), w AS (
        SELECT *,
               last_value(v IGNORE NULLS) OVER wp AS pv,
               last_value(CASE WHEN v IS NOT NULL THEN bar END IGNORE NULLS)
                   OVER wp AS pt,
               first_value(v IGNORE NULLS) OVER wn AS nv,
               first_value(CASE WHEN v IS NOT NULL THEN bar END IGNORE NULLS)
                   OVER wn AS nt
        FROM j
        WINDOW wp AS (PARTITION BY event_type ORDER BY bar
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               wn AS (PARTITION BY event_type ORDER BY bar
                      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, bar, v,
           FLOOR((CASE WHEN v IS NOT NULL THEN v
                       WHEN pv IS NULL THEN nv
                       WHEN nv IS NULL THEN pv
                       ELSE pv + (nv - pv) * (bar - pt) / (nt - pt)
                  END) * 1000000) / 1000000 AS v_interp,
           (v IS NULL) AS filled
    FROM w
    """,
    tags=("timeseries", "resample", "interpolate", "gapfill"),
)
def q_ts_interpolate(spark, sf_dir):
    """Time-series resample + linear interpolation (the TimescaleDB
    ``time_bucket_gapfill + interpolate`` shape): events downsample to
    15-minute mean-value bars; empty bars are filled by interpolating
    between the nearest real bars on each side (edge bars carry the one
    available neighbor). The neighbor lookup is two IGNORE-NULLS window
    scans over the BAR table (types × bars rows — grid-sized, not
    event-sized), so the event stream is touched exactly once by the
    bar aggregate; per-bar means go through exact decimal sums and every
    interpolated value derives from already-rounded doubles — identical
    IEEE arithmetic in both engines."""
    ev = t(spark, sf_dir, "events").select(
        "event_type", epoch_s("ts").alias("es"), "value"
    )
    b = (
        ev.groupBy(
            "event_type",
            F.expr(f"(es div {TS_BAR_S}) * {TS_BAR_S}").alias("bar"),
        )
        .agg(
            F.round(
                F.sum(dec("value")).cast("double") / F.count("*"), 6
            ).alias("v")
        )
    )
    lo, hi = b.agg(F.min("bar"), F.max("bar")).head()
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(
            ev.sparkSession.range(1).select(
                F.explode(
                    F.sequence(F.lit(lo), F.lit(hi), F.lit(TS_BAR_S))
                ).alias("bar")
            )
        )
    )
    j = grid.join(b, ["event_type", "bar"], "left")
    wp = (
        W.partitionBy("event_type")
        .orderBy("bar")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    wn = (
        W.partitionBy("event_type")
        .orderBy("bar")
        .rowsBetween(1, W.unboundedFollowing)
    )
    bar_if_v = F.when(F.col("v").isNotNull(), F.col("bar"))
    w = j.select(
        "event_type",
        "bar",
        "v",
        F.last("v", ignorenulls=True).over(wp).alias("pv"),
        F.last(bar_if_v, ignorenulls=True).over(wp).alias("pt"),
        F.first("v", ignorenulls=True).over(wn).alias("nv"),
        F.first(bar_if_v, ignorenulls=True).over(wn).alias("nt"),
    )
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (F.col("bar") - F.col("pt"))
            / (F.col("nt") - F.col("pt"))
        )
    )
    # floor-truncate instead of round: linear interpolation midpoints land
    # EXACTLY on .xxxxxx5 whenever the gap fraction is 1/2 over 6-decimal
    # inputs, and Spark (half-up) and DuckDB (half-even) break that tie
    # differently; floor of the identical IEEE double is engine-invariant.
    return w.select(
        "event_type",
        "bar",
        "v",
        (F.floor(interp * 1000000) / 1000000).alias("v_interp"),
        F.col("v").isNull().alias("filled"),
    )


WS_K = 20  # weighted sample size per group
_WS_2_48 = float(1 << 48)


@query(
    "q_sample_weighted",
    oracle=f"""
    WITH k AS (
        SELECT lang, doc_id, n_chars,
               ln((CAST('0x' || substr(md5('ws|' || CAST(doc_id AS VARCHAR)), 1, 12)
                        AS BIGINT) + 0.5) / {_WS_2_48!r}) / n_chars AS es_key
        FROM documents
    )
    SELECT lang, doc_id, n_chars, rk FROM (
        SELECT lang, doc_id, n_chars,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY es_key DESC, doc_id) AS rk
        FROM k
    ) WHERE rk <= {WS_K}
    """,
    tags=("sample", "weighted", "training-data"),
)
def q_sample_weighted(spark, sf_dir):
    """Weighted sampling without replacement (Efraimidis-Spirakis A-ES):
    each doc draws key = u^(1/w) — here rank-equivalently ln(u)/w — with
    w = n_chars, and the top-K keys per language are the sample, so
    longer documents are proportionally likelier WITHOUT replacement
    bias. The uniform u is hash-derived ((md5 48-bit prefix + 0.5)/2^48),
    making the draw reproducible across runs AND engines — the property
    ``rand()``-based sampling can never give a differential test. One
    window per group; WindowGroupLimit truncates per-partition like
    q_sample_reservoir_group."""
    d = t(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.lit("ws"), F.col("doc_id"))), 1, 12),
        16,
        10,
    ).cast("bigint")
    es_key = F.log((h + 0.5) / F.lit(_WS_2_48)) / F.col("n_chars")
    w = W.partitionBy("lang").orderBy(es_key.desc(), F.col("doc_id"))
    return (
        d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= WS_K)
        .select("lang", "doc_id", "n_chars", "rk")
    )


_OLS_X0 = 1704067200  # 2024-01-01 epoch: re-origin x so decimal sums stay narrow


@query(
    "q_agg_ols_trend",
    oracle=f"""
    WITH pts AS (
        SELECT event_type,
               CAST(epoch(date_trunc('second', ts)) AS BIGINT) - {_OLS_X0} AS x,
               value AS y
        FROM events
    ), s AS (
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(y AS DECIMAL(18,2))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(18,2)))
                    AS DOUBLE) AS sxy,
               CAST(SUM(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)))
                    AS DOUBLE) AS sxx
        FROM pts GROUP BY 1
    )
    SELECT event_type, n,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx) * 1e6, 6) AS slope_e6,
           ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 4)
               AS intercept
    FROM s
    """,
    tags=("agg", "regression", "trend", "ml-twin"),
)
def q_agg_ols_trend(spark, sf_dir):
    """Per-group closed-form OLS trend (value regressed on event time):
    slope and intercept from the five sufficient statistics (n, Σx, Σy,
    Σxy, Σx²) in ONE pass — how regression runs at 100 TB (never an
    iterative fit for 1-D least squares). The sums accumulate in
    decimal (exact, order-independent — both engines' regr_slope would
    be float-order-dependent); the final slope/intercept arithmetic is
    division of identical doubles. x is re-origined to the fixture epoch
    so Σx² stays inside decimal(38,0)."""
    ev = t(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        (epoch_s("ts") - F.lit(_OLS_X0)).alias("x"),
        F.col("value").alias("y"),
    )
    xd = F.col("x").cast("decimal(38,0)")
    yd = dec("y")
    s = pts.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(xd).cast("double").alias("sx"),
        F.sum(yd).cast("double").alias("sy"),
        F.sum(xd * yd).cast("double").alias("sxy"),
        F.sum(xd * xd).cast("double").alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        "event_type",
        "n",
        F.round(slope * 1e6, 6).alias("slope_e6"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 4).alias(
            "intercept"
        ),
    )


COPURCHASE_MIN_SUPPORT = 2  # the fixture baskets are random; >=2 is already signal


@query(
    "q_agg_copurchase",
    oracle=f"""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               COUNT(*) AS support
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    )
    SELECT part_a, part_b, support FROM pairs
    WHERE support >= {COPURCHASE_MIN_SUPPORT}
    ORDER BY support DESC, part_a, part_b
    LIMIT 50
    """,
    tags=("agg", "copurchase", "market-basket", "recommendation"),
)
def q_agg_copurchase(spark, sf_dir):
    """Frequent co-purchase pairs (market-basket / frequent-itemset-2):
    parts appearing in the same order, counted across orders, support
    floor + deterministic top-50. The self-join keys on the basket id,
    so pair volume is Σ basket² with |basket| ≈ 4 — NOT corpus² — and
    the support floor drops the long random tail. This is the support
    counting at the heart of association-rule mining; k>2 itemsets
    iterate this same join shape (A-priori) with the support floor
    pruning between rounds."""
    li = t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a"))
    b = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b"))
    return (
        a.join(b, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= COPURCHASE_MIN_SUPPORT)
        .orderBy(F.col("support").desc(), "part_a", "part_b")
        .limit(50)
    )


# Funnel stages in conversion order. Strict event-time ordering: a user
# counts at stage k only if their earliest stage-k event happens AFTER
# the chained earliest times of stages 1..k-1.
FUNNEL_STAGES = ("view", "click", "signup", "purchase")


@query(
    "q_events_funnel",
    oracle=f"""
    WITH s1 AS (
        SELECT user_id, MIN({ORACLE_EPOCH_S.format(col="ts")}) AS t1
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ), s2 AS (
        SELECT e.user_id, MIN({ORACLE_EPOCH_S.format(col="e.ts")}) AS t2
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'click' AND {ORACLE_EPOCH_S.format(col="e.ts")} > s1.t1
        GROUP BY e.user_id
    ), s3 AS (
        SELECT e.user_id, MIN({ORACLE_EPOCH_S.format(col="e.ts")}) AS t3
        FROM events e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'signup' AND {ORACLE_EPOCH_S.format(col="e.ts")} > s2.t2
        GROUP BY e.user_id
    ), s4 AS (
        SELECT e.user_id, MIN({ORACLE_EPOCH_S.format(col="e.ts")}) AS t4
        FROM events e JOIN s3 ON e.user_id = s3.user_id
        WHERE e.event_type = 'purchase' AND {ORACLE_EPOCH_S.format(col="e.ts")} > s3.t3
        GROUP BY e.user_id
    ), stages AS (
        SELECT 1 AS stage_idx, 'view' AS stage, COUNT(*) AS n_users FROM s1
        UNION ALL SELECT 2, 'click', COUNT(*) FROM s2
        UNION ALL SELECT 3, 'signup', COUNT(*) FROM s3
        UNION ALL SELECT 4, 'purchase', COUNT(*) FROM s4
    )
    SELECT stage_idx, stage, n_users,
           ROUND(CAST(n_users AS DOUBLE)
                 / FIRST_VALUE(n_users) OVER w, 4) AS pct_of_start,
           ROUND(CAST(n_users AS DOUBLE)
                 / LAG(n_users) OVER w, 4) AS pct_of_prev
    FROM stages
    WINDOW w AS (ORDER BY stage_idx)
    """,
    tags=("events", "funnel", "conversion", "product-analytics"),
)
def q_events_funnel(spark, sf_dir):
    """Ordered conversion funnel (view → click → signup → purchase) with
    strict event-time chaining: stage k's timestamp must be strictly
    after the user's chained stage-(k-1) time, so out-of-order events
    (a purchase before the first view) never inflate conversion.

    Scale shape: every stage is a groupBy + equi-join on ``user_id`` —
    the SAME shuffle key throughout, so AQE/exchange-reuse co-partitions
    the whole chain, and each stage's frame shrinks monotonically (the
    classic funnel property). The final percentages run over a 4-row
    frame — a single-partition window over driver-size data, not a
    global sort of the input. At 100 TB the only cost is the first
    user_id shuffle of the events scan; stages 2-4 join against
    ever-smaller keyed frames.
    """
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_type", epoch_s("ts").alias("ts_s")
    )

    prev = (
        ev.filter(F.col("event_type") == FUNNEL_STAGES[0])
        .groupBy("user_id")
        .agg(F.min("ts_s").alias("t_prev"))
    )
    stage_frames = [prev]
    for stage in FUNNEL_STAGES[1:]:
        prev = (
            ev.filter(F.col("event_type") == stage)
            .join(prev, "user_id")
            .filter(F.col("ts_s") > F.col("t_prev"))
            .groupBy("user_id")
            .agg(F.min("ts_s").alias("t_prev"))
        )
        stage_frames.append(prev)

    counts = None
    for i, (stage, frame) in enumerate(zip(FUNNEL_STAGES, stage_frames), start=1):
        row = frame.agg(
            F.lit(i).alias("stage_idx"),
            F.lit(stage).alias("stage"),
            F.count("*").alias("n_users"),
        )
        counts = row if counts is None else counts.unionAll(row)

    w = W.orderBy("stage_idx").rowsBetween(W.unboundedPreceding, W.currentRow)
    return counts.select(
        "stage_idx",
        "stage",
        "n_users",
        F.round(
            F.col("n_users") / F.first("n_users").over(w), 4
        ).alias("pct_of_start"),
        F.round(
            F.col("n_users") / F.lag("n_users").over(W.orderBy("stage_idx")), 4
        ).alias("pct_of_prev"),
    )


# Triangle-count edge support floor: a co-purchase edge must appear in
# at least this many distinct orders (drops the long random tail the
# same way q_agg_copurchase's support floor does).
TRIANGLE_MIN_SUPPORT = 2


@query(
    "q_graph_triangles",
    oracle=f"""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), edges AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey
                                 AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING COUNT(*) >= {TRIANGLE_MIN_SUPPORT}
    ), wedges AS (
        SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        FROM edges e1 JOIN edges e2 ON e1.dst = e2.src
    ), triangles AS (
        SELECT w.a, w.b, w.c
        FROM wedges w JOIN edges e ON w.a = e.src AND w.c = e.dst
    )
    SELECT (SELECT COUNT(DISTINCT src) FROM (
                SELECT src FROM edges UNION ALL SELECT dst FROM edges))
               AS n_nodes,
           (SELECT COUNT(*) FROM edges) AS n_edges,
           (SELECT COUNT(*) FROM triangles) AS n_triangles
    """,
    tags=("graph", "triangles", "motif"),
)
def q_graph_triangles(spark, sf_dir):
    """Triangle counting on the co-purchase graph (parts linked when the
    same order contains both, support ≥ {TRIANGLE_MIN_SUPPORT}) — the
    third graph operator next to PageRank and pointer-doubling, and the
    canonical motif/clustering primitive. Edges are kept in canonical
    ``src < dst`` orientation, so the wedge join (e1.dst = e2.src)
    enumerates each candidate path a<b<c exactly once and the closing
    edge lookup counts every triangle exactly once — no ×6 overcount,
    no post-hoc dedup.

    Scale shape: edge build = one basket-keyed self-join (Σ basket²,
    not corpus²) + support-floor aggregate; the wedge join shuffles on
    the shared vertex and the closing join on (a, c) — both equi-joins
    a 1000-executor cluster hash-partitions cleanly. At production
    degree skew you'd orient edges by (degree, id) instead of raw id
    (Cohen's algorithm) so hub vertices don't own Σ deg² wedges; the
    fixture's near-uniform degrees don't need it, and the orientation
    trick is noted here as the 100 TB path.
    """
    items = (
        t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    )
    a = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src"))
    b = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst"))
    edges = (
        a.join(b, "ok")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= TRIANGLE_MIN_SUPPORT)
        .select("src", "dst")
    )
    e1 = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = edges.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    wedges = e1.join(e2, "b")
    closing = edges.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    triangles = wedges.join(closing, ["a", "c"])
    nodes = (
        edges.select(F.col("src").alias("v"))
        .unionAll(edges.select(F.col("dst").alias("v")))
        .agg(F.countDistinct("v").alias("n_nodes"))
    )
    counts = edges.agg(F.count("*").alias("n_edges")).crossJoin(
        triangles.agg(F.count("*").alias("n_triangles"))
    )
    return nodes.crossJoin(counts).select("n_nodes", "n_edges", "n_triangles")


# Anomaly flag threshold in sigmas, and the trailing window width in
# hours the baseline is estimated from.
ANOMALY_Z = 2.0
ANOMALY_LOOKBACK_H = 24


@query(
    "q_events_anomaly",
    oracle=f"""
    WITH hourly AS (
        SELECT event_type,
               CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_s,
               COUNT(*) AS cnt
        FROM events GROUP BY 1, 2
    ), scored AS (
        SELECT event_type, hour_s, cnt,
               AVG(cnt) OVER w AS mu,
               STDDEV_SAMP(cnt) OVER w AS sd,
               COUNT(*) OVER w AS n_baseline
        FROM hourly
        WINDOW w AS (PARTITION BY event_type ORDER BY hour_s
                     ROWS BETWEEN {ANOMALY_LOOKBACK_H} PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, hour_s, cnt, n_baseline,
           ROUND(mu, 4) AS baseline_mean,
           ROUND((cnt - mu) / sd, 4) AS z
    FROM scored
    WHERE n_baseline >= 12 AND sd > 0
      AND ABS((cnt - mu) / sd) > {ANOMALY_Z}
    """,
    tags=("events", "anomaly", "monitoring", "data-quality"),
)
def q_events_anomaly(spark, sf_dir):
    """Rolling z-score anomaly detection on hourly event volumes — the
    volume-monitoring alarm every ingest pipeline runs (a collapsed
    source or a bot flood shows up as |z| > {ANOMALY_Z} against the
    trailing-{ANOMALY_LOOKBACK_H}h baseline; current hour excluded from
    its own baseline, warm-up hours suppressed).

    Scale shape: the hourly aggregate collapses any event volume to
    |types| × |hours| rows FIRST (one combinable shuffle); the rolling
    mean/stddev window runs over that collapsed frame, partitioned by
    event_type — never over raw events. AVG of bigint counts is the
    same double division in both engines; z rounds to 4dp per the
    moment discipline.
    """
    ev = t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_s"),
    ).agg(F.count("*").alias("cnt"))
    w = (
        W.partitionBy("event_type")
        .orderBy("hour_s")
        .rowsBetween(-ANOMALY_LOOKBACK_H, -1)
    )
    scored = hourly.select(
        "event_type",
        "hour_s",
        "cnt",
        F.avg("cnt").over(w).alias("mu"),
        F.stddev_samp("cnt").over(w).alias("sd"),
        F.count("*").over(w).alias("n_baseline"),
    )
    z = (F.col("cnt") - F.col("mu")) / F.col("sd")
    return (
        scored.filter(
            (F.col("n_baseline") >= 12) & (F.col("sd") > 0) & (F.abs(z) > ANOMALY_Z)
        )
        .select(
            "event_type",
            "hour_s",
            "cnt",
            "n_baseline",
            F.round("mu", 4).alias("baseline_mean"),
            F.round(z, 4).alias("z"),
        )
    )


@query(
    "q_agg_pareto",
    oracle="""
    WITH part_rev AS (
        SELECT l_partkey,
               CAST(SUM(CAST(CAST(l_extendedprice * (1 - l_discount)
                                  AS DECIMAL(18,4)) * 10000 AS BIGINT))
                    AS BIGINT) AS dmils
        FROM lineitem GROUP BY 1
    ), ranked AS (
        SELECT l_partkey, dmils,
               SUM(dmils) OVER (ORDER BY dmils DESC, l_partkey
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum,
               SUM(dmils) OVER () AS tot
        FROM part_rev
    ), classed AS (
        SELECT l_partkey, dmils,
               CASE WHEN cum * 10 <= tot * 8 THEN 'A'
                    WHEN cum * 20 <= tot * 19 THEN 'B'
                    ELSE 'C' END AS abc_class
        FROM ranked
    )
    SELECT abc_class, COUNT(*) AS n_parts,
           CAST(ROUND(SUM(dmils) / 10000.0, 2) AS DOUBLE) AS class_revenue
    FROM classed GROUP BY 1
    """,
    tags=("agg", "pareto", "abc", "merchandising"),
)
def q_agg_pareto(spark, sf_dir):
    """Pareto / ABC classification (the 80-15-5 merchandising rollup):
    parts ranked by revenue, classed A while their running share ≤ 80%,
    B to 95%, else C. Revenue is exact integer tenths-of-mills (so the
    share boundaries are integer cross-multiplications, cum·10 ≤ tot·8,
    that can never flip on a float ulp), and the running sum over the
    part catalog — which GROWS with the corpus — is assigned by the
    two-phase binned decomposition (operators/globalrank.py): the only
    unpartitioned window runs over ≤1024 revenue-range bins; within-bin
    running sums are a bin-partitioned parallel window. Exactly equal
    to the single global window it replaces, with no single-task
    catalog sort (VERDICT r2 "What's wrong" #1)."""
    from ..operators.globalrank import with_global_running

    li = t(spark, sf_dir, "lineitem")
    part_rev = li.groupBy("l_partkey").agg(
        F.sum(
            (
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
                * 10000
            ).cast("long")
        ).alias("dmils")
    )
    ranked = with_global_running(
        part_rev,
        "dmils",
        ["l_partkey"],
        descending=True,
        cumsum_col="cum",
        total_sum_col="tot",
        materialize=True,
    )
    classed = ranked.select(
        "l_partkey",
        "dmils",
        F.when(F.col("cum") * 10 <= F.col("tot") * 8, "A")
        .when(F.col("cum") * 20 <= F.col("tot") * 19, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    return classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(F.sum("dmils") / 10000.0, 2).cast("double").alias("class_revenue"),
    )


# Attribution lookback: a purchase credits the user's latest click no
# older than this many seconds; otherwise it counts as organic.
ATTRIB_LOOKBACK_S = 86400


@query(
    "q_events_attribution",
    oracle=f"""
    WITH clicks AS (
        SELECT user_id,
               CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS c_ts,
               'ch' || CAST(CAST(json_extract(props, '$.k') AS BIGINT) % 4 AS VARCHAR)
                   AS channel
        FROM events WHERE event_type = 'click'
    ), purchases AS (
        SELECT event_id, user_id,
               CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS p_ts,
               value
        FROM events WHERE event_type = 'purchase'
    ), attributed AS (
        SELECT p.event_id, p.value,
               CASE WHEN c.c_ts IS NOT NULL
                         AND p.p_ts - c.c_ts <= {ATTRIB_LOOKBACK_S}
                    THEN c.channel ELSE 'organic' END AS channel
        FROM purchases p
        ASOF LEFT JOIN clicks c
             ON p.user_id = c.user_id AND p.p_ts >= c.c_ts
    )
    SELECT channel,
           COUNT(*) AS n_purchases,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM attributed GROUP BY channel
    """,
    tags=("events", "attribution", "marketing", "asof"),
)
def q_events_attribution(spark, sf_dir):
    """Last-touch marketing attribution with a lookback cap: each
    purchase credits the user's most recent click within the prior
    {ATTRIB_LOOKBACK_S}s (channel = click's props.k mod 4); stale or
    absent clicks fall to 'organic'. The temporal-credit shape every
    growth team runs, and the capped variant of a plain as-of join —
    the cap is a post-attach filter, NOT a join predicate, so the plan
    stays the linear merge-scan asof (operators/asof.py): one user_id
    shuffle, no inequality-join blowup.

    Ties: same-second clicks resolve to the struct-max (ts, channel) —
    deterministic in both engines. The asof payload is a STRUCT riding
    the standard asof machinery (the sentinel-null cast covers nested
    types — cf. ADVICE r1 on payload dtypes).
    """
    from ..operators.asof import asof_join

    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.unix_timestamp("ts").alias("ts_s"),
        F.struct(
            F.unix_timestamp("ts").alias("c_ts"),
            F.concat(
                F.lit("ch"),
                (F.get_json_object("props", "$.k").cast("bigint") % 4).cast("string"),
            ).alias("channel"),
        ).alias("click"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.unix_timestamp("ts").alias("ts_s"), "value"
    )
    attached = asof_join(
        purchases, clicks, on="user_id", ts="ts_s", payload="click", alias="last_click"
    )
    channel = F.when(
        F.col("last_click").isNotNull()
        & (F.col("ts_s") - F.col("last_click.c_ts") <= ATTRIB_LOOKBACK_S),
        F.col("last_click.channel"),
    ).otherwise("organic")
    return (
        attached.select(channel.alias("channel"), "value")
        .groupBy("channel")
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("revenue"),
        )
    )


# Capped funnel: stage k must happen within this many seconds of the
# chained stage-(k-1) time, not merely after it.
FUNNEL_WINDOW_S = 7 * 86400


@query(
    "q_events_funnel_windowed",
    oracle=f"""
    WITH s1 AS (
        SELECT user_id, MIN({ORACLE_EPOCH_S.format(col="ts")}) AS t1
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ), s2 AS (
        SELECT e.user_id, MIN({ORACLE_EPOCH_S.format(col="e.ts")}) AS t2
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'click'
          AND {ORACLE_EPOCH_S.format(col="e.ts")} > s1.t1
          AND {ORACLE_EPOCH_S.format(col="e.ts")} <= s1.t1 + {FUNNEL_WINDOW_S}
        GROUP BY e.user_id
    ), s3 AS (
        SELECT e.user_id, MIN({ORACLE_EPOCH_S.format(col="e.ts")}) AS t3
        FROM events e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'signup'
          AND {ORACLE_EPOCH_S.format(col="e.ts")} > s2.t2
          AND {ORACLE_EPOCH_S.format(col="e.ts")} <= s2.t2 + {FUNNEL_WINDOW_S}
        GROUP BY e.user_id
    ), s4 AS (
        SELECT e.user_id, MIN({ORACLE_EPOCH_S.format(col="e.ts")}) AS t4
        FROM events e JOIN s3 ON e.user_id = s3.user_id
        WHERE e.event_type = 'purchase'
          AND {ORACLE_EPOCH_S.format(col="e.ts")} > s3.t3
          AND {ORACLE_EPOCH_S.format(col="e.ts")} <= s3.t3 + {FUNNEL_WINDOW_S}
        GROUP BY e.user_id
    ), stages AS (
        SELECT 1 AS stage_idx, 'view' AS stage, COUNT(*) AS n_users FROM s1
        UNION ALL SELECT 2, 'click', COUNT(*) FROM s2
        UNION ALL SELECT 3, 'signup', COUNT(*) FROM s3
        UNION ALL SELECT 4, 'purchase', COUNT(*) FROM s4
    )
    SELECT stage_idx, stage, n_users,
           ROUND(CAST(n_users AS DOUBLE)
                 / FIRST_VALUE(n_users) OVER w, 4) AS pct_of_start
    FROM stages
    WINDOW w AS (ORDER BY stage_idx)
    """,
    tags=("events", "funnel", "conversion", "windowed"),
)
def q_events_funnel_windowed(spark, sf_dir):
    """Time-capped conversion funnel: stage k counts only when reached
    within {FUNNEL_WINDOW_S}s of the user's chained stage-(k-1) time —
    the form product analytics actually reports ('signup within 7 days
    of first click'), where the uncapped q_events_funnel overstates
    conversion by crediting arbitrarily-late events. Identical plan
    shape: the cap is one more scan-side predicate on each stage's
    filter, so the co-partitioned user_id join chain and its shuffle
    count are unchanged.
    """
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_type", epoch_s("ts").alias("ts_s")
    )
    prev = (
        ev.filter(F.col("event_type") == FUNNEL_STAGES[0])
        .groupBy("user_id")
        .agg(F.min("ts_s").alias("t_prev"))
    )
    frames = [prev]
    for stage in FUNNEL_STAGES[1:]:
        prev = (
            ev.filter(F.col("event_type") == stage)
            .join(prev, "user_id")
            .filter(
                (F.col("ts_s") > F.col("t_prev"))
                & (F.col("ts_s") <= F.col("t_prev") + FUNNEL_WINDOW_S)
            )
            .groupBy("user_id")
            .agg(F.min("ts_s").alias("t_prev"))
        )
        frames.append(prev)
    counts = None
    for i, (stage, frame) in enumerate(zip(FUNNEL_STAGES, frames), start=1):
        row = frame.agg(
            F.lit(i).alias("stage_idx"),
            F.lit(stage).alias("stage"),
            F.count("*").alias("n_users"),
        )
        counts = row if counts is None else counts.unionAll(row)
    w = W.orderBy("stage_idx").rowsBetween(W.unboundedPreceding, W.currentRow)
    return counts.select(
        "stage_idx",
        "stage",
        "n_users",
        F.round(F.col("n_users") / F.first("n_users").over(w), 4).alias(
            "pct_of_start"
        ),
    )


@query(
    "q_events_uplift_qini",
    oracle="""
    WITH per_user AS (
        SELECT user_id, user_id % 2 AS treat,
               COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS clicks,
               CASE WHEN COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) >= 14
                    THEN 1 ELSE 0 END AS converted
        FROM events GROUP BY user_id
    ), scored AS (
        SELECT treat, converted,
               CAST((CASE WHEN clicks >= 0 THEN 1 ELSE 0 END)
                  + (CASE WHEN clicks >= 4 THEN 1 ELSE 0 END)
                  + (CASE WHEN clicks >= 6 THEN 1 ELSE 0 END)
                  + (CASE WHEN clicks >= 8 THEN 1 ELSE 0 END)
                  + (CASE WHEN clicks >= 10 THEN 1 ELSE 0 END)
                  + (CASE WHEN clicks >= 13 THEN 1 ELSE 0 END)
                  + (CASE WHEN clicks >= 15 THEN 1 ELSE 0 END)
                  + (CASE WHEN clicks >= 17 THEN 1 ELSE 0 END)
                  + (CASE WHEN clicks >= 21 THEN 1 ELSE 0 END) AS INT) AS bin
        FROM per_user
    ), per_bin AS (
        SELECT bin,
               COUNT(CASE WHEN treat = 1 THEN 1 END) AS nt,
               COUNT(CASE WHEN treat = 0 THEN 1 END) AS nc,
               COUNT(CASE WHEN treat = 1 AND converted = 1 THEN 1 END) AS ct,
               COUNT(CASE WHEN treat = 0 AND converted = 1 THEN 1 END) AS cc
        FROM scored GROUP BY bin
    )
    SELECT bin,
           CAST(SUM(nt) OVER w AS BIGINT) AS cum_nt,
           CAST(SUM(nc) OVER w AS BIGINT) AS cum_nc,
           CAST(SUM(ct) OVER w AS BIGINT) AS cum_conv_t,
           CAST(SUM(cc) OVER w AS BIGINT) AS cum_conv_c,
           ROUND(SUM(ct) OVER w
                 - CAST(SUM(cc) OVER w AS DOUBLE) * (SUM(nt) OVER w)
                   / NULLIF(SUM(nc) OVER w, 0), 4) AS qini
    FROM per_bin
    WINDOW w AS (ORDER BY bin DESC ROWS UNBOUNDED PRECEDING)
    """,
    tags=("events", "uplift", "qini", "experimentation"),
)
def q_events_uplift_qini(spark, sf_dir):
    """Qini (cumulative uplift) curve — the evaluation readout for
    uplift/targeting models, completing the experimentation suite
    (q_events_abtest z-test, q_events_cuped variance reduction,
    q_events_power_analysis design, q_events_shapley credit): users
    ranked by a closed-form targeting score (a logistic in click count,
    DECIDED BY INTEGER THRESHOLDS: bin = |{j : clicks ≥ c_j}| with
    c_j = ⌈10 + 5·ln(j/(10−j))⌉ = [0,4,6,8,10,13,15,17,21] precomputed
    — identical to floor(10·σ((clicks−10)/5)) capped at 9, but no
    engine evaluates exp() at a bin boundary, so a last-ulp libm
    difference can never flip a decile (ADVICE r3); a real uplift model
    only changes this column), the deterministic user_id%2 treatment split
    (the q_events_abtest convention), and per score-decile the running
    Qini value Q = cumΣconv_T − cumΣconv_C · cum_N_T/cum_N_C. The
    per-user pass is ONE hash aggregate over events; the curve is
    integer arithmetic over the ≤10-row binned frame (the q_ml_auc
    bounded-bin discipline — no per-user sort, no catalog window), with
    the single float division rounded 4dp."""
    ev = t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("clicks"),
        F.when(
            F.count(F.when(F.col("event_type") == "purchase", 1)) >= 14, 1
        )
        .otherwise(0)
        .alias("converted"),
    )
    # bin thresholds c_j = ceil(10 + 5*ln(j/(10-j))), j=1..9 — exact
    # integer decisions equal to floor(10*sigmoid((clicks-10)/5)) cap 9;
    # boundaries are irrational except j=5 (clicks=10, inclusive), so
    # the ceil computed once in double precision is unambiguous.
    _QINI_THRESHOLDS = (0, 4, 6, 8, 10, 13, 15, 17, 21)
    bin_col = sum(
        (F.col("clicks") >= c).cast("int") for c in _QINI_THRESHOLDS
    )
    scored = per_user.select(
        (F.col("user_id") % 2).alias("treat"),
        "converted",
        bin_col.cast("int").alias("bin"),
    )
    per_bin = scored.groupBy("bin").agg(
        F.count(F.when(F.col("treat") == 1, 1)).alias("nt"),
        F.count(F.when(F.col("treat") == 0, 1)).alias("nc"),
        F.count(F.when((F.col("treat") == 1) & (F.col("converted") == 1), 1)).alias(
            "ct"
        ),
        F.count(F.when((F.col("treat") == 0) & (F.col("converted") == 1), 1)).alias(
            "cc"
        ),
    )
    w = W.orderBy(F.col("bin").desc()).rowsBetween(W.unboundedPreceding, 0)
    cum_nt = F.sum("nt").over(w)
    cum_nc = F.sum("nc").over(w)
    cum_ct = F.sum("ct").over(w)
    cum_cc = F.sum("cc").over(w)
    return per_bin.select(
        "bin",
        cum_nt.cast("bigint").alias("cum_nt"),
        cum_nc.cast("bigint").alias("cum_nc"),
        cum_ct.cast("bigint").alias("cum_conv_t"),
        cum_cc.cast("bigint").alias("cum_conv_c"),
        F.round(
            cum_ct
            - cum_cc.cast("double") * cum_nt / F.nullif(cum_nc, F.lit(0)),
            4,
        ).alias("qini"),
    )


@query(
    "q_events_ratio_metric",
    oracle="""
    WITH per_user AS (
        SELECT user_id, user_id % 2 AS variant,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                             THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS x,
               CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ), stats AS (
        SELECT variant, COUNT(*) AS n,
               CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy,
               CAST(SUM(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy
        FROM per_user GROUP BY 1
    ), d AS (
        SELECT variant, n, sx / sy AS r,
               ((sxx - sx * sx / n) - 2 * (sx / sy) * (sxy - sx * sy / n)
                + (sx / sy) * (sx / sy) * (syy - sy * sy / n))
               / (n - 1) / n / ((sy / n) * (sy / n)) AS var_r
        FROM stats
    )
    SELECT a.n AS n_control, b.n AS n_treat,
           ROUND(a.r / 100.0, 6) AS ratio_control,
           ROUND(b.r / 100.0, 6) AS ratio_treat,
           ROUND((b.r - a.r) / 100.0, 6) AS diff,
           ROUND((b.r - a.r) / SQRT(a.var_r + b.var_r), 4) AS z_score
    FROM d a JOIN d b ON a.variant = 0 AND b.variant = 1
    """,
    tags=("events", "ratio-metric", "delta-method", "experimentation"),
)
def q_events_ratio_metric(spark, sf_dir):
    """Ratio-metric A/B test via the delta method — the variance
    machinery q_events_abtest's per-user binary conversion doesn't need
    but every revenue-per-active-day / CTR-style metric does: the unit
    of analysis (user) differs from the ratio's denominator (active
    days), so Var(X̄/Ȳ) must account for the X–Y covariance:
    Var(R) ≈ (σ²_x − 2Rσ_xy + R²σ²_y) / (n·Ȳ²). Numerator in exact
    integer cents, denominator in exact day counts, all six sufficient
    statistics exact until the final ratio/variance floats (rounded 6/4
    dp) — one hash aggregate per user, one 2-row variant aggregate, a
    2×2 self-join. The deterministic user_id%2 split matches
    q_events_abtest."""
    ev = t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                (dec("value") * 100).cast("long"),
            ).otherwise(0)
        ).alias("x"),
        F.count_distinct(F.to_date("ts")).alias("y"),
    ).select((F.col("user_id") % 2).alias("variant"), "x", "y")
    d38 = "decimal(38,0)"
    stats = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x").cast(d38) * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y").cast(d38) * F.col("y")).cast("double").alias("syy"),
        F.sum(F.col("x").cast(d38) * F.col("y")).cast("double").alias("sxy"),
    )
    r = F.col("sx") / F.col("sy")
    var_r = (
        (
            (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
            - 2 * r * (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"))
            + r * r * (F.col("syy") - F.col("sy") * F.col("sy") / F.col("n"))
        )
        / (F.col("n") - 1)
        / F.col("n")
        / ((F.col("sy") / F.col("n")) * (F.col("sy") / F.col("n")))
    )
    d = stats.select("variant", "n", r.alias("r"), var_r.alias("var_r"))
    a = d.filter(F.col("variant") == 0).select(
        F.col("n").alias("n_control"), F.col("r").alias("ra"), F.col("var_r").alias("va")
    )
    b = d.filter(F.col("variant") == 1).select(
        F.col("n").alias("n_treat"), F.col("r").alias("rb"), F.col("var_r").alias("vb")
    )
    return a.crossJoin(b).select(
        "n_control",
        "n_treat",
        F.round(F.col("ra") / 100.0, 6).alias("ratio_control"),
        F.round(F.col("rb") / 100.0, 6).alias("ratio_treat"),
        F.round((F.col("rb") - F.col("ra")) / 100.0, 6).alias("diff"),
        F.round(
            (F.col("rb") - F.col("ra")) / F.sqrt(F.col("va") + F.col("vb")), 4
        ).alias("z_score"),
    )


@query(
    "q_events_abtest",
    oracle="""
    WITH assigned AS (
        SELECT user_id, user_id % 2 AS variant,
               CASE WHEN COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) >= 14
                    THEN 1 ELSE 0 END AS converted
        FROM events GROUP BY user_id
    ), arms AS (
        SELECT variant,
               COUNT(*) AS n_users,
               CAST(SUM(converted) AS BIGINT) AS n_converted,
               CAST(SUM(converted) AS DOUBLE) / COUNT(*) AS rate
        FROM assigned GROUP BY variant
    ), test AS (
        SELECT a.n_users AS n_a, a.n_converted AS c_a, a.rate AS rate_a,
               b.n_users AS n_b, b.n_converted AS c_b, b.rate AS rate_b,
               CAST(a.n_converted + b.n_converted AS DOUBLE)
                   / (a.n_users + b.n_users) AS pooled
        FROM arms a JOIN arms b ON a.variant = 0 AND b.variant = 1
    )
    SELECT n_a, c_a, ROUND(rate_a, 6) AS rate_a,
           n_b, c_b, ROUND(rate_b, 6) AS rate_b,
           ROUND((rate_b - rate_a)
                 / NULLIF(SQRT(pooled * (1 - pooled) * (1.0/n_a + 1.0/n_b)), 0), 4)
               AS z_score,
           ABS((rate_b - rate_a)
               / NULLIF(SQRT(pooled * (1 - pooled) * (1.0/n_a + 1.0/n_b)), 0)) > 1.96
               AS significant_95
    FROM test
    """,
    tags=("events", "abtest", "ztest", "experimentation"),
)
def q_events_abtest(spark, sf_dir):
    """Two-proportion z-test between experiment arms (variant = user_id
    parity; conversion = any purchase): pooled-variance z-score and the
    95% significance verdict — the experimentation readout every event
    pipeline serves. Per-user collapse FIRST (one user_id shuffle —
    unit of randomization = unit of analysis, the correctness rule
    that stops event-level pseudo-replication), then a 2-row arm
    aggregate and closed-form arithmetic. All counts exact integers;
    the z formula is one deterministic double expression.
    """
    ev = t(spark, sf_dir, "events")
    assigned = ev.groupBy("user_id").agg(
        F.when(
            F.count(F.when(F.col("event_type") == "purchase", 1)) >= 14, 1
        )
        .otherwise(0)
        .alias("converted")
    ).withColumn("variant", F.col("user_id") % 2)
    arms = assigned.groupBy("variant").agg(
        F.count("*").alias("n_users"),
        F.sum("converted").cast("bigint").alias("n_converted"),
        (F.sum("converted").cast("double") / F.count("*")).alias("rate"),
    )
    a = arms.filter(F.col("variant") == 0).select(
        F.col("n_users").alias("n_a"),
        F.col("n_converted").alias("c_a"),
        F.col("rate").alias("rate_a"),
    )
    b = arms.filter(F.col("variant") == 1).select(
        F.col("n_users").alias("n_b"),
        F.col("n_converted").alias("c_b"),
        F.col("rate").alias("rate_b"),
    )
    test = a.crossJoin(F.broadcast(b)).withColumn(
        "pooled",
        (F.col("c_a") + F.col("c_b")).cast("double") / (F.col("n_a") + F.col("n_b")),
    )
    z = (F.col("rate_b") - F.col("rate_a")) / F.nullif(
        F.sqrt(
            F.col("pooled")
            * (1 - F.col("pooled"))
            * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
        ),
        F.lit(0.0),
    )
    return test.select(
        "n_a",
        "c_a",
        F.round("rate_a", 6).alias("rate_a"),
        "n_b",
        "c_b",
        F.round("rate_b", 6).alias("rate_b"),
        F.round(z, 4).alias("z_score"),
        (F.abs(z) > 1.96).alias("significant_95"),
    )


SESSION_GAP_US = 30 * 60 * 1_000_000


@query(
    "q_events_session_metrics",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
               CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                         - LAG(epoch_us(CAST(ts AS TIMESTAMP)))
                           OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         >= 1800000000
                         OR LAG(epoch_us(CAST(ts AS TIMESTAMP)))
                            OVER (PARTITION BY user_id ORDER BY ts, event_id)
                            IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ), sess AS (
        SELECT user_id,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sess_id,
               ts_us
        FROM ordered
    ), per_session AS (
        SELECT user_id, sess_id,
               COUNT(*) AS n_events,
               (MAX(ts_us) - MIN(ts_us)) // 1000000 AS duration_s
        FROM sess GROUP BY 1, 2
    )
    SELECT COUNT(*) AS n_sessions,
           COUNT(DISTINCT user_id) AS n_users,
           ROUND(CAST(SUM(n_events) AS DOUBLE) / COUNT(*), 6) AS avg_events,
           ROUND(quantile_cont(duration_s, 0.5), 2) AS p50_duration_s,
           ROUND(quantile_cont(duration_s, 0.9), 2) AS p90_duration_s,
           ROUND(CAST(COUNT(CASE WHEN n_events = 1 THEN 1 END) AS DOUBLE)
                 / COUNT(*), 6) AS bounce_rate
    FROM per_session
    """,
    tags=("events", "sessions", "metrics", "product-analytics"),
)
def q_events_session_metrics(spark, sf_dir):
    """Session-quality metrics — the reporting layer over
    sessionization: session count, average events per session, exact
    p50/p90 duration, and bounce rate (single-event sessions). Sessions
    come from the same gaps-and-islands chain as q_win_gaps_islands
    (30-min gap); the metrics are then a GLOBAL rollup over the
    COLLAPSED per-session frame — sessions are orders of magnitude
    fewer than events, so the exact percentile over them is fine where
    one over raw events would not be (approx_percentile is the swap-in
    when even sessions are huge).
    """
    ev = t(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    w_ord = W.partitionBy("user_id").orderBy("ts", "event_id")
    epoch_us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = epoch_us - F.lag(epoch_us).over(w_ord)
    flagged = ev.withColumn(
        "is_new", F.when(gap.isNull() | (gap >= SESSION_GAP_US), 1).otherwise(0)
    ).withColumn("ts_us", epoch_us)
    sess = flagged.withColumn(
        "sess_id",
        F.sum("is_new").over(w_ord.rowsBetween(W.unboundedPreceding, 0)),
    )
    per_session = sess.groupBy("user_id", "sess_id").agg(
        F.count("*").alias("n_events"),
        F.floor((F.max("ts_us") - F.min("ts_us")) / 1_000_000).alias("duration_s"),
    )
    return per_session.agg(
        F.count("*").alias("n_sessions"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum("n_events") / F.count("*"), 6).alias("avg_events"),
        F.round(F.percentile("duration_s", F.lit(0.5)), 2).alias("p50_duration_s"),
        F.round(F.percentile("duration_s", F.lit(0.9)), 2).alias("p90_duration_s"),
        F.round(
            F.count(F.when(F.col("n_events") == 1, 1)) / F.count("*"), 6
        ).alias("bounce_rate"),
    )


@query(
    "q_events_funnel_lag",
    oracle=f"""
    WITH s1 AS (
        SELECT user_id, MIN({ORACLE_EPOCH_S.format(col="ts")}) AS t1
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ), s2 AS (
        SELECT e.user_id, s1.t1, MIN({ORACLE_EPOCH_S.format(col="e.ts")}) AS t2
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'click' AND {ORACLE_EPOCH_S.format(col="e.ts")} > s1.t1
        GROUP BY e.user_id, s1.t1
    ), s3 AS (
        SELECT e.user_id, s2.t2, MIN({ORACLE_EPOCH_S.format(col="e.ts")}) AS t3
        FROM events e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'signup' AND {ORACLE_EPOCH_S.format(col="e.ts")} > s2.t2
        GROUP BY e.user_id, s2.t2
    ), s4 AS (
        SELECT e.user_id, s3.t3, MIN({ORACLE_EPOCH_S.format(col="e.ts")}) AS t4
        FROM events e JOIN s3 ON e.user_id = s3.user_id
        WHERE e.event_type = 'purchase' AND {ORACLE_EPOCH_S.format(col="e.ts")} > s3.t3
        GROUP BY e.user_id, s3.t3
    ), lags AS (
        SELECT 2 AS stage_idx, 'view->click' AS transition, t2 - t1 AS lag_s FROM s2
        UNION ALL SELECT 3, 'click->signup', t3 - t2 FROM s3
        UNION ALL SELECT 4, 'signup->purchase', t4 - t3 FROM s4
    )
    SELECT stage_idx, transition,
           COUNT(*) AS n_users,
           ROUND(quantile_cont(lag_s, 0.5), 2) AS p50_lag_s,
           ROUND(quantile_cont(lag_s, 0.9), 2) AS p90_lag_s
    FROM lags GROUP BY 1, 2
    """,
    tags=("events", "funnel", "latency", "product-analytics"),
)
def q_events_funnel_lag(spark, sf_dir):
    """Time-to-convert per funnel transition: for each user reaching
    stage k, the lag from their chained stage-(k-1) time; reported as
    per-transition p50/p90 — the 'how long does conversion take'
    readout that pairs with q_events_funnel's 'how many convert'. Same
    co-partitioned user_id join chain; each stage keeps its
    predecessor's timestamp alongside its own, so the lag is row-local
    arithmetic and the exact percentile runs over the per-transition
    user frames (funnel-shrunk, ≪ events).
    """
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_type", epoch_s("ts").alias("ts_s")
    )
    prev = (
        ev.filter(F.col("event_type") == FUNNEL_STAGES[0])
        .groupBy("user_id")
        .agg(F.min("ts_s").alias("t_prev"))
    )
    lag_frames = []
    for i, stage in enumerate(FUNNEL_STAGES[1:], start=2):
        cur = (
            ev.filter(F.col("event_type") == stage)
            .join(prev, "user_id")
            .filter(F.col("ts_s") > F.col("t_prev"))
            .groupBy("user_id", "t_prev")
            .agg(F.min("ts_s").alias("t_cur"))
        )
        lag_frames.append(
            cur.select(
                F.lit(i).alias("stage_idx"),
                F.lit(f"{FUNNEL_STAGES[i - 2]}->{stage}").alias("transition"),
                (F.col("t_cur") - F.col("t_prev")).alias("lag_s"),
            )
        )
        prev = cur.select("user_id", F.col("t_cur").alias("t_prev"))
    lags = lag_frames[0]
    for fr in lag_frames[1:]:
        lags = lags.unionAll(fr)
    return lags.groupBy("stage_idx", "transition").agg(
        F.count("*").alias("n_users"),
        F.round(F.percentile("lag_s", F.lit(0.5)), 2).alias("p50_lag_s"),
        F.round(F.percentile("lag_s", F.lit(0.9)), 2).alias("p90_lag_s"),
    )


@query(
    "q_events_rfm",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               MAX(CAST(epoch(date_trunc('second', ts)) AS BIGINT)) AS last_seen,
               COUNT(*) AS frequency,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS monetary
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id
    ), bounds AS (
        SELECT quantile_cont(last_seen, [0.25, 0.5, 0.75]) AS rb,
               quantile_cont(frequency, [0.25, 0.5, 0.75]) AS fb,
               quantile_cont(monetary, [0.25, 0.5, 0.75]) AS mb
        FROM per_user
    ), scored AS (
        SELECT u.user_id,
               1 + len(list_filter(b.rb, x -> u.last_seen > x)) AS r_score,
               1 + len(list_filter(b.fb, x -> u.frequency > x)) AS f_score,
               1 + len(list_filter(b.mb, x -> u.monetary > x)) AS m_score
        FROM per_user u CROSS JOIN bounds b
    )
    SELECT r_score, f_score, m_score,
           COUNT(*) AS n_users,
           CASE WHEN r_score = 4 AND f_score = 4 THEN 'champion'
                WHEN r_score = 1 AND f_score >= 3 THEN 'at_risk'
                WHEN f_score = 1 AND r_score >= 3 THEN 'new'
                ELSE 'regular' END AS segment
    FROM scored
    GROUP BY r_score, f_score, m_score
    """,
    tags=("events", "rfm", "segmentation", "marketing"),
)
def q_events_rfm(spark, sf_dir):
    """RFM segmentation (recency / frequency / monetary): per-user
    purchase profile → quartile scores per dimension → named segments
    (champion / at-risk / new / regular) — the workhorse customer
    segmentation. Scores come from EXACT quartile bounds computed as
    ONE aggregate row and broadcast back (map-only bucketing — the same
    no-global-ntile rule as q_ml_lift_table: a rank window over all
    users would single-partition the user frame at scale; swap in
    approx_percentile beyond fixture sizes, same plan). Output is the
    4³-cell segment distribution — driver-size from any input.
    """
    ev = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    per_user = ev.groupBy("user_id").agg(
        F.max(epoch_s("ts")).alias("last_seen"),
        F.count("*").alias("frequency"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("monetary"),
    )
    qs = F.lit([0.25, 0.5, 0.75])
    bounds = per_user.agg(
        F.percentile("last_seen", qs).alias("rb"),
        F.percentile("frequency", qs).alias("fb"),
        F.percentile("monetary", qs).alias("mb"),
    )
    scored = per_user.crossJoin(F.broadcast(bounds)).select(
        (1 + F.size(F.filter("rb", lambda x: F.col("last_seen") > x))).alias("r_score"),
        (1 + F.size(F.filter("fb", lambda x: F.col("frequency") > x))).alias("f_score"),
        (1 + F.size(F.filter("mb", lambda x: F.col("monetary") > x))).alias("m_score"),
    )
    segment = (
        F.when((F.col("r_score") == 4) & (F.col("f_score") == 4), "champion")
        .when((F.col("r_score") == 1) & (F.col("f_score") >= 3), "at_risk")
        .when((F.col("f_score") == 1) & (F.col("r_score") >= 3), "new")
        .otherwise("regular")
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(F.count("*").alias("n_users"))
        .withColumn("segment", segment)
    )


@query(
    "q_events_cohort_ltv",
    oracle="""
    WITH firsts AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
        FROM events GROUP BY user_id
    ), rev AS (
        SELECT f.cohort_day,
               datediff('day', f.cohort_day, CAST(e.ts AS DATE)) AS age_days,
               CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS day_rev
        FROM events e JOIN firsts f ON e.user_id = f.user_id
        WHERE e.event_type = 'purchase'
        GROUP BY 1, 2
    ), sizes AS (
        SELECT cohort_day, COUNT(*) AS n_users FROM firsts GROUP BY 1
    )
    SELECT r.cohort_day, r.age_days, s.n_users,
           CAST(SUM(r.day_rev) OVER (PARTITION BY r.cohort_day
                                     ORDER BY r.age_days) AS DOUBLE) AS cum_revenue,
           ROUND(CAST(SUM(r.day_rev) OVER (PARTITION BY r.cohort_day
                                           ORDER BY r.age_days) AS DOUBLE)
                 / s.n_users, 6) AS ltv_per_user
    FROM rev r JOIN sizes s ON r.cohort_day = s.cohort_day
    """,
    tags=("events", "ltv", "cohort", "growth"),
)
def q_events_cohort_ltv(spark, sf_dir):
    """Cohort LTV curve — cumulative purchase revenue per cohort by age
    (days since the cohort's first activity), normalized per cohort
    user: the payback-period readout that sits next to
    q_events_retention's activity matrix. One user_id shuffle derives
    cohorts; the revenue rollup collapses to (cohort × age) BEFORE the
    running-sum window (partitioned by cohort — bounded frames);
    cohort sizes broadcast. Exact decimal accumulation end-to-end, so
    the cumulative sums hash despite the window ordering.
    """
    ev = t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort_day"))
    rev = (
        ev.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.to_date("ts"), F.col("cohort_day")).alias("age_days"),
        )
        .agg(
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("decimal(18,6)")
            .alias("day_rev")
        )
    )
    sizes = firsts.groupBy("cohort_day").agg(F.count("*").alias("n_users"))
    w_cum = (
        W.partitionBy("cohort_day")
        .orderBy("age_days")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        rev.join(F.broadcast(sizes), "cohort_day")
        .select(
            "cohort_day",
            "age_days",
            "n_users",
            F.sum("day_rev").over(w_cum).cast("double").alias("cum_revenue"),
            F.round(
                F.sum("day_rev").over(w_cum).cast("double") / F.col("n_users"), 6
            ).alias("ltv_per_user"),
        )
    )


@query(
    "q_events_churn",
    oracle="""
    WITH user_week AS (
        SELECT DISTINCT user_id, date_trunc('week', CAST(ts AS DATE)) AS week
        FROM events
    ), weeks AS (
        SELECT DISTINCT week FROM user_week
    ), flows AS (
        SELECT w.week,
               (SELECT COUNT(*) FROM user_week a WHERE a.week = w.week) AS n_active,
               (SELECT COUNT(*) FROM user_week prev
                WHERE prev.week = w.week - INTERVAL 7 DAY
                  AND NOT EXISTS (SELECT 1 FROM user_week cur
                                  WHERE cur.week = w.week
                                    AND cur.user_id = prev.user_id)) AS n_churned,
               (SELECT COUNT(*) FROM user_week cur
                WHERE cur.week = w.week
                  AND NOT EXISTS (SELECT 1 FROM user_week prev
                                  WHERE prev.week = w.week - INTERVAL 7 DAY
                                    AND prev.user_id = cur.user_id)) AS n_new_or_resurrected
        FROM weeks w
    )
    SELECT CAST(week AS DATE) AS week, n_active, n_churned, n_new_or_resurrected,
           ROUND(CAST(n_churned AS DOUBLE)
                 / NULLIF(n_active - n_new_or_resurrected + n_churned, 0), 6)
               AS churn_rate
    FROM flows
    """,
    tags=("events", "churn", "retention", "growth"),
)
def q_events_churn(spark, sf_dir):
    """Weekly churn accounting: actives, churned (active last week, gone
    this week), new-or-resurrected (active now, absent last week), and
    churn rate against last week's base — the growth-accounting
    identity (active_t = active_{t-1} − churned + new/resurrected)
    every subscription/engagement dashboard runs.

    Scale shape: ONE distinct (user, week) collapse, then a self-join
    on (user, adjacent week) — both shuffles keyed on user_id; the
    per-week rollup is a driver-size frame. The oracle states the
    semantics as correlated NOT EXISTS; the engine runs the
    decorrelated FULL OUTER self-join form (one pass, no per-row
    subqueries).
    """
    ev = t(spark, sf_dir, "events")
    uw = ev.select(
        "user_id", F.date_trunc("week", F.to_date("ts")).cast("date").alias("week")
    ).distinct()
    cur = uw.alias("cur")
    prev = uw.select(
        "user_id", F.date_add(F.col("week"), 7).alias("week")
    ).alias("prev")
    flows = cur.join(prev, ["user_id", "week"], "full_outer").select(
        "week",
        F.col("cur.user_id").isNotNull().alias("is_active"),
        F.col("prev.user_id").isNotNull().alias("was_active"),
    )
    per_week = flows.groupBy("week").agg(
        F.count(F.when(F.col("is_active"), 1)).alias("n_active"),
        F.count(F.when(F.col("was_active") & ~F.col("is_active"), 1)).alias(
            "n_churned"
        ),
        F.count(F.when(F.col("is_active") & ~F.col("was_active"), 1)).alias(
            "n_new_or_resurrected"
        ),
    )
    # weeks present only as prev+7 of the LAST real week (no current
    # activity at all) are phantom rows the oracle's week list doesn't
    # have — keep only weeks that exist in the distinct activity set.
    weeks = uw.select("week").distinct()
    base = F.col("n_active") - F.col("n_new_or_resurrected") + F.col("n_churned")
    return per_week.join(weeks, "week").select(
        "week",
        "n_active",
        "n_churned",
        "n_new_or_resurrected",
        F.round(F.col("n_churned") / F.nullif(base, F.lit(0)), 6).alias("churn_rate"),
    )


@query(
    "q_events_seasonality",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, COUNT(*) AS cnt
        FROM events GROUP BY 1
    ), labeled AS (
        SELECT day, cnt, dayofweek(day) + 1 AS dow FROM daily  -- Spark: Sunday=1; DuckDB: Sunday=0
    ), per_dow AS (
        SELECT dow,
               COUNT(*) AS n_days,
               CAST(SUM(cnt) AS BIGINT) AS total_events,
               CAST(SUM(cnt) AS DOUBLE) / COUNT(*) AS dow_mean
        FROM labeled GROUP BY dow
    ), overall AS (
        SELECT CAST(SUM(cnt) AS DOUBLE) / COUNT(*) AS grand_mean FROM labeled
    )
    SELECT dow, n_days, total_events,
           ROUND(dow_mean, 4) AS dow_mean,
           ROUND(dow_mean / grand_mean, 6) AS seasonal_index
    FROM per_dow CROSS JOIN overall
    """,
    tags=("events", "seasonality", "timeseries"),
)
def q_events_seasonality(spark, sf_dir):
    """Day-of-week seasonality profile: per-weekday mean daily volume
    and its seasonal index against the grand mean — the multiplicative
    decomposition's seasonal factor (index > 1 = above-trend weekday),
    which both capacity planning and the anomaly monitor's baseline
    (q_events_anomaly) consume to avoid flagging every Monday.

    Scale shape: collapse to days first (one combinable shuffle), then
    a 7-group aggregate and a 1-row grand-mean broadcast. Day counts
    are exact integers; the two divisions are deterministic doubles.
    """
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(F.count("*").alias("cnt"))
    labeled = daily.withColumn("dow", F.dayofweek("day"))
    per_dow = labeled.groupBy("dow").agg(
        F.count("*").alias("n_days"),
        F.sum("cnt").cast("bigint").alias("total_events"),
        (F.sum("cnt").cast("double") / F.count("*")).alias("dow_mean"),
    )
    overall = labeled.agg(
        (F.sum("cnt").cast("double") / F.count("*")).alias("grand_mean")
    )
    return per_dow.crossJoin(F.broadcast(overall)).select(
        "dow",
        "n_days",
        "total_events",
        F.round("dow_mean", 4).alias("dow_mean"),
        F.round(F.col("dow_mean") / F.col("grand_mean"), 6).alias("seasonal_index"),
    )


@query(
    "q_events_user_growth",
    oracle="""
    WITH firsts AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day FROM events GROUP BY 1
    ), per_day AS (
        SELECT first_day AS day, COUNT(*) AS n_new FROM firsts GROUP BY 1
    )
    SELECT day, n_new,
           CAST(SUM(n_new) OVER (ORDER BY day) AS BIGINT) AS cumulative_users
    FROM per_day
    """,
    tags=("events", "growth", "cumulative-distinct"),
)
def q_events_user_growth(spark, sf_dir):
    """Cumulative-users growth curve — running DISTINCT count by day,
    computed the scalable way: distinct-to-date(d) ≡ count of users
    whose FIRST day ≤ d, so one user_id aggregate (first-seen day) +
    a per-day count + a running sum over the driver-size day frame
    replaces the naive per-day distinct-over-prefix (which re-counts
    the whole history per day). The identity is exact, not an
    approximation — the standard rewrite for cumulative uniques.
    """
    ev = t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("first_day"))
    per_day = firsts.groupBy(F.col("first_day").alias("day")).agg(
        F.count("*").alias("n_new")
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return per_day.select(
        "day",
        "n_new",
        F.sum("n_new").over(w).cast("bigint").alias("cumulative_users"),
    )


@query(
    "q_events_new_vs_repeat",
    oracle="""
    WITH firsts AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS first_purchase_day
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), labeled AS (
        SELECT date_trunc('week', CAST(e.ts AS DATE)) AS week,
               CASE WHEN CAST(e.ts AS DATE) = f.first_purchase_day
                    THEN 'new' ELSE 'repeat' END AS buyer_type,
               e.value
        FROM events e JOIN firsts f ON e.user_id = f.user_id
        WHERE e.event_type = 'purchase'
    )
    SELECT CAST(week AS DATE) AS week, buyer_type,
           COUNT(*) AS n_purchases,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM labeled GROUP BY 1, 2
    """,
    tags=("events", "new-vs-repeat", "commerce"),
)
def q_events_new_vs_repeat(spark, sf_dir):
    """New-vs-repeat revenue split per week (first-purchase-day
    purchases are 'new'; everything after is 'repeat') — the commerce
    health readout separating acquisition revenue from retention
    revenue. One user_id aggregate pins each user's first purchase day;
    joined back (same shuffle key) it labels every purchase row-locally;
    the weekly rollup is a combinable aggregate. Exact decimal revenue.
    """
    ev = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_purchase_day")
    )
    labeled = ev.join(firsts, "user_id").select(
        F.date_trunc("week", F.to_date("ts")).cast("date").alias("week"),
        F.when(
            F.to_date("ts") == F.col("first_purchase_day"), "new"
        ).otherwise("repeat").alias("buyer_type"),
        "value",
    )
    return labeled.groupBy("week", "buyer_type").agg(
        F.count("*").alias("n_purchases"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("revenue"),
    )


PATH_TOP_N = 15


@query(
    "q_events_purchase_paths",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, event_id, event_type, ts,
               LAG(event_type, 1) OVER w AS prev1,
               LAG(event_type, 2) OVER w AS prev2,
               LAG(event_type, 3) OVER w AS prev3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), paths AS (
        SELECT COALESCE(prev3, '∅') || '>' || COALESCE(prev2, '∅') || '>'
               || COALESCE(prev1, '∅') || '>purchase' AS path
        FROM ordered WHERE event_type = 'purchase'
    )
    SELECT path, COUNT(*) AS n
    FROM paths GROUP BY path
    ORDER BY n DESC, path
    LIMIT {PATH_TOP_N}
    """,
    tags=("events", "paths", "journey", "product-analytics"),
)
def q_events_purchase_paths(spark, sf_dir):
    """Top paths-to-purchase: the exact 3-event window preceding each
    purchase, counted and ranked — the journey analysis that tells a
    growth team WHICH sequences convert (the Sankey drill-down beyond
    q_events_transitions' single-hop matrix). One user_id-partitioned
    window computes all three lags in a single pass; the path strings
    aggregate map-side-combinably and the top-{PATH_TOP_N} is
    TakeOrdered with a path tiebreak. Path cardinality is bounded by
    |event_types|³ — the aggregate never explodes.
    """
    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "event_type",
        F.lag("event_type", 1).over(w).alias("prev1"),
        F.lag("event_type", 2).over(w).alias("prev2"),
        F.lag("event_type", 3).over(w).alias("prev3"),
    )
    paths = ordered.filter(F.col("event_type") == "purchase").select(
        F.concat_ws(
            ">",
            F.coalesce(F.col("prev3"), F.lit("∅")),
            F.coalesce(F.col("prev2"), F.lit("∅")),
            F.coalesce(F.col("prev1"), F.lit("∅")),
            F.lit("purchase"),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(PATH_TOP_N)
    )


@query(
    "q_events_cuped",
    oracle="""
    WITH bounds AS (
        SELECT CAST((MIN(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)))
                     + MAX(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))))
                    // 2 AS BIGINT) AS mid
        FROM events
    ), per_user AS (
        SELECT user_id, user_id % 2 AS variant,
               COUNT(CASE WHEN event_type = 'purchase'
                          AND datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                              < (SELECT mid FROM bounds) THEN 1 END) AS x,
               COUNT(CASE WHEN event_type = 'purchase'
                          AND datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                              >= (SELECT mid FROM bounds) THEN 1 END) AS y
        FROM events GROUP BY user_id
    ), stats AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(x * x) AS DOUBLE) AS sxx,
               CAST(SUM(x * y) AS DOUBLE) AS sxy,
               CAST(SUM(y * y) AS DOUBLE) AS syy,
               CAST(COUNT(CASE WHEN variant = 0 THEN 1 END) AS DOUBLE) AS n_a,
               CAST(SUM(CASE WHEN variant = 0 THEN x ELSE 0 END) AS DOUBLE) AS sx_a,
               CAST(SUM(CASE WHEN variant = 0 THEN y ELSE 0 END) AS DOUBLE) AS sy_a,
               CAST(COUNT(CASE WHEN variant = 1 THEN 1 END) AS DOUBLE) AS n_b,
               CAST(SUM(CASE WHEN variant = 1 THEN x ELSE 0 END) AS DOUBLE) AS sx_b,
               CAST(SUM(CASE WHEN variant = 1 THEN y ELSE 0 END) AS DOUBLE) AS sy_b
        FROM per_user
    ), derived AS (
        SELECT n, n_a, n_b,
               (n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0) AS theta,
               sx / n AS mean_x,
               sy_a / n_a AS mean_y_a, sy_b / n_b AS mean_y_b,
               sx_a / n_a AS mean_x_a, sx_b / n_b AS mean_x_b,
               (n * sxy - sx * sy) * (n * sxy - sx * sy)
                   / NULLIF((n * sxx - sx * sx) * (n * syy - sy * sy), 0)
                   AS rho2
        FROM stats
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           ROUND(theta, 6) AS theta,
           ROUND(mean_y_b - mean_y_a, 6) AS lift_raw,
           ROUND((mean_y_b - theta * (mean_x_b - mean_x))
                 - (mean_y_a - theta * (mean_x_a - mean_x)), 6) AS lift_cuped,
           ROUND(rho2, 6) AS var_reduction
    FROM derived
    """,
    tags=("events", "cuped", "experimentation", "variance-reduction"),
)
def q_events_cuped(spark, sf_dir):
    """CUPED variance-reduced experiment readout (Deng et al., WSDM'13):
    adjust each user's in-experiment purchase count Y by their
    pre-period count X — Y' = Y − θ(X − mean X), θ = cov(X,Y)/var(X) —
    shrinking metric variance by ρ² and making small lifts detectable
    with far fewer users. The pre/post split is the midpoint day of the
    event range. Plan shape: one user_id shuffle collapses events to
    per-user (X, Y), then ONE global aggregate reduces any user count
    to exact integer sufficient statistics (Σx, Σy, Σx², Σxy, Σy², per
    arm) — θ, both arm adjustments, and ρ² are closed-form arithmetic
    on that single row, so the whole readout costs two aggregates at
    any scale and every intermediate is exactly representable (integer
    sums cast to double), keeping Spark and DuckDB bit-identical."""
    ev = t(spark, sf_dir, "events")
    day = F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
    mid = ev.agg(
        F.floor((F.min(day) + F.max(day)) / 2).cast("bigint").alias("mid")
    )
    per_user = (
        ev.crossJoin(F.broadcast(mid))
        .groupBy("user_id")
        .agg(
            F.count(
                F.when((F.col("event_type") == "purchase") & (day < F.col("mid")), 1)
            ).alias("x"),
            F.count(
                F.when((F.col("event_type") == "purchase") & (day >= F.col("mid")), 1)
            ).alias("y"),
        )
        .withColumn("variant", F.col("user_id") % 2)
    )
    d = F.col
    stats = per_user.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(d("x") * d("x")).cast("double").alias("sxx"),
        F.sum(d("x") * d("y")).cast("double").alias("sxy"),
        F.sum(d("y") * d("y")).cast("double").alias("syy"),
        F.count(F.when(d("variant") == 0, 1)).cast("double").alias("n_a"),
        F.sum(F.when(d("variant") == 0, d("x")).otherwise(0)).cast("double").alias("sx_a"),
        F.sum(F.when(d("variant") == 0, d("y")).otherwise(0)).cast("double").alias("sy_a"),
        F.count(F.when(d("variant") == 1, 1)).cast("double").alias("n_b"),
        F.sum(F.when(d("variant") == 1, d("x")).otherwise(0)).cast("double").alias("sx_b"),
        F.sum(F.when(d("variant") == 1, d("y")).otherwise(0)).cast("double").alias("sy_b"),
    )
    theta = (d("n") * d("sxy") - d("sx") * d("sy")) / F.nullif(
        d("n") * d("sxx") - d("sx") * d("sx"), F.lit(0.0)
    )
    derived = stats.select(
        "n",
        "n_a",
        "n_b",
        theta.alias("theta"),
        (d("sx") / d("n")).alias("mean_x"),
        (d("sy_a") / d("n_a")).alias("mean_y_a"),
        (d("sy_b") / d("n_b")).alias("mean_y_b"),
        (d("sx_a") / d("n_a")).alias("mean_x_a"),
        (d("sx_b") / d("n_b")).alias("mean_x_b"),
        (
            (d("n") * d("sxy") - d("sx") * d("sy"))
            * (d("n") * d("sxy") - d("sx") * d("sy"))
            / F.nullif(
                (d("n") * d("sxx") - d("sx") * d("sx"))
                * (d("n") * d("syy") - d("sy") * d("sy")),
                F.lit(0.0),
            )
        ).alias("rho2"),
    )
    return derived.select(
        d("n").cast("bigint").alias("n_users"),
        F.round("theta", 6).alias("theta"),
        F.round(d("mean_y_b") - d("mean_y_a"), 6).alias("lift_raw"),
        F.round(
            (d("mean_y_b") - d("theta") * (d("mean_x_b") - d("mean_x")))
            - (d("mean_y_a") - d("theta") * (d("mean_x_a") - d("mean_x"))),
            6,
        ).alias("lift_cuped"),
        F.round("rho2", 6).alias("var_reduction"),
    )


@query(
    "q_ts_ohlc",
    oracle="""
    WITH ev AS (
        SELECT event_type,
               CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT) AS bar,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id, value
        FROM events
    ), ordered AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY event_type, bar
                                  ORDER BY us, event_id) AS rn_open,
               ROW_NUMBER() OVER (PARTITION BY event_type, bar
                                  ORDER BY us DESC, event_id DESC) AS rn_close
        FROM ev
    )
    SELECT event_type, bar,
           MIN(CASE WHEN rn_open = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MIN(CASE WHEN rn_close = 1 THEN value END) AS close,
           COUNT(*) AS volume,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM ordered
    GROUP BY 1, 2
    """,
    tags=("timeseries", "ohlc", "resample", "bars"),
)
def q_ts_ohlc(spark, sf_dir):
    """Time-series resampling into hourly OHLC bars per event_type —
    open/high/low/close, volume, and an exact decimal value sum (the
    candlestick rollup every metrics store materializes). Open and close
    are first/last by (µs, event_id) — the unique composite order that
    keeps bars deterministic when events share a timestamp; high/low/
    volume are plain aggregates. One shuffle on (type, hour): the two
    ranking windows and the final hash aggregate all ride the same
    exchange, so resampling 100 TB of ticks is a single pass. (min_by/
    max_by would fold the windows into the aggregate but tie-break on
    engine row order; the explicit row_number is what makes the result
    hash-stable.)"""
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        F.unix_timestamp(F.date_trunc("hour", F.col("ts").cast("timestamp"))).alias(
            "bar"
        ),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
        "value",
    )
    w_open = W.partitionBy("event_type", "bar").orderBy("us", "event_id")
    w_close = W.partitionBy("event_type", "bar").orderBy(
        F.desc("us"), F.desc("event_id")
    )
    ordered = ev.withColumn("rn_open", F.row_number().over(w_open)).withColumn(
        "rn_close", F.row_number().over(w_close)
    )
    return ordered.groupBy("event_type", "bar").agg(
        F.min(F.when(F.col("rn_open") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.min(F.when(F.col("rn_close") == 1, F.col("value"))).alias("close"),
        F.count("*").alias("volume"),
        F.sum(dec("value", 18, 6)).cast("double").alias("sum_value"),
    )


@query(
    "q_agg_item_cosine",
    oracle="""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), freq AS (
        SELECT l_partkey, COUNT(*) AS n FROM items GROUP BY 1
    ), pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS support
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    ), tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM items)
    SELECT part_a, part_b, support,
           ROUND(support / SQRT(fa.n * fb.n), 6) AS cosine,
           ROUND(CAST(support AS DOUBLE) * n_orders / (fa.n * fb.n), 6) AS lift
    FROM pairs
    JOIN freq fa ON fa.l_partkey = part_a
    JOIN freq fb ON fb.l_partkey = part_b
    CROSS JOIN tot
    WHERE support >= 3
    """,
    tags=("agg", "item-similarity", "cosine", "lift", "recommendation"),
)
def q_agg_item_cosine(spark, sf_dir):
    """Item-item similarity (the co-occurrence → cosine/lift
    normalization at the heart of item-based collaborative filtering):
    raw co-purchase support (q_agg_copurchase's join) normalized by the
    items' individual basket frequencies — cosine = support/√(n_a·n_b),
    lift = support·N/(n_a·n_b) — so popular items stop dominating the
    neighbor lists. The frequency table is one hash aggregate the size
    of the catalog and joins back broadcast; total N is a broadcast
    scalar. Both scores are single IEEE expressions over exact integer
    counts, rounded to 6dp. Scale shape: the pair join keys on basket
    id (Σ basket², never catalog²), the support floor prunes the random
    tail before the broadcast joins."""
    li = t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    freq = items.groupBy("l_partkey").agg(F.count("*").alias("n"))
    tot = items.agg(F.count_distinct("l_orderkey").alias("n_orders"))
    a = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a"))
    b = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= 3)
    )
    fa = freq.select(F.col("l_partkey").alias("part_a"), F.col("n").alias("na"))
    fb = freq.select(F.col("l_partkey").alias("part_b"), F.col("n").alias("nb"))
    return (
        pairs.join(F.broadcast(fa), "part_a")
        .join(F.broadcast(fb), "part_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "part_a",
            "part_b",
            "support",
            F.round(F.col("support") / F.sqrt(F.col("na") * F.col("nb")), 6).alias(
                "cosine"
            ),
            F.round(
                F.col("support").cast("double")
                * F.col("n_orders")
                / (F.col("na") * F.col("nb")),
                6,
            ).alias("lift"),
        )
    )


@query(
    "q_win_drawdown",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
               CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS rev_cents
        FROM events GROUP BY 1, 2
    ), cums AS (
        SELECT event_type, day,
               SUM(rev_cents) OVER (PARTITION BY event_type ORDER BY day
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum
        FROM daily
    ), curve AS (
        SELECT event_type, day, cum,
               MAX(cum) OVER (PARTITION BY event_type ORDER BY day
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS peak
        FROM cums
    ), dd AS (
        SELECT event_type, day, peak - cum AS drawdown,
               MAX(peak - cum) OVER (PARTITION BY event_type) AS max_dd
        FROM curve
    )
    SELECT event_type,
           CAST(MAX(drawdown) AS BIGINT) AS max_drawdown_cents,
           MIN(CASE WHEN drawdown = max_dd THEN day END) AS trough_day
    FROM dd
    GROUP BY 1
    """,
    tags=("window", "drawdown", "timeseries", "finance"),
)
def q_win_drawdown(spark, sf_dir):
    """Maximum drawdown of the cumulative daily value curve per
    event_type — running peak minus running total, maximized, with the
    earliest trough day (the risk metric every portfolio/retention
    dashboard carries; here 'revenue pace vs best pace so far'). Three
    stacked windows — cumulative sum, running max of it, and the
    argmax — all ordered by day within the same event_type partition,
    so Catalyst executes them on ONE exchange: daily hash-aggregate,
    then a per-key sorted pass. Everything is integer cents, so the
    drawdown is exact and the argmax tie-break (earliest day) is
    engine-independent."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.col("ts").cast("timestamp").cast("date").alias("day")
        )
        .agg(F.sum(dec("value") * 100).cast("long").alias("rev_cents"))
    )
    w_cum = (
        W.partitionBy("event_type").orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    )
    curve = daily.withColumn("cum", F.sum("rev_cents").over(w_cum)).withColumn(
        "peak", F.max(F.sum("rev_cents").over(w_cum)).over(w_cum)
    )
    dd = curve.withColumn("drawdown", F.col("peak") - F.col("cum")).withColumn(
        "max_dd", F.max(F.col("peak") - F.col("cum")).over(W.partitionBy("event_type"))
    )
    return dd.groupBy("event_type").agg(
        F.max("drawdown").alias("max_drawdown_cents"),
        F.min(F.when(F.col("drawdown") == F.col("max_dd"), F.col("day"))).alias(
            "trough_day"
        ),
    )


@query(
    "q_ts_acf_multilag",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_diff('day', DATE '1970-01-01',
                              CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS BIGINT) AS d,
               COUNT(*) AS cnt
        FROM events GROUP BY 1
    ), pairs AS (
        SELECT a.d - b.d AS lag, a.cnt AS x, b.cnt AS y
        FROM daily a JOIN daily b ON a.d - b.d BETWEEN 1 AND 14
    )
    SELECT lag, COUNT(*) AS n_pairs, ROUND(CORR(x, y), 4) AS acf
    FROM pairs GROUP BY 1
    """,
    tags=("timeseries", "acf", "seasonality", "stats"),
)
def q_ts_acf_multilag(spark, sf_dir):
    """The full autocorrelation function, lags 1–14, of the daily total
    event-count series — the seasonality fingerprint q_ts_autocorr's
    single lag can't draw (a weekly cycle shows as the lag-7 peak; its
    harmonics at 14): one daily hash aggregate collapses the event log
    to a calendar-bounded frame, then a ±14-day banded self-join emits
    each (t, t−L) pair exactly once per lag and a per-lag Pearson corr
    finishes it. The banded join's volume is 14·|days| — calendar-
    bounded at any event scale (the same discipline as q_ts_ses's
    banded taps); corr is the single-pass co-moment form in both
    engines, rounded 4dp per the repo's moment-statistics tolerance."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(
            F.datediff(
                F.col("ts").cast("timestamp").cast("date"),
                F.lit("1970-01-01").cast("date"),
            ).alias("d")
        )
        .agg(F.count("*").alias("cnt"))
    )
    a = daily.select(F.col("d").alias("da"), F.col("cnt").alias("x"))
    b = daily.select(F.col("d").alias("db"), F.col("cnt").alias("y"))
    pairs = a.join(
        b, (F.col("da") - F.col("db") >= 1) & (F.col("da") - F.col("db") <= 14)
    ).select((F.col("da") - F.col("db")).alias("lag"), "x", "y")
    return pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.corr("x", "y"), 4).alias("acf"),
    )


@query(
    "q_ts_autocorr",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
               COUNT(*) AS cnt
        FROM events GROUP BY 1, 2
    ), lagged AS (
        SELECT event_type, cnt,
               LAG(cnt) OVER (PARTITION BY event_type ORDER BY day) AS prev_cnt
        FROM daily
    )
    SELECT event_type,
           COUNT(prev_cnt) AS n_pairs,
           ROUND(CORR(cnt, prev_cnt), 4) AS autocorr_lag1
    FROM lagged WHERE prev_cnt IS NOT NULL
    GROUP BY 1
    """,
    tags=("timeseries", "autocorrelation", "stats"),
)
def q_ts_autocorr(spark, sf_dir):
    """Lag-1 autocorrelation of the daily event-count series per
    event_type — the quick seasonality/momentum screen (near 0 ⇒ counts
    are day-independent, positive ⇒ trending, negative ⇒ alternating)
    run before fitting any forecasting model. Daily hash-aggregate,
    one lag window, and Pearson corr per type; lag and corr share the
    event_type exchange. corr is the single-pass co-moment form in both
    engines, rounded to 4dp (the repo's established tolerance for
    moment statistics over hundreds of points)."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.col("ts").cast("timestamp").cast("date").alias("day")
        )
        .agg(F.count("*").alias("cnt"))
    )
    lagged = daily.withColumn(
        "prev_cnt", F.lag("cnt").over(W.partitionBy("event_type").orderBy("day"))
    ).filter(F.col("prev_cnt").isNotNull())
    return lagged.groupBy("event_type").agg(
        F.count("prev_cnt").alias("n_pairs"),
        F.round(F.corr("cnt", "prev_cnt"), 4).alias("autocorr_lag1"),
    )


@query(
    "q_events_lifecycle",
    oracle="""
    WITH am AS (
        SELECT DISTINCT user_id,
               CAST(date_part('year', CAST(ts AS TIMESTAMP)) * 12
                    + date_part('month', CAST(ts AS TIMESTAMP)) - 1 AS BIGINT)
                   AS month_idx
        FROM events
    ), flagged AS (
        SELECT user_id, month_idx,
               MIN(month_idx) OVER (PARTITION BY user_id) AS first_m,
               LAG(month_idx) OVER (PARTITION BY user_id ORDER BY month_idx)
                   AS prev_m,
               LEAD(month_idx) OVER (PARTITION BY user_id ORDER BY month_idx)
                   AS next_m
        FROM am
    ), maxm AS (SELECT MAX(month_idx) AS max_m FROM am),
    active AS (
        SELECT month_idx,
               COUNT(CASE WHEN month_idx = first_m THEN 1 END) AS n_new,
               COUNT(CASE WHEN prev_m = month_idx - 1 THEN 1 END) AS n_retained,
               COUNT(CASE WHEN prev_m IS NOT NULL AND prev_m < month_idx - 1
                          THEN 1 END) AS n_resurrected
        FROM flagged GROUP BY 1
    ), churn AS (
        SELECT f.month_idx + 1 AS month_idx, COUNT(*) AS n_churned
        FROM flagged f CROSS JOIN maxm
        WHERE (f.next_m IS NULL OR f.next_m > f.month_idx + 1)
          AND f.month_idx + 1 <= maxm.max_m
        GROUP BY 1
    )
    SELECT COALESCE(a.month_idx, c.month_idx) AS month_idx,
           COALESCE(n_new, 0) AS n_new,
           COALESCE(n_retained, 0) AS n_retained,
           COALESCE(n_resurrected, 0) AS n_resurrected,
           COALESCE(n_churned, 0) AS n_churned
    FROM active a FULL OUTER JOIN churn c ON a.month_idx = c.month_idx
    """,
    tags=("events", "lifecycle", "growth-accounting", "retention"),
)
def q_events_lifecycle(spark, sf_dir):
    """Monthly growth accounting (the new/retained/resurrected/churned
    user ledger every subscription dashboard opens with): one distinct
    (user, month) pass, per-user lag/lead windows classify each active
    month — first-ever ⇒ new, consecutive ⇒ retained, gap ⇒ resurrected
    — and a user churns INTO month m+1 when month m has no successor at
    m+1 (capped at the corpus's last month so the open-ended future
    doesn't count). Months are integer indexes (year·12+month) so the
    calendar arithmetic is engine-exact. One user_id exchange carries
    all three windows; the month-level aggregates are tiny."""
    am = (
        t(spark, sf_dir, "events")
        .select(
            "user_id",
            (
                F.year(F.col("ts").cast("timestamp")) * 12
                + F.month(F.col("ts").cast("timestamp"))
                - 1
            )
            .cast("long")
            .alias("month_idx"),
        )
        .distinct()
    )
    w_u = W.partitionBy("user_id")
    w_ord = w_u.orderBy("month_idx")
    flagged = (
        am.withColumn("first_m", F.min("month_idx").over(w_u))
        .withColumn("prev_m", F.lag("month_idx").over(w_ord))
        .withColumn("next_m", F.lead("month_idx").over(w_ord))
    )
    maxm = am.agg(F.max("month_idx").alias("max_m"))
    active = flagged.groupBy("month_idx").agg(
        F.count(F.when(F.col("month_idx") == F.col("first_m"), 1)).alias("n_new"),
        F.count(F.when(F.col("prev_m") == F.col("month_idx") - 1, 1)).alias(
            "n_retained"
        ),
        F.count(
            F.when(
                F.col("prev_m").isNotNull()
                & (F.col("prev_m") < F.col("month_idx") - 1),
                1,
            )
        ).alias("n_resurrected"),
    )
    churn = (
        flagged.crossJoin(F.broadcast(maxm))
        .filter(
            (F.col("next_m").isNull() | (F.col("next_m") > F.col("month_idx") + 1))
            & (F.col("month_idx") + 1 <= F.col("max_m"))
        )
        .groupBy((F.col("month_idx") + 1).alias("month_idx"))
        .agg(F.count("*").alias("n_churned"))
    )
    return (
        active.join(churn, "month_idx", "full")
        .select(
            "month_idx",
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
            F.coalesce("n_retained", F.lit(0)).alias("n_retained"),
            F.coalesce("n_resurrected", F.lit(0)).alias("n_resurrected"),
            F.coalesce("n_churned", F.lit(0)).alias("n_churned"),
        )
    )


@query(
    "q_ts_mann_kendall",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
               COUNT(*) AS cnt
        FROM events GROUP BY 1, 2
    ), pairs AS (
        SELECT a.event_type,
               CASE WHEN b.cnt > a.cnt THEN 1
                    WHEN b.cnt < a.cnt THEN -1 ELSE 0 END AS sgn
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.day < b.day
    ), s AS (
        SELECT event_type, CAST(SUM(sgn) AS BIGINT) AS s_stat,
               COUNT(*) AS n_pairs
        FROM pairs GROUP BY 1
    ), ties AS (
        SELECT event_type,
               CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
        FROM (SELECT event_type, cnt, COUNT(*) AS t FROM daily GROUP BY 1, 2)
        GROUP BY 1
    ), n AS (
        SELECT event_type, COUNT(*) AS n_days FROM daily GROUP BY 1
    )
    SELECT s.event_type, s.s_stat, n.n_days,
           CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5) - ties.tie_term
                AS BIGINT) AS var18
    FROM s JOIN ties USING (event_type) JOIN n USING (event_type)
    """,
    tags=("timeseries", "mann-kendall", "trend", "nonparametric"),
)
def q_ts_mann_kendall(spark, sf_dir):
    """Mann-Kendall non-parametric trend test on the daily count series
    per event_type: S = Σ sign(x_j − x_i) over ordered day pairs, with
    the tie-adjusted variance numerator 18·Var(S) = n(n−1)(2n+5) −
    Σt(t−1)(2t+5) — all integers, so the statistic is engine-exact with
    no distributional assumptions (the reason operations teams prefer it
    over OLS slope, q_agg_ols_trend, for monotone-trend alarms). The
    pair join runs on the DAILY table (n ≈ hundreds per type), so the
    O(n²) is a few 10⁴ comparisons regardless of fact size; the fact
    contributes exactly one hash aggregate."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.col("ts").cast("timestamp").cast("date").alias("day")
        )
        .agg(F.count("*").alias("cnt"))
    )
    a = daily.select("event_type", F.col("day").alias("da"), F.col("cnt").alias("ca"))
    b = daily.select("event_type", F.col("day").alias("db"), F.col("cnt").alias("cb"))
    sgn = F.when(F.col("cb") > F.col("ca"), 1).when(
        F.col("cb") < F.col("ca"), -1
    ).otherwise(0)
    s = (
        a.join(b, "event_type")
        .filter(F.col("da") < F.col("db"))
        .groupBy("event_type")
        .agg(F.sum(sgn).alias("s_stat"), F.count("*").alias("n_pairs"))
        .drop("n_pairs")
    )
    ties = (
        daily.groupBy("event_type", "cnt")
        .agg(F.count("*").alias("tcnt"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("tcnt") * (F.col("tcnt") - 1) * (2 * F.col("tcnt") + 5)
            ).alias("tie_term")
        )
    )
    n = daily.groupBy("event_type").agg(F.count("*").alias("n_days"))
    return (
        s.join(ties, "event_type")
        .join(n, "event_type")
        .select(
            "event_type",
            "s_stat",
            "n_days",
            (
                F.col("n_days") * (F.col("n_days") - 1) * (2 * F.col("n_days") + 5)
                - F.col("tie_term")
            ).alias("var18"),
        )
    )


@query(
    "q_agg_welch_ttest",
    oracle="""
    WITH g AS (
        SELECT CASE WHEN event_type = 'purchase' THEN 'treat' ELSE 'ctrl' END AS grp,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM events WHERE event_type IN ('purchase', 'click')
    ), stats AS (
        SELECT grp, COUNT(*) AS n,
               CAST(SUM(cents) AS BIGINT) AS s1,
               CAST(SUM(cents * cents) AS BIGINT) AS s2
        FROM g GROUP BY 1
    ), wide AS (
        SELECT MAX(CASE WHEN grp = 'treat' THEN n END) AS nt,
               MAX(CASE WHEN grp = 'treat' THEN s1 END) AS s1t,
               MAX(CASE WHEN grp = 'treat' THEN s2 END) AS s2t,
               MAX(CASE WHEN grp = 'ctrl' THEN n END) AS nc,
               MAX(CASE WHEN grp = 'ctrl' THEN s1 END) AS s1c,
               MAX(CASE WHEN grp = 'ctrl' THEN s2 END) AS s2c
        FROM stats
    )
    SELECT nt, nc,
           ROUND((CAST(s1t AS DOUBLE) / nt - CAST(s1c AS DOUBLE) / nc) / 100, 4)
               AS mean_diff,
           ROUND((CAST(s1t AS DOUBLE) / nt - CAST(s1c AS DOUBLE) / nc)
                 / SQRT((CAST(s2t AS DOUBLE) / nt - POW(CAST(s1t AS DOUBLE) / nt, 2))
                          / (nt - 1)
                        + (CAST(s2c AS DOUBLE) / nc - POW(CAST(s1c AS DOUBLE) / nc, 2))
                          / (nc - 1)), 4) AS welch_t
    FROM wide
    """,
    tags=("agg", "welch", "ttest", "experimentation"),
)
def q_agg_welch_ttest(spark, sf_dir):
    """Welch's unequal-variance t statistic between two event-type
    populations (the default two-sample test when group variances
    differ — completes the experimentation kit next to the two-
    proportion z, q_events_abtest, and CUPED, q_events_cuped). Built
    from EXACT integer sufficient statistics (n, Σcents, Σcents²; the
    squared sums stay ≤ ~1e14 at driver SFs), then a single closed-form
    float expression rounded at 4dp — the same discipline as
    q_agg_moments. One shuffle for the two-group aggregate; the final
    arithmetic happens on a 1-row frame."""
    g = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .select(
            F.when(F.col("event_type") == "purchase", "treat")
            .otherwise("ctrl")
            .alias("grp"),
            (dec("value") * 100).cast("long").alias("cents"),
        )
    )
    stats = g.groupBy("grp").agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("s1"),
        F.sum(F.col("cents") * F.col("cents")).alias("s2"),
    )
    wide = stats.agg(
        *[
            F.max(F.when(F.col("grp") == grp, F.col(c))).alias(f"{c}{suffix}")
            for grp, suffix in (("treat", "t"), ("ctrl", "c"))
            for c in ("n", "s1", "s2")
        ]
    )
    mt = F.col("s1t").cast("double") / F.col("nt")
    mc = F.col("s1c").cast("double") / F.col("nc")
    vt = (F.col("s2t").cast("double") / F.col("nt") - F.pow(mt, 2)) / (F.col("nt") - 1)
    vc = (F.col("s2c").cast("double") / F.col("nc") - F.pow(mc, 2)) / (F.col("nc") - 1)
    return wide.select(
        "nt",
        "nc",
        F.round((mt - mc) / 100, 4).alias("mean_diff"),
        F.round((mt - mc) / F.sqrt(vt + vc), 4).alias("welch_t"),
    )


@query(
    "q_ts_cusum",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
               CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS cents
        FROM events GROUP BY 1, 2
    ), tot AS (
        SELECT event_type, CAST(SUM(cents) AS BIGINT) AS total,
               COUNT(*) AS n_days
        FROM daily GROUP BY 1
    ), walk AS (
        SELECT d.event_type, d.day, t.n_days,
               t.n_days * SUM(d.cents) OVER (PARTITION BY d.event_type ORDER BY d.day
                                             ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND CURRENT ROW)
               - ROW_NUMBER() OVER (PARTITION BY d.event_type ORDER BY d.day)
                 * t.total AS dk
        FROM daily d JOIN tot t USING (event_type)
    ), cusum AS (
        SELECT event_type, day, n_days,
               dk - LEAST(0, MIN(dk) OVER (PARTITION BY event_type ORDER BY day
                                           ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW)) AS c
        FROM walk
    ), mx AS (
        SELECT event_type, day, n_days, c,
               MAX(c) OVER (PARTITION BY event_type) AS max_c
        FROM cusum
    )
    SELECT event_type,
           CAST(MAX(c) AS BIGINT) AS max_cusum_scaled,
           MAX(n_days) AS n_days,
           MIN(CASE WHEN c = max_c THEN day END) AS alarm_day,
           ROUND(CAST(MAX(c) AS DOUBLE) / (MAX(n_days) * 100), 2)
               AS max_cusum_value
    FROM mx
    GROUP BY 1
    """,
    tags=("timeseries", "cusum", "change-detection", "drift"),
)
def q_ts_cusum(spark, sf_dir):
    """One-sided CUSUM change-point detection on the daily value series
    per event_type — the classic 'has the level shifted up relative to
    its own average pace' alarm behind drift monitors. The textbook
    recurrence C_k = max(0, C_{k-1} + (x_k − target)) needs no stateful
    loop: with target = overall daily mean, scaling by n turns it into
    D_k = n·P_k − k·T (P = prefix sum, T = total — all integers) and
    C_k = D_k − min(0, min_{j≤k} D_j) (D_0 = 0 anchors the min), a prefix sum and a prefix min — pure
    windows, closed form, engine-exact (same trick family as
    q_win_capped_cumsum, which genuinely needs the stateful stream
    because its threshold RESETS the carry). Max exceedance and its
    earliest alarm day come from an exact integer argmax; the /n·100
    normalization back to value units is the only float, rounded 2dp.
    One event_type exchange carries every window."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.col("ts").cast("timestamp").cast("date").alias("day")
        )
        .agg(F.sum(dec("value") * 100).cast("long").alias("cents"))
    )
    tot = daily.groupBy("event_type").agg(
        F.sum("cents").alias("total"), F.count("*").alias("n_days")
    )
    w_cum = (
        W.partitionBy("event_type").orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    )
    walk = (
        daily.join(F.broadcast(tot), "event_type")
        .withColumn(
            "dk",
            F.col("n_days") * F.sum("cents").over(w_cum)
            - F.row_number().over(W.partitionBy("event_type").orderBy("day"))
            * F.col("total"),
        )
    )
    prefix_min = F.least(F.lit(0), F.min("dk").over(w_cum))  # D_0 = 0 is in scope
    cusum = walk.withColumn("c", F.col("dk") - prefix_min).withColumn(
        "max_c", F.max(F.col("dk") - prefix_min).over(W.partitionBy("event_type"))
    )
    return cusum.groupBy("event_type").agg(
        F.max("c").alias("max_cusum_scaled"),
        F.max("n_days").alias("n_days"),
        F.min(F.when(F.col("c") == F.col("max_c"), F.col("day"))).alias("alarm_day"),
        F.round(
            F.max("c").cast("double") / (F.max("n_days") * 100), 2
        ).alias("max_cusum_value"),
    )


@query(
    "q_events_interarrival",
    oracle="""
    WITH gaps AS (
        SELECT event_type,
               epoch_us(CAST(ts AS TIMESTAMP))
               - LAG(epoch_us(CAST(ts AS TIMESTAMP)))
                 OVER (PARTITION BY event_type ORDER BY ts, event_id) AS gap_us
        FROM events
    )
    SELECT event_type,
           COUNT(gap_us) AS n_gaps,
           ROUND(quantile_cont(gap_us, 0.5), 6) AS p50_us,
           ROUND(quantile_cont(gap_us, 0.9), 6) AS p90_us,
           ROUND(quantile_cont(gap_us, 0.99), 6) AS p99_us,
           MAX(gap_us) AS max_us
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY 1
    """,
    tags=("events", "interarrival", "percentile", "timeseries"),
)
def q_events_interarrival(spark, sf_dir):
    """Inter-arrival time distribution per event_type (p50/p90/p99/max
    gap in µs) — the burstiness profile behind capacity planning and
    Poisson-ness checks, and the empirical basis for choosing session
    gaps (q_win_gaps_islands' 30-min rule). One lag window over the
    unique (ts, event_id) order and exact interpolated percentiles
    (Spark `percentile` ≡ DuckDB `quantile_cont` on integer µs gaps)
    share one event_type exchange."""
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        "ts",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = ev.withColumn("gap_us", F.col("us") - F.lag("us").over(w)).filter(
        F.col("gap_us").isNotNull()
    )
    return gaps.groupBy("event_type").agg(
        F.count("gap_us").alias("n_gaps"),
        F.round(F.expr("percentile(gap_us, 0.5)"), 6).alias("p50_us"),
        F.round(F.expr("percentile(gap_us, 0.9)"), 6).alias("p90_us"),
        F.round(F.expr("percentile(gap_us, 0.99)"), 6).alias("p99_us"),
        F.max("gap_us").alias("max_us"),
    )


@query(
    "q_ts_runs_test",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
               COUNT(*) AS cnt
        FROM events GROUP BY 1, 2
    ), med AS (
        SELECT event_type, quantile_cont(cnt, 0.5) AS m FROM daily GROUP BY 1
    ), signed AS (
        SELECT d.event_type, d.day,
               CASE WHEN d.cnt > med.m THEN 1 ELSE -1 END AS sgn
        FROM daily d JOIN med USING (event_type)
        WHERE d.cnt <> med.m
    ), flagged AS (
        SELECT event_type, sgn,
               CASE WHEN LAG(sgn) OVER (PARTITION BY event_type ORDER BY day)
                         IS DISTINCT FROM sgn THEN 1 ELSE 0 END AS is_new_run
        FROM signed
    )
    SELECT event_type,
           CAST(SUM(is_new_run) AS BIGINT) AS n_runs,
           COUNT(CASE WHEN sgn = 1 THEN 1 END) AS n_above,
           COUNT(CASE WHEN sgn = -1 THEN 1 END) AS n_below
    FROM flagged
    GROUP BY 1
    """,
    tags=("timeseries", "runs-test", "nonparametric", "randomness"),
)
def q_ts_runs_test(spark, sf_dir):
    """Wald–Wolfowitz runs test inputs on the daily count series per
    event_type: days sign against the exact median (ties dropped, the
    textbook rule), runs = islands of constant sign counted by a lag
    flag, plus the above/below counts the normal approximation needs —
    the randomness screen that complements Mann-Kendall (trend) and
    CUSUM (level shift): too FEW runs ⇒ clustering, too many ⇒
    oscillation. All integers once the median comparison is made; the
    median itself is the exact interpolated percentile both engines
    share. Daily collapse first, windows on the collapsed frame."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.col("ts").cast("timestamp").cast("date").alias("day")
        )
        .agg(F.count("*").alias("cnt"))
    )
    med = daily.groupBy("event_type").agg(
        F.expr("percentile(cnt, 0.5)").alias("m")
    )
    signed = (
        daily.join(F.broadcast(med), "event_type")
        .filter(F.col("cnt") != F.col("m"))
        .select(
            "event_type",
            "day",
            F.when(F.col("cnt") > F.col("m"), 1).otherwise(-1).alias("sgn"),
        )
    )
    w = W.partitionBy("event_type").orderBy("day")
    flagged = signed.withColumn(
        "is_new_run",
        F.when(
            ~F.lag("sgn").over(w).eqNullSafe(F.col("sgn")), 1
        ).otherwise(0),
    )
    return flagged.groupBy("event_type").agg(
        F.sum("is_new_run").alias("n_runs"),
        F.count(F.when(F.col("sgn") == 1, 1)).alias("n_above"),
        F.count(F.when(F.col("sgn") == -1, 1)).alias("n_below"),
    )


@query(
    "q_ts_peaks",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
               COUNT(*) AS cnt
        FROM events GROUP BY 1, 2
    ), smooth AS (
        SELECT event_type, day, cnt,
               CAST(SUM(cnt) OVER w AS BIGINT) AS win_sum,
               CAST(COUNT(*) OVER w AS BIGINT) AS win_n
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ), neighbors AS (
        SELECT event_type, day, cnt, win_sum, win_n,
               LAG(win_sum * 1000 // win_n) OVER wo AS prev_s,
               win_sum * 1000 // win_n AS s,
               LEAD(win_sum * 1000 // win_n) OVER wo AS next_s
        FROM smooth
        WINDOW wo AS (PARTITION BY event_type ORDER BY day)
    )
    SELECT event_type, day, cnt,
           CAST(s AS BIGINT) AS smoothed_x1000
    FROM neighbors
    WHERE prev_s IS NOT NULL AND next_s IS NOT NULL
      AND s > prev_s AND s >= next_s
    """,
    tags=("timeseries", "peaks", "local-maxima", "signal"),
)
def q_ts_peaks(spark, sf_dir):
    """Local-maximum (peak) detection on the ±3-day-smoothed daily count
    series per event_type — the campaign-spike / load-peak finder:
    smooth with a centered 7-day mean, then a day is a peak when its
    smoothed value strictly exceeds the previous and is ≥ the next
    (the left-strict/right-slack rule picks exactly one day per
    plateau, deterministically). The smoothed mean is kept as the
    exact floored integer (win_sum·1000) div win_n — identical in both
    engines — so the peak comparisons happen on scaled integers with no
    float-tie ambiguity. Daily collapse first;
    all three windows ride one event_type exchange."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.col("ts").cast("timestamp").cast("date").alias("day")
        )
        .agg(F.count("*").alias("cnt"))
    )
    w = W.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    smooth = daily.withColumn("win_sum", F.sum("cnt").over(w)).withColumn(
        "win_n", F.count("*").over(w)
    )
    wo = W.partitionBy("event_type").orderBy("day")
    s = F.expr("win_sum * 1000 div win_n")
    nb = smooth.withColumn("s", s).withColumn(
        "prev_s", F.lag(s).over(wo)
    ).withColumn("next_s", F.lead(s).over(wo))
    return (
        nb.filter(
            F.col("prev_s").isNotNull()
            & F.col("next_s").isNotNull()
            & (F.col("s") > F.col("prev_s"))
            & (F.col("s") >= F.col("next_s"))
        )
        .select("event_type", "day", "cnt", F.col("s").alias("smoothed_x1000"))
    )


@query(
    "q_ts_rsi",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
               CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS cents
        FROM events GROUP BY 1, 2
    ), deltas AS (
        SELECT event_type, day,
               cents - LAG(cents) OVER (PARTITION BY event_type ORDER BY day)
                   AS chg
        FROM daily
    ), gains AS (
        SELECT event_type, day,
               CAST(SUM(CASE WHEN chg > 0 THEN chg ELSE 0 END)
                    OVER w AS BIGINT) AS gain14,
               CAST(SUM(CASE WHEN chg < 0 THEN -chg ELSE 0 END)
                    OVER w AS BIGINT) AS loss14,
               CAST(COUNT(chg) OVER w AS BIGINT) AS n14
        FROM deltas
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, day, gain14, loss14,
           ROUND(CASE WHEN gain14 + loss14 = 0 THEN 50.0
                      ELSE 100.0 * gain14 / (gain14 + loss14) END, 4) AS rsi14
    FROM gains WHERE n14 = 14
    """,
    tags=("timeseries", "rsi", "momentum", "indicator"),
)
def q_ts_rsi(spark, sf_dir):
    """14-day RSI (relative strength index, simple-average Cutler form)
    of the daily value series per event_type — the momentum indicator
    completing the time-series kit (EWMA smoothing, drawdown, CUSUM):
    RSI = 100·gains/(gains+losses) over the trailing 14 deltas, 50 on a
    flat window by convention. Daily collapse → lag delta → two
    conditional rolling sums, all integer cents on one event_type
    exchange; the single division is an integer-ratio IEEE op rounded
    4dp. Emitted only where the window holds 14 full deltas, so every
    row's statistic is over the same support in both engines."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.col("ts").cast("timestamp").cast("date").alias("day")
        )
        .agg(F.sum(dec("value") * 100).cast("long").alias("cents"))
    )
    wo = W.partitionBy("event_type").orderBy("day")
    deltas = daily.withColumn("chg", F.col("cents") - F.lag("cents").over(wo))
    w14 = wo.rowsBetween(-13, 0)
    gains = (
        deltas.withColumn(
            "gain14",
            F.sum(F.when(F.col("chg") > 0, F.col("chg")).otherwise(0)).over(w14),
        )
        .withColumn(
            "loss14",
            F.sum(F.when(F.col("chg") < 0, -F.col("chg")).otherwise(0)).over(w14),
        )
        .withColumn("n14", F.count("chg").over(w14))
    )
    return gains.filter(F.col("n14") == 14).select(
        "event_type",
        "day",
        "gain14",
        "loss14",
        F.round(
            F.when(F.col("gain14") + F.col("loss14") == 0, F.lit(50.0)).otherwise(
                100.0 * F.col("gain14") / (F.col("gain14") + F.col("loss14"))
            ),
            4,
        ).alias("rsi14"),
    )


@query(
    "q_agg_concentration",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * 100) AS BIGINT)
                   AS cents
        FROM lineitem GROUP BY 1
    ), tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS total,
                      COUNT(*) AS n_supps FROM rev),
    ranked AS (
        SELECT cents, ROW_NUMBER() OVER (ORDER BY cents DESC, l_suppkey) AS rk
        FROM rev
    )
    SELECT MAX(n_supps) AS n_suppliers,
           ROUND(SUM(POW(CAST(cents AS DOUBLE) / total, 2)) * 10000, 4) AS hhi,
           ROUND(100.0 * SUM(CASE WHEN rk <= 4 THEN cents ELSE 0 END) / MAX(total),
                 4) AS cr4,
           ROUND(100.0 * SUM(CASE WHEN rk <= 8 THEN cents ELSE 0 END) / MAX(total),
                 4) AS cr8
    FROM ranked CROSS JOIN tot
    """,
    tags=("agg", "hhi", "concentration", "merchandising"),
)
def q_agg_concentration(spark, sf_dir):
    """Market-concentration readout over supplier revenue: HHI (sum of
    squared shares × 10,000 — the antitrust scale) plus CR4/CR8
    concentration ratios — the competition metrics that pair with the
    inequality view (q_agg_gini) and the merchandising view
    (q_agg_pareto) over the same collapsed revenue frame. One supplier
    aggregate; HHI is a plain (orderless) aggregate of exact integer
    cents, and the CR4/CR8 numerators come from a TakeOrdered top-8
    (per-partition top-k, merged driver-side — k=8 rows, never a rank
    window over the growing supplier catalog; VERDICT r2 "What's wrong"
    #1), deterministic tiebreak on supplier id, single-rounding 4dp."""
    li = t(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(dec("l_extendedprice") * 100).cast("long").alias("cents")
    )
    tot = rev.agg(
        F.sum("cents").alias("total"), F.count("*").alias("n_supps")
    )
    # top-8 suppliers: TakeOrderedAndProject (no global sort/rank); the
    # row_number window below it only ever sees those 8 rows.
    top8 = (
        rev.orderBy(F.desc("cents"), "l_suppkey")
        .limit(8)
        .withColumn(
            "rk", F.row_number().over(W.orderBy(F.desc("cents"), "l_suppkey"))
        )
        .agg(
            F.sum(F.when(F.col("rk") <= 4, F.col("cents")).otherwise(0)).alias(
                "c4"
            ),
            F.sum("cents").alias("c8"),
        )
    )
    hhi = (
        rev.crossJoin(F.broadcast(tot))
        .agg(
            F.max("n_supps").alias("n_suppliers"),
            F.round(
                F.sum(F.pow(F.col("cents").cast("double") / F.col("total"), 2))
                * 10000,
                4,
            ).alias("hhi"),
            F.max("total").alias("_total"),
        )
    )
    return hhi.crossJoin(F.broadcast(top8)).select(
        "n_suppliers",
        "hhi",
        F.round(100.0 * F.col("c4") / F.col("_total"), 4).alias("cr4"),
        F.round(100.0 * F.col("c8") / F.col("_total"), 4).alias("cr8"),
    )


@query(
    "q_graph_link_prediction",
    oracle=f"""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), edges AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey
                                 AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING COUNT(*) >= {TRIANGLE_MIN_SUPPORT}
    ), sym AS (
        SELECT src AS u, dst AS v FROM edges
        UNION ALL SELECT dst, src FROM edges
    ), deg AS (
        SELECT u, COUNT(*) AS d FROM sym GROUP BY 1
    ), cand AS (
        SELECT e1.u AS a, e2.v AS c, COUNT(DISTINCT e1.v) AS cn
        FROM sym e1 JOIN sym e2 ON e1.v = e2.u AND e1.u < e2.v
        WHERE NOT EXISTS (SELECT 1 FROM edges e
                          WHERE e.src = e1.u AND e.dst = e2.v)
        GROUP BY 1, 2
    )
    SELECT a, c, cn,
           ROUND(cn * 1.0 / (da.d + dc.d - cn), 6) AS jaccard
    FROM cand JOIN deg da ON da.u = a JOIN deg dc ON dc.u = c
    ORDER BY cn DESC, jaccard DESC, a, c
    LIMIT 20
    """,
    tags=("graph", "link-prediction", "common-neighbors", "recommendation"),
)
def q_graph_link_prediction(spark, sf_dir):
    """Link prediction on the co-purchase graph by common-neighbor and
    neighborhood-Jaccard scores: for every NON-edge (a,c) reachable
    through a wedge, count the distinct shared neighbors and normalize
    by the neighborhood union — the classic unsupervised
    'you-may-also-like' candidate generator evaluated before any
    learned model. The wedge self-join is Σdeg² bounded (same profile
    as triangle counting); existing edges drop via an anti join;
    deterministic top-20 with full tiebreaks. Degrees come from the
    symmetrized edge list (one aggregate the size of the node set)."""
    li = t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src"))
    b = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst"))
    edges = (
        a.join(b, "ok")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= TRIANGLE_MIN_SUPPORT)
        .select("src", "dst")
    )
    sym = edges.select(F.col("src").alias("u"), F.col("dst").alias("v")).unionAll(
        edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    )
    deg = sym.groupBy("u").agg(F.count("*").alias("d"))
    e1 = sym.select(F.col("u").alias("a"), F.col("v").alias("mid"))
    e2 = sym.select(F.col("u").alias("mid"), F.col("v").alias("c"))
    cand = (
        e1.join(e2, "mid")
        .filter(F.col("a") < F.col("c"))
        .join(
            edges,
            (edges.src == F.col("a")) & (edges.dst == F.col("c")),
            "left_anti",
        )
        .groupBy("a", "c")
        .agg(F.count_distinct("mid").alias("cn"))
    )
    da = deg.select(F.col("u").alias("a"), F.col("d").alias("da"))
    dc = deg.select(F.col("u").alias("c"), F.col("d").alias("dc"))
    return (
        cand.join(F.broadcast(da), "a")
        .join(F.broadcast(dc), "c")
        .select(
            "a",
            "c",
            "cn",
            F.round(F.col("cn") / (F.col("da") + F.col("dc") - F.col("cn")), 6).alias(
                "jaccard"
            ),
        )
        .orderBy(F.desc("cn"), F.desc("jaccard"), "a", "c")
        .limit(20)
    )


@query(
    "q_graph_degrees",
    oracle=f"""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), edges AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey
                                 AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING COUNT(*) >= {TRIANGLE_MIN_SUPPORT}
    ), sym AS (
        SELECT src AS u FROM edges UNION ALL SELECT dst FROM edges
    ), deg AS (
        SELECT u, COUNT(*) AS d FROM sym GROUP BY 1
    )
    SELECT d AS degree, COUNT(*) AS n_nodes,
           CAST(SUM(COUNT(*)) OVER (ORDER BY d DESC
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS BIGINT) AS n_nodes_at_least
    FROM deg GROUP BY d
    """,
    tags=("graph", "degree-distribution", "profile"),
)
def q_graph_degrees(spark, sf_dir):
    """Degree distribution of the co-purchase graph with the
    complementary-cumulative count (nodes with degree ≥ d) — the
    first thing you plot to see whether a graph is heavy-tailed before
    choosing partitioning (power-law hubs ⇒ the skew-join/salting
    path; see q_join_salted_skew). Node degrees are one aggregate over
    the symmetrized edge endpoints; the CCDF window runs over the tiny
    (distinct-degree)-sized frame."""
    li = t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src"))
    b = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst"))
    edges = (
        a.join(b, "ok")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= TRIANGLE_MIN_SUPPORT)
    )
    sym = edges.select(F.col("src").alias("u")).unionAll(
        edges.select(F.col("dst").alias("u"))
    )
    deg = sym.groupBy("u").agg(F.count("*").alias("d"))
    dist = deg.groupBy(F.col("d").alias("degree")).agg(F.count("*").alias("n_nodes"))
    w = W.orderBy(F.desc("degree")).rowsBetween(W.unboundedPreceding, 0)
    return dist.withColumn("n_nodes_at_least", F.sum("n_nodes").over(w))


@query(
    "q_events_shapley",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CAST(MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    + MAX(CASE WHEN event_type = 'click' THEN 2 ELSE 0 END)
                    + MAX(CASE WHEN event_type = 'signup' THEN 4 ELSE 0 END)
                    AS BIGINT) AS umask,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        FROM events GROUP BY 1
    ), mcounts AS (
        SELECT umask, CAST(SUM(conv) AS BIGINT) AS n_conv FROM per_user GROUP BY 1
    ), masks AS (
        SELECT CAST(s AS BIGINT) AS s FROM UNNEST(range(0, 8)) AS u(s)
    ), v AS (
        SELECT m.s, CAST(COALESCE(SUM(c.n_conv), 0) AS BIGINT) AS val
        FROM masks m LEFT JOIN mcounts c ON (c.umask | m.s) = m.s
        GROUP BY 1
    ), channels AS (
        SELECT 'view' AS channel, CAST(1 AS BIGINT) AS bit
        UNION ALL SELECT 'click', 2 UNION ALL SELECT 'signup', 4
    ), terms AS (
        SELECT ch.channel,
               CASE bit_count(s.s) WHEN 0 THEN 2 WHEN 1 THEN 1 ELSE 2 END
                 * (vi.val - vs.val) AS term
        FROM channels ch
        JOIN v vs ON (vs.s & ch.bit) = 0
        JOIN v vi ON vi.s = (vs.s | ch.bit)
        JOIN v s ON s.s = vs.s
    )
    SELECT channel, CAST(SUM(term) AS BIGINT) AS shapley_x6
    FROM terms GROUP BY 1
    """,
    tags=("events", "shapley", "attribution", "game-theory"),
)
def q_events_shapley(spark, sf_dir):
    """Data-driven (Shapley-value) channel attribution over the
    view/click/signup contact channels with purchase as conversion —
    the game-theoretic upgrade over last-touch (q_events_attribution):
    the coalition value v(S) = converters whose touched-channel set ⊆ S,
    and each channel's credit is the classic weighted marginal-
    contribution sum. EVERYTHING stays integer: with 3 channels the
    subset weights |S|!(2−|S|)! are {2,1,2}, so 6·φ is an exact integer
    — no factorial floats, hash-exact attribution. Scale shape: ONE
    user_id aggregate collapses any event volume to ≤8 (mask, count)
    rows; the coalition lattice, marginal joins, and Shapley sum all
    run on 8-row frames. Efficiency (Σφ = v(C) − v(∅)) is asserted in
    tests."""
    ev = t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        (
            F.max(F.when(F.col("event_type") == "view", 1).otherwise(0))
            + F.max(F.when(F.col("event_type") == "click", 2).otherwise(0))
            + F.max(F.when(F.col("event_type") == "signup", 4).otherwise(0))
        )
        .cast("long")
        .alias("umask"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "conv"
        ),
    )
    mcounts = per_user.groupBy("umask").agg(F.sum("conv").alias("n_conv"))
    masks = spark.range(8).select(F.col("id").alias("s"))
    v = (
        masks.join(
            F.broadcast(mcounts),
            (mcounts.umask.bitwiseOR(masks.s)) == masks.s,
            "left",
        )
        .groupBy("s")
        .agg(F.coalesce(F.sum("n_conv"), F.lit(0)).alias("val"))
    )
    channels = spark.createDataFrame(
        [("view", 1), ("click", 2), ("signup", 4)], "channel string, bit long"
    )
    vs = v.select(F.col("s").alias("s0"), F.col("val").alias("v0"))
    vi = v.select(F.col("s").alias("s1"), F.col("val").alias("v1"))
    weight = (
        F.when(F.bit_count("s0") == 0, 2)
        .when(F.bit_count("s0") == 1, 1)
        .otherwise(2)
    )
    terms = (
        channels.join(vs, vs.s0.bitwiseAND(channels.bit) == 0)
        .join(vi, F.col("s1") == vs.s0.bitwiseOR(channels.bit))
        .select("channel", (weight * (F.col("v1") - F.col("v0"))).alias("term"))
    )
    return terms.groupBy("channel").agg(F.sum("term").alias("shapley_x6"))


@query(
    "q_ts_decompose",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
               COUNT(*) AS cnt,
               CAST(date_diff('day', DATE '1970-01-01',
                              CAST(CAST(ts AS TIMESTAMP) AS DATE)) % 7 AS BIGINT)
                   AS dow
        FROM events GROUP BY 1, 2
    ), trended AS (
        SELECT event_type, day, cnt, dow,
               CAST(SUM(cnt) OVER w AS BIGINT) AS t7,
               CAST(COUNT(*) OVER w AS BIGINT) AS n7
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ), detrended AS (
        SELECT *, n7 * cnt - t7 AS d_scaled
        FROM trended WHERE n7 = 7
    ), seasonal AS (
        SELECT event_type, dow,
               CAST(SUM(d_scaled) AS DOUBLE) / COUNT(*) / 7 AS s
        FROM detrended GROUP BY 1, 2
    )
    SELECT d.event_type, d.day, d.cnt,
           ROUND(CAST(t7 AS DOUBLE) / 7, 4) AS trend,
           ROUND(s, 4) AS seasonal,
           ROUND(CAST(d_scaled AS DOUBLE) / 7 - s, 4) AS remainder
    FROM detrended d JOIN seasonal USING (event_type, dow)
    """,
    tags=("timeseries", "decomposition", "stl", "seasonality"),
)
def q_ts_decompose(spark, sf_dir):
    """Additive seasonal decomposition (STL-lite) of the daily count
    series per event_type: trend = centered 7-day mean, seasonal =
    per-day-of-week mean of the detrended series, remainder = what's
    left — the decomposition an anomaly pipeline subtracts before
    thresholding (q_events_anomaly's z-score gets its baseline here).
    Determinism: the trend stays the exact integer 7-day sum as long as
    possible (detrended values are the integers 7·x − Σ7), seasonal
    means are exact-integer sums with ONE division, and each output
    component is a single rounded float expression. Interior days only
    (full 7-day window), the textbook STL edge rule. One event_type
    exchange for the window; the dow aggregate is 7 rows per type."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.col("ts").cast("timestamp").cast("date").alias("day")
        )
        .agg(F.count("*").alias("cnt"))
        .withColumn(
            "dow",
            (
                F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")) % 7
            ).cast("long"),
        )
    )
    w = W.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    trended = daily.withColumn("t7", F.sum("cnt").over(w)).withColumn(
        "n7", F.count("*").over(w)
    )
    detrended = trended.filter(F.col("n7") == 7).withColumn(
        "d_scaled", F.col("n7") * F.col("cnt") - F.col("t7")
    )
    seasonal = detrended.groupBy("event_type", "dow").agg(
        (F.sum("d_scaled").cast("double") / F.count("*") / 7).alias("s")
    )
    return detrended.join(seasonal, ["event_type", "dow"]).select(
        "event_type",
        "day",
        "cnt",
        F.round(F.col("t7").cast("double") / 7, 4).alias("trend"),
        F.round("s", 4).alias("seasonal"),
        F.round(F.col("d_scaled").cast("double") / 7 - F.col("s"), 4).alias(
            "remainder"
        ),
    )


@query(
    "q_events_survival",
    oracle="""
    WITH oe AS (
        SELECT MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS obs_end FROM events
    ), firsts AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view'
                        THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t0,
               MAX(oe.obs_end) AS obs_end
        FROM events CROSS JOIN oe GROUP BY user_id
    ), conv AS (
        SELECT e.user_id, MIN(epoch_us(CAST(e.ts AS TIMESTAMP))) AS t1
        FROM events e JOIN firsts f USING (user_id)
        WHERE e.event_type = 'purchase'
          AND epoch_us(CAST(e.ts AS TIMESTAMP)) >= f.t0
        GROUP BY 1
    ), spells AS (
        SELECT f.user_id,
               CASE WHEN c.t1 IS NOT NULL
                    THEN (c.t1 - f.t0) // 86400000000
                    ELSE (f.obs_end - f.t0) // 86400000000 END AS days,
               CASE WHEN c.t1 IS NOT NULL THEN 1 ELSE 0 END AS event
        FROM firsts f LEFT JOIN conv c USING (user_id)
        WHERE f.t0 IS NOT NULL
    ), byday AS (
        SELECT days, CAST(COUNT(*) AS BIGINT) AS ends,
               CAST(SUM(event) AS BIGINT) AS d
        FROM spells GROUP BY 1
    ), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM spells),
    risk AS (
        SELECT days, d, ends,
               n - CAST(COALESCE(SUM(ends) OVER (ORDER BY days
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
        FROM byday CROSS JOIN tot
    )
    SELECT days AS day, n_risk, d,
           ROUND(EXP(SUM(LN(1.0 - CAST(d AS DOUBLE) / n_risk))
                     OVER (ORDER BY days
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
               AS km_survival
    FROM risk WHERE d > 0 AND d < n_risk
    """,
    tags=("events", "survival", "kaplan-meier", "time-to-convert"),
)
def q_events_survival(spark, sf_dir):
    """Kaplan-Meier survival curve for time-to-convert (first view →
    first purchase, day granularity, right-censored at the corpus's
    last timestamp): S(t) = Π(1 − dᵢ/nᵢ) over conversion days — THE
    estimator for 'what fraction of users still haven't converted by
    day t' under censoring, where a naive conversion-rate-by-day
    silently drops censored users. Risk sets come from one ordered
    prefix sum over the per-day endpoint table (≤ days rows); the KM
    product runs as exp(ordered running sum of logs) — ordered window
    accumulation is sequential in both engines, so the float sum order
    is pinned, unlike a groupBy sum. Rows are emitted at conversion
    days with d < n (the curve's support); integer day spells from µs
    arithmetic."""
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    obs_end = ev.agg(F.max("us").alias("obs_end"))
    firsts = (
        ev.groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "view", F.col("us"))).alias("t0")
        )
        .filter(F.col("t0").isNotNull())
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .filter(F.col("us") >= F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t1"))
    )
    spells = (
        firsts.join(conv, "user_id", "left")
        .crossJoin(F.broadcast(obs_end))
        .select(
            F.when(
                F.col("t1").isNotNull(),
                F.expr("(t1 - t0) div 86400000000"),
            )
            .otherwise(F.expr("(obs_end - t0) div 86400000000"))
            .alias("days"),
            F.when(F.col("t1").isNotNull(), 1).otherwise(0).alias("event"),
        )
    )
    byday = spells.groupBy("days").agg(
        F.count("*").alias("ends"), F.sum("event").alias("d")
    )
    tot = spells.agg(F.count("*").alias("n"))
    w_prev = W.orderBy("days").rowsBetween(W.unboundedPreceding, -1)
    risk = byday.crossJoin(F.broadcast(tot)).withColumn(
        "n_risk",
        F.col("n") - F.coalesce(F.sum("ends").over(w_prev), F.lit(0)),
    )
    w_cum = W.orderBy("days").rowsBetween(W.unboundedPreceding, 0)
    return (
        risk.filter((F.col("d") > 0) & (F.col("d") < F.col("n_risk")))
        .withColumn(
            "km_survival",
            F.round(
                F.exp(
                    F.sum(
                        F.log(1.0 - F.col("d").cast("double") / F.col("n_risk"))
                    ).over(w_cum)
                ),
                6,
            ),
        )
        .select(F.col("days").alias("day"), "n_risk", "d", "km_survival")
    )


@query(
    "q_agg_abc_xyz",
    oracle="""
    WITH weekly AS (
        SELECT l_partkey,
               CAST(date_diff('day', DATE '1970-01-01',
                              CAST(l_shipdate AS DATE)) // 7 AS BIGINT) AS wk,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,0))) AS BIGINT) AS q
        FROM lineitem GROUP BY 1, 2
    ), stats AS (
        SELECT l_partkey, COUNT(*) AS n,
               CAST(SUM(q) AS BIGINT) AS s1,
               CAST(SUM(q * q) AS BIGINT) AS s2
        FROM weekly GROUP BY 1
    ), rev AS (
        SELECT l_partkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * 100) AS BIGINT)
                   AS cents
        FROM lineitem GROUP BY 1
    ), ranked AS (
        SELECT r.l_partkey, r.cents,
               SUM(r.cents) OVER (ORDER BY r.cents DESC, r.l_partkey
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS cum,
               SUM(r.cents) OVER () AS tot
        FROM rev r
    ), classed AS (
        SELECT s.l_partkey,
               CASE WHEN rk.cum * 100 <= rk.tot * 80 THEN 'A'
                    WHEN rk.cum * 100 <= rk.tot * 95 THEN 'B'
                    ELSE 'C' END AS abc,
               CASE WHEN 4 * (s.n * s.s2 - s.s1 * s.s1) < s.s1 * s.s1 THEN 'X'
                    WHEN (s.n * s.s2 - s.s1 * s.s1) < s.s1 * s.s1 THEN 'Y'
                    ELSE 'Z' END AS xyz,
               rk.cents
        FROM stats s JOIN ranked rk USING (l_partkey)
    )
    SELECT abc, xyz, COUNT(*) AS n_parts,
           CAST(SUM(cents) AS BIGINT) AS revenue_cents
    FROM classed GROUP BY 1, 2
    """,
    tags=("agg", "abc-xyz", "inventory", "merchandising"),
)
def q_agg_abc_xyz(spark, sf_dir):
    """ABC-XYZ inventory classification matrix — revenue importance
    (A/B/C from the cumulative-share Pareto rank, same discipline as
    q_agg_pareto) crossed with demand variability (X/Y/Z from the
    coefficient of variation of weekly demand). The CV thresholds
    (0.5, 1.0) are decided WITHOUT floats: cv² ≷ t² becomes the integer
    cross-multiplication 4(nΣq²−(Σq)²) ≷ (Σq)², so class boundaries
    can't flip on last-ulp division differences. ONE part-keyed
    aggregate chain — revenue cents ride the weekly rollup (Σ of weekly
    Σ of exact integers = the direct Σ), so lineitem is scanned and
    shuffled ONCE and the stats⋈ranked join disappears (VERDICT r3
    "What's wrong" #2: the separate rev aggregate made the fact side do
    double duty) — then a two-phase binned cumulative sum over the part
    catalog (operators/globalrank.py with materialize=True: the lazy
    persist stops the decomposition's three plan branches from
    re-running the fact aggregate — AQE's exchange reuse is only
    partial after column pruning, measured 3 lineitem scans without it;
    the only unpartitioned window touches ≤1024 bins, never the growing
    catalog), and a 9-cell output — the planning matrix every
    supply-chain team draws."""
    li = t(spark, sf_dir, "lineitem")
    weekly = li.groupBy(
        "l_partkey",
        F.expr(
            "datediff(cast(l_shipdate as date), date '1970-01-01') div 7"
        ).alias("wk"),
    ).agg(
        F.sum(dec("l_quantity", 18, 0)).cast("long").alias("q"),
        F.sum(dec("l_extendedprice") * 100).cast("long").alias("wk_cents"),
    )
    stats = weekly.groupBy("l_partkey").agg(
        F.count("*").alias("n"),
        F.sum("q").alias("s1"),
        F.sum(F.col("q") * F.col("q")).alias("s2"),
        F.sum("wk_cents").alias("cents"),
    )
    # Exact integer cumulative revenue via the two-phase binned
    # decomposition (operators/globalrank.py) — no unpartitioned window
    # over the part catalog (VERDICT r2 "What's wrong" #1); bit-equal to
    # the global window it replaces because cents are integral.
    from ..operators.globalrank import with_global_running

    ranked = with_global_running(
        stats,
        "cents",
        ["l_partkey"],
        descending=True,
        cumsum_col="cum",
        total_sum_col="tot",
        materialize=True,
    )
    var_n = F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")
    classed = ranked.select(
        F.when(F.col("cum") * 100 <= F.col("tot") * 80, "A")
        .when(F.col("cum") * 100 <= F.col("tot") * 95, "B")
        .otherwise("C")
        .alias("abc"),
        F.when(4 * var_n < F.col("s1") * F.col("s1"), "X")
        .when(var_n < F.col("s1") * F.col("s1"), "Y")
        .otherwise("Z")
        .alias("xyz"),
        "cents",
    )
    return classed.groupBy("abc", "xyz").agg(
        F.count("*").alias("n_parts"),
        F.sum("cents").alias("revenue_cents"),
    )


@query(
    "q_events_stickiness",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
               CAST(date_part('year', CAST(ts AS TIMESTAMP)) * 12
                    + date_part('month', CAST(ts AS TIMESTAMP)) - 1 AS BIGINT)
                   AS month_idx
        FROM events
    ), dau AS (
        SELECT month_idx, day, COUNT(*) AS dau FROM days GROUP BY 1, 2
    ), mau AS (
        SELECT month_idx, COUNT(DISTINCT user_id) AS mau FROM days GROUP BY 1
    )
    SELECT d.month_idx,
           COUNT(*) AS n_days,
           CAST(SUM(d.dau) AS BIGINT) AS dau_days,
           MAX(m.mau) AS mau,
           ROUND(CAST(SUM(d.dau) AS DOUBLE) / COUNT(*) / MAX(m.mau), 6)
               AS stickiness
    FROM dau d JOIN mau m USING (month_idx)
    GROUP BY 1
    """,
    tags=("events", "stickiness", "dau-mau", "engagement"),
)
def q_events_stickiness(spark, sf_dir):
    """DAU/MAU stickiness per month — the engagement-frequency ratio
    (avg daily actives over monthly actives; 1.0 ⇒ every monthly user
    shows up every day) product teams track alongside the lifecycle
    ledger (q_events_lifecycle). One distinct (user, day) collapse
    feeds both the per-day counts and the per-month distincts; the
    ratio is integer-ratio arithmetic with a single rounded division.
    Month indexes are integer year·12+month, same convention as the
    lifecycle query."""
    days = (
        t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.col("ts").cast("timestamp").cast("date").alias("day"),
            (
                F.year(F.col("ts").cast("timestamp")) * 12
                + F.month(F.col("ts").cast("timestamp"))
                - 1
            )
            .cast("long")
            .alias("month_idx"),
        )
        .distinct()
    )
    dau = days.groupBy("month_idx", "day").agg(F.count("*").alias("dau"))
    mau = days.groupBy("month_idx").agg(F.count_distinct("user_id").alias("mau"))
    return (
        dau.join(mau, "month_idx")
        .groupBy("month_idx")
        .agg(
            F.count("*").alias("n_days"),
            F.sum("dau").alias("dau_days"),
            F.max("mau").alias("mau"),
            F.round(
                F.sum("dau").cast("double") / F.count("*") / F.max("mau"), 6
            ).alias("stickiness"),
        )
    )


@query(
    "q_events_heatmap",
    oracle="""
    WITH cells AS (
        SELECT CAST(date_diff('day', DATE '1970-01-01',
                              CAST(CAST(ts AS TIMESTAMP) AS DATE)) % 7 AS BIGINT)
                   AS dow,
               CAST(date_part('hour', CAST(ts AS TIMESTAMP)) AS BIGINT) AS hour,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ), tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM cells)
    SELECT dow, hour, n,
           ROUND(n * 10000.0 / total, 4) AS share_bp
    FROM cells CROSS JOIN tot
    """,
    tags=("events", "heatmap", "hour-of-week", "profile"),
)
def q_events_heatmap(spark, sf_dir):
    """Hour-of-week activity heatmap (≤168 cells with basis-point
    shares) — the load-shape profile behind capacity planning, send-time
    optimization, and the seasonality index (q_events_seasonality)
    refined to hourly granularity. Day-of-week derives from epoch-day
    % 7 (engine-exact, same convention as the NB day feature); one hash
    aggregate collapses any event volume to the 168-cell frame and the
    share is a single rounded integer-ratio division."""
    ev = t(spark, sf_dir, "events").select(
        (
            F.datediff(
                F.col("ts").cast("timestamp").cast("date"),
                F.lit("1970-01-01").cast("date"),
            )
            % 7
        )
        .cast("long")
        .alias("dow"),
        F.hour(F.col("ts").cast("timestamp")).cast("long").alias("hour"),
    )
    cells = ev.groupBy("dow", "hour").agg(F.count("*").alias("n"))
    tot = cells.agg(F.sum("n").alias("total"))
    return cells.crossJoin(F.broadcast(tot)).select(
        "dow",
        "hour",
        "n",
        F.round(F.col("n") * 10000.0 / F.col("total"), 4).alias("share_bp"),
    )


@query(
    "q_agg_price_index",
    oracle="""
    WITH pm AS (
        SELECT l_partkey,
               CAST(date_part('year', CAST(l_shipdate AS TIMESTAMP)) * 12
                    + date_part('month', CAST(l_shipdate AS TIMESTAMP)) - 1
                    AS BIGINT) AS m,
               CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT) AS cents,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,0))) AS BIGINT) AS qty
        FROM lineitem GROUP BY 1, 2
    ), base AS (
        SELECT l_partkey, cents AS c0, qty AS q0
        FROM pm WHERE m = (SELECT MIN(m) FROM pm)
    ), terms AS (
        SELECT pm.m,
               CAST(CAST(pm.cents AS DOUBLE) * base.q0 / pm.qty
                    AS DECIMAL(18,4)) AS cur_term,
               CAST(CAST(base.c0 AS DOUBLE) AS DECIMAL(18,4)) AS base_term
        FROM pm JOIN base USING (l_partkey)
    )
    SELECT m AS month_idx,
           COUNT(*) AS n_parts,
           ROUND(CAST(SUM(cur_term) AS DOUBLE)
                 / CAST(SUM(base_term) AS DOUBLE) * 100, 4) AS laspeyres
    FROM terms GROUP BY 1
    """,
    tags=("agg", "price-index", "laspeyres", "econometrics"),
)
def q_agg_price_index(spark, sf_dir):
    """Laspeyres price index per month (base = earliest month, index
    100): Σ p_m·q₀ / Σ p₀·q₀ over parts traded in both periods, with
    p = the period's average unit price — the inflation-tracking shape
    every pricing/finance team materializes. Hash discipline: the
    per-part term p_m·q₀ = cents_m·q₀/qty_m is ONE IEEE division per
    part, immediately cast to decimal(18,4) so the cross-part summation
    is exact and order-independent (a raw double Σ over the catalog
    would be shuffle-order-dependent); p₀·q₀ simplifies to the exact
    base cents. Two part-month aggregates + a broadcast base join."""
    li = t(spark, sf_dir, "lineitem")
    pm = li.groupBy(
        "l_partkey",
        (
            F.year(F.col("l_shipdate").cast("timestamp")) * 12
            + F.month(F.col("l_shipdate").cast("timestamp"))
            - 1
        )
        .cast("long")
        .alias("m"),
    ).agg(
        F.sum(dec("l_extendedprice") * 100).cast("long").alias("cents"),
        F.sum(dec("l_quantity", 18, 0)).cast("long").alias("qty"),
    )
    min_m = pm.agg(F.min("m").alias("m0"))
    base = (
        pm.crossJoin(F.broadcast(min_m))
        .filter(F.col("m") == F.col("m0"))
        .select(
            "l_partkey", F.col("cents").alias("c0"), F.col("qty").alias("q0")
        )
    )
    terms = pm.join(F.broadcast(base), "l_partkey").select(
        "m",
        (F.col("cents").cast("double") * F.col("q0") / F.col("qty"))
        .cast("decimal(18,4)")
        .alias("cur_term"),
        F.col("c0").cast("double").cast("decimal(18,4)").alias("base_term"),
    )
    return terms.groupBy(F.col("m").alias("month_idx")).agg(
        F.count("*").alias("n_parts"),
        F.round(
            F.sum("cur_term").cast("double")
            / F.sum("base_term").cast("double")
            * 100,
            4,
        ).alias("laspeyres"),
    )


# Truncated SES window: 10 taps of geometric weights (1-α)^lag with α=0.3,
# expressed as EXACT integer weights 7^lag · 10^(9-lag) (= 0.7^lag scaled by
# 10^9) so both engines accumulate identical integers — no cross-engine pow()
# in the sum, no float accumulation order anywhere.
SES_TAPS = 10


@query(
    "q_ts_ses",
    oracle=f"""
    WITH daily AS (
        SELECT event_type,
               datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS DECIMAL(20,0)) AS cents
        FROM events GROUP BY 1, 2
    )
    SELECT a.event_type, a.d AS epoch_day,
           COUNT(*) AS n_taps,
           CAST(a.cents AS DOUBLE) / 100 AS x,
           ROUND(
             CAST(SUM(CAST(CAST(ROUND(POWER(7.0, a.d - b.d)) AS BIGINT)
                            * CAST(ROUND(POWER(10.0, {SES_TAPS - 1} - (a.d - b.d))) AS BIGINT)
                           AS DECIMAL(16,0)) * b.cents) AS DOUBLE)
             / CAST(SUM(CAST(CAST(ROUND(POWER(7.0, a.d - b.d)) AS BIGINT)
                              * CAST(ROUND(POWER(10.0, {SES_TAPS - 1} - (a.d - b.d))) AS BIGINT)
                             AS DECIMAL(16,0))) AS DOUBLE) / 100,
             4) AS ses
    FROM daily a JOIN daily b
      ON a.event_type = b.event_type
     AND b.d BETWEEN a.d - {SES_TAPS - 1} AND a.d
    GROUP BY a.event_type, a.d, a.cents
    """,
    tags=("timeseries", "smoothing", "ses", "feature-engineering"),
)
def q_ts_ses(spark, sf_dir):
    """Simple exponential smoothing (truncated to 10 taps) of the daily
    value series per event type — the classic trailing-decay signal
    behind anomaly baselines and demand forecasts.

    Determinism design: the geometric weights (1-α)^lag, α=0.3, are the
    exact integers 7^lag·10^(9-lag) (0.7^lag scaled by 10⁹) and the
    series values are exact cents, so numerator and denominator are
    exact decimal sums in BOTH engines — order-independent under any
    shuffle — with one double division + round(4) at the end. POWER()
    only ever produces integers < 2^53 that ROUND pins exactly.

    Scale shape: the daily rollup collapses event volume to |types|×|days|
    rows in one shuffle; the 10-tap banded self-join is an equi-join on
    event_type with a range predicate — each row joins ≤10 partners, so
    the join output is 10× a driver-size series, never event-scale. A
    100 TB deployment would partition the daily table by event_type and
    the band join stays node-local.
    """
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("d"),
    ).agg((F.sum(dec("value")) * 100).cast("decimal(20,0)").alias("cents"))
    a = daily.select(
        "event_type", F.col("d").alias("da"), F.col("cents").alias("ca")
    )
    b = daily.select(
        "event_type", F.col("d").alias("db"), F.col("cents").alias("cb")
    )
    lag = F.col("da") - F.col("db")
    w = (
        F.round(F.pow(F.lit(7.0), lag)).cast("long")
        * F.round(F.pow(F.lit(10.0), F.lit(SES_TAPS - 1) - lag)).cast("long")
    ).cast("decimal(16,0)")
    joined = a.alias("a").join(
        b.alias("b"),
        (F.col("a.event_type") == F.col("b.event_type"))
        & F.col("db").between(F.col("da") - (SES_TAPS - 1), F.col("da")),
    )
    return (
        joined.groupBy(
            F.col("a.event_type").alias("event_type"),
            F.col("da").alias("epoch_day"),
            F.col("ca").alias("_ca"),
        )
        .agg(
            F.count("*").alias("n_taps"),
            F.sum(w * F.col("cb")).cast("double").alias("_num"),
            F.sum(w).cast("double").alias("_den"),
        )
        .select(
            "event_type",
            "epoch_day",
            "n_taps",
            (F.col("_ca").cast("double") / 100).alias("x"),
            F.round(F.col("_num") / F.col("_den") / 100, 4).alias("ses"),
        )
    )


@query(
    "q_ts_holt",
    # Holt's recursion replayed EXACTLY by a DuckDB RECURSIVE CTE: both
    # engines run the identical IEEE-double op sequence (alpha*y, then
    # 0.7*(l+b), etc. — written with the same association in both), so
    # the states match bit-for-bit before the final round_even(…,6)
    # (round_even mirrors numpy/pandas banker's rounding).
    oracle="""
    WITH RECURSIVE daily AS (
        SELECT event_type,
               CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS d,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS y
        FROM events GROUP BY 1, 2
    ), seq AS (
        SELECT event_type, d, y,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn
        FROM daily
    ), r AS (
        SELECT event_type, rn, d, y, y AS level, CAST(0 AS DOUBLE) AS trend
        FROM seq WHERE rn = 1
        UNION ALL
        SELECT s.event_type, s.rn, s.d, s.y,
               0.3 * s.y + 0.7 * (r.level + r.trend) AS level,
               0.1 * ((0.3 * s.y + 0.7 * (r.level + r.trend)) - r.level)
                 + 0.9 * r.trend AS trend
        FROM r JOIN seq s ON s.event_type = r.event_type AND s.rn = r.rn + 1
    )
    SELECT event_type, d AS epoch_day,
           round_even(y, 6) AS x,
           round_even(level, 6) AS level,
           round_even(trend, 6) AS trend,
           round_even(level + trend, 6) AS forecast_1
    FROM r
    """,
    tags=("timeseries", "smoothing", "holt", "trend", "forecast"),
)
def q_ts_holt(spark, sf_dir):
    """Holt's linear-trend double exponential smoothing (α=0.3, β=0.1,
    init l₁=y₁, b₁=0) of the daily value series per event type — the
    trend-aware upgrade of q_ts_ses and the SURVEY §7 'second smoothing
    constant' forward item. Unlike SES there is no order-independent
    closed form with exact weights, so exactness comes from REPLAYING
    the recursion: the per-series loop runs in applyInPandas (sequential
    float64, sorted by day) and the oracle's RECURSIVE CTE steps the
    identical expressions in the identical order — IEEE doubles agree
    bit-for-bit, with banker's rounding to 6dp on output only.

    Scale shape: the fact table collapses to |types|×|days| rows in one
    hash-aggregate shuffle; the recursion runs per event_type on a
    driver-bounded series (days, not events), one group per task —
    the same grouped-pandas discipline as q_win_capped_cumsum. Output
    adds the one-step forecast l+b, the value a demand planner reads."""
    import pandas as pd

    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("d"),
    ).agg(F.sum(dec("value")).cast("double").alias("y"))

    def holt(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("d").reset_index(drop=True)
        y = pdf["y"].to_numpy()
        levels, trends = [], []
        level, trend = float(y[0]), 0.0
        levels.append(level)
        trends.append(trend)
        for i in range(1, len(y)):
            new_level = 0.3 * float(y[i]) + 0.7 * (level + trend)
            trend = 0.1 * (new_level - level) + 0.9 * trend
            level = new_level
            levels.append(level)
            trends.append(trend)
        out = pd.DataFrame(
            {
                "event_type": pdf["event_type"],
                "epoch_day": pdf["d"],
                "x": pdf["y"],
                "level": levels,
                "trend": trends,
            }
        )
        out["forecast_1"] = out["level"] + out["trend"]
        for c in ("x", "level", "trend", "forecast_1"):
            out[c] = out[c].round(6)
        return out

    return daily.groupBy("event_type").applyInPandas(
        holt,
        "event_type string, epoch_day long, x double, level double, "
        "trend double, forecast_1 double",
    )


@query(
    "q_ts_holt_winters",
    # Full triple smoothing replayed exactly: the recursion state carries
    # the 7 seasonal components as a LIST column in the RECURSIVE CTE
    # (seas[1] is always s_{t-6..t}'s oldest = the s_{t+1-7} the next
    # step consumes); the init phase accumulates the first week's sum
    # SEQUENTIALLY in the recursion (never SUM()/AVG(), whose float
    # accumulation order is engine-specific), so every IEEE-double op
    # runs in the same order as the pandas loop.
    oracle="""
    WITH RECURSIVE daily AS (
        SELECT event_type,
               CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS d,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS y
        FROM events GROUP BY 1, 2
    ), seq AS (
        SELECT event_type, d, y,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn
        FROM daily
    ), r AS (
        SELECT event_type, rn, d, y,
               y AS acc, [y] AS ys,
               CAST(NULL AS DOUBLE) AS level, CAST(NULL AS DOUBLE) AS trend,
               CAST(NULL AS DOUBLE[]) AS seas, CAST(NULL AS DOUBLE) AS s_new
        FROM seq WHERE rn = 1
        UNION ALL
        SELECT s.event_type, s.rn, s.d, s.y,
               CASE WHEN s.rn <= 7 THEN r.acc + s.y END AS acc,
               CASE WHEN s.rn <= 7 THEN list_append(r.ys, s.y) END AS ys,
               CASE WHEN s.rn < 7 THEN CAST(NULL AS DOUBLE)
                    WHEN s.rn = 7 THEN (r.acc + s.y) / 7.0
                    ELSE 0.3 * (s.y - r.seas[1]) + 0.7 * (r.level + r.trend)
               END AS level,
               CASE WHEN s.rn < 7 THEN CAST(NULL AS DOUBLE)
                    WHEN s.rn = 7 THEN 0.0
                    ELSE 0.1 * ((0.3 * (s.y - r.seas[1])
                                 + 0.7 * (r.level + r.trend)) - r.level)
                         + 0.9 * r.trend
               END AS trend,
               CASE WHEN s.rn < 7 THEN CAST(NULL AS DOUBLE[])
                    WHEN s.rn = 7 THEN list_transform(
                        list_append(r.ys, s.y),
                        x -> x - (r.acc + s.y) / 7.0)
                    ELSE list_append(r.seas[2:],
                        0.2 * (s.y - (0.3 * (s.y - r.seas[1])
                                      + 0.7 * (r.level + r.trend)))
                          + 0.8 * r.seas[1])
               END AS seas,
               CASE WHEN s.rn < 8 THEN CAST(NULL AS DOUBLE)
                    ELSE 0.2 * (s.y - (0.3 * (s.y - r.seas[1])
                                       + 0.7 * (r.level + r.trend)))
                           + 0.8 * r.seas[1]
               END AS s_new
        FROM r JOIN seq s ON s.event_type = r.event_type AND s.rn = r.rn + 1
    )
    SELECT event_type, d AS epoch_day,
           round_even(y, 6) AS x,
           round_even(level, 6) AS level,
           round_even(trend, 6) AS trend,
           round_even(s_new, 6) AS seasonal,
           round_even(level + trend + seas[1], 6) AS forecast_1
    FROM r WHERE rn >= 8
    """,
    tags=("timeseries", "smoothing", "holt-winters", "seasonal", "forecast"),
)
def q_ts_holt_winters(spark, sf_dir):
    """Holt-Winters triple exponential smoothing (additive, period m=7,
    α=0.3, β=0.1, γ=0.2) of the daily value series per event type — the
    seasonal completion of the smoothing family (q_ts_ses → q_ts_holt →
    here), the SURVEY §7 forward item delivered in full. Init from the
    first week: l₇ = (Σ sequential y₁..y₇)/7, b₇ = 0, sᵢ = yᵢ − l₇;
    then l_t = α(y_t − s_{t−7}) + (1−α)(l_{t−1}+b_{t−1}),
    b_t = β(l_t−l_{t−1}) + (1−β)b_{t−1}, s_t = γ(y_t−l_t) + (1−γ)s_{t−7}.
    Exactness comes from REPLAYING the recursion (q_ts_holt's technique,
    extended with list-typed seasonal state in the RECURSIVE CTE): both
    engines run the identical IEEE-double op order, including the
    sequential first-week accumulation, and agree bit-for-bit before
    banker's rounding to 6dp. Output rows start at day 8 (the first
    fully-stepped state); forecast_1 = l + b + s_{t+1−7}.

    Scale shape: identical to q_ts_holt — one fact-table hash aggregate
    to |types|×|days| rows, then a per-series driver-bounded loop in
    applyInPandas, one group per task."""
    import pandas as pd

    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("d"),
    ).agg(F.sum(dec("value")).cast("double").alias("y"))

    def hw(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("d").reset_index(drop=True)
        y = pdf["y"].to_numpy()
        rows = []
        if len(y) >= 8:
            acc = float(y[0])
            for i in range(1, 7):
                acc = acc + float(y[i])
            level = acc / 7.0
            trend = 0.0
            seas = [float(y[i]) - level for i in range(7)]
            for i in range(7, len(y)):
                s_old = seas[0]
                new_level = 0.3 * (float(y[i]) - s_old) + 0.7 * (level + trend)
                trend = 0.1 * (new_level - level) + 0.9 * trend
                s_new = 0.2 * (float(y[i]) - new_level) + 0.8 * s_old
                level = new_level
                seas = seas[1:] + [s_new]
                rows.append(
                    (
                        pdf["event_type"].iloc[i],
                        int(pdf["d"].iloc[i]),
                        float(y[i]),
                        level,
                        trend,
                        s_new,
                        level + trend + seas[0],
                    )
                )
        out = pd.DataFrame(
            rows,
            columns=[
                "event_type", "epoch_day", "x", "level", "trend",
                "seasonal", "forecast_1",
            ],
        )
        for c in ("x", "level", "trend", "seasonal", "forecast_1"):
            out[c] = out[c].astype("float64").round(6)
        return out

    return daily.groupBy("event_type").applyInPandas(
        hw,
        "event_type string, epoch_day long, x double, level double, "
        "trend double, seasonal double, forecast_1 double",
    )


@query(
    "q_ts_forecast_naive",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               SUM(CAST(value AS DECIMAL(18,2))) AS x
        FROM events GROUP BY 1, 2
    ), j AS (
        SELECT a.event_type, a.x AS actual, b.x AS fc
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND b.day = a.day - INTERVAL 7 DAY
    )
    SELECT event_type, COUNT(*) AS n_days,
           ROUND(CAST(SUM(ABS(actual - fc)) AS DOUBLE) / COUNT(*), 6) AS mae,
           ROUND(CAST(SUM(ABS(actual - fc)) AS DOUBLE)
                 / CAST(SUM(actual) AS DOUBLE), 6) AS wape,
           ROUND(CAST(SUM(actual - fc) AS DOUBLE)
                 / CAST(SUM(actual) AS DOUBLE), 6) AS bias
    FROM j GROUP BY event_type
    """,
    tags=("timeseries", "forecast", "backtest", "accuracy"),
)
def q_ts_forecast_naive(spark, sf_dir):
    """Seasonal-naive forecast backtest: predict each day's total value
    per event type as the value seven days earlier, then score MAE /
    WAPE / bias per type — the baseline every forecasting deployment
    must beat, and the accuracy harness that scores it.

    WAPE (Σ|err|/Σactual) and bias are chosen over sMAPE/MAPE because
    they are ratios of two EXACT decimal sums — one double division at
    the end — where per-row double ratios would accumulate in
    shuffle-dependent order. Scale shape: one shuffle to the daily
    rollup, a self-equi-join on (event_type, day) between driver-size
    series, and a |types|-row result.
    """
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum(dec("value")).alias("x")
    )
    a = daily.select("event_type", "day", F.col("x").alias("actual"))
    b = daily.select(
        "event_type", F.date_add("day", 7).alias("day"), F.col("x").alias("fc")
    )
    err = F.col("actual") - F.col("fc")
    return (
        a.join(b, ["event_type", "day"])
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_days"),
            F.round(
                F.sum(F.abs(err)).cast("double") / F.count("*"), 6
            ).alias("mae"),
            F.round(
                F.sum(F.abs(err)).cast("double")
                / F.sum("actual").cast("double"),
                6,
            ).alias("wape"),
            F.round(
                F.sum(err).cast("double") / F.sum("actual").cast("double"), 6
            ).alias("bias"),
        )
    )


@query(
    "q_ts_changepoint",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS DECIMAL(20,0)) AS cents
        FROM events GROUP BY 1, 2
    ), cum AS (
        SELECT event_type, d, cents,
               ROW_NUMBER() OVER w AS k,
               SUM(cents) OVER w AS s1,
               COUNT(*) OVER (PARTITION BY event_type) AS n,
               SUM(cents) OVER (PARTITION BY event_type) AS tot
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), gains AS (
        SELECT event_type, d, k AS n1, n - k AS n2, s1, tot - s1 AS s2,
               CAST(CAST((s1 * (n - k) - (tot - s1) * k)
                         * (s1 * (n - k) - (tot - s1) * k) AS DECIMAL(38,0)) AS DOUBLE)
               / (k * (n - k) * n) AS gain
        FROM cum WHERE k < n
    ), best AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                     ORDER BY gain DESC, d) AS rk
        FROM gains
    )
    SELECT event_type, d AS split_epoch_day, n1, n2,
           -- exact integer half-up rounding to 4dp: means are rationals
           -- cents/n whose doubles can land ON a rounding midpoint, where
           -- engines disagree; (s*200 + n) // (2n) is midpoint-free.
           CAST((CAST(s1 AS BIGINT) * 200 + n1) // (2 * n1) AS DOUBLE) / 10000
             AS mean_before,
           CAST((CAST(s2 AS BIGINT) * 200 + n2) // (2 * n2) AS DOUBLE) / 10000
             AS mean_after,
           ROUND(gain / 10000, 4) AS sse_gain
    FROM best WHERE rk = 1
    """,
    tags=("timeseries", "changepoint", "segmentation"),
)
def q_ts_changepoint(spark, sf_dir):
    """Single changepoint per event-type daily series via exact binary
    segmentation: the split k maximizing the between-segment SSE
    reduction n1·n2/n·(mean1-mean2)². The gain is evaluated as
    (S1·n2 − S2·n1)² / (n1·n2·n) with S in exact integer cents, so both
    engines rank candidates on a double computed from IDENTICAL exact
    integers — argmax ties broken by day. This is the inner step of
    PELT/binary-segmentation changepoint detectors.

    Scale shape: event volume collapses to a |types|×|days| rollup in
    one shuffle; prefix sums are one window pass per type over a
    driver-size series; candidate evaluation is embarrassingly parallel
    rows. No event-scale sort anywhere.
    """
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("d"),
    ).agg((F.sum(dec("value")) * 100).cast("decimal(20,0)").alias("cents"))
    wrun = W.partitionBy("event_type").orderBy("d").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    wall = W.partitionBy("event_type")
    cum = daily.select(
        "event_type",
        "d",
        F.row_number().over(W.partitionBy("event_type").orderBy("d")).alias("k"),
        F.sum("cents").over(wrun).alias("s1"),
        F.count("*").over(wall).alias("n"),
        F.sum("cents").over(wall).alias("tot"),
    )
    diff = F.col("s1") * (F.col("n") - F.col("k")) - (
        F.col("tot") - F.col("s1")
    ) * F.col("k")
    gains = cum.filter(F.col("k") < F.col("n")).select(
        "event_type",
        "d",
        F.col("k").alias("n1"),
        (F.col("n") - F.col("k")).alias("n2"),
        "s1",
        (F.col("tot") - F.col("s1")).alias("s2"),
        (
            (diff * diff).cast("decimal(38,0)").cast("double")
            / (F.col("k") * (F.col("n") - F.col("k")) * F.col("n"))
        ).alias("gain"),
    )
    best = gains.withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("event_type").orderBy(F.col("gain").desc(), "d")
        ),
    ).filter(F.col("rk") == 1)
    def mean4(s_col: str, n_col: str):
        # exact integer half-up to 4dp (see oracle comment): decimal
        # multiply/add stays exact; the scale-6 decimal division cannot
        # cross an integer boundary for n < 1e6, so floor() is exact.
        q = (F.col(s_col) * 200 + F.col(n_col)) / (F.col(n_col) * 2)
        return F.floor(q).cast("double") / 10000

    return best.select(
        "event_type",
        F.col("d").alias("split_epoch_day"),
        "n1",
        "n2",
        mean4("s1", "n1").alias("mean_before"),
        mean4("s2", "n2").alias("mean_after"),
        F.round(F.col("gain") / 10000, 4).alias("sse_gain"),
    )


@query(
    "q_agg_theilsen",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS DECIMAL(20,0)) AS cents
        FROM events GROUP BY 1, 2
    ), slopes AS (
        SELECT a.event_type,
               CAST(b.cents - a.cents AS DOUBLE) / 100 / (b.d - a.d) AS slope
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.d < b.d
    )
    SELECT event_type, COUNT(*) AS n_pairs,
           ROUND(quantile_disc(slope, 0.5), 6) AS theil_sen_slope
    FROM slopes GROUP BY event_type
    """,
    tags=("agg", "robust", "trend", "theil-sen"),
)
def q_agg_theilsen(spark, sf_dir):
    """Theil–Sen robust trend per event type: the median of all pairwise
    slopes of the daily value series — breakdown point 29%, immune to
    the outlier days that wreck the OLS slope (q_agg_ols_trend is the
    fragile twin). Every pairwise slope is one IEEE division of exact
    integers (identical doubles in both engines) and the median is the
    element-returning discrete percentile, so the result hash-matches
    without tolerance.

    Scale shape: the O(|days|²) pair join runs on the POST-ROLLUP series
    (driver-size per type), not on events — ~4k pairs per type here. A
    100 TB deployment bounds it the same way: the rollup is what scales,
    the pair set stays |days|² regardless of event volume (or samples
    pairs for multi-year windows).
    """
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("d"),
    ).agg((F.sum(dec("value")) * 100).cast("decimal(20,0)").alias("cents"))
    a = daily.select(
        "event_type", F.col("d").alias("da"), F.col("cents").alias("ca")
    )
    b = daily.select(
        "event_type", F.col("d").alias("db"), F.col("cents").alias("cb")
    )
    slopes = (
        a.alias("a")
        .join(b.alias("b"), "event_type")
        .filter(F.col("da") < F.col("db"))
        .select(
            "event_type",
            (
                (F.col("cb") - F.col("ca")).cast("double")
                / 100
                / (F.col("db") - F.col("da"))
            ).alias("slope"),
        )
    )
    return slopes.groupBy("event_type").agg(
        F.count("*").alias("n_pairs"),
        F.round(
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY slope)"), 6
        ).alias("theil_sen_slope"),
    )


MARKOV_ITERS = 200  # Jacobi steps; fixture chains converge to <1e-15 by 200


def _markov_oracle() -> str:
    """DuckDB replay of the ENTIRE markov attribution pipeline (rows-only
    → SQL upgrade): journeys → transition counts (exact ints) → per-
    removal-scenario probability matrices (one correctly-rounded float64
    division per cell) → MARKOV_ITERS Jacobi steps of x' = b + Qx run by
    a recursive CTE carrying the k-vector as LIST state. Each step's dot
    product is a list_prepend + list_reduce LEFT FOLD — the identical
    IEEE op sequence the Spark side's pure-Python loop performs
    (acc = b[i]; acc += q[i][j]*x[j] for ascending j) — so after the
    same N steps both engines hold bit-identical doubles and the
    round_even(…, 6) outputs hash-match."""
    N = MARKOV_ITERS
    return f"""
WITH RECURSIVE s1 AS (
    SELECT user_id, event_type, event_id,
           ROW_NUMBER() OVER (PARTITION BY user_id
               ORDER BY CAST(epoch(date_trunc('second', CAST(ts AS TIMESTAMP))) AS BIGINT),
                        event_id) AS rn
    FROM events
), s2 AS (
    SELECT *, MIN(CASE WHEN event_type = 'purchase' THEN rn END)
                  OVER (PARTITION BY user_id) AS conv_rn
    FROM s1
), touches AS (
    SELECT * FROM s2 WHERE conv_rn IS NULL OR rn < conv_rn
), nxt AS (
    SELECT event_type AS src,
           LEAD(event_type) OVER (PARTITION BY user_id ORDER BY rn) AS dst_raw,
           conv_rn IS NOT NULL AS converts
    FROM touches
), tc AS (
    SELECT src,
           CASE WHEN dst_raw IS NOT NULL THEN dst_raw
                WHEN converts THEN 'CONV' ELSE 'NULL' END AS dst,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM nxt GROUP BY 1, 2
    UNION ALL
    SELECT 'START', event_type, CAST(COUNT(*) AS BIGINT)
    FROM touches WHERE rn = 1 GROUP BY 2
), tcg AS (
    SELECT src, dst, CAST(SUM(n) AS BIGINT) AS n FROM tc GROUP BY 1, 2
), states AS (
    SELECT list_sort(list(DISTINCT s)) AS sts, CAST(COUNT(DISTINCT s) AS BIGINT) AS k
    FROM (SELECT src AS s FROM tcg UNION SELECT dst FROM tcg)
    WHERE s NOT IN ('CONV', 'NULL')
), idxd AS (
    SELECT list_position(s.sts, t.src) AS i,
           CASE WHEN t.dst = 'CONV' THEN s.k + 1
                WHEN t.dst = 'NULL' THEN NULL
                ELSE list_position(s.sts, t.dst) END AS j,
           t.n
    FROM tcg t, states s
), tot AS (
    SELECT i, CAST(SUM(n) AS BIGINT) AS tot FROM idxd GROUP BY i
), cnt AS (
    SELECT i, j, CAST(SUM(n) AS BIGINT) AS n FROM idxd WHERE j IS NOT NULL GROUP BY i, j
), grid AS (
    SELECT CAST(ii.i AS BIGINT) AS i, CAST(jj.j AS BIGINT) AS j
    FROM states s, UNNEST(range(1, s.k + 1)) AS ii(i),
         UNNEST(range(1, s.k + 2)) AS jj(j)
), dense AS (
    SELECT g.i, g.j,
           COALESCE(c.n, 0) AS n, COALESCE(tt.tot, 0) AS tot
    FROM grid g LEFT JOIN cnt c ON g.i = c.i AND g.j = c.j
                LEFT JOIN tot tt ON g.i = tt.i
), scen AS (
    SELECT CAST(NULL AS VARCHAR) AS removed FROM states
    UNION ALL
    SELECT u.s AS removed
    FROM states st, UNNEST(st.sts) AS u(s) WHERE u.s <> 'START'
), mrows AS (
    SELECT sc.removed, d.i,
           list(CASE WHEN d.tot = 0 OR s.sts[d.i] = sc.removed
                       OR (sc.removed IS NOT NULL
                           AND d.j = list_position(s.sts, sc.removed))
                     THEN CAST(0.0 AS DOUBLE)
                     ELSE CAST(d.n AS DOUBLE) / d.tot END
                ORDER BY d.j) FILTER (WHERE d.j <= s.k) AS qrow,
           MAX(CASE WHEN d.j = s.k + 1 THEN
                 (CASE WHEN d.tot = 0 OR s.sts[d.i] = sc.removed
                       THEN CAST(0.0 AS DOUBLE)
                       ELSE CAST(d.n AS DOUBLE) / d.tot END) END) AS brow
    FROM dense d, states s, scen sc
    GROUP BY sc.removed, d.i, s.sts, s.k
), mats AS (
    SELECT removed, list(qrow ORDER BY i) AS q, list(brow ORDER BY i) AS b
    FROM mrows GROUP BY removed
), it AS (
    SELECT removed, q, b, 0 AS t,
           list_transform(range(1, len(b) + 1), v -> CAST(0.0 AS DOUBLE)) AS x
    FROM mats
    UNION ALL
    SELECT removed, q, b, t + 1,
           list_transform(range(1, len(b) + 1), i ->
               list_reduce(
                   list_prepend(b[i],
                       list_transform(range(1, len(b) + 1), j -> q[i][j] * x[j])),
                   (a, v) -> a + v)) AS x
    FROM it WHERE t < {N}
), fin AS (
    SELECT i.removed, i.x[list_position(s.sts, 'START')] AS conv
    FROM it i, states s WHERE i.t = {N}
), eff AS (
    SELECT f.removed AS channel,
           CASE WHEN b.conv > 0 THEN greatest(0.0, (b.conv - f.conv) / b.conv)
                ELSE 0.0 END AS effect,
           b.conv AS basec
    FROM fin f, (SELECT conv FROM fin WHERE removed IS NULL) b
    WHERE f.removed IS NOT NULL
), tote AS (
    SELECT list_reduce(list(effect ORDER BY channel), (a, v) -> a + v) AS te
    FROM eff
)
SELECT e.channel,
       round_even(e.effect, 6) AS removal_effect,
       CASE WHEN t.te > 0 THEN round_even(e.effect / t.te, 6) ELSE 0.0 END
           AS attribution_share,
       round_even(e.basec, 6) AS base_conv_prob
FROM eff e, tote t
"""


@query(
    "q_events_markov_attribution",
    # Rows-only → SQL upgrade: the k×k absorbing-chain solve is restated
    # as MARKOV_ITERS fixed Jacobi steps in pure Python (explicit
    # ascending-j left fold, every op a correctly-rounded float64), which
    # the oracle's recursive CTE replays with the identical op sequence —
    # bit-identical after the same N steps (fixture residual <1e-15 vs
    # the exact solve; pinned in tests).
    oracle=_markov_oracle(),
    tags=("events", "attribution", "markov", "removal-effect"),
)
def q_events_markov_attribution(spark, sf_dir):
    """Markov removal-effect attribution (Anderl et al. 2014): model
    user journeys as a first-order chain over touch types, absorbing at
    CONV (first purchase) or NULL (journey end); each channel's credit
    is the relative drop in START→CONV probability when that channel's
    transitions are redirected to NULL. The principled alternative to
    the position-based rules in q_events_attribution.

    Scale shape: the distributed work is exactly one shuffle — per-user
    event ordering (window lag) to transition pairs, then a hash
    aggregate to a k² transition-count matrix (k = |event types|, single
    digits). The absorbing-chain solve runs on the driver over that k²
    matrix as MARKOV_ITERS Jacobi steps (x' = b + Qx) in pure Python —
    the same driver-size-matrix precedent as the confusion matrix
    (ml/metrics.py), restated iteratively so the DuckDB oracle replays
    the identical IEEE op sequence (see _markov_oracle). Removal effects
    re-iterate k times on the same tiny matrix.
    """
    import numpy as np

    ev = t(spark, sf_dir, "events")
    wuser = W.partitionBy("user_id").orderBy(epoch_s("ts"), "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.row_number().over(wuser).alias("rn"),
        F.min(F.when(F.col("event_type") == "purchase", F.row_number().over(wuser)))
        .over(W.partitionBy("user_id"))
        .alias("conv_rn"),
    )
    # journey = touches strictly before the first purchase (or all, if none)
    touches = seq.filter(
        (F.col("conv_rn").isNull()) | (F.col("rn") < F.col("conv_rn"))
    )
    nxt = touches.select(
        "user_id",
        F.col("event_type").alias("src"),
        F.lead("event_type")
        .over(W.partitionBy("user_id").orderBy("rn"))
        .alias("dst_raw"),
        F.col("conv_rn").isNotNull().alias("converts"),
        F.col("rn").alias("rn"),
    )
    trans = (
        nxt.select(
            "src",
            F.when(F.col("dst_raw").isNotNull(), F.col("dst_raw"))
            .when(F.col("converts"), F.lit("CONV"))
            .otherwise(F.lit("NULL"))
            .alias("dst"),
        )
        .unionByName(
            touches.filter(F.col("rn") == 1).select(
                F.lit("START").alias("src"), F.col("event_type").alias("dst")
            )
        )
        .groupBy("src", "dst")
        .agg(F.count("*").alias("n"))
    )
    rows = trans.collect()  # k² rows, k = |event types| + START
    states = sorted(
        ({r["src"] for r in rows} | {r["dst"] for r in rows}) - {"CONV", "NULL"}
    )
    idx = {s: i for i, s in enumerate(states)}
    k = len(states)
    counts = [[0] * (k + 1) for _ in range(k)]  # exact ints; last col = CONV
    totals = [0] * k
    for r in rows:
        totals[idx[r["src"]]] += r["n"]
        if r["dst"] == "CONV":
            counts[idx[r["src"]]][k] += r["n"]
        elif r["dst"] != "NULL":
            counts[idx[r["src"]]][idx[r["dst"]]] += r["n"]

    def conv_prob(removed: str | None) -> float:
        # Probability cells: one correctly-rounded float64 division each
        # (exact int counts / exact int totals) — identical in DuckDB.
        q = [[0.0] * k for _ in range(k)]
        b = [0.0] * k
        for i, s in enumerate(states):
            if totals[i] == 0 or s == removed:
                continue  # all mass -> NULL (row stays zero)
            for j in range(k):
                if removed is not None and j == idx[removed]:
                    continue
                q[i][j] = counts[i][j] / totals[i]
            b[i] = counts[i][k] / totals[i]
        # Fixed-N Jacobi: x' = b + Qx, ascending-j LEFT FOLD per row —
        # the exact op sequence the oracle's list_reduce replays.
        x = [0.0] * k
        for _ in range(MARKOV_ITERS):
            nx = []
            for i in range(k):
                acc = b[i]
                for j in range(k):
                    acc = acc + q[i][j] * x[j]
                nx.append(acc)
            x = nx
        return x[idx["START"]]

    base = conv_prob(None)
    channels = [s for s in states if s != "START"]
    removals = {
        c: max(0.0, (base - conv_prob(c)) / base) if base > 0 else 0.0
        for c in channels
    }
    # sum() left-folds in sorted-channel order from 0.0 — 0.0+e1 == e1
    # exactly, so this equals the oracle's list_reduce over the same order.
    tot_removal = sum(removals[c] for c in sorted(channels))
    # np.round (not builtin round): numpy's scaled round-half-even is the
    # proven twin of DuckDB round_even (q_ts_holt precedent).
    out = [
        (
            c,
            float(np.round(removals[c], 6)),
            float(np.round(removals[c] / tot_removal, 6)) if tot_removal > 0 else 0.0,
            float(np.round(base, 6)),
        )
        for c in sorted(channels)
    ]
    return spark.createDataFrame(
        out,
        "channel string, removal_effect double, attribution_share double, "
        "base_conv_prob double",
    )


@query(
    "q_win_hampel",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS DECIMAL(20,0))
                    AS BIGINT) AS cents
        FROM events GROUP BY 1, 2
    ), med AS (
        SELECT a.event_type, a.d, a.cents,
               quantile_disc(b.cents, 0.5) AS med_cents,
               COUNT(*) AS n_band
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND b.d BETWEEN a.d - 3 AND a.d + 3
        GROUP BY a.event_type, a.d, a.cents
    ), mad AS (
        SELECT m.event_type, m.d, m.cents, m.med_cents, m.n_band,
               quantile_disc(ABS(b.cents - m.med_cents), 0.5) AS mad_cents
        FROM med m JOIN daily b
          ON m.event_type = b.event_type AND b.d BETWEEN m.d - 3 AND m.d + 3
        GROUP BY m.event_type, m.d, m.cents, m.med_cents, m.n_band
    )
    SELECT event_type, d AS epoch_day, n_band,
           CAST(cents AS DOUBLE) / 100 AS x,
           CAST(med_cents AS DOUBLE) / 100 AS rolling_median,
           CAST(mad_cents AS DOUBLE) / 100 AS rolling_mad,
           CAST(ABS(cents - med_cents) AS DOUBLE) > 3 * 1.4826 * mad_cents
             AS is_outlier
    FROM mad
    """,
    tags=("window", "outlier", "hampel", "robust", "timeseries"),
)
def q_win_hampel(spark, sf_dir):
    """Hampel filter: flag daily values more than 3 scaled rolling MADs
    from the rolling median (±3-day band) — the robust outlier detector
    that survives the exact spikes that poison mean/stddev z-scores
    (q_events_anomaly's fragile twin). Medians are element-returning
    order statistics over exact integer cents, so every column is
    bit-identical across engines; the only float op is the final
    3·1.4826·MAD threshold compare, computed from identical exact
    integers on both sides.

    The rolling MAD needs the median *of deviations from each center's
    own median* — a nested per-frame statistic no single window pass
    expresses — so the frame is materialized as a ±3-day banded
    self-join (≤7 partners/row), grouped per center, twice. Scale
    shape: both band joins are equi-joins on event_type over the
    POST-ROLLUP |types|×|days| series, so join volume is 7× a
    driver-size table regardless of event volume.
    """
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("d"),
    ).agg(
        (F.sum(dec("value")) * 100)
        .cast("decimal(20,0)")
        .cast("long")
        .alias("cents")
    )
    b = daily.select(
        "event_type", F.col("d").alias("db"), F.col("cents").alias("cb")
    )
    med = (
        daily.alias("a")
        .join(
            b.alias("b"),
            (F.col("a.event_type") == F.col("b.event_type"))
            & F.col("db").between(F.col("d") - 3, F.col("d") + 3),
        )
        .groupBy(F.col("a.event_type").alias("event_type"), "d", "cents")
        .agg(
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY cb)").alias(
                "med_cents"
            ),
            F.count("*").alias("n_band"),
        )
    )
    mad = (
        med.alias("m")
        .join(
            b.alias("b"),
            (F.col("m.event_type") == F.col("b.event_type"))
            & F.col("db").between(F.col("d") - 3, F.col("d") + 3),
        )
        .groupBy(
            F.col("m.event_type").alias("event_type"),
            "d",
            "cents",
            "med_cents",
            "n_band",
        )
        .agg(
            F.expr(
                "percentile_disc(0.5) WITHIN GROUP (ORDER BY abs(cb - med_cents))"
            ).alias("mad_cents")
        )
    )
    return mad.select(
        "event_type",
        F.col("d").alias("epoch_day"),
        "n_band",
        (F.col("cents").cast("double") / 100).alias("x"),
        (F.col("med_cents").cast("double") / 100).alias("rolling_median"),
        (F.col("mad_cents").cast("double") / 100).alias("rolling_mad"),
        (
            F.abs(F.col("cents") - F.col("med_cents")).cast("double")
            > 3 * 1.4826 * F.col("mad_cents")
        ).alias("is_outlier"),
    )


NEYMAN_SAMPLE_N = 1000


@query(
    "q_agg_neyman_allocation",
    oracle=f"""
    WITH strata AS (
        SELECT event_type, COUNT(*) AS n_h,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(value AS DECIMAL(18,4))
                        * CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sxx
        FROM events GROUP BY event_type
    ), wts AS (
        SELECT event_type, n_h,
               SQRT((sxx - sx * sx / n_h) / n_h) AS s_h,
               n_h * SQRT((sxx - sx * sx / n_h) / n_h) AS w_h
        FROM strata
    ), ideal AS (
        SELECT event_type, n_h, s_h,
               {NEYMAN_SAMPLE_N} * w_h / SUM(w_h) OVER () AS exact_n
        FROM wts
    ), alloc AS (
        SELECT event_type, n_h, s_h,
               FLOOR(exact_n) AS base, exact_n - FLOOR(exact_n) AS frac
        FROM ideal
    ), lo AS (
        SELECT *, {NEYMAN_SAMPLE_N} - SUM(base) OVER () AS leftover FROM alloc
    )
    SELECT event_type, n_h, ROUND(s_h, 6) AS s_h,
           CAST(base + CASE WHEN ROW_NUMBER() OVER (ORDER BY frac DESC, event_type)
                              <= leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc
    FROM lo
    """,
    tags=("agg", "sampling-design", "neyman", "stratified"),
)
def q_agg_neyman_allocation(spark, sf_dir):
    """Neyman-optimal stratified sample allocation: split a budget of
    1000 samples across event-type strata proportionally to N_h·S_h
    (stratum size × stratum spread), integerized by largest-remainder so
    the allocations sum EXACTLY to the budget — the design table
    q_sample_stratified would consume upstream, and the same
    penny-exact apportionment shape as q_agg_proration.

    Determinism: stratum variance comes from exact decimal Σx/Σx² (one
    sqrt on identical doubles), and the largest-remainder ranking sorts
    identical doubles with an event_type tie-break. Scale shape: one
    map-side-combined shuffle to |strata| rows; the allocation window
    runs over single-digit rows.
    """
    ev = t(spark, sf_dir, "events")
    v4 = dec("value", 18, 4)
    strata = ev.groupBy("event_type").agg(
        F.count("*").alias("n_h"),
        F.sum(v4).cast("double").alias("sx"),
        F.sum(v4 * v4).cast("double").alias("sxx"),
    )
    s_h = F.sqrt(
        (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n_h")) / F.col("n_h")
    )
    wts = strata.select("event_type", "n_h", s_h.alias("s_h"), (F.col("n_h") * s_h).alias("w_h"))
    wall = W.partitionBy()
    ideal = NEYMAN_SAMPLE_N * F.col("w_h") / F.sum("w_h").over(wall)
    alloc = wts.select(
        "event_type",
        "n_h",
        "s_h",
        F.floor(ideal).alias("base"),
        (ideal - F.floor(ideal)).alias("frac"),
        (NEYMAN_SAMPLE_N - F.sum(F.floor(ideal)).over(wall)).alias("leftover"),
    )
    rk = F.row_number().over(
        W.partitionBy().orderBy(F.col("frac").desc(), "event_type")
    )
    return alloc.select(
        "event_type",
        "n_h",
        F.round("s_h", 6).alias("s_h"),
        (
            F.col("base") + F.when(rk <= F.col("leftover"), 1).otherwise(0)
        ).cast("long").alias("alloc"),
    )


# Two-sided alpha=5% / power=80% normal quantiles, fixed as literals so both
# engines compute the identical closed form (no cross-engine erf).
POWER_Z_ALPHA = 1.959963985
POWER_Z_BETA = 0.8416212336
POWER_MDE_REL = 0.05  # detect a 5% lift of the stratum mean


@query(
    "q_events_power_analysis",
    oracle=f"""
    WITH strata AS (
        SELECT event_type, COUNT(*) AS n_users_obs,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(value AS DECIMAL(18,4))
                        * CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sxx
        FROM events GROUP BY event_type
    )
    SELECT event_type, n_users_obs,
           ROUND(sx / n_users_obs, 6) AS mean_value,
           ROUND((sxx - sx * sx / n_users_obs) / n_users_obs, 6) AS var_value,
           CAST(CEIL(
             2 * ({POWER_Z_ALPHA} + {POWER_Z_BETA}) * ({POWER_Z_ALPHA} + {POWER_Z_BETA})
               * ((sxx - sx * sx / n_users_obs) / n_users_obs)
               / (({POWER_MDE_REL} * sx / n_users_obs)
                  * ({POWER_MDE_REL} * sx / n_users_obs))
           ) AS BIGINT) AS required_n_per_arm
    FROM strata
    """,
    tags=("events", "abtest", "power-analysis", "experiment-design"),
)
def q_events_power_analysis(spark, sf_dir):
    """A/B test power analysis: per event type, the sample size each arm
    needs to detect a 5% lift of the mean value at α=5% (two-sided) with
    80% power — n = 2(z_α/2+z_β)²σ²/δ². The design-stage complement to
    q_events_abtest (the readout) and q_events_cuped (the variance
    reducer whose benefit is exactly a smaller σ² in this formula).

    Normal quantiles are fixed literals (no cross-engine erf); σ² and
    the mean come from exact decimal Σx/Σx², so the ceil() argument is
    the identical double in both engines. One map-side-combined shuffle
    to |types| rows.
    """
    ev = t(spark, sf_dir, "events")
    v4 = dec("value", 18, 4)
    strata = ev.groupBy("event_type").agg(
        F.count("*").alias("n_users_obs"),
        F.sum(v4).cast("double").alias("sx"),
        F.sum(v4 * v4).cast("double").alias("sxx"),
    )
    mean = F.col("sx") / F.col("n_users_obs")
    var = (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n_users_obs")) / F.col(
        "n_users_obs"
    )
    z2 = (POWER_Z_ALPHA + POWER_Z_BETA) * (POWER_Z_ALPHA + POWER_Z_BETA)
    delta = POWER_MDE_REL * mean
    return strata.select(
        "event_type",
        "n_users_obs",
        F.round(mean, 6).alias("mean_value"),
        F.round(var, 6).alias("var_value"),
        F.ceil(2 * z2 * var / (delta * delta)).cast("long").alias(
            "required_n_per_arm"
        ),
    )


BFS_MAX_HOPS = 3


@query(
    "q_graph_bfs_hops",
    oracle=f"""
    WITH RECURSIVE items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), half AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ), edges AS (
        SELECT u, v FROM half UNION ALL SELECT v AS u, u AS v FROM half
    ), seed AS (
        SELECT MIN(u) AS s FROM edges
    ), reach(node, hops) AS (
        SELECT s, 0 FROM seed
        UNION
        SELECT e.v, r.hops + 1
        FROM reach r JOIN edges e ON e.u = r.node
        WHERE r.hops < {BFS_MAX_HOPS}
    )
    SELECT node AS part, MIN(hops) AS hops FROM reach GROUP BY node
    """,
    tags=("graph", "bfs", "traversal", "iterative"),
)
def q_graph_bfs_hops(spark, sf_dir):
    """Bounded BFS: minimum hop distance (≤3) from a deterministic seed
    part through the support≥2 co-purchase graph — the traversal
    primitive under "related products within N hops" and blast-radius
    queries, and the level-synchronous sibling of the connected-
    components operator (operators/clusters.py). Oracle: the same
    frontier expansion as a WITH RECURSIVE closure (the declarative twin
    q_sql_recursive_cte pins for hierarchies).

    Scale shape: each of the ≤3 rounds is one frontier⋈edges hash join
    keyed on the node id plus an anti-join against the settled set, with
    localCheckpoint between rounds to cut the exponential plan (the
    clusters.py lesson). Frontiers are node-scale, never edge-scale;
    the edge build is the one Σbasket² self-join, shared shape with
    q_agg_copurchase.
    """
    li = t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    half = (
        a.join(b, "ok")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= 2)
        .select("u", "v")
    )
    edges = half.unionByName(
        half.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=True)
    seed = edges.agg(F.min("u").alias("part")).select(
        "part", F.lit(0).alias("hops")
    )
    settled = seed.localCheckpoint(eager=True)
    frontier = settled
    for hop in range(1, BFS_MAX_HOPS + 1):
        nxt = (
            frontier.join(edges, frontier["part"] == edges["u"])
            .select(F.col("v").alias("part"))
            .distinct()
            .join(settled.select("part"), "part", "left_anti")
            .select("part", F.lit(hop).alias("hops"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        settled = settled.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return settled


@query(
    "q_events_did",
    # All four cells are exact integer (cents, user counts); the split
    # day is integer arithmetic on the observed range, so both engines
    # bin identically; the only floats are the four cell means and the
    # final estimate, each rounded 6dp.
    oracle="""
    WITH bounds AS (
        SELECT (MIN(CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT))
              + MAX(CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT))
              + 1) // 2 AS split_d
        FROM events
    ), purch AS (
        SELECT user_id % 2 AS treat,
               CASE WHEN CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
                         >= b.split_d THEN 1 ELSE 0 END AS post,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
               user_id
        FROM events, bounds b WHERE event_type = 'purchase'
    ), cells AS (
        SELECT treat, post,
               CAST(SUM(cents) AS BIGINT) AS cents,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM purch GROUP BY 1, 2
    ), wide AS (
        SELECT
          MAX(CASE WHEN treat = 1 AND post = 1 THEN CAST(cents AS DOUBLE) / n_users END) AS t_post,
          MAX(CASE WHEN treat = 1 AND post = 0 THEN CAST(cents AS DOUBLE) / n_users END) AS t_pre,
          MAX(CASE WHEN treat = 0 AND post = 1 THEN CAST(cents AS DOUBLE) / n_users END) AS c_post,
          MAX(CASE WHEN treat = 0 AND post = 0 THEN CAST(cents AS DOUBLE) / n_users END) AS c_pre
        FROM cells
    )
    SELECT ROUND(t_pre, 6) AS treat_pre, ROUND(t_post, 6) AS treat_post,
           ROUND(c_pre, 6) AS control_pre, ROUND(c_post, 6) AS control_post,
           ROUND((t_post - t_pre) - (c_post - c_pre), 6) AS did_cents
    FROM wide
    """,
    tags=("events", "did", "experimentation", "causal"),
)
def q_events_did(spark, sf_dir):
    """Difference-in-differences estimator — the quasi-experimental
    workhorse when randomization is impossible, completing the
    experimentation suite (q_events_abtest z-test, q_events_cuped,
    q_events_uplift_qini, q_events_power_analysis): per-user purchase
    revenue, treatment = the deterministic user_id%2 split, periods =
    pre/post the midpoint day of the observed range ((min+max+1)//2 —
    integer arithmetic both engines bin identically), estimate =
    (T_post − T_pre) − (C_post − C_pre) of per-active-user mean cents.
    Parallel-trends inputs (the four cell means) ship alongside the
    estimate, which is how an analyst actually validates a DiD readout.

    Scale shape: ONE hash aggregate over the purchase slice into 4
    cells (count-distinct users inside the cell aggregate), a scalar
    min/max pass for the split day — no windows, no joins, no
    user-level intermediate survives the shuffle."""
    ev = t(spark, sf_dir, "events")
    d = F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).cast("long")
    bounds = ev.agg(
        ((F.min(d) + F.max(d) + 1) / 2).cast("long").alias("split_d")
    )
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(bounds))
        .select(
            (F.col("user_id") % 2).alias("treat"),
            F.when(d >= F.col("split_d"), 1).otherwise(0).alias("post"),
            (dec("value") * 100).cast("long").alias("cents"),
            "user_id",
        )
    )
    cells = purch.groupBy("treat", "post").agg(
        F.sum("cents").alias("cents"),
        F.count_distinct("user_id").alias("n_users"),
    )
    mean = F.col("cents").cast("double") / F.col("n_users")
    wide = cells.agg(
        F.max(F.when((F.col("treat") == 1) & (F.col("post") == 1), mean)).alias("t_post"),
        F.max(F.when((F.col("treat") == 1) & (F.col("post") == 0), mean)).alias("t_pre"),
        F.max(F.when((F.col("treat") == 0) & (F.col("post") == 1), mean)).alias("c_post"),
        F.max(F.when((F.col("treat") == 0) & (F.col("post") == 0), mean)).alias("c_pre"),
    )
    return wide.select(
        F.round("t_pre", 6).alias("treat_pre"),
        F.round("t_post", 6).alias("treat_post"),
        F.round("c_pre", 6).alias("control_pre"),
        F.round("c_post", 6).alias("control_post"),
        F.round(
            (F.col("t_post") - F.col("t_pre")) - (F.col("c_post") - F.col("c_pre")), 6
        ).alias("did_cents"),
    )


def _lpa_oracle(iters: int = 3) -> str:
    steps = []
    for k in range(1, iters + 1):
        steps.append(
            f"""v{k} AS (
        SELECT e.src AS node, l.label, COUNT(*) AS cnt
        FROM edges e JOIN l{k - 1} l ON l.node = e.dst
        GROUP BY e.src, l.label
    ), l{k} AS (
        SELECT node, label FROM (
            SELECT node, label,
                   ROW_NUMBER() OVER (PARTITION BY node ORDER BY cnt DESC, label) AS rn
            FROM v{k}
        ) WHERE rn = 1
    )"""
        )
    chain = ", ".join(steps)
    return f"""
    WITH items AS (
        SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ), pairs AS (
        SELECT DISTINCT a.pk AS src, b.pk AS dst
        FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
    ), edges AS (
        SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs
    ), l0 AS (
        SELECT DISTINCT src AS node, src AS label FROM edges
    ), {chain}
    SELECT label AS community, COUNT(*) AS n_nodes, MIN(node) AS min_node,
           CAST(SUM(node) AS BIGINT) AS node_sum
    FROM l{iters} GROUP BY label
    """


@query(
    "q_graph_label_propagation",
    oracle=_lpa_oracle(),
    tags=("graph", "community", "label-propagation"),
)
def q_graph_label_propagation(spark, sf_dir):
    """Community detection by SYNCHRONOUS label propagation (Raghavan
    et al. 2007, the GraphX/GraphFrames `labelPropagation` semantics)
    over the co-purchase graph: every node starts as its own label;
    each round it adopts its neighbors' most frequent label, ties
    broken by smallest label — fully deterministic, unlike the
    asynchronous variant. Three fixed rounds (the standard
    few-iteration regime: LPA either converges almost immediately or
    oscillates), then community rollup. Completes the graph family
    (degrees/triangles/pagerank/CC/BFS/link-prediction) with its
    community-structure member.

    Scale shape: per round, the label frame (one row per node) joins
    the checkpointed edge list BROADCAST (map-side, no edge shuffle),
    the (node,label) vote count is a combinable hash aggregate, and the
    argmax is a second combinable aggregate via max_by over the
    (cnt, −label) struct — NO sort window anywhere (the row_number
    formulation cost ~9s warm at sf0.1; this shape runs ~1s). When the
    node set outgrows the broadcast threshold, dropping the hint falls
    back to a sort-merge join on dst — the label frame is always the
    small side by |V| vs |E|. The oracle unrolls the same three rounds
    as chained CTEs."""
    li = t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src"))
    b = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    # symmetrize, then persist the edges CLUSTERED BY src (guide §2.4
    # "two operations keyed the same way share one exchange"): the
    # per-round vote join broadcasts the label frame, so the streamed
    # edge side keeps this src partitioning through the join and the
    # src→node alias, and BOTH round aggregates — groupBy(node=src,
    # label) and groupBy(node) — are satisfied by it. Net: the three
    # rounds plan with ZERO exchanges (was 2 shuffles of the 2.4M-row
    # vote frame per round; verified in plans/r11). persist, not
    # localCheckpoint: under AQE a checkpointed RDD reports
    # UnknownPartitioning, which silently re-inserts both shuffles —
    # the cached plan keeps hashpartitioning(src) (measured). This is
    # the standard src-clustered adjacency layout a 100 TB graph job
    # persists anyway; released per query by the harness.
    from ..operators._cache import persist_tracked

    edges = persist_tracked(
        pairs.unionByName(
            pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).repartition("src")
    )
    labels = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(3):
        votes = edges.join(
            F.broadcast(labels.withColumnRenamed("node", "dst")), "dst"
        ).select(F.col("src").alias("node"), "label")
        labels = (
            votes.groupBy("node", "label")
            .agg(F.count("*").alias("cnt"))
            .groupBy("node")
            .agg(
                F.max_by(
                    "label",
                    F.struct(F.col("cnt").alias("c"), (-F.col("label")).alias("nl")),
                ).alias("label")
            )
            # truncate lineage per round (the pagerank pattern): the label
            # frame is |V|-sized, so the checkpoint is cheap, and it keeps
            # each round's broadcast from re-optimizing the whole chain
            .localCheckpoint()
        )
    return labels.groupBy(F.col("label").alias("community")).agg(
        F.count("*").alias("n_nodes"),
        F.min("node").alias("min_node"),
        F.sum("node").alias("node_sum"),
    )


@query(
    "q_ts_ewma_irregular",
    # The gap-aware recursion is REPLAYED exactly (the q_ts_holt
    # discipline): alpha_i = dt/(dt+30) uses only IEEE-correctly-rounded
    # ops (int->double cast, +, /), and the update
    # level += alpha*(x - level) is written with the same association in
    # both engines, so states agree bit-for-bit before round_even(…,6).
    oracle="""
    WITH RECURSIVE hist AS (
        SELECT o_custkey AS c, o_orderkey AS ok,
               CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                    AS BIGINT) AS d,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS x
        FROM orders
    ), seq AS (
        SELECT c, ok, d, x,
               ROW_NUMBER() OVER (PARTITION BY c ORDER BY d, ok) AS rn
        FROM hist
    ), r AS (
        SELECT c, ok, rn, d, x, CAST(0 AS BIGINT) AS dt, x AS level
        FROM seq WHERE rn = 1
        UNION ALL
        SELECT s.c, s.ok, s.rn, s.d, s.x, s.d - r.d AS dt,
               r.level + (CAST(s.d - r.d AS DOUBLE)
                          / (CAST(s.d - r.d AS DOUBLE) + 30.0))
                         * (s.x - r.level) AS level
        FROM r JOIN seq s ON s.c = r.c AND s.rn = r.rn + 1
    )
    SELECT c AS o_custkey, ok AS o_orderkey, d AS epoch_day, dt,
           FLOOR(x * 1000000) / 1000000 AS x,
           FLOOR(level * 1000000) / 1000000 AS level
    FROM r
    """,
    tags=("timeseries", "ewma", "irregular", "smoothing"),
)
def q_ts_ewma_irregular(spark, sf_dir):
    """Irregular-gap exponential smoothing of each customer's order-value
    series — the time-decay feature real event streams need (orders
    arrive at arbitrary intervals, so a constant-alpha EWMA like
    q_win_ewma over-weights bursts). Per gap of dt days the smoother
    moves by alpha(dt) = dt/(dt+30): ~dt/30 for short gaps, →1 for long
    ones (the rational-decay kernel). exp(-dt/tau) is deliberately NOT
    used: libm exp() is not guaranteed correctly rounded, so it cannot
    hash-check across engines, while +,-,*,/ and int→double casts are
    IEEE-exact — the alpha here keeps the whole recursion bit-identical
    (see q_ts_holt). The EMISSION is floor-truncated at 6 decimals
    (``floor(v*1e6)/1e6`` in both engines), NOT rounded: dyadic alphas
    (dt=34 → 34/64) can land the recursion exactly on decimal
    midpoints, and numpy's scale-rint-unscale round(6) disagrees with
    DuckDB's round_even within 1 ulp of the .5 boundary (the round-8
    red driver row: custkey 1484 / orderkey 12570, 24303.5878125).
    Floor of the identical IEEE double is engine-invariant — the same
    discipline as q_ts_interpolate.

    Scale shape: ONE hash shuffle on customer + a within-partition sort,
    then a partition-level STATE MACHINE in mapInPandas: rows stream by
    in (customer, day, orderkey) order and a plain scalar loop resets the
    level at each customer boundary — state survives Arrow batch
    boundaries, so there is no per-group dispatch at all (the
    applyInPandas formulation paid ~milliseconds of pandas overhead per
    customer × 10⁴ customers; this shape costs one sequential scan per
    partition and is how a 10⁹-customer deployment would run it). The
    oracle's RECURSIVE CTE advances all customers in lockstep."""
    import pandas as pd

    hist = t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c"),
        F.col("o_orderkey").alias("ok"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("d"),
        dec("o_totalprice").cast("double").alias("x"),
    )
    part = hist.repartition("c").sortWithinPartitions("c", "d", "ok")

    def smooth_partition(batches):
        import math

        prev_c = None
        prev_d = 0
        level = 0.0
        for pdf in batches:
            cs = pdf["c"].to_numpy()
            ds = pdf["d"].to_numpy()
            xs = pdf["x"].to_numpy()
            dts = [0] * len(pdf)
            levels = [0.0] * len(pdf)
            xs_out = [0.0] * len(pdf)
            for i in range(len(pdf)):
                c_i = int(cs[i])
                x_i = float(xs[i])
                d_i = int(ds[i])
                if c_i != prev_c:
                    dt = 0
                    level = x_i
                else:
                    dt = d_i - prev_d
                    alpha = float(dt) / (float(dt) + 30.0)
                    level = level + alpha * (x_i - level)
                dts[i] = dt
                # floor-truncate, never round: engine-invariant on the
                # identical IEEE double (see docstring / q_ts_interpolate).
                levels[i] = math.floor(level * 1000000.0) / 1000000.0
                xs_out[i] = math.floor(x_i * 1000000.0) / 1000000.0
                prev_c, prev_d = c_i, d_i
            yield pd.DataFrame(
                {
                    "o_custkey": pdf["c"],
                    "o_orderkey": pdf["ok"],
                    "epoch_day": pdf["d"],
                    "dt": dts,
                    "x": xs_out,
                    "level": levels,
                }
            )

    return part.mapInPandas(
        smooth_partition,
        "o_custkey long, o_orderkey long, epoch_day long, dt long, "
        "x double, level double",
    )


MSPRT_TAU2 = 0.0001  # mixture variance (tau=0.01, the expected effect scale)


@query(
    "q_events_msprt",
    oracle=f"""
    WITH daily AS (
        SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
               CAST(user_id % 2 AS BIGINT) AS treat,
               COUNT(*) AS n,
               COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS conv
        FROM events GROUP BY 1, 2
    ), cum AS (
        SELECT d, treat,
               CAST(SUM(n) OVER w AS BIGINT) AS cn,
               CAST(SUM(conv) OVER w AS BIGINT) AS cc
        FROM daily
        WINDOW w AS (PARTITION BY treat ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), j AS (
        SELECT t.d, t.cn AS nt, t.cc AS ct, c.cn AS nc, c.cc AS cc
        FROM (SELECT * FROM cum WHERE treat = 1) t
        JOIN (SELECT * FROM cum WHERE treat = 0) c USING (d)
    ), stat AS (
        SELECT d, nt, nc, ct, cc,
               (CAST(ct AS DOUBLE) / nt) - (CAST(cc AS DOUBLE) / nc) AS s,
               ((CAST(ct + cc AS DOUBLE) / (nt + nc))
                * (CAST(1 AS DOUBLE) - CAST(ct + cc AS DOUBLE) / (nt + nc)))
               * ((CAST(1 AS DOUBLE) / nt) + (CAST(1 AS DOUBLE) / nc)) AS v
        FROM j
    ), lam AS (
        SELECT d, nt, nc, ct, cc,
               sqrt(v / (v + {MSPRT_TAU2}))
                 * exp(s * s * {MSPRT_TAU2} / (2 * v * (v + {MSPRT_TAU2}))) AS l
        FROM stat WHERE v > 0
    )
    SELECT d AS epoch_day, nt, nc, ct, cc,
           round(l, 6) AS lambda_n,
           round(LEAST(CAST(1 AS DOUBLE),
                 MIN(CAST(1 AS DOUBLE) / l) OVER (ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
               AS always_valid_p
    FROM lam
    """,
    tags=("events", "experimentation", "msprt", "always-valid", "sequential"),
)
def q_events_msprt(spark, sf_dir):
    """Always-valid sequential A/B inference (mixture SPRT, Johari et
    al. 2017 "Peeking at A/B tests"): per day, the cumulative two-sample
    proportion statistic feeds the normal-mixture likelihood ratio
    Λ_n = sqrt(V/(V+τ²))·exp(S²τ²/(2V(V+τ²))), and the always-valid
    p-value is the running min of 1/Λ — the quantity that lets an
    experimenter PEEK every day without inflating false positives,
    completing the experimentation suite (fixed-horizon z-test, CUPED,
    power, Qini, DiD) with its sequential member.

    Exactness: all counts are exact-int window cumsums; S and V are
    derived with an identical parenthesized op sequence in both engines,
    so the sqrt/exp inputs are bit-identical and the rounded outputs
    hash-match (the KN-scorer precedent for transcendentals on identical
    doubles; no integer decision is derived from exp, which is what made
    the qini-decile case dangerous).

    Scale shape: one combinable (day, arm) aggregate over the scan, then
    windows over the |days|-size frame — peeking infrastructure costs
    one rollup regardless of corpus size."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("d"),
        (F.col("user_id") % 2).cast("long").alias("treat"),
    ).agg(
        F.count("*").alias("n"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("conv"),
    )
    wc = W.partitionBy("treat").orderBy("d").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    cum = daily.select(
        "d",
        "treat",
        F.sum("n").over(wc).cast("long").alias("cn"),
        F.sum("conv").over(wc).cast("long").alias("cc"),
    )
    tside = cum.filter(F.col("treat") == 1).select(
        "d", F.col("cn").alias("nt"), F.col("cc").alias("ct")
    )
    cside = cum.filter(F.col("treat") == 0).select(
        "d", F.col("cn").alias("nc"), F.col("cc").alias("cc")
    )
    j = tside.join(cside, "d")
    pool = (F.col("ct") + F.col("cc")).cast("double") / (
        F.col("nt") + F.col("nc")
    )
    s = (F.col("ct").cast("double") / F.col("nt")) - (
        F.col("cc").cast("double") / F.col("nc")
    )
    v = (pool * (F.lit(1.0) - pool)) * (
        (F.lit(1.0) / F.col("nt")) + (F.lit(1.0) / F.col("nc"))
    )
    T = F.lit(MSPRT_TAU2)
    stat = j.select("d", "nt", "nc", "ct", "cc", s.alias("s"), v.alias("v"))
    lam = stat.filter(F.col("v") > 0).select(
        "d",
        "nt",
        "nc",
        "ct",
        "cc",
        (
            F.sqrt(F.col("v") / (F.col("v") + T))
            * F.exp(
                F.col("s") * F.col("s") * T
                / (2 * F.col("v") * (F.col("v") + T))
            )
        ).alias("l"),
    )
    wp = W.orderBy("d").rowsBetween(W.unboundedPreceding, W.currentRow)
    return lam.select(
        F.col("d").alias("epoch_day"),
        "nt",
        "nc",
        "ct",
        "cc",
        F.round("l", 6).alias("lambda_n"),
        F.round(
            F.least(F.lit(1.0), F.min(F.lit(1.0) / F.col("l")).over(wp)), 6
        ).alias("always_valid_p"),
    )
