"""Ingest-side operators: the text-lines source format and incremental
(batch-over-snapshot) dedup — the daily-ingest half of corpus curation.

Scale posture: the text roundtrip is a narrow write + scan (no shuffle);
incremental dedup joins the increment against the snapshot's DISTINCT
fingerprints on the hash key — one shuffle each side, and at 100 TB the
snapshot side is typically bucketed by fingerprint so re-ingest probes
are co-located (no snapshot reshuffle per batch).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ._util import scratch_dir, t
from .registry import query


@query(
    "q_scan_text_lines",
    oracle="""
    SELECT COUNT(*) AS n_lines,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(SUM(len(text)) AS BIGINT) AS char_sum
    FROM documents
    """,
    tags=("scan", "sink", "text"),
)
def q_scan_text_lines(spark, sf_dir):
    """Text-lines sink + source roundtrip (the fifth format next to
    parquet/csv/json/orc): documents written as tab-joined lines via the
    `text` writer, read back with ``spark.read.text``, parsed, and
    checksummed against the original table — proving the line codec is
    lossless for this corpus (fixture text contains no tabs/newlines).
    The parse is a split projection in codegen; no shuffle until the
    final single-row aggregate."""
    out = scratch_dir("q_scan_text_lines", sf_dir)
    d = t(spark, sf_dir, "documents")
    d.select(
        F.concat_ws("\t", F.col("doc_id").cast("string"), F.col("text")).alias("value")
    ).write.mode("overwrite").text(out)
    lines = spark.read.text(out)
    # the first tab separates id from text; the text itself is tab-free
    parsed = lines.select(
        F.substring_index(F.col("value"), "\t", 1).cast("long").alias("doc_id"),
        F.expr("substring(value, instr(value, '\t') + 1)").alias("text"),
    )
    return parsed.agg(
        F.count("*").alias("n_lines"),
        F.sum("doc_id").cast("long").alias("id_sum"),
        F.sum(F.length("text")).cast("long").alias("char_sum"),
    )


# Increment definition: every 7th doc plays the "today's batch" role; the
# rest are the standing snapshot. Fingerprints reuse q_dedup_exact's
# normalization so the two operators agree on what "same document" means.
INCREMENT_MOD = 7
INCREMENT_REMAINDER = 3


@query(
    "q_dedup_incremental",
    oracle=f"""
    WITH fp AS (
        SELECT doc_id, lang, md5(lower(trim(text))) AS fp FROM documents
    ), snapshot AS (
        SELECT DISTINCT fp FROM fp WHERE doc_id % {INCREMENT_MOD} <> {INCREMENT_REMAINDER}
    ), increment AS (
        SELECT * FROM fp WHERE doc_id % {INCREMENT_MOD} = {INCREMENT_REMAINDER}
    )
    SELECT i.lang,
           COUNT(*) AS n_docs,
           COUNT(CASE WHEN s.fp IS NOT NULL THEN 1 END) AS n_dup,
           CAST(SUM(CASE WHEN s.fp IS NULL THEN i.doc_id END) AS BIGINT) AS new_id_sum
    FROM increment i LEFT JOIN snapshot s ON i.fp = s.fp
    GROUP BY i.lang
    """,
    tags=("dedup", "incremental", "training-data"),
)
def q_dedup_incremental(spark, sf_dir):
    """Incremental dedup: probe an ingest batch against the standing
    corpus snapshot by exact fingerprint, keeping only unseen docs — the
    operation every recurring crawl runs before appending. Left join on
    the snapshot's distinct fingerprints (hash equi-join; snapshot
    bucketed by fp in production so each batch probe avoids reshuffling
    the big side), then a per-lang admit/reject summary whose id-sum
    pins exact membership."""
    d = t(spark, sf_dir, "documents")
    fp = d.select("doc_id", "lang", F.md5(F.lower(F.trim(F.col("text")))).alias("fp"))
    snapshot = (
        fp.filter(F.col("doc_id") % INCREMENT_MOD != INCREMENT_REMAINDER)
        .select("fp")
        .distinct()
        .withColumn("seen", F.lit(1))
    )
    increment = fp.filter(F.col("doc_id") % INCREMENT_MOD == INCREMENT_REMAINDER)
    return (
        increment.join(snapshot, "fp", "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.count("seen").alias("n_dup"),
            F.sum(F.when(F.col("seen").isNull(), F.col("doc_id")))
            .cast("long")
            .alias("new_id_sum"),
        )
    )


# Funnel step window: a purchase within 1 hour of the user's first click.
FUNNEL_WINDOW_S = 3600


@query(
    "q_win_funnel",
    oracle=f"""
    WITH clicks AS (
        SELECT user_id, MIN(ts) AS first_click FROM events
        WHERE event_type = 'click' GROUP BY user_id
    ), conv AS (
        SELECT c.user_id,
               MAX(CASE WHEN e.event_type = 'purchase'
                         AND e.ts >= c.first_click
                         AND e.ts <= c.first_click + INTERVAL 1 HOUR
                        THEN 1 ELSE 0 END) AS converted
        FROM clicks c JOIN events e ON e.user_id = c.user_id
        GROUP BY c.user_id
    )
    SELECT COUNT(*) AS n_clicked,
           CAST(SUM(converted) AS BIGINT) AS n_converted,
           ROUND(CAST(SUM(converted) AS DOUBLE) / COUNT(*), 6) AS conv_rate
    FROM conv
    """,
    tags=("window", "funnel", "events"),
)
def q_win_funnel(spark, sf_dir):
    """Event funnel: users whose first click is followed by a purchase
    within one hour. First-click per user is a map-side-combinable min
    aggregate; the conversion probe joins events back on user_id (the
    same shuffle key), so the whole funnel costs two shuffles on
    user_id at any scale. Single-row conversion summary."""
    ev = t(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    conv = (
        ev.join(clicks, "user_id")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= F.col("first_click"))
                    & (F.col("ts") <= F.col("first_click") + F.expr("INTERVAL 1 HOUR")),
                    1,
                ).otherwise(0)
            ).alias("converted")
        )
    )
    return conv.agg(
        F.count("*").alias("n_clicked"),
        F.sum("converted").cast("long").alias("n_converted"),
        F.round(F.sum("converted") / F.count("*"), 6).alias("conv_rate"),
    )


@query(
    "q_seq_pattern_match",
    oracle="""
    WITH j AS (
        SELECT user_id,
               COUNT(*) AS n_events,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS journey
        FROM events GROUP BY user_id
    )
    SELECT user_id, n_events,
           regexp_matches(journey, 'signup.*click.*purchase') AS has_funnel,
           md5(journey) AS journey_hash
    FROM j
    """,
    tags=("sequence", "pattern", "funnel"),
)
def q_seq_pattern_match(spark, sf_dir):
    """Sequence-pattern detection (the MATCH_RECOGNIZE shape Spark lacks):
    per user, assemble the exact event-type journey in (ts, event_id)
    order and regex-match the ordered subsequence signup → … → click →
    … → purchase. The md5 of the journey string pins the full per-user
    ordering, so the hash check proves ordered-aggregation correctness,
    not just the boolean.

    Scale shape: one hash shuffle on user_id; collect_list + array_sort
    keeps the sort LOCAL to each group (no global sort, no window over
    the whole event log). State per key is the user's event history —
    for unbounded histories, sessionize first (q_stream_session) so the
    journey is bounded per session."""
    ev = t(spark, sf_dir, "events")
    journey = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
            lambda s: s["event_type"],
        ),
        ">",
    )
    return (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n_events"), journey.alias("journey"))
        .select(
            "user_id",
            "n_events",
            F.col("journey").rlike("signup.*click.*purchase").alias("has_funnel"),
            F.md5("journey").alias("journey_hash"),
        )
    )
