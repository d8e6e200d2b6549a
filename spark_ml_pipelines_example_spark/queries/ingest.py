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


# Near-dup incremental probe: corpus-side shingle DF cap (same constant and
# rationale as queries/dedup.py JACCARD_DF_CAP) and Jaccard admit threshold.
NEARDUP_DF_CAP = 256
NEARDUP_THRESHOLD = 0.3


@query(
    "q_dedup_incremental_neardup",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang, source, string_split(text, ' ') AS tk FROM documents
    ), sh_all AS (
        SELECT DISTINCT doc_id, lang, source, g FROM (
            SELECT doc_id, lang, source,
                   UNNEST(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])) AS g
            FROM toks)
    ), corpus AS (
        SELECT * FROM sh_all WHERE doc_id % {INCREMENT_MOD} <> {INCREMENT_REMAINDER}
    ), batch AS (
        SELECT * FROM sh_all WHERE doc_id % {INCREMENT_MOD} = {INCREMENT_REMAINDER}
    ), hot AS (
        SELECT lang, source, g FROM corpus
        GROUP BY lang, source, g HAVING COUNT(*) > {NEARDUP_DF_CAP}
    ), corpus_k AS (
        SELECT corpus.* FROM corpus ANTI JOIN hot USING (lang, source, g)
    ), batch_k AS (
        SELECT batch.* FROM batch ANTI JOIN hot USING (lang, source, g)
    ), c_sizes AS (
        SELECT doc_id, COUNT(*) AS n FROM corpus_k GROUP BY doc_id
    ), b_sizes AS (
        SELECT doc_id, COUNT(*) AS n FROM batch_k GROUP BY doc_id
    ), shared AS (
        SELECT b.doc_id AS batch_doc, c.doc_id AS corpus_doc, COUNT(*) AS n_shared
        FROM corpus_k c JOIN batch_k b
          ON c.lang = b.lang AND c.source = b.source AND c.g = b.g
        GROUP BY 1, 2
    ), jac AS (
        SELECT batch_doc, corpus_doc, n_shared,
               CAST(n_shared AS DOUBLE) / (cs.n + bs.n - n_shared) AS j
        FROM shared
        JOIN c_sizes cs ON corpus_doc = cs.doc_id
        JOIN b_sizes bs ON batch_doc = bs.doc_id
        WHERE CAST(n_shared AS DOUBLE) / (cs.n + bs.n - n_shared) >= {NEARDUP_THRESHOLD}
    )
    , best AS (
        SELECT batch_doc, n_matches, best_match_doc, ROUND(best_j, 6) AS best_jaccard
        FROM (
            SELECT batch_doc, corpus_doc AS best_match_doc, j AS best_j,
                   COUNT(*) OVER (PARTITION BY batch_doc) AS n_matches,
                   ROW_NUMBER() OVER (PARTITION BY batch_doc ORDER BY j DESC, corpus_doc) AS rn
            FROM jac
        ) WHERE rn = 1
    )
    SELECT d.doc_id AS batch_doc, d.lang,
           COALESCE(b.n_matches, 0) AS n_matches,
           b.best_match_doc, b.best_jaccard,
           CASE WHEN b.batch_doc IS NULL THEN 'admit' ELSE 'reject' END AS verdict
    FROM (SELECT doc_id, lang FROM documents
          WHERE doc_id % {INCREMENT_MOD} = {INCREMENT_REMAINDER}) d
    LEFT JOIN best b ON d.doc_id = b.batch_doc
    """,
    tags=("dedup", "incremental", "jaccard", "training-data"),
)
def q_dedup_incremental_neardup(spark, sf_dir):
    """Incremental NEAR-dup probe: an ingest batch checked against the
    standing corpus's materialized shingle index by exact bigram Jaccard —
    the recurring-crawl twin of q_dedup_ngram_jaccard (whole-corpus) and
    q_dedup_incremental (exact fingerprints). The probe never shuffles the
    index: the index is staged to parquet once (shingles + per-doc sizes,
    hot stopword shingles already DF-capped out at build time), the batch
    shingle set is broadcast against it, and the only shuffled rows are
    the match stream (batch_doc, corpus_doc) pairs and the matched docs'
    size lookups — both proportional to the batch, not the corpus. The
    result is the full admit/reject verdict table: one row per batch doc
    with its match count and best standing match (ties broken by min
    corpus doc) — exactly the evidence an append job acts on, and a
    hash check over the whole batch (including the zero-match docs)
    rather than just the usually-tiny reject set."""
    index_base = scratch_dir("q_dedup_incremental_neardup", sf_dir)
    d = t(spark, sf_dir, "documents")
    batch_docs = d.filter(F.col("doc_id") % INCREMENT_MOD == INCREMENT_REMAINDER)
    build_neardup_index(
        spark, d.filter(F.col("doc_id") % INCREMENT_MOD != INCREMENT_REMAINDER), index_base
    )
    matched = neardup_probe(spark, index_base, batch_docs)
    return (
        batch_docs.select(F.col("doc_id").alias("batch_doc"), "lang")
        .join(F.broadcast(matched), "batch_doc", "left")
        .select(
            "batch_doc",
            "lang",
            F.coalesce("n_matches", F.lit(0)).alias("n_matches"),
            "best_match_doc",
            "best_jaccard",
            F.when(F.col("best_match_doc").isNull(), "admit")
            .otherwise("reject")
            .alias("verdict"),
        )
    )


def _doc_shingles(docs):
    """Distinct word-bigram shingles per doc, spread on doc_id first (a
    one-file input otherwise tokenizes in a single task)."""
    from ..functions.text import bigrams, tokens

    return docs.repartition(32, "doc_id").select(
        "doc_id",
        "lang",
        "source",
        F.explode(F.array_distinct(bigrams(tokens("text")))).alias("g"),
    )


def build_neardup_index(spark, corpus_docs, index_base: str) -> None:
    """Materialize the standing near-dup index: DF-capped shingles,
    per-doc shingle sizes, and the hot (stopword) shingle set — the three
    artifacts every future batch probe reads map-side. One-off here; at
    scale maintained incrementally (admitted batches append their
    shingles and sizes)."""
    corpus = _doc_shingles(corpus_docs)
    hot = (
        corpus.groupBy("lang", "source", "g")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > NEARDUP_DF_CAP)
        .select("lang", "source", "g")
    )
    corpus_k = corpus.join(F.broadcast(hot), ["lang", "source", "g"], "left_anti")
    corpus_k.write.mode("overwrite").parquet(f"{index_base}/shingles")
    (
        spark.read.parquet(f"{index_base}/shingles")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"))
        .write.mode("overwrite")
        .parquet(f"{index_base}/sizes")
    )
    hot.write.mode("overwrite").parquet(f"{index_base}/hot")


def neardup_probe(spark, index_base: str, batch_docs):
    """Probe a batch of documents against the staged index. Every join is
    broadcast (batch shingles, hot set, size lookups) — the index is only
    ever scanned map-side; shuffled rows are proportional to the batch.
    Returns one row per matched batch doc: match count + best match with
    deterministic tie-break."""
    batch = _doc_shingles(batch_docs)
    idx = spark.read.parquet(f"{index_base}/shingles")
    idx_sizes = spark.read.parquet(f"{index_base}/sizes")
    hot_staged = spark.read.parquet(f"{index_base}/hot")
    batch_k = batch.join(F.broadcast(hot_staged), ["lang", "source", "g"], "left_anti")
    b_sizes = batch_k.groupBy("doc_id").agg(F.count("*").alias("n"))

    shared = (
        idx.join(
            F.broadcast(batch_k.select(F.col("doc_id").alias("batch_doc"), "lang", "source", "g")),
            ["lang", "source", "g"],
        )
        .groupBy("batch_doc", F.col("doc_id").alias("corpus_doc"))
        .agg(F.count("*").alias("n_shared"))
    )
    jac = (
        shared.join(
            F.broadcast(idx_sizes.select(F.col("doc_id").alias("corpus_doc"), F.col("n").alias("cn"))),
            "corpus_doc",
        )
        .join(
            F.broadcast(b_sizes.select(F.col("doc_id").alias("batch_doc"), F.col("n").alias("bn"))),
            "batch_doc",
        )
        .withColumn(
            "j",
            F.col("n_shared").cast("double")
            / (F.col("cn") + F.col("bn") - F.col("n_shared")),
        )
        .filter(F.col("j") >= NEARDUP_THRESHOLD)
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("batch_doc")
    ranked = jac.select(
        "batch_doc",
        F.col("corpus_doc").alias("best_match_doc"),
        F.col("j").alias("best_j"),
        F.count("*").over(w).alias("n_matches"),
        F.row_number()
        .over(w.orderBy(F.col("j").desc(), F.col("corpus_doc")))
        .alias("rn"),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "batch_doc", "n_matches", "best_match_doc", F.round("best_j", 6).alias("best_jaccard")
    )
