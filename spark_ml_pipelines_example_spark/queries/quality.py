"""Corpus-quality operators a pretraining data pipeline runs before
training: repetition scoring (the Gopher/MassiveText signal family) and
benchmark-contamination detection (n-gram overlap against an eval set).

Scale posture: repetition is explode → per-doc hash aggregate (one
shuffle on doc_id); contamination joins the corpus' shingles against the
DISTINCT shingles of a benchmark set that is tiny by construction
(eval suites are thousands of docs, the corpus is billions), so Spark
broadcasts it and the scan-side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.text import ngrams, tokens
from ._util import t
from .registry import query

# Repetition flags (Gopher-style): a doc is repetitive when its most
# frequent bigram covers >20% of all bigram positions, or when fewer than
# 30% of its tokens are distinct.
TOP_BIGRAM_FRAC_MAX = 0.2
DISTINCT_TOKEN_FRAC_MIN = 0.3

# Contamination shingle width. Real decontamination uses 8-13 token
# shingles; the fixture's ~40-word vocabulary makes 8-grams vanishingly
# rare across docs (0 hits at sf0.01), so 4 marks genuine reuse here —
# the knob, not the shape, changes at production vocabulary sizes.
CONTAM_NGRAM = 4
# Synthetic "benchmark" set: every 100th doc stands in for an eval suite.
BENCH_MOD = 100


@query(
    "q_text_repetition",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents
    ), grams AS (
        SELECT doc_id, g, COUNT(*) AS c FROM (
            SELECT doc_id,
                   UNNEST(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])) AS g
            FROM toks)
        GROUP BY doc_id, g
    ), rep AS (
        SELECT doc_id, MAX(c) AS top_bigram, SUM(c) AS n_bigrams
        FROM grams GROUP BY doc_id
    )
    SELECT t.doc_id, t.lang,
           len(tk) AS n_tokens,
           ROUND(CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk), 6) AS distinct_token_frac,
           ROUND(CAST(r.top_bigram AS DOUBLE) / r.n_bigrams, 6) AS top_bigram_frac,
           (CAST(r.top_bigram AS DOUBLE) / r.n_bigrams <= {TOP_BIGRAM_FRAC_MAX}
            AND CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk) >= {DISTINCT_TOKEN_FRAC_MIN})
               AS keep
    FROM toks t JOIN rep r ON t.doc_id = r.doc_id
    """,
    tags=("text", "quality", "repetition", "training-data"),
)
def q_text_repetition(spark, sf_dir):
    """Per-doc repetition signals: distinct-token fraction and the share of
    bigram positions taken by the single most frequent bigram, plus the
    keep/drop verdict at the Gopher-style thresholds.

    Zero-shuffle shape: the most-frequent-bigram count is the longest run
    in the doc's SORTED bigram array, computed by a single ``aggregate``
    fold per document — so the whole query is a narrow projection. The
    explode → groupBy(doc_id, gram) → groupBy(doc_id) → join formulation
    this replaced shuffled every bigram occurrence as a string row and
    measured 11× slower at sf0.1 (3.2s → 0.28s); per-doc state (a ~300-
    element array) never needs a distributed aggregate. Spread on doc_id
    only to parallelize the scan from a one-file input."""
    d = t(spark, sf_dir, "documents").repartition(32, "doc_id")
    tk = tokens("text")
    grams_sorted = F.array_sort(ngrams(tk, 2))
    # longest run of equal adjacent elements == max bigram frequency
    top_bigram = F.aggregate(
        grams_sorted,
        F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    top_frac = top_bigram.cast("double") / F.size(grams_sorted)
    dist_frac = F.round(F.size(F.array_distinct(tk)) / F.size(tk), 6)
    return d.select(
        "doc_id",
        "lang",
        F.size(tk).alias("n_tokens"),
        dist_frac.alias("distinct_token_frac"),
        F.round(top_frac, 6).alias("top_bigram_frac"),
        ((top_frac <= TOP_BIGRAM_FRAC_MAX) & (dist_frac >= DISTINCT_TOKEN_FRAC_MIN)).alias(
            "keep"
        ),
    )


# Mixture composition: fraction of each source block to keep when
# assembling a training mix. Deterministic (no RNG): docs are ranked
# within their source by md5(doc_id) — a fixed pseudo-random order both
# engines compute identically — and each source keeps its quota.
MIX_FRACTIONS = {"src0": 1.0, "src1": 0.5, "src2": 0.25}
MIX_DEFAULT_FRACTION = 0.1


@query(
    "q_mix_sources",
    oracle=f"""
    WITH ranked AS (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk,
               COUNT(*) OVER (PARTITION BY source) AS n_src
        FROM documents
    ), quota AS (
        SELECT *,
               CAST(FLOOR(n_src * CASE source
                   WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.5 WHEN 'src2' THEN 0.25
                   ELSE {MIX_DEFAULT_FRACTION} END + 0.5) AS BIGINT) AS keep_n
        FROM ranked
    )
    SELECT source, COUNT(*) AS n_kept, MIN(doc_id) AS first_kept,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM quota WHERE rk <= keep_n
    GROUP BY source
    """,
    tags=("text", "quality", "mixture", "training-data"),
)
def q_mix_sources(spark, sf_dir):
    """Training-mix composition: keep a per-source fraction of documents
    (upweighted sources keep more), chosen DETERMINISTICALLY by ranking
    docs within each source on md5(doc_id) — reproducible across engines
    and runs, unlike RNG sampling (q_sample_stratified covers the seeded-
    RNG flavor). One window over the source partitioning, no shuffle
    beyond it; the per-source summary makes the result compact."""
    from pyspark.sql import Window as W

    d = t(spark, sf_dir, "documents")
    frac = F.when(F.col("source") == "src0", 1.0)
    for src, fr in list(MIX_FRACTIONS.items())[1:]:
        frac = frac.when(F.col("source") == src, fr)
    frac = frac.otherwise(MIX_DEFAULT_FRACTION)
    w = W.partitionBy("source")
    ranked = d.select(
        "doc_id",
        "source",
        F.row_number()
        .over(w.orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id"))
        .alias("rk"),
        F.count("*").over(w).alias("n_src"),
        frac.alias("frac"),
    )
    kept = ranked.filter(
        F.col("rk") <= F.floor(F.col("n_src") * F.col("frac") + 0.5).cast("long")
    )
    return kept.groupBy("source").agg(
        F.count("*").alias("n_kept"),
        F.min("doc_id").alias("first_kept"),
        F.sum("doc_id").cast("long").alias("id_sum"),
    )


@query(
    "q_text_contamination",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS tk FROM documents
    ), shingles AS (
        SELECT DISTINCT doc_id, g FROM (
            SELECT doc_id,
                   UNNEST(list_transform(range(1, len(tk) - {CONTAM_NGRAM - 2}),
                          i -> array_to_string(tk[i:i+{CONTAM_NGRAM - 1}], ' '))) AS g
            FROM toks WHERE len(tk) >= {CONTAM_NGRAM})
    ), bench AS (
        SELECT DISTINCT g FROM shingles WHERE doc_id % {BENCH_MOD} = 0
    )
    SELECT s.doc_id, COUNT(*) AS n_hits
    FROM shingles s JOIN bench b ON s.g = b.g
    WHERE s.doc_id % {BENCH_MOD} <> 0
    GROUP BY s.doc_id
    """,
    tags=("text", "quality", "contamination", "training-data"),
)
def q_text_contamination(spark, sf_dir):
    """Eval-set decontamination: corpus docs sharing any CONTAM_NGRAM-token shingle
    with the benchmark set (every 100th doc as a stand-in eval suite),
    with the count of distinct shared shingles. The benchmark's distinct
    shingles are broadcast — eval suites are tiny next to a pretraining
    corpus, so the corpus side never shuffles for the probe.

    Spread on doc_id before the shingle explode: a one-file input
    otherwise runs the whole tokenize+shingle scan in one task (the
    per-doc-id hash layout also feeds the final per-doc aggregate)."""
    d = t(spark, sf_dir, "documents").repartition(32, "doc_id")
    sh = d.select(
        "doc_id", F.explode(F.array_distinct(ngrams(tokens("text"), CONTAM_NGRAM))).alias("g")
    )
    bench = (
        sh.filter(F.col("doc_id") % BENCH_MOD == 0).select("g").distinct()
    )
    return (
        sh.filter(F.col("doc_id") % BENCH_MOD != 0)
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )
