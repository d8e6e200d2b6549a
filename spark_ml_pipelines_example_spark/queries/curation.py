"""Corpus-curation operators: PII scrubbing, a first-fail quality-filter
cascade, deterministic global shuffle (training order), and a unigram-LM
surprisal score (perplexity-proxy filtering).

These are the steps a pretraining pipeline runs between raw ingest and
tokenization. Scale posture, per operator:

- PII scrub is pure per-row regexp inside whole-stage codegen — no
  shuffle, no UDF, scan-bound at any scale.
- The filter cascade is one projection over per-row signals (again no
  shuffle); the verdict CASE evaluates rules in priority order so each
  doc reports its FIRST failing gate, which is what an audit wants.
- Global shuffle orders by a hash of the key, not by data order —
  a total order both engines can reproduce, and at cluster scale a
  hash-range sort is one exchange (Spark's range partitioner) instead of
  the RNG+collect shuffles naive implementations use.
- Unigram surprisal joins each token against the corpus vocabulary;
  vocabularies are tiny relative to any corpus (even web-scale counts
  fit in MBs after min-count pruning), so the join side is broadcast and
  the corpus side never shuffles for it.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.text import STOPWORDS, tokens
from ._util import scratch_dir, t
from .registry import query

# ---------------------------------------------------------------------------
# PII scrubbing. The fixture corpus is synthetic lowercase prose with no
# real PII, so the operator derives a deterministic "dirty" contact blurb
# from customer fields — the patterns, replacement order, and counting
# are exactly what production scrubbing does on real text.

_EMAIL_RE = r"[a-z0-9]+@[a-z0-9.]+"
_PHONE_RE = r"\+1-555-[0-9]{4}"
_IP_RE = r"10\.0\.[0-9]{1,3}\.[0-9]{1,3}"

_DIRTY_SQL = (
    "concat('contact ', c_name, ' at user', c_custkey, '@mail.example.com "
    "or +1-555-', lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0'), "
    "' from 10.0.', CAST(c_custkey % 256 AS VARCHAR), '.', "
    "CAST((c_custkey * 7) % 256 AS VARCHAR))"
)


@query(
    "q_text_pii_scrub",
    oracle=f"""
    WITH dirty AS (
        SELECT c_custkey, {_DIRTY_SQL} AS raw FROM customer
    )
    SELECT c_custkey,
           len(regexp_extract_all(raw, '{_EMAIL_RE}')) AS n_email,
           len(regexp_extract_all(raw, '{_PHONE_RE}')) AS n_phone,
           len(regexp_extract_all(raw, '{_IP_RE}')) AS n_ip,
           regexp_replace(
               regexp_replace(
                   regexp_replace(raw, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                   '{_PHONE_RE}', '<PHONE>', 'g'),
               '{_IP_RE}', '<IP>', 'g') AS scrubbed
    FROM dirty
    """,
    tags=("text", "pii", "scrub", "training-data"),
)
def q_text_pii_scrub(spark, sf_dir):
    """PII redaction: count and replace emails, phone numbers, and IPv4
    addresses in a deterministic dirty-text column derived from customer
    rows. Replacement is ordered (email → phone → ip) so overlapping
    patterns resolve identically in both engines. Pure codegen'd
    regexps — the scrub of a 100 TB corpus is scan-bound, zero shuffles."""
    c = t(spark, sf_dir, "customer")
    raw = F.concat(
        F.lit("contact "),
        F.col("c_name"),
        F.lit(" at user"),
        F.col("c_custkey").cast("string"),
        F.lit("@mail.example.com or +1-555-"),
        F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
        F.lit(" from 10.0."),
        (F.col("c_custkey") % 256).cast("string"),
        F.lit("."),
        ((F.col("c_custkey") * 7) % 256).cast("string"),
    )
    dirty = c.select("c_custkey", raw.alias("raw"))
    scrub = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("raw"), _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ),
        _IP_RE,
        "<IP>",
    )
    def n_matches(pat: str):
        # idx=0 (whole match): Spark's regexp_extract_all defaults to
        # group 1, which errors on group-free patterns.
        return F.size(F.regexp_extract_all(F.col("raw"), F.lit(pat), F.lit(0)))

    return dirty.select(
        "c_custkey",
        n_matches(_EMAIL_RE).alias("n_email"),
        n_matches(_PHONE_RE).alias("n_phone"),
        n_matches(_IP_RE).alias("n_ip"),
        scrub.alias("scrubbed"),
    )


# ---------------------------------------------------------------------------
# Quality-filter cascade. Thresholds are tuned so every gate fires on the
# fixture (measured at sf0.01: too_short 43, stopword_low 24,
# stopword_high 2, repetitive ~80, keep the rest of 500).

MIN_TOKENS = 20
STOPWORD_MIN = 0.08
STOPWORD_MAX = 0.30
DISTINCT_FRAC_MIN = 0.35

_SW_LIST = ",".join(f"'{w}'" for w in STOPWORDS)


@query(
    "q_text_filter_cascade",
    oracle=f"""
    WITH m AS (
        SELECT doc_id, lang, len(tk) AS n_tokens,
               CAST(len(list_filter(tk, x -> x IN ({_SW_LIST}))) AS DOUBLE) / len(tk) AS sw,
               CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk) AS df
        FROM (SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents)
    )
    SELECT doc_id, lang, n_tokens,
           ROUND(sw, 6) AS stopword_frac,
           ROUND(df, 6) AS distinct_frac,
           CASE WHEN n_tokens < {MIN_TOKENS} THEN 'too_short'
                WHEN sw < {STOPWORD_MIN} THEN 'stopword_low'
                WHEN sw > {STOPWORD_MAX} THEN 'stopword_high'
                WHEN df < {DISTINCT_FRAC_MIN} THEN 'repetitive'
                ELSE 'keep' END AS verdict
    FROM m
    """,
    tags=("text", "quality", "cascade", "training-data"),
)
def q_text_filter_cascade(spark, sf_dir):
    """First-fail quality gate: each document reports the first rule it
    violates (length → stopword band → repetition) or 'keep'. One
    projection, no shuffle — the whole cascade rides the scan, and at
    100 TB the verdict column partitions the corpus for downstream
    routing without a second pass."""
    d = t(spark, sf_dir, "documents")
    tk = tokens("text")
    sw = F.size(F.filter(tk, lambda x: x.isin(*STOPWORDS))) / F.size(tk)
    df = F.size(F.array_distinct(tk)) / F.size(tk)
    n = F.size(tk)
    verdict = (
        F.when(n < MIN_TOKENS, "too_short")
        .when(sw < STOPWORD_MIN, "stopword_low")
        .when(sw > STOPWORD_MAX, "stopword_high")
        .when(df < DISTINCT_FRAC_MIN, "repetitive")
        .otherwise("keep")
    )
    return d.select(
        "doc_id",
        "lang",
        n.alias("n_tokens"),
        F.round(sw, 6).alias("stopword_frac"),
        F.round(df, 6).alias("distinct_frac"),
        verdict.alias("verdict"),
    )


# ---------------------------------------------------------------------------
# Deterministic global shuffle (training order).

SHUFFLE_BUCKET = 50


@query(
    "q_shuffle_global",
    oracle=f"""
    WITH ordered AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS pos
        FROM documents
    )
    SELECT CAST((pos - 1) // {SHUFFLE_BUCKET} AS BIGINT) AS bucket,
           COUNT(*) AS n,
           MIN(doc_id) AS min_doc,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(SUM(pos * doc_id) AS BIGINT) AS order_check
    FROM ordered GROUP BY 1
    """,
    tags=("text", "shuffle", "training-data"),
)
def q_shuffle_global(spark, sf_dir):
    """Deterministic global shuffle for training order: every doc gets a
    position by ranking on md5(doc_id) — a reproducible pseudo-random
    permutation, unlike RNG shuffles that change across runs/engines.
    The result summarizes each SHUFFLE_BUCKET-sized slice with an
    order-sensitive checksum (sum(pos*doc_id)) so the hash check pins
    the *entire permutation*, not just membership.

    A global ``row_number() OVER (ORDER BY …)`` would serialize the
    whole corpus through ONE task — the repartition(1) anti-pattern.
    Instead this uses the scalable two-phase global index: range-
    partition + local sort on the hash key (one exchange, uniform by
    construction), per-partition row index from
    ``monotonically_increasing_id``'s low 33 bits, then add each
    partition's start offset (a tiny per-partition count, broadcast
    back). Same positions, no serial stage — the pattern holds at any
    corpus size."""
    n_parts = 32
    d = t(spark, sf_dir, "documents")
    sorted_df = (
        d.select("doc_id", F.md5(F.col("doc_id").cast("string")).alias("h"))
        .repartitionByRange(n_parts, "h", "doc_id")
        .sortWithinPartitions("h", "doc_id")
        .select(
            "doc_id",
            F.spark_partition_id().alias("pid"),
            # mid = pid * 2^33 + row-index-within-partition (sorted order)
            (F.monotonically_increasing_id() % F.lit(1 << 33)).alias("rk"),
        )
    )
    # localCheckpoint, NOT a releasable persist: the rk column comes from
    # monotonically_increasing_id over a range partitioning whose sampling
    # can differ across recomputes, and the collected offsets below are
    # baked into the returned plan. A cache eviction (or a
    # release_tracked() from any other code path) would recompute rk under
    # a different partitioning while the stale offsets still join —
    # silently corrupting the permutation. Checkpointing materializes the
    # frame and CUTS lineage, so recompute is impossible by construction.
    sorted_df = sorted_df.localCheckpoint()
    counts = {r["pid"]: r["n"] for r in sorted_df.groupBy("pid").agg(F.count("*").alias("n")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_df = F.broadcast(
        spark.createDataFrame(
            [(pid, off) for pid, off in offsets.items()], "pid int, offset long"
        )
    )
    ordered = sorted_df.join(off_df, "pid").select(
        "doc_id", (F.col("offset") + F.col("rk") + 1).alias("pos")
    )
    return (
        ordered.select(
            (((F.col("pos") - 1) / SHUFFLE_BUCKET).cast("bigint")).alias("bucket"),
            "doc_id",
            "pos",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("doc_id").alias("min_doc"),
            F.sum("doc_id").cast("long").alias("id_sum"),
            F.sum(F.col("pos") * F.col("doc_id")).cast("long").alias("order_check"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic train/val/test split by content hash. Splitting on a hash
# of the KEY (not RNG) is what keeps splits leakage-safe and stable: a doc
# lands in the same split on every run, every engine, every re-ingest, so
# val/test never bleed into train across pipeline versions. Boundaries are
# hex-prefix ranges of md5 (lexicographic — identical in any engine):
# 'cc...' ≈ 80%, 'e6...' ≈ 10%, rest ≈ 10%.

SPLIT_TRAIN_MAX = "cc"
SPLIT_VAL_MAX = "e6"


@query(
    "q_split_hash",
    oracle=f"""
    WITH tagged AS (
        SELECT doc_id, lang,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= '{SPLIT_TRAIN_MAX}'
                      THEN 'train'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= '{SPLIT_VAL_MAX}'
                      THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    )
    SELECT split, lang, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM tagged GROUP BY split, lang
    """,
    tags=("text", "split", "training-data"),
)
def q_split_hash(spark, sf_dir):
    """Deterministic hash split: assign each doc to train/val/test by the
    hex prefix of md5(doc_id) — reproducible across engines and runs
    (unlike randomSplit, whose assignment changes with partitioning), so
    eval sets stay fixed while the corpus grows. Pure projection + one
    aggregate; the per-(split, lang) id_sum pins exact membership for
    the hash check."""
    d = t(spark, sf_dir, "documents")
    h2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(h2 <= SPLIT_TRAIN_MAX, "train")
        .when(h2 <= SPLIT_VAL_MAX, "val")
        .otherwise("test")
    )
    return (
        d.select("doc_id", "lang", split.alias("split"))
        .groupBy("split", "lang")
        .agg(F.count("*").alias("n"), F.sum("doc_id").cast("long").alias("id_sum"))
    )


# ---------------------------------------------------------------------------
# Unigram-LM surprisal (perplexity-proxy quality score).

SURPRISAL_FLAG = -4.0


@query(
    "q_text_unigram_logprob",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, lang, UNNEST(string_split(text, ' ')) AS tok
        FROM documents
    ), vocab AS (
        SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok
    ), tot AS (
        SELECT CAST(SUM(c) AS DOUBLE) AS total FROM vocab
    )
    SELECT t.doc_id,
           ANY_VALUE(t.lang) AS lang,
           COUNT(*) AS n_tokens,
           ROUND(AVG(ln(v.c / tot.total)), 6) AS avg_logprob,
           (AVG(ln(v.c / tot.total)) < {SURPRISAL_FLAG}) AS flagged
    FROM tok t JOIN vocab v ON t.tok = v.tok CROSS JOIN tot
    GROUP BY t.doc_id
    """,
    tags=("text", "quality", "lm", "training-data"),
)
def q_text_unigram_logprob(spark, sf_dir):
    """Unigram language-model surprisal per document: train token
    probabilities on the corpus itself (the classic cheap perplexity
    proxy), then score each doc by its mean log-probability and flag the
    surprising tail. The vocabulary aggregate is tiny (pruned vocabs fit
    in MBs even at web scale) so it broadcasts; the corpus-side explode →
    per-doc aggregate is one map-side-combinable shuffle on doc_id."""
    d = t(spark, sf_dir, "documents")
    tok = d.select("doc_id", "lang", F.explode(tokens("text")).alias("tok"))
    vocab = tok.groupBy("tok").agg(F.count("*").alias("c"))
    total = float(
        vocab.agg(F.sum("c").cast("double").alias("t")).collect()[0]["t"]
    )  # one scalar: the corpus token count (driver-side by design)
    lp = F.log(F.col("c") / F.lit(total))
    return (
        tok.join(F.broadcast(vocab), "tok")
        .groupBy("doc_id")
        .agg(
            F.any_value("lang").alias("lang"),
            F.count("*").alias("n_tokens"),
            F.round(F.avg(lp), 6).alias("avg_logprob"),
            (F.avg(lp) < SURPRISAL_FLAG).alias("flagged"),
        )
    )


# Per-domain document cap (crawl-curation classic): a single domain may
# contribute at most this many documents, best-first. Absolute, like the
# shingle DF cap — the bound must not grow with the corpus.
DOMAIN_CAP = 20


@query(
    "q_text_domain_cap",
    oracle=f"""
    WITH urls AS (
        SELECT doc_id, lang, n_chars,
               'https://' || source || '.example.com/docs/' || doc_id AS url
        FROM documents
    ), parsed AS (
        SELECT doc_id, lang, n_chars,
               regexp_extract(url, '^https?://([^/]+)/', 1) AS domain,
               regexp_extract(url, '^https?://[^/]+(/[^?#]*)', 1) AS path
        FROM urls
    ), ranked AS (
        SELECT doc_id, lang, domain, path, n_chars,
               ROW_NUMBER() OVER (PARTITION BY domain
                                  ORDER BY n_chars DESC, doc_id) AS rk
        FROM parsed
    )
    SELECT domain,
           COUNT(*) AS n_kept,
           CAST(SUM(doc_id) AS BIGINT) AS kept_id_sum,
           CAST(SUM(n_chars) AS BIGINT) AS kept_chars
    FROM ranked WHERE rk <= {DOMAIN_CAP}
    GROUP BY domain
    """,
    tags=("text", "domain-cap", "url", "training-data"),
)
def q_text_domain_cap(spark, sf_dir):
    """Per-domain document caps — the crawl-curation step that stops one
    hostname from dominating the training mix. Documents get a synthetic
    URL from their source (the fixture has no url column), the domain
    comes out via ``parse_url`` (JVM-side URL parsing — HOST/PATH
    extraction without regex in the engine path), docs rank within their
    domain best-first (longer docs win, doc_id tie-break), and only the
    top DOMAIN_CAP survive. One window over the domain partition — at
    100 TB the domain key is the natural partitioner and no domain's
    slice exceeds cap-bounded state. Output is the per-domain admit
    summary with id-sum pinning exact membership."""
    from pyspark.sql import Window as W

    d = t(spark, sf_dir, "documents").withColumn(
        "url",
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.com/docs/"),
            F.col("doc_id"),
        ),
    )
    parsed = d.select(
        "doc_id",
        "lang",
        "n_chars",
        F.parse_url("url", F.lit("HOST")).alias("domain"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
    )
    rk = F.row_number().over(
        W.partitionBy("domain").orderBy(F.col("n_chars").desc(), "doc_id")
    )
    return (
        parsed.withColumn("rk", rk)
        .filter(F.col("rk") <= DOMAIN_CAP)
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("doc_id").cast("long").alias("kept_id_sum"),
            F.sum("n_chars").cast("long").alias("kept_chars"),
        )
    )


@query(
    "q_fn_winsorize",
    oracle="""
    WITH bounds AS (
        SELECT l_returnflag,
               quantile_cont(l_extendedprice, 0.05) AS lo,
               quantile_cont(l_extendedprice, 0.95) AS hi
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           COUNT(*) AS n,
           COUNT(CASE WHEN l_extendedprice < lo THEN 1 END) AS n_clipped_lo,
           CAST(SUM(CAST(GREATEST(LEAST(l_extendedprice, hi), lo) AS DECIMAL(18,2)))
                AS DOUBLE) AS winsorized_sum,
           COUNT(CASE WHEN l_extendedprice > hi THEN 1 END) AS n_clipped_hi
    FROM lineitem l JOIN bounds b ON l.l_returnflag = b.l_returnflag
    GROUP BY l.l_returnflag
    """,
    tags=("fn", "winsorize", "quality", "training-data"),
)
def q_fn_winsorize(spark, sf_dir):
    """Quantile winsorization per group — outlier clipping before feature
    normalization: exact p5/p95 bounds per returnflag (Spark
    ``percentile`` ≡ DuckDB ``quantile_cont``), values clamped into
    [lo, hi], clipped-row counts reported. Two aggregations over the same
    shuffle key and a broadcast of the per-group bounds — the clip itself
    is pure codegen. (At 100 TB you'd swap the exact percentile for
    approx_percentile and keep everything else; the exact version is what
    hash-checks cross-engine.)"""
    li = t(spark, sf_dir, "lineitem")
    bounds = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.05)").alias("lo"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("hi"),
    )
    clipped = F.greatest(F.least(F.col("l_extendedprice"), F.col("hi")), F.col("lo"))
    return (
        li.join(F.broadcast(bounds), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.count(F.when(F.col("l_extendedprice") < F.col("lo"), 1)).alias(
                "n_clipped_lo"
            ),
            F.sum(clipped.cast("decimal(18,2)")).cast("double").alias("winsorized_sum"),
            F.count(F.when(F.col("l_extendedprice") > F.col("hi"), 1)).alias(
                "n_clipped_hi"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Bigram-LM surprisal: the second-order upgrade of q_text_unigram_logprob.

BIGRAM_K = 0.5  # add-k smoothing
BIGRAM_FLAG = -3.43  # ~p5 of the score distribution at sf0.001-0.1


@query(
    "q_text_bigram_lm",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    bg AS (
        SELECT doc_id, u.w1 AS w1, u.w2 AS w2 FROM (
            SELECT doc_id,
                   UNNEST(list_transform(range(1, len(tk)),
                          i -> struct_pack(w1 := tk[i], w2 := tk[i + 1]))) AS u
            FROM toks)
    ),
    bgc AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
    ugc AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY 1),
    vocab AS (SELECT CAST(COUNT(DISTINCT tok) AS DOUBLE) AS v
              FROM (SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents))
    SELECT b.doc_id, COUNT(*) AS n_bigrams,
           ROUND(AVG(ln((c.c12 + {BIGRAM_K}) / (g.c1 + {BIGRAM_K} * vocab.v))), 6)
               AS avg_logprob2,
           (AVG(ln((c.c12 + {BIGRAM_K}) / (g.c1 + {BIGRAM_K} * vocab.v)))
               < {BIGRAM_FLAG}) AS flagged
    FROM bg b
    JOIN bgc c ON b.w1 = c.w1 AND b.w2 = c.w2
    JOIN ugc g ON b.w1 = g.w1
    CROSS JOIN vocab
    GROUP BY b.doc_id
    """,
    tags=("text", "quality", "lm", "bigram", "training-data"),
)
def q_text_bigram_lm(spark, sf_dir):
    """Bigram language-model surprisal with add-k smoothing:
    P(w2|w1) = (c(w1,w2)+k) / (c(w1)+k·V), each document scored by its
    mean log-probability over bigram positions — the second-order
    perplexity proxy (catches locally-fluent-but-globally-odd text the
    unigram score misses). Count model: ONE shuffle builds the bigram
    count table; the prefix counts DERIVE from it (c1 = Σ_w2 c12 — a
    rollup of the |bigram types| frame, not a second pass over the
    corpus; Catalyst reuses the bigram exchange). Scoring re-joins the
    bigram stream to its counts on the (w1,w2) key (shuffle — the
    bigram table is NOT broadcast-safe at corpus scale) with the much
    smaller prefix table broadcast. V is one driver-side scalar (same
    pattern as the unigram total). Measured (round 7, interleaved warm
    A/B): derive-from-bgc is a wash at sf0.1 (0.87 vs 0.95 s — the
    31-token fixture vocab makes the saved pass trivial) and wins at
    the 10× probe corpus (5.79 vs 5.97 s), growing with the
    corpus-to-vocab ratio — at 100 TB the saved pass is a full corpus
    re-tokenization."""
    d = t(spark, sf_dir, "documents")
    tk = tokens("text")
    pairs = F.zip_with(
        F.slice(tk, 1, F.size(tk) - 1),
        F.slice(tk, 2, F.size(tk) - 1),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
    )
    bg = d.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", "p.w1", "p.w2"
    )
    bgc = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    ugc = bgc.groupBy("w1").agg(F.sum("c12").alias("c1"))
    # V rides IN the plan as a broadcast 1-row aggregate (same change as
    # _kn_doc_scores' n_types): the eager count was a separate
    # full-corpus re-tokenization job per invocation
    vtot = (
        d.select(F.explode(tk).alias("tok"))
        .distinct()
        .agg(F.count("*").cast("double").alias("v"))
    )
    lp = F.log(
        (F.col("c12") + BIGRAM_K) / (F.col("c1") + BIGRAM_K * F.col("v"))
    )
    return (
        bg.join(bgc, ["w1", "w2"])
        .join(F.broadcast(ugc), "w1")
        .crossJoin(F.broadcast(vtot))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(lp), 6).alias("avg_logprob2"),
            (F.avg(lp) < BIGRAM_FLAG).alias("flagged"),
        )
    )


KN_DISCOUNT = 0.75  # the standard absolute-discount constant


@query(
    "q_text_kneser_ney",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    bg AS (
        SELECT doc_id, u.w1 AS w1, u.w2 AS w2 FROM (
            SELECT doc_id,
                   UNNEST(list_transform(range(1, len(tk)),
                          i -> struct_pack(w1 := tk[i], w2 := tk[i + 1]))) AS u
            FROM toks)
    ),
    bgc AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
    ugc AS (SELECT w1, CAST(COUNT(*) AS DOUBLE) AS c1,
                   CAST(COUNT(DISTINCT w2) AS DOUBLE) AS fan1
            FROM bg GROUP BY 1),
    cont AS (SELECT w2, CAST(COUNT(DISTINCT w1) AS DOUBLE) AS cont2
             FROM bg GROUP BY 1),
    tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_types
            FROM (SELECT DISTINCT w1, w2 FROM bg))
    SELECT b.doc_id, COUNT(*) AS n_bigrams,
           ROUND(AVG(ln(
               GREATEST(c.c12 - {KN_DISCOUNT}, 0) / g.c1
               + ({KN_DISCOUNT} * g.fan1 / g.c1) * (k.cont2 / tot.n_types)
           )), 6) AS avg_kn_logprob
    FROM bg b
    JOIN bgc c ON b.w1 = c.w1 AND b.w2 = c.w2
    JOIN ugc g ON b.w1 = g.w1
    JOIN cont k ON b.w2 = k.w2
    CROSS JOIN tot
    GROUP BY b.doc_id
    """,
    tags=("text", "quality", "lm", "kneser-ney", "training-data"),
)
def q_text_kneser_ney(spark, sf_dir):
    """Interpolated Kneser-Ney bigram language model — the standard
    n-gram smoothing (Chen & Goodman 1999) and the quality upgrade over
    q_text_bigram_lm's add-k: P(w2|w1) = max(c12−D,0)/c1 +
    (D·N₁₊(w1·)/c1)·N₁₊(·w2)/N₁₊(··), i.e. absolute discounting plus a
    CONTINUATION-count backoff ("how many contexts does w2 complete",
    not "how often does w2 occur" — the distinction that makes KN score
    'San Francisco'-style collocations correctly). Every term is a
    ratio of exact integer counts with the fixed D=0.75, so both
    engines agree to the rounded 6dp. Count model: ONE hash aggregate
    over the bigram stream (the bigram count table); EVERY other
    statistic derives from that |bigram types| frame — c1 = Σ_w2 c12,
    fan-out N₁₊(w1·) = rows per w1, continuation N₁₊(·w2) = rows per
    w2, N₁₊(··) = its row count — so the corpus is never re-scanned
    for statistics and the count_distinct expand plans disappear
    (round-7 A/B: 8.22 vs 8.82 s at the 10× probe corpus, a wash at
    fixture scale). Scoring re-joins the bigram stream on (w1,w2) with
    the two word-keyed tables broadcast when small, shuffled otherwise
    — identical scale shape to the add-k variant."""
    return _kn_doc_scores(t(spark, sf_dir, "documents"), keys=["doc_id"])


def _kn_doc_scores(d, keys):
    """Per-document interpolated-KN bigram score (see q_text_kneser_ney
    for the model derivation), grouped by ``keys`` — shared by the
    standalone scoring query and the CCNet perplexity bucketing."""
    tk = tokens("text")
    pairs = F.zip_with(
        F.slice(tk, 1, F.size(tk) - 1),
        F.slice(tk, 2, F.size(tk) - 1),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
    )
    bg = d.select(*keys, F.explode(pairs).alias("p")).select(
        *keys, "p.w1", "p.w2"
    )
    bgc = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    ugc = bgc.groupBy("w1").agg(
        F.sum("c12").cast("double").alias("c1"),
        F.count("*").cast("double").alias("fan1"),
    )
    cont = bgc.groupBy("w2").agg(F.count("*").cast("double").alias("cont2"))
    # n_types rides IN the plan as a broadcast 1-row aggregate instead of
    # an eager bgc.count() — the count was a SEPARATE job recomputing the
    # whole bigram aggregate per invocation; in-plan, AQE's exchange
    # reuse shares one bgc build across the join, ugc, cont, and this
    # total. Same scalar (count -> double is exact), same per-row IEEE
    # ops, so scores are bit-identical.
    tot = bgc.agg(F.count("*").cast("double").alias("n_types"))
    D = KN_DISCOUNT
    p_kn = (
        F.greatest(F.col("c12") - D, F.lit(0.0)) / F.col("c1")
        + (D * F.col("fan1") / F.col("c1")) * (F.col("cont2") / F.col("n_types"))
    )
    return (
        bg.join(bgc, ["w1", "w2"])
        .join(F.broadcast(ugc), "w1")
        .join(F.broadcast(cont), "w2")
        .crossJoin(F.broadcast(tot))
        .groupBy(*keys)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(F.log(p_kn)), 6).alias("avg_kn_logprob"),
        )
    )


@query(
    "q_text_url_canonical",
    oracle="""
    WITH messy AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'HTTPS://' ELSE 'https://' END
               || CASE WHEN doc_id % 2 = 0 THEN 'WWW' ELSE 'www' END
               || '.Example.COM/docs/' || (doc_id // 4)
               || CASE WHEN doc_id % 4 = 1 THEN '/' ELSE '' END
               || CASE WHEN doc_id % 5 = 0
                       THEN '?utm_source=feed&utm_campaign=x' ELSE '' END
               || CASE WHEN doc_id % 7 = 0 THEN '#section-2' ELSE '' END
               AS url
        FROM documents
    ), canon AS (
        SELECT doc_id, url,
               lower(regexp_extract(url, '^[hH][tT][tT][pP][sS]?://([^/?#]+)', 1))
               || regexp_replace(
                      regexp_extract(url, '^[hH][tT][tT][pP][sS]?://[^/?#]+([^?#]*)', 1),
                      '/$', '')
               AS canonical
        FROM messy
    )
    SELECT canonical,
           COUNT(*) AS n_urls,
           MIN(doc_id) AS keep_id,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM canon
    GROUP BY canonical
    HAVING COUNT(*) >= 2
    """,
    tags=("text", "url", "canonicalization", "training-data"),
)
def q_text_url_canonical(spark, sf_dir):
    """URL canonicalization + dedup — the crawl-frontier step that stops
    the same page entering the corpus under cosmetic URL variants:
    lowercase scheme/host, strip tracking query params and fragments,
    drop trailing slashes, then cluster on the canonical form (min-id
    keeper). The fixture synthesizes the messy variants (case-mixed
    hosts, utm params, fragments, trailing slash) deterministically
    from doc_id so both engines build identical inputs.

    Scale shape: canonicalization is pure codegen regex (map-only);
    the cluster aggregate is ONE combinable shuffle on the canonical
    URL — same plan as exact text dedup. A real frontier adds
    scheme/port normalization and param allowlists per domain; all of
    it stays map-side.
    """
    d = t(spark, sf_dir, "documents")
    url = F.concat(
        F.when(F.col("doc_id") % 3 == 0, "HTTPS://").otherwise("https://"),
        F.when(F.col("doc_id") % 2 == 0, "WWW").otherwise("www"),
        F.lit(".Example.COM/docs/"),
        F.floor(F.col("doc_id") / 4).cast("string"),
        F.when(F.col("doc_id") % 4 == 1, "/").otherwise(""),
        F.when(F.col("doc_id") % 5 == 0, "?utm_source=feed&utm_campaign=x").otherwise(
            ""
        ),
        F.when(F.col("doc_id") % 7 == 0, "#section-2").otherwise(""),
    )
    messy = d.select("doc_id", url.alias("url"))
    host = F.lower(F.regexp_extract("url", r"^[hH][tT][tT][pP][sS]?://([^/?#]+)", 1))
    path = F.regexp_replace(
        F.regexp_extract("url", r"^[hH][tT][tT][pP][sS]?://[^/?#]+([^?#]*)", 1),
        r"/$",
        "",
    )
    canon = messy.select("doc_id", F.concat(host, path).alias("canonical"))
    return (
        canon.groupBy("canonical")
        .agg(
            F.count("*").alias("n_urls"),
            F.min("doc_id").alias("keep_id"),
            F.sum("doc_id").cast("bigint").alias("id_sum"),
        )
        .filter(F.col("n_urls") >= 2)
    )


# Mixing temperature: weights ∝ n_source^ALPHA. α=1 is proportional
# (no rebalance), α=0 is uniform; 0.5 is the usual multilingual/
# multi-source compromise (rare sources upweighted, but not to parity).
MIX_ALPHA = 0.5


@query(
    "q_curate_mix_temperature",
    oracle=f"""
    WITH counts AS (
        SELECT source, COUNT(*) AS n_src FROM documents GROUP BY 1
    ), weighted AS (
        SELECT source, n_src,
               POWER(CAST(n_src AS DOUBLE), {MIX_ALPHA})
                   / SUM(POWER(CAST(n_src AS DOUBLE), {MIX_ALPHA})) OVER () AS w,
               CAST(SUM(n_src) OVER () AS BIGINT) AS total
        FROM counts
    )
    SELECT source, n_src,
           ROUND(w, 6) AS weight,
           CAST(FLOOR(total * w + 0.5) AS BIGINT) AS quota,
           CAST(FLOOR(total * w + 0.5) AS BIGINT) // n_src AS full_epochs,
           CAST(FLOOR(total * w + 0.5) AS BIGINT) % n_src AS remainder_docs
    FROM weighted
    """,
    tags=("text", "mixture", "temperature", "training-data"),
)
def q_curate_mix_temperature(spark, sf_dir):
    """Temperature-based source re-mixing (the GPT-3/PaLM/Llama data-mix
    step): sampling weights ∝ n_source^α with α={MIX_ALPHA}, rebalanced
    to the original corpus size. Small sources get quota > n_src — the
    plan is 'full_epochs' complete repetitions plus a deterministic
    'remainder_docs' subset (md5-rank, as in q_mix_sources) — which is
    exactly how LLM training data schedules express upsampling (epochs
    per source), not row duplication in storage.

    Scale shape: everything derives from ONE per-source count aggregate;
    the weight normalization and quota arithmetic run over the
    |sources|-row frame. The materialization step (repeat + remainder)
    is a broadcast join of this quota table back into the corpus scan —
    no shuffle of the corpus at all."""
    d = t(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count("*").alias("n_src"))
    w_all = W.partitionBy()
    pw = F.pow(F.col("n_src").cast("double"), MIX_ALPHA)
    weighted = counts.select(
        "source",
        "n_src",
        (pw / F.sum(pw).over(w_all)).alias("w"),
        F.sum("n_src").over(w_all).cast("bigint").alias("total"),
    )
    quota = F.floor(F.col("total") * F.col("w") + 0.5).cast("bigint")
    return weighted.select(
        "source",
        "n_src",
        F.round("w", 6).alias("weight"),
        quota.alias("quota"),
        F.floor(quota / F.col("n_src")).cast("bigint").alias("full_epochs"),
        (quota % F.col("n_src")).alias("remainder_docs"),
    )


@query(
    "q_curate_erasure",
    oracle="""
    SELECT COUNT(*) AS n_after,
           (SELECT COUNT(*) FROM events) AS n_before,
           (SELECT COUNT(*) FROM events WHERE user_id % 97 = 0) AS n_erased,
           COUNT(CASE WHEN user_id % 97 = 0 THEN 1 END) AS n_leaked,
           CAST(SUM(event_id) AS BIGINT) AS id_sum
    FROM events WHERE user_id % 97 <> 0
    """,
    tags=("curation", "erasure", "compliance", "gdpr"),
)
def q_curate_erasure(spark, sf_dir):
    """Right-to-be-forgotten erasure job: a deletion-request set (here
    the user_id % 97 == 0 cohort standing in for a requests table) is
    anti-joined out of the event log, the surviving data is REWRITTEN
    to storage (erasure means bytes gone, not a view filter), and the
    read-back audits itself — requested users remaining (must be 0),
    before/after/erased counts, and a content checksum. The audit
    riding the same result row as the rewrite is the compliance
    pattern: evidence, not trust.

    Scale shape: the request set is broadcast (deletion requests are
    tiny vs the log) so the anti join never shuffles the fact; the
    rewrite is a straight partition-parallel write. On a partitioned
    production table the same job rewrites ONLY partitions containing
    requested users (dynamic overwrite — cf. run_foreach_batch_upsert),
    not the whole log.
    """
    ev = t(spark, sf_dir, "events")
    requests = (
        ev.select("user_id").distinct().filter(F.col("user_id") % 97 == 0)
    )
    erased_path = scratch_dir("q_curate_erasure", sf_dir)
    survivors = ev.join(F.broadcast(requests), "user_id", "left_anti")
    survivors.write.mode("overwrite").parquet(erased_path)

    n_before = ev.count()
    n_erased = ev.join(F.broadcast(requests), "user_id", "left_semi").count()
    back = spark.read.parquet(erased_path)
    return back.agg(
        F.count("*").alias("n_after"),
        F.lit(n_before).cast("bigint").alias("n_before"),
        F.lit(n_erased).cast("bigint").alias("n_erased"),
        F.count(F.when(F.col("user_id") % 97 == 0, 1)).alias("n_leaked"),
        F.sum("event_id").cast("bigint").alias("id_sum"),
    )


# ---------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al. 2023).
# Hashed-unigram bag-of-words LMs for the target and raw distributions;
# docs ranked by estimated log importance weight log p_target/p_raw.

DSIR_BUCKETS = 1024
DSIR_KEEP = 100


@query(
    "q_curate_dsir",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, lang,
               (CAST(('0x' || substr(md5(tok), 9, 8)) AS BIGINT) & 2147483647)
                   % {DSIR_BUCKETS} AS b
        FROM (SELECT doc_id, lang, UNNEST(string_split(text, ' ')) AS tok FROM documents)
    ), db AS (
        SELECT doc_id, lang, b, COUNT(*) AS n FROM tok GROUP BY doc_id, lang, b
    ), counts AS (
        SELECT b, CAST(SUM(n) AS BIGINT) AS c_r,
               CAST(COALESCE(SUM(CASE WHEN lang = 'en' THEN n END), 0) AS BIGINT) AS c_t
        FROM db GROUP BY b
    ), model AS (
        SELECT g.b, COALESCE(c_r, 0) AS c_r, COALESCE(c_t, 0) AS c_t
        FROM (SELECT UNNEST(range(0, {DSIR_BUCKETS})) AS b) g
        LEFT JOIN counts ON counts.b = g.b
    ), tot AS (SELECT SUM(c_r) AS tr, SUM(c_t) AS tt FROM model),
    lr AS (
        SELECT b, ln(c_t + 1) - ln(c_r + 1)
                  + ln((tr + {DSIR_BUCKETS}.0) / (tt + {DSIR_BUCKETS}.0)) AS lr
        FROM model, tot
    ), scored AS (
        SELECT doc_id, ANY_VALUE(lang) AS lang,
               CAST(SUM(n) AS BIGINT) AS n_tokens,
               ROUND(SUM(n * lr.lr), 6) AS log_w
        FROM db JOIN lr ON lr.b = db.b GROUP BY doc_id
    )
    SELECT * FROM scored ORDER BY log_w DESC, doc_id LIMIT {DSIR_KEEP}
    """,
    tags=("curate", "dsir", "importance-sampling", "training-data"),
)
def q_curate_dsir(spark, sf_dir):
    """DSIR — Data Selection via Importance Resampling (Xie et al.
    2023, the data-recipe selector behind many LLM pretraining mixes):
    fit hashed-unigram bag-of-words LMs (md5 buckets, add-1 smoothing)
    on the TARGET distribution (here the English subset, standing in
    for 'looks like Wikipedia') and on the RAW crawl, score every doc
    by its estimated log importance weight Σ n_b·(log p_t[b] −
    log p_r[b]), and keep the deterministic top-K by (rounded weight,
    doc_id). The hashing trick caps both models at a FIXED 1024-bucket
    table regardless of corpus vocabulary — the property that makes
    DSIR train on one node while scoring petabytes.

    Scale shape: ONE 1024-cell combinable aggregate builds both models
    (raw + conditional target counts in the same pass); the scoring join is a broadcast of the 1024-row log-ratio
    table into the token stream (map-side), one doc_id combine, and a
    TakeOrdered top-K — no global sort, no driver data path beyond the
    two scalar totals (the same one-collect pattern as
    q_text_unigram_logprob). Hash-check: counts are exact integers in
    both engines; log terms are IEEE doubles rounded at 6dp with
    doc_id tiebreaks (SURVEY §2.4 discipline)."""
    import math

    d = t(spark, sf_dir, "documents")
    tok = d.select("doc_id", "lang", F.explode(tokens("text")).alias("tok"))
    bucket = (
        F.expr("CAST(conv(substring(md5(tok), 9, 8), 16, 10) AS BIGINT)")
        .bitwiseAND(F.lit(2147483647))
        % DSIR_BUCKETS
    )
    # ONE explode over the corpus: compress the token stream to
    # (doc, bucket) COUNTS first — both the model aggregates AND the
    # scoring join run over this far smaller frame (docs × distinct
    # buckets-per-doc, not raw tokens), so the corpus is tokenized
    # exactly once and the heavy scoring shuffle shrinks ~5×
    db = (
        tok.select("doc_id", "lang", bucket.alias("b"))
        .groupBy("doc_id", "lang", "b")
        .agg(F.count("*").alias("n"))
    )
    # lazy persist: the model build (triggered by the totals collect
    # below) materializes this compressed featurized frame; the
    # scoring join then reads the cache instead of re-tokenizing +
    # re-hashing the corpus. MEMORY_AND_DISK, spillable — at 100 TB
    # this is the deliberate materialization of the 1000x-smaller
    # doc×bucket intermediate, not the raw text. Tracked for release.
    from ..operators._cache import persist_tracked

    db = persist_tracked(db)
    counts = db.groupBy("b").agg(
        F.sum("n").alias("c_r"),
        F.coalesce(F.sum(F.when(F.col("lang") == "en", F.col("n"))), F.lit(0)).alias(
            "c_t"
        ),
    )
    # materialize the 1024-row model ONCE (SURVEY §7 discovery (i):
    # column pruning differentiates the fan-out branches, so Catalyst
    # will NOT reuse the corpus-pass exchange between the model build,
    # the totals collect, and the scoring join — without this checkpoint
    # the token stream was hashed three times; with it, once at build
    # and once per action)
    model = (
        spark.range(DSIR_BUCKETS)
        .withColumnRenamed("id", "b")
        .join(counts, "b", "left")
        .fillna(0, ["c_r", "c_t"])
        .localCheckpoint()
    )
    totals = model.agg(F.sum("c_r").alias("tr"), F.sum("c_t").alias("tt")).collect()[0]
    const = math.log(
        (int(totals["tr"]) + DSIR_BUCKETS) / (int(totals["tt"]) + DSIR_BUCKETS)
    )
    lograt = (
        F.log(F.col("c_t") + 1) - F.log(F.col("c_r") + 1) + F.lit(const)
    ).alias("lr")
    scored = (
        db.join(F.broadcast(model.select("b", lograt)), "b")
        .groupBy("doc_id")
        .agg(
            F.any_value("lang").alias("lang"),
            F.sum("n").alias("n_tokens"),
            F.round(F.sum(F.col("n") * F.col("lr")), 6).alias("log_w"),
        )
    )
    return scored.orderBy(F.desc("log_w"), F.asc("doc_id")).limit(DSIR_KEEP)


# ---------------------------------------------------------------------------
# End-to-end curation pipeline funnel: the engine's flagship composite.
# Reuses the SAME constants as the individual stage queries so the two
# views can never drift: quality gate (MIN_TOKENS/STOPWORD band/
# DISTINCT_FRAC_MIN), exact dedup, benchmark decontamination
# (CONTAM_NGRAM/BENCH_MOD from queries/quality.py), per-source cap.

PIPE_STAGES = ("raw", "quality", "dedup", "decontam", "domain_cap")


def _pipeline_funnel_oracle() -> str:
    from .quality import BENCH_MOD, CONTAM_NGRAM

    return f"""
    WITH m AS (
        SELECT doc_id, source, text, n_chars, tk, len(tk) AS n_tokens,
               CAST(len(list_filter(tk, x -> x IN ({_SW_LIST}))) AS DOUBLE) / len(tk) AS sw,
               CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk) AS df
        FROM (SELECT doc_id, source, text, n_chars, string_split(text, ' ') AS tk
              FROM documents)
    ), flags1 AS (
        SELECT *, (n_tokens >= {MIN_TOKENS} AND sw >= {STOPWORD_MIN}
                   AND sw <= {STOPWORD_MAX} AND df >= {DISTINCT_FRAC_MIN}) AS s1
        FROM m
    ), flags2 AS (
        SELECT *, s1 AND doc_id = MIN(CASE WHEN s1 THEN doc_id END)
                            OVER (PARTITION BY text) AS s2
        FROM flags1
    ), shingles AS (
        SELECT DISTINCT doc_id, g FROM (
            SELECT doc_id,
                   UNNEST(list_transform(range(1, len(tk) - {CONTAM_NGRAM - 2}),
                          i -> array_to_string(tk[i:i+{CONTAM_NGRAM - 1}], ' '))) AS g
            FROM m WHERE len(tk) >= {CONTAM_NGRAM})
    ), bench AS (
        SELECT DISTINCT g FROM shingles WHERE doc_id % {BENCH_MOD} = 0
    ), dirty AS (
        SELECT DISTINCT s.doc_id FROM shingles s JOIN bench b ON s.g = b.g
        WHERE s.doc_id % {BENCH_MOD} <> 0
    ), flags3 AS (
        SELECT f.*, f.s2 AND f.doc_id % {BENCH_MOD} <> 0
                      AND d.doc_id IS NULL AS s3
        FROM flags2 f LEFT JOIN dirty d ON d.doc_id = f.doc_id
    ), flags4 AS (
        SELECT *, s3 AND ROW_NUMBER() OVER (
                   PARTITION BY source, s3 ORDER BY n_chars DESC, doc_id
               ) <= {DOMAIN_CAP} AS s4
        FROM flags3
    )
    SELECT stage, stage_no, n_docs, n_tokens, id_sum FROM (
        SELECT 'raw' AS stage, 0 AS stage_no, COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
               CAST(SUM(doc_id) AS BIGINT) AS id_sum FROM flags4
        UNION ALL
        SELECT 'quality', 1, COUNT(*), CAST(SUM(n_tokens) AS BIGINT),
               CAST(SUM(doc_id) AS BIGINT) FROM flags4 WHERE s1
        UNION ALL
        SELECT 'dedup', 2, COUNT(*), CAST(SUM(n_tokens) AS BIGINT),
               CAST(SUM(doc_id) AS BIGINT) FROM flags4 WHERE s2
        UNION ALL
        SELECT 'decontam', 3, COUNT(*), CAST(SUM(n_tokens) AS BIGINT),
               CAST(SUM(doc_id) AS BIGINT) FROM flags4 WHERE s3
        UNION ALL
        SELECT 'domain_cap', 4, COUNT(*), CAST(SUM(n_tokens) AS BIGINT),
               CAST(SUM(doc_id) AS BIGINT) FROM flags4 WHERE s4
    )
    """


@query(
    "q_curate_pipeline_funnel",
    oracle=_pipeline_funnel_oracle(),
    tags=("curate", "pipeline", "composite", "training-data"),
)
def q_curate_pipeline_funnel(spark, sf_dir):
    """The training-data pipeline END-TO-END, as one composite: quality
    gate → exact dedup → benchmark decontamination → per-source cap,
    with the survival funnel (docs / tokens / membership checksum per
    stage) as the result — the readout every curation run publishes.
    Each stage reuses the SAME constants as its standalone query
    (q_text_filter_cascade, q_dedup_exact, q_text_contamination,
    q_text_domain_cap), so the composite and the unit views can't
    drift.

    Plan shape — the important part: survival is computed as per-doc
    FLAGS in one pass (a boolean column per stage), so the 5-stage
    funnel is ONE aggregate over one frame instead of five
    progressively-filtered re-scans; the only joins are the shingle
    semi-join against the (tiny, broadcast) benchmark n-gram set, and
    the windows are partitioned by text (dedup groups) and by source
    (cap ranking; at 100 TB a long-tail source distribution keeps
    these parallel — one hot source would call for the salted two-phase
    rank of operators/globalrank.py instead). The funnel unpivots from
    the single aggregate row via stack(), no second pass."""
    from .quality import BENCH_MOD, CONTAM_NGRAM

    d = t(spark, sf_dir, "documents")
    tk = tokens("text")
    base = d.select(
        "doc_id", "source", "text", "n_chars", tk.alias("tk"), F.size(tk).alias("n_tokens")
    )
    sw = F.size(F.filter("tk", lambda x: x.isin(*STOPWORDS))) / F.col("n_tokens")
    df_frac = F.size(F.array_distinct("tk")) / F.col("n_tokens")
    s1 = (
        (F.col("n_tokens") >= MIN_TOKENS)
        & (sw >= STOPWORD_MIN)
        & (sw <= STOPWORD_MAX)
        & (df_frac >= DISTINCT_FRAC_MIN)
    )
    flagged = base.withColumn("s1", s1)
    s2 = F.col("s1") & (
        F.col("doc_id")
        == F.min(F.when(F.col("s1"), F.col("doc_id"))).over(W.partitionBy("text"))
    )
    flagged = flagged.withColumn("s2", s2)

    # no (doc_id, g) distinct here: the bench branch dedups on g alone
    # and the dirty branch dedups on doc_id after the join, so the
    # intermediate full-shingle shuffle bought nothing — removing it
    # drops one Exchange per branch (the shingle frame is re-derived by
    # each branch; set semantics are unchanged). Measured 1.23 -> 0.93 s
    # min-of-5 at sf0.1; a persist of the deduped frame measured 1.68 s
    # (recompute beats cache materialization here).
    sh = base.filter(F.size("tk") >= CONTAM_NGRAM).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("tk") - CONTAM_NGRAM),
                lambda i: F.concat_ws(" ", F.slice("tk", i + 1, CONTAM_NGRAM)),
            )
        ).alias("g"),
    )
    bench = sh.filter(F.col("doc_id") % BENCH_MOD == 0).select("g").distinct()
    dirty = (
        sh.filter(F.col("doc_id") % BENCH_MOD != 0)
        .join(F.broadcast(bench), "g")
        .select("doc_id")
        .distinct()
        .withColumn("is_dirty", F.lit(True))
    )
    flagged = flagged.join(dirty, "doc_id", "left").withColumn(
        "s3",
        F.col("s2") & (F.col("doc_id") % BENCH_MOD != 0) & F.col("is_dirty").isNull(),
    )
    rk = F.row_number().over(
        W.partitionBy("source", "s3").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    )
    flagged = flagged.withColumn("s4", F.col("s3") & (rk <= DOMAIN_CAP))

    def stage_aggs(flag: str | None):
        cond = F.lit(True) if flag is None else F.col(flag)
        return [
            F.count(F.when(cond, 1)),
            F.sum(F.when(cond, F.col("n_tokens"))).cast("long"),
            F.sum(F.when(cond, F.col("doc_id"))).cast("long"),
        ]

    aggs = []
    for i, flag in enumerate([None, "s1", "s2", "s3", "s4"]):
        for j, a in enumerate(stage_aggs(flag)):
            aggs.append(a.alias(f"v{i}_{j}"))
    one = flagged.agg(*aggs)
    stack_expr = ", ".join(
        f"'{name}', {i}, v{i}_0, v{i}_1, v{i}_2" for i, name in enumerate(PIPE_STAGES)
    )
    return one.select(
        F.expr(
            f"stack({len(PIPE_STAGES)}, {stack_expr}) AS (stage, stage_no, n_docs, n_tokens, id_sum)"
        )
    )


@query(
    "q_curate_epoch_mix",
    oracle=f"""
    WITH counts AS (
        SELECT source, COUNT(*) AS n_src FROM documents GROUP BY 1
    ), weighted AS (
        SELECT source, n_src,
               POWER(CAST(n_src AS DOUBLE), {MIX_ALPHA})
                   / SUM(POWER(CAST(n_src AS DOUBLE), {MIX_ALPHA})) OVER () AS w,
               CAST(SUM(n_src) OVER () AS BIGINT) AS total
        FROM counts
    ), quotas AS (
        SELECT source,
               CAST(FLOOR(total * w + 0.5) AS BIGINT) // n_src AS full_epochs,
               CAST(FLOOR(total * w + 0.5) AS BIGINT) % n_src AS remainder_docs
        FROM weighted
    ), ranked AS (
        SELECT d.doc_id, d.source, d.n_chars,
               ROW_NUMBER() OVER (PARTITION BY d.source
                                  ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id)
                   AS rk
        FROM documents d
    ), emitted AS (
        SELECT r.doc_id, r.source, r.n_chars, CAST(t.rep AS BIGINT) AS replica
        FROM ranked r JOIN quotas q ON q.source = r.source,
             UNNEST(range(0, q.full_epochs)) AS t(rep)
        UNION ALL
        SELECT r.doc_id, r.source, r.n_chars, q.full_epochs AS replica
        FROM ranked r JOIN quotas q ON q.source = r.source
        WHERE r.rk <= q.remainder_docs
    )
    SELECT source,
           COUNT(*) AS n_emitted,
           COUNT(DISTINCT doc_id) AS n_docs_used,
           CAST(MAX(replica) AS BIGINT) AS max_replica,
           CAST(SUM(n_chars) AS BIGINT) AS chars_emitted,
           CAST(SUM(doc_id * (replica + 1)) AS BIGINT) AS order_checksum
    FROM emitted GROUP BY source
    """,
    tags=("curate", "mixture", "epochs", "upsampling", "training-data"),
)
def q_curate_epoch_mix(spark, sf_dir):
    """MATERIALIZE the temperature mixture — the step after
    q_curate_mix_temperature's quota math: every source is repeated
    `full_epochs` whole times, and the fractional epoch takes the
    deterministic md5-rank-smallest `remainder_docs` (so reruns and
    engines agree doc-for-doc). This is the LLaMA/GPT-style data-recipe
    upsampling (×N epochs of small high-quality sources, <1 epoch of
    the big crawl) as an executable corpus expansion, checksummed
    per source.

    Scale shape: the epoch repeat is an explode of a per-source small
    integer (rows ∝ output corpus, the unavoidable cost of
    materializing it); the fractional-epoch selection is one md5-rank
    window per source (same skew caveat + salted-rank fallback as
    q_text_domain_cap); the quota math rides a 5-row broadcast."""
    d = t(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count("*").alias("n_src"))
    wtot = W.partitionBy()
    weighted = counts.select(
        "source",
        "n_src",
        (
            F.pow(F.col("n_src").cast("double"), F.lit(MIX_ALPHA))
            / F.sum(F.pow(F.col("n_src").cast("double"), F.lit(MIX_ALPHA))).over(wtot)
        ).alias("w"),
        F.sum("n_src").over(wtot).alias("total"),
    )
    quotas = weighted.select(
        "source",
        (F.floor(F.col("total") * F.col("w") + 0.5).cast("long") / F.col("n_src"))
        .cast("long")
        .alias("full_epochs"),
        (F.floor(F.col("total") * F.col("w") + 0.5).cast("long") % F.col("n_src")).alias(
            "remainder_docs"
        ),
    )
    ranked = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.row_number()
        .over(
            W.partitionBy("source").orderBy(
                F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
            )
        )
        .alias("rk"),
    ).join(F.broadcast(quotas), "source")
    whole = ranked.select(
        "doc_id",
        "source",
        "n_chars",
        F.explode(F.sequence(F.lit(0), F.col("full_epochs") - 1)).alias("replica"),
    ).filter(F.col("full_epochs") > 0)
    frac = ranked.filter(F.col("rk") <= F.col("remainder_docs")).select(
        "doc_id", "source", "n_chars", F.col("full_epochs").alias("replica")
    )
    emitted = whole.unionByName(frac)
    return emitted.groupBy("source").agg(
        F.count("*").alias("n_emitted"),
        F.countDistinct("doc_id").alias("n_docs_used"),
        F.max("replica").cast("long").alias("max_replica"),
        F.sum("n_chars").cast("long").alias("chars_emitted"),
        F.sum(F.col("doc_id") * (F.col("replica") + 1)).cast("long").alias("order_checksum"),
    )


@query(
    "q_curate_perplexity_buckets",
    oracle=f"""
    WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents),
    bg AS (
        SELECT doc_id, lang, u.w1 AS w1, u.w2 AS w2 FROM (
            SELECT doc_id, lang,
                   UNNEST(list_transform(range(1, len(tk)),
                          i -> struct_pack(w1 := tk[i], w2 := tk[i + 1]))) AS u
            FROM toks)
    ),
    bgc AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
    ugc AS (SELECT w1, CAST(COUNT(*) AS DOUBLE) AS c1,
                   CAST(COUNT(DISTINCT w2) AS DOUBLE) AS fan1
            FROM bg GROUP BY 1),
    cont AS (SELECT w2, CAST(COUNT(DISTINCT w1) AS DOUBLE) AS cont2
             FROM bg GROUP BY 1),
    tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_types
            FROM (SELECT DISTINCT w1, w2 FROM bg)),
    scored AS (
        SELECT b.doc_id, b.lang, COUNT(*) AS n_bigrams,
               ROUND(AVG(ln(
                   GREATEST(c.c12 - {KN_DISCOUNT}, 0) / g.c1
                   + ({KN_DISCOUNT} * g.fan1 / g.c1) * (k.cont2 / tot.n_types)
               )), 6) AS avg_kn_logprob
        FROM bg b
        JOIN bgc c ON b.w1 = c.w1 AND b.w2 = c.w2
        JOIN ugc g ON b.w1 = g.w1
        JOIN cont k ON b.w2 = k.w2
        CROSS JOIN tot
        GROUP BY b.doc_id, b.lang
    )
    SELECT doc_id, lang, n_bigrams, avg_kn_logprob,
           CAST(NTILE(3) OVER (PARTITION BY lang
                ORDER BY avg_kn_logprob DESC, doc_id) AS BIGINT) AS bucket,
           CAST(CASE WHEN NTILE(3) OVER (PARTITION BY lang
                ORDER BY avg_kn_logprob DESC, doc_id) <= 2
                THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM scored
    """,
    tags=("curation", "ccnet", "perplexity", "lm", "training-data"),
)
def q_curate_perplexity_buckets(spark, sf_dir):
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score every
    document with the corpus LM (the interpolated-KN bigram model,
    shared scorer `_kn_doc_scores`), then split each LANGUAGE into
    head/middle/tail terciles by model fit and keep head+middle — the
    published recipe behind CCNet/LLaMA-1's crawl curation, where
    "well-modeled" text is kept and the worst-fit tail is dropped or
    routed to extra cleaning.

    The tercile cut uses NTILE over (ROUNDED score, doc_id) — a total
    order both engines share, so bucket assignment is deterministic
    (never a raw-float boundary). Per-doc rows keep the hash check
    strong (one row per scoreable document).

    Scale shape: the LM is three hash aggregates + broadcast scoring
    joins (see q_text_kneser_ney); the tercile window partitions by
    lang and at 100 TB would be replaced by the two-phase global-rank
    decomposition (operators/globalrank.py) per language — same cut,
    no single-task sort; at fixture scale the per-lang partitions are
    driver-small."""
    d = t(spark, sf_dir, "documents")
    scored = _kn_doc_scores(d, keys=["doc_id", "lang"])
    w = W.partitionBy("lang").orderBy(
        F.col("avg_kn_logprob").desc(), F.col("doc_id").asc()
    )
    bucket = F.ntile(3).over(w)
    return scored.select(
        "doc_id",
        "lang",
        "n_bigrams",
        "avg_kn_logprob",
        bucket.cast("long").alias("bucket"),
        F.when(bucket <= 2, 1).otherwise(0).cast("long").alias("keep"),
    )
