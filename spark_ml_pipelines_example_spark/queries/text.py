"""Text-analysis queries over `documents` (north-star extensions:
tokenization, term stats, quality scoring, language-ID, fingerprinting).

Scale posture: every query is explode → hash-aggregate or pure per-row
projection; token explosion shuffles once on the group key. Nothing
collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.text import BPE_REGEX, STOPWORDS, stopword_count, tokens
from ._util import t
from .registry import query


@query(
    "q_text_tokenize_stats",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_tokens,
           COUNT(DISTINCT tok) AS n_unique_tokens,
           COUNT(DISTINCT doc_id) AS n_docs,
           CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT doc_id) AS avg_tokens_per_doc
    FROM (SELECT doc_id, lang, UNNEST(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY lang
    """,
    tags=("text",),
)
def q_text_tokenize_stats(spark, sf_dir):
    """Whitespace tokenization + per-language corpus stats."""
    d = t(spark, sf_dir, "documents")
    ex = d.select("doc_id", "lang", F.explode(tokens("text")).alias("tok"))
    return ex.groupBy("lang").agg(
        F.count("*").alias("n_tokens"),
        F.countDistinct("tok").alias("n_unique_tokens"),
        F.countDistinct("doc_id").alias("n_docs"),
        (F.count("*").cast("double") / F.countDistinct("doc_id")).alias(
            "avg_tokens_per_doc"
        ),
    )


@query(
    "q_text_tfidf_topterms",
    oracle="""
    SELECT lang, tok, cnt, rk FROM (
        SELECT lang, tok, COUNT(*) AS cnt,
               ROW_NUMBER() OVER (PARTITION BY lang ORDER BY COUNT(*) DESC, tok) AS rk
        FROM (SELECT lang, UNNEST(string_split(text, ' ')) AS tok FROM documents)
        GROUP BY lang, tok
    ) WHERE rk <= 5
    """,
    tags=("text", "topk"),
)
def q_text_tfidf_topterms(spark, sf_dir):
    """Top-5 terms per language by term frequency, deterministic tie-break
    on the term (SURVEY: the pure-DataFrame TF variant; the IDF-weighted
    variant is `q_text_tfidf_weighted`, engine-side)."""
    d = t(spark, sf_dir, "documents")
    counts = (
        d.select("lang", F.explode(tokens("text")).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count("*").alias("cnt"))
    )
    w = W.partitionBy("lang").orderBy(F.col("cnt").desc(), "tok")
    return counts.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 5)


@query(
    "q_text_quality_score",
    oracle=f"""
    SELECT doc_id, lang,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
           CAST(len(regexp_extract_all(text, '{BPE_REGEX}')) AS INT) AS n_tokens_bpe,
           CAST(length(text) AS INT) AS n_chars_measured,
           CAST(length(replace(text, ' ', '')) AS DOUBLE)
             / len(string_split(text, ' ')) AS avg_token_len,
           CAST(len(list_filter(string_split(text, ' '),
                    x -> list_contains({list(STOPWORDS)!r}, x))) AS DOUBLE)
             / len(string_split(text, ' ')) AS stopword_ratio
    FROM documents
    """,
    tags=("text", "quality"),
)
def q_text_quality_score(spark, sf_dir):
    """Per-document quality signals: whitespace + BPE-ish regex token
    counts, char length, mean token length, stopword ratio — the standard
    LLM-corpus quality features, all integer-exact or single-division."""
    d = t(spark, sf_dir, "documents")
    toks = tokens("text")
    n_tok = F.size(toks)
    return d.select(
        "doc_id",
        "lang",
        n_tok.cast("int").alias("n_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_REGEX), 0))
        .cast("int")
        .alias("n_tokens_bpe"),
        F.length("text").cast("int").alias("n_chars_measured"),
        (
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
            / n_tok
        ).alias("avg_token_len"),
        (stopword_count(toks).cast("double") / n_tok).alias("stopword_ratio"),
    )


@query(
    "q_text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp,
           COUNT(*) OVER (PARTITION BY md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))))
             AS n_same_fp
    FROM documents
    """,
    tags=("text", "fingerprint"),
)
def q_text_fingerprint(spark, sf_dir):
    """Document fingerprinting: md5 over whitespace-normalized text, plus
    the duplicate-cluster size per fingerprint (window count)."""
    d = t(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))))
    return d.select("doc_id", fp.alias("fp")).withColumn(
        "n_same_fp", F.count("*").over(W.partitionBy("fp"))
    )


@query(
    "q_text_langid",
    oracle="""
    WITH tok AS (
        SELECT doc_id, lang, UNNEST(string_split(text, ' ')) AS tok FROM documents
    ), counts AS (
        SELECT lang, tok, COUNT(*) AS cnt FROM tok GROUP BY lang, tok
    ), profiles AS (
        SELECT lang AS profile_lang, tok FROM (
            SELECT lang, tok,
                   ROW_NUMBER() OVER (PARTITION BY lang ORDER BY cnt DESC, tok) AS rk
            FROM counts) WHERE rk <= 20
    ), scores AS (
        SELECT t.doc_id, t.lang, p.profile_lang, COUNT(*) AS hits
        FROM tok t JOIN profiles p USING (tok)
        GROUP BY t.doc_id, t.lang, p.profile_lang
    ), best AS (
        SELECT doc_id, lang, pred_lang FROM (
            SELECT doc_id, lang, profile_lang AS pred_lang,
                   ROW_NUMBER() OVER (
                       PARTITION BY doc_id ORDER BY hits DESC, profile_lang) AS rk
            FROM scores) WHERE rk = 1
    )
    SELECT lang, pred_lang, COUNT(*) AS n_docs FROM best GROUP BY lang, pred_lang
    """,
    tags=("text", "langid"),
)
def q_text_langid(spark, sf_dir):
    """Language-ID by token-profile overlap: build per-language top-20
    token profiles from the corpus itself, score each document by profile
    hits, predict the argmax language (tie → alphabetical). Every stage
    is integer-deterministic with pinned tiebreaks (profile rank: count
    desc then token; prediction: hits desc then language), so the full
    cascade hash-checks against its SQL twin. Returns the
    (actual, predicted) confusion counts."""
    d = t(spark, sf_dir, "documents")
    ex = d.select("doc_id", "lang", F.explode(tokens("text")).alias("tok"))

    # per-lang top-20 profile tokens (broadcastable: 5 langs × 20 tokens)
    counts = ex.groupBy("lang", "tok").agg(F.count("*").alias("cnt"))
    wprof = W.partitionBy("lang").orderBy(F.col("cnt").desc(), "tok")
    profiles = (
        counts.withColumn("rk", F.row_number().over(wprof))
        .filter(F.col("rk") <= 20)
        .select(F.col("lang").alias("profile_lang"), "tok")
    )

    # score each doc against every profile it hits
    scores = (
        ex.join(F.broadcast(profiles), "tok")
        .groupBy("doc_id", "lang", "profile_lang")
        .agg(F.count("*").alias("hits"))
    )
    wbest = W.partitionBy("doc_id").orderBy(F.col("hits").desc(), "profile_lang")
    best = (
        scores.withColumn("rk", F.row_number().over(wbest))
        .filter(F.col("rk") == 1)
        .select("doc_id", "lang", F.col("profile_lang").alias("pred_lang"))
    )
    return best.groupBy("lang", "pred_lang").agg(F.count("*").alias("n_docs"))


@query(
    "q_text_tfidf_weighted",
    oracle="""
    WITH toks AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents),
    tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok),
    df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY tok),
    n AS (SELECT COUNT(*) AS n FROM documents),
    scored AS (
        SELECT doc_id, tok, tf, df,
               ROUND(tf * ln(CAST(n AS DOUBLE) / df), 6) AS tfidf
        FROM tf JOIN df USING (tok), n
        WHERE doc_id % 100 = 0
    )
    SELECT doc_id, tok, tfidf, rk FROM (
        SELECT doc_id, tok, tfidf,
               ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS rk
        FROM scored
    ) WHERE rk <= 3
    """,
    tags=("text", "tfidf"),
)
def q_text_tfidf_weighted(spark, sf_dir):
    """True TF-IDF top-3 terms per document (for a deterministic doc
    subset): tf(term,doc) · ln(N/df(term)). The document-frequency table
    is vocabulary-sized — it broadcasts — so the scoring join adds no
    shuffle of the token stream; N is resolved driver-side once (a count
    is a metadata-cheap action) and folded in as a literal. Ranking uses
    the ROUNDED score in both engines so float ulps can't flip ranks
    (tie-break on the term)."""
    d = t(spark, sf_dir, "documents")
    n_docs = float(d.count())
    toks = d.select("doc_id", F.explode(tokens("text")).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    df = toks.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    scored = (
        tf.filter(F.col("doc_id") % 100 == 0)
        .join(df, "tok")
        .select(
            "doc_id",
            "tok",
            F.round(
                F.col("tf") * F.log(F.lit(n_docs) / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "tok")
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 3)


@query(
    "q_text_chunk",
    oracle="""
    WITH tk AS (
        SELECT doc_id, string_split(text, ' ') AS tk,
               CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
        FROM documents
    )
    SELECT doc_id, n_tokens,
           CAST(start // 48 AS INT) AS chunk_id,
           CAST(len(list_slice(tk, start + 1, start + 64)) AS INT) AS chunk_tokens,
           array_to_string(list_slice(tk, start + 1, start + 64), ' ') AS chunk_text
    FROM (SELECT doc_id, tk, n_tokens,
                 CAST(UNNEST(range(0, GREATEST(n_tokens, 1), 48)) AS INT) AS start
          FROM tk)
    """,
    tags=("text", "chunk", "training-data"),
)
def q_text_chunk(spark, sf_dir):
    """Token-budget document chunking with overlap (64-token chunks,
    stride 48 → 16 tokens shared between neighbors) — the step that turns
    variable-length documents into trainer-sized sequences. Pure
    sequence+explode+slice codegen: chunk starts are generated per row
    (no self-join, no window), so the only data movement is the explode
    fan-out, which is embarrassingly parallel and shuffle-free at any
    corpus size. Chunk ids are derivable from the start offset
    (start/stride), keeping the output deterministic without a window
    ordering pass."""
    CHUNK, STRIDE = 64, 48
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("tk")
    )
    d = d.withColumn("n_tokens", F.size("tk"))
    starts = F.sequence(
        F.lit(0), F.greatest(F.col("n_tokens") - 1, F.lit(0)), F.lit(STRIDE)
    )
    ex = d.select(
        "doc_id", "n_tokens", "tk", F.explode(starts).alias("start")
    )
    chunk = F.slice("tk", F.col("start") + 1, F.lit(CHUNK))
    return ex.select(
        "doc_id",
        "n_tokens",
        (F.col("start") / STRIDE).cast("int").alias("chunk_id"),
        F.size(chunk).alias("chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


@query(
    "q_text_vocab_coverage",
    oracle="""
    WITH tok AS (
        SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents
    ), vc AS (
        SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok
    ), tot AS (
        SELECT CAST(SUM(c) AS DOUBLE) AS t FROM vc
    ), top AS (
        SELECT tok, c FROM vc ORDER BY c DESC, tok LIMIT 100
    )
    SELECT tok, c,
           ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS rnk,
           ROUND(SUM(c) OVER (ORDER BY c DESC, tok
                              ROWS UNBOUNDED PRECEDING) / tot.t, 6) AS cum_share
    FROM top, tot
    """,
    tags=("text", "vocab", "training-data"),
)
def q_text_vocab_coverage(spark, sf_dir):
    """Vocabulary builder with coverage curve: top-100 tokens by corpus
    frequency and the cumulative share of all token positions they
    cover — the tokenizer-design question ("how big a vocab covers 95%
    of the corpus?") as one query. The frequency aggregate is one
    combinable shuffle; the top-100 cut is TakeOrdered (never a global
    sort of the vocab), and ONLY those 100 rows enter the unpartitioned
    cumsum window — the window input is constant-size by construction at
    any corpus scale. Corpus token total is one driver-side scalar."""
    d = t(spark, sf_dir, "documents")
    tok = d.select(F.explode(tokens("text")).alias("tok"))
    vc = tok.groupBy("tok").agg(F.count("*").alias("c"))
    total = float(vc.agg(F.sum("c").cast("double")).head()[0])
    top = vc.orderBy(F.col("c").desc(), "tok").limit(100)
    from pyspark.sql import Window as W

    w = W.orderBy(F.col("c").desc(), "tok")
    return top.select(
        "tok",
        "c",
        F.row_number().over(w).alias("rnk"),
        F.round(
            F.sum("c").over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
            / total,
            6,
        ).alias("cum_share"),
    )


PMI_MIN_COUNT = 5


@query(
    "q_text_pmi_collocations",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    bg AS (
        SELECT u.w1 AS w1, u.w2 AS w2 FROM (
            SELECT UNNEST(list_transform(range(1, len(tk)),
                   i -> struct_pack(w1 := tk[i], w2 := tk[i + 1]))) AS u
            FROM toks)
    ),
    bgc AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
    n1 AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY 1),
    n2 AS (SELECT w2, COUNT(*) AS c2 FROM bg GROUP BY 1),
    tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM bg)
    SELECT b.w1, b.w2, b.c12,
           ROUND(ln(b.c12 * tot.t / (n1.c1 * n2.c2)), 6) AS pmi
    FROM bgc b JOIN n1 USING (w1) JOIN n2 USING (w2) CROSS JOIN tot
    WHERE b.c12 >= {PMI_MIN_COUNT}
    ORDER BY ln(b.c12 * tot.t / (n1.c1 * n2.c2)) DESC, b.w1, b.w2
    LIMIT 20
    """,
    tags=("text", "pmi", "collocation", "training-data"),
)
def q_text_pmi_collocations(spark, sf_dir):
    """Top-20 collocations by pointwise mutual information:
    PMI(w1,w2) = ln(c12·T / (c1·c2)) over bigram positions, with a
    min-count floor (rare pairs have unboundedly high PMI — the floor is
    the standard fix). Three combinable count aggregates; the two
    unigram-position tables broadcast into the bigram table (vocab ≪
    bigrams), and the top-20 is TakeOrdered on the exact same IEEE
    doubles both engines compute — no global sort."""
    d = t(spark, sf_dir, "documents")
    tk = tokens("text")
    pairs = F.zip_with(
        F.slice(tk, 1, F.size(tk) - 1),
        F.slice(tk, 2, F.size(tk) - 1),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
    )
    bg = d.select(F.explode(pairs).alias("p")).select("p.w1", "p.w2")
    bgc = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    n1 = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    n2 = bg.groupBy("w2").agg(F.count("*").alias("c2"))
    total = float(bg.count())
    pmi = F.log(F.col("c12") * F.lit(total) / (F.col("c1") * F.col("c2")))
    return (
        bgc.filter(F.col("c12") >= PMI_MIN_COUNT)
        .join(F.broadcast(n1), "w1")
        .join(F.broadcast(n2), "w2")
        .orderBy(pmi.desc(), "w1", "w2")
        .limit(20)
        .select("w1", "w2", "c12", F.round(pmi, 6).alias("pmi"))
    )
