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


# ---------------------------------------------------------------------------
# BPE tokenizer training (Sennrich et al. 2016): the missing member of the
# LLM-pipeline text stack — the engine can already tokenize, score, and
# dedup a corpus; this trains the subword vocabulary itself.

BPE_MERGES = 6


def _bpe_oracle(merges: int = BPE_MERGES) -> str:
    """Unrolled-CTE DuckDB twin of the BPE merge loop (the LPA pattern:
    one CTE block per iteration). Pair positions come from
    ``UNNEST(range(2, len(tk)))`` over the 1-indexed split list (element
    1 is the empty string before the leading space); merge application is
    ``replace(seq, ' l r', ' lr')``, whose left-to-right non-overlapping
    scan is EXACTLY the greedy BPE merge order in both engines (verified:
    ``' a a a'`` → ``' aa a'``, ``' a b a b'`` → ``' ab ab'``)."""
    steps = []
    for k in range(1, merges + 1):
        steps.append(
            f"""x{k} AS (
        SELECT freq, string_split(seq, ' ') AS tk FROM w{k - 1}
    ), e{k} AS (
        SELECT freq, tk, UNNEST(range(2, len(tk))) AS i FROM x{k}
    ), p{k} AS (
        SELECT tk[i] AS l, tk[i + 1] AS r, CAST(SUM(freq) AS BIGINT) AS cnt
        FROM e{k} GROUP BY 1, 2
    ), t{k} AS (
        SELECT l, r, cnt FROM p{k} ORDER BY cnt DESC, l, r LIMIT 1
    ), w{k} AS (
        SELECT w, freq, replace(seq, ' ' || l || ' ' || r, ' ' || l || r) AS seq
        FROM w{k - 1}, t{k}
    )"""
        )
    chain = ", ".join(steps)
    sel = " UNION ALL ".join(
        f"SELECT {k} AS step, l AS lhs, r AS rhs, l || r AS merged,"
        f" cnt AS pair_count FROM t{k}"
        for k in range(1, merges + 1)
    )
    return f"""
    WITH wf AS (
        SELECT w, COUNT(*) AS freq
        FROM (SELECT UNNEST(string_split(text, ' ')) AS w FROM documents)
        WHERE w <> '' GROUP BY w
    ), w0 AS (
        SELECT w, freq, regexp_replace(w, '(.)', ' \\1', 'g') || ' </w>' AS seq
        FROM wf
    ), {chain}
    SELECT * FROM ({sel}) ORDER BY step
    """


def _bpe_train(spark, sf_dir):
    """Shared BPE merge loop: returns (final word-dict frame with merged
    ``seq`` strings, list of 1-row per-step winner frames). Both stages
    localCheckpoint per round — the word dict is vocabulary-sized, so the
    checkpoint is cheap and it truncates the exponential lineage the
    round-over-round self-reference would otherwise build."""
    d = t(spark, sf_dir, "documents")
    wf = (
        d.select(F.explode(tokens("text")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )
    words = wf.select(
        "w",
        "freq",
        F.concat(F.regexp_replace("w", "(.)", " $1"), F.lit(" </w>")).alias("seq"),
    ).localCheckpoint()
    pair_enum = F.expr(
        "transform(sequence(2, size(tk) - 1),"
        " i -> struct(element_at(tk, i) AS l, element_at(tk, i + 1) AS r))"
    )
    tops = []
    for k in range(1, BPE_MERGES + 1):
        pc = (
            words.select("freq", F.split("seq", " ").alias("tk"))
            .select("freq", F.explode(pair_enum).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("cnt"))
        )
        top = pc.orderBy(F.desc("cnt"), "l", "r").limit(1).localCheckpoint()
        tops.append(top.select(F.lit(k).alias("step"), "l", "r", "cnt"))
        words = (
            words.crossJoin(F.broadcast(top.select("l", "r")))
            .select(
                "w",
                "freq",
                F.expr(
                    "replace(seq, concat(' ', l, ' ', r), concat(' ', l, r))"
                ).alias("seq"),
            )
            .localCheckpoint()
        )
    return words, tops


@query(
    "q_text_bpe_train",
    oracle=_bpe_oracle(),
    tags=("text", "bpe", "tokenizer", "training-data"),
)
def q_text_bpe_train(spark, sf_dir):
    """Byte-pair-encoding tokenizer TRAINING (Sennrich et al. 2016 — the
    algorithm behind GPT-2/RoBERTa vocabularies): start from characters
    plus an end-of-word marker, repeatedly merge the globally most
    frequent adjacent symbol pair (ties broken lexicographically), and
    emit the learned merge table — the artifact a tokenizer ships. The
    engine's text stack could already tokenize/score/dedup a corpus;
    this trains the vocabulary itself.

    Scale shape — the classic two-level BPE decomposition: ONE combinable
    hash aggregate collapses the token stream into the distinct
    word-frequency dict (the only corpus-sized stage; everything after is
    vocabulary-sized, thousands of rows at 100 TB), localCheckpointed so
    the merge rounds never rescan the corpus. Each round is then a
    map-side ``transform``+``explode`` pair enumeration over the word
    dict, a freq-weighted hash aggregate, and a TakeOrdered(1) — no
    global sort, no driver data path; the 1-row winner broadcasts back
    for the ``replace`` rewrite. Symbols are space-prefixed inside the
    sequence string, so ``replace(' l r' → ' lr')`` is an unambiguous,
    greedy left-to-right merge — bit-identical semantics in Spark and
    DuckDB (both scan non-overlapping, resuming after each replacement).
    Per-round localCheckpoint truncates the exponential lineage the
    round-over-round self-reference would otherwise build (the
    q_graph_label_propagation pattern)."""
    _, tops = _bpe_train(spark, sf_dir)
    out = tops[0]
    for tdf in tops[1:]:
        out = out.unionByName(tdf)
    return out.select(
        "step",
        F.col("l").alias("lhs"),
        F.col("r").alias("rhs"),
        F.concat("l", "r").alias("merged"),
        F.col("cnt").alias("pair_count"),
    ).orderBy("step")


BPE_VOCAB_TOP = 20


def _bpe_apply_oracle(merges: int = BPE_MERGES, top: int = BPE_VOCAB_TOP) -> str:
    """Train (same unrolled chain as q_text_bpe_train) then SEGMENT: the
    final word dict's sequences explode back into subword tokens, and
    freq-weighted counts give the corpus's subword distribution."""
    train = _bpe_oracle(merges)
    # reuse the training CTE chain up to w{merges}; strip its final SELECT
    chain = train[: train.rindex("SELECT * FROM")]
    return f"""{chain}
    SELECT tok, CAST(SUM(freq) AS BIGINT) AS n_occurrences,
           COUNT(*) AS n_word_forms
    FROM (SELECT freq, UNNEST(string_split(seq, ' ')) AS tok FROM w{merges})
    WHERE tok <> ''
    GROUP BY tok ORDER BY n_occurrences DESC, tok LIMIT {top}
    """


@query(
    "q_text_bpe_apply",
    oracle=_bpe_apply_oracle(),
    tags=("text", "bpe", "tokenizer", "training-data"),
)
def q_text_bpe_apply(spark, sf_dir):
    """BPE tokenizer INFERENCE — the other half of q_text_bpe_train:
    segment the corpus with the learned merge table and report the
    top subword vocabulary by corpus frequency (occurrences weighted by
    word frequency, plus how many distinct word forms contain each
    subword). Together the pair covers the tokenizer lifecycle: train
    the merges, then tokenize data with them — the step every
    token-counting / packing / contamination query downstream of a real
    tokenizer depends on.

    Scale shape: training reuses the shared two-level loop (corpus →
    word-frequency dict in one combinable aggregate; merge rounds are
    vocabulary-sized). Application is a map-side split+explode of the
    merged sequences with a freq-weighted hash aggregate and a
    TakeOrdered top-K — segmenting a 100 TB corpus would reuse the same
    chained `replace` expressions per document, embarrassingly parallel,
    no shuffle beyond the final vocab aggregate."""
    words, _ = _bpe_train(spark, sf_dir)
    toks = words.select(
        "freq", F.explode(F.split("seq", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    return (
        toks.groupBy("tok")
        .agg(F.sum("freq").alias("n_occurrences"), F.count("*").alias("n_word_forms"))
        .orderBy(F.desc("n_occurrences"), "tok")
        .limit(BPE_VOCAB_TOP)
    )


def _bpe_fertility_oracle(merges: int = BPE_MERGES) -> str:
    """Train (shared unrolled chain), then score tokenizer FERTILITY per
    language: join the per-(lang, word) corpus counts to the segmented
    dict and aggregate exact integer piece/char sums."""
    train = _bpe_oracle(merges)
    chain = train[: train.rindex("SELECT * FROM")]
    return f"""{chain}
    , seg AS (
        SELECT w, len(list_filter(string_split(seq, ' '), x -> x <> '')) AS n_pieces
        FROM w{merges}
    ), lw AS (
        SELECT lang, w, COUNT(*) AS flang
        FROM (SELECT lang, UNNEST(string_split(text, ' ')) AS w FROM documents)
        WHERE w <> '' GROUP BY lang, w
    )
    SELECT lang,
           CAST(SUM(flang) AS BIGINT) AS n_words,
           CAST(SUM(flang * n_pieces) AS BIGINT) AS n_tokens,
           CAST(SUM(flang * length(w)) AS BIGINT) AS n_chars,
           ROUND(CAST(SUM(flang * n_pieces) AS DOUBLE) / SUM(flang), 6)
               AS tokens_per_word,
           ROUND(CAST(SUM(flang * length(w)) AS DOUBLE)
                 / SUM(flang * n_pieces), 6) AS chars_per_token
    FROM lw JOIN seg USING (w)
    GROUP BY lang
    """


@query(
    "q_text_bpe_fertility",
    oracle=_bpe_fertility_oracle(),
    tags=("text", "bpe", "tokenizer", "fertility", "training-data"),
)
def q_text_bpe_fertility(spark, sf_dir):
    """Tokenizer FERTILITY per language — tokens/word and chars/token
    under the trained BPE vocabulary (piece count includes the merged
    </w> marker piece): the metric multilingual-tokenizer work optimizes
    (a language with high fertility pays more sequence length per word,
    i.e. trains and infers slower per unit text). Completes the
    tokenizer lifecycle: train (q_text_bpe_train) → apply
    (q_text_bpe_apply) → evaluate (here).

    Scale shape: the per-(lang, word) rollup is one combinable aggregate
    over the token stream; the segmented dict is vocabulary-sized and
    broadcast into the join, so fertility costs one corpus pass
    regardless of language count. Exact integer piece/char sums; two
    final divisions."""
    d = t(spark, sf_dir, "documents")
    words, _ = _bpe_train(spark, sf_dir)
    seg = words.select(
        "w",
        F.size(
            F.filter(F.split("seq", " "), lambda x: x != "")
        ).cast("long").alias("n_pieces"),
    )
    lw = (
        d.select("lang", F.explode(tokens("text")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("lang", "w")
        .agg(F.count("*").alias("flang"))
    )
    j = lw.join(F.broadcast(seg), "w")
    return j.groupBy("lang").agg(
        F.sum("flang").alias("n_words"),
        F.sum(F.col("flang") * F.col("n_pieces")).alias("n_tokens"),
        F.sum(F.col("flang") * F.length("w")).alias("n_chars"),
        F.round(
            F.sum(F.col("flang") * F.col("n_pieces")).cast("double")
            / F.sum("flang"),
            6,
        ).alias("tokens_per_word"),
        F.round(
            F.sum(F.col("flang") * F.length("w")).cast("double")
            / F.sum(F.col("flang") * F.col("n_pieces")),
            6,
        ).alias("chars_per_token"),
    )
