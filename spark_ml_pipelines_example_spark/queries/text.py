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
    # the bigram total rides IN the plan as a broadcast 1-row aggregate
    # (the _kn_doc_scores n_types change): the eager count was a separate
    # full-corpus re-tokenization job per invocation; count -> double is
    # exact, so PMI is bit-identical
    tot = bg.agg(F.count("*").cast("double").alias("total"))
    pmi = F.log(F.col("c12") * F.col("total") / (F.col("c1") * F.col("c2")))
    return (
        bgc.filter(F.col("c12") >= PMI_MIN_COUNT)
        .join(F.broadcast(n1), "w1")
        .join(F.broadcast(n2), "w2")
        .crossJoin(F.broadcast(tot))
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


# Driver-replay ceiling for the BPE merge loop: the word-frequency dict
# is vocabulary-bounded (31 distinct words at every fixture SF; even a
# 100 TB web corpus's distinct-word dict is tens of millions), and the
# merge rounds are a pure function of it. Past the cap the per-round
# distributed loop runs instead.
_BPE_DICT_CAP = 2_000_000


def _bpe_train(spark, sf_dir):
    """Shared BPE merge loop: returns (final word-dict frame with merged
    ``seq`` strings, list of 1-row per-step winner frames).

    Returns (word-dict frame, winners frame (step,l,r,cnt)).

    r12 (guide §1.2 job-count reduction, the logreg/drift playbook): the
    corpus collapses to the distinct word-frequency dict in ONE
    combinable aggregate; every subsequent statistic — per-round pair
    counts, the (cnt DESC, l, r) winner, the ``replace`` rewrite — is a
    pure function of that vocabulary-bounded dict, so the BPE_MERGES
    rounds replay on the driver over exact Python ints instead of 2+
    eager Spark jobs per round (the pre-r12 loop paid 13 jobs of pure
    overhead on a 31-word dict: ~1.2 s at sf0.1). Equivalence op by op:
    pair counts are integer sums (order-free); the winner is
    min(-cnt, l, r) — Python's code-point string order IS Spark's
    UTF8String binary order (UTF-8 preserves code-point order); the
    seed split replays regexp_replace(w,'(.)',' $1') via re.sub (same
    any-char-but-newline semantics); ``str.replace`` performs the same
    greedy left-to-right non-overlapping scan as Spark/DuckDB replace.
    Dicts past _BPE_DICT_CAP take the verbatim distributed loop
    (_bpe_train_distributed)."""
    import re

    d = t(spark, sf_dir, "documents")
    wf = (
        d.select(F.explode(tokens("text")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )
    # limit(cap+1) is exact here: fewer than cap+1 rows back means the
    # limit was not binding, i.e. we hold the WHOLE dict.
    rows = wf.limit(_BPE_DICT_CAP + 1).collect()
    if len(rows) > _BPE_DICT_CAP:
        return _bpe_train_distributed(spark, sf_dir)
    words = [
        (r["w"], int(r["freq"]), re.sub("(.)", r" \1", r["w"]) + " </w>")
        for r in rows
    ]
    winners: list[tuple[int, str, str, int]] = []
    for k in range(1, BPE_MERGES + 1):
        pc: dict[tuple[str, str], int] = {}
        for _w, freq, seq in words:
            syms = seq.split(" ")
            for i in range(1, len(syms) - 1):
                key = (syms[i], syms[i + 1])
                pc[key] = pc.get(key, 0) + freq
        if not pc:
            # fully-merged dict: the distributed loop's empty top frame
            # empties the word dict and leaves every later step rowless —
            # replicate (no winner rows for steps >= k, empty word dict)
            words = []
            break
        (l, r), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        winners.append((k, l, r, cnt))
        words = [
            (w, freq, seq.replace(f" {l} {r}", f" {l}{r}"))
            for w, freq, seq in words
        ]
    wdf = spark.createDataFrame(words, "w string, freq long, seq string")
    # ONE local winners frame (a union of 6 single-row frames measured
    # ~1 s of per-branch AQE/job overhead on count)
    tops = spark.createDataFrame(winners, "step int, l string, r string, cnt long")
    return wdf, tops


def _bpe_train_distributed(spark, sf_dir):
    """The pre-r12 per-round distributed merge loop, kept as the
    past-cap fallback (winner frames now unioned here so both paths
    return one (step,l,r,cnt) frame). Both stages localCheckpoint per
    round — the word dict is vocabulary-sized, so the checkpoint is
    cheap and it truncates the exponential lineage the round-over-round
    self-reference would otherwise build."""
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
    out = tops[0]
    for tdf in tops[1:]:
        out = out.unionByName(tdf)
    return words, out


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
    return tops.select(
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


@query(
    "q_text_bm25_topk",
    oracle="""
    WITH dl AS (
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
        FROM documents
    ),
    corpus AS (SELECT COUNT(*) AS n, SUM(dl) AS t FROM dl),
    tf AS (
        SELECT doc_id, tok, COUNT(*) AS tf
        FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents)
        WHERE tok IN ('join', 'filter', 'vector', 'slow')
        GROUP BY doc_id, tok
    ),
    df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
    scored AS (
        SELECT tf.doc_id,
               ROUND(ln((2 * c.n + 2) / CAST(2 * df.df + 1 AS DOUBLE))
                     * (CAST(44 * c.t * tf.tf AS DOUBLE)
                        / (20 * c.t * tf.tf + 6 * c.t + 18 * dl.dl * c.n)),
                     6) AS contrib
        FROM tf
        JOIN df USING (tok)
        JOIN dl USING (doc_id)
        CROSS JOIN corpus c
    ),
    agg AS (
        SELECT doc_id, SUM(CAST(contrib AS DECIMAL(18,6))) AS score_d
        FROM scored GROUP BY doc_id
    )
    SELECT doc_id, CAST(score_d AS DOUBLE) AS score,
           ROW_NUMBER() OVER (ORDER BY score_d DESC, doc_id) AS rk
    FROM agg ORDER BY score_d DESC, doc_id LIMIT 10
    """,
    tags=("text", "bm25", "retrieval", "training-data"),
)
def q_text_bm25_topk(spark, sf_dir):
    """Okapi BM25 retrieval (k1=1.2, b=0.75): top-10 documents for a
    fixed 4-term query — the lexical retriever under targeted data
    curation (benchmark-similar corpus selection, dedup-by-query,
    retrieval-augmented filtering). All BM25 rationals are EXACT-INTEGER
    by clearing denominators — with avgdl = T/N the normalized tf
    becomes 44·T·tf / (20·T·tf + 6·T + 18·dl·N) (k1=6/5, b=3/4 scaled
    by 20·T), so the only floats are one ln of an integer ratio (the
    +1-smoothed idf ln((2N+2)/(2df+1))) and one division of exact
    int64s; per-term contributions are rounded at 6dp and summed as
    DECIMAL(18,6) (order-independent, the PSI/IV discipline), and the
    ranking sorts the exact decimal.

    Scale shape: the token stream is filtered to the query terms BEFORE
    any aggregate (a literal IN — predicate-pushdown-friendly and tiny
    output), so the scoring run is ONE fact pass: N, T, and the
    |query terms| document frequencies all fold in as LITERALS from two
    construction-time aggregates (a real engine serves query-term df
    from index statistics; folding keeps the hot plan scan → explode →
    filter → two combinable aggregates → TakeOrderedAndProject, no join
    at all — the first cut's broadcast-df join re-scanned the token
    stream for the df branch, PLANS.md pins the joinless shape). The
    rank window runs on the 10-row frame. The integer products run
    through DECIMAL(38,0) (bm25_tfn_col): petabyte token totals
    overflow int64, and the widening is value-identical wherever int64
    suffices — 100 TB-true, not 100 TB-annotated (VERDICT r8 #6)."""
    agg = bm25_score_frame(spark, sf_dir, BM25_QUERY_TERMS)
    top = agg.orderBy(F.col("score_d").desc(), "doc_id").limit(10)
    w = W.orderBy(F.col("score_d").desc(), "doc_id")
    return top.select(
        "doc_id",
        F.col("score_d").cast("double").alias("score"),
        F.row_number().over(w).alias("rk"),
    )


BM25_QUERY_TERMS = ("join", "filter", "vector", "slow")


def bm25_tfn_col(tot: int, n_docs: int):
    """The integer-cleared BM25 tf normalization
    44·T·tf / (20·T·tf + 6·T + 18·dl·N) over columns ``tf``/``dl`` —
    widened through DECIMAL(38,0) (VERDICT r8 #6): at petabyte token
    totals (T ~ 1e15) the int64 products 20·T·tf and 18·dl·N overflow
    2^63 and Spark (non-ANSI) would WRAP SILENTLY while the DuckDB
    oracle raises — a cross-engine divergence waiting for scale.
    Decimal(38,0) holds ~1e38 (T·tf to ~1e34), and for every value that
    fits int64 the decimal→double cast is the identical correctly-
    rounded conversion, so fixture-scale hashes are unchanged (pinned
    in tests/test_round9.py at simulated petabyte magnitudes)."""
    d38 = "decimal(38,0)"
    T = F.lit(tot).cast(d38)
    N = F.lit(n_docs).cast(d38)
    tf38 = F.col("tf").cast(d38)
    dl38 = F.col("dl").cast(d38)
    num = (F.lit(44).cast(d38) * T * tf38).cast("double")
    den = (
        F.lit(20).cast(d38) * T * tf38
        + F.lit(6).cast(d38) * T
        + F.lit(18).cast(d38) * dl38 * N
    ).cast("double")
    return num / den


def bm25_score_frame(spark, sf_dir, query_terms):
    """Exact-decimal BM25 scores (doc_id, score_d DECIMAL(18,6)) for the
    literal ``query_terms`` — the scoring core shared by q_text_bm25_topk
    and the RRF hybrid retriever (queries/similarity.py
    q_sim_rrf_fusion). See q_text_bm25_topk's docstring for the
    integer-clearing derivation and the one-fact-pass plan contract.
    RUNS two construction-time aggregates (N/T and per-term df fold in
    as literals) — callers are registered in _DEFER_CONSTRUCTION."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("tk")
    ).withColumn("dl", F.size("tk").cast("long"))
    n_docs, tot = d.agg(F.count("*"), F.sum("dl")).first()
    n_docs, tot = int(n_docs), int(tot)

    toks = d.select("doc_id", "dl", F.explode("tk").alias("tok")).filter(
        F.col("tok").isin(*query_terms)
    )
    tf = toks.groupBy("doc_id", "dl", "tok").agg(F.count("*").alias("tf"))
    dfs = {
        r["tok"]: int(r["df"])
        for r in tf.groupBy("tok").agg(F.count("*").alias("df")).collect()
    }
    # exact-integer df per term as a literal CASE — the ln stays ENGINE-
    # side (same int64 inputs in Spark and DuckDB -> same IEEE double),
    # never precomputed in Python.
    df_col = F.lit(None).cast("long")
    for term_, df_val in sorted(dfs.items()):
        df_col = F.when(F.col("tok") == term_, F.lit(df_val)).otherwise(df_col)
    idf = F.log(
        F.lit(float(2 * n_docs + 2)) / (2 * df_col + 1).cast("double")
    )
    tfn = bm25_tfn_col(tot, n_docs)
    scored = tf.select("doc_id", F.round(idf * tfn, 6).alias("contrib"))
    return scored.groupBy("doc_id").agg(
        F.sum(F.col("contrib").cast("decimal(18,6)")).alias("score_d")
    )


def g2_cell_term(o, num_row, num_col):
    """One G² contingency-cell term O·ln(O·t / (row·col)) over a frame
    carrying column ``t`` — ADVICE r8 #2: the products o·t and row·col
    reach ~t², which silently wraps int64 in non-ANSI Spark at large
    corpora while the DuckDB oracle raises. Widened through
    DECIMAL(38,0) (holds ~1e38 ≈ (1e19)²); for every value that fits
    int64 the decimal→double cast is the identical correctly-rounded
    conversion, so fixture hashes are unchanged (pinned at simulated
    petabyte magnitudes in tests/test_round9.py)."""
    d38 = "decimal(38,0)"
    num = (o.cast(d38) * F.col("t").cast(d38)).cast("double")
    den = (num_row.cast(d38) * num_col.cast(d38)).cast("double")
    return F.when(o == 0, F.lit(0.0)).otherwise(o * F.log(num / den))


@query(
    "q_text_keyness_loglik",
    oracle="""
    WITH cnt AS (
        SELECT source, tok, COUNT(*) AS a
        FROM (SELECT source, UNNEST(string_split(text, ' ')) AS tok FROM documents)
        GROUP BY source, tok
    ),
    ct AS (SELECT tok, SUM(a) AS ct FROM cnt GROUP BY tok),
    cs AS (SELECT source, SUM(a) AS cs FROM cnt GROUP BY source),
    tot AS (SELECT SUM(a) AS t FROM cnt),
    cells AS (
        SELECT c.source, c.tok, c.a,
               ct.ct - c.a AS b,
               cs.cs - c.a AS cc,
               t.t - ct.ct - cs.cs + c.a AS d,
               ct.ct AS ct, cs.cs AS cs, t.t AS t
        FROM cnt c JOIN ct USING (tok) JOIN cs USING (source) CROSS JOIN tot t
    ),
    g AS (
        SELECT source, tok, a,
               ROUND(2 * (
                 (CASE WHEN a  = 0 THEN 0 ELSE a  * ln(CAST(a  * t AS DOUBLE) / (ct * cs)) END)
               + (CASE WHEN b  = 0 THEN 0 ELSE b  * ln(CAST(b  * t AS DOUBLE) / (ct * (t - cs))) END)
               + (CASE WHEN cc = 0 THEN 0 ELSE cc * ln(CAST(cc * t AS DOUBLE) / ((t - ct) * cs)) END)
               + (CASE WHEN d  = 0 THEN 0 ELSE d  * ln(CAST(d  * t AS DOUBLE) / ((t - ct) * (t - cs))) END)
               ), 6) AS g2
        FROM cells
    )
    SELECT source, tok, a AS cnt, g2, rk FROM (
        SELECT source, tok, a, g2,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY g2 DESC, tok) AS rk
        FROM g
    ) WHERE rk <= 3
    """,
    tags=("text", "keyness", "log-likelihood", "corpus-analysis"),
)
def q_text_keyness_loglik(spark, sf_dir):
    """Per-source keyness via the log-likelihood ratio (Dunning's G²,
    the corpus-linguistics keyword statistic): for every (source, term)
    the 2x2 contingency (term in source vs term elsewhere) scored
    G² = 2 Σ O·ln(O/E), top-3 most DISTINCTIVE terms per source. Unlike
    TF-IDF (per-document weighting), keyness contrasts a subcorpus
    against the rest — the domain-signature readout a mixture pipeline
    uses to audit what each source actually contributes.

    Scale shape: ONE combinable (source, term) count aggregate touches
    the fact table; every marginal (per-term, per-source, grand total)
    derives from that |sources|x|vocab| frame, so all G² math runs on a
    KB-scale frame. Floats: each cell term is O·ln of a division of
    exact integer products — widened through DECIMAL(38,0) because the
    products reach ~t² and would silently wrap int64 at large corpora
    (ADVICE r8 #2; the oracle's int64 form raises instead of wrapping,
    and both agree exactly wherever int64 suffices) — the four terms
    summed in a fixed spelled order and rounded once at 6dp (both
    engines evaluate the identical expression tree); ranking uses the
    rounded value with a term tie-break."""
    ex = t(spark, sf_dir, "documents").select(
        "source", F.explode(tokens("text")).alias("tok")
    )
    cnt = ex.groupBy("source", "tok").agg(F.count("*").alias("a"))
    ct = cnt.groupBy("tok").agg(F.sum("a").alias("ct"))
    cs = cnt.groupBy("source").agg(F.sum("a").alias("cs"))
    tot = cnt.agg(F.sum("a").alias("t"))
    cells = (
        cnt.join(F.broadcast(ct), "tok")
        .join(F.broadcast(cs), "source")
        .crossJoin(F.broadcast(tot))
        .withColumn("b", F.col("ct") - F.col("a"))
        .withColumn("cc", F.col("cs") - F.col("a"))
        .withColumn("d", F.col("t") - F.col("ct") - F.col("cs") + F.col("a"))
    )

    term = g2_cell_term
    t_, ct_, cs_ = F.col("t"), F.col("ct"), F.col("cs")
    g2 = F.round(
        2
        * (
            term(F.col("a"), ct_, cs_)
            + term(F.col("b"), ct_, t_ - cs_)
            + term(F.col("cc"), t_ - ct_, cs_)
            + term(F.col("d"), t_ - ct_, t_ - cs_)
        ),
        6,
    )
    g = cells.select("source", "tok", F.col("a").alias("cnt"), g2.alias("g2"))
    w = W.partitionBy("source").orderBy(F.col("g2").desc(), "tok")
    return (
        g.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("source", "tok", "cnt", "g2", "rk")
    )
