"""Similarity-search queries over `embeddings` (north-star extensions).

`q_sim_cosine_topk` is the brute-force baseline (the oracle-checkable
ground truth); `q_sim_pairwise_sample` is the blocked pairwise kernel.
The IVF-bucketed ANN scale path lives in ``operators/similarity.py``
(rows-only `q_sim_ann_ivf` — recall measured against the brute-force
baseline in tests).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.similarity import cosine_prenorm, cosine_probe, l2_norm
from ._util import t
from .registry import query


@query(
    "q_sim_cosine_topk",
    oracle="""
    WITH probe AS (
        SELECT CAST(embedding AS DOUBLE[]) AS p FROM embeddings WHERE vec_id = 0
    ), scored AS (
        SELECT vec_id,
               list_dot_product(e, p)
                 / (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(p, p))) AS cos
        FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
              FROM embeddings WHERE vec_id <> 0), probe
    )
    SELECT vec_id, ROUND(cos, 6) AS cos_sim
    FROM scored ORDER BY cos DESC, vec_id LIMIT 10
    """,
    tags=("similarity", "topk"),
)
def q_sim_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-10 neighbors of vector 0 — the
    zip_with/aggregate kernel (pure codegen, no UDF), TakeOrdered for the
    top-k. The probe is fetched once driver-side (a 1-row lookup) and
    inlined as a literal so the scan side stays embarrassingly parallel —
    at 100 TB this is one broadcast-free pass over the corpus."""
    e = t(spark, sf_dir, "embeddings")
    probe_vec = e.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    cos = cosine_probe(F.col("embedding"), list(probe_vec))
    return (
        e.filter(F.col("vec_id") != 0)
        .select("vec_id", cos.alias("cos"))
        .orderBy(F.col("cos").desc(), "vec_id")
        .limit(10)
        .select("vec_id", F.round("cos", 6).alias("cos_sim"))
    )


@query(
    "q_sim_random_projection",
    oracle="""
    SELECT vec_id, g.j AS j,
           ROUND(list_sum(list_transform(range(64), i ->
               CAST(embedding[i + 1] AS DOUBLE) *
               (CASE WHEN (i * 73 + g.j * 151) % 2 = 0 THEN 1.0 ELSE -1.0 END))),
                 4) AS comp
    FROM embeddings, range(16) g(j)
    """,
    tags=("similarity", "projection", "dimensionality-reduction"),
)
def q_sim_random_projection(spark, sf_dir):
    """Johnson-Lindenstrauss random projection 64 → 16 dims with a
    DETERMINISTIC ±1 projection matrix (sign = parity of a linear hash
    of (i, j), identical in both engines — no RNG state to ship).
    Output is exploded to (vec_id, j, comp) rows, scalar cells only.

    Entirely inside whole-stage codegen: nested HOFs
    (transform ∘ aggregate) compute R·x per row with zero shuffle and
    zero Python — the map-only shape that runs at scan speed on 100 TB.
    Sign projections (Achlioptas 2001) need only the row index pair, so
    the 'matrix' is never materialized or broadcast.
    """
    e = t(spark, sf_dir, "embeddings")
    sign = (
        "CASE WHEN pmod(i * 73 + j * 151, 2) = 0 "
        "THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END"
    )
    proj = F.expr(
        "transform(sequence(0, 15), j -> "
        "  round(aggregate(sequence(0, 63), cast(0.0 as double), (acc, i) -> "
        f"    acc + cast(element_at(embedding, i + 1) as double) * ({sign})), 4))"
    )
    return (
        e.select("vec_id", F.posexplode(proj).alias("j", "comp"))
        .select("vec_id", F.col("j").cast("long").alias("j"), "comp")
    )


@query(
    "q_sim_pairwise_sample",
    oracle="""
    WITH sample AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
        FROM embeddings WHERE vec_id % 10 = 0
    )
    SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_dot_product(a.e, b.e)
                 / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))),
                 6) AS cos_sim
    FROM sample a JOIN sample b ON a.label = b.label AND a.vec_id < b.vec_id
    """,
    tags=("similarity", "pairwise"),
)
def q_sim_pairwise_sample(spark, sf_dir):
    """Label-blocked pairwise cosine on a 10% sample: the self-join is
    keyed on the block (label), so pair volume is Σ block² — the blocked
    shape every large-scale pairwise-similarity job needs. Each side's
    norm is projected BEFORE the join (per-vector O(n) work) so the
    per-pair cost is a single dot; the probe side is spread across
    partitions so the pair explosion parallelizes even when the input
    is one small file (at real scale the join shuffle does this)."""
    e = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 10 == 0)
    a = e.repartition(32, "vec_id").select(
        "label",
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("ea"),
        l2_norm(F.col("embedding")).alias("na"),
    )
    b = e.select(
        F.col("label").alias("label_b"),
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("eb"),
        l2_norm(F.col("embedding")).alias("nb"),
    )
    cos = cosine_prenorm(F.col("ea"), F.col("eb"), F.col("na"), F.col("nb"))
    return a.join(b, (a.label == b.label_b) & (F.col("id_a") < F.col("id_b"))).select(
        "label", "id_a", "id_b", F.round(cos, 6).alias("cos_sim")
    )


@query(
    "q_embed_quantize",
    oracle="""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), p AS (
        SELECT vec_id, v,
               list_min(v) AS lo,
               GREATEST(list_max(v) - list_min(v), 1e-12) AS span
        FROM e
    ), q AS (
        SELECT vec_id, lo, span,
               list_transform(v, x ->
                   CAST(LEAST(FLOOR((x - lo) * 256 / span), 255) AS BIGINT)) AS codes,
               v
        FROM p
    )
    SELECT vec_id,
           CAST(list_sum(codes) AS BIGINT) AS sum_codes,
           ROUND(lo, 6) AS zero_point,
           ROUND(span / 256, 6) AS scale,
           ROUND(list_sum(list_transform(range(1, 65),
                 i -> abs(v[i] - (lo + (codes[i] + 0.5) * span / 256)))) / 64,
                 6) AS mae
    FROM q
    """,
    tags=("similarity", "quantization", "training-data"),
)
def q_embed_quantize(spark, sf_dir):
    """Per-vector int8 affine quantization of the embedding column — the
    4× storage/bandwidth compression every vector store applies before
    ANN serving. code = floor((x - min)·256 / span) clamped to 255
    (floor, not round: floor of the same IEEE double is identical in
    every engine, while round differs in tie rules); dequant uses the
    bucket midpoint. Declared output is scalar-only (code checksum +
    zero-point/scale + mean reconstruction error) per the harness's
    no-array-cells rule; the codes array itself is an intermediate.
    Pure nested HOFs — map-only, zero shuffle, zero Python. (On the
    one-file local fixture this runs as a single task; deliberately NOT
    repartitioned — a shuffle would cost more than it saves on a
    map-only pass, and any real deployment's input has many splits.)"""
    e = t(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    lo = F.array_min(v)
    span = F.greatest(F.array_max(v) - lo, F.lit(1e-12))
    codes = F.transform(
        v, lambda x: F.least(F.floor((x - lo) * 256 / span), F.lit(255)).cast("long")
    )
    dq = F.zip_with(
        v, codes, lambda x, c: F.abs(x - (lo + (c + F.lit(0.5)) * span / 256))
    )
    return e.select(
        "vec_id",
        F.aggregate(codes, F.lit(0).cast("long"), lambda a, x: a + x).alias(
            "sum_codes"
        ),
        F.round(lo, 6).alias("zero_point"),
        F.round(span / 256, 6).alias("scale"),
        F.round(
            F.aggregate(dq, F.lit(0.0), lambda a, x: a + x) / 64, 6
        ).alias("mae"),
    )


@query(
    "q_embed_drift",
    oracle="""
    WITH q AS (
        SELECT vec_id % 2 AS half, i - 1 AS dim,
               CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) AS qi
        FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i)
    ), sums AS (
        SELECT dim,
               CAST(SUM(CASE WHEN half = 0 THEN qi END) AS BIGINT) AS sa,
               CAST(SUM(CASE WHEN half = 1 THEN qi END) AS BIGINT) AS sb,
               COUNT(CASE WHEN half = 0 THEN 1 END) AS na,
               COUNT(CASE WHEN half = 1 THEN 1 END) AS nb
        FROM q GROUP BY 1
    )
    SELECT CAST(MAX(na) AS BIGINT) AS n_a, CAST(MAX(nb) AS BIGINT) AS n_b,
           ROUND(CAST(SUM(sa * sb) AS DOUBLE)
                 / SQRT(CAST(SUM(sa * sa) AS DOUBLE)
                        * CAST(SUM(sb * sb) AS DOUBLE)), 6) AS centroid_cosine,
           ROUND(SQRT(SUM(POW(CAST(sa AS DOUBLE) / na
                              - CAST(sb AS DOUBLE) / nb, 2))) / 1000, 6)
               AS centroid_l2_shift_units
    FROM sums
    """,
    tags=("similarity", "embedding", "drift", "monitoring"),
)
def q_embed_drift(spark, sf_dir):
    """Embedding-distribution drift between two corpus halves (vec_id
    parity standing in for before/after periods): cosine between the
    half centroids and the L2 shift between them — the cheap vector-
    space drift monitor run before anything expensive (a retrain, an
    index rebuild). Determinism trick: elements are FLOOR-quantized to
    integer milli-units first (floor has no rounding-tie ambiguity,
    unlike round/cast), so the per-dimension sums are exact integers,
    cosine derives from integer Σsa·sb (scale-invariance makes sums ≡
    means), and the only floats are two final expressions over the
    64-dim frame. One posexplode + one (dim)-keyed aggregate — n·d map
    work, d-row reduce, same shape MLlib uses for covariance."""
    e = t(spark, sf_dir, "embeddings")
    q = e.select(
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "val"),
    ).select("half", "dim", F.floor(F.col("val") * 1000).cast("long").alias("qi"))
    sums = q.groupBy("dim").agg(
        F.sum(F.when(F.col("half") == 0, F.col("qi"))).alias("sa"),
        F.sum(F.when(F.col("half") == 1, F.col("qi"))).alias("sb"),
        F.count(F.when(F.col("half") == 0, 1)).alias("na"),
        F.count(F.when(F.col("half") == 1, 1)).alias("nb"),
    )
    return sums.agg(
        F.max("na").alias("n_a"),
        F.max("nb").alias("n_b"),
        F.round(
            F.sum(F.col("sa") * F.col("sb")).cast("double")
            / F.sqrt(
                F.sum(F.col("sa") * F.col("sa")).cast("double")
                * F.sum(F.col("sb") * F.col("sb")).cast("double")
            ),
            6,
        ).alias("centroid_cosine"),
        F.round(
            F.sqrt(
                F.sum(
                    F.pow(
                        F.col("sa").cast("double") / F.col("na")
                        - F.col("sb").cast("double") / F.col("nb"),
                        2,
                    )
                )
            )
            / 1000,
            6,
        ).alias("centroid_l2_shift_units"),
    )


@query(
    "q_sim_maxsim",
    oracle="""
    WITH probe AS (
        SELECT CAST(embedding AS DOUBLE[]) AS p FROM embeddings WHERE vec_id = 0
    ), docs AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
        FROM embeddings WHERE vec_id <> 0
    ), scored AS (
        SELECT vec_id,
               list_sum(list_transform(range(4), qi ->
                   list_max(list_transform(range(4), ti ->
                       list_dot_product(p[qi*16+1 : qi*16+16],
                                        e[ti*16+1 : ti*16+16])
                       / (sqrt(list_dot_product(p[qi*16+1 : qi*16+16],
                                                p[qi*16+1 : qi*16+16]))
                          * sqrt(list_dot_product(e[ti*16+1 : ti*16+16],
                                                  e[ti*16+1 : ti*16+16])))
                   ))
               )) AS raw
        FROM docs, probe
    )
    SELECT vec_id, ROUND(raw, 6) AS maxsim
    FROM scored ORDER BY raw DESC, vec_id LIMIT 10
    """,
    tags=("similarity", "late-interaction", "maxsim", "topk"),
)
def q_sim_maxsim(spark, sf_dir):
    """ColBERT-style late-interaction MaxSim retrieval (Khattab &
    Zaharia, SIGIR 2020): each 64-dim vector is treated as 4 token
    sub-vectors of 16 dims; score(query, doc) = sum over query tokens of
    the MAX cosine against any doc token. Late interaction is the
    standard middle ground between single-vector cosine (too coarse) and
    full cross-attention (not precomputable) for LLM retrieval corpora.

    Spark shape mirrors q_sim_cosine_topk's scale contract: the probe's 4
    sub-vectors and their norms fold to literals driver-side (1-row
    lookup), the doc side is sliced with `slice` and scored with the
    zip_with/aggregate dot kernel — one broadcast-free, shuffle-free pass
    over the corpus, TakeOrdered top-k. sum-of-max over a 4x4 score grid
    is exact (max is order-free; the 4-term outer sum is a fixed-order
    fold in both engines), so only the inner dot products carry the
    shared round-to-6 discipline."""
    import math

    import numpy as np

    e = t(spark, sf_dir, "embeddings")
    probe_vec = [
        float(v)
        for v in e.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    ]
    p_subs = []
    for qi in range(4):
        sub = probe_vec[qi * 16 : (qi + 1) * 16]
        sq = 0.0
        for v in sub:  # same left-to-right fold as the engines
            sq = sq + v * v
        p_subs.append((np.array(sub, dtype=np.float64), math.sqrt(sq)))

    # The 4×4 sub-cosine grid as one Arrow-batched numpy pass (r11; the
    # 16-expression HOF tree evaluated 16 interpreted dot folds + 16 norm
    # folds per row). Bit-exactness: every fold below is an np.cumsum —
    # the identical left-to-right double adds the zip_with/aggregate
    # kernel (and DuckDB's list_dot_product) performs — products, the
    # norm·norm multiply, the division, the 4-way max, and the
    # fixed-order 4-term outer sum are all the same single IEEE ops in
    # the same order, so the scores equal the old expression tree (and
    # the oracle) bit for bit.
    def score(batches):
        import pyarrow as pa

        from ..operators._arrow import list_mat

        def fold(rows):  # left-fold sum per row, like aggregate(acc + x)
            return np.cumsum(rows, axis=1)[:, -1]

        for b in batches:
            if not b.num_rows:
                continue
            E = list_mat(b.column("embedding"), 64, dtype=np.float64)
            subs = [E[:, ti * 16 : (ti + 1) * 16] for ti in range(4)]
            norms = [np.sqrt(fold(s * s)) for s in subs]
            raw = np.zeros(len(E), dtype=np.float64)
            for psub, pn in p_subs:
                g = None
                for ti in range(4):
                    cos = fold(subs[ti] * psub[None, :]) / (norms[ti] * pn)
                    g = cos if g is None else np.maximum(g, cos)
                raw = raw + g
            yield pa.RecordBatch.from_arrays(
                [b.column("vec_id"), pa.array(raw)], names=["vec_id", "raw"]
            )

    scored = (
        e.filter(F.col("vec_id") != 0)
        .select("vec_id", "embedding")
        .mapInArrow(score, "vec_id long, raw double")
    )
    return (
        scored.orderBy(F.col("raw").desc(), "vec_id")
        .limit(10)
        .select("vec_id", F.round("raw", 6).alias("maxsim"))
    )


@query(
    "q_sim_rrf_fusion",
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
    bm AS (
        SELECT doc_id, SUM(CAST(contrib AS DECIMAL(18,6))) AS score_d
        FROM scored GROUP BY doc_id
    ),
    lex AS (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score_d DESC, doc_id) AS rb
        FROM (SELECT * FROM bm ORDER BY score_d DESC, doc_id LIMIT 50)
    ),
    probe AS (
        SELECT CAST(embedding AS DOUBLE[]) AS p FROM embeddings WHERE vec_id = 0
    ),
    cosv AS (
        SELECT vec_id AS doc_id,
               ROUND(list_dot_product(e, p)
                     / (sqrt(list_dot_product(e, e))
                        * sqrt(list_dot_product(p, p))), 6) AS cosr
        FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
              FROM embeddings WHERE vec_id <> 0), probe
    ),
    sem AS (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cosr DESC, doc_id) AS rc
        FROM (SELECT * FROM cosv ORDER BY cosr DESC, doc_id LIMIT 50)
    ),
    fused AS (
        SELECT doc_id, rb, rc,
               ROUND(COALESCE(CAST(1.0 AS DOUBLE) / (60 + rb), 0)
                     + COALESCE(CAST(1.0 AS DOUBLE) / (60 + rc), 0), 6) AS rrf
        FROM lex FULL JOIN sem USING (doc_id)
    )
    SELECT doc_id, rb, rc, rrf,
           ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS rk
    FROM (SELECT * FROM fused ORDER BY rrf DESC, doc_id LIMIT 10)
    """,
    tags=("similarity", "rrf", "hybrid-retrieval", "training-data"),
)
def q_sim_rrf_fusion(spark, sf_dir):
    """Hybrid retrieval via Reciprocal Rank Fusion (Cormack et al. 2009,
    the standard lexical+semantic combiner): fuse the BM25 top-50 for
    the fixed 4-term query (queries/text.py bm25_score_frame — the
    fixture's embeddings are keyed 1:1 with documents) with the
    cosine-to-probe top-50 (vector 0, the q_sim_cosine_topk kernel),
    score = Σ_runs 1/(60 + rank), report the fused top-10 with both
    per-run ranks. Docs present in only one run contribute one term —
    RRF needs no score calibration between runs, which is exactly why
    production retrieval stacks use it.

    Determinism: both runs rank on EXACT quantities (the decimal BM25
    sum; cosine rounded at 6dp) with doc_id tie-breaks, so the integer
    ranks are cross-engine stable; the fusion arithmetic is two double
    divisions of small exact integers added in a fixed spelled order and
    rounded once.

    Scale shape: each run is its retriever's own scale contract (BM25:
    one fact pass + TakeOrdered; cosine: one broadcast-free corpus scan
    + TakeOrdered); everything after the two top-50 cuts — rank windows,
    the FULL OUTER fuse, the final top-10 — runs on ≤ 100 rows. Fusion
    adds ZERO fact-scale work to the retrievers it combines."""
    from .text import BM25_QUERY_TERMS, bm25_score_frame

    bm = bm25_score_frame(spark, sf_dir, BM25_QUERY_TERMS)
    lex50 = bm.orderBy(F.col("score_d").desc(), "doc_id").limit(50)
    w_lex = W.orderBy(F.col("score_d").desc(), "doc_id")
    lex = lex50.select(
        "doc_id", F.row_number().over(w_lex).cast("long").alias("rb")
    )

    e = t(spark, sf_dir, "embeddings")
    probe_vec = e.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    cosr = F.round(cosine_probe(F.col("embedding"), list(probe_vec)), 6)
    sem50 = (
        e.filter(F.col("vec_id") != 0)
        .select(F.col("vec_id").alias("doc_id"), cosr.alias("cosr"))
        .orderBy(F.col("cosr").desc(), "doc_id")
        .limit(50)
    )
    w_sem = W.orderBy(F.col("cosr").desc(), "doc_id")
    sem = sem50.select(
        "doc_id", F.row_number().over(w_sem).cast("long").alias("rc")
    )

    fused = lex.join(sem, "doc_id", "full").select(
        "doc_id",
        "rb",
        "rc",
        F.round(
            F.coalesce(F.lit(1.0) / (60 + F.col("rb")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (60 + F.col("rc")), F.lit(0.0)),
            6,
        ).alias("rrf"),
    )
    top = fused.orderBy(F.col("rrf").desc(), "doc_id").limit(10)
    w = W.orderBy(F.col("rrf").desc(), "doc_id")
    return top.select(
        "doc_id", "rb", "rc", "rrf",
        F.row_number().over(w).cast("long").alias("rk"),
    )


HN_K = 5  # hard negatives mined per probe
HN_PROBE_MOD = 20  # held-out probe stride (same as the kNN eval's)
HN_DUP_BAR = 0.95  # cos >= bar treated as a near-duplicate, not a negative


def _hard_negatives_oracle() -> str:
    from ..operators.similarity import ivf_routing_oracle_parts

    parts = ivf_routing_oracle_parts(HN_PROBE_MOD)
    parts += [
        "pairs AS (SELECT cand.pid, pe.label AS plabel, cand.cid, "
        "ce.label AS neg_label, "
        "list_dot_product(pe.v, ce.v) / (pe.nrm * ce.nrm) AS cos "
        "FROM cand JOIN e pe ON pe.vec_id = cand.pid "
        "JOIN e ce ON ce.vec_id = cand.cid)",
        f"neg AS (SELECT pid, cid, neg_label, cos FROM pairs "
        f"WHERE neg_label <> plabel AND cos < {HN_DUP_BAR})",
        "ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY pid "
        "ORDER BY cos DESC, cid) AS rk FROM neg)",
    ]
    return (
        "WITH " + ",\n".join(parts) + "\n"
        f"SELECT pid, rk, cid, neg_label, ROUND(cos, 6) AS cos_sim "
        f"FROM ranked WHERE rk <= {HN_K}"
    )


@query(
    "q_sim_hard_negatives",
    oracle=_hard_negatives_oracle(),
    tags=("similarity", "hard-negatives", "contrastive", "ann", "ivf", "training-data"),
)
def q_sim_hard_negatives(spark, sf_dir):
    """Hard-negative mining for contrastive training: for every held-out
    probe (each HN_PROBE_MOD-th vector), the HN_K most-cosine-similar
    corpus vectors whose LABEL DIFFERS (similar-but-wrong — the
    negatives that actually move an embedding model; random negatives
    are trivially separable). Vectors at cos ≥ HN_DUP_BAR are excluded
    as near-duplicates/mislabels rather than negatives — inert on the
    near-orthogonal fixture (max within-corpus cos ≈ 0.55) but the bar
    is part of the declared semantics, and the comparison is on the
    identical double in both engines so it can never split the hash.

    Scale shape: the shared IVF probe-routing spine
    (operators/similarity.py ivf_probe_routing — ONE equi-join on cell
    against the broadcast probe×nprobe-cell frame, no corpus shuffle;
    the probe set is fixed-size by PROBE_ID_CAP and per-probe work is
    constant under adaptive k, so the whole mining pass is
    corpus-size-independent); label filter + dup bar + one per-probe
    top-K window after WindowGroupLimit pre-truncation.
    Mining negatives over a 100 TB corpus is exactly the IVF serving
    path — the full oracle replays index build + routing + mining end
    to end."""
    from ..operators.similarity import ivf_probe_routing, pair_cosine_arrow

    probes, corpus, pcells = ivf_probe_routing(spark, sf_dir, HN_PROBE_MOD)
    joined = corpus.join(F.broadcast(pcells.join(probes, "pid")), "cell").select(
        "pid",
        "plabel",
        "cid",
        F.col("nlabel").alias("neg_label"),
        "pe",
        "ce",
        "pn",
        "cn",
    )
    # Arrow-batched prenorm cosine (bit-identical to the HOF fold — see
    # pair_cosine_arrow); only the pair metadata + cos leave the kernel
    pairs = pair_cosine_arrow(joined, ["pid", "plabel", "cid", "neg_label"])
    neg = pairs.filter(
        (F.col("neg_label") != F.col("plabel")) & (F.col("cos") < HN_DUP_BAR)
    )
    ranked = neg.withColumn(
        "rk",
        F.row_number().over(W.partitionBy("pid").orderBy(F.col("cos").desc(), "cid")),
    ).filter(F.col("rk") <= HN_K)
    return ranked.select(
        "pid", "rk", "cid", "neg_label", F.round("cos", 6).alias("cos_sim")
    )


RECALL_NPROBES = (1, 2, 4, 6)  # the published IVF tuning curve's x-axis


def _recall_curve_oracle() -> str:
    from ..operators.similarity import _adaptive_k_sql
    from .ml import KMX_PASSES, _kmx_cte_parts

    max_np = max(RECALL_NPROBES)
    np_list = ", ".join(str(n) for n in RECALL_NPROBES)
    parts = _kmx_cte_parts(k_sql=_adaptive_k_sql())
    parts += [
        "pq AS (SELECT xq FROM q WHERE vec_id = 0)",
        f"cm AS (SELECT c, s, CAST(list_sum(list_transform(s, v -> v*v)) AS BIGINT) "
        f"AS ss FROM c{KMX_PASSES - 1})",
        "crank AS (SELECT cm.c, ROW_NUMBER() OVER (ORDER BY "
        "CAST(list_sum(list_transform(list_zip(pq.xq, cm.s), z -> z[1]*z[2])) "
        "AS DOUBLE) / sqrt(CAST(cm.ss AS DOUBLE)) DESC, cm.c) AS crk FROM cm, pq)",
        f"cells AS (SELECT c, crk FROM crank WHERE crk <= {max_np})",
        "probe AS (SELECT CAST(embedding AS DOUBLE[]) AS p FROM embeddings "
        "WHERE vec_id = 0)",
        "escan AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)",
        f"cand AS (SELECT a.vec_id, cells.crk FROM a{KMX_PASSES} a "
        f"JOIN cells ON a.c = cells.c WHERE a.vec_id <> 0)",
        "scored AS (SELECT cand.vec_id, cand.crk, list_dot_product(e.e, p) "
        "/ (sqrt(list_dot_product(e.e, e.e)) * sqrt(list_dot_product(p, p))) AS cos "
        "FROM cand JOIN escan e USING (vec_id), probe)",
        f"np AS (SELECT UNNEST([{np_list}]) AS nprobe)",
        "percand AS (SELECT np.nprobe, s.vec_id, ROW_NUMBER() OVER ("
        "PARTITION BY np.nprobe ORDER BY s.cos DESC, s.vec_id) AS rk "
        "FROM np JOIN scored s ON s.crk <= np.nprobe)",
        "ivf AS (SELECT nprobe, vec_id FROM percand WHERE rk <= 10)",
        "brute AS (SELECT vec_id FROM (SELECT e.vec_id, list_dot_product(e.e, p) "
        "/ (sqrt(list_dot_product(e.e, e.e)) * sqrt(list_dot_product(p, p))) AS cos "
        "FROM escan e, probe WHERE e.vec_id <> 0) ORDER BY cos DESC, vec_id LIMIT 10)",
        "hits AS (SELECT i.nprobe, COUNT(*) AS h FROM ivf i "
        "JOIN brute b USING (vec_id) GROUP BY 1)",
    ]
    return (
        "WITH " + ",\n".join(parts) + "\n"
        "SELECT CAST(np.nprobe AS BIGINT) AS nprobe, "
        "CAST(COALESCE(h.h, 0) AS BIGINT) AS hits, "
        "ROUND(COALESCE(h.h, 0) / 10.0, 6) AS recall_at_10 "
        "FROM np LEFT JOIN hits h USING (nprobe)"
    )


@query(
    "q_sim_ann_recall_curve",
    oracle=_recall_curve_oracle(),
    tags=("similarity", "ann", "ivf", "recall", "tuning"),
)
def q_sim_ann_recall_curve(spark, sf_dir):
    """The IVF nprobe↔recall tuning curve — recall@10 of the indexed
    probe (vector 0) against the brute-force truth at nprobe ∈
    RECALL_NPROBES: the table every ANN deployment publishes before
    picking its operating point (the declared default N_PROBE=6 sits on
    this curve; the near-orthogonal fixture makes it the WORST case —
    real clustered corpora shift the whole curve left).

    Scale shape: cells are NESTED (top-1 ⊂ top-2 ⊂ ... ⊂ top-max), so
    the whole curve costs ONE partition-pruned scan of the max-nprobe
    cells with the cell's rank carried along — each smaller nprobe is a
    filter on cell rank, not a re-scan; the per-nprobe top-10 windows
    and the hit join against the broadcast 10-row truth all run on
    pruned KB-scale frames. The brute-force arm is the same single
    corpus pass q_sim_cosine_topk already makes. Full hash-check: the
    audited Lloyd replay makes every point on the curve deterministic."""
    from ..operators.similarity import (
        _ivf_index_for,
        _quantize_probe,
        rank_cells_audited,
    )

    e = t(spark, sf_dir, "embeddings")
    probe_vec = [float(v) for v in e.filter(F.col("vec_id") == 0).select("embedding").head()[0]]
    assigned, cents = _ivf_index_for(spark, sf_dir)
    max_np = max(RECALL_NPROBES)
    ranked_cells = rank_cells_audited(cents, _quantize_probe(probe_vec), nprobe=max_np)
    crk_df = spark.createDataFrame(
        [(c, i + 1) for i, c in enumerate(ranked_cells)], "cell long, crk long"
    )
    cos = cosine_probe(F.col("embedding"), probe_vec)
    scored = (
        assigned.join(F.broadcast(crk_df), "cell")
        .filter(F.col("vec_id") != 0)
        .select("vec_id", "crk", cos.alias("cos"))
    )
    np_df = spark.createDataFrame([(n,) for n in RECALL_NPROBES], "nprobe long")
    percand = scored.join(
        F.broadcast(np_df), F.col("crk") <= F.col("nprobe")
    ).withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("nprobe").orderBy(F.col("cos").desc(), "vec_id")
        ),
    )
    ivf = percand.filter(F.col("rk") <= 10).select("nprobe", "vec_id")
    brute = (
        e.filter(F.col("vec_id") != 0)
        .select("vec_id", cosine_probe(F.col("embedding"), probe_vec).alias("cos"))
        .orderBy(F.col("cos").desc(), "vec_id")
        .limit(10)
        .select("vec_id")
    )
    hits = ivf.join(F.broadcast(brute), "vec_id").groupBy("nprobe").agg(
        F.count("*").alias("h")
    )
    return (
        np_df.join(hits, "nprobe", "left")
        .select(
            "nprobe",
            F.coalesce(F.col("h"), F.lit(0)).cast("long").alias("hits"),
            F.round(F.coalesce(F.col("h"), F.lit(0)) / 10.0, 6).alias("recall_at_10"),
        )
    )


PQ_M = 4  # product-quantization subspaces (64-dim -> 4 x 16)
PQ_DSUB = 16  # dims per subspace
PQ_K = 16  # codewords per subspace codebook


def _pq_codes_oracle() -> str:
    from .ml import KMX_Q

    lo = f"(m * {PQ_DSUB} + 1)"
    hi = f"((m + 1) * {PQ_DSUB})"
    return f"""
    WITH q AS (
        SELECT vec_id, list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE)*{KMX_Q}) AS BIGINT)) AS xq
        FROM embeddings
    ),
    cb AS (SELECT vec_id AS code, xq FROM q WHERE vec_id < {PQ_K}),
    d AS (
        SELECT q.vec_id, t.m, cb.code,
               CAST(list_sum(list_transform(
                   list_zip(list_slice(q.xq, {lo}, {hi}),
                            list_slice(cb.xq, {lo}, {hi})),
                   z -> (z[1]-z[2])*(z[1]-z[2]))) AS BIGINT) AS dist
        FROM q CROSS JOIN range(0, {PQ_M}) t(m) CROSS JOIN cb
    ),
    a AS (
        SELECT vec_id, m, code, dist FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                         ORDER BY dist, code) AS rk
            FROM d
        ) WHERE rk = 1
    )
    SELECT CAST(m AS BIGINT) AS subspace, CAST(code AS BIGINT) AS code,
           COUNT(*) AS n_vectors,
           CAST(SUM(dist) AS BIGINT) AS sqerr_total,
           ROUND(CAST(SUM(dist) AS DOUBLE) / COUNT(*), 6) AS avg_sqerr
    FROM a GROUP BY 1, 2
    """


@query(
    "q_embed_pq_codes",
    oracle=_pq_codes_oracle(),
    tags=("embedding", "pq", "quantization", "ann", "compression"),
)
def q_embed_pq_codes(spark, sf_dir):
    """Product-quantization code assignment + compression accounting —
    the memory-bound ANN serving layer (Jégou et al., PQ): the 64-dim
    vector splits into PQ_M=4 subspaces of 16 dims; each subspace is
    assigned to its nearest of PQ_K=16 codewords, so a vector stores as
    4 codes (4 bytes) instead of 256 — the 64× compression that lets a
    100 TB corpus's index live in cluster RAM. Output: per
    (subspace, code) population and exact total/mean squared
    quantization error — the codebook-health table (dead codewords show
    as missing rows, hot ones as skewed n_vectors).

    Determinism discipline: vectors quantize with the shared audited
    floor(x·1024) grid (queries/ml.py _kmx_quantized); the codebook is
    the PQ_K lowest vec_ids' subvectors (the _kmx c0 init rule — a
    production build would Lloyd-refine each subspace exactly like the
    IVF coarse index; assignment/accounting plumbing is identical);
    distances are exact int64 (|diff| ≤ 2^12, ×16 dims → ≤ 2^28 per
    vector, summable to 2^58 at 10^9 rows), ties break to the lowest
    code. Scale shape: codebook ships in the task closure, assignment
    is one Arrow-batched integer GEMM per subspace (the _kmx_assign
    expansion d = x·x − 2x·cb + cb·cb), each batch emits ≤ M·K partial
    rows, and the final combinable groupBy touches only those — one
    fact pass, KB-scale shuffle."""
    import numpy as np
    import pandas as pd

    from .ml import _kmx_quantized

    q = _kmx_quantized(spark, sf_dir)
    cb_rows = q.filter(F.col("vec_id") < PQ_K).orderBy("vec_id").collect()
    if len(cb_rows) < PQ_K:
        raise ValueError(f"corpus smaller than PQ_K={PQ_K}; no codebook")
    cb = np.array([r["xq"] for r in cb_rows], dtype=np.int64)  # (K, 64)

    def assign(batches):
        import pyarrow as pa

        from ..operators._arrow import list_mat
        from ..operators._gemm import exact_int_gemm

        subs = [cb[:, m * PQ_DSUB : (m + 1) * PQ_DSUB] for m in range(PQ_M)]
        sub_sq = [(s * s).sum(axis=1) for s in subs]
        for b in batches:
            if not b.num_rows:
                continue
            X = list_mat(b.column("xq"), PQ_M * PQ_DSUB)
            out_m, out_c, out_n, out_e = [], [], [], []
            for m in range(PQ_M):
                Xm = X[:, m * PQ_DSUB : (m + 1) * PQ_DSUB]
                xx = (Xm * Xm).sum(axis=1)
                d = xx[:, None] - 2 * exact_int_gemm(Xm, subs[m].T) + sub_sq[m][None, :]
                j = np.argmin(d, axis=1)  # first min -> lowest code
                dmin = d[np.arange(len(Xm)), j]
                for code in np.unique(j):
                    sel = j == code
                    out_m.append(m)
                    out_c.append(int(code))
                    out_n.append(int(sel.sum()))
                    out_e.append(int(dmin[sel].sum()))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_m, type=pa.int64()),
                    pa.array(out_c, type=pa.int64()),
                    pa.array(out_n, type=pa.int64()),
                    pa.array(out_e, type=pa.int64()),
                ],
                names=["m", "code", "n", "e"],
            )

    partials = q.mapInArrow(assign, "m long, code long, n long, e long")
    return partials.groupBy(
        F.col("m").alias("subspace"), "code"
    ).agg(
        F.sum("n").alias("n_vectors"),
        F.sum("e").alias("sqerr_total"),
        F.round(F.sum("e").cast("double") / F.sum("n"), 6).alias("avg_sqerr"),
    )


def _isotropy_oracle() -> str:
    from .ml import KMX_DIM, KMX_Q

    return f"""
    WITH q AS (
        SELECT vec_id, list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE)*{KMX_Q}) AS BIGINT)) AS xq
        FROM embeddings
    ),
    per_dim AS (
        SELECT t.i AS dim, COUNT(*) AS n,
               CAST(SUM(q.xq[t.i]) AS BIGINT) AS s,
               CAST(SUM(q.xq[t.i] * q.xq[t.i]) AS BIGINT) AS ss
        FROM q CROSS JOIN range(1, {KMX_DIM + 1}) t(i)
        GROUP BY t.i
    )
    SELECT dim, n, s, ss,
           FLOOR((CAST(s AS DOUBLE) / n / {KMX_Q}) * 1000000) / 1000000
               AS mean_dim,
           FLOOR((CAST(ss AS DOUBLE) / n / {KMX_Q * KMX_Q}
                  - (CAST(s AS DOUBLE) / n / {KMX_Q})
                    * (CAST(s AS DOUBLE) / n / {KMX_Q})) * 1000000) / 1000000
               AS var_dim
    FROM per_dim
    """


@query(
    "q_embed_isotropy",
    oracle=_isotropy_oracle(),
    tags=("embedding", "isotropy", "audit", "quality"),
)
def q_embed_isotropy(spark, sf_dir):
    """Per-dimension embedding isotropy audit — the collapse detector
    every embedding-production pipeline monitors: a healthy encoder
    spreads variance across dimensions; dominated/zero-variance
    dimensions mean representation collapse (or a dead projection row)
    and degrade every downstream ANN/dedup/clustering consumer. Output:
    per dimension the exact integer first/second moments over the
    shared floor(x·1024) grid plus mean/variance in original units —
    anisotropy (max/mean variance ratio) is a trivial consumer-side
    fold over the 64-row result.

    Determinism: moments are exact int64 sums over the audited
    quantization (xq² ≤ 2^22, summable to 2^52 at 10^9 rows — the bound
    is documented rather than decimal-widened because the moments here
    feed a 64-row audit, not a certified score); mean/variance divide
    in a fixed spelled order and emit FLOOR-truncated at 6dp (the
    engine-invariant emission discipline). Scale shape: ONE combinable
    unrolled aggregate (2·64 sums + count, the simhash bit-vote
    pattern) — no explode touches the fact table; the 1×129 row
    unpivots to 64 rows via stack on the driver-sized frame."""
    from .ml import KMX_DIM, KMX_Q, _kmx_quantized

    q = _kmx_quantized(spark, sf_dir)
    aggs = [F.count("*").alias("n")]
    for i in range(KMX_DIM):
        aggs.append(F.sum(F.col("xq")[i]).alias(f"s{i}"))
        aggs.append(F.sum(F.col("xq")[i] * F.col("xq")[i]).alias(f"ss{i}"))
    one = q.agg(*aggs)
    stack_args = ", ".join(
        f"{i + 1}L, s{i}, ss{i}" for i in range(KMX_DIM)
    )
    per_dim = one.selectExpr(
        "n", f"stack({KMX_DIM}, {stack_args}) AS (dim, s, ss)"
    )
    mean_raw = F.col("s").cast("double") / F.col("n") / KMX_Q
    var_raw = (
        F.col("ss").cast("double") / F.col("n") / (KMX_Q * KMX_Q)
        - mean_raw * mean_raw
    )
    return per_dim.select(
        "dim",
        "n",
        "s",
        "ss",
        (F.floor(mean_raw * 1000000) / 1000000).alias("mean_dim"),
        (F.floor(var_raw * 1000000) / 1000000).alias("var_dim"),
    )


# IVF-PQ refine shortlist: the ADC scan keeps this many candidates for
# the exact re-rank (Jégou et al.'s "R" — they report R=10..100 on SIFT).
# FIXED-SIZE like PROBE_ID_CAP, not a corpus fraction: at 100 TB the
# shortlist is still 100 rows per probe, so refine cost is constant in
# corpus size. 16-codeword subspace codebooks on the near-orthogonal
# fixture are the ADC worst case; R=100 recovers recall 0.7-0.8 here
# (tests pin the floor) while real clustered corpora need far less.
ADC_SHORTLIST = 100


def _ivfpq_oracle() -> str:
    from ..operators.similarity import N_PROBE, PROBE_VEC_ID, TOP_K, _adaptive_k_sql
    from .ml import KMX_PASSES, _kmx_cte_parts

    lo = f"(m * {PQ_DSUB} + 1)"
    hi = f"((m + 1) * {PQ_DSUB})"
    sq = "z -> (z[1]-z[2])*(z[1]-z[2])"
    parts = _kmx_cte_parts(k_sql=_adaptive_k_sql())
    parts += [
        f"pq AS (SELECT xq FROM q WHERE vec_id = {PROBE_VEC_ID})",
        f"cm AS (SELECT c, s, CAST(list_sum(list_transform(s, v -> v*v)) AS BIGINT) "
        f"AS ss FROM c{KMX_PASSES - 1})",
        "crank AS (SELECT cm.c, ROW_NUMBER() OVER (ORDER BY "
        "CAST(list_sum(list_transform(list_zip(pq.xq, cm.s), z -> z[1]*z[2])) AS DOUBLE)"
        " / sqrt(CAST(cm.ss AS DOUBLE)) DESC, cm.c) AS rk FROM cm, pq)",
        f"cells AS (SELECT c FROM crank WHERE rk <= {N_PROBE})",
        f"cb AS (SELECT vec_id AS code, xq FROM q WHERE vec_id < {PQ_K})",
        f"lut AS (SELECT t.m, cb.code, CAST(list_sum(list_transform("
        f"list_zip(list_slice(pq.xq, {lo}, {hi}), list_slice(cb.xq, {lo}, {hi})), "
        f"{sq})) AS BIGINT) AS pd FROM pq CROSS JOIN range(0, {PQ_M}) t(m) CROSS JOIN cb)",
        f"cand AS (SELECT vec_id, xq FROM a{KMX_PASSES} a JOIN cells USING (c) "
        f"WHERE vec_id <> {PROBE_VEC_ID})",
        f"cdist AS (SELECT cand.vec_id, t.m, cb.code, CAST(list_sum(list_transform("
        f"list_zip(list_slice(cand.xq, {lo}, {hi}), list_slice(cb.xq, {lo}, {hi})), "
        f"{sq})) AS BIGINT) AS d FROM cand CROSS JOIN range(0, {PQ_M}) t(m) CROSS JOIN cb)",
        "codes AS (SELECT vec_id, m, code FROM (SELECT *, ROW_NUMBER() OVER ("
        "PARTITION BY vec_id, m ORDER BY d, code) AS rk FROM cdist) WHERE rk = 1)",
        "adc AS (SELECT codes.vec_id, CAST(SUM(lut.pd) AS BIGINT) AS adc_dist "
        "FROM codes JOIN lut ON lut.m = codes.m AND lut.code = codes.code GROUP BY 1)",
        "ex AS (SELECT cand.vec_id, CAST(list_sum(list_transform("
        f"list_zip(cand.xq, pq.xq), {sq})) AS BIGINT) AS exact_dist FROM cand, pq)",
        "short AS (SELECT vec_id, adc_dist FROM (SELECT vec_id, adc_dist, "
        "ROW_NUMBER() OVER (ORDER BY adc_dist, vec_id) AS srk FROM adc) "
        f"WHERE srk <= {ADC_SHORTLIST})",
    ]
    return (
        "WITH " + ",\n".join(parts) + "\n"
        "SELECT CAST(rk AS BIGINT) AS rank_exact, vec_id, adc_dist, exact_dist FROM ("
        "SELECT s.vec_id, s.adc_dist, ex.exact_dist, "
        "ROW_NUMBER() OVER (ORDER BY ex.exact_dist, s.vec_id) AS rk "
        f"FROM short s JOIN ex USING (vec_id)) WHERE rk <= {TOP_K}"
    )


@query(
    "q_sim_ann_ivfpq",
    oracle=_ivfpq_oracle(),
    tags=("similarity", "ann", "ivf", "pq", "adc", "serving"),
)
def q_sim_ann_ivfpq(spark, sf_dir):
    """IVF-PQ top-k by ASYMMETRIC DISTANCE COMPUTATION (Jégou et al.,
    "Product Quantization for Nearest Neighbor Search") — the RAM-scale
    ANN serving pattern the q_embed_pq_codes codebooks exist for: the
    probe routes to its N_PROBE nearest IVF cells (rank_cells_audited's
    deterministic comparator), every candidate in those cells is scored
    WITHOUT touching its raw vector — each of its PQ_M=4 subspace codes
    indexes a per-probe lookup table LUT[m][code] =
    ||probe_sub − codeword_sub||², so one candidate costs 4 table reads
    + 3 adds instead of a 64-dim scan — and the ADC_SHORTLIST=100 best
    ADC candidates are re-ranked by EXACT quantized-grid distance (the
    refine stage every production IVFADC deployment runs; Jégou et
    al.'s IVFADC+R). Output: the final TOP_K=10 by exact distance with
    the ADC distance carried alongside — the per-row visibility of PQ's
    compression error.

    Determinism: everything is exact int64 on the shared audited
    floor(x·1024) grid — the LUT entries, the code assignment (argmin
    over 16 exact subspace distances, ties to the lowest code, the
    q_embed_pq_codes rule), the ADC sum (≤ 4·2^28) and the exact
    distance (≤ 2^28); the only floats anywhere are the cell-ranking
    comparator's single division+sqrt, bit-identical to the DuckDB
    replay. Full hash-check, no emission rounding needed: every output
    cell is an integer.

    Scale shape: the codebook (16×64 ints) and the probe's LUT (4×16
    ints) are LITERALS in the plan — zero broadcast, zero Python; code
    assignment + ADC run as whole-stage-codegen HOF expressions
    (transform/zip_with/aggregate over 16-element literal arrays), so
    the serving path has no Arrow boundary at all. Candidates come from
    the partition-pruned N_PROBE cells (adaptive_k bounds cell size, so
    candidate count is constant in corpus size); TakeOrdered keeps the
    ADC shortlist map-side (100 rows), the exact re-rank touches only
    those 100, and the final rank window sees 10 rows. A production
    build stores the 4-byte codes columnar (q_embed_pq_codes is that
    build job) and serves from codes alone; here codes are derived
    in-plan from the same grid, which keeps the whole path one
    self-contained hash-checkable query."""
    import numpy as np

    from ..operators.similarity import (
        N_PROBE,
        PROBE_VEC_ID,
        TOP_K,
        _ivf_index_for,
        _quantize_probe,
        rank_cells_audited,
    )
    from .ml import _kmx_quantized

    e = t(spark, sf_dir, "embeddings")
    probe_row = e.filter(F.col("vec_id") == PROBE_VEC_ID).select("embedding").head()
    if probe_row is None:
        raise ValueError(f"probe vec_id={PROBE_VEC_ID} absent at {sf_dir}")
    pxq = _quantize_probe([float(v) for v in probe_row[0]])
    assigned, cents = _ivf_index_for(spark, sf_dir)
    cells = rank_cells_audited(cents, pxq, nprobe=N_PROBE)

    cb_rows = (
        _kmx_quantized(spark, sf_dir)
        .filter(F.col("vec_id") < PQ_K)
        .orderBy("vec_id")
        .collect()
    )
    if len(cb_rows) < PQ_K:
        raise ValueError(f"corpus smaller than PQ_K={PQ_K}; no codebook")
    cb = np.array([r["xq"] for r in cb_rows], dtype=np.int64)  # (K, 64)
    p = np.array(pxq, dtype=np.int64)
    # per-probe ADC lookup tables, exact int64: lut[m][k]
    lut = [
        [
            int(((p[m * PQ_DSUB : (m + 1) * PQ_DSUB] - cb[k, m * PQ_DSUB : (m + 1) * PQ_DSUB]) ** 2).sum())
            for k in range(PQ_K)
        ]
        for m in range(PQ_M)
    ]

    cand = assigned.filter(
        F.col("cell").isin([int(c) for c in cells]) & (F.col("vec_id") != PROBE_VEC_ID)
    ).select("vec_id", "xq")

    sqsum = lambda xs, ys: F.aggregate(  # noqa: E731
        F.zip_with(xs, ys, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    adc = F.lit(0).cast("long")
    for m in range(PQ_M):
        xsub = F.slice("xq", m * PQ_DSUB + 1, PQ_DSUB)
        cb_lit = F.array(
            *[
                F.array(*[F.lit(int(v)) for v in cb[k, m * PQ_DSUB : (m + 1) * PQ_DSUB]])
                for k in range(PQ_K)
            ]
        )
        best = F.array_min(
            F.transform(
                cb_lit,
                lambda cw, i: F.struct(
                    sqsum(xsub, cw).alias("d"), i.cast("long").alias("code")
                ),
            )
        )
        lut_lit = F.array(*[F.lit(v) for v in lut[m]])
        adc = adc + F.element_at(lut_lit, (best["code"] + 1).cast("int"))
    exact = sqsum(F.col("xq"), F.array(*[F.lit(int(v)) for v in pxq]))

    short = (
        cand.select("vec_id", adc.alias("adc_dist"), "xq")
        .orderBy("adc_dist", "vec_id")
        .limit(ADC_SHORTLIST)
    )
    top = (
        short.select("vec_id", "adc_dist", exact.alias("exact_dist"))
        .orderBy("exact_dist", "vec_id")
        .limit(TOP_K)
    )
    return top.select(
        F.row_number()
        .over(W.orderBy("exact_dist", "vec_id"))
        .cast("long")
        .alias("rank_exact"),
        "vec_id",
        "adc_dist",
        "exact_dist",
    )


# held-out probe set for the routed PQ eval — same fixed-size discipline
# as the other ivf_probe_routing consumers (PROBE_ID_CAP bounds it)
IVFPQ_EVAL_MOD = 20


def _pq_sqsum(xs, ys):
    """Exact-int64 squared L2 between two long arrays (HOF fold)."""
    return F.aggregate(
        F.zip_with(xs, ys, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _pq_cb_lit(cb, m):
    """Subspace-m codebook as a literal array of PQ_K arrays."""
    return F.array(
        *[
            F.array(*[F.lit(int(v)) for v in cb[k, m * PQ_DSUB : (m + 1) * PQ_DSUB]])
            for k in range(PQ_K)
        ]
    )


def _pq_adc_pair_expr(pxq, cxq, cb):
    """ADC distance between probe pxq and candidate cxq via the candidate's
    PQ codes — pure whole-stage-codegen HOFs: per subspace, the candidate's
    code is the argmin over the 16-codeword literal (ties to lowest code,
    the q_embed_pq_codes rule) and the probe pays its exact int64 distance
    to that codeword."""
    def code_struct(csub):
        # closure factory, NOT a default-arg lambda: PySpark derives the
        # HOF arity from the Python signature, so a bound default would
        # read as a 3-arg lambda and fail analysis
        return lambda cw, i: F.struct(
            _pq_sqsum(csub, cw).alias("d"), i.cast("long").alias("code")
        )

    adc = F.lit(0).cast("long")
    for m in range(PQ_M):
        cb_lit = _pq_cb_lit(cb, m)
        csub = F.slice(cxq, m * PQ_DSUB + 1, PQ_DSUB)
        psub = F.slice(pxq, m * PQ_DSUB + 1, PQ_DSUB)
        best = F.array_min(F.transform(cb_lit, code_struct(csub)))
        adc = adc + _pq_sqsum(psub, F.element_at(cb_lit, (best["code"] + 1).cast("int")))
    return adc


def _ivfpq_eval_oracle() -> str:
    from ..operators.similarity import PROBE_ID_CAP, ivf_routing_oracle_parts

    lo = f"(m * {PQ_DSUB} + 1)"
    hi = f"((m + 1) * {PQ_DSUB})"
    sq = "z -> (z[1]-z[2])*(z[1]-z[2])"
    parts = ivf_routing_oracle_parts(IVFPQ_EVAL_MOD)
    parts += [
        f"cb AS (SELECT vec_id AS code, xq FROM q WHERE vec_id < {PQ_K})",
        f"plut AS (SELECT pq.pid, t.m, cb.code, CAST(list_sum(list_transform("
        f"list_zip(list_slice(pq.xq, {lo}, {hi}), list_slice(cb.xq, {lo}, {hi})), "
        f"{sq})) AS BIGINT) AS pd FROM pq CROSS JOIN range(0, {PQ_M}) t(m) CROSS JOIN cb)",
        "cids AS (SELECT DISTINCT cid FROM cand)",
        f"cdist AS (SELECT cids.cid, t.m, cb.code, CAST(list_sum(list_transform("
        f"list_zip(list_slice(qc.xq, {lo}, {hi}), list_slice(cb.xq, {lo}, {hi})), "
        f"{sq})) AS BIGINT) AS d FROM cids JOIN q qc ON qc.vec_id = cids.cid "
        f"CROSS JOIN range(0, {PQ_M}) t(m) CROSS JOIN cb)",
        "codes AS (SELECT cid, m, code FROM (SELECT *, ROW_NUMBER() OVER ("
        "PARTITION BY cid, m ORDER BY d, code) AS rk FROM cdist) WHERE rk = 1)",
        "adc AS (SELECT cand.pid, cand.cid, CAST(SUM(plut.pd) AS BIGINT) AS adc_d "
        "FROM cand JOIN codes ON codes.cid = cand.cid "
        "JOIN plut ON plut.pid = cand.pid AND plut.m = codes.m "
        "AND plut.code = codes.code GROUP BY 1, 2)",
        "adcrk AS (SELECT pid, cid, adc_d, ROW_NUMBER() OVER (PARTITION BY pid "
        "ORDER BY adc_d, cid) AS ark FROM adc)",
        f"exd AS (SELECT s.pid, s.cid, CAST(list_sum(list_transform("
        f"list_zip(qc.xq, pq.xq), {sq})) AS BIGINT) AS exd "
        f"FROM (SELECT pid, cid FROM adcrk WHERE ark <= {ADC_SHORTLIST}) s "
        f"JOIN q qc ON qc.vec_id = s.cid JOIN pq ON pq.pid = s.pid)",
        "refined10 AS (SELECT pid, cid FROM (SELECT pid, cid, ROW_NUMBER() OVER ("
        "PARTITION BY pid ORDER BY exd, cid) AS rk FROM exd) WHERE rk <= 10)",
        "adc10 AS (SELECT pid, cid FROM adcrk WHERE ark <= 10)",
        f"tpair AS (SELECT pq.pid, q2.vec_id AS cid, CAST(list_sum(list_transform("
        f"list_zip(q2.xq, pq.xq), {sq})) AS BIGINT) AS d FROM pq, q q2 "
        f"WHERE NOT (q2.vec_id % {IVFPQ_EVAL_MOD} = 0 AND q2.vec_id < {PROBE_ID_CAP}))",
        "t10 AS (SELECT pid, cid FROM (SELECT pid, cid, ROW_NUMBER() OVER ("
        "PARTITION BY pid ORDER BY d, cid) AS rk FROM tpair) WHERE rk <= 10)",
        "ha AS (SELECT a.pid, COUNT(*) AS h FROM adc10 a JOIN t10 USING (pid, cid) "
        "GROUP BY 1)",
        "hr AS (SELECT r.pid, COUNT(*) AS h FROM refined10 r JOIN t10 USING (pid, cid) "
        "GROUP BY 1)",
    ]
    return (
        "WITH " + ",\n".join(parts) + "\n"
        "SELECT pq.pid AS pid, "
        "CAST(COALESCE(ha.h, 0) AS BIGINT) AS hits_adc10, "
        "CAST(COALESCE(hr.h, 0) AS BIGINT) AS hits_refined10, "
        "ROUND(COALESCE(ha.h, 0) / 10.0, 6) AS recall_adc10, "
        "ROUND(COALESCE(hr.h, 0) / 10.0, 6) AS recall_refined10 "
        "FROM pq LEFT JOIN ha ON ha.pid = pq.pid LEFT JOIN hr ON hr.pid = pq.pid"
    )


@query(
    "q_sim_ann_ivfpq_eval",
    oracle=_ivfpq_eval_oracle(),
    tags=("similarity", "ann", "ivf", "pq", "adc", "recall", "eval"),
)
def q_sim_ann_ivfpq_eval(spark, sf_dir):
    """Routed IVF-PQ recall table over the held-out probe SET — the eval
    every PQ deployment publishes before turning ADC serving on, and the
    closing piece of the PQ story (build: q_embed_pq_codes; serve:
    q_sim_ann_ivfpq; evaluate: this). Per probe (every IVFPQ_EVAL_MOD-th
    vector under PROBE_ID_CAP): recall@10 of (a) raw ADC top-10 and
    (b) ADC_SHORTLIST+exact-refine top-10 — both through the real routed
    path (N_PROBE cells of the audited IVF index) — against the
    brute-force quantized-grid truth. The (a)-vs-(b) gap isolates PQ
    compression loss from IVF routing loss per probe.

    Determinism: every distance is exact int64 on the shared audited
    floor(x·1024) grid; cell routing is the ivf_probe_routing
    comparator (exact integer dot + one correctly-rounded float64
    division); code assignment ties break to the lowest code
    (q_embed_pq_codes rule); recall ratios divide the same ints by 10.0
    in both engines. Full hash check of the entire eval.

    Scale shape: the probe set is FIXED-SIZE (PROBE_ID_CAP — the r9
    lesson), so every arm is linear in corpus at worst: the routed arm
    is ONE equi-join of the corpus against the broadcast probe×cell
    frame (constant per-probe candidates under adaptive k) with ADC as
    whole-stage-codegen HOFs over the literal codebook (a candidate
    reached by several probes re-derives its 4 codes in-expression —
    cheaper than shuffling a dedicated codes frame); the truth arm is
    one broadcast corpus pass (the q_sim_knn_all regime); per-probe
    windows run after WindowGroupLimit pre-truncation; hit joins and
    the final assembly touch 10-row-per-probe frames."""
    import numpy as np

    from ..operators.similarity import ivf_probe_routing
    from .ml import _kmx_quantized

    probes, corpus, pcells = ivf_probe_routing(
        spark, sf_dir, IVFPQ_EVAL_MOD, keep_xq=True
    )
    cb_rows = (
        _kmx_quantized(spark, sf_dir)
        .filter(F.col("vec_id") < PQ_K)
        .orderBy("vec_id")
        .collect()
    )
    if len(cb_rows) < PQ_K:
        raise ValueError(f"corpus smaller than PQ_K={PQ_K}; no codebook")
    cb = np.array([r["xq"] for r in cb_rows], dtype=np.int64)

    pslim = probes.select("pid", "pxq")
    routed = corpus.join(F.broadcast(pcells.join(pslim, "pid")), "cell").select(
        "pid", "pxq", "cid", "cxq"
    )
    scored = routed.select(
        "pid",
        "pxq",
        "cid",
        "cxq",
        _pq_adc_pair_expr(F.col("pxq"), F.col("cxq"), cb).alias("adc_d"),
    )
    shortl = scored.withColumn(
        "ark",
        F.row_number().over(W.partitionBy("pid").orderBy("adc_d", "cid")),
    ).filter(F.col("ark") <= ADC_SHORTLIST)
    adc10 = shortl.filter(F.col("ark") <= 10).select("pid", "cid")
    refined10 = (
        shortl.select(
            "pid", "cid", _pq_sqsum(F.col("cxq"), F.col("pxq")).alias("exd")
        )
        .withColumn(
            "rk", F.row_number().over(W.partitionBy("pid").orderBy("exd", "cid"))
        )
        .filter(F.col("rk") <= 10)
        .select("pid", "cid")
    )
    tpair = corpus.select("cid", "cxq").crossJoin(F.broadcast(pslim)).select(
        "pid", "cid", _pq_sqsum(F.col("cxq"), F.col("pxq")).alias("d")
    )
    t10 = (
        tpair.withColumn(
            "rk", F.row_number().over(W.partitionBy("pid").orderBy("d", "cid"))
        )
        .filter(F.col("rk") <= 10)
        .select("pid", "cid")
    )
    ha = adc10.join(t10, ["pid", "cid"]).groupBy("pid").agg(
        F.count("*").alias("ha")
    )
    hr = refined10.join(t10, ["pid", "cid"]).groupBy("pid").agg(
        F.count("*").alias("hr")
    )
    return (
        probes.select("pid")
        .join(F.broadcast(ha), "pid", "left")
        .join(F.broadcast(hr), "pid", "left")
        .select(
            "pid",
            F.coalesce("ha", F.lit(0)).cast("long").alias("hits_adc10"),
            F.coalesce("hr", F.lit(0)).cast("long").alias("hits_refined10"),
            F.round(F.coalesce("ha", F.lit(0)) / 10.0, 6).alias("recall_adc10"),
            F.round(F.coalesce("hr", F.lit(0)) / 10.0, 6).alias("recall_refined10"),
        )
    )
