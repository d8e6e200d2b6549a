"""Approximate-nearest-neighbor scale path over `embeddings`.

Brute-force cosine (queries/similarity.py — the oracle-checkable ground
truth) reads the whole corpus per probe. At 100 TB the scale path is an
**IVF (inverted-file) index**: partition the corpus into k cells by
k-means centroid, store it partitioned by cell, and answer a probe by
scanning only the `nprobe` cells whose centroids are nearest — a
partition-pruned read of nprobe/k of the data instead of a full pass.

Spark-first layout:
- cell assignment is a one-off batch job — since round 5, the shared
  EXACTLY-AUDITED integer Lloyd fit (queries/ml.py _kmx_fit, the
  q_ml_kmeans_exact machinery), so index builds are deterministic and
  the ANN/cell-dedup queries carry full DuckDB hash-check oracles (the
  MLlib KMeans surface stays exercised by q_ml_kmeans); the assigned
  output is written `partitionBy("cell")` in production, so the
  per-probe cell filter becomes parquet partition pruning — no shuffle,
  no index service;
- the in-cell scan reuses the same codegen cosine kernel as the
  brute-force baseline;
- for very high dimensions, `cosine_pandas_factory` swaps the
  fold-per-element Catalyst expression for an Arrow-batched NumPy
  matrix-vector product (one BLAS call per batch instead of dim·rows
  expression-tree evaluations).

Recall is additionally measured against the brute-force baseline in
tests/test_similarity_ops.py / test_dedup_hardening.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.similarity import cosine_probe
from ..queries._util import t
from ..queries.registry import query
from ._gemm import exact_int_gemm

N_CELLS = 16
# The fixture vectors are near-orthogonal (no cluster structure), the
# worst case for IVF — neighbors barely co-cluster with the probe, so a
# production-style nprobe of 2-4 yields recall@10 of only 0.2-0.4.
# nprobe=6/16 (measured: recall 0.5 at sf0.001, 1.0 at sf0.01) keeps the
# operator honest about that tradeoff while still pruning 62% of the
# corpus; real embedding corpora cluster, shifting the curve sharply left.
N_PROBE = 6
TOP_K = 10
# Adaptive-k target: soft-assigned rows per cell (SOFT_CELLS probes per
# vector). Fixed k is the Σcell² trap — cells grow linearly with the
# corpus, so within-cell pair work grows QUADRATICALLY (measured in the
# sf1 probe, tools/scale_probe_sf1.py: 10× corpus → 102× pairs at fixed
# k=16). Scaling k with the corpus bounds cell size, making per-cell
# GEMMs constant-cost and total pair work linear (same probe: 10.4×).
# At every driver/test SF (≤2000 vectors) adaptive k == N_CELLS, so
# recall floors and cached indexes are unchanged there.
TARGET_SOFT_ROWS_PER_CELL = 500


# Declared ANN probe vector and the adaptive-k soft-cell multiplier —
# module constants so the Spark paths AND the DuckDB oracle strings
# interpolate the SAME values (a divergence would silently desync the
# hash check from the code under test).
PROBE_VEC_ID = 0
SOFT_CELLS = 4


def adaptive_k(n_vectors: int, soft_cells: int = SOFT_CELLS) -> int:
    import math

    return max(N_CELLS, math.ceil(soft_cells * n_vectors / TARGET_SOFT_ROWS_PER_CELL))


def _quantize_probe(probe: list[float]) -> list[int]:
    """floor(v · KMX_Q) — the identical quantization the audited Lloyd
    fit applies (queries/ml.py _kmx_quantized): float32→float64 cast is
    exact, KMX_Q is a power of two, floor has no tie semantics."""
    import math

    from ..queries.ml import KMX_Q

    return [math.floor(float(v) * KMX_Q) for v in probe]


def rank_cells_audited(
    cents: list[tuple[int, list[int], int]], probe_xq: list[int], nprobe: int = N_PROBE
) -> list[int]:
    """Driver-side centroid ranking with the DETERMINISTIC comparator
    r_j = double(xq·s_j) / sqrt(double(s_j·s_j)) DESC, tie by cell id —
    cosine to the centroid MEAN with the probe norm (constant) and the
    1/n_j scaling cancelled. Both dots are exact integers (|xq| < 2^10,
    |s| < 2^21, dim 64 → < 2^53), and the division + sqrt are single
    correctly-rounded float64 ops, so the DuckDB replay ranks the same
    cells in the same order. Pure-Python left folds: k is tiny."""
    import math

    scored = []
    for c, s, _n in cents:
        dot = 0
        for a, b in zip(probe_xq, s):
            dot += a * b
        ss = 0
        for v in s:
            ss += v * v
        r = float(dot) / math.sqrt(float(ss)) if ss else float("-inf")
        scored.append((-r, c))
    scored.sort()
    return [c for _, c in scored[:nprobe]]


def _adaptive_k_sql() -> str:
    """The adaptive cell count as a DuckDB scalar subquery — the SQL twin
    of ``adaptive_k`` (same GREATEST/CEIL arithmetic), shared by every
    oracle that replays the index build so the two can never desync."""
    return (
        f"SELECT GREATEST({N_CELLS}, CAST(CEIL({float(SOFT_CELLS)} * COUNT(*) / "
        f"{TARGET_SOFT_ROWS_PER_CELL}) AS BIGINT)) FROM embeddings"
    )



# The held-out probe set is FIXED-SIZE, not a corpus fraction: probes
# are every probe_mod-th vector WITH vec_id < PROBE_ID_CAP (100 probes
# at mod 20). A production eval holds its probe set constant while the
# corpus grows — and with adaptive k bounding cell size, the per-probe
# routing cost is constant too, so the WHOLE eval is
# corpus-size-independent (measured on the 10× sf1 probe: the uncapped
# %20 form scaled 5.3×/7.9× because the probe count itself grew 10×; a
# 10k cap still let probes grow 5× from sf0.1's 2k vec_ids and scaled
# ~3.5×; at 2k the probe set is IDENTICAL at sf0.1 and sf1 and the
# eval runs ~1× — exactly the independence an IVF index is for). At
# every driver/test SF (vec_ids < 2,000) the cap admits every
# probe_mod-th vector, so fixture probe sets are unchanged.
PROBE_ID_CAP = 2_000


def ivf_probe_routing(
    spark: SparkSession, sf_dir: str, probe_mod: int, keep_xq: bool = False
):
    """Shared probe-routing spine for held-out-probe queries over the
    audited IVF index (q_ml_knn_classifier_ivf, q_sim_hard_negatives):
    every ``probe_mod``-th vector below PROBE_ID_CAP is held out (a
    fixed-size eval set — see the cap's comment), ranks the index's
    centroid rationals with rank_cells_audited's deterministic
    comparator — the integer dot xq·s is exact in int64, the division
    and sqrt are single correctly-rounded float64 ops, so the ranking
    is bit-identical to the DuckDB replay — and keeps its N_PROBE
    nearest cells. Returns ``(probes, corpus, pcells)``:
    probes(pid, plabel, pe, pn), corpus(cell, cid, nlabel, ce, cn),
    pcells(pid, cell). The corpus side is everything NOT in the probe
    set. Downstream queries join corpus to broadcast(pcells ⋈ probes)
    on cell — ONE equi-join, no corpus shuffle; with adaptive k the
    cells stay constant-sized, so total candidate work is constant in
    the corpus and linear only in the fixed probe count."""
    from ..functions.similarity import l2_norm

    assigned, cents = _ivf_index_for(spark, sf_dir)
    is_probe = (F.col("vec_id") % probe_mod == 0) & (F.col("vec_id") < PROBE_ID_CAP)
    probes = assigned.filter(is_probe).select(
        F.col("vec_id").alias("pid"),
        F.col("label").alias("plabel"),
        F.col("embedding").alias("pe"),
        l2_norm(F.col("embedding")).alias("pn"),
        "xq",
    )
    corpus_cols = [
        F.col("cell"),
        F.col("vec_id").alias("cid"),
        F.col("label").alias("nlabel"),
        F.col("embedding").alias("ce"),
        l2_norm(F.col("embedding")).alias("cn"),
    ]
    if keep_xq:
        # q_sim_ann_ivfpq_eval scores candidates from their PQ codes,
        # derived from the audited quantization — expose it on both sides
        corpus_cols.append(F.col("xq").alias("cxq"))
    corpus = assigned.filter(~is_probe).select(*corpus_cols)
    pcells = _probe_cells(spark, probes, cents, probe_mod)
    if keep_xq:
        return probes.withColumnRenamed("xq", "pxq"), corpus, pcells
    return probes.drop("xq"), corpus, pcells


# Ceiling on probes × cells for the driver-side crank: 4M scored
# (probe, cell) entries is ~2 GB of transient float64 on a 48 g driver
# and microseconds of BLAS; past it (k ∝ corpus under adaptive_k, so
# ~40M-vector corpora at 100 probes) the ranking runs distributed.
_PCELLS_DRIVER_CAP = 4_000_000


def _probe_cells(spark, probes, cents, probe_mod: int):
    """Per-probe nprobe-nearest-cell routing table (pid, cell).

    The scored grid is (fixed probe count) × k cells — k ∝ corpus under
    adaptive_k, so at fixture-to-100× scales it is thousands to ~10^5
    entries: driver-bounded state exactly like the serving path's
    `_rank_cells` (same comparator, one probe at a time). The r12
    profile measured the distributed form (crossJoin + interpreted HOF
    fold + per-probe window) at 0.63 s of the query's 1.5 s at the 100×
    corpus — ~20M interpreted lambda evals to rank 160k rows (guide
    §4.1). Here the identical arithmetic runs as ONE exact-int64 BLAS
    GEMM on the driver: dot xq·s is exact int64 (`exact_int_gemm`), the
    divide-by-sqrt pair are the same two correctly-rounded float64 ops,
    so every score is bit-identical and the (r desc, cell) order —
    np.lexsort on (cell, -r) — reproduces row_number's tie-break.
    Probes are a collect of the cached assigned frame (≤ PROBE_ID_CAP /
    probe_mod rows by construction); output is a PROBE_ID_CAP-bounded
    local frame, broadcast by every consumer. Falls back to the
    verbatim distributed crank when probes × k outgrows the driver cap
    or any score is non-finite (a zero centroid-sum vector would make
    engine NaN-ordering the tie-breaker; no fixture produces one)."""
    max_probes = -(-PROBE_ID_CAP // probe_mod)
    if max_probes * len(cents) <= _PCELLS_DRIVER_CAP:
        from ._gemm import exact_int_gemm

        rows = probes.select("pid", "xq").collect()
        if rows:
            cells = np.array([c for (c, _s, _n) in cents], dtype=np.int64)
            S = np.array([s for (_c, s, _n) in cents], dtype=np.int64)
            ss = np.einsum("ij,ij->i", S, S)
            Xp = np.array([r["xq"] for r in rows], dtype=np.int64)
            dots = exact_int_gemm(Xp, S.T)
            r = dots.astype(np.float64) / np.sqrt(ss.astype(np.float64))
            if np.isfinite(r).all():
                out = []
                for i, row in enumerate(rows):
                    order = np.lexsort((cells, -r[i]))
                    out.extend(
                        (int(row["pid"]), int(c)) for c in cells[order[:N_PROBE]]
                    )
                return spark.createDataFrame(out, "pid long, cell long")
        else:
            return spark.createDataFrame([], "pid long, cell long")
    return _probe_cells_distributed(spark, probes, cents)


def _probe_cells_distributed(spark, probes, cents):
    """The distributed crank (pre-r12 form, kept verbatim as the
    scale/fallback path): broadcast the centroid rationals, score every
    (probe, cell) with the single-division comparator, rank per probe."""
    from pyspark.sql import Window as W

    cdf = spark.createDataFrame(
        [
            (int(c), [int(v) for v in s], int(sum(v * v for v in s)))
            for (c, s, _n) in cents
        ],
        "cc long, s array<long>, ss long",
    )
    dot = F.aggregate(
        F.zip_with("xq", "s", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        probes.select("pid", "xq")
        .crossJoin(F.broadcast(cdf))
        .select(
            "pid",
            F.col("cc").alias("cell"),
            (dot.cast("double") / F.sqrt(F.col("ss").cast("double"))).alias("r"),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("pid").orderBy(F.col("r").desc(), "cell")
            ),
        )
        .filter(F.col("rk") <= N_PROBE)
        .select("pid", "cell")
    )


def ivf_routing_oracle_parts(probe_mod: int) -> list[str]:
    """The DuckDB CTE chain matching ivf_probe_routing: the shared
    unrolled Lloyd replay + per-probe crank window + pcells + a raw
    embeddings view ``e(vec_id, label, v, nrm)`` + ``cand(pid, cid)``.
    Consumers append their own pairs/rank tail."""
    from ..queries.ml import KMX_PASSES, _kmx_cte_parts

    parts = _kmx_cte_parts(k_sql=_adaptive_k_sql())
    parts += [
        f"pq AS (SELECT vec_id AS pid, xq FROM q WHERE vec_id % {probe_mod} = 0 "
        f"AND vec_id < {PROBE_ID_CAP})",
        f"cm AS (SELECT c, s, CAST(list_sum(list_transform(s, v -> v*v)) AS BIGINT) "
        f"AS ss FROM c{KMX_PASSES - 1})",
        "crank AS (SELECT pq.pid, cm.c, ROW_NUMBER() OVER (PARTITION BY pq.pid "
        "ORDER BY CAST(list_sum(list_transform(list_zip(pq.xq, cm.s), "
        "z -> z[1]*z[2])) AS DOUBLE) / sqrt(CAST(cm.ss AS DOUBLE)) DESC, cm.c) "
        "AS rk FROM cm, pq)",
        f"pcells AS (SELECT pid, c FROM crank WHERE rk <= {N_PROBE})",
        "e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v, "
        "sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), "
        "CAST(embedding AS DOUBLE[]))) AS nrm FROM embeddings)",
        f"cand AS (SELECT pc.pid, a.vec_id AS cid FROM pcells pc "
        f"JOIN a{KMX_PASSES} a ON a.c = pc.c "
        f"WHERE NOT (a.vec_id % {probe_mod} = 0 AND a.vec_id < {PROBE_ID_CAP}))",
    ]
    return parts


def pair_cosine_arrow(joined: DataFrame, keep: list[str]) -> DataFrame:
    """Arrow-batched prenorm cosine over a candidate-pair frame carrying
    (pe, ce, pn, cn): returns ``keep`` + ``cos`` where cos is
    bit-identical to ``cosine_prenorm`` — the dot is an np.cumsum, the
    identical left-to-right double adds the zip_with/aggregate fold (and
    DuckDB's list_dot_product) performs, and the single divide-by-
    product is the same one IEEE op. The HOF fold is interpreted per
    element (~64 lambda evals per pair); this scores a whole batch in
    three vector ops — measured ~30% off q_sim_hard_negatives /
    q_ml_knn_classifier_ivf at sf0.1 with row-identical output. The
    joined frame must already carry only the columns needed (guide §4.1:
    the kernel sees every column passed)."""
    from ..functions.similarity import EMBEDDING_DIM
    from ._arrow import list_mat

    from pyspark.sql.types import DoubleType

    out_schema = joined.select(*keep).schema.add("cos", DoubleType())

    def gen(batches):
        import pyarrow as pa

        for b in batches:
            if not b.num_rows:
                continue
            pe = list_mat(b.column("pe"), EMBEDDING_DIM, dtype=np.float64)
            ce = list_mat(b.column("ce"), EMBEDDING_DIM, dtype=np.float64)
            pn = b.column("pn").to_numpy(zero_copy_only=False)
            cn = b.column("cn").to_numpy(zero_copy_only=False)
            cos = np.cumsum(pe * ce, axis=1)[:, -1] / (pn * cn)
            yield pa.RecordBatch.from_arrays(
                [b.column(k) for k in keep] + [pa.array(cos)],
                names=list(keep) + ["cos"],
            )

    return joined.select(*keep, "pe", "ce", "pn", "cn").mapInArrow(gen, out_schema)


def cosine_pandas_factory(probe: list[float]):
    """Arrow-batched cosine against a fixed probe: each batch becomes one
    NumPy matrix-vector product. Preferred over the Catalyst fold kernel
    when dim is large enough that BLAS beats expression evaluation."""
    p = np.asarray(probe, dtype=np.float64)
    p_norm = float(np.linalg.norm(p))

    @F.pandas_udf("double")
    def cos_udf(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy())  # (batch, dim) float32 → float64 matmul
        norms = np.linalg.norm(m, axis=1) * p_norm
        return pd.Series((m @ p) / np.where(norms == 0, 1.0, norms))

    return cos_udf


# Built IVF indexes, keyed by corpus dir: the index build (the audited
# Lloyd fit + assignment, queries/ml.py _kmx_fit) is an OFFLINE cost —
# production persists the assigned corpus partitionBy("cell") once and
# every probe reuses it, so the per-query path must not refit. Value =
# (assigned corpus with raw embeddings + `cell`, centroid rationals
# [(c, s, n), ...]). The assignment DataFrame is Spark-cached on first
# use. Since round 5 the index is DETERMINISTIC (exact-integer Lloyd,
# shared with q_ml_kmeans_exact / q_dedup_semantic), which is what makes
# the ANN and cell-dedup queries hash-checkable — and is operationally
# what you want anyway: reproducible index builds. The MLlib KMeans
# surface remains exercised by q_ml_kmeans.
_IVF_INDEX: dict[str, tuple[DataFrame, list[tuple[int, list[int], int]]]] = {}
_IVF_FIT: dict[str, tuple[DataFrame, list[tuple[int, list[int], int]]]] = {}


def _ivf_fit_for(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, list[tuple[int, list[int], int]]]:
    """The centroid fit alone (quantized corpus + centroid rationals) —
    memoized separately from the assigned index so consumers that only
    need the centroids (q_dedup_embedding_cells' soft assignment) never
    pay the corpus-wide assignment join + cache fill."""
    if sf_dir not in _IVF_FIT:
        from ..queries.ml import _kmx_fit

        emb = t(spark, sf_dir, "embeddings")
        k = adaptive_k(emb.count())
        fit = _kmx_fit(spark, sf_dir, k=k)
        if fit is None:
            raise ValueError(f"empty embeddings corpus at {sf_dir}")
        _IVF_FIT[sf_dir] = fit
    return _IVF_FIT[sf_dir]


def _ivf_index_for(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, list[tuple[int, list[int], int]]]:
    if sf_dir not in _IVF_INDEX:
        from ..queries.ml import _kmx_assign

        q, cents = _ivf_fit_for(spark, sf_dir)
        assigned = (
            _kmx_assign(q, cents)
            .select("vec_id", "xq", F.col("c").alias("cell"))
            .join(t(spark, sf_dir, "embeddings"), "vec_id")
        )
        assigned = assigned.cache()
        assigned.count()
        _IVF_INDEX[sf_dir] = (assigned, cents)
    return _IVF_INDEX[sf_dir]


def ann_ivf_topk(
    spark: SparkSession,
    sf_dir: str,
    probe_vec_id: int = PROBE_VEC_ID,
    k: int = TOP_K,
    use_pandas_kernel: bool = False,
) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    probe_row = emb.filter(F.col("vec_id") == probe_vec_id).select("embedding").head()
    probe = [float(v) for v in probe_row[0]]
    assigned, cents = _ivf_index_for(spark, sf_dir)
    cells = rank_cells_audited(cents, _quantize_probe(probe))
    in_cells = assigned.filter(
        F.col("cell").isin(cells) & (F.col("vec_id") != probe_vec_id)
    )
    if use_pandas_kernel:
        cos = cosine_pandas_factory(probe)(F.col("embedding"))
    else:
        cos = cosine_probe(F.col("embedding"), probe)
    return (
        in_cells.select("vec_id", cos.alias("cos"))
        .orderBy(F.col("cos").desc(), "vec_id")
        .limit(k)
        .select("vec_id", F.round("cos", 6).alias("cos_sim"))
    )


def _ann_ivf_oracle() -> str:
    """DuckDB replay of the full ANN path: the shared unrolled Lloyd CTEs
    (ml._kmx_cte_parts, adaptive k) produce cells + centroid rationals;
    cell ranking uses the same single-division float64 comparator as
    rank_cells_audited; the in-cell scan is the q_sim_cosine_topk fold
    formula over the RAW embeddings."""
    from ..queries.ml import KMX_PASSES, _kmx_cte_parts

    # _adaptive_k_sql() yields the IDENTICAL text the old inline form
    # did — these oracle fingerprints are certified and must not drift.
    parts = _kmx_cte_parts(k_sql=_adaptive_k_sql())
    parts += [
        f"pq AS (SELECT xq FROM q WHERE vec_id = {PROBE_VEC_ID})",
        f"cm AS (SELECT c, s, CAST(list_sum(list_transform(s, v -> v*v)) AS BIGINT) AS ss "
        f"FROM c{KMX_PASSES - 1})",
        "crank AS (SELECT cm.c, ROW_NUMBER() OVER (ORDER BY "
        "CAST(list_sum(list_transform(list_zip(pq.xq, cm.s), z -> z[1]*z[2])) AS DOUBLE)"
        " / sqrt(CAST(cm.ss AS DOUBLE)) DESC, cm.c) AS rk FROM cm, pq)",
        f"cells AS (SELECT c FROM crank WHERE rk <= {N_PROBE})",
        f"incell AS (SELECT a.vec_id FROM a{KMX_PASSES} a JOIN cells USING (c) "
        f"WHERE a.vec_id <> {PROBE_VEC_ID})",
        f"probe AS (SELECT CAST(embedding AS DOUBLE[]) AS p FROM embeddings "
        f"WHERE vec_id = {PROBE_VEC_ID})",
        "scored AS (SELECT e.vec_id, list_dot_product(e.e, p) / "
        "(sqrt(list_dot_product(e.e, e.e)) * sqrt(list_dot_product(p, p))) AS cos "
        "FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings) e "
        "JOIN incell USING (vec_id), probe)",
    ]
    return (
        "WITH " + ",\n".join(parts) + "\n"
        f"SELECT vec_id, ROUND(cos, 6) AS cos_sim FROM scored "
        f"ORDER BY cos DESC, vec_id LIMIT {TOP_K}"
    )


@query("q_sim_ann_ivf", oracle=_ann_ivf_oracle(), tags=("similarity", "ann", "ivf"))
def q_sim_ann_ivf(spark, sf_dir):
    """IVF-pruned cosine top-10 for probe vector 0: scan only the
    N_PROBE of k cells nearest the probe (at 100 TB the cell filter is a
    parquet partition prune). Upgraded rows-only → FULL HASH CHECK
    (VERDICT r4 theme): the index is the audited exact-integer Lloyd fit
    (shared with q_ml_kmeans_exact), cell ranking is a deterministic
    single-division comparator, and the in-cell scan is the same fold
    kernel q_sim_cosine_topk already hash-matches — so DuckDB replays
    index build + probe end to end. Recall vs the brute-force baseline
    is additionally asserted in tests."""
    return ann_ivf_topk(spark, sf_dir)


def materialize_ivf_index(spark: SparkSession, sf_dir: str, index_dir: str) -> None:
    """Persist the IVF index in its production layout: the cell-assigned
    corpus written ``partitionBy("cell")`` plus a tiny centroid-rational
    table (cell, s, n — exact integers, so a re-opened index ranks cells
    bit-identically to the in-memory build). After this one-off build, a
    probe's nprobe cell filter is satisfied by parquet PARTITION PRUNING —
    the scan lists only the nprobe cell directories; no shuffle, no index
    service, no full pass. This is the layout the in-memory
    `_ivf_index_for` cache stands in for at test scale (asserted against
    the plan in tests/test_similarity_ops.py)."""
    from ..sources.layout import write_partitioned

    assigned, cents = _ivf_index_for(spark, sf_dir)
    write_partitioned(assigned.drop("xq"), index_dir, ["cell"])
    cdf = spark.createDataFrame(
        [(c, list(s), n) for (c, s, n) in cents],
        "cell long, s array<long>, n long",
    )
    cdf.coalesce(1).write.mode("overwrite").parquet(f"{index_dir.rstrip('/')}_centroids")


def ann_ivf_topk_from_index(
    spark: SparkSession,
    index_dir: str,
    probe_vec_id: int = PROBE_VEC_ID,
    k: int = TOP_K,
    nprobe: int = N_PROBE,
) -> DataFrame:
    """Probe the MATERIALIZED index: centroid ranking on the driver (k
    rows of exact rationals), then a scan of only the nprobe matching
    cell partitions."""
    base = index_dir.rstrip("/")
    cents_rows = spark.read.parquet(f"{base}_centroids").orderBy("cell").collect()
    cents = [(int(r.cell), [int(v) for v in r.s], int(r.n)) for r in cents_rows]
    corpus = spark.read.parquet(base)
    probe_row = corpus.filter(F.col("vec_id") == probe_vec_id).select("embedding").head()
    probe = [float(v) for v in probe_row[0]]
    cells = rank_cells_audited(cents, _quantize_probe(probe), nprobe)
    in_cells = corpus.filter(
        F.col("cell").isin(cells) & (F.col("vec_id") != probe_vec_id)
    )
    cos = cosine_probe(F.col("embedding"), probe)
    return (
        in_cells.select("vec_id", cos.alias("cos"))
        .orderBy(F.col("cos").desc(), "vec_id")
        .limit(k)
        .select("vec_id", F.round("cos", 6).alias("cos_sim"))
    )


def knn_join(
    corpus: DataFrame,
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    k: int,
    *,
    local_extra: int = 8,
) -> DataFrame:
    """Distributed exact knn-join: every corpus partition computes one
    (batch × queries) GEMM against the broadcast query matrix and emits
    only its LOCAL top-(k+1+extra) per query — the map-side combiner that
    makes the global shuffle O(partitions · queries · k) instead of
    O(corpus · queries). The caller ranks the union globally.

    The query matrix rides an sc.broadcast (it must fit in executor
    memory — the standard constraint for exact knn; larger query sets are
    sharded and unioned, and truly corpus-sized "queries" are what the
    IVF path above is for). Cosine is computed as dot/(|a|·|b|) in
    float64, the same association DuckDB's list_dot_product oracle uses,
    so values agree to well inside the 1e-6 rounding the declared query
    applies.

    local_extra guards the tie boundary: candidates are preselected by
    cos alone (argpartition), then strictly ordered by (-cos, vec_id), so
    a kth-place cos tie is only resolved correctly if the tying rows are
    among the preselected — +8 covers any plausible duplicate burst."""
    spark = corpus.sparkSession
    q = np.ascontiguousarray(query_mat, dtype=np.float64)
    qnorm = np.linalg.norm(q, axis=1)
    qnorm[qnorm == 0] = 1.0
    bc = spark.sparkContext.broadcast((np.asarray(query_ids), q, qnorm))
    take = k + 1 + local_extra  # +1: a query's own vector is filtered later

    from ._arrow import list_mat

    def gen(batches):
        import pyarrow as pa

        qids, qm, qn = bc.value
        for b in batches:
            if not b.num_rows:
                continue
            m = list_mat(b.column("embedding"), qm.shape[1], dtype=np.float64)
            vids = b.column("vec_id").to_numpy(zero_copy_only=False)
            nrm = np.linalg.norm(m, axis=1)
            nrm[nrm == 0] = 1.0
            s = (m @ qm.T) / (nrm[:, None] * qn[None, :])  # (n, nq) cosine
            kk = min(take, s.shape[0])
            cand = np.argpartition(-s, kk - 1, axis=0)[:kk] if kk < s.shape[0] else None
            out_q, out_v, out_c = [], [], []
            for j in range(s.shape[1]):
                rows = cand[:, j] if cand is not None else np.arange(s.shape[0])
                order = np.lexsort((vids[rows], -s[rows, j]))[:kk]
                sel = rows[order]
                out_q.append(np.full(len(sel), qids[j]))
                out_v.append(vids[sel])
                out_c.append(s[sel, j])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.concatenate(out_q)),
                    pa.array(np.concatenate(out_v)),
                    pa.array(np.concatenate(out_c)),
                ],
                names=["query_id", "vec_id", "cos"],
            )

    return corpus.mapInArrow(gen, "query_id long, vec_id long, cos double")


@query(
    "q_sim_knn_all",
    oracle="""
    WITH q AS (
        SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
        FROM embeddings WHERE vec_id % 10 = 0
    ), c AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), scored AS (
        SELECT q.query_id, c.vec_id,
               list_dot_product(c.e, q.qe)
                 / (sqrt(list_dot_product(c.e, c.e)) * sqrt(list_dot_product(q.qe, q.qe))) AS cos
        FROM q JOIN c ON c.vec_id <> q.query_id
    ), ranked AS (
        SELECT query_id, vec_id, cos,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rnk
        FROM scored
    )
    SELECT query_id, vec_id AS neighbor_id, ROUND(cos, 6) AS cos_sim, rnk
    FROM ranked WHERE rnk <= 5
    """,
    tags=("similarity", "knn", "gemm"),
)
def q_sim_knn_all(spark, sf_dir):
    """Exact k-NN join: cosine top-5 over the full corpus for every query
    vector (the 10% vec_id%10==0 subset), via per-partition GEMM blocks
    against the broadcast query matrix with local top-k pre-pruning —
    the eval/ground-truth building block ANN recall is measured against.
    Self-matches are excluded after the kernel (each partition over-
    selects by one). The only shuffle is partitions·queries·k candidate
    rows into the global window rank."""
    from pyspark.sql import Window as W

    emb = t(spark, sf_dir, "embeddings")
    k = 5
    q_rows = (
        emb.filter(F.col("vec_id") % 10 == 0).select("vec_id", "embedding").collect()
    )  # driver-side by design: the query matrix is the broadcast operand
    qids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    qmat = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in q_rows])
    cand = knn_join(emb.repartition(32, "vec_id"), qids, qmat, k)
    rnk = F.row_number().over(
        W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    )
    return (
        cand.filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("rnk", rnk)
        .filter(F.col("rnk") <= k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round("cos", 6).alias("cos_sim"),
            "rnk",
        )
    )


# Soft-assignment replication for cell-blocked dedup: each vector lands in
# its SOFT_ASSIGN nearest cells, so a near-dup pair is caught whenever the
# two cell sets intersect. The fixture's near-orthogonal vectors are IVF's
# worst case (neighbors barely co-cluster); recall vs the label-blocked
# ground truth is asserted ≥0.95 in tests/test_dedup_hardening.py.
SOFT_ASSIGN = 4

# Quantized-cosine near-dup threshold τ=0.4 as the exact rational τ²=4/25:
# dup iff dot>0 AND 25·dot² ≥ 4·|a|²·|b|² — division- and sqrt-free exact
# int64 (|xq|<2^10, dim 64 → dot<2^26, 25·dot²<2^57), the same audited
# comparator family as q_dedup_semantic's τ=0.35.
EMB_DEDUP_THRESHOLD = 0.4
_EMB_TAU_NUM, _EMB_TAU_DEN = 4, 25


def soft_assign_audited(
    assigned: DataFrame,
    cents: list[tuple[int, list[int], int]],
    n_assign: int = SOFT_ASSIGN,
) -> DataFrame:
    """Multi-probe IVF assignment over the QUANTIZED corpus: each Arrow
    batch ranks all k centroids per vector with one exact int64 GEMM and
    the deterministic r = double(dot)/sqrt(double(ss)) comparator (ties →
    lower cell id, via stable argsort over id-ordered columns — the same
    ordering rank_cells_audited and the DuckDB window replay use), then
    keeps the top ``n_assign`` cells. Centroid rationals ship in the task
    closure (k×dim ints — bytes); zero shuffle until the per-cell
    grouping that follows. Arrow-native (mapInArrow + zero-copy buffer
    reshapes, guide §4.2): the old pandas body rebuilt the matrix row by
    row (``tolist``) and replicated xq with a Python list comprehension —
    both measured as dominant terms next to the BLAS GEMM at the 100×
    probe corpus."""
    import pyarrow as pa

    from ._arrow import list_mat, mat_list

    cs = np.array([s for (_, s, _) in cents], dtype=np.int64)
    cc = np.array([c for (c, _, _) in cents], dtype=np.int64)
    assert list(cc) == sorted(cc), "cents must stay sorted by cell id"
    ss = (cs * cs).sum(axis=1)
    rss = np.sqrt(ss.astype(np.float64))
    # ADVICE r5: a degenerate all-zero centroid (ss == 0) must rank LAST
    # deterministically — the same ss==0 → -inf convention as
    # rank_cells_audited — not produce NaN/inf out of a 0-division. (No
    # fixture produces one; this pins the edge so the three rankers can
    # never disagree on it.)
    zero_cell = ss == 0
    dim = cs.shape[1]

    def gen(batches):
        for b in batches:
            if not b.num_rows:
                continue
            X = list_mat(b.column("xq"), dim)
            dot = exact_int_gemm(X, cs.T)  # exact int64 (BLAS under 2^53 bound)
            r = dot.astype(np.float64) / np.where(zero_cell, 1.0, rss)[None, :]
            r[:, zero_cell] = -np.inf
            take = min(n_assign, r.shape[1])
            idx = np.argsort(-r, axis=1, kind="stable")[:, :take]
            vec = b.column("vec_id").to_numpy(zero_copy_only=False)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.repeat(vec, take)),
                    mat_list(np.repeat(X, take, axis=0)),
                    pa.array(cc[idx].reshape(-1)),
                ],
                names=["vec_id", "xq", "cell"],
            )

    return assigned.mapInArrow(gen, "vec_id long, xq array<long>, cell long")


def _cell_pairs_exact(pdf: "pd.DataFrame") -> "pd.DataFrame":
    """One cell's near-dup pairs via a single exact-int64 GEMM over the
    quantized vectors: all pairwise dots in one matmul, threshold by the
    division-free comparator, and the reported cosine is the one
    correctly-rounded double(dot)/(sqrt(na²)·sqrt(nb²)) both engines
    compute identically. A 10k-vector cell is a 10k×10k product —
    milliseconds of BLAS — where the equivalent per-pair join would
    shuffle 50M candidate rows."""
    from ._arrow import pdf_mat

    X = pdf_mat(pdf["xq"], dtype=np.int64)
    ids = pdf["vec_id"].to_numpy()
    dot = exact_int_gemm(X, X.T)
    n2 = (X * X).sum(axis=1)
    ia, ib = np.triu_indices(len(ids), k=1)
    d = dot[ia, ib]
    keep = (d > 0) & (
        _EMB_TAU_DEN * d * d >= _EMB_TAU_NUM * n2[ia] * n2[ib]
    )
    ia, ib, d = ia[keep], ib[keep], d[keep]
    a, b = ids[ia], ids[ib]
    lo = np.minimum(a, b)
    hi = np.maximum(a, b)
    qcos = d.astype(np.float64) / (
        np.sqrt(n2[ia].astype(np.float64)) * np.sqrt(n2[ib].astype(np.float64))
    )
    return pd.DataFrame({"id_a": lo, "id_b": hi, "qcos": qcos})


def _emb_cells_oracle() -> str:
    """DuckDB replay: Lloyd CTEs (adaptive k) → per-vector top-SOFT_ASSIGN
    cell window over the same deterministic comparator → per-cell exact
    pairwise with the τ²=4/25 integer test → DISTINCT pairs (a pair
    co-occurring in several cells computes identical values)."""
    from ..queries.ml import KMX_PASSES, _kmx_cte_parts

    # _adaptive_k_sql() yields the IDENTICAL text the old inline form
    # did — these oracle fingerprints are certified and must not drift.
    parts = _kmx_cte_parts(k_sql=_adaptive_k_sql())
    parts += [
        f"cm AS (SELECT c, s, CAST(list_sum(list_transform(s, v -> v*v)) AS BIGINT) AS ss "
        f"FROM c{KMX_PASSES - 1})",
        "soft AS (SELECT q.vec_id, q.xq, cm.c, ROW_NUMBER() OVER ("
        "PARTITION BY q.vec_id ORDER BY "
        "CAST(list_sum(list_transform(list_zip(q.xq, cm.s), z -> z[1]*z[2])) AS DOUBLE)"
        " / sqrt(CAST(cm.ss AS DOUBLE)) DESC, cm.c) AS rk FROM q, cm)",
        f"sa AS (SELECT vec_id, xq, c FROM soft WHERE rk <= {SOFT_ASSIGN})",
        "sn AS (SELECT vec_id, c, xq, "
        "CAST(list_sum(list_transform(xq, x -> x*x)) AS BIGINT) AS n2 FROM sa)",
        "sp AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
        "CAST(list_sum(list_transform(list_zip(a.xq, b.xq), z -> z[1]*z[2])) AS BIGINT) AS dot, "
        "a.n2 AS na2, b.n2 AS nb2 "
        "FROM sn a JOIN sn b ON a.c = b.c AND a.vec_id < b.vec_id)",
    ]
    return (
        "WITH " + ",\n".join(parts) + "\n"
        "SELECT DISTINCT id_a, id_b, "
        "ROUND(CAST(dot AS DOUBLE) / (sqrt(CAST(na2 AS DOUBLE)) * sqrt(CAST(nb2 AS DOUBLE))), 6)"
        " AS cos_sim "
        f"FROM sp WHERE dot > 0 AND {_EMB_TAU_DEN}*dot*dot >= {_EMB_TAU_NUM}*na2*nb2"
    )


@query(
    "q_dedup_embedding_cells",
    oracle=_emb_cells_oracle(),
    tags=("dedup", "embedding", "ann", "ivf", "exact-audit"),
)
def q_dedup_embedding_cells(spark, sf_dir):
    """Embedding near-dup pairs blocked by IVF cell instead of label — the
    100 TB shape q_dedup_embedding's docstring promises: block sizes are
    set by k (an index build-time knob, adaptive to the corpus), so pair
    generation is Σcell², not Σlabel² growing quadratically with the
    corpus. Each vector is soft-assigned to its SOFT_ASSIGN nearest cells;
    each cell then confirms its own pairs with ONE exact-int64 GEMM
    (``_cell_pairs_exact``) instead of a candidate join — the candidate
    shuffle disappears entirely. Upgraded rows-only → FULL HASH CHECK:
    the audited Lloyd index + deterministic soft assignment + the
    division-free τ²=4/25 integer near-dup test make the pair set (and
    the reported quantized cosine) bit-identical to the DuckDB replay.
    A pair co-occurring in up to SOFT_ASSIGN cells computes identical
    values each time, so the cross-cell dedup is a grouped max over the
    surviving pairs only."""
    # the fit's quantized frame is already spread across the cores and
    # persisted for the query's lifetime (queries/ml.py _kmx_fit) —
    # reuse it instead of re-quantizing + re-shuffling the corpus
    q, cents = _ivf_fit_for(spark, sf_dir)
    soft = soft_assign_audited(q, cents)
    pairs = soft.groupBy("cell").applyInPandas(
        lambda pdf: _cell_pairs_exact(pdf), "id_a long, id_b long, qcos double"
    )
    return (
        pairs.groupBy("id_a", "id_b")
        .agg(F.max("qcos").alias("qcos"))
        .select("id_a", "id_b", F.round("qcos", 6).alias("cos_sim"))
    )


@query(
    "q_sim_ann_ivf_index",
    oracle=_ann_ivf_oracle(),
    tags=("similarity", "ann", "ivf", "layout"),
)
def q_sim_ann_ivf_index(spark, sf_dir):
    """ANN probe against the MATERIALIZED IVF index — the production
    layout: corpus persisted partitionBy("cell") plus a tiny
    centroid-rational table. The probe ranks centroids driver-side (k
    rows), then scans ONLY the nprobe nearest cell directories — visible
    in the plan as ``PartitionFilters: cell IN (...)`` (asserted in
    tests/test_plan_quality.py). At 100 TB the index build is a one-off
    partitioned write and every probe touches nprobe/k of the corpus
    files; no index service, no shuffle, no full pass. Hash-checked
    against the SAME oracle as q_sim_ann_ivf: the exact-integer
    centroids round-trip the parquet write bit-identically, so the
    materialized probe must equal the in-memory one (also asserted
    directly in tests/test_similarity_ops.py)."""
    from ..queries._util import scratch_dir

    index_dir = scratch_dir("q_sim_ann_ivf_index", sf_dir)
    materialize_ivf_index(spark, sf_dir, index_dir)
    return ann_ivf_topk_from_index(spark, index_dir)
