"""Approximate-nearest-neighbor scale path over `embeddings`.

Brute-force cosine (queries/similarity.py — the oracle-checkable ground
truth) reads the whole corpus per probe. At 100 TB the scale path is an
**IVF (inverted-file) index**: partition the corpus into k cells by
k-means centroid, store it partitioned by cell, and answer a probe by
scanning only the `nprobe` cells whose centroids are nearest — a
partition-pruned read of nprobe/k of the data instead of a full pass.

Spark-first layout:
- cell assignment is a one-off batch job (MLlib KMeans, seeded) whose
  output would be written `partitionBy("cell")` in production, so the
  per-probe cell filter becomes parquet partition pruning — no shuffle,
  no index service;
- the in-cell scan reuses the same codegen cosine kernel as the
  brute-force baseline;
- for very high dimensions, `cosine_pandas_factory` swaps the
  fold-per-element Catalyst expression for an Arrow-batched NumPy
  matrix-vector product (one BLAS call per batch instead of dim·rows
  expression-tree evaluations).

Recall is measured against the brute-force baseline in
tests/test_similarity_ops.py (not oracle-checkable: k-means cells are
engine-specific → rows-only).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.similarity import cosine_probe
from ..queries._util import t
from ..queries.registry import query

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


def adaptive_k(n_vectors: int, soft_cells: int = 4) -> int:
    import math

    return max(N_CELLS, math.ceil(soft_cells * n_vectors / TARGET_SOFT_ROWS_PER_CELL))


def assign_ivf_cells(emb: DataFrame, k: int | None = None) -> tuple[DataFrame, np.ndarray]:
    """Fit seeded k-means over the embedding column and return
    (corpus + `cell` column, centroid matrix). In production the
    assigned corpus is persisted `partitionBy("cell")`; re-fitting is an
    offline index build, not a per-query cost. ``k=None`` → adaptive:
    cells sized to a bounded row target (see TARGET_SOFT_ROWS_PER_CELL)
    so pair work stays linear in the corpus."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    if k is None:
        k = adaptive_k(emb.count())
    vec = emb.withColumn("__fvec", array_to_vector("embedding"))
    km = KMeans(k=k, seed=42, featuresCol="__fvec", predictionCol="cell")
    model = km.fit(vec)
    assigned = model.transform(vec).drop("__fvec")
    centers = np.stack([np.asarray(c) for c in model.clusterCenters()])
    return assigned, centers


def nearest_cells(centers: np.ndarray, probe: np.ndarray, nprobe: int = N_PROBE) -> list[int]:
    """Driver-side: rank the k centroids by cosine to the probe (k is
    tiny — centroids always fit on the driver)."""
    norms = np.linalg.norm(centers, axis=1) * np.linalg.norm(probe)
    cos = (centers @ probe) / np.where(norms == 0, 1.0, norms)
    return [int(i) for i in np.argsort(-cos)[:nprobe]]


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


# Built IVF indexes, keyed by corpus dir: the index build (k-means fit +
# assignment) is an OFFLINE cost — production persists the assigned corpus
# partitionBy("cell") once and every probe reuses it, so the per-query
# path must not refit. The cached assignment DataFrame is Spark-cached
# (storage-level memory) on first use.
_IVF_INDEX: dict[str, tuple[DataFrame, np.ndarray]] = {}


def _ivf_index_for(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, np.ndarray]:
    if sf_dir not in _IVF_INDEX:
        assigned, centers = assign_ivf_cells(t(spark, sf_dir, "embeddings"))
        assigned = assigned.cache()
        assigned.count()
        _IVF_INDEX[sf_dir] = (assigned, centers)
    return _IVF_INDEX[sf_dir]


def ann_ivf_topk(
    spark: SparkSession,
    sf_dir: str,
    probe_vec_id: int = 0,
    k: int = TOP_K,
    use_pandas_kernel: bool = False,
) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    probe_row = emb.filter(F.col("vec_id") == probe_vec_id).select("embedding").head()
    probe = [float(v) for v in probe_row[0]]
    assigned, centers = _ivf_index_for(spark, sf_dir)
    cells = nearest_cells(centers, np.asarray(probe))
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


@query("q_sim_ann_ivf", oracle=None, tags=("similarity", "ann", "ivf"))
def q_sim_ann_ivf(spark, sf_dir):
    """IVF-pruned cosine top-10 for probe vector 0: scan only the 6 of 16
    k-means cells nearest the probe (38% of the corpus; at 100 TB the
    cell filter is a parquet partition prune). Rows-only — k-means cell
    boundaries are engine-specific; recall vs the brute-force baseline is
    asserted in tests."""
    return ann_ivf_topk(spark, sf_dir)


def materialize_ivf_index(spark: SparkSession, sf_dir: str, index_dir: str) -> None:
    """Persist the IVF index in its production layout: the cell-assigned
    corpus written ``partitionBy("cell")`` plus a tiny centroids table.
    After this one-off build, a probe's nprobe cell filter is satisfied by
    parquet PARTITION PRUNING — the scan lists only the nprobe cell
    directories; no shuffle, no index service, no full pass. This is the
    layout the in-memory `_ivf_index_for` cache stands in for at test
    scale (asserted against the plan in tests/test_similarity_ops.py)."""
    from ..sources.layout import write_partitioned

    assigned, centers = _ivf_index_for(spark, sf_dir)
    write_partitioned(assigned, index_dir, ["cell"])
    cdf = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
        "cell int, centroid array<double>",
    )
    cdf.coalesce(1).write.mode("overwrite").parquet(f"{index_dir.rstrip('/')}_centroids")


def ann_ivf_topk_from_index(
    spark: SparkSession,
    index_dir: str,
    probe_vec_id: int = 0,
    k: int = TOP_K,
    nprobe: int = N_PROBE,
) -> DataFrame:
    """Probe the MATERIALIZED index: centroid ranking on the driver (k
    rows), then a scan of only the nprobe matching cell partitions."""
    base = index_dir.rstrip("/")
    centers_rows = spark.read.parquet(f"{base}_centroids").orderBy("cell").collect()
    centers = np.stack([np.asarray(r.centroid, dtype=np.float64) for r in centers_rows])
    corpus = spark.read.parquet(base)
    probe_row = corpus.filter(F.col("vec_id") == probe_vec_id).select("embedding").head()
    probe = [float(v) for v in probe_row[0]]
    cells = nearest_cells(centers, np.asarray(probe), nprobe)
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

    def gen(batches):
        qids, qm, qn = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            vids = pdf["vec_id"].to_numpy()
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
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "vec_id": np.concatenate(out_v),
                    "cos": np.concatenate(out_c),
                }
            )

    return corpus.mapInPandas(gen, "query_id long, vec_id long, cos double")


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
# worst case (neighbors barely co-cluster); measured recall vs the
# label-blocked ground truth: 1.0 at sf0.001/sf0.01, 0.965 (83/86) at
# sf0.1 — the residue pairs straddle cell boundaries in all 4 probes.
# Real embedding corpora cluster, shifting that curve toward 1. Asserted
# ≥0.95 in tests/test_dedup_hardening.py.
SOFT_ASSIGN = 4


def assign_soft_cells(
    spark: SparkSession, emb: DataFrame, centers: np.ndarray, n_assign: int = SOFT_ASSIGN
) -> DataFrame:
    """Multi-probe IVF assignment: rank all k centroids per vector by
    cosine (k×dim work per row — the standard IVF assignment cost) and keep
    the top ``n_assign``. Centroids ride along as a broadcast (k rows), so
    the expansion is a narrow broadcast-join + window, no corpus shuffle
    until the per-cell grouping that follows."""
    from pyspark.sql import Window as W

    from ..functions.similarity import cosine_prenorm, l2_norm

    cdf = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
        "cell int, cvec array<double>",
    )
    scored = (
        emb.withColumn("__n", l2_norm(F.col("embedding")))
        .join(F.broadcast(cdf.withColumn("__cn", l2_norm(F.col("cvec")))))
        .withColumn(
            "__cos",
            cosine_prenorm(F.col("embedding"), F.col("cvec"), F.col("__n"), F.col("__cn")),
        )
    )
    rank = F.row_number().over(
        W.partitionBy("vec_id").orderBy(F.col("__cos").desc(), F.col("cell"))
    )
    return (
        scored.withColumn("__r", rank)
        .filter(F.col("__r") <= n_assign)
        .drop("cvec", "__cn", "__cos", "__r")
    )


EMB_DEDUP_THRESHOLD = 0.4


def _cell_pairs_gemm(pdf: pd.DataFrame) -> pd.DataFrame:
    """One cell's near-dup pairs via a single GEMM: normalize the cell's
    vectors, multiply, and emit only the upper-triangle entries at or
    above the threshold. A 10k-vector cell is a 10k×10k float64 product —
    milliseconds of BLAS — where the equivalent per-pair join would
    shuffle 50M candidate rows."""
    m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()
    nrm = np.linalg.norm(m, axis=1)
    nrm[nrm == 0] = 1.0
    s = (m @ m.T) / (nrm[:, None] * nrm[None, :])
    ia, ib = np.triu_indices(len(ids), k=1)
    keep = s[ia, ib] >= EMB_DEDUP_THRESHOLD
    ia, ib = ia[keep], ib[keep]
    a, b = ids[ia], ids[ib]
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    return pd.DataFrame({"id_a": lo, "id_b": hi, "cos": s[ia, ib]})


@query("q_dedup_embedding_cells", oracle=None, tags=("dedup", "embedding", "ann", "ivf"))
def q_dedup_embedding_cells(spark, sf_dir):
    """Embedding near-dup pairs blocked by IVF cell instead of label — the
    100 TB shape q_dedup_embedding's docstring promises: block sizes are
    set by k (an index build-time knob), so pair generation is Σcell², not
    Σlabel² growing quadratically with the corpus. Each vector is
    soft-assigned to its 4 nearest of 16 cells; each cell then confirms
    its own pairs with ONE GEMM (``_cell_pairs_gemm``) instead of a
    candidate join — measured 3× faster than even the ids-only join
    variant, because the 12M-row candidate shuffle disappears entirely.
    A pair co-occurring in up to 4 cells computes bit-identical cos each
    time, so the cross-cell dedup is a grouped max (one small shuffle of
    the surviving pairs only). Rows-only: k-means cells are
    engine-specific."""
    emb = t(spark, sf_dir, "embeddings")
    _, centers = _ivf_index_for(spark, sf_dir)
    assigned = assign_soft_cells(spark, emb.repartition(32, "vec_id"), centers).select(
        "cell", "vec_id", "embedding"
    )
    pairs = assigned.groupBy("cell").applyInPandas(
        lambda pdf: _cell_pairs_gemm(pdf), "id_a long, id_b long, cos double"
    )
    return (
        pairs.groupBy("id_a", "id_b")
        .agg(F.max("cos").alias("cos"))
        .select("id_a", "id_b", F.round("cos", 6).alias("cos_sim"))
    )


@query("q_sim_ann_ivf_index", oracle=None, tags=("similarity", "ann", "ivf", "layout"))
def q_sim_ann_ivf_index(spark, sf_dir):
    """ANN probe against the MATERIALIZED IVF index — the production
    layout: corpus persisted partitionBy("cell") plus a tiny centroids
    table. The probe ranks centroids driver-side (k rows), then scans
    ONLY the nprobe nearest cell directories — visible in the plan as
    ``PartitionFilters: cell IN (...)`` (asserted in
    tests/test_plan_quality.py). At 100 TB the index build is a one-off
    partitioned write and every probe touches nprobe/k of the corpus
    files; no index service, no shuffle, no full pass. Rows-only (k-means
    cell boundaries are engine-specific); equality with the in-memory
    IVF variant and recall vs brute force are asserted in
    tests/test_similarity_ops.py."""
    from ..queries._util import scratch_dir

    index_dir = scratch_dir("q_sim_ann_ivf_index", sf_dir)
    materialize_ivf_index(spark, sf_dir, index_dir)
    return ann_ivf_topk_from_index(spark, index_dir)
