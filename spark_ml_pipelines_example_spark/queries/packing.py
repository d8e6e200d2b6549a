"""Sequence packing / shard assignment — the step between a cleaned corpus
and a training run: assign documents to fixed-token-budget shards so every
shard feeds one trainer worker or one packed sequence file.

Scale posture: packing needs a running token total, and a GLOBAL
cumulative window is the one-partition bottleneck that dies first at
100 TB. The scalable formulation packs WITHIN a natural block (here
``source``; in production: date bucket × source) — each block's cumsum
window is independent, so blocks pack in parallel and a shard never spans
blocks (which is also what you want operationally: shards inherit their
block's provenance). Greedy first-fit packing is inherently sequential;
the cumsum formulation is the order-preserving variant that is exactly
expressible in both engines and deterministic under a (block, doc_id)
sort.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.text import tokens
from ._util import t
from .registry import query

# Tokens per shard: sized so the ~60-token fixture docs pack a handful per
# shard and every source block spans multiple shards at every SF (a 4k
# budget would be degenerate at fixture scale: whole blocks fit one shard).
SHARD_TOKEN_BUDGET = 256


@query(
    "q_pack_shards",
    oracle=f"""
    WITH sized AS (
        SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
        FROM documents
    ), packed AS (
        SELECT source, doc_id, n_tokens,
               CAST(FLOOR(
                   (SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                        ROWS UNBOUNDED PRECEDING) - n_tokens)
                   / {SHARD_TOKEN_BUDGET}.0) AS BIGINT) AS shard
        FROM sized
    )
    SELECT source, shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM packed
    GROUP BY source, shard
    """,
    tags=("text", "packing", "training-data"),
)
def q_pack_shards(spark, sf_dir):
    """Assign docs to token-budget shards: shard = floor(exclusive-cumsum
    of token counts / budget) within each source block, then per-shard
    stats. The exclusive cumsum (running total MINUS own count) makes a
    doc that crosses the budget boundary start the next shard's range
    rather than orphan-split, matching first-fit-in-order semantics."""
    d = t(spark, sf_dir, "documents")
    sized = d.select(
        "doc_id", "source", F.size(tokens("text")).alias("n_tokens")
    )
    cum = (
        F.sum("n_tokens")
        .over(W.partitionBy("source").orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0))
        - F.col("n_tokens")
    )
    packed = sized.withColumn(
        "shard", F.floor(cum / float(SHARD_TOKEN_BUDGET)).cast("long")
    )
    return packed.groupBy("source", "shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@query(
    "q_pack_ffd",
    # The greedy first-fit loop IS SQL-expressible after all: a DuckDB
    # recursive CTE advances one doc per iteration (in the same
    # (tokens DESC, doc_id) order as the Spark-side loop) carrying the
    # per-bin remaining capacities as a LIST column — first fitting bin
    # via an indexed-lambda scan, bin update via list_transform. This
    # upgrades the query from rows-only to a full hash check
    # (precedent: q_win_capped_cumsum's running-recurrence oracle).
    oracle=f"""
    WITH RECURSIVE sized AS (
        SELECT doc_id, source, CAST(len(string_split(text,' ')) AS INT)
                   AS n_tokens
        FROM documents
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                                     ORDER BY n_tokens DESC, doc_id) AS r
        FROM sized
    ), fit(source, r, doc_id, n_tokens, chosen, bins) AS (
        SELECT source, r, doc_id, n_tokens,
               CAST(1 AS BIGINT) AS chosen,
               [GREATEST({SHARD_TOKEN_BUDGET} - n_tokens, 0)] AS bins
        FROM ranked WHERE r = 1
        UNION ALL
        SELECT d.source, d.r, d.doc_id, d.n_tokens,
               COALESCE(
                 CAST(list_filter(list_transform(f.bins,
                        (x, i) -> CASE WHEN x >= d.n_tokens THEN i END),
                        y -> y IS NOT NULL)[1] AS BIGINT),
                 len(f.bins) + 1) AS chosen,
               CASE WHEN list_filter(list_transform(f.bins,
                        (x, i) -> CASE WHEN x >= d.n_tokens THEN i END),
                        y -> y IS NOT NULL)[1] IS NULL
                    THEN list_append(f.bins,
                                     GREATEST({SHARD_TOKEN_BUDGET} - d.n_tokens, 0))
                    ELSE list_transform(f.bins,
                        (x, i) -> CASE WHEN i = list_filter(list_transform(f.bins,
                                     (x2, i2) -> CASE WHEN x2 >= d.n_tokens
                                                 THEN i2 END),
                                     y -> y IS NOT NULL)[1]
                                  THEN x - d.n_tokens ELSE x END)
               END AS bins
        FROM fit f JOIN ranked d ON d.source = f.source AND d.r = f.r + 1
    )
    SELECT source, CAST(chosen - 1 AS BIGINT) AS bin_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(MAX(n_tokens) AS BIGINT) AS max_doc_tokens
    FROM fit GROUP BY 1, 2
    """,
    tags=("text", "packing", "ffd", "training-data"),
)
def q_pack_ffd(spark, sf_dir):
    """First-fit-decreasing bin packing within each source block — the
    quality upgrade over q_pack_shards' order-preserving next-fit: FFD
    sorts docs by token count descending and drops each into the first
    bin with room, provably within 11/9·OPT+1 bins (vs next-fit's 2·OPT)
    — fewer padded tokens per training shard. The fit loop is inherently
    sequential, so it runs as an Arrow-batched ``applyInPandas`` per
    block (the declared Python-boundary pattern, like
    q_win_capped_cumsum): blocks pack in parallel, each block's loop is
    O(docs·bins) over an in-memory frame. Deterministic: sort key
    (tokens DESC, doc_id), bins scanned in creation order — which makes
    it HASH-CHECKABLE against the recursive-CTE oracle above (one
    recursion step per doc, bin capacities carried as a LIST column);
    conservation, capacity, and bins ≤ next-fit invariants additionally
    pinned in tests."""
    import pandas as pd

    budget = SHARD_TOKEN_BUDGET
    d = t(spark, sf_dir, "documents")
    sized = d.select("doc_id", "source", F.size(tokens("text")).alias("n_tokens"))

    def ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["n_tokens", "doc_id"], ascending=[False, True])
        bins: list[int] = []  # remaining capacity per bin
        out_bin = []
        for n in pdf["n_tokens"]:
            n = int(n)
            for i, rem in enumerate(bins):
                if rem >= n:
                    bins[i] = rem - n
                    out_bin.append(i)
                    break
            else:
                bins.append(max(budget - n, 0))  # oversize doc → own bin
                out_bin.append(len(bins) - 1)
        pdf = pdf.assign(bin_id=out_bin)
        return (
            pdf.groupby(["source", "bin_id"], as_index=False)
            .agg(
                n_docs=("doc_id", "size"),
                sum_tokens=("n_tokens", "sum"),
                max_doc_tokens=("n_tokens", "max"),
            )
        )

    return sized.groupBy("source").applyInPandas(
        ffd,
        "source string, bin_id long, n_docs long, sum_tokens long, max_doc_tokens long",
    )


BATCH_SIZE = 32


@query(
    "q_pack_padding_waste",
    oracle=f"""
    WITH sized AS (
        SELECT doc_id, source, CAST(len(string_split(text, ' ')) AS BIGINT)
                   AS n_tokens
        FROM documents
    ), arrival AS (
        SELECT source, n_tokens,
               (ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) - 1)
                   // {BATCH_SIZE} AS batch
        FROM sized
    ), bucketed AS (
        SELECT source, n_tokens,
               (ROW_NUMBER() OVER (PARTITION BY source
                                   ORDER BY n_tokens, doc_id) - 1)
                   // {BATCH_SIZE} AS batch
        FROM sized
    ), w AS (
        SELECT 'arrival' AS strategy, source, batch,
               COUNT(*) AS n, CAST(MAX(n_tokens) AS BIGINT) AS mx,
               CAST(SUM(n_tokens) AS BIGINT) AS s
        FROM arrival GROUP BY 2, 3
        UNION ALL
        SELECT 'length_bucketed', source, batch,
               COUNT(*), CAST(MAX(n_tokens) AS BIGINT),
               CAST(SUM(n_tokens) AS BIGINT)
        FROM bucketed GROUP BY 2, 3
    )
    SELECT strategy,
           CAST(COUNT(*) AS BIGINT) AS n_batches,
           CAST(SUM(s) AS BIGINT) AS real_tokens,
           CAST(SUM(n * mx - s) AS BIGINT) AS padded_tokens,
           ROUND(SUM(n * mx - s) * 100.0 / SUM(n * mx), 4) AS waste_pct
    FROM w GROUP BY 1
    """,
    tags=("text", "packing", "padding", "training-data"),
)
def q_pack_padding_waste(spark, sf_dir):
    """Padding-waste accounting for trainer batch formation — the number
    that justifies length bucketing: batches of {BATCH_SIZE} pad every
    sequence to the batch max, so waste = Σ(batch_max − len); forming
    batches in arrival order vs sorted-by-length order (within each
    source block, the same block discipline as q_pack_shards) shows the
    length-bucketed strategy cutting the padded-token bill. Everything
    is integer (row-number batching, max/sum per batch); the waste
    percentage is one rounded division. Two windows + two aggregates,
    each partitioned by source."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(tokens("text")).cast("long").alias("n_tokens")
    )

    def batches(order_cols, label):
        w = W.partitionBy("source").orderBy(*order_cols)
        return (
            d.withColumn(
                "batch",
                ((F.row_number().over(w) - 1) / BATCH_SIZE).cast("long"),
            )
            .groupBy("source", "batch")
            .agg(
                F.count("*").alias("n"),
                F.max("n_tokens").alias("mx"),
                F.sum("n_tokens").alias("s"),
            )
            .withColumn("strategy", F.lit(label))
        )

    both = batches(["doc_id"], "arrival").unionByName(
        batches(["n_tokens", "doc_id"], "length_bucketed")
    )
    return both.groupBy("strategy").agg(
        F.count("*").alias("n_batches"),
        F.sum("s").alias("real_tokens"),
        F.sum(F.col("n") * F.col("mx") - F.col("s")).alias("padded_tokens"),
        F.round(
            F.sum(F.col("n") * F.col("mx") - F.col("s"))
            * 100.0
            / F.sum(F.col("n") * F.col("mx")),
            4,
        ).alias("waste_pct"),
    )
