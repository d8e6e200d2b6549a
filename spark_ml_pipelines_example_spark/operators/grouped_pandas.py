"""Grouped pandas surfaces (SURVEY §2.3): applyInPandas (grouped-map) and
pandas_udf grouped-agg (custom UDAF).

These are the escape hatches for per-group logic Spark expressions can't
state — each group's rows stream to a Python worker as one Arrow batch
set, so groups must fit in worker memory (the contract to document at
100 TB: key cardinality × group size budgeting, salt oversized groups
first). Where a built-in CAN express the semantics we still prefer it;
the z-score job below exists to prove the plumbing and is cross-checked
against the pure-expression window formulation in tests.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..queries._util import t
from ..queries.registry import query

ZSCORE_SCHEMA = "l_returnflag string, l_orderkey long, l_linenumber int, qty_z double"


def zscore_grouped_map(li: DataFrame) -> DataFrame:
    """Per-group z-score via applyInPandas: each (returnflag) group
    arrives as a pandas frame, normalization is vectorized NumPy."""

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        q = pdf["l_quantity"]
        sd = q.std(ddof=1)
        z = (q - q.mean()) / sd if sd > 0 else q * 0.0
        return pd.DataFrame(
            {
                "l_returnflag": pdf["l_returnflag"],
                "l_orderkey": pdf["l_orderkey"],
                "l_linenumber": pdf["l_linenumber"],
                "qty_z": z,
            }
        )

    return (
        li.select("l_returnflag", "l_orderkey", "l_linenumber", "l_quantity")
        .groupBy("l_returnflag")
        .applyInPandas(norm, ZSCORE_SCHEMA)
    )


def zscore_expression(li: DataFrame) -> DataFrame:
    """The same semantics as pure window expressions (the formulation a
    production job should use — no Python boundary)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("l_returnflag")
    mean = F.mean("l_quantity").over(w)
    sd = F.stddev_samp("l_quantity").over(w)
    return li.select(
        "l_returnflag",
        "l_orderkey",
        "l_linenumber",
        ((F.col("l_quantity") - mean) / sd).alias("qty_z"),
    )


def second_largest_qty_udaf():
    """Grouped-agg pandas UDAF: second-largest distinct value. Integer
    logic (fixture quantities are integral), so deterministic across
    partitionings; each group's column arrives as one Series. Built
    lazily — pandas_udf resolves its return type against the active
    session, so decorating at import time fails before a session
    exists."""

    @F.pandas_udf("double")
    def second_largest_qty(q: pd.Series) -> float:
        distinct = q.astype("int64").drop_duplicates().nlargest(2)
        return float(distinct.iloc[-1]) if len(distinct) == 2 else float("nan")

    return second_largest_qty


@query(
    "q_udaf_second_largest",
    oracle="""
    SELECT l_returnflag,
           CAST(MAX(q) AS DOUBLE) AS second_qty
    FROM (
        SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q
        FROM lineitem
        WHERE CAST(l_quantity AS BIGINT) < (
            SELECT MAX(CAST(l2.l_quantity AS BIGINT)) FROM lineitem l2
            WHERE l2.l_returnflag = lineitem.l_returnflag
        )
    )
    GROUP BY l_returnflag
    """,
    tags=("udaf", "pandas"),
)
def q_udaf_second_largest(spark, sf_dir):
    """Custom UDAF surface: per-group second-largest distinct quantity via
    an Arrow grouped-agg pandas_udf. Pure integer logic → deterministic →
    SQL-oracled (correlated max-below-max formulation). The UDAF is the
    pattern; anything order-statistic-shaped that built-ins lack lands
    here."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        second_largest_qty_udaf()(F.col("l_quantity")).alias("second_qty")
    )


@query(
    "q_group_normalize",
    # z-scores have mean exactly 0 and sample-sd exactly 1 by construction;
    # round(…, 4) absorbs the float fold-order noise between the pandas
    # kernel and SQL aggregation, and the `+ 0.0` canonicalizes the IEEE
    # -0.0 that round(avg≈-1e-16) can produce on either engine.
    oracle="""
    WITH z AS (
        SELECT l_returnflag,
               (l_quantity - AVG(l_quantity) OVER (PARTITION BY l_returnflag))
               / STDDEV_SAMP(l_quantity) OVER (PARTITION BY l_returnflag) AS qty_z
        FROM lineitem
    )
    SELECT l_returnflag, COUNT(*) AS n,
           ROUND(AVG(qty_z), 4) + 0.0 AS z_mean,
           ROUND(STDDEV_SAMP(qty_z), 4) + 0.0 AS z_sd
    FROM z GROUP BY l_returnflag
    """,
    tags=("grouped-map", "pandas"),
)
def q_group_normalize(spark, sf_dir):
    """Grouped-map surface (applyInPandas z-score per returnflag), summed
    to per-group moments for a compact deterministic result: each group's
    z-scores have mean 0 and sample-sd 1 by construction, so the rounded
    moments hash-match the window-SQL twin. The exact per-row equivalence
    against the pure-window formulation is additionally asserted in tests."""
    li = t(spark, sf_dir, "lineitem")
    z = zscore_grouped_map(li)
    return z.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        (F.round(F.avg("qty_z"), 4) + F.lit(0.0)).alias("z_mean"),
        (F.round(F.stddev_samp("qty_z"), 4) + F.lit(0.0)).alias("z_sd"),
    )


UDTF_CHUNK_TOKENS = 10


@query(
    "q_udtf_chunk_table",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents
    ), chunks AS (
        SELECT doc_id, lang,
               array_to_string(
                   tk[(i * {UDTF_CHUNK_TOKENS} + 1):((i + 1) * {UDTF_CHUNK_TOKENS})],
                   ' ') AS chunk
        FROM toks, UNNEST(range(CAST(CEIL(len(tk) / {UDTF_CHUNK_TOKENS}.0) AS BIGINT)))
             AS u(i)
    )
    SELECT lang,
           COUNT(*) AS n_chunks,
           COUNT(DISTINCT chunk) AS n_distinct_chunks,
           CAST(SUM(len(string_split(chunk, ' '))) AS BIGINT) AS n_tokens
    FROM chunks GROUP BY lang
    """,
    tags=("udtf", "text", "chunking"),
)
def q_udtf_chunk_table(spark, sf_dir):
    """Python UDTF surface (SURVEY §2.3's third member next to scalar
    pandas UDFs and grouped UDAFs): a table function exploding each
    document into {UDTF_CHUNK_TOKENS}-token chunks via a LATERAL
    correlated call — the row-generating API for logic whose output
    cardinality varies per input row. The same chunking is ALSO
    expressed engine-side in q_text_chunk (sequence+explode+slice,
    whole-stage codegen, the fast path); this declared twin pins the
    UDTF call path itself — at 100 TB you reach for a UDTF only when
    the row-expansion logic can't be said in expressions (recursive
    descent parsers, tokenizer libraries), and it stays partition-
    parallel with no shuffle of its own either way.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: bigint, pos: int, chunk: string, n_tok: int")
    class ChunkDoc:
        def eval(self, doc_id, text):
            toks = text.split(" ")
            k = UDTF_CHUNK_TOKENS
            for i in range(0, len(toks), k):
                part = toks[i : i + k]
                yield (doc_id, i // k, " ".join(part), len(part))

    spark.udtf.register("chunk_doc_udtf", ChunkDoc)
    d = t(spark, sf_dir, "documents")
    d.createOrReplaceTempView("udtf_docs_src")
    chunks = spark.sql(
        "SELECT s.doc_id AS doc_id, d.lang, s.chunk, s.n_tok "
        "FROM udtf_docs_src d, LATERAL chunk_doc_udtf(d.doc_id, d.text) s"
    )
    return chunks.groupBy("lang").agg(
        F.count("*").alias("n_chunks"),
        F.countDistinct("chunk").alias("n_distinct_chunks"),
        F.sum("n_tok").cast("bigint").alias("n_tokens"),
    )


# Threshold-reset accumulator: flush when the running spend would reach
# CAP. Genuinely sequential per user — no window frame expresses "state
# feeding back into the next row", which is exactly the grouped-map
# escape hatch's job; the oracle states the same recurrence as a DuckDB
# RECURSIVE CTE, so this stateful op is still hash-checked.
CAPPED_CUMSUM_CAP = 200.0

_CAPPED_SCHEMA = (
    "user_id long, n_purchases long, n_flushes long, final_residual double"
)


@query(
    "q_win_capped_cumsum",
    oracle=f"""
    WITH RECURSIVE seq AS (
        SELECT user_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events WHERE event_type = 'purchase'
    ), rec AS (
        SELECT user_id, rn,
               CASE WHEN value >= {CAPPED_CUMSUM_CAP!r} THEN 0.0
                    ELSE value END AS bal,
               CASE WHEN value >= {CAPPED_CUMSUM_CAP!r} THEN 1
                    ELSE 0 END AS flushes
        FROM seq WHERE rn = 1
        UNION ALL
        SELECT s.user_id, s.rn,
               CASE WHEN r.bal + s.value >= {CAPPED_CUMSUM_CAP!r} THEN 0.0
                    ELSE r.bal + s.value END,
               r.flushes + CASE WHEN r.bal + s.value >= {CAPPED_CUMSUM_CAP!r}
                                THEN 1 ELSE 0 END
        FROM rec r JOIN seq s ON s.user_id = r.user_id AND s.rn = r.rn + 1
    ), final AS (
        SELECT user_id, rn AS n_purchases, flushes AS n_flushes, bal,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn DESC) AS last
        FROM rec
    )
    SELECT user_id, n_purchases, n_flushes,
           ROUND(bal, 6) AS final_residual
    FROM final WHERE last = 1
    """,
    tags=("window", "stateful", "map-in-pandas", "recurrence"),
)
def q_win_capped_cumsum(spark, sf_dir):
    """Threshold-reset running accumulator (spend throttle / batch-flush
    semantics): per user, in event order, balance += value; when it
    would reach CAP it flushes to zero and the flush counter
    increments. The recurrence feeds each row's state into the next, so
    no window frame can state it — the DuckDB oracle expresses the
    identical recurrence as a RECURSIVE CTE, which keeps even this
    stateful operator hash-checked. Both engines accumulate float64 in
    the same per-user (ts, event_id) order, so balances are
    bit-identical.

    Scale shape — sort-based streaming recurrence, NOT grouped-map:
    repartition on user_id + sortWithinPartitions, then ONE
    ``mapInPandas`` stream per partition with carry-over state across
    Arrow batches (a user's rows are contiguous in the sorted stream,
    but may straddle a batch boundary — the generator carries
    (user, balance, flushes) between batches). applyInPandas was
    measured 5× slower here: millions of tiny per-group pandas frames
    dominate when groups are small; the sorted stream pays one Arrow
    pass per partition regardless of group count."""
    ev = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "event_id", "ts", "value")
    )
    part = ev.repartition(32, "user_id").sortWithinPartitions(
        "user_id", "ts", "event_id"
    )

    def run(batches):
        cur = None
        bal, flushes, n = 0.0, 0, 0
        out: dict[str, list] = {
            "user_id": [],
            "n_purchases": [],
            "n_flushes": [],
            "final_residual": [],
        }

        def emit():
            out["user_id"].append(int(cur))
            out["n_purchases"].append(n)
            out["n_flushes"].append(flushes)
            out["final_residual"].append(round(bal, 6))

        for pdf in batches:
            for u, v in zip(
                pdf["user_id"].to_numpy(), pdf["value"].to_numpy()
            ):
                if cur is not None and u != cur:
                    emit()
                    bal, flushes, n = 0.0, 0, 0
                cur = u
                n += 1
                nxt = bal + float(v)
                if nxt >= CAPPED_CUMSUM_CAP:
                    bal = 0.0
                    flushes += 1
                else:
                    bal = nxt
        if cur is not None:
            emit()
        yield pd.DataFrame(out)

    return part.mapInPandas(run, _CAPPED_SCHEMA)


ARROW_STATS_SCHEMA = "label int, n_vectors long, mass long, max_normsq long"
ARROW_Q = 1024  # power-of-two quantizer: float32->float64 cast and *1024 both exact


@query(
    "q_group_arrow_stats",
    oracle=f"""
    WITH q AS (
        SELECT label,
               list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE)*{ARROW_Q}) AS BIGINT)) AS xq
        FROM embeddings
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(SUM(list_sum(xq)) AS BIGINT) AS mass,
           CAST(MAX(list_sum(list_transform(xq, v -> v*v))) AS BIGINT) AS max_normsq
    FROM q GROUP BY label
    """,
    tags=("udaf", "arrow", "grouped-map"),
)
def q_group_arrow_stats(spark, sf_dir):
    """Grouped-map via `applyInArrow` — the Spark-4 Arrow-NATIVE twin of
    applyInPandas (no pandas materialization: each label group arrives as
    a pyarrow.Table and leaves as one). The kernel is vectorized numpy
    over the list column's flat values + offsets (np.add.reduceat — zero
    per-row Python), and all arithmetic is exact int64 on floor-quantized
    vectors, so the Python-side reduction is order-insensitive and the
    oracle replays it in SQL.

    Scale shape: one hash shuffle on label, then per-group Arrow batches;
    group size budgeting is the documented contract (labels here are
    10-ary and uniform — skewed keys would be salted first like the
    applyInPandas jobs)."""
    import numpy as np
    import pyarrow as pa

    def stats(tbl: "pa.Table") -> "pa.Table":
        arr = tbl.column("xq").combine_chunks()
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        starts = offsets[:-1]
        row_sums = np.add.reduceat(flat, starts) if len(flat) else np.zeros(0, np.int64)
        row_nsq = (
            np.add.reduceat(flat * flat, starts) if len(flat) else np.zeros(0, np.int64)
        )
        label = tbl.column("label")[0].as_py()
        return pa.table(
            {
                "label": pa.array([label], pa.int32()),
                "n_vectors": pa.array([len(starts)], pa.int64()),
                "mass": pa.array([int(row_sums.sum())], pa.int64()),
                "max_normsq": pa.array([int(row_nsq.max())], pa.int64()),
            }
        )

    emb = t(spark, sf_dir, "embeddings").select(
        "label",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.floor(x * ARROW_Q).cast("long"),
        ).alias("xq"),
    )
    return emb.groupBy("label").applyInArrow(stats, ARROW_STATS_SCHEMA)
