"""Exact top-k heavy hitters at scale: bounded-memory local candidate
generation with an error certificate, then a one-pass exact confirm.

The 100 TB problem: ``GROUP BY key ORDER BY count DESC LIMIT k`` over a
key domain of billions (tokens, URLs, user agents) shuffles one partial
count per distinct key per mapper — the exchange is as big as the
distinct-key domain. The classic fix (Misra–Gries 1982 / SpaceSaving,
Metwally et al. 2005) truncates each mapper's summary to m counters
BEFORE the exchange, so the only shuffle in the whole operator moves
O(partitions × m) summary rows, never fact-scale data. The price of the
truncation is bounded and *measurable*, which makes the final answer
provably exact rather than approximate:

1. **candidate pass** — ``mapInPandas`` runs a batch Misra–Gries variant
   per input partition: add each Arrow batch's group sizes to the counter
   table; when it exceeds m keys, let ``cut`` be the (m+1)-th largest
   counter, drop every key whose counter is <= cut (at most m survive),
   and add ``cut`` to that partition's error term ``err_p``. Counters are
   never inflated, so ``counter_p(x) <= true_p(x)``; and a key ABSENT
   from the final summary lost at most ``cut_i`` mass at each compaction
   that evicted it (each compaction evicts it at most once), so
   ``true_p(x) <= Σ_i cut_i = err_p``. Each task also emits its exact
   total row count, so the global N needs no second scan.
2. **certificate** — a key absent from EVERY summary has global count
   <= Σ_p err_p (sum the per-partition absence bounds). So if the k-th
   candidate's exact count strictly exceeds Σ_p err_p, no non-candidate
   can reach — or tie into — the top k: the result is provably exact.
3. **confirm pass** — exact recount of candidate keys only: broadcast
   the (≤ partitions × m)-row candidate set, semi-join it into the fact
   scan, one map-side-combinable count aggregate. Sketch counts never
   appear in the output; they only *nominate*.
4. **fallback** — if the certificate fails (near-uniform data, or m too
   small for the skew), run the plain exact groupBy instead. The OUTPUT
   is exact either way; the certificate only decides whether the cheap
   path was safe. This keeps the operator deterministic under any
   partitioning: partitioning can change which path runs, never the rows
   returned.

Reference parity note: the reference engine has no heavy-hitter operator
(its surface is the iris MLlib pipeline, src/main/scala/.../ModelFit.scala);
this is part of the LLM-data-pipeline extension surface (SURVEY §2.2n).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tag values in the summary frame: candidate counter rows carry the key
# columns; the two bound rows per partition carry NULL keys.
_CAND, _ERR, _TOTAL = "cand", "err", "total"


def _summarize_partitions(keys: list[str], m: int):
    """mapInPandas body: batch Misra–Gries over this partition's batches.

    Memory is O(m + batch distinct keys) — the counter table is compacted
    back to <= m keys after every batch, never materializing the
    partition's full key domain (that domain is exactly what the operator
    exists to avoid)."""
    import pandas as pd

    def run(batches):
        acc = None  # pd.Series indexed by key tuple -> int64 count
        err = 0
        total = 0
        for pdf in batches:
            total += len(pdf)
            g = pdf.groupby(keys, sort=False, dropna=False).size()
            # Integer-domain accumulation (ADVICE r7): Series.add with
            # fill_value promotes to float64 on misaligned indexes and
            # would round BEFORE any cast-back could help; reindex both
            # sides onto the union index and add as int64 so counters
            # stay exact at any magnitude.
            if acc is None:
                acc = g
            else:
                idx = acc.index.union(g.index)
                acc = acc.reindex(idx, fill_value=0).astype("int64") + g.reindex(
                    idx, fill_value=0
                ).astype("int64")
            if len(acc) > m:
                acc = acc.sort_values(ascending=False)
                cut = int(acc.iloc[m])  # the (m+1)-th largest counter
                err += cut
                acc = acc[acc > cut]  # evict the <= cut tail (see module doc)
        if total == 0:
            return
        out = acc.rename("cnt").reset_index()
        out["cnt"] = out["cnt"].astype("int64")
        out["tag"] = _CAND
        bounds = pd.DataFrame(
            [
                {**{k: None for k in keys}, "cnt": err, "tag": _ERR},
                {**{k: None for k in keys}, "cnt": total, "tag": _TOTAL},
            ]
        )
        yield pd.concat([out, bounds], ignore_index=True)

    return run


def exact_topk_frequency(
    df: DataFrame, keys: list[str], k: int, m: int = 1024
) -> tuple[DataFrame, dict]:
    """Exact top-k keys of ``df`` by frequency, with ``share`` of total.

    Returns ``(topk_frame, info)`` where ``info`` records which path ran:
    ``certified`` (sketch path proven exact), ``err_bound`` (Σ_p err_p),
    ``n_candidates``, and ``n_rows``. RUNS JOBS at call time (the
    certificate is data-dependent control flow) — callers that need
    action-free construction wrap it in plans/deferred.DeferredFrame.
    """
    fact = df.select(*keys)
    # backtick-quote names so keys the DataFrame API accepts unquoted
    # (e.g. containing spaces) parse in the DDL schema string too
    key_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in fact.schema
    )
    summaries = fact.mapInPandas(
        _summarize_partitions(keys, m), f"{key_schema}, cnt long, tag string"
    )
    # One job materializes the KB-scale summary frame; every consumer
    # below reads the persisted copy, so the fact is scanned exactly once
    # for candidate generation and once for the confirm recount.
    # Deliberately a bare scoped persist, NOT operators/_cache
    # .persist_tracked: the summary's CONTENT is partitioning- and
    # batch-boundary-dependent (compaction points move), so a harness
    # release_tracked() between construction and consumption could
    # recompute a DIFFERENT summary — exactly what the tracked-persist
    # safety rule forbids. Here every consumer collects inside the
    # try block and the finally unpersists, so nothing outlives the
    # scope and the final OUTPUT stays exact either way.
    summaries = summaries.persist()
    try:
        bounds = {
            r["tag"]: r["s"]
            for r in summaries.filter(F.col("tag") != _CAND)
            .groupBy("tag")
            .agg(F.sum("cnt").alias("s"))
            .collect()  # exactly two rows
        }
        err_bound = int(bounds.get(_ERR, 0))
        n_rows = int(bounds.get(_TOTAL, 0))
        candidates = (
            summaries.filter(F.col("tag") == _CAND).select(*keys).distinct()
        )
        n_candidates = candidates.count()  # <= partitions * m by construction

        # Null-safe semi-join (ADVICE r7): a NULL-keyed group nominated by
        # the sketch (groupby dropna=False keeps it) must survive the
        # confirm recount too — plain `=` would drop it here while the
        # fallback groupBy keeps it, making the two exact paths disagree
        # on nullable key columns.
        fact_a, cand_a = fact.alias("hh_fact"), candidates.alias("hh_cand")
        null_safe_on = None
        for kcol in keys:
            # backtick-quote so key names with dots/spaces keep working
            # (the pre-r8 name-list join form accepted them)
            cond = F.col(f"hh_fact.`{kcol}`").eqNullSafe(F.col(f"hh_cand.`{kcol}`"))
            null_safe_on = cond if null_safe_on is None else (null_safe_on & cond)
        recount = (
            fact_a.join(F.broadcast(cand_a), null_safe_on, "left_semi")
            .groupBy(*keys)
            .agg(F.count("*").alias("cnt"))
        )
        top = recount.orderBy(F.col("cnt").desc(), *keys).limit(k).collect()
        kth = int(top[-1]["cnt"]) if len(top) >= k else 0
        # err_bound == 0 means no partition ever compacted: the candidate
        # set IS the full key domain, exact regardless of k vs distinct.
        certified = err_bound == 0 or (len(top) >= k and kth > err_bound)
    finally:
        summaries.unpersist()

    if certified:
        result = _topk_frame(df, top, keys, n_rows)
    else:
        # Exact fallback: the plain full groupBy (the expensive exchange
        # the sketch tried to dodge — correctness first).
        exact = (
            fact.groupBy(*keys)
            .agg(F.count("*").alias("cnt"))
            .orderBy(F.col("cnt").desc(), *keys)
            .limit(k)
            .collect()
        )
        result = _topk_frame(df, exact, keys, n_rows)
    info = {
        "certified": bool(certified),
        "err_bound": err_bound,
        "n_candidates": int(n_candidates),
        "n_rows": n_rows,
    }
    return result, info


def _topk_frame(df: DataFrame, rows, keys: list[str], n_rows: int) -> DataFrame:
    """Re-frame the k collected winner rows (k is tiny by contract) with
    the exact share column — one IEEE division of exact int64s."""
    spark = df.sparkSession
    schema = df.select(*keys).schema.add("cnt", "long")
    out = spark.createDataFrame([tuple(r) for r in rows], schema)
    return out.select(
        *keys,
        "cnt",
        (F.col("cnt") / F.lit(n_rows).cast("long")).alias("share"),
    )
