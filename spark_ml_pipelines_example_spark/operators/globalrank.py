"""Two-phase (binned) global running aggregates.

An unpartitioned ``Window.orderBy(...)`` funnels the WHOLE frame through
one task — fine for a collapsed day/hour/bin frame (≤ a few thousand
rows), fatal for a catalog-keyed frame (parts/suppliers GROW with the
corpus; at 100 TB they are tens of millions of rows serialized through a
single sorted partition). Yet cumulative-share classification (Pareto /
ABC), Gini ranks, and top-share ratios genuinely need a *global* running
sum / row number over the catalog order.

This module computes those EXACTLY in two phases, the same decomposition
the repo uses for the deterministic global shuffle (queries/curation.py
q_shuffle_global):

  1. bin every row by a monotone function of the order value (``n_bins``
     value-range buckets from one min/max scalar aggregate);
  2. aggregate per bin (count + sum) and run the cumulative window over
     the ≤ ``n_bins``-row bin frame — the ONLY unpartitioned window, and
     its input is bounded by construction;
  3. broadcast the per-bin prefix totals back and finish with a window
     PARTITIONED BY bin (parallel, one task per bin) for the within-bin
     offsets.

Because the bin function is monotone in the order value and every tie
(equal order values) lands in the same bin, phase-3's
``prefix_before_bin + within_bin_running`` equals the single global
window's result row-for-row — exactly, when the value is integral
(decimal/long), and to the same float ULPs as any distributed sum when it
is a double. The caller's ORDER is (value [asc|desc], *tiebreaks), the
same total-order discipline every oracle-checked query here uses.

Cost: one extra scalar aggregate (min/max) + one extra bin-keyed shuffle,
in exchange for removing the single-task sort — the trade that wins from
~10⁶ rows up. Skew note: bins inherit the value distribution (a
pathological all-equal-values frame collapses to one bin = one task,
i.e. never WORSE than the single global window it replaces).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

N_BINS = 1024


def with_global_running(
    df: DataFrame,
    value_col: str,
    tiebreak_cols: list[str],
    *,
    descending: bool = False,
    cumsum_col: str | None = None,
    rank_col: str | None = None,
    n_bins: int = N_BINS,
    group_cols: tuple[str, ...] | list[str] = (),
    total_sum_col: str | None = None,
    total_count_col: str | None = None,
    bins: str = "log2",
    materialize: bool = False,
) -> DataFrame:
    """Add an exact global running sum (``cumsum_col``, inclusive, of
    ``value_col``) and/or global row number (``rank_col``) over the total
    order (value_col [desc], *tiebreak_cols) — without any unpartitioned
    window over ``df`` itself. With ``group_cols`` the running values
    restart per group (a grouped rank whose groups may each be
    catalog-sized — the case a plain ``partitionBy(group)`` window still
    funnels through one task per group); the phase-2 window is then
    partitioned by group over ≤ n_bins rows each.

    ``materialize=True`` lazily persists the binned frame (and the tiny
    per-bin aggregate) BEFORE fan-out. The decomposition reads its input
    from up to three plan branches (per-bin aggregate, optional group
    totals, final join), and AQE's runtime exchange reuse only PARTIALLY
    dedupes them: column pruning gives each branch a different
    ReadSchema, so the branch exchanges stop being identical — measured
    on q_agg_pareto/gini/abc_xyz, the final adaptive plan still executes
    THREE fact-table scans without materialization (ReusedExchange
    covers only the per-bin re-read). Set True whenever ``df`` is
    derived from a fact-table aggregate: the lazy persist adds NO
    build-time job (the first action fills the cache; the other
    branches read the InMemoryRelation) and pins only the catalog-sized
    frame (rows ∝ |catalog|, never the fact table, MEMORY_AND_DISK so
    spill is the failure mode) — at 100 TB it replaces two redundant
    fact scans+shuffles, which is decisive. An eager localCheckpoint
    was measured strictly worse (one extra job: 2.55s vs 2.23s warm on
    q_agg_abc_xyz at sf0.1). Leave False only when ``df`` is a cheap
    scan that re-reads for free.
    """
    if cumsum_col is None and rank_col is None:
        raise ValueError("request at least one of cumsum_col / rank_col")
    gc = list(group_cols)

    # Monotone non-decreasing value→bin map. Any deterministic monotone
    # map is CORRECT (equal values always share a bin; bin boundaries
    # never split ties) — the strategy only affects bin balance:
    #  - "log2" (default, non-negative values): fixed boundaries at
    #    1/16-octave steps, floor(16·log2(v+1)), capped at n_bins−1
    #    (covers the full 64-bit range). ZERO extra passes over df —
    #    measured: the min/max range pass re-aggregated the fact table
    #    and cost q_agg_abc_xyz ~0.6 s at sf0.1. Values within a bin
    #    differ by ≤ 2^(1/16) ≈ 4.4%, so smooth value distributions
    #    spread well.
    #  - "range": value-range buckets from one min/max scalar aggregate
    #    (pays one extra pass; handles negative values).
    v = F.col(value_col).cast("double")
    if bins == "log2":
        bin_raw = F.floor(F.log2(F.greatest(v, F.lit(0.0)) + 1.0) * 16.0)
        binned = df.withColumn(
            "_bin", F.least(bin_raw, F.lit(n_bins - 1)).cast("int")
        )
    else:
        rng = df.agg(
            F.min(value_col).alias("_mn"),
            F.max(value_col).alias("_mx"),
        )
        span = F.col("_mx").cast("double") - F.col("_mn").cast("double")
        bin_raw = F.floor((v - F.col("_mn").cast("double")) / (span + 1.0) * n_bins)
        binned = (
            df.crossJoin(F.broadcast(rng))
            .withColumn("_bin", F.least(bin_raw, F.lit(n_bins - 1)).cast("int"))
            .drop("_mn", "_mx")
        )

    if materialize:
        # LAZY persist, not an eager localCheckpoint: the first action
        # populates the cache once and every other plan branch reads the
        # InMemoryRelation instead of re-running the fact aggregate — the
        # same dedup, WITHOUT a build-time job (measured on q_agg_abc_xyz
        # at sf0.1: eager ckpt 2.55s vs persist 2.23s warm, and query
        # construction goes back to being action-free). MEMORY_AND_DISK:
        # the frame is catalog-sized, so spill is the safe failure mode.
        # Tracked so harness loops release it after the consuming action.
        from ._cache import persist_tracked

        binned = persist_tracked(binned)

    # Phase 2: the only non-bin-partitioned window — ≤ n_bins rows per
    # group (unpartitioned over ≤ n_bins rows total when ungrouped).
    per_bin = binned.groupBy(*gc, "_bin").agg(
        F.count(F.lit(1)).alias("_bn"),
        F.sum(value_col).alias("_bs"),
    )
    if materialize:
        from ._cache import persist_tracked

        per_bin = persist_tracked(per_bin)
    _bin_ord = F.col("_bin").desc() if descending else F.col("_bin").asc()
    w_prev = (
        (W.partitionBy(*gc) if gc else W).orderBy(_bin_ord)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    prefix = per_bin.select(
        *gc,
        "_bin",
        F.coalesce(F.sum("_bn").over(w_prev), F.lit(0)).alias("_n_prev"),
        F.coalesce(F.sum("_bs").over(w_prev), F.lit(0)).alias("_s_prev"),
    )

    # Phase 3: (group, bin)-partitioned window (parallel across bins).
    def _ord(c: str) -> Column:
        return F.col(c).desc() if descending else F.col(c).asc()

    w_in = W.partitionBy(*gc, "_bin").orderBy(
        _ord(value_col), *[F.col(c).asc() for c in tiebreak_cols]
    )
    join_keys = gc + ["_bin"]
    if total_sum_col is not None or total_count_col is not None:
        tot = per_bin.groupBy(*gc).agg(
            F.sum("_bs").alias("_tsum"), F.sum("_bn").alias("_tcnt")
        )
        keep = [
            c
            for c, want in (("_tsum", total_sum_col), ("_tcnt", total_count_col))
            if want is not None
        ]
        tot = tot.select(*gc, *keep)
        for c, want in (("_tsum", total_sum_col), ("_tcnt", total_count_col)):
            if want is not None:
                tot = tot.withColumnRenamed(c, want)
        prefix = prefix.join(F.broadcast(tot), gc) if gc else prefix.crossJoin(
            F.broadcast(tot)
        )
    out = binned.join(prefix if gc else F.broadcast(prefix), join_keys)
    if rank_col is not None:
        out = out.withColumn(rank_col, F.col("_n_prev") + F.row_number().over(w_in))
    if cumsum_col is not None:
        out = out.withColumn(
            cumsum_col,
            F.col("_s_prev")
            + F.sum(value_col).over(w_in.rowsBetween(W.unboundedPreceding, 0)),
        )
    return out.drop("_bin", "_bn", "_n_prev", "_s_prev")
