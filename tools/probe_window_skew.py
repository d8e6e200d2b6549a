"""Window frame-exclusion skew probe (VERDICT r7 task #3): measure the
leave-one-out algebra (q_win_frame_exclude / q_win_frame_exclude_modes,
queries/windows.py) under a COLLAPSED HOT KEY and show the group-collapse
remedy — q_win_frame_groups' aggregate-then-join-back shape — bounds the
straggler task that a raw-key Window cannot avoid.

The exposure: both exclusion queries window on the raw key
(partitionBy(o_custkey)), and AQE's skew-split never rewrites a Window's
Exchange — a hot customer lands its ENTIRE order history in one task.
The remedy follows from the algebra itself: every exclusion mode is a
difference of PARTITION-LEVEL (and for GROUP/TIES, PEER-GROUP-LEVEL)
totals and the row's own contribution, and totals need no window at all:

    group-collapse plan (frame_groups' shape, queries/windows.py:178):
      1. groupBy(key) [+ groupBy(key, peer)] — map-side combinable, so
         the hot key is reduced to ONE row per grouping before any
         exchange; the hot key cannot straggle a partial aggregate;
      2. broadcast the KB-scale totals back to the fact rows — map-only,
         zero fact-table shuffle (at billions of keys where broadcast no
         longer fits, the join-back is a shuffle join, and join
         Exchanges ARE AQE-skew-splittable, unlike Window Exchanges);
      3. exclude_current = total − own; exclude_group = total − peer
         total; exclude_ties = total − peer total + own.

Corpus: orders at sf0.1 replicated SPARK_GRAFT_PROBE_REPLICAS× (default
10), with HALF of all custkeys collapsed onto ONE hot customer — the
power-law worst case for a key-partitioned Window.

Reported per variant: wall seconds and an exact integer checksum
(COUNT, COUNT(NULL other_spend), SUM(other_spend), SUM(n_other)) —
the checksums MUST match (same semantics). Output is the markdown row
recorded in BASELINE.md's probe table.

Usage: python tools/probe_window_skew.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF01 = "/root/testdata/sf0.1"
REPLICAS = int(os.environ.get("SPARK_GRAFT_PROBE_REPLICAS", "10"))
PROBE = f"/root/repo/.scratch/window_skew_probe_r{REPLICAS}"


def build_probe() -> None:
    os.makedirs(PROBE, exist_ok=True)
    out = f"{PROBE}/orders.parquet"
    if os.path.exists(out):
        return
    con = duckdb.connect()
    # replica r shifts order keys into a disjoint range; custkeys with an
    # EVEN original id all collapse to hot customer 1, odd ids stay
    # disjoint per replica — ~half the corpus on one key.
    parts = [
        f"SELECT o_orderkey + {r * 100_000_000} AS o_orderkey, "
        f"CASE WHEN o_custkey % 2 = 0 THEN 1 "
        f"     ELSE o_custkey + {r * 10_000_000} END AS o_custkey, "
        f"o_orderdate, o_totalprice "
        f"FROM read_parquet('{SF01}/orders.parquet')"
        for r in range(REPLICAS)
    ]
    con.execute(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{out}' (FORMAT PARQUET)"
    )


def main() -> None:
    build_probe()
    from pyspark.sql import SparkSession, Window as W, functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("probe_window_skew")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    o = spark.read.parquet(f"{PROBE}/orders.parquet").select(
        "o_orderkey",
        "o_custkey",
        F.to_date("o_orderdate").alias("od"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_cents"),
    )
    hot_rows = o.filter(F.col("o_custkey") == 1).count()
    total_rows = o.count()  # also warms the scan for every variant

    def exclude_window(df):
        # q_win_frame_exclude's declared plan: raw-key unbounded window.
        w = W.partitionBy("o_custkey")
        n = F.count("*").over(w)
        return df.select(
            "o_orderkey",
            "o_custkey",
            F.when(n > 1, F.sum("price_cents").over(w) - F.col("price_cents"))
            .cast("bigint")
            .alias("other_spend_cents"),
            (n - 1).cast("long").alias("n_other"),
        )

    def exclude_collapse(df):
        # frame_groups' shape: combinable aggregate + broadcast join-back.
        totals = df.groupBy("o_custkey").agg(
            F.sum("price_cents").alias("t_sum"), F.count("*").alias("t_n")
        )
        j = df.join(F.broadcast(totals), "o_custkey")
        return j.select(
            "o_orderkey",
            "o_custkey",
            F.when(F.col("t_n") > 1, F.col("t_sum") - F.col("price_cents"))
            .cast("bigint")
            .alias("other_spend_cents"),
            (F.col("t_n") - 1).cast("long").alias("n_other"),
        )

    def modes_window(df):
        # q_win_frame_exclude_modes' declared plan: two windows, one key
        # exchange (partition totals + peer-group totals).
        wp = W.partitionBy("o_custkey")
        wg = W.partitionBy("o_custkey", "od")
        ps, pn = F.sum("price_cents").over(wp), F.count("*").over(wp)
        gs, gn = F.sum("price_cents").over(wg), F.count("*").over(wg)
        return df.select(
            "o_orderkey",
            "o_custkey",
            F.when(pn > gn, ps - gs).cast("bigint").alias("other_spend_cents"),
            (pn - gn).cast("long").alias("n_other"),
        )

    def modes_collapse(df):
        part = df.groupBy("o_custkey").agg(
            F.sum("price_cents").alias("p_sum"), F.count("*").alias("p_n")
        )
        grp = df.groupBy("o_custkey", "od").agg(
            F.sum("price_cents").alias("g_sum"), F.count("*").alias("g_n")
        )
        j = df.join(F.broadcast(part), "o_custkey").join(
            F.broadcast(grp), ["o_custkey", "od"]
        )
        return j.select(
            "o_orderkey",
            "o_custkey",
            F.when(F.col("p_n") > F.col("g_n"), F.col("p_sum") - F.col("g_sum"))
            .cast("bigint")
            .alias("other_spend_cents"),
            (F.col("p_n") - F.col("g_n")).cast("long").alias("n_other"),
        )

    def run(label, fn):
        out = fn(o)
        t0 = time.perf_counter()
        chk = out.agg(
            F.count("*").alias("n"),
            F.count(F.when(F.col("other_spend_cents").isNull(), 1)).alias("nulls"),
            # hot-key leave-one-out sums exceed int64 (750k rows x ~1e13
            # cents each); decimal(38,0) keeps the checksum exact.
            F.sum(F.col("other_spend_cents").cast("decimal(38,0)")).alias("s"),
            F.sum(F.col("n_other").cast("decimal(38,0)")).alias("m"),
        ).collect()[0]
        t = time.perf_counter() - t0
        return label, tuple(chk), t

    a = run("exclude CURRENT ROW: raw-key window", exclude_window)
    b = run("exclude CURRENT ROW: group-collapse + bcast", exclude_collapse)
    assert a[1] == b[1], (a, b)
    c = run("exclude GROUP/TIES: raw-key windows", modes_window)
    d = run("exclude GROUP/TIES: group-collapse + bcast", modes_collapse)
    assert c[1] == d[1], (c, d)

    print(
        f"hot key rows = {hot_rows} / {total_rows} "
        f"(one window partition raw-key; group-collapse reduces the hot "
        f"key to ONE total row map-side, join-back is broadcast map-only)"
    )
    print("| variant | checksum(n, nulls, sum, m) | sec |")
    print("|---|---|---|")
    for label, chk, t in (a, b, c, d):
        print(f"| {label} | {chk} | {t:.2f} |", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
