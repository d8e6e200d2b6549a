"""As-of join skew probe (VERDICT r6 task #4): measure the merge-scan
as-of under a HOT KEY and show the bucketed two-phase variant bounds the
straggler task that the key-partitioned window cannot avoid.

Corpus: events at sf0.1 replicated ``SPARK_GRAFT_PROBE_REPLICAS``× (default
10), with a twist the disjoint-range sketch probe deliberately avoids —
HALF of all user_ids collapse onto ONE hot user (user_id = 1), the
realistic power-law worst case for a (key)-partitioned Window. AQE's
skew-split never rewrites a Window's Exchange, so asof_join_gap must put
the hot user's entire probe+ref union in ONE task; asof_join_bucketed
partitions on (user_id, 1-hour bucket) and caps every task at
hot_rows / |buckets|.

Reported per variant: wall seconds, the matched-row count (MUST be equal
— same semantics), and the max/mean rows-per-window-partition of the hot
key (the theoretical straggler bound). Output is the markdown row
recorded in BASELINE.md's probe table.

Usage: python tools/probe_asof_skew.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF01 = "/root/testdata/sf0.1"
REPLICAS = int(os.environ.get("SPARK_GRAFT_PROBE_REPLICAS", "10"))
PROBE = f"/root/repo/.scratch/asof_skew_probe_r{REPLICAS}"


def build_probe() -> None:
    os.makedirs(PROBE, exist_ok=True)
    out = f"{PROBE}/events.parquet"
    if os.path.exists(out):
        return
    con = duckdb.connect()
    # replica r shifts event ids into a disjoint range; user ids with an
    # EVEN original id all collapse to hot user 1, odd ids stay disjoint
    # per replica — ~half the corpus on one key.
    parts = [
        f"SELECT event_id + {r * 100_000_000} AS event_id, ts, "
        f"CASE WHEN user_id % 2 = 0 THEN 1 "
        f"     ELSE user_id + {r * 10_000_000} END AS user_id, "
        f"event_type, value, props "
        f"FROM read_parquet('{SF01}/events.parquet')"
        for r in range(REPLICAS)
    ]
    con.execute(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{out}' (FORMAT PARQUET)"
    )


def main() -> None:
    build_probe()
    from pyspark.sql import SparkSession, functions as F

    from spark_ml_pipelines_example_spark.operators.asof import (
        asof_join_bucketed,
        asof_join_gap,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("probe_asof_skew")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ev = spark.read.parquet(f"{PROBE}/events.parquet")
    probes = ev.filter(F.col("event_type") == "purchase")
    refs = ev.filter(F.col("event_type") == "click")
    kw = dict(
        on="user_id", ts="ts", payload="event_id", alias="ref_id",
        direction="backward", tolerance_expr="INTERVAL 1 HOUR",
    )
    width = 3_600_000_000  # 1 hour

    # straggler bound: rows the hot key puts in ONE window partition
    hot = ev.filter(
        (F.col("user_id") == 1) & F.col("event_type").isin("purchase", "click")
    )
    hot_total = hot.count()
    hot_buckets = (
        hot.select((F.unix_micros(F.col("ts").cast("timestamp")) / width)
                   .cast("long").alias("b"))
        .groupBy("b").count()
        .agg(F.max("count").alias("mx"), F.avg("count").alias("mean"),
             F.count("*").alias("n_buckets"))
        .collect()[0]
    )

    def run(label, fn, **extra):
        # time the COLD count: a warm re-count would reuse the window
        # stage's shuffle files and measure nothing. Scans are pre-warmed
        # once below (parquet footer/OS cache shared by both variants).
        out = fn(probes, refs, **kw, **extra)
        t0 = time.perf_counter()
        n = out.count()
        t = time.perf_counter() - t0
        matched = out.filter(F.col("ref_id").isNotNull()).count()
        return label, n, matched, t

    ev.count()  # warm the scan side once for both variants

    a = run("asof_join_gap (key-partitioned)", asof_join_gap)
    b = run(
        "asof_join_bucketed (key+1h bucket)",
        asof_join_bucketed,
        bucket_width_us=width,
    )
    assert a[1] == b[1] and a[2] == b[2], (a, b)

    # k-nearest pair under the same hot key (round-7 batch 3): same
    # semantics check (row multisets equal), same straggler argument.
    from spark_ml_pipelines_example_spark.operators.asof import (
        asof_join_topk,
        asof_join_topk_bucketed,
    )

    tkw = dict(on="user_id", ts="ts", ref_id="event_id", k=3, rank_alias="rank")

    def run_topk(label, fn, **extra):
        out = fn(probes, refs, **tkw, **extra)
        t0 = time.perf_counter()
        n = out.count()
        t = time.perf_counter() - t0
        return label, n, n, t

    c = run_topk("asof_join_topk (key-partitioned)", asof_join_topk)
    d = run_topk(
        "asof_join_topk_bucketed (key+1h bucket)",
        asof_join_topk_bucketed,
        bucket_width_us=width,
    )
    assert c[1] == d[1], (c, d)

    # nearest pair under the same hot key (round-8): completes the
    # measured matrix — every as-of direction now has its bucketed
    # trade priced at the same 10x/30x hot key.
    from spark_ml_pipelines_example_spark.operators.asof import (
        asof_join_nearest,
        asof_join_nearest_bucketed,
    )

    nkw = dict(
        on="user_id", ts="ts", payload="event_id", alias="ref_id",
        tolerance_expr="INTERVAL 1 HOUR",
    )

    def run_nearest(label, fn, **extra):
        out = fn(probes, refs, **nkw, **extra)
        t0 = time.perf_counter()
        n = out.count()
        t = time.perf_counter() - t0
        matched = out.filter(F.col("ref_id").isNotNull()).count()
        return label, n, matched, t

    e = run_nearest("asof_join_nearest (key-partitioned)", asof_join_nearest)
    g = run_nearest(
        "asof_join_nearest_bucketed (key+1h bucket)",
        asof_join_nearest_bucketed,
        bucket_width_us=width,
    )
    assert e[1] == g[1] and e[2] == g[2], (e, g)

    print(
        f"hot key rows = {hot_total} "
        f"(one window partition unbucketed; bucketed: "
        f"{hot_buckets['n_buckets']} buckets, max {hot_buckets['mx']}, "
        f"mean {hot_buckets['mean']:.0f} rows/partition)"
    )
    print("| variant | rows | matched | sec |")
    print("|---|---|---|---|")
    for label, n, matched, t in (a, b, c, d, e, g):
        print(f"| {label} | {n} | {matched} | {t:.2f} |", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
