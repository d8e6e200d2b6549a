#!/usr/bin/env python
"""Interleaved A/B: MLlib PFP q_ml_fpgrowth (current) vs direct
singles+pairs enumeration (VERDICT r11 #2 candidate). Verifies
row-identical output first, then times alternating warm runs.

Usage: SPARK_GRAFT_SF_DIR=... python tools/ab_fpgrowth.py [rounds]
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def new_fpgrowth(spark, sf_dir):
    from pyspark.sql import functions as F

    from spark_ml_pipelines_example_spark.operators._cache import persist_tracked
    from spark_ml_pipelines_example_spark.queries.ml import _fp_min_count
    from spark_ml_pipelines_example_spark.sources.io import load_table

    li = load_table(spark, sf_dir, "lineitem")
    items = persist_tracked(li.select("l_orderkey", "l_partkey").distinct())
    n = items.select("l_orderkey").distinct().count()
    min_count = _fp_min_count(n)
    supp = persist_tracked(
        items.groupBy("l_partkey").agg(F.count("*").alias("freq"))
    )
    min_supp = supp.agg(F.min("freq").alias("m")).collect()[0]["m"]
    if min_supp is not None and min_supp < min_count:
        keep = supp.filter(F.col("freq") >= min_count).select("l_partkey")
        items = items.join(keep, "l_partkey", "left_semi")
    singles = supp.filter(F.col("freq") >= min_count).select(
        F.col("l_partkey").cast("string").alias("itemset"),
        F.lit(1).alias("set_size"),
        "freq",
    )
    a = items.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pa"))
    b = items.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pb"))
    pairs = (
        a.join(b, "k")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count("*").alias("freq"))
        .filter(F.col("freq") >= min_count)
        .select(
            F.concat_ws(
                "|", F.col("pa").cast("string"), F.col("pb").cast("string")
            ).alias("itemset"),
            F.lit(2).alias("set_size"),
            "freq",
        )
    )
    return (
        singles.unionByName(pairs)
        .orderBy(F.col("freq").desc(), "set_size", "itemset")
        .limit(100)
    )


def main() -> None:
    from spark_ml_pipelines_example_spark.operators._cache import release_tracked
    from spark_ml_pipelines_example_spark.plans.session import get_spark
    from spark_ml_pipelines_example_spark.queries.registry import load_all

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    registry = load_all()
    spark = get_spark(app_name="ab_fpgrowth")
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()

    old_fn = registry["q_ml_fpgrowth"].fn

    # row-identity check (ordered collect both sides)
    old_rows = [tuple(r) for r in old_fn(spark, SF_DIR).collect()]
    release_tracked()
    new_rows = [tuple(r) for r in new_fpgrowth(spark, SF_DIR).collect()]
    release_tracked()
    assert old_rows == new_rows, (
        f"MISMATCH: old {len(old_rows)} rows vs new {len(new_rows)}; "
        f"first diff: {next((a, b) for a, b in zip(old_rows, new_rows) if a != b)}"
    )
    print(f"row-identical: {len(old_rows)} rows")

    times = {"old": [], "new": []}
    for _ in range(rounds):
        for label, fn in (("old", old_fn), ("new", new_fpgrowth)):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            times[label].append(time.perf_counter() - t0)
            release_tracked()
    for label, r in times.items():
        print(f"{label}: min {min(r):.3f}s runs {[round(x, 3) for x in r]}")


if __name__ == "__main__":
    main()
