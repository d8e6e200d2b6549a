#!/usr/bin/env python
"""Interleaved warm A/B timing of named declared queries in ONE session.

Protocol (BASELINE.md discipline): per query, 1 untimed warm-up, then
ROUNDS alternating timed runs. Because both variants run interleaved in
the same session minutes apart, co-tenant drift hits both equally —
unlike comparing two full-bench runs an hour apart.

Usage: SPARK_GRAFT_SF_DIR=... python tools/ab_bench.py q_a,q_b [rounds]
Prints per-query min/median over the rounds.
"""
from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from spark_ml_pipelines_example_spark.operators._cache import release_tracked
    from spark_ml_pipelines_example_spark.plans.session import get_spark
    from spark_ml_pipelines_example_spark.queries.registry import load_all

    names = sys.argv[1].split(",")
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    registry = load_all()
    spark = get_spark(app_name="ab_bench")
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()

    times: dict[str, list[float]] = {n: [] for n in names}
    for n in names:  # warm-up
        registry[n].fn(spark, SF_DIR).count()
        release_tracked()
    for _ in range(rounds):
        for n in names:
            t0 = time.perf_counter()
            registry[n].fn(spark, SF_DIR).count()
            times[n].append(time.perf_counter() - t0)
            release_tracked()
    for n in names:
        r = times[n]
        print(
            f"{n}: min {min(r):.3f}s median {statistics.median(r):.3f}s "
            f"runs {[round(v, 3) for v in r]}"
        )


if __name__ == "__main__":
    main()
