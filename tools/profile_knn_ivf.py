#!/usr/bin/env python
"""Stage-level decomposition of q_ml_knn_classifier_ivf (VERDICT r11 #1):
after one full warm-up (index memo built, code compiled), time each
sub-frame of the query separately, then the full query, in one session.

Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_DRIVER_MEM=48g python tools/profile_knn_ivf.py
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(spark, label, action):
    spark.sparkContext.setJobDescription(label)
    t0 = time.perf_counter()
    out = action()
    dt = time.perf_counter() - t0
    print(f"  {label}: {dt:.3f}s  ({out})", flush=True)
    spark.sparkContext.setJobDescription(None)
    return dt


def noop(df):
    df.write.format("noop").mode("overwrite").save()
    return "noop"


def main() -> None:
    from pyspark.sql import functions as F
    from pyspark.sql import Window as W

    from spark_ml_pipelines_example_spark.operators.similarity import (
        ivf_probe_routing,
        pair_cosine_arrow,
    )
    from spark_ml_pipelines_example_spark.plans.session import get_spark
    from spark_ml_pipelines_example_spark.queries.registry import load_all
    from spark_ml_pipelines_example_spark.queries.ml import KNN_K, KNN_PROBE_MOD

    registry = load_all()
    spark = get_spark(app_name="profile_knn_ivf")
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()

    q = registry["q_ml_knn_classifier_ivf"]
    print(f"corpus: {SF_DIR}")
    t0 = time.perf_counter()
    q.fn(spark, SF_DIR).count()
    print(f"warm-up (incl. index build): {time.perf_counter() - t0:.3f}s", flush=True)

    for rep in range(2):
        print(f"--- rep {rep} ---")
        probes, corpus, pcells = ivf_probe_routing(spark, SF_DIR, KNN_PROBE_MOD)
        timed(spark, "probes.count", lambda: probes.count())
        timed(spark, "pcells.count (crank)", lambda: pcells.count())
        timed(spark, "corpus noop (l2_norm pass)", lambda: noop(corpus))
        probes2 = probes.withColumnRenamed("plabel", "true_label")
        probe_side = pcells.join(probes2, "pid")
        joined = corpus.join(F.broadcast(probe_side), "cell").select(
            "pid", "true_label", "cid", "nlabel", "pe", "ce", "pn", "cn"
        )
        timed(spark, "joined.count (no cosine)", lambda: joined.count())
        pairs = pair_cosine_arrow(joined, ["pid", "true_label", "cid", "nlabel"])
        timed(spark, "pairs noop (join+cosine)", lambda: noop(pairs))
        topk = pairs.withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("pid").orderBy(F.col("cos").desc(), "cid")
            ),
        ).filter(F.col("rk") <= KNN_K)
        timed(spark, "topk noop (+window)", lambda: noop(topk))
        timed(spark, "FULL query", lambda: q.fn(spark, SF_DIR).count())


if __name__ == "__main__":
    main()
