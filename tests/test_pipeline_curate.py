"""End-to-end curation pipeline: the funnel must be monotone, stages must
agree with their declared-query counterparts, and the written layout must
be split-partitioned and shard-complete."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_ml_pipelines_example_spark.pipeline import run_curate
from spark_ml_pipelines_example_spark.queries._util import scratch_dir
from spark_ml_pipelines_example_spark.queries.registry import load_all

REGISTRY = load_all()


def test_curate_funnel_and_layout(spark, sf_dir):
    out = scratch_dir("curate_out", sf_dir)
    stats = run_curate(spark, sf_dir, out, overwrite=True)

    # funnel monotone, nothing lost between last gate and the write
    seq = [
        stats["input_docs"],
        stats["after_quality"],
        stats["after_exact_dedup"],
        stats["after_decontamination"],
        stats["after_domain_cap"],
        stats["after_mix"],
    ]
    assert all(a >= b for a, b in zip(seq, seq[1:])), stats
    assert stats["written"] == stats["after_mix"]
    assert stats["after_quality"] > 0

    # domain-cap honored in the written output: no source over the cap
    # times 1.0 (the mix stage can only shrink per-source counts further)
    from spark_ml_pipelines_example_spark.queries.curation import DOMAIN_CAP

    per_src = (
        spark.read.parquet(out).groupBy("source").agg(F.count("*").alias("n"))
    )
    assert per_src.filter(F.col("n") > DOMAIN_CAP).count() == 0

    # stage agreement: quality gate == declared cascade's keep count
    cascade = REGISTRY["q_text_filter_cascade"].fn(spark, sf_dir)
    n_keep = cascade.filter(F.col("verdict") == "keep").count()
    assert stats["after_quality"] == n_keep

    # layout: split partition dirs exist; shards within budget-ish bounds
    outdf = spark.read.parquet(out)
    assert set(stats["splits"]) <= {"train", "val", "test"}
    assert sum(stats["splits"].values()) == stats["written"]
    assert {"split", "shard", "n_tokens"} <= set(outdf.columns)
    # every (split, source, shard) group's token sum stays under budget
    # plus one doc's overshoot (exclusive-cumsum first-fit semantics)
    from spark_ml_pipelines_example_spark.queries.packing import SHARD_TOKEN_BUDGET

    over = (
        outdf.groupBy("split", "source", "shard")
        .agg(F.sum("n_tokens").alias("s"), F.max("n_tokens").alias("m"))
        .filter(F.col("s") >= SHARD_TOKEN_BUDGET + F.col("m"))
    )
    assert over.count() == 0
