"""End-to-end data-pipeline CLI (the north-star counterpart of ml/jobs.py).

The reference ships runnable driver programs (scopt CLIs, SURVEY §2.1
R22); this is the equivalent entry point for the LLM-data-pipeline
surface: a dedup job that takes a documents corpus through near-dup pair
generation → connected-component clustering → canonical selection, and
writes the deduplicated corpus plus a cluster report.

    python -m spark_ml_pipelines_example_spark.pipeline dedup \
        --input /root/testdata/sf0.01 --output /tmp/deduped \
        --method jaccard --overwrite

Scale notes: every stage is a declared operator with the plan shapes
documented in queries/dedup.py and operators/clusters.py; the output
write partitions by lang so downstream per-language jobs prune.
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run_dedup(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    method: str = "jaccard",
    overwrite: bool = False,
) -> dict:
    """Dedup the documents table at `input_dir`; write kept docs to
    `output_dir` (partitioned by lang) and return run stats."""
    from .operators.clusters import connected_components
    from .queries.registry import load_all
    from .sources.io import load_table, make_save_mode

    registry = load_all()
    pair_query = {
        "jaccard": "q_dedup_ngram_jaccard",
        "minhash": "q_dedup_minhash",
        "exact": "q_dedup_exact",
    }[method]

    docs = load_table(spark, input_dir, "documents")
    if method == "exact":
        keep = registry[pair_query].fn(spark, input_dir).select(
            F.col("keep_id").alias("doc_id")
        )
        n_clusters = keep.count()
    else:
        pairs = registry[pair_query].fn(spark, input_dir).select("doc_a", "doc_b")
        comps = connected_components(pairs)
        canonical = comps.groupBy("comp").agg(F.min("node").alias("doc_id"))
        dropped = comps.filter(F.col("node") != F.col("comp")).select(
            F.col("node").alias("doc_id")
        )
        keep = docs.select("doc_id").join(dropped, "doc_id", "left_anti")
        n_clusters = canonical.count()

    kept_docs = docs.join(keep, "doc_id")
    (
        kept_docs.write.mode(make_save_mode(overwrite))
        .partitionBy("lang")
        .parquet(output_dir)
    )
    stats = {
        "input_docs": docs.count(),
        "kept_docs": kept_docs.count(),
        "clusters": n_clusters,
        "method": method,
        "output": output_dir,
    }
    return stats


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(prog="spark_ml_pipelines_example_spark.pipeline")
    sub = ap.add_subparsers(dest="job", required=True)
    dd = sub.add_parser("dedup", help="near-dup removal: pairs → clusters → canonical")
    dd.add_argument("--input", required=True, help="fixture dir with documents.parquet")
    dd.add_argument("--output", required=True)
    dd.add_argument("--method", choices=["jaccard", "minhash", "exact"], default="jaccard")
    dd.add_argument("--overwrite", action="store_true")
    args = ap.parse_args(argv)

    from .plans.session import get_spark

    spark = get_spark(app_name=f"pipeline-{args.job}")
    if args.job == "dedup":
        stats = run_dedup(spark, args.input, args.output, args.method, args.overwrite)
        print(stats)


if __name__ == "__main__":
    main()
