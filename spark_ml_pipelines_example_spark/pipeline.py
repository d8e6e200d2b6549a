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


def curate_frame(spark: SparkSession, input_dir: str) -> dict:
    """Build the curation DAG lazily; returns the named stage frames
    (``{"after_quality": df, ..., "packed": df}``) with NO action run —
    plan-lint inspects these plans (tests/test_plan_lint.py) and
    ``run_curate`` drives the funnel counts + write.

    Stages: quality-filter cascade → exact dedup (canonical doc per
    fingerprint) → eval-set decontamination → per-domain caps →
    per-source mix quotas → deterministic hash split → token-budget
    shard packing. Every stage is the row-level core of a declared
    (hash-checked) query. Scale: each stage is a projection, a per-key
    aggregate, or a broadcast probe; the two per-source rank stages use
    the binned two-phase decomposition (operators/globalrank.py), NOT a
    ``partitionBy(source)`` window — a crawl corpus where one source is
    80% of the docs would funnel that window through a single task
    (VERDICT r4 "What's wrong" #1)."""
    from .operators.globalrank import with_global_running
    from .queries.curation import DOMAIN_CAP, SPLIT_TRAIN_MAX, SPLIT_VAL_MAX
    from .queries.packing import SHARD_TOKEN_BUDGET
    from .queries.quality import MIX_DEFAULT_FRACTION, MIX_FRACTIONS
    from .queries.registry import load_all
    from .sources.io import load_table

    registry = load_all()
    docs = load_table(spark, input_dir, "documents")
    frames: dict = {"input": docs}

    # 1. quality cascade (first-fail verdicts; keep only 'keep')
    verdicts = registry["q_text_filter_cascade"].fn(spark, input_dir)
    kept = docs.join(
        verdicts.filter(F.col("verdict") == "keep").select("doc_id"), "doc_id"
    )
    frames["after_quality"] = kept

    # 2. exact dedup: canonical (min doc_id) per normalized fingerprint
    fp = kept.withColumn("fp", F.md5(F.lower(F.trim(F.col("text")))))
    canon = fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id")).select("doc_id")
    kept = kept.join(canon, "doc_id")
    frames["after_exact_dedup"] = kept

    # 3. decontamination: drop docs sharing shingles with the benchmark set
    contaminated = registry["q_text_contamination"].fn(spark, input_dir).select("doc_id")
    kept = kept.join(contaminated, "doc_id", "left_anti")
    frames["after_decontamination"] = kept

    # 4. per-domain caps: no single domain (≡ source host here — the
    # fixture's synthetic URLs are 1:1 with source) may contribute more
    # than DOMAIN_CAP docs; best-first by length, doc_id tie-break
    # (declared twin: q_text_domain_cap). Grouped rank via the binned
    # two-phase decomposition: work is partitioned by (source, bin), so
    # a dominant source spreads over its value bins instead of one task.
    kept = (
        with_global_running(
            kept,
            value_col="n_chars",
            tiebreak_cols=["doc_id"],
            descending=True,
            rank_col="__dom_rk",
            group_cols=("source",),
            materialize=True,
        )
        .filter(F.col("__dom_rk") <= DOMAIN_CAP)
        .drop("__dom_rk")
    )
    frames["after_domain_cap"] = kept

    # 5. mix quotas: deterministic per-source keep-fraction by md5 rank.
    # The rank rides the same two-phase decomposition over a NUMERIC
    # 60-bit md5 prefix (uniform → "range" bins are balanced); the
    # per-source totals are a tiny broadcast aggregate, not a
    # count-over-window.
    frac = F.when(F.col("source") == "src0", MIX_FRACTIONS["src0"])
    for src, fr in list(MIX_FRACTIONS.items())[1:]:
        frac = frac.when(F.col("source") == src, fr)
    frac = frac.otherwise(MIX_DEFAULT_FRACTION)
    hashed = kept.withColumn(
        "__h",
        F.expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT)"),
    )
    ranked = with_global_running(
        hashed,
        value_col="__h",
        tiebreak_cols=["doc_id"],
        rank_col="__rk",
        group_cols=("source",),
        bins="range",
        materialize=True,
    )
    n_src = kept.groupBy("source").agg(F.count("*").alias("__n_src"))
    kept = (
        ranked.join(F.broadcast(n_src), "source")
        .filter(
            F.col("__rk") <= F.floor(F.col("__n_src") * frac + 0.5).cast("long")
        )
        .drop("__rk", "__n_src", "__h")
    )
    frames["after_mix"] = kept

    # 6. deterministic hash split (train/val/test)
    h2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    kept = kept.withColumn(
        "split",
        F.when(h2 <= SPLIT_TRAIN_MAX, "train")
        .when(h2 <= SPLIT_VAL_MAX, "val")
        .otherwise("test"),
    )

    # 7. shard packing: exclusive cumsum within (split, source) — the
    # declared q_pack_shards block-parallel shape (shards never span
    # blocks; each block's window is independent)
    from pyspark.sql import Window as W

    from .functions.text import tokens as tok

    sized = kept.withColumn("n_tokens", F.size(tok("text")))
    cum = (
        F.sum("n_tokens").over(
            W.partitionBy("split", "source")
            .orderBy("doc_id")
            .rowsBetween(W.unboundedPreceding, 0)
        )
        - F.col("n_tokens")
    )
    frames["packed"] = sized.withColumn(
        "shard", F.floor(cum / float(SHARD_TOKEN_BUDGET)).cast("long")
    )
    return frames


def run_curate(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    overwrite: bool = False,
) -> dict:
    """Drive the lazily-built curation DAG (``curate_frame``): count the
    funnel after each gate, write the packed corpus partitioned by split,
    and return the stats a data-ops review actually reads."""
    from .sources.io import make_save_mode

    frames = curate_frame(spark, input_dir)
    stats: dict = {"input_docs": frames["input"].count()}
    for key in (
        "after_quality",
        "after_exact_dedup",
        "after_decontamination",
        "after_domain_cap",
        "after_mix",
    ):
        stats[key] = frames[key].count()

    # write, partitioned by split (training readers prune their split);
    # rows ordered by (source, shard) so shard files are contiguous
    (
        frames["packed"]
        .drop("fp")
        .sortWithinPartitions("source", "shard", "doc_id")
        .write.mode(make_save_mode(overwrite))
        .partitionBy("split")
        .parquet(output_dir)
    )
    out = spark.read.parquet(output_dir)
    stats["written"] = out.count()
    stats["splits"] = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    stats["output"] = output_dir
    # release the decomposition's tracked persists (ADVICE r4 leak fix)
    from .operators._cache import release_tracked

    release_tracked()
    return stats


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(prog="spark_ml_pipelines_example_spark.pipeline")
    sub = ap.add_subparsers(dest="job", required=True)
    dd = sub.add_parser("dedup", help="near-dup removal: pairs → clusters → canonical")
    dd.add_argument("--input", required=True, help="fixture dir with documents.parquet")
    dd.add_argument("--output", required=True)
    dd.add_argument("--method", choices=["jaccard", "minhash", "exact"], default="jaccard")
    dd.add_argument("--overwrite", action="store_true")
    cu = sub.add_parser(
        "curate", help="quality → dedup → decontam → mix → split → pack → write"
    )
    cu.add_argument("--input", required=True, help="fixture dir with documents.parquet")
    cu.add_argument("--output", required=True)
    cu.add_argument("--overwrite", action="store_true")
    args = ap.parse_args(argv)

    from .plans.session import get_spark

    spark = get_spark(app_name=f"pipeline-{args.job}")
    if args.job == "dedup":
        stats = run_dedup(spark, args.input, args.output, args.method, args.overwrite)
        print(stats)
    elif args.job == "curate":
        stats = run_curate(spark, args.input, args.output, args.overwrite)
        print(stats)


if __name__ == "__main__":
    main()
