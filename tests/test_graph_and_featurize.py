"""Semantic property tests for the round-2 additions: PageRank, bigram
LM, feature hashing, quantile discretizer (the oracle differential in
test_oracle_differential.py covers value equality; these pin the
invariants a hash match alone can't express)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_ml_pipelines_example_spark.queries.registry import load_all

REGISTRY = load_all()


def test_pagerank_is_a_distribution(spark, sf_dir):
    rows = REGISTRY["q_graph_pagerank"].fn(spark, sf_dir).collect()
    total = sum(r["pr"] for r in rows)
    assert abs(total - 1.0) < 1e-3, f"rank mass {total} != 1"
    assert all(r["pr"] > 0 for r in rows)
    ranks = sorted(r["rk"] for r in rows)
    assert ranks == list(range(1, len(rows) + 1)), "rank column not a permutation"


def test_feature_hashing_preserves_token_mass(spark, sf_dir):
    from spark_ml_pipelines_example_spark.queries.ml import FH_BUCKETS, FH_DOC_MOD

    fh = REGISTRY["q_ml_feature_hashing"].fn(spark, sf_dir)
    assert fh.filter(
        (F.col("bucket") < 0) | (F.col("bucket") >= FH_BUCKETS)
    ).count() == 0
    # Σ bucket counts per doc == the doc's token count (nothing dropped)
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") % FH_DOC_MOD == 0
    )
    expect = {
        r["doc_id"]: r["n"]
        for r in d.select(
            "doc_id", F.size(F.split("text", " ")).alias("n")
        ).collect()
    }
    got = {
        r["doc_id"]: r["s"]
        for r in fh.groupBy("doc_id").agg(F.sum("cnt").alias("s")).collect()
    }
    assert got == expect


def test_quantile_discretizer_buckets_are_quartiles(spark, sf_dir):
    rows = {
        r["bucket"]: r
        for r in REGISTRY["q_ml_quantile_discretizer"].fn(spark, sf_dir).collect()
    }
    assert set(rows) == {0, 1, 2, 3}
    counts = [rows[b]["n"] for b in range(4)]
    total = sum(counts)
    for c in counts:  # exact quartile bounds → balanced buckets (±2%)
        assert abs(c - total / 4) <= max(2, 0.02 * total), counts
    # bucket ranges must tile: hi of bucket k <= lo of bucket k+1
    for k in range(3):
        assert rows[k]["hi"] <= rows[k + 1]["lo"]


def test_bigram_lm_flags_a_tail(spark, sf_dir):
    df = REGISTRY["q_text_bigram_lm"].fn(spark, sf_dir)
    n = df.count()
    n_flagged = df.filter("flagged").count()
    assert 0 < n_flagged < n / 2, f"{n_flagged}/{n} flagged — threshold dead or trivial"
