"""Hardening tests for the near-dup blocking schemes (r1 scale concerns):
64-bit SimHash banding recall and the bigram-Jaccard shingle DF cap."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_ml_pipelines_example_spark.queries.dedup import (
    JACCARD_DF_CAP,
    ngram_jaccard_pairs,
    simhash_signatures,
)
from spark_ml_pipelines_example_spark.queries.registry import load_all

REG = load_all()


def test_simhash_banding_exact_recall(spark, sf_dir):
    """Pigeonhole guarantee: 4 bands of 16 bits recover EVERY pair at
    Hamming distance ≤ 3 — the banded join must equal brute force."""
    from spark_ml_pipelines_example_spark.sources.io import load_table

    sig = simhash_signatures(load_table(spark, sf_dir, "documents")).cache()
    a = sig.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sig_a"))
    b = sig.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sig_b"))
    brute = (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .filter(F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))) <= 3)
        .select("doc_a", "doc_b")
    )
    banded = REG["q_dedup_simhash"].fn(spark, sf_dir).select("doc_a", "doc_b")
    n_brute = brute.count()
    missed = brute.exceptAll(banded).count()
    extra = banded.exceptAll(brute).count()
    assert missed == 0, f"banding missed {missed} of {n_brute} true pairs"
    assert extra == 0, f"banding produced {extra} pairs beyond Hamming<=3"
    assert n_brute > 0, "fixture should contain at least one near-dup pair"
    sig.unpersist()


def test_simhash_pairs_exact_duplicates(spark, sf_dir):
    """Identical token multisets hash to identical signatures (Hamming 0),
    so every exact-dup pair must survive the banded join + threshold."""
    from spark_ml_pipelines_example_spark.sources.io import load_table

    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("text"))  # raw text equality — strictly implies token equality
    dup_pairs = (
        d.select("doc_id", h.alias("h"))
        .alias("a")
        .join(d.select("doc_id", h.alias("h")).alias("b"), "h")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    )
    found = REG["q_dedup_simhash"].fn(spark, sf_dir).select("doc_a", "doc_b")
    missed = dup_pairs.exceptAll(found).count()
    assert missed == 0, f"simhash missed {missed} exact-duplicate pairs"


def test_embedding_cell_block_recall(spark, sf_dir):
    """Blocking recall of the IVF-cell-blocked near-dup variant, measured
    in the query's OWN measure (quantized cosine ≥ 0.4, the audited
    comparator): ground truth = brute-force quantized pairwise with no
    blocking. Recall isolates what soft-cell assignment is responsible
    for — a pair the cells variant may legitimately exclude on the
    quantized-vs-raw threshold boundary (|raw cos − 0.4| inside the
    quantization band) must not count against blocking. The raw-cosine
    twin q_dedup_embedding keeps its own oracle; here we additionally pin
    that every raw-vs-quantized verdict disagreement sits inside that
    boundary band."""
    import math

    import numpy as np

    from spark_ml_pipelines_example_spark.operators.similarity import (
        _EMB_TAU_DEN,
        _EMB_TAU_NUM,
    )
    from spark_ml_pipelines_example_spark.queries.ml import _kmx_quantized

    rows = _kmx_quantized(spark, sf_dir).collect()  # test-SF corpora are driver-sized
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    X = np.array([r.xq for r in rows], dtype=np.int64)
    dot = X @ X.T
    n2 = (X * X).sum(axis=1)
    ia, ib = np.triu_indices(len(ids), k=1)
    d = dot[ia, ib]
    keep = (d > 0) & (_EMB_TAU_DEN * d * d >= _EMB_TAU_NUM * n2[ia] * n2[ib])
    truth = {
        (int(min(a, b)), int(max(a, b)))
        for a, b in zip(ids[ia[keep]], ids[ib[keep]])
    }
    cc = {
        (r.id_a, r.id_b)
        for r in REG["q_dedup_embedding_cells"].fn(spark, sf_dir).collect()
    }
    assert truth, "fixture should contain at least one quantized near-dup pair"
    assert cc <= truth, "cells variant emitted a pair brute force rejects"
    recall = len(cc & truth) / len(truth)
    assert recall >= 0.95, f"cell-blocked recall {len(cc & truth)}/{len(truth)} < 0.95"

    # raw-threshold twin: any verdict disagreement must be a boundary case
    # (quantization error band: 64-dim, 1/1024 per component → ~1% of cos)
    gt_raw = {
        (r.id_a, r.id_b): r.cos_sim
        for r in REG["q_dedup_embedding"].fn(spark, sf_dir).collect()
    }
    for pair, raw_cos in gt_raw.items():
        if pair not in truth:
            assert math.isclose(raw_cos, 0.4, abs_tol=0.01), (
                f"{pair}: raw cos {raw_cos} excluded by the quantized test "
                "but not a threshold-boundary case"
            )


def test_jaccard_df_cap_prunes_hot_shingles(spark):
    """A shingle present in every doc of a 300-doc corpus (> JACCARD_DF_CAP)
    must be dropped from the measure: with the cap the all-pairs explosion
    through that key disappears."""
    assert JACCARD_DF_CAP < 300
    rows = [
        (i, "en", "web", f"zz zz u{i} v{i} w{i}") for i in range(300)
    ]
    d = spark.createDataFrame(rows, ["doc_id", "lang", "source", "text"])
    uncapped = ngram_jaccard_pairs(d, df_cap=1 << 40, threshold=0.01).count()
    capped = ngram_jaccard_pairs(d, threshold=0.01).count()
    # uncapped: every pair shares the hot "zz zz" shingle → C(300,2) pairs
    assert uncapped == 300 * 299 // 2
    assert capped == 0


def test_paragraph_dedup_first_occurrence_wins(spark):
    """Corpus-wide first occurrence (min doc_id, then pos) keeps the
    sentence; every later instance is dropped and the doc is rebuilt
    from survivors in original order."""
    rows = [
        (1, "a b. c d. e f"),          # all first occurrences → unchanged
        (2, "c d. x y"),               # "c d" already seen in doc 1
        (3, "c d. a b"),               # everything already seen → empty
        (4, "q r. q r. s t"),          # within-doc duplicate: keep first
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"]).withColumn(
        "lang", F.lit("en")
    )
    from spark_ml_pipelines_example_spark.queries import _util
    from spark_ml_pipelines_example_spark.queries.dedup import q_dedup_paragraph

    orig = _util.load_table
    try:
        _util.load_table = lambda s, sf, name: d
        out = {r.doc_id: r for r in q_dedup_paragraph(spark, "unused").collect()}
    finally:
        _util.load_table = orig

    assert out[1].clean_text == "a b. c d. e f" and out[1].n_kept == 3
    assert out[2].clean_text == "x y" and out[2].n_kept == 1
    assert out[3].clean_text == "" and out[3].n_kept == 0
    assert out[4].clean_text == "q r. s t" and out[4].n_kept == 2
    assert all(out[i].n_paras >= out[i].n_kept for i in out)
