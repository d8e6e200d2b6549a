"""Property tests for the late-round-2 operators: chunking invariants,
winsorization bounds, domain caps, the incremental near-dup probe's
consistency with the whole-corpus pair query, and bucketed/DPP staging
correctness beyond the oracle hash (which tests/test_oracle_differential.py
already covers)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_ml_pipelines_example_spark.queries.registry import load_all

REGISTRY = load_all()

CHUNK, STRIDE = 64, 48  # mirrors queries/text.py q_text_chunk


def test_chunking_covers_every_token_once_per_window(spark, sf_dir):
    """Every document's token count must be fully covered: chunk starts at
    0, stride 48, last chunk reaches the end; total chunk tokens ==
    n_tokens + overlap·(n_chunks-1) except the final partial chunk."""
    ch = REGISTRY["q_text_chunk"].fn(spark, sf_dir).cache()
    try:
        per_doc = ch.groupBy("doc_id", "n_tokens").agg(
            F.count("*").alias("n_chunks"),
            F.sum("chunk_tokens").alias("tok_total"),
            F.max("chunk_id").alias("max_chunk"),
        )
        # chunk ids are dense 0..n-1
        assert per_doc.filter(F.col("max_chunk") != F.col("n_chunks") - 1).count() == 0
        # coverage: last chunk ends at n_tokens ⇒ sum of chunk sizes equals
        # n_tokens + (n_chunks-1)*overlap  - deficit where the final chunk
        # is partial; equivalently every start < n_tokens and
        # start + chunk_tokens reaches min(start+CHUNK, n_tokens)
        bad = ch.filter(
            (F.col("chunk_id") * STRIDE >= F.col("n_tokens"))
            | (
                F.col("chunk_tokens")
                != F.least(
                    F.lit(CHUNK), F.col("n_tokens") - F.col("chunk_id") * STRIDE
                )
            )
        )
        assert bad.count() == 0
        # coverage lower bound: total chunk tokens ≥ n_tokens (overlap can
        # only add, never drop, tokens)
        assert per_doc.filter(F.col("tok_total") < F.col("n_tokens")).count() == 0
    finally:
        ch.unpersist()


def test_winsorize_clip_counts_bound(spark, sf_dir):
    """At most ~5% clipped on each side per group (exact percentile ⇒ the
    clipped fraction can't exceed the tail mass plus ties)."""
    w = REGISTRY["q_fn_winsorize"].fn(spark, sf_dir)
    rows = w.collect()
    assert rows
    for r in rows:
        assert r.n_clipped_lo <= 0.06 * r.n + 1, r
        assert r.n_clipped_hi <= 0.06 * r.n + 1, r
        assert r.winsorized_sum > 0


def test_domain_cap_never_exceeded(spark, sf_dir):
    from spark_ml_pipelines_example_spark.queries.curation import DOMAIN_CAP

    d = REGISTRY["q_text_domain_cap"].fn(spark, sf_dir)
    assert d.filter(F.col("n_kept") > DOMAIN_CAP).count() == 0
    assert d.count() > 0


def test_incremental_neardup_agrees_with_corpus_pairs(spark, sf_dir):
    """Every (batch_doc, best_match_doc) the probe reports must appear in
    the whole-corpus bigram-Jaccard pair query's result restricted to
    cross-partition pairs (same shingle blocks, same DF-cap discipline,
    modulo the cap being computed corpus-side only in the probe) — the
    probe may differ on pairs whose shingles straddle the cap sets, so we
    check containment of exact-match (jaccard=1.0) pairs, which no cap
    choice can disturb for identical docs with rare shingles."""
    from spark_ml_pipelines_example_spark.queries.ingest import (
        INCREMENT_MOD,
        INCREMENT_REMAINDER,
    )

    probe = REGISTRY["q_dedup_incremental_neardup"].fn(spark, sf_dir)
    # the verdict table covers every batch doc exactly once
    assert probe.groupBy("batch_doc").count().filter("count > 1").count() == 0
    exact = probe.filter(F.col("best_jaccard") >= 0.999999).select(
        "batch_doc", "best_match_doc"
    )
    pairs = REGISTRY["q_dedup_ngram_jaccard"].fn(spark, sf_dir)
    cross = pairs.filter(F.col("jaccard") >= 0.999999).select(
        F.least("doc_a", "doc_b").alias("x"), F.greatest("doc_a", "doc_b").alias("y")
    )
    ex = exact.select(
        F.least("batch_doc", "best_match_doc").alias("x"),
        F.greatest("batch_doc", "best_match_doc").alias("y"),
    )
    missing = ex.join(cross, ["x", "y"], "left_anti").count()
    assert missing == 0
    # sanity: the batch predicate really partitions the corpus
    assert (
        probe.filter(
            F.col("batch_doc") % INCREMENT_MOD != INCREMENT_REMAINDER
        ).count()
        == 0
    )


def test_variant_extraction_matches_from_json(spark, sf_dir):
    """try_variant_get must agree with the schema'd from_json path on
    every event (the two extraction APIs can't diverge on valid input)."""
    from spark_ml_pipelines_example_spark.queries._util import t

    ev = t(spark, sf_dir, "events")
    both = ev.select(
        F.from_json("props", "k INT").getField("k").alias("a"),
        F.try_variant_get(F.parse_json("props"), "$.k", "int").alias("b"),
    )
    assert both.filter(~F.col("a").eqNullSafe(F.col("b"))).count() == 0


def test_arrow_decode_equals_pandas_decode(spark, sf_dir):
    """mapInArrow and mapInPandas decode paths must produce identical
    rows — same stub decoder, two batch-transport APIs."""
    from spark_ml_pipelines_example_spark.operators.multimodal import (
        attach_payload,
        decode_features,
        decode_features_arrow,
    )
    from spark_ml_pipelines_example_spark.queries._util import t

    docs = t(spark, sf_dir, "documents")
    wp = attach_payload(docs)
    a = decode_features(wp).orderBy("doc_id").collect()
    b = decode_features_arrow(wp).orderBy("doc_id").collect()
    assert len(a) == len(b) > 0
    assert a == b


def test_gaps_islands_equals_native_session_window(spark, sf_dir):
    """The pure-window sessionization and native session_window must
    produce identical session rows — two formulations, one semantics."""
    a = REGISTRY["q_win_gaps_islands"].fn(spark, sf_dir)
    b = REGISTRY["q_stream_session"].fn(spark, sf_dir)
    cols = sorted(a.columns)
    assert cols == sorted(b.columns)
    assert a.select(cols).exceptAll(b.select(cols)).count() == 0
    assert b.select(cols).exceptAll(a.select(cols)).count() == 0
