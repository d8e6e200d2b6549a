"""Operator-specific properties for the curation family (the differential
harness covers Spark-vs-DuckDB equality; these pin semantics)."""

from __future__ import annotations

import re

from spark_ml_pipelines_example_spark.queries import curation
from spark_ml_pipelines_example_spark.queries.registry import load_all
from spark_ml_pipelines_example_spark.sources.io import load_table

REGISTRY = load_all()


def test_pii_scrub_redacts_everything(spark, sf_dir):
    rows = REGISTRY["q_text_pii_scrub"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_email"] >= 1 and r["n_phone"] >= 1 and r["n_ip"] >= 1
        for pat in (curation._EMAIL_RE, curation._PHONE_RE, curation._IP_RE):
            assert not re.search(pat, r["scrubbed"]), (pat, r["scrubbed"])
        assert "<EMAIL>" in r["scrubbed"] and "<PHONE>" in r["scrubbed"]


def test_filter_cascade_first_fail_semantics(spark, sf_dir):
    rows = REGISTRY["q_text_filter_cascade"].fn(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    allowed = {"too_short", "stopword_low", "stopword_high", "repetitive", "keep"}
    seen = {r["verdict"] for r in rows}
    assert seen <= allowed
    assert "keep" in seen and "too_short" in seen
    for r in rows:
        # first-fail: a too_short verdict wins regardless of other signals
        if r["n_tokens"] < curation.MIN_TOKENS:
            assert r["verdict"] == "too_short"
        elif r["verdict"] == "keep":
            assert curation.STOPWORD_MIN <= r["stopword_frac"] <= curation.STOPWORD_MAX
            assert r["distinct_frac"] >= curation.DISTINCT_FRAC_MIN


def test_shuffle_global_is_a_permutation(spark, sf_dir):
    rows = REGISTRY["q_shuffle_global"].fn(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    id_total = docs.groupBy().sum("doc_id").collect()[0][0]
    assert sum(r["n"] for r in rows) == n_docs
    assert sum(r["id_sum"] for r in rows) == id_total
    buckets = sorted(r["bucket"] for r in rows)
    assert buckets == list(range(len(rows)))  # contiguous, no gap/dup
    # every bucket except the last is exactly full
    full = [r for r in rows if r["bucket"] < len(rows) - 1]
    assert all(r["n"] == curation.SHUFFLE_BUCKET for r in full)


def test_unigram_logprob_scores(spark, sf_dir):
    rows = REGISTRY["q_text_unigram_logprob"].fn(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    for r in rows:
        assert r["avg_logprob"] < 0.0  # log of probabilities < 1
        assert r["flagged"] == (r["avg_logprob"] < curation.SURPRISAL_FLAG)
