"""Semantic invariants for the sweep-line concurrency, penny-exact
proration, skyline, and duplicated-span operators — properties the
DuckDB hash comparison can't express (conservation, dominance,
brute-force agreement)."""

from __future__ import annotations

from collections import Counter, defaultdict

import duckdb

from spark_ml_pipelines_example_spark.queries.registry import load_all

REGISTRY = load_all()


def test_proration_conserves_order_totals(spark, sf_dir):
    """Largest-remainder allocation must conserve money exactly: the
    allocated cents summed over all return flags equal the cent-exact
    sum of o_totalprice over orders that have at least one lineitem."""
    out = REGISTRY["q_agg_proration"].fn(spark, sf_dir).collect()
    total_alloc = sum(r["alloc_cents"] for r in out)
    expected = duckdb.sql(
        f"""
        SELECT CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT)
        FROM read_parquet('{sf_dir}/orders.parquet')
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM read_parquet('{sf_dir}/lineitem.parquet'))
        """
    ).fetchone()[0]
    assert total_alloc == expected, (total_alloc, expected)
    for r in out:
        assert 0 <= r["n_bumped"] <= r["n_lines"]


def test_skyline_dominance_is_exact(spark, sf_dir):
    """Nothing inside the skyline dominates anything else inside it, and
    everything outside it is dominated by at least one aggregate row —
    checked against the O(n²) brute force at sf0.001."""
    sky = {
        r["l_partkey"]: (r["qty"], r["rev_cents"])
        for r in REGISTRY["q_agg_skyline"].fn(spark, sf_dir).collect()
    }
    allrows = duckdb.sql(
        f"""
        SELECT l_partkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,0))) AS BIGINT) AS qty,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
                    * 100 AS BIGINT) AS rev
        FROM read_parquet('{sf_dir}/lineitem.parquet') GROUP BY 1
        """
    ).fetchall()
    pts = {k: (q, r) for k, q, r in allrows}
    assert set(sky) <= set(pts)
    for k, (q, r) in sky.items():
        assert (q, r) == pts[k]

    def dominates(a, b):
        return a[0] >= b[0] and a[1] >= b[1] and a != b

    members = list(sky.values())
    for a in members:
        assert not any(dominates(b, a) for b in members if b != a)
    for k, p in pts.items():
        if k not in sky:
            assert any(dominates(s, p) for s in pts.values()), (k, p)


def test_concurrency_matches_brute_force(spark, sf_dir):
    """Sweep-line peak must equal the brute-force 'count open intervals
    at every boundary instant' answer, per event_type."""
    out = {
        r["event_type"]: (r["peak"], r["peak_at_us"])
        for r in REGISTRY["q_win_concurrency"].fn(spark, sf_dir).collect()
    }
    ev = duckdb.sql(
        f"""
        SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us
        FROM read_parquet('{sf_dir}/events.parquet')
        """
    ).fetchall()
    DUR = 15 * 60 * 1_000_000
    by_type = defaultdict(list)
    for et, us in ev:
        by_type[et].append(us)
    for et, starts in by_type.items():
        deltas = Counter()
        for s in starts:
            deltas[s] += 1
            deltas[s + DUR] -= 1
        running, peak, peak_at = 0, 0, None
        for at in sorted(deltas):
            running += deltas[at]
            if running > peak:
                peak, peak_at = running, at
        assert out[et] == (peak, peak_at), (et, out[et], (peak, peak_at))


def test_substring_spans_brute_force(spark, sf_dir):
    """Per-document duplicated-span counts must match a pure-Python
    recomputation of the 8-token window index."""
    out = {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"])
        for r in REGISTRY["q_dedup_substring_spans"].fn(spark, sf_dir).collect()
    }
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    span_docs = defaultdict(set)
    spans_by_doc = {}
    for doc_id, text in docs:
        toks = text.split(" ")
        spans = [" ".join(toks[i : i + 8]) for i in range(len(toks) - 7)]
        if spans:
            spans_by_doc[doc_id] = spans
            for g in set(spans):
                span_docs[g].add(doc_id)
    assert set(out) == set(spans_by_doc)
    for doc_id, spans in spans_by_doc.items():
        n_dup = sum(1 for g in spans if len(span_docs[g]) >= 2)
        assert out[doc_id] == (len(spans), n_dup), doc_id
