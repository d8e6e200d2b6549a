"""Property-based tests (hypothesis) for the custom operators whose
correctness doesn't reduce to a DuckDB oracle: the as-of join idiom, the
cosine kernels, and the salting helpers. Examples are kept small and few —
each example is a Spark round-trip."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from spark_ml_pipelines_example_spark.functions.similarity import (
    cosine,
    cosine_prenorm,
    cosine_probe,
    l2_norm,
)
from spark_ml_pipelines_example_spark.operators.asof import asof_join
from spark_ml_pipelines_example_spark.sources import layout

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _ref_asof(probes, refs):
    """Driver-side reference semantics: latest ref payload with
    ref.ts <= probe.ts on the same key; max payload breaks ts ties."""
    out = {}
    for key, pts, pid in probes:
        best = None
        for rkey, rts, payload in refs:
            if rkey == key and rts <= pts:
                rank = (rts, payload)
                if best is None or rank >= best:
                    best = rank
        out[pid] = None if best is None else best[1]
    return out


@_SETTINGS
@given(
    toks=st.lists(st.sampled_from(["a", "b", "cc", "dd"]), max_size=12),
    n=st.integers(2, 8),
)
def test_ngrams_window_properties(spark, toks, n):
    """ngrams yields exactly max(0, len-n+1) shingles of n tokens each, in
    order — and never the bogus short shingles Spark's descending
    sequence(1, 0) would produce below n tokens."""
    from spark_ml_pipelines_example_spark.functions.text import ngrams

    df = spark.createDataFrame([(toks,)], "toks array<string>")
    [row] = df.select(ngrams(F.col("toks"), n).alias("g")).collect()
    want = [" ".join(toks[i : i + n]) for i in range(max(0, len(toks) - n + 1))]
    assert row.g == want


@_SETTINGS
@given(
    probes=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=12
    ),
    refs=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(0, 99)),
        max_size=12,
    ),
)
def test_asof_join_matches_reference_semantics(spark, probes, refs):
    probe_rows = [(k, ts, i) for i, (k, ts) in enumerate(probes)]
    pdf = spark.createDataFrame(probe_rows, "k long, ts long, pid long")
    rdf = spark.createDataFrame(refs or [(99, 0, 0)], "k long, ts long, payload long")
    got = {
        r.pid: r.asof_value
        for r in asof_join(pdf, rdf, on="k", ts="ts", payload="payload").collect()
    }
    want = _ref_asof(probe_rows, refs or [(99, 0, 0)])
    assert got == want


@_SETTINGS
@given(
    vecs=st.lists(
        st.lists(
            st.floats(0.0078125, 10, width=32) | st.floats(-10, -0.0078125, width=32),
            min_size=4,
            max_size=4,
        ),
        min_size=2,
        max_size=6,
    )
)
def test_cosine_kernel_properties(spark, vecs):
    """|cos| ≤ 1 (+ulp), cos(v,v) = 1, and the three kernel forms agree."""
    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "id long, v array<float>")
    probe = vecs[0]
    out = df.select(
        "id",
        cosine(F.col("v"), F.col("v")).alias("self_cos"),
        cosine_probe(F.col("v"), probe).alias("probe_cos"),
        (
            cosine_prenorm(
                F.col("v"),
                F.array(*[F.lit(float(x)) for x in probe]),
                l2_norm(F.col("v")),
                F.lit(math.sqrt(math.fsum(float(x) * float(x) for x in probe))),
            )
        ).alias("prenorm_cos"),
    ).collect()
    for r in out:
        assert r.self_cos == pytest.approx(1.0, abs=1e-9)
        assert abs(r.probe_cos) <= 1.0 + 1e-9
        assert r.prenorm_cos == pytest.approx(r.probe_cos, abs=1e-6)


@_SETTINGS
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(-1000, 1000)), min_size=1, max_size=30
    ),
    n_salts=st.integers(2, 8),
)
def test_salted_groupby_invariant_to_salt_count(spark, rows, n_salts):
    df = spark.createDataFrame(rows, "k long, x long")
    plain = {
        (r.k): (r.n, r.s)
        for r in df.groupBy("k").agg(F.count("*").alias("n"), F.sum("x").alias("s")).collect()
    }
    salted = {
        (r.k): (r.n, r.s)
        for r in layout.salted_groupby_agg(
            df, ["k"], {"n": (F.count("*"), F.sum), "s": (F.sum("x"), F.sum)}, n_salts
        ).collect()
    }
    assert salted == plain


@given(
    counts=st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=30),
    k=st.integers(min_value=1, max_value=6),
    m=st.integers(min_value=2, max_value=8),
    parts=st.integers(min_value=1, max_value=6),
)
@_SETTINGS
def test_heavy_hitters_always_exact(spark, counts, k, m, parts):
    """exact_topk_frequency returns the true top-k (deterministic
    tie-break by key) for ANY multiset, any counter budget m, any
    partitioning — certified or fallback, the output never differs from
    the plain exact groupBy."""
    from spark_ml_pipelines_example_spark.operators.heavyhitters import (
        exact_topk_frequency,
    )

    rows = [(f"k{i:03d}",) for i, c in enumerate(counts) for _ in range(c)]
    df = spark.createDataFrame(rows, "key string").repartition(parts)
    top, info = exact_topk_frequency(df, ["key"], k=k, m=m)
    got = [(r["key"], r["cnt"]) for r in top.collect()]
    want = sorted(
        ((f"k{i:03d}", c) for i, c in enumerate(counts)),
        key=lambda kv: (-kv[1], kv[0]),
    )[:k]
    assert got == want
    assert info["n_rows"] == len(rows)
    total = len(rows)
    shares = [r["share"] for r in top.collect()]
    assert shares == [c / total for (_, c) in want]
