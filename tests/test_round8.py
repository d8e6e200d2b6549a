"""Round-8 regression pins: the ADVICE r7 fixes (null-keyed heavy
hitters must survive the certified recount; counters stay int64), the
as-of union-spine refactor's parity (full parity suites live in
test_round6/test_round7 — here only a smoke check that the shared
helper path produces identical output to the pinned fixtures), and the
round-8 additions (asof_join_nearest_bucketed parity, BM25 / novelty /
keyness / NDCG oracle checks)."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _exact_topk(df, keys, k):
    return (
        df.groupBy(*keys)
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), *keys)
        .limit(k)
        .collect()
    )


def test_heavy_hitters_null_key_survives_certified_path(spark):
    """ADVICE r7 (medium): a NULL-keyed group nominated by the sketch
    must appear in the certified top-k — the confirm semi-join is
    null-safe now, so the certified path and the fallback groupBy agree
    on nullable key columns."""
    from spark_ml_pipelines_example_spark.operators.heavyhitters import (
        exact_topk_frequency,
    )

    rows = [(None,)] * 3000  # NULL is the single heaviest key
    for i in range(1, 300):
        rows.extend((f"k{i:04d}",) for _ in range(max(1, 4000 // i)))
    df = spark.createDataFrame(rows, "key string").repartition(8)

    top, info = exact_topk_frequency(df, ["key"], k=4, m=32)
    got = [(r["key"], r["cnt"]) for r in top.collect()]
    want = [(r["key"], r["cnt"]) for r in _exact_topk(df, ["key"], 4)]
    assert got == want
    assert info["certified"] is True  # the cheap path ran — and kept NULL
    assert got[1] == (None, 3000)  # k0001 has 4000; NULL is rank 2 exact


def test_heavy_hitters_null_key_multi_column(spark):
    """Partial-NULL composite keys: eqNullSafe must hold per column, so
    (NULL, 'x') and ('a', NULL) are distinct groups and both recount
    exactly under the certified path."""
    from spark_ml_pipelines_example_spark.operators.heavyhitters import (
        exact_topk_frequency,
    )

    rows = (
        [(None, "x")] * 900
        + [("a", None)] * 700
        + [("a", "x")] * 500
        + [(f"t{i}", "y") for i in range(200)]
    )
    df = spark.createDataFrame(rows, "k1 string, k2 string").repartition(6)
    top, info = exact_topk_frequency(df, ["k1", "k2"], k=3, m=16)
    got = [((r["k1"], r["k2"]), r["cnt"]) for r in top.collect()]
    assert got == [((None, "x"), 900), (("a", None), 700), (("a", "x"), 500)]
    assert info["certified"] is True


def test_heavy_hitters_counters_stay_int64_across_batches(spark):
    """ADVICE r7 (low): Series.add(fill_value=0) promotes to float64 on
    misaligned indexes; the summarizer must cast back so multi-batch
    counts stay exact integers. Force multiple Arrow batches with
    disjoint-then-overlapping key sets and check exact counts."""
    from spark_ml_pipelines_example_spark.operators.heavyhitters import (
        exact_topk_frequency,
    )

    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "500")
    try:
        rows = [(f"a{i % 40:03d}",) for i in range(1500)]
        rows += [(f"b{i % 37:03d}",) for i in range(1500)]  # new index keys
        df = spark.createDataFrame(rows, "key string").coalesce(1)
        top, info = exact_topk_frequency(df, ["key"], k=5, m=2048)
        got = [(r["key"], r["cnt"]) for r in top.collect()]
        want = [(r["key"], r["cnt"]) for r in _exact_topk(df, ["key"], 5)]
        assert got == want
        assert all(isinstance(c, int) for _, c in got)
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")


def test_asof_union_spine_refactor_parity_smoke(spark):
    """The six as-of entry points now share _union_spine/_spine_order;
    pin one hand-computed fixture through three of them (backward top-1,
    forward with tolerance, k-nearest) so a helper regression cannot
    pass silently. Full randomized parity lives in test_round6/7."""
    from spark_ml_pipelines_example_spark.operators.asof import (
        asof_join,
        asof_join_gap,
        asof_join_topk,
    )

    probes = spark.createDataFrame(
        [("k", "2024-01-01 10:00:00", 1), ("k", "2024-01-01 12:00:00", 2)],
        "key string, ts string, pid int",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    refs = spark.createDataFrame(
        [
            ("k", "2024-01-01 09:00:00", 100.0),
            ("k", "2024-01-01 11:30:00", 200.0),
            ("k", "2024-01-01 13:00:00", 300.0),
        ],
        "key string, ts string, px double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    back = {
        r["pid"]: r["asof_value"]
        for r in asof_join(probes, refs, "key", "ts", "px").collect()
    }
    assert back == {1: 100.0, 2: 200.0}

    fwd = {
        r["pid"]: r["asof_value"]
        for r in asof_join_gap(
            probes, refs, "key", "ts", "px",
            direction="forward", tolerance_expr="INTERVAL 75 MINUTES",
        ).collect()
    }
    # pid=1 forward match is 11:30 (90 min away) -> outside the 75-min
    # tolerance; pid=2 matches 13:00 (60 min away) inside it
    assert fwd == {1: None, 2: 300.0}

    refs_id = refs.withColumn("rid", F.col("px").cast("int"))
    topk = asof_join_topk(probes, refs_id, "key", "ts", "rid", k=2)
    got = sorted(
        (r["pid"], r["asof_rank"], r["__ref_id"]) for r in topk.collect()
    )
    assert got == [(1, 1, 100), (2, 1, 200), (2, 2, 100)]


# ---------------------------------------------------------------------------
# round-8 batch 1: asof_join_nearest_bucketed (completes the as-of matrix)


def _asof_corpus(spark, seed, n_keys=3, n_probes=120, n_refs=150):
    """Randomized probe/ref frames with timestamp collisions and a hot
    key (key 0 holds ~half the rows) — same generator as test_round7's
    (ties and cross-bucket gaps both exercised), duplicated here so the
    two files stay independently runnable."""
    import datetime
    import random

    rng = random.Random(seed)

    def key():
        return 0 if rng.random() < 0.5 else rng.randrange(n_keys)

    def ts():
        s = rng.randrange(0, 40 * 3600, 300)
        us = rng.choice([0, 0, 500_000])
        return datetime.datetime(2024, 1, 1) + datetime.timedelta(
            seconds=s, microseconds=us
        )

    probes = spark.createDataFrame(
        [(key(), ts(), i) for i in range(n_probes)],
        "k long, ts timestamp_ntz, probe_id long",
    )
    refs = spark.createDataFrame(
        [(key(), ts(), 1000 + i) for i in range(n_refs)],
        "k long, ts timestamp_ntz, ref_id long",
    )
    return probes, refs


@pytest.mark.parametrize("tolerance", [None, "INTERVAL 30 MINUTES"])
def test_asof_nearest_bucketed_parity(spark, tolerance):
    """Property: asof_join_nearest_bucketed ≡ asof_join_nearest on
    randomized hot-key corpora, with and without tolerance, at a bucket
    width (1h) small enough that many winners cross bucket boundaries
    in BOTH directions."""
    from spark_ml_pipelines_example_spark.operators.asof import (
        asof_join_nearest,
        asof_join_nearest_bucketed,
    )

    seed = 81 + (0 if tolerance is None else 7)
    probes, refs = _asof_corpus(spark, seed=seed)
    kw = dict(on="k", ts="ts", payload="ref_id", alias="m",
              tolerance_expr=tolerance)
    want = {
        r["probe_id"]: r["m"]
        for r in asof_join_nearest(probes, refs, **kw).collect()
    }
    got = {
        r["probe_id"]: r["m"]
        for r in asof_join_nearest_bucketed(
            probes, refs, bucket_width_us=3_600_000_000, **kw
        ).collect()
    }
    assert got == want
    assert any(v is not None for v in want.values())


def test_asof_nearest_bucketed_cross_bucket_both_directions(spark):
    """Hand fixture on ONE hot key: a probe whose nearest ref sits many
    buckets EARLIER (backward carry chain), one whose nearest sits
    buckets LATER (forward carry chain), an equal-gap probe resolving
    backward (pandas rule), and a same-ts payload tie resolving to the
    larger payload."""
    import datetime

    from spark_ml_pipelines_example_spark.operators.asof import (
        asof_join_nearest_bucketed,
    )

    base = datetime.datetime(2024, 1, 1)

    def at(h):
        return base + datetime.timedelta(hours=h)

    probes = spark.createDataFrame(
        [
            (7, at(25.0), 1),   # nearest = ref at hour 0.2 (24.8h back, carry)
            (7, at(30.0), 2),   # nearest = ref at hour 50.0 (20h fwd, carry)
            (7, at(25.1), 3),   # equal .1h gaps would need symmetric refs; here 24.9 back vs 24.9 fwd -> backward
            (7, at(0.2), 4),    # exact-ts tie: two refs at 0.2 -> larger payload
        ],
        "k long, ts timestamp_ntz, probe_id long",
    )
    refs = spark.createDataFrame(
        [(7, at(0.2), 100), (7, at(0.2), 101), (7, at(50.0), 200)],
        "k long, ts timestamp_ntz, ref_id long",
    )
    out = {
        r["probe_id"]: r["m"]
        for r in asof_join_nearest_bucketed(
            probes, refs, on="k", ts="ts", payload="ref_id", alias="m",
            bucket_width_us=3_600_000_000,
        ).collect()
    }
    # probe 3: gap back = 24.9h, gap fwd = 24.9h -> EQUAL -> backward ref
    assert out == {1: 101, 2: 200, 3: 101, 4: 101}


# ---------------------------------------------------------------------------
# round-8 batch 2: BM25 retrieval + keyness + the new query wrappers


def _hash_check(spark, duck, sf_dir, name):
    from spark_ml_pipelines_example_spark.queries.registry import REGISTRY, load_all
    from tests.conftest import compare_frames

    load_all()
    spec = REGISTRY[name]
    assert spec.oracle is not None
    compare_frames(spec.fn(spark, sf_dir), duck, spec.oracle, name)


def test_q_join_asof_nearest_bucketed_hash(spark, duck, sf_dir):
    _hash_check(spark, duck, sf_dir, "q_join_asof_nearest_bucketed")


def test_q_text_bm25_topk_hash(spark, duck, sf_dir):
    _hash_check(spark, duck, sf_dir, "q_text_bm25_topk")


def test_q_text_keyness_loglik_hash(spark, duck, sf_dir):
    _hash_check(spark, duck, sf_dir, "q_text_keyness_loglik")


def test_bm25_ranks_multi_term_docs_higher(spark, sf_dir):
    """Semantic sanity beyond the hash: every top-10 doc must contain at
    least one query term, and the #1 doc's score must reflect more
    matched query-term mass than the #10 doc's (BM25 is monotone in tf
    per term at fixed dl)."""
    from spark_ml_pipelines_example_spark.queries.registry import REGISTRY, load_all

    load_all()
    rows = REGISTRY["q_text_bm25_topk"].fn(spark, sf_dir).collect()
    assert len(rows) == 10
    assert [r["rk"] for r in rows] == list(range(1, 11))
    assert rows[0]["score"] >= rows[-1]["score"] > 0


def test_q_sim_rrf_fusion_hash(spark, duck, sf_dir):
    _hash_check(spark, duck, sf_dir, "q_sim_rrf_fusion")


def test_rrf_fusion_prefers_doubly_ranked_docs(spark, sf_dir):
    """A doc ranked by BOTH runs outscores a doc holding the same rank
    in only one run (two reciprocal terms vs one) — the property that
    makes RRF a fusion rather than a concatenation."""
    from spark_ml_pipelines_example_spark.queries.registry import REGISTRY, load_all

    load_all()
    rows = REGISTRY["q_sim_rrf_fusion"].fn(spark, sf_dir).collect()
    assert len(rows) == 10
    both = [r for r in rows if r["rb"] is not None and r["rc"] is not None]
    single = [r for r in rows if (r["rb"] is None) != (r["rc"] is None)]
    for b in both:
        worst = max(b["rb"], b["rc"])
        for s in single:
            srank = s["rb"] if s["rb"] is not None else s["rc"]
            if srank >= worst:
                assert b["rrf"] > s["rrf"], (b, s)


def test_union_spine_rejects_reserved_probe_columns(spark):
    """_union_spine must fail loud, not silently overwrite, when the
    probe frame already uses a spine-internal column name."""
    from spark_ml_pipelines_example_spark.operators.asof import asof_join

    probes = spark.createDataFrame(
        [("k", "2024-01-01 10:00:00", 1)],
        "key string, ts string, __asof_side int",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    refs = spark.createDataFrame(
        [("k", "2024-01-01 09:00:00", 1.0)], "key string, ts string, px double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    with pytest.raises(ValueError, match="reserved spine column"):
        asof_join(probes, refs, "key", "ts", "px")


def test_bm25_matches_textbook_float_formula(spark, sf_dir):
    """Independent cross-check of the integer-cleared BM25 against the
    TEXTBOOK floating-point form (k1=1.2, b=0.75, avgdl = T/N,
    idf = ln(1 + (N-df+0.5)/(df+0.5))) computed in pure Python from the
    same parquet — a different arrangement of the same rationals, so
    agreement to ~1e-5 pins the clearing algebra, not just the oracle
    (which mirrors the cleared form)."""
    import math

    import duckdb

    from spark_ml_pipelines_example_spark.queries.registry import REGISTRY, load_all
    from spark_ml_pipelines_example_spark.queries.text import (
        BM25_QUERY_TERMS,
        bm25_score_frame,
    )

    load_all()
    got = {
        r["doc_id"]: float(r["score_d"])
        for r in bm25_score_frame(spark, sf_dir, BM25_QUERY_TERMS).collect()
    }

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    k1, b = 1.2, 0.75
    toks = {d: t.split(" ") for d, t in docs}
    n = len(docs)
    total = sum(len(v) for v in toks.values())
    avgdl = total / n
    df = {
        q: sum(1 for v in toks.values() if q in v) for q in BM25_QUERY_TERMS
    }
    want = {}
    for d, v in toks.items():
        s = 0.0
        for q in BM25_QUERY_TERMS:
            tf = v.count(q)
            if tf == 0:
                continue
            idf = math.log(1 + (n - df[q] + 0.5) / (df[q] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avgdl))
        if s > 0:
            want[d] = s
    assert set(got) == set(want)
    worst = max(abs(got[d] - want[d]) for d in got)
    assert worst < 1e-4, worst  # 6dp per-term rounding x <= 4 terms


def test_keyness_matches_textbook_g2(spark, sf_dir):
    """Independent cross-check of the G² keyness against the textbook
    form 2·Σ O·ln(O/E) with expectations from the contingency marginals,
    computed in pure Python from the same parquet — pins the cell
    algebra (b/cc/d derivations and the zero-cell guard), not just the
    oracle, which mirrors the engine's spelled expression."""
    import math
    from collections import Counter

    import duckdb

    from spark_ml_pipelines_example_spark.queries.registry import REGISTRY, load_all

    load_all()
    rows = REGISTRY["q_text_keyness_loglik"].fn(spark, sf_dir).collect()
    assert rows and all(1 <= r["rk"] <= 3 for r in rows)

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT source, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    cnt = Counter()
    for src, text in docs:
        for tok in text.split(" "):
            cnt[(src, tok)] += 1
    ct = Counter(); cs = Counter(); total = 0
    for (src, tok), a in cnt.items():
        ct[tok] += a; cs[src] += a; total += a

    def g2(src, tok):
        a = cnt[(src, tok)]
        row, col = ct[tok], cs[src]
        cells = (
            (a, row * col),
            (row - a, row * (total - col)),
            (col - a, (total - row) * col),
            (total - row - col + a, (total - row) * (total - col)),
        )
        s = 0.0
        for o, e_num in cells:
            if o:
                s += o * math.log(o * total / e_num)
        return 2 * s

    for r in rows:
        want = g2(r["source"], r["tok"])
        assert abs(r["g2"] - want) < 1e-4, (r, want)


def test_union_spine_reserved_set_is_uniform(spark):
    """The fail-loud guard covers EVERY as-of variant's internals (not
    just the side/carry/bucket trio), so a probe column named after any
    stitch/winner column is rejected instead of silently dropped."""
    from spark_ml_pipelines_example_spark.operators.asof import asof_join_nearest

    probes = spark.createDataFrame(
        [("k", "2024-01-01 10:00:00", 1)],
        "key string, ts string, __b int",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    refs = spark.createDataFrame(
        [("k", "2024-01-01 09:00:00", 1.0)], "key string, ts string, px double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    with pytest.raises(ValueError, match="reserved spine column"):
        asof_join_nearest(probes, refs, "key", "ts", "px")


def test_heavy_hitters_space_key_column(spark):
    """Key names the DataFrame API accepts unquoted (e.g. with spaces)
    must survive the null-safe confirm join — the alias-qualified
    F.col("hh_fact.<name>") form needs backtick quoting where the old
    name-list join form resolved names directly. (Dotted names are
    outside the operator's input space in every version: the leading
    df.select(*keys) parses them as struct access.)"""
    from spark_ml_pipelines_example_spark.operators.heavyhitters import (
        exact_topk_frequency,
    )

    rows = [("a",)] * 50 + [("b",)] * 30 + [(f"t{i}",) for i in range(10)]
    df = spark.createDataFrame(rows, ["user id"]).repartition(4)
    top, info = exact_topk_frequency(df, ["user id"], k=2, m=64)
    got = [(r["user id"], r["cnt"]) for r in top.collect()]
    assert got == [("a", 50), ("b", 30)]
    assert info["certified"] is True
