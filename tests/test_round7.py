"""Round-7 additions pinned by ADVICE r6: the FPGrowth post-prune basket
recount (effective minCount must never fall below the corpus-derived
floor) and the Catalyst-expression-walk rewrite of persist_tracked's
nondeterminism guard (no string-literal false positives, every
genuinely nondeterministic construct still refused)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_fpgrowth_postprune_recount_pins_floor(spark):
    """ADVICE r6 #1. Corpus: 5 baskets; items a,b survive the floor
    (support 2 each) but x,y,z,w are sub-floor and the prune makes
    baskets 4 and 5 vanish entirely (n=5 -> n2=3). Pre-fix,
    minSupport=(2-0.5)/5 against MLlib's POST-prune basket count gave
    minCount=ceil(0.3*3)=1, admitting the pair {a,b} with support 1.
    The recount yields minSupport=1.5/3 -> minCount=2."""
    from spark_ml_pipelines_example_spark.queries.ml import _fpgrowth_fit_floored

    rows = [
        (1, "a"), (1, "b"),          # the only basket containing the pair
        (2, "a"), (2, "x"),
        (3, "b"), (3, "y"),
        (4, "z"),                     # vanishes in the prune
        (5, "w"),                     # vanishes in the prune
    ]
    items = spark.createDataFrame(rows, "basket long, item string")
    model, min_count = _fpgrowth_fit_floored(items, "basket", "item")
    assert min_count == 2
    freqs = {tuple(sorted(r["items"])): r["freq"] for r in model.freqItemsets.collect()}
    assert all(f >= min_count for f in freqs.values()), freqs
    assert ("a", "b") not in freqs  # the support-1 pair the bug admitted
    assert freqs == {("a",): 2, ("b",): 2}


def test_fpgrowth_no_prune_path_unchanged(spark):
    """Dense corpus (every item clears the floor): the prune is skipped,
    no recount job runs, and the support floor is the plain max(2, ...)."""
    from spark_ml_pipelines_example_spark.queries.ml import _fpgrowth_fit_floored

    rows = [(b, it) for b in range(1, 5) for it in ("a", "b")]
    items = spark.createDataFrame(rows, "basket long, item string")
    model, min_count = _fpgrowth_fit_floored(items, "basket", "item")
    assert min_count == 2
    freqs = {tuple(sorted(r["items"])): r["freq"] for r in model.freqItemsets.collect()}
    assert freqs == {("a",): 4, ("b",): 4, ("a", "b"): 4}


def test_persist_tracked_literal_marker_is_not_nondeterministic(spark):
    """ADVICE r6 #2: a fully deterministic frame whose STRING LITERALS
    contain the old substring markers ('rand(', 'Sample ') must persist
    cleanly under the expression-walk guard."""
    from spark_ml_pipelines_example_spark.operators._cache import (
        persist_tracked,
        release_tracked,
    )

    df = (
        spark.range(5)
        .select(
            "id",
            F.lit("compare to rand( literal").alias("x"),
            F.lit("Sample uuid( shuffle(").alias("y"),
        )
        .filter(F.col("x") != "Sample ")
    )
    out = persist_tracked(df)
    assert out.count() == 5
    release_tracked()


@pytest.mark.parametrize(
    "builder",
    [
        pytest.param(lambda df: df.select(F.rand(1).alias("r")), id="rand"),
        pytest.param(
            lambda df: df.select(F.monotonically_increasing_id().alias("m")),
            id="monotonically_increasing_id",
        ),
        pytest.param(lambda df: df.select(F.expr("uuid()").alias("u")), id="uuid"),
        pytest.param(
            lambda df: df.select(
                F.shuffle(F.array(F.lit(1), F.lit(2))).alias("s")
            ),
            id="shuffle",
        ),
        pytest.param(lambda df: df.sample(0.5, seed=7), id="sample"),
        pytest.param(
            lambda df: df.select(F.spark_partition_id().alias("p")),
            id="spark_partition_id",
        ),
        pytest.param(
            lambda df: df.select(F.input_file_name().alias("f")),
            id="input_file_name",
        ),
        pytest.param(
            # nondeterminism below a deterministic projection — the walk
            # must descend through plan children
            lambda df: df.select(F.rand(1).alias("r")).select(
                (F.col("r") * 0).alias("z")
            ),
            id="nested_child",
        ),
    ],
)
def test_persist_tracked_refuses_nondeterministic(spark, builder):
    from spark_ml_pipelines_example_spark.operators._cache import persist_tracked

    with pytest.raises(ValueError, match="nondeterministic"):
        persist_tracked(builder(spark.range(10)))


# ---------------------------------------------------------------------------
# asof_join_bucketed: skew-resistant two-phase as-of (VERDICT r6 task #4)
# ---------------------------------------------------------------------------

def _asof_corpus(spark, seed, n_keys=3, n_probes=120, n_refs=150):
    """Randomized probe/ref frames with timestamp collisions and a hot
    key (key 0 holds ~half the rows) — ties and cross-bucket gaps both
    exercised. Deterministic via `seed`."""
    import random

    rng = random.Random(seed)

    def key():
        return 0 if rng.random() < 0.5 else rng.randrange(n_keys)

    def ts():
        # cluster on a coarse grid so exact-ts ties happen, spanning
        # ~40 buckets at width=3600s
        import datetime

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


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("tolerance", [None, "INTERVAL 30 MINUTES"])
def test_asof_bucketed_parity_with_merge_scan(spark, direction, tolerance):
    """Property: asof_join_bucketed ≡ asof_join_gap on randomized skewed
    corpora, both directions, with and without tolerance, at a bucket
    width (1h) small enough that many matches cross bucket boundaries."""
    from spark_ml_pipelines_example_spark.operators.asof import (
        asof_join_bucketed,
        asof_join_gap,
    )

    seed = len(direction) * 10 + (0 if tolerance is None else 7)
    probes, refs = _asof_corpus(spark, seed=seed)
    kw = dict(
        on="k", ts="ts", payload="ref_id", alias="m",
        direction=direction, tolerance_expr=tolerance,
    )
    want = {
        r["probe_id"]: r["m"]
        for r in asof_join_gap(probes, refs, **kw).collect()
    }
    got = {
        r["probe_id"]: r["m"]
        for r in asof_join_bucketed(
            probes, refs, bucket_width_us=3_600_000_000, **kw
        ).collect()
    }
    assert got == want
    assert any(v is not None for v in want.values())  # corpus non-trivial


def test_asof_bucketed_single_hot_key_crosses_buckets(spark):
    """All rows on ONE key: the unbucketed plan would run one task; the
    bucketed plan must still answer exactly, including a probe whose
    only ref sits many buckets earlier (long carry chain) and a probe
    with no ref anywhere before it."""
    import datetime

    from spark_ml_pipelines_example_spark.operators.asof import asof_join_bucketed

    base = datetime.datetime(2024, 1, 1)

    def at(h):
        return base + datetime.timedelta(hours=h)

    probes = spark.createDataFrame(
        [(7, at(0.5), 1), (7, at(25.0), 2), (7, at(0.1), 3)],
        "k long, ts timestamp_ntz, probe_id long",
    )
    refs = spark.createDataFrame(
        [(7, at(0.2), 100)],  # only ref: hour 0.2
        "k long, ts timestamp_ntz, ref_id long",
    )
    out = {
        r["probe_id"]: r["m"]
        for r in asof_join_bucketed(
            probes, refs, on="k", ts="ts", payload="ref_id", alias="m",
            bucket_width_us=3_600_000_000,
        ).collect()
    }
    # probe 1 (hour .5): local match; probe 2 (hour 25): carry across 24
    # empty buckets; probe 3 (hour .1): no ref at-or-before -> null
    assert out == {1: 100, 2: 100, 3: None}


def test_q_join_asof_bucketed_hash(spark, duck, sf_dir):
    from spark_ml_pipelines_example_spark.queries.registry import REGISTRY, load_all
    from tests.conftest import compare_frames

    load_all()
    spec = REGISTRY["q_join_asof_bucketed"]
    assert spec.oracle is not None
    compare_frames(spec.fn(spark, sf_dir), duck, spec.oracle, "q_join_asof_bucketed")


# ---------------------------------------------------------------------------
# round-7 batch 2: heavy hitters, decay score, maxsim, relational division


def _exact_topk(spark, df, keys, k):
    return (
        df.groupBy(*keys)
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), *keys)
        .limit(k)
        .collect()
    )


def test_heavy_hitters_zipf_certified_matches_exact(spark):
    """Zipf-skewed keys + small m: compactions happen (err_bound > 0),
    the certificate holds, and the sketch path's output equals the plain
    exact groupBy bit-for-bit."""
    from spark_ml_pipelines_example_spark.operators.heavyhitters import (
        exact_topk_frequency,
    )

    rows = []
    # key i appears ~6000/i times: heavy head, long tail of singletons
    for i in range(1, 400):
        rows.extend((f"k{i:04d}",) for _ in range(max(1, 6000 // i)))
    df = spark.createDataFrame(rows, "key string").repartition(8)
    top, info = exact_topk_frequency(df, ["key"], k=5, m=32)
    got = [(r["key"], r["cnt"]) for r in top.collect()]
    want = [(r["key"], r["cnt"]) for r in _exact_topk(spark, df, ["key"], 5)]
    assert got == want
    assert info["certified"] is True
    assert info["err_bound"] > 0  # the bounded-memory path really engaged
    assert info["n_rows"] == len(rows)
    shares = {r["key"]: r["share"] for r in top.collect()}
    assert shares["k0001"] == 6000 / len(rows)


def test_heavy_hitters_uniform_falls_back_exact(spark):
    """Near-uniform keys with m far too small: the certificate CANNOT
    hold (kth count <= accumulated error), so the operator must take the
    exact-fallback path and still return the true top-k."""
    from spark_ml_pipelines_example_spark.operators.heavyhitters import (
        exact_topk_frequency,
    )

    rows = [(f"u{i % 500:04d}",) for i in range(5000)]  # every key cnt=10
    df = spark.createDataFrame(rows, "key string").repartition(8)
    top, info = exact_topk_frequency(df, ["key"], k=5, m=8)
    got = [(r["key"], r["cnt"]) for r in top.collect()]
    want = [(r["key"], r["cnt"]) for r in _exact_topk(spark, df, ["key"], 5)]
    assert got == want
    assert info["certified"] is False


def test_heavy_hitters_small_domain_no_compaction(spark):
    """Key domain under m: no compaction ever runs, err_bound == 0, and
    the candidate set is the full domain (trivially certified)."""
    from spark_ml_pipelines_example_spark.operators.heavyhitters import (
        exact_topk_frequency,
    )

    rows = [(f"k{i % 7}",) for i in range(70)]
    df = spark.createDataFrame(rows, "key string").repartition(4)
    top, info = exact_topk_frequency(df, ["key"], k=3, m=64)
    assert info == {
        "certified": True,
        "err_bound": 0,
        "n_candidates": 7,
        "n_rows": 70,
    }
    assert [r["cnt"] for r in top.collect()] == [10, 10, 10]


def test_decay_score_dyadic_exactness(spark, sf_dir):
    """decay_score must be EXACTLY score_scaled / 2^40 (both dyadic), and
    score_scaled must equal an independent per-event recompute."""
    from spark_ml_pipelines_example_spark.queries.aggregates import (
        q_agg_decay_score,
    )

    out = q_agg_decay_score(spark, sf_dir).collect()
    assert out, "fixture events must produce rows"
    for r in out:
        assert r["decay_score"] == r["score_scaled"] / float(1 << 40)

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    anchor = max(r["ts"].date() for r in ev)
    import collections

    want = collections.Counter()
    for r in ev:
        age = (anchor - r["ts"].date()).days
        if age <= 40:
            want[r["user_id"]] += 1 << (40 - age)
    for r in out:
        assert r["score_scaled"] == want[r["user_id"]]


def test_maxsim_matches_numpy(spark, sf_dir):
    """MaxSim top-10 vs an independent NumPy recompute (float64, 4x16
    sub-vectors, sum of per-query-token max cosines)."""
    import numpy as np

    from spark_ml_pipelines_example_spark.queries.similarity import q_sim_maxsim

    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    q = vecs[0].reshape(4, 16)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)

    def score(v):
        d = v.reshape(4, 16)
        dn = d / np.linalg.norm(d, axis=1, keepdims=True)
        return float((qn @ dn.T).max(axis=1).sum())

    want = sorted(
        ((score(v), -vid) for vid, v in vecs.items() if vid != 0), reverse=True
    )[:10]
    got = q_sim_maxsim(spark, sf_dir).collect()
    assert [r["vec_id"] for r in got] == [-w[1] for w in want]
    for r, w in zip(got, want):
        assert abs(r["maxsim"] - w[0]) < 1e-6


def test_set_division_synthetic(spark, sf_dir):
    """Only customers covering the FULL divisor domain qualify."""
    from spark_ml_pipelines_example_spark.queries.setops import q_set_division

    out = {r["o_custkey"]: r["n_orders"] for r in q_set_division(spark, sf_dir).collect()}
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    universe = {r["o_orderpriority"] for r in o}
    import collections

    prios = collections.defaultdict(set)
    cnts = collections.Counter()
    for r in o:
        prios[r["o_custkey"]].add(r["o_orderpriority"])
        cnts[r["o_custkey"]] += 1
    want = {c: cnts[c] for c, s in prios.items() if s == universe}
    assert out == want


def test_asof_topk_random_parity_with_bruteforce(spark):
    """150 seeded random cases for the k-nearest as-of join vs a per-row
    brute force — equal timestamps, sparse refs, empty ref sides, and
    probes with fewer than k matches all included; one Spark pass total
    (case id = join key)."""
    import datetime
    import random

    from spark_ml_pipelines_example_spark.operators.asof import asof_join_topk

    rng = random.Random(20260816)
    probes_rows, refs_rows = [], []
    for case in range(150):
        for i, pt in enumerate(sorted(rng.sample(range(0, 40), rng.randint(1, 4)))):
            probes_rows.append((case, pt, 1000 * case + i))
        for i in range(rng.randint(0, 6)):
            refs_rows.append((case, rng.randrange(0, 40), 2000 * case + i))

    mk = lambda rows, col: spark.createDataFrame(  # noqa: E731
        [(k, datetime.datetime(2024, 1, 1, 0, 0, t), v) for (k, t, v) in rows],
        f"k long, ts timestamp_ntz, {col} long",
    )
    got = {}
    out = asof_join_topk(
        mk(probes_rows, "pid"), mk(refs_rows, "rid"),
        on="k", ts="ts", ref_id="rid", k=3, rank_alias="rank",
    ).collect()
    for r in out:
        got.setdefault(r["pid"], {})[r["rank"]] = r["__ref_id"]

    want = {}
    for (k_, pt, pid) in probes_rows:
        cand = sorted(
            ((rt, rv) for (rk, rt, rv) in refs_rows if rk == k_ and rt <= pt),
            reverse=True,  # latest ts first, then largest rid
        )[:3]
        if cand:
            want[pid] = {i + 1: rv for i, (_, rv) in enumerate(cand)}
    assert got == want


def test_woe_iv_matches_hand_computation(spark, sf_dir):
    """WOE/IV vs an independent Python recompute with the same +0.5
    smoothing; iv_total must equal the decimal-exact sum of the rounded
    terms on every row."""
    import collections
    import math

    from spark_ml_pipelines_example_spark.queries.ml import q_ml_woe_iv

    out = q_ml_woe_iv(spark, sf_dir).collect()
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    pos = collections.Counter()
    neg = collections.Counter()
    for r in o:
        (pos if r["o_orderstatus"] == "F" else neg)[r["o_orderpriority"]] += 1
    pt, nt = sum(pos.values()), sum(neg.values())
    want_terms = {}
    for b in set(pos) | set(neg):
        p = (pos[b] + 0.5) / pt
        q = (neg[b] + 0.5) / nt
        want_terms[b] = (round(math.log(p / q), 6), round((p - q) * math.log(p / q), 6))
    assert {r["bucket"]: (r["woe"], r["iv_term"]) for r in out} == want_terms
    iv = round(sum(t[1] for t in want_terms.values()), 10)
    for r in out:
        assert abs(r["iv_total"] - iv) < 1e-9


def test_asof_nearest_random_parity_with_bruteforce(spark):
    """150 seeded random cases for direction='nearest' (with and without
    tolerance) vs brute force: equal-gap ties must resolve backward, and
    within a direction to the largest payload."""
    import datetime
    import random

    from spark_ml_pipelines_example_spark.operators.asof import asof_join_nearest

    rng = random.Random(20260817)
    probes_rows, refs_rows = [], []
    for case in range(150):
        for i, pt in enumerate(sorted(rng.sample(range(0, 40), rng.randint(1, 4)))):
            probes_rows.append((case, pt, 1000 * case + i))
        for i in range(rng.randint(0, 6)):
            refs_rows.append((case, rng.randrange(0, 40), 2000 * case + i))

    mk = lambda rows, col: spark.createDataFrame(  # noqa: E731
        [(k, datetime.datetime(2024, 1, 1, 0, 0, t), v) for (k, t, v) in rows],
        f"k long, ts timestamp_ntz, {col} long",
    )

    def brute(tol):
        out = {}
        for (k_, pt, pid) in probes_rows:
            cand = [
                (abs(rt - pt), rt > pt, -rv)
                for (rk, rt, rv) in refs_rows
                if rk == k_ and (tol is None or abs(rt - pt) <= tol)
            ]
            # min by (gap, forward-flag, -payload): backward beats forward
            # on equal gap; larger payload wins within a direction
            out[pid] = -min(cand)[2] if cand else None
        return out

    for tol_expr, tol_s in ((None, None), ("INTERVAL 5 SECOND", 5)):
        got = {
            r["pid"]: r["ref_id"]
            for r in asof_join_nearest(
                mk(probes_rows, "pid"), mk(refs_rows, "rid"),
                on="k", ts="ts", payload="rid", alias="ref_id",
                tolerance_expr=tol_expr,
            ).collect()
        }
        assert got == brute(tol_s), f"tolerance={tol_expr}"


def test_linear_shap_matches_fraction_recompute(spark, sf_dir):
    """mean_abs_contrib vs an exact Fraction recompute of
    |w| * sum|x - mean| / n (no floats until the final round)."""
    from fractions import Fraction

    from spark_ml_pipelines_example_spark.queries.ml import q_ml_linear_shap

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    out = {r["feature"]: (r["weight"], r["mean_abs_contrib"])
           for r in q_ml_linear_shap(spark, sf_dir).collect()}
    n = len(li)
    for feat, w in (("l_quantity", 3), ("l_discount", -2000), ("l_tax", 1500)):
        xs = [round(r[feat] * 100) for r in li]  # exact cents
        s = sum(xs)
        want = Fraction(abs(w) * sum(abs(n * x - s) for x in xs), 100 * n * n)
        assert out[feat][0] == w
        assert abs(out[feat][1] - float(want)) <= 1e-6


def test_group_by_all_inference_matches_explicit(spark, sf_dir):
    from spark_ml_pipelines_example_spark.queries.subqueries import (
        q_sql_group_by_all,
    )

    got = {
        (r["l_returnflag"], r["l_linestatus"], r["ship_year"]): (r["n"], r["revenue"])
        for r in q_sql_group_by_all(spark, sf_dir).collect()
    }
    import pyspark.sql.functions as SF

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    want = {
        (r["l_returnflag"], r["l_linestatus"], r["ship_year"]): (r["n"], r["revenue"])
        for r in li.groupBy(
            "l_returnflag", "l_linestatus", SF.year("l_shipdate").alias("ship_year")
        )
        .agg(
            SF.count("*").alias("n"),
            SF.sum(SF.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .collect()
    }
    assert got == want


def test_stream_heavy_hitters_matches_batch_exact(spark, sf_dir):
    """The streaming sketch + batch confirm must equal the plain exact
    top-10 groupBy (the same guarantee as the batch operator), and
    shares must be exact int64 ratios."""
    from spark_ml_pipelines_example_spark.streaming.stateful import (
        run_heavy_hitters_available_now,
    )

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        out = run_heavy_hitters_available_now(spark, sf_dir, k=10).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    want = (
        ev.groupBy("user_id", "event_type")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "user_id", "event_type")
        .limit(10)
        .collect()
    )
    n = ev.count()
    assert [(r["user_id"], r["event_type"], r["cnt"]) for r in out] == [
        (r["user_id"], r["event_type"], r["cnt"]) for r in want
    ]
    for r in out:
        assert r["share"] == r["cnt"] / n


def test_stream_hh_fold_state_bounds():
    """_fold_bucket_sketch: counters never exceed HH_M after a batch,
    err bounds any evicted key's true count, total is exact — checked
    against a pure-Python recount over a skewed key stream."""
    import collections

    import pandas as pd

    from spark_ml_pipelines_example_spark.streaming import stateful as S

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    state = FakeState()
    truth = collections.Counter()
    rng_keys = [f"k{i % 97:03d}" for i in range(3000)] + ["hot"] * 400
    for start in range(0, len(rng_keys), 500):
        batch = rng_keys[start : start + 500]
        truth.update(batch)
        list(
            S._fold_bucket_sketch(
                (0,), iter([pd.DataFrame({"k": batch})]), state
            )
        )
    keys, cnts, err, total = state.get
    assert len(keys) <= S.HH_M
    assert total == sum(truth.values())
    held = dict(zip(keys, cnts))
    for k_, c in truth.items():
        assert held.get(k_, 0) <= c  # never overcounts
        if k_ not in held:
            assert c <= err  # absence bound
    assert held["hot"] == truth["hot"] or truth["hot"] <= held["hot"] + err


def test_asof_topk_bucketed_parity_with_unbucketed(spark):
    """Randomized parity: the (key, time-bucket) + array-carry plan must
    return exactly the unbucketed k-nearest result — cross-bucket
    top-ups, sparse buckets, equal timestamps, hot keys and empty ref
    sides included. Bucket width 4s over a 40s span forces most probes
    to top up from the carry."""
    import datetime
    import random

    from spark_ml_pipelines_example_spark.operators.asof import (
        asof_join_topk,
        asof_join_topk_bucketed,
    )

    rng = random.Random(20260818)
    probes_rows, refs_rows = [], []
    for case in range(120):
        for i, pt in enumerate(sorted(rng.sample(range(0, 40), rng.randint(1, 4)))):
            probes_rows.append((case, pt, 1000 * case + i))
        for i in range(rng.randint(0, 8)):
            refs_rows.append((case, rng.randrange(0, 40), 2000 * case + i))
    # one hot key with dense refs across every bucket
    for i in range(200):
        refs_rows.append((999, i % 40, 50000 + i))
    for i, pt in enumerate((0, 7, 23, 39)):
        probes_rows.append((999, pt, 990000 + i))

    mk = lambda rows, col: spark.createDataFrame(  # noqa: E731
        [(k, datetime.datetime(2024, 1, 1, 0, 0, t), v) for (k, t, v) in rows],
        f"k long, ts timestamp_ntz, {col} long",
    )
    kwargs = dict(on="k", ts="ts", ref_id="rid", k=3, rank_alias="rank")
    base = {
        (r["pid"], r["rank"]): r["__ref_id"]
        for r in asof_join_topk(mk(probes_rows, "pid"), mk(refs_rows, "rid"), **kwargs).collect()
    }
    buck = {
        (r["pid"], r["rank"]): r["__ref_id"]
        for r in asof_join_topk_bucketed(
            mk(probes_rows, "pid"), mk(refs_rows, "rid"),
            bucket_width_us=4_000_000, **kwargs
        ).collect()
    }
    assert buck == base
