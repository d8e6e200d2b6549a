"""Round-8 regression pins: the ADVICE r7 fixes (null-keyed heavy
hitters must survive the certified recount; counters stay int64) and
the as-of union-spine refactor's parity (full parity suites live in
test_round6/test_round7 — here only a smoke check that the shared
helper path produces identical output to the pinned fixtures)."""
from __future__ import annotations

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
