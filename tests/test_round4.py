"""Round-4 additions: ADVICE r3 fixes and new operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_ml_pipelines_example_spark.queries.registry import REGISTRY, load_all

load_all()


def test_quantile_two_phase_empty_input(spark, tmp_path):
    """ADVICE r3: empty lineitem must yield an empty 3-column frame, not
    IndexError/TypeError from the build-time phase-1 collect."""
    li = spark.createDataFrame(
        [], "l_extendedprice decimal(18,2), l_partkey bigint"
    )
    li.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    df = REGISTRY["q_agg_quantile_two_phase"].fn(spark, str(tmp_path))
    assert df.columns == ["p", "k", "value_cents"]
    assert df.count() == 0


def test_uplift_qini_thresholds_match_logistic():
    """The integer click thresholds are exactly floor(10*sigmoid((c-10)/5))
    capped at 9 (ADVICE r3: no engine may evaluate exp at a boundary)."""
    import math

    th = (0, 4, 6, 8, 10, 13, 15, 17, 21)
    for c in range(0, 500):
        logistic = min(math.floor(10.0 / (1.0 + math.exp(-(c - 10.0) / 5.0))), 9)
        assert logistic == sum(1 for t in th if c >= t), c


def test_uplift_qini_hash(spark, duck, sf_dir):
    from tests.conftest import compare_frames

    spec = REGISTRY["q_events_uplift_qini"]
    compare_frames(spec.fn(spark, sf_dir), duck, spec.oracle, spec.name)


def test_multimodal_decode_hash(spark, duck, sf_dir):
    """VERDICT r3 task #3: the decode path is end-to-end hash-checked —
    DuckDB replays render→codec→featurize from the same source bytes."""
    from tests.conftest import compare_frames

    spec = REGISTRY["q_multimodal_decode"]
    assert spec.oracle is not None
    compare_frames(spec.fn(spark, sf_dir), duck, spec.oracle, spec.name)


def test_documents_fixture_is_ascii(duck):
    """The multimodal oracle's character-=-byte indexing assumption."""
    n = duck.execute(
        "SELECT SUM(CASE WHEN octet_length(encode(text)) <> length(text) "
        "THEN 1 ELSE 0 END), MIN(length(text)) FROM documents"
    ).fetchone()
    assert n[0] == 0 and n[1] > 0


def test_train_test_split_balance_and_hash(spark, duck, sf_dir):
    """The declared frame is the partition contract (hash-checked); the
    seed-specific 70/30 balance stays pinned here."""
    from tests.conftest import compare_frames

    spec = REGISTRY["q_ml_train_test_split"]
    assert spec.oracle is not None
    compare_frames(spec.fn(spark, sf_dir), duck, spec.oracle, spec.name)
    from spark_ml_pipelines_example_spark.queries._util import t as _t

    d = _t(spark, sf_dir, "documents")
    train, test = d.randomSplit([0.7, 0.3], seed=42)
    n_tr, n_total = train.count(), d.count()
    assert 0.55 * n_total <= n_tr <= 0.85 * n_total


def test_fpgrowth_subfloor_prune_branches(spark):
    """VERDICT r3 task #8: both branches of the long-tail pre-prune guard,
    and result-invariance of the prune (anti-monotonicity)."""
    from pyspark.sql import functions as F  # noqa: F811

    from spark_ml_pipelines_example_spark.queries.ml import _prune_subfloor_items

    # dense corpus: every item clears the floor → no-op branch
    dense = spark.createDataFrame(
        [(o, i) for o in range(6) for i in (1, 2, 3)],
        "l_orderkey long, l_partkey long",
    )
    out, pruned = _prune_subfloor_items(dense, "l_partkey", 2)
    assert not pruned and out.count() == dense.count()

    # long-tail corpus: items 100..105 appear once → pruned branch
    tail = dense.unionAll(
        spark.createDataFrame(
            [(o, 100 + o) for o in range(6)], "l_orderkey long, l_partkey long"
        )
    )
    out, pruned = _prune_subfloor_items(tail, "l_partkey", 2)
    assert pruned
    assert out.count() == dense.count()
    assert out.filter(F.col("l_partkey") >= 100).count() == 0

    # prune invariance: FPGrowth frequent itemsets identical with/without
    from pyspark.ml.fpm import FPGrowth

    def mine(items):
        baskets = items.groupBy("l_orderkey").agg(
            F.collect_set("l_partkey").alias("items")
        )
        n = baskets.count()
        model = FPGrowth(itemsCol="items", minSupport=1.5 / n).fit(baskets)
        return sorted(
            (tuple(sorted(r["items"])), r["freq"])
            for r in model.freqItemsets.collect()
        )

    assert mine(tail) == mine(out)


def test_fpgrowth_corpus_derived_floor():
    """VERDICT r5 task #3: the support floor derives from corpus size —
    exactly 2 at every fixture SF (so the literal `>= 2` oracle stays
    exact wherever the driver contract runs), rising proportionally
    beyond ~200k baskets to bound the frequent-item dictionary by
    avg_basket_len / _FP_REL_FLOOR items independent of corpus size."""
    from spark_ml_pipelines_example_spark.queries.ml import (
        _FP_REL_FLOOR,
        _fp_min_count,
    )

    assert _FP_REL_FLOOR == 1e-5
    # fixture scales: sf0.001 / sf0.01 / sf0.1 basket (order) counts
    for n in (1_500, 15_000, 150_000, 200_000):
        assert _fp_min_count(n) == 2, n
    # the 10x worst-case probe (1.5M disjoint baskets): floor 15
    assert _fp_min_count(1_500_000) == 15
    # 100 TB shape: floor proportional to n
    assert _fp_min_count(10_000_000_000) == 100_000


def test_holt_family_hash(spark, duck, sf_dir):
    """q_ts_holt / q_ts_holt_winters: recursion replay must hash-match
    (bit-identical IEEE op order in applyInPandas and the RECURSIVE CTE)."""
    from tests.conftest import compare_frames

    for name in ("q_ts_holt", "q_ts_holt_winters"):
        spec = REGISTRY[name]
        compare_frames(spec.fn(spark, sf_dir), duck, spec.oracle, name)


def test_holt_winters_seasonality_reduces_error(spark, sf_dir):
    """Sanity: on a seasonal series the HW one-step forecast should not be
    degenerate — forecasts exist from day 8 and trend/seasonal vary."""
    from pyspark.sql import functions as F  # noqa: F811

    df = REGISTRY["q_ts_holt_winters"].fn(spark, sf_dir)
    agg = df.agg(
        F.count("*").alias("n"),
        F.countDistinct(F.round("seasonal", 3)).alias("n_seas"),
    ).collect()[0]
    assert agg["n"] > 0 and agg["n_seas"] > 1


def test_listagg_hash(spark, duck, sf_dir):
    from tests.conftest import compare_frames

    spec = REGISTRY["q_agg_listagg"]
    compare_frames(spec.fn(spark, sf_dir), duck, spec.oracle, spec.name)


def test_python_datasource_partition_planning(spark, duck, sf_dir):
    """The connector must plan one Spark partition per InputPartition and
    deliver every id to exactly one of them; content hash-checked."""
    from tests.conftest import compare_frames

    from spark_ml_pipelines_example_spark.sources.pyds import register

    register(spark)
    src = (
        spark.read.format("synthetic_telemetry")
        .option("n_rows", 1000)
        .option("n_parts", 4)
        .load()
    )
    assert src.rdd.getNumPartitions() == 4
    assert src.count() == 1000
    assert src.select("device_id").distinct().count() == 1000

    spec = REGISTRY["q_scan_python_datasource"]
    compare_frames(spec.fn(spark, sf_dir), duck, spec.oracle, spec.name)


def test_sql_udf_and_dynamic_overwrite_hash(spark, duck, sf_dir):
    from tests.conftest import compare_frames

    for name in ("q_fn_sql_udf", "q_sink_dynamic_partition_overwrite"):
        spec = REGISTRY[name]
        compare_frames(spec.fn(spark, sf_dir), duck, spec.oracle, name)


def test_dynamic_overwrite_touches_only_target_partition(spark, sf_dir, tmp_path):
    """Static overwrite would truncate the whole table; dynamic must keep
    the untouched partitions byte-identical."""
    from pyspark.sql import functions as F  # noqa: F811

    path = str(tmp_path / "dynpart")
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)], "id long, p string, v double"
    )
    base.write.mode("overwrite").partitionBy("p").parquet(path)
    repl = spark.createDataFrame([(9, "b", 99.0)], "id long, p string, v double")
    (
        repl.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("p")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    rows = sorted(tuple(r) for r in back.select("id", "p", "v").collect())
    assert rows == [(1, "a", 10.0), (3, "a", 30.0), (9, "b", 99.0)]


def test_events_did_hash(spark, duck, sf_dir):
    from tests.conftest import compare_frames

    spec = REGISTRY["q_events_did"]
    compare_frames(spec.fn(spark, sf_dir), duck, spec.oracle, spec.name)


def test_multimodal_binary_files_hash(spark, duck, sf_dir):
    """File-based media ingest: write BMPs, binaryFile read, decode,
    aggregate — hash-checked against the closed-form replay."""
    from tests.conftest import compare_frames

    spec = REGISTRY["q_multimodal_binary_files"]
    compare_frames(spec.fn(spark, sf_dir), duck, spec.oracle, spec.name)


def test_cdc_apply_lifecycle(spark, duck, sf_dir):
    """CDC replay: updated keys carry the repriced row, deleted keys are
    absent (including update-then-delete keys, %91), untouched keys
    survive verbatim; hash-checked against the DuckDB replay."""
    from tests.conftest import compare_frames

    spec = REGISTRY["q_cdc_apply"]
    snap = spec.fn(spark, sf_dir)
    # %13 keys (deletes win at seq 3) must be gone even when also updated
    assert snap.filter(F.col("o_orderkey") % 13 == 0).count() == 0
    # surviving %7 keys all carry the update
    upd = snap.filter(F.col("o_orderkey") % 7 == 0)
    assert upd.count() > 0
    assert upd.filter(F.col("o_orderstatus") != "U").count() == 0
    compare_frames(snap, duck, spec.oracle, spec.name)


def test_sql_pipe_and_variables_hash(spark, duck, sf_dir):
    """Pipe-syntax lowering and session-variable threshold must equal
    their classic-SQL oracles."""
    from tests.conftest import compare_frames

    for name in ("q_sql_pipe_syntax", "q_sql_session_variables"):
        spec = REGISTRY[name]
        compare_frames(spec.fn(spark, sf_dir), duck, spec.oracle, spec.name)


def test_countmin_never_undercounts(spark, duck, sf_dir):
    """CM sketch property: estimate >= true count for every probed key
    (min over d rows of counters that each include the key's own hits);
    full pipeline hash-checked against the DuckDB replay."""
    from tests.conftest import compare_frames

    spec = REGISTRY["q_agg_countmin"]
    out = spec.fn(spark, sf_dir)
    assert out.filter(F.col("overcount") < 0).count() == 0
    assert out.count() == 20
    compare_frames(out, duck, spec.oracle, spec.name)


def test_label_propagation_partitions_nodes(spark, duck, sf_dir):
    """LPA communities must partition the node set exactly (every node
    in one community), and the rollup hash-matches the unrolled CTE
    replay."""
    from tests.conftest import compare_frames

    spec = REGISTRY["q_graph_label_propagation"]
    out = spec.fn(spark, sf_dir)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    items = li.select("l_orderkey", "l_partkey").distinct()
    pairs = (
        items.alias("a")
        .join(items.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(F.col("a.l_partkey").alias("s"), F.col("b.l_partkey").alias("d"))
        .distinct()
    )
    n_nodes = (
        pairs.select(F.col("s").alias("n"))
        .unionByName(pairs.select(F.col("d").alias("n")))
        .distinct()
        .count()
    )
    got = out.agg(F.sum("n_nodes")).collect()[0][0]
    assert got == n_nodes
    compare_frames(out, duck, spec.oracle, spec.name)


def test_bloom_no_false_negatives_and_fpr(spark, duck, sf_dir):
    """Every member must probe positive (structural zero false
    negatives), and the summary row hash-matches the DuckDB replay."""
    from tests.conftest import compare_frames

    from spark_ml_pipelines_example_spark.queries.aggregates import (
        BLOOM_K,
        BLOOM_M,
        _BLOOM_COEFFS,
        _CM_P31,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    h = F.expr(
        "CAST(conv(substring(md5(CAST(o_custkey AS STRING)), 9, 8), 16, 10) AS BIGINT)"
        " & 2147483647"
    )
    members = o.select("o_custkey").distinct().select("o_custkey", h.alias("h"))
    bits = None
    for a, b in _BLOOM_COEFFS:
        part = members.select((((F.lit(a) * F.col("h") + F.lit(b)) % _CM_P31) % BLOOM_M).alias("bit"))
        bits = part if bits is None else bits.unionByName(part)
    bits = bits.distinct()
    probes = None
    for a, b in _BLOOM_COEFFS:
        p = members.select(
            "o_custkey", (((F.lit(a) * F.col("h") + F.lit(b)) % _CM_P31) % BLOOM_M).alias("bit")
        )
        probes = p if probes is None else probes.unionByName(p)
    neg = (
        probes.join(bits, "bit")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_hit"))
        .filter(F.col("n_hit") < BLOOM_K)
        .count()
    )
    assert neg == 0

    spec = REGISTRY["q_agg_bloom_membership"]
    compare_frames(spec.fn(spark, sf_dir), duck, spec.oracle, spec.name)


def test_hll_replay_error_band(spark, duck, sf_dir):
    """The textbook-HLL estimate must land within a loose 2-sigma band
    of the exact distinct count (sigma = 1.04/sqrt(1024) ~ 3.3%), and
    the whole sketch hash-matches the DuckDB replay."""
    from tests.conftest import compare_frames

    spec = REGISTRY["q_agg_hll_replay"]
    out = spec.fn(spark, sf_dir)
    row = out.collect()[0].asDict()
    assert abs(row["rel_error"]) < 0.066
    compare_frames(out, duck, spec.oracle, spec.name)


def test_pipeline_funnel_monotone_and_consistent(spark, duck, sf_dir):
    """The funnel must be monotone non-increasing in docs and tokens,
    stage counts must agree with the standalone stage queries'
    semantics (raw = corpus size; quality = cascade 'keep' count), and
    the whole composite hash-matches the DuckDB replay."""
    from tests.conftest import compare_frames

    spec = REGISTRY["q_curate_pipeline_funnel"]
    out = spec.fn(spark, sf_dir)
    rows = {r["stage"]: r.asDict() for r in out.collect()}
    order = ["raw", "quality", "dedup", "decontam", "domain_cap"]
    for a, b in zip(order, order[1:]):
        assert rows[a]["n_docs"] >= rows[b]["n_docs"]
        assert rows[a]["n_tokens"] >= rows[b]["n_tokens"]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert rows["raw"]["n_docs"] == docs.count()
    cascade = REGISTRY["q_text_filter_cascade"].fn(spark, sf_dir)
    keep = cascade.filter(F.col("verdict") == "keep").count()
    assert rows["quality"]["n_docs"] == keep
    compare_frames(out, duck, spec.oracle, spec.name)


def test_agg_pushdown_reaches_parquet_scan(spark, duck, sf_dir):
    """The scoped V2 read must show PushedAggregation in the physical
    plan (footer-statistics answer, no data pages), the session confs
    must be restored afterwards, and the result hash-matches."""
    from tests.conftest import compare_frames

    prev_v1 = spark.conf.get("spark.sql.sources.useV1SourceList")
    spec = REGISTRY["q_scan_agg_pushdown"]
    out = spec.fn(spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedAggregation: [COUNT(*)" in plan
    assert spark.conf.get("spark.sql.sources.useV1SourceList") == prev_v1
    compare_frames(out, duck, spec.oracle, spec.name)


def test_kmv_setops_error_band(spark, duck, sf_dir):
    """KMV estimates (incl. the union and Jaccard-route intersection)
    must land within a loose 3-sigma band (sigma = 1/sqrt(256) =
    6.25%) of the exact cohort cardinalities, and the summary row
    hash-matches the DuckDB replay."""
    from tests.conftest import compare_frames

    spec = REGISTRY["q_agg_kmv_setops"]
    out = spec.fn(spark, sf_dir)
    r = out.collect()[0].asDict()
    for t_, e_ in (
        ("true_a", "est_a"),
        ("true_b", "est_b"),
        ("true_union", "est_union"),
        ("true_intersect", "est_intersect"),
    ):
        assert abs(r[e_] - r[t_]) / r[t_] < 0.19, (t_, r)
    compare_frames(out, duck, spec.oracle, spec.name)


def test_epoch_mix_matches_quota(spark, duck, sf_dir):
    """Materialized epochs must emit exactly the quota rows the
    temperature math assigns per source (n_emitted = quota from
    q_curate_mix_temperature), and the rollup hash-matches."""
    from tests.conftest import compare_frames

    spec = REGISTRY["q_curate_epoch_mix"]
    out = spec.fn(spark, sf_dir)
    got = {r["source"]: r["n_emitted"] for r in out.collect()}
    quota = {
        r["source"]: r["quota"]
        for r in REGISTRY["q_curate_mix_temperature"].fn(spark, sf_dir).collect()
    }
    assert got == quota
    compare_frames(out, duck, spec.oracle, spec.name)


def test_bpe_train_hash(spark, duck, sf_dir):
    from tests.conftest import compare_frames

    spec = REGISTRY["q_text_bpe_train"]
    compare_frames(spec.fn(spark, sf_dir), duck, spec.oracle, spec.name)


def test_bpe_greedy_merge_semantics(spark):
    """The replace()-based merge must be greedy left-to-right and
    non-overlapping IDENTICALLY in Spark and DuckDB: ' a a a' merges to
    ' aa a' (not ' a aa'), ' a b a b' to ' ab ab' (the scan resumes
    after each replacement, so the consumed separator can't block the
    next match)."""
    import duckdb

    cases = [(" a a a", " a a", " aa"), (" a b a b", " a b", " ab")]
    con = duckdb.connect()
    for s, pat, rep in cases:
        spark_out = spark.sql(
            f"SELECT replace('{s}', '{pat}', '{rep}') AS r"
        ).collect()[0]["r"]
        duck_out = con.execute(f"SELECT replace('{s}', '{pat}', '{rep}')").fetchone()[0]
        assert spark_out == duck_out, (s, spark_out, duck_out)
    con.close()


def test_bpe_merges_are_valid_bpe(spark, sf_dir):
    """Structural invariants of a BPE merge table: steps are 1..K, pair
    counts are non-increasing is NOT guaranteed (a merge can create a
    more frequent pair) but every merged token must be the concatenation
    of its parts, and a later merge may only reference symbols that are
    single characters, the </w> marker, or the product of an EARLIER
    merge (the property that makes the table replayable by a tokenizer)."""
    rows = REGISTRY["q_text_bpe_train"].fn(spark, sf_dir).collect()
    assert [r["step"] for r in rows] == list(range(1, len(rows) + 1))
    known = set("abcdefghijklmnopqrstuvwxyz0123456789") | {"</w>"}
    for r in rows:
        assert r["merged"] == r["lhs"] + r["rhs"]
        assert r["lhs"] in known and r["rhs"] in known, r
        assert r["pair_count"] > 0
        known.add(r["merged"])


def test_time_travel_hash(spark, duck, sf_dir):
    from tests.conftest import compare_frames

    spec = REGISTRY["q_scan_time_travel"]
    compare_frames(spec.fn(spark, sf_dir), duck, spec.oracle, spec.name)


def test_snapshot_log_isolation(spark, tmp_path):
    """The table-format contract: commits are copy-on-write over
    immutable files, so (a) a version resolved BEFORE a later commit
    still reads its exact snapshot afterwards, (b) a delete commit
    removes rows without touching data files, (c) versions are dense and
    ordered."""
    from spark_ml_pipelines_example_spark.sources import snapshots as S

    base = str(tmp_path / "tbl")
    S.init_table(base)
    df1 = spark.range(10).withColumnRenamed("id", "k")
    f1 = S.write_segment(df1, base, "seg1")
    v0 = S.commit_snapshot(base, f1)
    f2 = S.write_segment(spark.range(10, 15).withColumnRenamed("id", "k"), base, "seg2")
    v1 = S.commit_snapshot(base, f1 + f2)
    v2 = S.commit_snapshot(base, f2)  # delete seg1
    assert (v0, v1, v2) == (0, 1, 2)
    assert S.versions(base) == [0, 1, 2]
    assert S.read_version(spark, base, 0).count() == 10
    assert S.read_version(spark, base, 1).count() == 15
    assert S.read_version(spark, base, 2).count() == 5
    # time travel after the delete still sees the full v1 snapshot
    got = sorted(r["k"] for r in S.read_version(spark, base, 1).collect())
    assert got == list(range(15))
    # immutability: the delete commit left seg1's files on disk untouched
    import os

    assert all(os.path.exists(p) for p in f1)
    # a segment can never be rewritten
    import pytest as _pytest

    with _pytest.raises(Exception):
        S.write_segment(df1, base, "seg1")


def test_bpe_apply_hash(spark, duck, sf_dir):
    from tests.conftest import compare_frames

    spec = REGISTRY["q_text_bpe_apply"]
    compare_frames(spec.fn(spark, sf_dir), duck, spec.oracle, spec.name)


def test_bpe_segmentation_is_lossless(spark, sf_dir):
    """Tokenization must be a partition of the input: concatenating each
    word's subword tokens (minus the marker) reconstructs the word
    exactly — no character is lost or duplicated by any merge round."""
    from spark_ml_pipelines_example_spark.queries.text import _bpe_train

    words, _ = _bpe_train(spark, sf_dir)
    bad = words.select(
        F.replace(
            F.replace(F.col("seq"), F.lit(" "), F.lit("")), F.lit("</w>"), F.lit("")
        ).alias("rejoined"),
        "freq",
    ).filter(~F.col("rejoined").rlike("^[a-z0-9]+$"))
    assert bad.count() == 0


@pytest.mark.parametrize(
    "qname",
    ["q_ts_ewma_irregular", "q_curate_k_anonymity", "q_scan_table_history"],
)
def test_round4_batch2_hash(qname, spark, duck, sf_dir):
    from tests.conftest import compare_frames

    spec = REGISTRY[qname]
    compare_frames(spec.fn(spark, sf_dir), duck, spec.oracle, spec.name)


def test_ewma_irregular_is_convex_and_gap_aware(spark, sf_dir):
    """The smoother is a convex combination, so every level lies inside
    the running [min, max] envelope of its customer's series; a zero-day
    gap (same-day second order) must leave the level exactly unchanged."""
    df = REGISTRY["q_ts_ewma_irregular"].fn(spark, sf_dir)
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("o_custkey")
        .orderBy("epoch_day", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    chk = df.select(
        "*",
        F.min("x").over(w).alias("lo"),
        F.max("x").over(w).alias("hi"),
        F.lag("level").over(
            W.partitionBy("o_custkey").orderBy("epoch_day", "o_orderkey")
        ).alias("prev_level"),
    )
    eps = 1e-6  # output is rounded to 6dp
    assert (
        chk.filter(
            (F.col("level") < F.col("lo") - eps) | (F.col("level") > F.col("hi") + eps)
        ).count()
        == 0
    )
    assert (
        chk.filter(
            (F.col("dt") == 0)
            & F.col("prev_level").isNotNull()
            & (F.abs(F.col("level") - F.col("prev_level")) > eps)
        ).count()
        == 0
    )


def test_table_history_reconciles(spark, sf_dir):
    """Ledger identity: n_rows(v) = n_rows(v-1) + rows_added(v) -
    rows_removed(v), and the history row counts equal what the
    time-travel reads of the same versions actually return."""
    hist = {
        r["version"]: r
        for r in REGISTRY["q_scan_table_history"].fn(spark, sf_dir).collect()
    }
    prev = 0
    for v in sorted(hist):
        r = hist[v]
        assert r["n_rows"] == prev + r["rows_added"] - r["rows_removed"], r
        prev = r["n_rows"]
    tt = {
        r["version"]: r["n_rows"]
        for r in REGISTRY["q_scan_time_travel"].fn(spark, sf_dir).collect()
    }
    assert {v: hist[v]["n_rows"] for v in hist} == tt


def test_snapshot_vacuum(spark, tmp_path):
    """VACUUM semantics: expiring old versions deletes exactly the files
    no retained manifest references — retained versions stay readable
    byte-for-byte, expired versions fail loudly, and files shared with a
    retained version survive."""
    from spark_ml_pipelines_example_spark.sources import snapshots as S

    base = str(tmp_path / "tbl")
    S.init_table(base)
    f1 = S.write_segment(spark.range(10).withColumnRenamed("id", "k"), base, "s1")
    S.commit_snapshot(base, f1)                      # v0
    f2 = S.write_segment(spark.range(10, 15).withColumnRenamed("id", "k"), base, "s2")
    S.commit_snapshot(base, f1 + f2)                 # v1
    S.commit_snapshot(base, f2)                      # v2 (delete s1)
    res = S.vacuum(base, keep_versions=2)            # retain v1, v2
    # s1's files are referenced by retained v1 -> NOT removed
    assert res["removed_files"] == 0 and res["removed_versions"] == [0]
    assert S.read_version(spark, base, 1).count() == 15
    res2 = S.vacuum(base, keep_versions=1)           # retain only v2
    assert res2["removed_files"] == len(f1)          # now s1 is dead
    import os as _os

    assert not any(_os.path.exists(p) for p in f1)
    assert all(_os.path.exists(p) for p in f2)
    assert S.read_version(spark, base, 2).count() == 5
    assert S.versions(base) == [2]
    import pytest as _pytest

    with _pytest.raises(Exception):
        S.read_version(spark, base, 1)


def test_snapshot_optimistic_concurrency(spark, tmp_path):
    """CAS commit protocol: a writer that based its change on a stale
    version gets CommitConflict (and the log is untouched); retrying
    from the fresh version succeeds; a direct collision on the same
    version slot is also refused."""
    from spark_ml_pipelines_example_spark.sources import snapshots as S

    base = str(tmp_path / "tbl")
    S.init_table(base)
    f1 = S.write_segment(spark.range(5).withColumnRenamed("id", "k"), base, "s1")
    v0 = S.commit_snapshot(base, f1, expect_version=None)
    f2 = S.write_segment(spark.range(5, 9).withColumnRenamed("id", "k"), base, "s2")
    # writer A commits on top of v0
    S.commit_snapshot(base, f1 + f2, expect_version=v0)
    # writer B also read v0 — its commit must now conflict
    with pytest.raises(S.CommitConflict):
        S.commit_snapshot(base, f1, expect_version=v0)
    assert S.versions(base) == [0, 1]  # loser left no trace
    # B retries from the current version and wins
    S.commit_snapshot(base, f2, expect_version=1)
    assert S.versions(base) == [0, 1, 2]
    # explicit same-slot collision is refused too
    with pytest.raises(S.CommitConflict):
        S.commit_snapshot(base, f2, version=2)


def test_kmeans_exact_invariants(spark, sf_dir, duck):
    """q_ml_kmeans_exact: the exact-audit contract — partition of the
    corpus (sizes sum to N, clusters <= K), int64-exact centroid
    checksums, and the Spark result equals the DuckDB unrolled-replay
    oracle row-for-row (the full hash check lives in driver_sim; this
    pins the same equality in the suite)."""
    from spark_ml_pipelines_example_spark.queries import ml

    out = ml.q_ml_kmeans_exact(spark, sf_dir).orderBy("cluster").collect()
    n_total = duck.execute("SELECT COUNT(*) FROM embeddings").fetchone()[0]
    assert sum(r["n_vectors"] for r in out) == n_total
    assert 0 < len(out) <= ml.KMX_K
    oracle = duck.execute(
        "SELECT * FROM (" + ml._kmx_oracle() + ") ORDER BY cluster"
    ).fetchall()
    got = [
        (r["cluster"], r["n_vectors"], r["s_checksum"], r["wssd_scaled"]) for r in out
    ]
    assert got == [tuple(map(int, r)) for r in oracle]


def test_kmeans_exact_quantizer_is_exact(spark):
    """The floor(x*1024) quantizer claim: float32->float64 cast is exact
    and *1024 (power of two) is exact, so quantization is a pure function
    of the stored bits — identical for any evaluation order/engine."""
    import math
    import struct

    for bits in (0x3F000001, 0xBF7FFFFF, 0x3DCCCCCD, 0x00000000, 0x3F7FFFFF):
        x = struct.unpack("f", struct.pack("I", bits))[0]
        # float64 product with a power of two preserves the significand
        assert math.floor(x * 1024) == math.floor(float(x) * 1024.0)
        m, e = math.frexp(x * 1024.0)
        assert x == 0.0 or (x * 1024.0) / 1024.0 == x


def test_semdedup_invariants(spark, sf_dir, duck):
    """q_dedup_semantic: SemDeDup contract — one row per vector, cluster
    column matches the shared Lloyd assignment, a removed vector always
    has a surviving lower-id cluster-mate above the τ bar, and the Spark
    result equals the DuckDB replay row-for-row (hash check in
    driver_sim; this pins the same equality in the suite)."""
    from spark_ml_pipelines_example_spark.queries import dedup

    out = dedup.q_dedup_semantic(spark, sf_dir).orderBy("vec_id").collect()
    n_total = duck.execute("SELECT COUNT(*) FROM embeddings").fetchone()[0]
    assert len(out) == n_total
    assert {r["removed"] for r in out} <= {0, 1}
    n_removed = sum(r["removed"] for r in out)
    assert 0 < n_removed < n_total  # the τ=0.35 bar bites but keeps most
    oracle = duck.execute(
        "SELECT * FROM (" + dedup._semdedup_oracle() + ") ORDER BY vec_id"
    ).fetchall()
    got = [(r["vec_id"], r["cluster"], r["removed"]) for r in out]
    assert got == [tuple(map(int, r)) for r in oracle]


def test_semdedup_tau_bounds_are_int64_safe():
    """The sqrt/division-free cosine test's overflow claim: with
    |xq| < 2^10 and dim 64, 400*dot^2 and 49*|a|^2*|b|^2 both stay well
    inside int64 at the worst case."""
    from spark_ml_pipelines_example_spark.queries.dedup import (
        SEMDEDUP_TAU_DEN,
        SEMDEDUP_TAU_NUM,
    )

    xmax, dim = 1023, 64
    dot_max = dim * xmax * xmax
    n2_max = dim * xmax * xmax
    assert SEMDEDUP_TAU_DEN * dot_max * dot_max < 2**63
    assert SEMDEDUP_TAU_NUM * n2_max * n2_max < 2**63


def test_stream_tws_map_state_matches_batch(spark, sf_dir, duck):
    """q_stream_tws_map_state: the arbitrary-stateful map-state run's
    final emissions equal the batch GROUP BY exactly (one row per
    (user, event_type), exact integer cents)."""
    from spark_ml_pipelines_example_spark.queries.registry import REGISTRY

    got = {
        (r["user_id"], r["event_type"]): (r["n_events"], r["sum_cents"])
        for r in REGISTRY["q_stream_tws_map_state"].fn(spark, sf_dir).collect()
    }
    exp = {
        (u, et): (n, c)
        for u, et, n, c in duck.execute(
            REGISTRY["q_stream_tws_map_state"].oracle
        ).fetchall()
    }
    assert got == exp


def test_markov_iteration_converged_vs_exact_solve(spark, sf_dir):
    """The rows-only → SQL restatement (fixed-N Jacobi) must agree with
    the exact linear solve it replaced to far below the 6dp output
    rounding — i.e. N=MARKOV_ITERS is past convergence on the fixture,
    so the declared semantics are still 'the absorbing-chain solution',
    not an artifact of truncation."""
    import numpy as np

    from spark_ml_pipelines_example_spark.queries.registry import REGISTRY

    rows = REGISTRY["q_events_markov_attribution"].fn(spark, sf_dir).collect()
    # Recompute via numpy exact solve from the same declared outputs'
    # inputs: reconstruct transition counts independently.
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from spark_ml_pipelines_example_spark.queries._util import epoch_s, t

    ev = t(spark, sf_dir, "events")
    wuser = W.partitionBy("user_id").orderBy(epoch_s("ts"), "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.row_number().over(wuser).alias("rn"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.row_number().over(wuser))
        )
        .over(W.partitionBy("user_id"))
        .alias("conv_rn"),
    )
    touches = seq.filter(
        (F.col("conv_rn").isNull()) | (F.col("rn") < F.col("conv_rn"))
    )
    nxt = touches.select(
        "user_id",
        F.col("event_type").alias("src"),
        F.lead("event_type")
        .over(W.partitionBy("user_id").orderBy("rn"))
        .alias("dst_raw"),
        F.col("conv_rn").isNotNull().alias("converts"),
        "rn",
    )
    trows = (
        nxt.select(
            "src",
            F.when(F.col("dst_raw").isNotNull(), F.col("dst_raw"))
            .when(F.col("converts"), F.lit("CONV"))
            .otherwise(F.lit("NULL"))
            .alias("dst"),
        )
        .unionByName(
            touches.filter(F.col("rn") == 1).select(
                F.lit("START").alias("src"), F.col("event_type").alias("dst")
            )
        )
        .groupBy("src", "dst")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    states = sorted(
        ({r["src"] for r in trows} | {r["dst"] for r in trows}) - {"CONV", "NULL"}
    )
    idx = {s: i for i, s in enumerate(states)}
    k = len(states)
    counts = np.zeros((k, k + 1))
    totals = np.zeros(k)
    for r in trows:
        totals[idx[r["src"]]] += r["n"]
        if r["dst"] == "CONV":
            counts[idx[r["src"]], k] += r["n"]
        elif r["dst"] != "NULL":
            counts[idx[r["src"]], idx[r["dst"]]] += r["n"]

    def exact(removed):
        q = np.zeros((k, k))
        b = np.zeros(k)
        for i, s in enumerate(states):
            if totals[i] == 0 or s == removed:
                continue
            p = counts[i] / totals[i]
            if removed is not None:
                p = p.copy()
                p[idx[removed]] = 0.0
            q[i] = p[:k]
            b[i] = p[k]
        return float(np.linalg.solve(np.eye(k) - q, b)[idx["START"]])

    base = exact(None)
    # outputs are rounded to 6dp, so the honest bound is half an ulp of
    # the 6th decimal (5e-7) plus the iteration residual (<1e-12)
    for r in rows:
        assert abs(r["base_conv_prob"] - base) < 5.1e-7
        want = max(0.0, (base - exact(r["channel"])) / base) if base > 0 else 0.0
        assert abs(r["removal_effect"] - want) < 5.1e-7


def test_isotonic_exact_invariants(spark, sf_dir):
    """q_ml_isotonic_exact: strictly increasing pool means (ties pool by
    construction), total weight/cents preserved, and the fit minimizes
    weighted squared error like a reference sequential PAV over the same
    exact integer series."""
    from spark_ml_pipelines_example_spark.queries.registry import REGISTRY

    rows = (
        REGISTRY["q_ml_isotonic_exact"].fn(spark, sf_dir).orderBy("d_start").collect()
    )
    assert rows
    means = [r["pool_cents"] / r["pool_weight"] for r in rows]
    assert all(a < b for a, b in zip(means, means[1:]))  # strictly increasing
    # cross-check against an independent numpy PAV on the same rollup
    import numpy as np

    from pyspark.sql import functions as F

    from spark_ml_pipelines_example_spark.queries._util import dec, t

    daily = (
        t(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.count("*").alias("n"),
            F.sum((dec("value") * 100).cast("long")).alias("s"),
        )
        .orderBy("day")
        .collect()
    )
    w = np.array([r["n"] for r in daily], dtype=float)
    y = np.array([r["s"] / r["n"] for r in daily])
    # sequential PAV (merge on >=)
    pw, py = [], []
    for wi, yi in zip(w, y):
        pw.append(wi)
        py.append(yi)
        while len(pw) >= 2 and py[-2] >= py[-1]:
            m = (py[-2] * pw[-2] + py[-1] * pw[-1]) / (pw[-2] + pw[-1])
            pw[-2:] = [pw[-2] + pw[-1]]
            py[-2:] = [m]
        # note float merge order differs from the exact int path; values
        # agree to float tolerance
    assert len(pw) == len(rows)
    got = [r["pred_cents"] for r in rows]
    assert np.allclose(got, py, rtol=1e-9)
    assert sum(r["pool_weight"] for r in rows) == int(w.sum())
    assert sum(r["pool_cents"] for r in rows) == sum(int(r["s"]) for r in daily)


def test_pca_power_exact_matches_lapack(spark, sf_dir):
    """q_ml_pca_power_exact: the power-iterated loading vector aligns
    with LAPACK's top eigenvector of the same exact Gram matrix (up to
    sign), and rayleigh_g equals the top eigenvalue — i.e. the declared
    result is PCA, not a truncation artifact."""
    import numpy as np

    from spark_ml_pipelines_example_spark.queries.registry import REGISTRY

    rows = (
        REGISTRY["q_ml_pca_power_exact"].fn(spark, sf_dir).orderBy("component").collect()
    )
    v = np.array([r["loading"] for r in rows])
    lam = rows[0]["rayleigh_g"]
    # rebuild the exact Gram matrix independently
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    X = np.array(
        [
            r[0]
            for r in con.execute(
                "SELECT list_transform(embedding, x -> "
                "CAST(floor(CAST(x AS DOUBLE)*1024) AS BIGINT)) "
                "FROM embeddings ORDER BY vec_id"
            ).fetchall()
        ],
        dtype=np.int64,
    )
    n = len(X)
    Y = n * X - X.sum(axis=0)
    G = (Y.T @ Y).astype(float)
    evals, evecs = np.linalg.eigh(G)
    top = evecs[:, -1]
    align = abs(float(v @ top)) / float(np.linalg.norm(v))
    assert align > 1 - 1e-6
    assert abs(lam - evals[-1]) / evals[-1] < 1e-9


def test_logreg_exact_learns(spark, sf_dir):
    """q_ml_logreg_exact: the integer GD fit actually LEARNS — train
    accuracy far above the majority class on the linearly-learnable
    label, and the weight on the predictive feature dominates."""
    from spark_ml_pipelines_example_spark.queries.registry import REGISTRY

    rows = REGISTRY["q_ml_logreg_exact"].fn(spark, sf_dir).collect()
    n = sum(r["n_customers"] for r in rows)
    correct = sum(r["n_correct"] for r in rows)
    assert correct / n > 0.98  # ~majority class is <0.92 on this fixture
    w1 = rows[0]["w1"]
    assert w1 > 0 and abs(w1) > abs(rows[0]["w2"])  # acctbal drives the label


def test_tree_stump_exact_is_best_split(spark, sf_dir):
    """q_ml_tree_stump_exact: the rank-1 candidate truly minimizes
    weighted Gini among all candidates (recomputed brute-force from the
    same binned stats), and leaf predictions are the side majorities."""
    from spark_ml_pipelines_example_spark.queries.registry import REGISTRY

    rows = (
        REGISTRY["q_ml_tree_stump_exact"].fn(spark, sf_dir).orderBy("rank").collect()
    )
    assert len(rows) == 5
    best = rows[0]

    def ratio(r):
        a_l = r["pos_l"] ** 2 + (r["n_l"] - r["pos_l"]) ** 2
        a_r = r["pos_r"] ** 2 + (r["n_r"] - r["pos_r"]) ** 2
        return (a_l * r["n_r"] + a_r * r["n_l"]) / (r["n_l"] * r["n_r"])

    scores = [ratio(r) for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert best["pred_l"] == int(2 * best["pos_l"] >= best["n_l"])
    assert best["n_correct"] == max(best["pos_l"], best["n_l"] - best["pos_l"]) + max(
        best["pos_r"], best["n_r"] - best["pos_r"]
    )


def test_tree_depth2_children_refine_root(spark, sf_dir):
    """q_ml_tree_depth2_exact: three nodes; the children partition the
    root's sides (child totals equal root side totals) and the combined
    depth-2 train accuracy is at least the stump's."""
    from spark_ml_pipelines_example_spark.queries.registry import REGISTRY

    rows = {
        r["node"]: r
        for r in REGISTRY["q_ml_tree_depth2_exact"].fn(spark, sf_dir).collect()
    }
    assert set(rows) == {0, 1, 2}
    root, l, r = rows[0], rows[1], rows[2]
    assert l["n_l"] + l["n_r"] == root["n_l"]
    assert r["n_l"] + r["n_r"] == root["n_r"]
    assert l["pos_l"] + l["pos_r"] == root["pos_l"]
    assert r["pos_l"] + r["pos_r"] == root["pos_r"]
    assert l["n_correct"] + r["n_correct"] >= root["n_correct"]


def test_cv_stumps_exact_invariants(spark, sf_dir):
    """q_ml_cv_stumps_exact: one stump per fold; train+heldout totals
    reconstruct the full table; OOF accuracy is a real accuracy (between
    0 and 1, and consistent with the held-out totals)."""
    from spark_ml_pipelines_example_spark.queries.registry import REGISTRY

    rows = REGISTRY["q_ml_cv_stumps_exact"].fn(spark, sf_dir).collect()
    assert len(rows) == 3
    n_total = None
    for r in rows:
        train_n = r["n_l"] + r["n_r"]
        total = train_n + r["oof_n"]
        if n_total is None:
            n_total = total
        assert total == n_total  # every fold sees the same table
        assert 0 <= r["oof_correct"] <= r["oof_n"]


def test_conformal_marginal_coverage(spark, sf_dir):
    """q_ml_conformal_exact: split-conformal marginal coverage on the
    test fold is >= 1 - alpha (0.9) up to the finite-sample term, and
    prediction sets are between 1 and 2 labels on average."""
    from spark_ml_pipelines_example_spark.queries.registry import REGISTRY

    rows = REGISTRY["q_ml_conformal_exact"].fn(spark, sf_dir).collect()
    n = sum(r["n_test"] for r in rows)
    cov = sum(r["n_covered"] for r in rows) / n
    assert cov >= 0.88  # 0.9 target minus finite-sample slack
    avg_set = sum(r["sum_set_size"] for r in rows) / n
    assert 1.0 <= avg_set <= 2.0


def test_ridge_exact_matches_numpy(spark, sf_dir):
    """q_ml_ridge_exact: the integer-Cramer coefficients equal numpy's
    float ridge solve to rounding tolerance, and the fit is sensible
    (quantity coefficient positive — price grows with quantity)."""
    import numpy as np

    from spark_ml_pipelines_example_spark.queries.ml import RIDGE_LAMBDA
    from spark_ml_pipelines_example_spark.queries.registry import REGISTRY

    r = REGISTRY["q_ml_ridge_exact"].fn(spark, sf_dir).collect()[0]
    n, L = r["n_rows"], RIDGE_LAMBDA
    A = np.array(
        [
            [n + L, r["sum_x1"], r["sum_x2"]],
            [r["sum_x1"], r["sum_x1x1"] + L, r["sum_x1x2"]],
            [r["sum_x2"], r["sum_x1x2"], r["sum_x2x2"] + L],
        ],
        dtype=float,
    )
    b = np.array([r["sum_y"], r["sum_x1y"], r["sum_x2y"]], dtype=float)
    w = np.linalg.solve(A, b)
    assert abs(r["w0"] - w[0]) < 1e-4
    assert abs(r["w1"] - w[1]) < 1e-4
    assert abs(r["w2"] - w[2]) < 1e-4
    assert r["w1"] > 0


def test_persist_tracked_rejects_nondeterministic_plans(spark):
    """ADVICE r5: the releasable cache's docstring safety rule is now
    enforced at track time — an execution-dependent frame (RNG, mID,
    sampling) raises instead of silently corrupting on release+recompute."""
    import pytest
    from pyspark.sql import functions as F  # noqa: F811

    from spark_ml_pipelines_example_spark.operators._cache import (
        persist_tracked,
        release_tracked,
    )

    base = spark.range(10)
    for bad in (
        base.withColumn("r", F.rand(7)),
        base.withColumn("m", F.monotonically_increasing_id()),
        base.sample(0.5, seed=1),
    ):
        with pytest.raises(ValueError, match="nondeterministic"):
            persist_tracked(bad)
    # deterministic frames still track + release normally
    ok = persist_tracked(base.withColumn("v", F.col("id") * 2))
    assert ok.count() == 10
    assert release_tracked() == 1
