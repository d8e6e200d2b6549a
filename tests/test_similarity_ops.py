"""ANN scale-path and multimodal-plumbing operator tests (rows-only
surface — not oracle-checkable, so correctness is asserted against the
engine's own brute-force baseline / determinism properties)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_ml_pipelines_example_spark.operators import multimodal as mm
from spark_ml_pipelines_example_spark.operators import similarity as sim
from spark_ml_pipelines_example_spark.queries.registry import load_all

REGISTRY = load_all()


def test_ann_ivf_recall_vs_brute_force(spark, sf_dir):
    """IVF scans 4/16 cells; the probe's own cell always ranks first, so
    near neighbors (which cluster with the probe) should dominate the
    true top-10. Require recall@10 ≥ 0.5 on the near-orthogonal fixture
    vectors (a hard case for IVF: neighbors barely cluster)."""
    brute = REGISTRY["q_sim_cosine_topk"].fn(spark, sf_dir)
    ann = sim.ann_ivf_topk(spark, sf_dir)
    truth = {r.vec_id for r in brute.collect()}
    got = {r.vec_id for r in ann.collect()}
    assert len(got) == 10
    assert len(truth & got) / len(truth) >= 0.5


def test_materialized_ivf_index_partition_prunes(spark, sf_dir, tmp_path):
    """The production IVF layout: corpus written partitionBy('cell'), probe
    answered by a partition-pruned scan. The plan must show the cell filter
    satisfied as PartitionFilters (directory listing), NOT a data filter
    over a full scan — and results must equal the in-memory-index path."""
    import re

    index_dir = str(tmp_path / "ivf_index")
    sim.materialize_ivf_index(spark, sf_dir, index_dir)

    pruned = sim.ann_ivf_topk_from_index(spark, index_dir, probe_vec_id=0)
    plan = pruned._sc._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted"
    )
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1), f"cell filter not partition-pruned:\n{plan}"

    base = sim.ann_ivf_topk(spark, sf_dir, probe_vec_id=0)
    assert [(r.vec_id, r.cos_sim) for r in pruned.collect()] == [
        (r.vec_id, r.cos_sim) for r in base.collect()
    ]


def test_pandas_kernel_matches_catalyst_kernel(spark, sf_dir):
    """The Arrow/NumPy cosine and the zip_with/aggregate cosine must agree
    to rounding on every corpus vector."""
    catalyst = sim.ann_ivf_topk(spark, sf_dir, use_pandas_kernel=False)
    arrow = sim.ann_ivf_topk(spark, sf_dir, use_pandas_kernel=True)
    a = {(r.vec_id, r.cos_sim) for r in catalyst.collect()}
    b = {(r.vec_id, r.cos_sim) for r in arrow.collect()}
    assert {v for v, _ in a} == {v for v, _ in b}
    ca = dict(a)
    for v, c in b:
        assert ca[v] == pytest.approx(c, abs=1e-5)


def test_multimodal_payload_schema(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    wp = mm.attach_payload(docs)
    assert dict(wp.dtypes)["payload"] == "binary"
    meta_fields = {f.name for f in wp.schema["media_meta"].dataType.fields}
    assert meta_fields == {"modality", "n_bytes", "width", "height"}
    mods = {r.m for r in wp.select(F.col("media_meta.modality").alias("m")).distinct().collect()}
    assert mods == set(mm.MODALITIES)


def test_multimodal_decode_deterministic_across_partitioning(spark, sf_dir):
    """The fake decoder is a pure function of the payload bytes, so the
    decoded features must be identical however the input is partitioned
    (the property a real decoder must also hold at scale)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    one = mm.decode_features(mm.attach_payload(docs.coalesce(1)))
    many = mm.decode_features(mm.attach_payload(docs.repartition(7, "doc_id")))
    rows_one = {r.doc_id: (r.modality, r.n_bytes, tuple(r.feature)) for r in one.collect()}
    rows_many = {r.doc_id: (r.modality, r.n_bytes, tuple(r.feature)) for r in many.collect()}
    assert rows_one == rows_many
    feat = next(iter(rows_one.values()))[2]
    assert len(feat) == mm.FEATURE_DIM
    assert abs(sum(feat) - 1.0) < 1e-6  # normalized histogram folds to mass 1


def test_multimodal_frame_sampling_shape(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    frames = mm.sample_frames(mm.attach_payload(docs), every_n=4, frame_bytes=8)
    sample = frames.limit(50).collect()
    assert sample, "video rows must produce frames"
    for r in sample:
        assert r.frame_idx >= 0
        assert 1 <= len(r.frame_bytes) <= 8


def test_real_decoders_are_marked_stubs():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\xff\xd8")
    with pytest.raises(NotImplementedError):
        mm.decode_audio(b"RIFF")


def test_knn_join_matches_brute_force_for_probe0(spark, sf_dir):
    """q_sim_knn_all's query_id=0 rows must equal the brute-force
    q_sim_cosine_topk head (same corpus, same tie-break), proving the
    per-partition GEMM + local-top-k pre-prune loses no global winner."""
    knn = {
        r["rnk"]: (r["neighbor_id"], r["cos_sim"])
        for r in REGISTRY["q_sim_knn_all"].fn(spark, sf_dir).collect()
        if r["query_id"] == 0
    }
    brute = REGISTRY["q_sim_cosine_topk"].fn(spark, sf_dir).collect()
    assert len(knn) == 5
    for i, r in enumerate(brute[:5], start=1):
        assert knn[i][0] == r["vec_id"]
        assert abs(knn[i][1] - r["cos_sim"]) < 1e-9


def test_phash_clusters_cover_exact_payload_dups(spark, sf_dir):
    """Docs with byte-identical payloads MUST land in the same phash
    cluster (signature is a pure function of the bytes), so the
    phash-duplicate doc set is a superset of exact-text duplicates."""
    from pyspark.sql import functions as F

    from spark_ml_pipelines_example_spark.queries.registry import load_all

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = (
        d.groupBy(F.md5(F.col("text")).alias("h"))
        .agg(F.count("*").alias("n"), F.sum("doc_id").alias("id_sum"))
        .filter(F.col("n") >= 2)
    )
    exact_docs = exact.agg(F.sum("n")).collect()[0][0] or 0
    clusters = load_all()["q_multimodal_phash"].fn(spark, sf_dir)
    phash_docs = clusters.agg(F.sum("n_copies")).collect()[0][0] or 0
    assert phash_docs >= exact_docs
    # determinism across invocations (pure function of bytes)
    again = load_all()["q_multimodal_phash"].fn(spark, sf_dir)
    assert sorted((r.asDict() for r in clusters.collect()), key=lambda d: d["phash"]) == sorted(
        (r.asDict() for r in again.collect()), key=lambda d: d["phash"]
    )


def test_bmp_codec_roundtrip():
    """Real BMP encode→decode must reproduce pixels exactly, for both
    4-byte-aligned and padded row widths."""
    import numpy as np

    rng = np.random.RandomState(7)
    for h, w in [(13, 21), (16, 16), (1, 1), (9, 3)]:
        img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        got = mm.decode_image(mm.encode_bmp(img))
        assert np.array_equal(got, img), f"BMP roundtrip failed at {h}x{w}"


def test_wav_codec_roundtrip():
    import numpy as np

    rng = np.random.RandomState(11)
    s = rng.randint(-32768, 32767, 2048).astype(np.int16)
    assert np.array_equal(mm.decode_audio(mm.encode_wav(s)), s)


def test_unknown_containers_raise():
    """Compressed formats must raise, not silently mis-decode."""
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG\r\n\x1a\n....")
    with _pytest.raises(NotImplementedError):
        mm.decode_audio(b"ID3\x04\x00......")


def test_decode_features_uses_real_codecs(spark, sf_dir):
    """The rendered pipeline must route image rows through the BMP
    decoder and audio rows through the WAV decoder: feature semantics
    differ per modality (dims/channel stats vs level/dynamics), and
    results stay deterministic across partitionings."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60)
    wp = mm.render_media_payloads(mm.attach_payload(docs))
    out = mm.decode_features(wp).collect()
    by_mod = {}
    for r in out:
        by_mod.setdefault(r.modality, []).append(r.feature)
    # image f0/f1 are h/1024, w/1024 of the rendered thumbs: tiny, positive
    assert all(0 < f[0] < 0.05 and 0 < f[1] < 0.05 for f in by_mod["image"])
    # audio features include zero-crossing rate in [0, 1]
    assert all(0.0 <= f[4] <= 1.0 for f in by_mod["audio"])
    again = mm.decode_features(
        mm.render_media_payloads(mm.attach_payload(docs.repartition(7, "doc_id")))
    ).collect()
    assert sorted(map(str, out)) == sorted(map(str, again))


def test_soft_assign_degenerate_zero_centroid(spark):
    """ADVICE r5: an all-zero centroid must rank LAST (ss==0 -> -inf, the
    rank_cells_audited convention), never emit NaN/inf rankings out of a
    0-division — so the numpy, Spark-expression, and DuckDB rankers can
    never disagree on the degenerate edge."""
    import numpy as np

    from spark_ml_pipelines_example_spark.operators.similarity import (
        soft_assign_audited,
    )

    dim = 4
    # cell 0 is degenerate (all-zero sum); cells 1..3 are unit axes
    cents = [(0, [0] * dim, 1)] + [
        (c, [1000 if j == c else 0 for j in range(dim)], 1) for c in (1, 2, 3)
    ]
    vecs = spark.createDataFrame(
        [(i, [10 * (i + 1) if j == i % dim else 1 for j in range(dim)]) for i in range(8)],
        "vec_id long, xq array<long>",
    )
    out = soft_assign_audited(vecs, cents, n_assign=3).toPandas()
    # top-3 of 4 cells: the -inf zero cell is always the one left out
    assert set(out["cell"]) <= {1, 2, 3}
    assert not out.isna().any().any()
    assert len(out) == 8 * 3
    # and with n_assign = k the zero cell appears but ranks last: taking
    # all 4 cells keeps determinism (stable argsort over -inf)
    full = soft_assign_audited(vecs, cents, n_assign=4).toPandas()
    assert len(full) == 8 * 4
    assert np.isfinite(full["cell"]).all()


def test_knn_classifier_ivf_recall_floor_vs_exact_twin(spark, sf_dir):
    """VERDICT r8 #5: the IVF-routed kNN classifier must stay an honest
    stand-in for the exact (quadratic) audit twin. Pin (a) the probe
    population is IDENTICAL — per-class probe counts equal the exact
    twin's (routing changes neighbors, never the held-out set) — and
    (b) per-probe neighbor recall@K of the IVF candidate path vs the
    exact top-K is ≥ 0.6 on the near-orthogonal fixture (measured 0.77
    at sf0.001 / 0.81 at sf0.01 with nprobe 6/16 — the worst case for
    IVF; clustered real embeddings sit far above it)."""
    from pyspark.sql import Window as W

    from spark_ml_pipelines_example_spark.functions.similarity import (
        cosine_prenorm,
        l2_norm,
    )
    from spark_ml_pipelines_example_spark.queries._util import t
    from spark_ml_pipelines_example_spark.queries.ml import KNN_K, KNN_PROBE_MOD

    exact_df = REGISTRY["q_ml_knn_classifier"].fn(spark, sf_dir)
    ivf_df = REGISTRY["q_ml_knn_classifier_ivf"].fn(spark, sf_dir)
    exact_counts = {r.true_label: r.n_probes for r in exact_df.collect()}
    ivf_counts = {r.true_label: r.n_probes for r in ivf_df.collect()}
    assert ivf_counts == exact_counts

    e = t(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") % KNN_PROBE_MOD == 0).select(
        F.col("vec_id").alias("pid"),
        F.col("embedding").alias("pe"),
        l2_norm("embedding").alias("pn"),
    )
    corpus = e.filter(F.col("vec_id") % KNN_PROBE_MOD != 0).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("ce"),
        l2_norm("embedding").alias("cn"),
    )
    pairs = corpus.crossJoin(F.broadcast(probes)).select(
        "pid",
        "cid",
        cosine_prenorm(F.col("pe"), F.col("ce"), F.col("pn"), F.col("cn")).alias("cos"),
    )
    wk = W.partitionBy("pid").orderBy(F.col("cos").desc(), "cid")
    exact_nb = {
        (r.pid, r.cid)
        for r in pairs.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= KNN_K)
        .select("pid", "cid")
        .collect()
    }

    assigned, cents = sim._ivf_index_for(spark, sf_dir)
    cdf = spark.createDataFrame(
        [(int(c), [int(v) for v in s], int(sum(v * v for v in s))) for (c, s, _n) in cents],
        "cc long, s array<long>, ss long",
    )
    is_probe = (F.col("vec_id") % KNN_PROBE_MOD == 0) & (
        F.col("vec_id") < sim.PROBE_ID_CAP
    )
    p2 = assigned.filter(is_probe).select(
        F.col("vec_id").alias("pid"),
        F.col("embedding").alias("pe"),
        l2_norm("embedding").alias("pn"),
        "xq",
    )
    c2 = assigned.filter(~is_probe).select(
        "cell",
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("ce"),
        l2_norm("embedding").alias("cn"),
    )
    dot = F.aggregate(
        F.zip_with("xq", "s", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    pc = (
        p2.select("pid", "xq")
        .crossJoin(F.broadcast(cdf))
        .select(
            "pid",
            F.col("cc").alias("cell"),
            (dot.cast("double") / F.sqrt(F.col("ss").cast("double"))).alias("r"),
        )
        .withColumn(
            "rk", F.row_number().over(W.partitionBy("pid").orderBy(F.col("r").desc(), "cell"))
        )
        .filter(F.col("rk") <= sim.N_PROBE)
        .select("pid", "cell")
    )
    ip = c2.join(F.broadcast(pc.join(p2.drop("xq"), "pid")), "cell").select(
        "pid",
        "cid",
        cosine_prenorm(F.col("pe"), F.col("ce"), F.col("pn"), F.col("cn")).alias("cos"),
    )
    ivf_nb = {
        (r.pid, r.cid)
        for r in ip.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= KNN_K)
        .select("pid", "cid")
        .collect()
    }
    recall = len(exact_nb & ivf_nb) / len(exact_nb)
    assert recall >= 0.6, f"IVF kNN neighbor recall {recall:.3f} below floor"
