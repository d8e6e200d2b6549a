"""Physical-layout helper tests: partition pruning is visible in the scan,
bucketed joins plan zero exchanges, and salted operators return exactly
the unsalted results."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from spark_ml_pipelines_example_spark.queries._util import scratch_dir
from spark_ml_pipelines_example_spark.sources import layout


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_partitioned_write_prunes(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = scratch_dir("layout_partitioned", sf_dir)
    layout.write_partitioned(docs, path, ["lang"])
    back = spark.read.parquet(path).filter(F.col("lang") == "en")
    plan = _formatted_plan(back)
    assert "PartitionFilters: [" in plan and "lang" in plan.split("PartitionFilters:")[1].split("]")[0]
    assert back.count() == docs.filter(F.col("lang") == "en").count()


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Both sides bucketed on the join key: the join must plan without any
    Exchange — the write-time bucketing pre-paid the shuffle."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    for tbl in ("t_docs_b", "t_emb_b"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(scratch_dir(f"layout_{tbl}", sf_dir), ignore_errors=True)
    layout.write_bucketed(
        docs, "t_docs_b", ["doc_id"], num_buckets=8, sort_cols=["doc_id"],
        path=scratch_dir("layout_t_docs_b", sf_dir),
    )
    layout.write_bucketed(
        emb.withColumnRenamed("vec_id", "doc_id"), "t_emb_b", ["doc_id"],
        num_buckets=8, sort_cols=["doc_id"], path=scratch_dir("layout_t_emb_b", sf_dir),
    )
    a = spark.table("t_docs_b")
    b = spark.table("t_emb_b")
    joined = a.join(b.hint("merge"), "doc_id").select("doc_id", "lang", "label")
    plan = _formatted_plan(joined)
    assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
    assert joined.count() == docs.join(emb, docs.doc_id == emb.vec_id).count()


def test_salted_groupby_matches_plain(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plain = {
        (r.l_returnflag, r.l_linestatus): (r.n, float(r.qty))
        for r in li.groupBy("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"))
        .collect()
    }
    salted = {
        (r.l_returnflag, r.l_linestatus): (r.n, float(r.qty))
        for r in layout.salted_groupby_agg(
            li,
            ["l_returnflag", "l_linestatus"],
            {
                "n": (F.count("*"), F.sum),
                "qty": (F.sum(F.col("l_quantity").cast("decimal(18,2)")), F.sum),
            },
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    plain = orders.join(cust.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey")
    salted = layout.salted_broadcast_join(
        orders, cust.withColumnRenamed("c_custkey", "o_custkey"), ["o_custkey"], n_salts=8
    )
    assert salted.count() == plain.count()
    key = lambda r: (r.o_orderkey, r.c_name)
    assert sorted(map(key, salted.select("o_orderkey", "c_name").collect())) == sorted(
        map(key, plain.select("o_orderkey", "c_name").collect())
    )


def test_single_file_output_plans_coalesce_not_shuffle(spark, sf_dir):
    df = layout.single_file_output(spark.read.parquet(f"{sf_dir}/nation.parquet"))
    plan = _formatted_plan(df)
    assert "Coalesce" in plan
    assert "Exchange" not in plan


def test_zorder_tightens_both_dims(spark, sf_dir, tmp_path):
    """The point of Z-ordering: per-file parquet min/max stats must be
    selective in BOTH dimensions. Measure footer stats directly: the mean
    fraction of each key's domain covered per file must shrink vs the
    natural (unsorted) layout in both columns at once — a single-column
    sort can only achieve this for one."""
    import glob as _glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from spark_ml_pipelines_example_spark.sources.layout import write_zordered

    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_partkey", "l_suppkey")
    )
    dom = li.agg(
        F.min("l_partkey"), F.max("l_partkey"), F.min("l_suppkey"), F.max("l_suppkey")
    ).head()
    pk_dom = max(1, dom[1] - dom[0])
    sk_dom = max(1, dom[3] - dom[2])

    z_path, n_path = str(tmp_path / "z"), str(tmp_path / "n")
    write_zordered(li, z_path, "l_partkey", "l_suppkey", n_files=16)
    li.repartition(16).write.parquet(n_path)  # natural: round-robin files

    def mean_span(path, col):
        spans = []
        for f in _glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                c = next(
                    md.row_group(rg).column(i)
                    for i in range(md.num_columns)
                    if md.row_group(rg).column(i).path_in_schema == col
                )
                st = c.statistics
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            spans.append(hi - lo)
        return sum(spans) / len(spans)

    z_pk = mean_span(z_path, "l_partkey") / pk_dom
    z_sk = mean_span(z_path, "l_suppkey") / sk_dom
    n_pk = mean_span(n_path, "l_partkey") / pk_dom
    n_sk = mean_span(n_path, "l_suppkey") / sk_dom
    # natural files span ~the whole domain in both dims; z-ordered files
    # must cover meaningfully less of BOTH (the 2-D skipping guarantee)
    assert n_pk > 0.9 and n_sk > 0.9, (n_pk, n_sk)
    assert z_pk < 0.6 and z_sk < 0.6, f"zorder not clustering: pk={z_pk} sk={z_sk}"
    assert z_pk * z_sk < 0.25 * n_pk * n_sk
