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
