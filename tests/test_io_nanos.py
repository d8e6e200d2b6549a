"""The events fixture is INT64 TIMESTAMP(NANOS) parquet — Spark 4 rejects it
on a vanilla session (PARQUET_TYPE_ILLEGAL). load_table must be
self-sufficient on the *driver's* session, which does not carry our session
factory's confs (r1 failed q_fn_timestamp / q_fn_json / q_join_asof_event
exactly this way)."""

from __future__ import annotations

import pyarrow.parquet as pq

from spark_ml_pipelines_example_spark.sources.io import (
    _NANOS_CONF,
    _rewrite_ns_parquet_to_us,
    load_table,
)


def test_load_table_sets_nanos_conf_itself(spark, sf_dir):
    """Simulate the driver's vanilla session: force the conf off, then load."""
    spark.conf.set(_NANOS_CONF, "false")
    try:
        df = load_table(spark, sf_dir, "events")
        assert dict(df.dtypes)["ts"] == "timestamp"
        assert df.count() > 0
        assert spark.conf.get(_NANOS_CONF) == "true"
    finally:
        spark.conf.set(_NANOS_CONF, "true")


def test_pyarrow_rewrite_fallback(sf_dir):
    """The conf-rejected fallback: cached ns→µs rewrite, atomic + idempotent."""
    out = _rewrite_ns_parquet_to_us(f"{sf_dir}/events.parquet")
    schema = pq.read_schema(out)
    assert str(schema.field("ts").type).startswith("timestamp[us")
    assert out == _rewrite_ns_parquet_to_us(f"{sf_dir}/events.parquet")


def test_rewrite_matches_conf_path_values(spark, sf_dir):
    """Both paths floor ns→µs identically (conf path uses `ts div 1000`)."""
    from pyspark.sql import functions as F

    df_conf = load_table(spark, sf_dir, "events").select("event_id", "ts")
    rewritten = _rewrite_ns_parquet_to_us(f"{sf_dir}/events.parquet")
    df_arrow = spark.read.parquet(rewritten).select("event_id", "ts")
    mismatch = (
        df_conf.alias("a")
        .join(df_arrow.alias("b"), "event_id")
        .where(F.col("a.ts") != F.col("b.ts"))
        .count()
    )
    assert mismatch == 0
