"""Batch ≡ streaming equivalence (SURVEY §5.2.4): the Structured Streaming
twins must produce exactly the batch queries' rows, plus a watermark
state-bounding smoke check."""

from __future__ import annotations

import pytest

from spark_ml_pipelines_example_spark.queries.registry import load_all
from spark_ml_pipelines_example_spark.streaming import jobs as sjobs

REGISTRY = load_all()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize(
    "batch_name,streaming_fn",
    [
        ("q_stream_tumbling", sjobs.streaming_tumbling),
        ("q_stream_sliding", sjobs.streaming_sliding),
        ("q_stream_session", sjobs.streaming_session),
        ("q_stream_late_dedup", sjobs.streaming_dedup),
    ],
)
def test_streaming_equals_batch(spark, sf_dir, batch_name, streaming_fn):
    batch = REGISTRY[batch_name].fn(spark, sf_dir)
    stream = streaming_fn(spark, sf_dir)
    assert sorted(batch.columns) == sorted(stream.columns)
    assert _rows(batch.select(*sorted(batch.columns))) == _rows(
        stream.select(*sorted(batch.columns))
    )


def test_watermark_bounds_state(spark, sf_dir):
    """Append-mode tumbling agg with a watermark: finalized windows emit,
    and the watermark column survives the plan (state eviction armed)."""
    from pyspark.sql import functions as F

    ev = sjobs.read_events_stream(spark, sf_dir).withWatermark("ts", "30 minutes")
    agg = ev.groupBy(F.window("ts", "1 hour").alias("w")).count()
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("SELECT * FROM wm_out")
    # availableNow advances the watermark to max(ts)-30min at the final
    # micro-batch; every window ending before that must have been emitted.
    assert out.count() > 0
