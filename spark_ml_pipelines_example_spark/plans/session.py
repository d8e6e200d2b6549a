"""SparkSession factory tuned for this engine.

The reference creates bare sessions (``SparkSession.builder.getOrCreate()``,
reference ``TrainTestSplit.scala:64``) and makes no optimizer-relevant
choices at all (SURVEY §4.1). Here we pin the configuration that the whole
engine depends on:

- **AQE on** — runtime partition coalescing, skew-join splitting, dynamic
  broadcast decisions. At 100 TB this is what turns a static 200-partition
  plan into one sized by the actual shuffle statistics.
- **Arrow on** — vectorized pandas interchange for the few pandas-UDF
  operators (similarity kernel fallback, multimodal decode plumbing).
- **UTC session timezone** — required for oracle comparability (DuckDB
  timestamps are UTC-naive) and the only sane choice on a cluster.
- **Shuffle partitions ~ cores for local test/bench runs** — the 200
  default over-parallelizes small scale factors; on a real cluster this is
  superseded by AQE coalescing + `spark.sql.adaptive.advisoryPartitionSizeInBytes`.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "spark_ml_pipelines_example_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Local-mode defaults come from env: ``SPARK_GRAFT_CPUS`` (threads) and
    ``SPARK_GRAFT_SHUFFLE`` (shuffle partitions). On a real cluster, pass
    ``master=None`` with externally-managed spark-submit conf; everything
    set here is still correct at scale because AQE re-plans partition
    counts at runtime.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects
        # outright; read it as epoch-nanos LONG and convert in the loader.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Files: pack small test files into few tasks; at 100 TB the same
        # setting yields ~128MB splits which is the right scan granularity.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _silence_bounded_window_warnings(spark)
    return spark


def _silence_bounded_window_warnings(spark: SparkSession) -> None:
    """Raise the WindowExec logger to ERROR: every unpartitioned window in
    the engine runs over a provably bounded frame (≤1024-row bin frames,
    ≤10 deciles, top-K limits — enforced by tests/test_plan_lint.py's
    no-catalog-frame-global-window lint), so the per-query 'No Partition
    Defined for Window operation' warning is noise that buries real
    regressions in bench logs (VERDICT r4 #7)."""
    try:
        jvm = spark.sparkContext._jvm
        for cls in (
            "org.apache.spark.sql.execution.window.WindowExec",
            "org.apache.spark.sql.execution.window.WindowGroupLimitExec",
        ):
            jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
                cls, jvm.org.apache.logging.log4j.Level.ERROR
            )
    except Exception:
        pass  # non-log4j2 deployments keep their own logging config
