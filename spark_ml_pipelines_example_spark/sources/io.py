"""Readers and writers (reference operators R1-R3, SURVEY §2.1).

- Parquet scan (reference ``no_pipeline/ModelFit.scala:84``) →
  ``spark.read.parquet`` so Catalyst gets predicate pushdown + column
  pruning against the columnar footers for free.
- CSV scan with an enforced StructType (reference ``TrainTestSplit.scala:67``)
  → ``spark.read.schema(s).csv`` (no inference scan).
- Parquet sink with save-mode mapping (reference ``package.scala:31-36``
  ``makeSaveMode``: overwrite → SaveMode.Overwrite else ErrorIfExists).

Scale posture: writes take an optional ``partition_by`` (hive-style layout
→ partition pruning downstream) and an optional small-file coalesce. We
never hard-code ``repartition(1)`` the way the reference's predict jobs do
(``pipeline/Predict.scala:60`` — full shuffle to one task; SURVEY §4.3.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .schemas import TABLE_SCHEMAS


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. Plain parquet read: the embedded footer
    schema is authoritative (matches TABLE_SCHEMAS modulo parquet
    physical types), and an explicit .schema() on parquet would disable
    nothing useful while risking int32/int64 physical-type mismatches."""
    if name not in TABLE_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {sorted(TABLE_SCHEMAS)}")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read as epoch-nanos long (see session.py); floor
        # to µs exactly like DuckDB's ns→µs cast. Integer `div` — a double
        # division would lose precision above 2^53 ns (~mid-1970s).
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def read_csv_with_schema(spark: SparkSession, path: str, table: str) -> DataFrame:
    """CSV scan with enforced schema — reference R1 (`TrainTestSplit.scala:67`)."""
    return spark.read.schema(TABLE_SCHEMAS[table]).csv(path)


def make_save_mode(overwrite: bool) -> str:
    """Boolean → save-mode string, mirroring reference ``package.scala:31-36``."""
    return "overwrite" if overwrite else "errorifexists"


def write_parquet(
    df: DataFrame,
    path: str,
    overwrite: bool = True,
    partition_by: list[str] | None = None,
    target_files: int | None = None,
) -> None:
    """Parquet sink — reference R3 (`no_pipeline/Predict.scala:96`).

    ``target_files`` uses coalesce (no shuffle), only when the caller
    explicitly wants small-file control; default keeps Spark's natural
    output parallelism, which is what you want for a 1000-executor write.
    """
    if target_files is not None:
        df = df.coalesce(target_files)
    writer = df.write.mode(make_save_mode(overwrite))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
