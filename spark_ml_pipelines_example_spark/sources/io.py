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

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession

from .schemas import TABLE_SCHEMAS

_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"
_SCRATCH_ROOT = "/root/repo/.scratch/parquet_us"


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def _rewrite_ns_parquet_to_us(path: str) -> str:
    """One-time pyarrow rewrite of a TIMESTAMP(NANOS) parquet file to µs
    precision under a deterministic scratch path. Only the fallback when the
    caller's session rejects the nanosAsLong SQLConf (e.g. it was made
    static); the fixture files are small enough (events ≤ sf0.1) that a
    single local rewrite is cheap, and the result is cached by content path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tag = hashlib.sha1(os.path.realpath(path).encode()).hexdigest()[:16]
    out = f"{_SCRATCH_ROOT}/{tag}.parquet"
    if not os.path.exists(out):
        os.makedirs(_SCRATCH_ROOT, exist_ok=True)
        tbl = pq.read_table(path)
        fields = []
        for f in tbl.schema:
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns":
                fields.append(pa.field(f.name, pa.timestamp("us", tz=f.type.tz)))
            else:
                fields.append(f)
        tmp = f"{out}.tmp-{os.getpid()}"
        # safe=False permits the lossy ns→µs truncation; for the fixture's
        # post-1970 timestamps that is the same floor the conf path applies.
        pq.write_table(tbl.cast(pa.schema(fields), safe=False), tmp)
        os.replace(tmp, out)  # atomic: concurrent loaders see old-or-new, never partial
    return out


# Per-session memo of loaded fixture tables. Spark 4 runs a 1-task
# footer-read job on EVERY spark.read.parquet call; reusing the resolved
# DataFrame makes repeat loads (and therefore most queries' construction)
# job-free — one footer job per (session, sf_dir, table). DataFrames are
# immutable and the fixture dirs are read-only, so reuse is safe.
#
# ADVICE r5: the memo now lives ON the session object (a private
# attribute), so its lifetime — and the lifetime of every resolved
# DataFrame/JVM handle in it — is exactly the session's: restarted
# sessions carry their entries to the grave instead of accumulating in
# a process-global map. (A WeakKeyDictionary cannot do this: the memo's
# DataFrame values strongly reference their session, a key-in-value
# cycle that pins the weak key forever.) No id()-reuse trap either —
# the attribute rides the object. CONTRACT for new read paths: the memo
# caches resolution-time state, so any conf-SENSITIVE read (one whose
# resolved frame depends on a session conf the caller may flip, like
# q_scan_agg_pushdown's pushdown toggles) must bypass load_table and
# read uncached.
_MEMO_ATTR = "_spark_graft_table_memo"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # the loader's conf side effects (UTC session tz, nanos conf) are
        # part of the contract — re-arm them even on a memo hit, since a
        # caller (or the driver) may have flipped them between loads
        _arm_events_confs(spark)
    per_session = getattr(spark, _MEMO_ATTR, None)
    if per_session is None:
        per_session = {}
        setattr(spark, _MEMO_ATTR, per_session)
    key = (sf_dir.rstrip("/"), name)
    df = per_session.get(key)
    if df is None:
        df = _load_table_uncached(spark, sf_dir, name)
        per_session[key] = df
    return df


def _arm_events_confs(spark: SparkSession) -> None:
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set(_NANOS_CONF, "true")
    except Exception:
        pass  # static-conf rejection → pyarrow fallback handles the read


def _load_table_uncached(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. Plain parquet read: the embedded footer
    schema is authoritative (matches TABLE_SCHEMAS modulo parquet
    physical types), and an explicit .schema() on parquet would disable
    nothing useful while risking int32/int64 physical-type mismatches.

    ``events.ts`` history: the round-1 fixture was parquet ``INT64
    TIMESTAMP(NANOS)``, which Spark 4 rejects outright
    (PARQUET_TYPE_ILLEGAL) on a vanilla session; the round-2 fixture is
    ``timestamp[us]`` (naive), which Spark reads natively as
    ``timestamp_ntz``. This loader is self-sufficient against both:

    - µs/naive file → native read; ``ts`` stays TIMESTAMP_NTZ, which is
      exactly DuckDB's naive-TIMESTAMP semantics (no session-tz coupling
      in the stored values).
    - ns file → set the runtime SQLConf
      ``spark.sql.legacy.parquet.nanosAsLong=true`` on the *caller's*
      session, read ts as epoch-nanos LONG, floor to µs; pyarrow-rewrite
      fallback if the conf is rejected.

    Either way the session timezone is pinned to UTC (runtime conf) so
    ``unix_timestamp(ntz)`` in our queries equals DuckDB ``epoch(naive)``
    even when the harness's JVM default timezone is not UTC."""
    if name not in TABLE_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {sorted(TABLE_SCHEMAS)}")
    path = table_path(sf_dir, name)
    if name != "events":
        return spark.read.parquet(path)

    _arm_events_confs(spark)
    try:
        df = spark.read.parquet(path)
    except Exception:
        df = spark.read.parquet(_rewrite_ns_parquet_to_us(path))
    if dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read as epoch-nanos long; floor to µs exactly
        # like DuckDB's ns→µs cast. Integer `div` — a double division would
        # lose precision above 2^53 ns (~mid-1970s).
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
