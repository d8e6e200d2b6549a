"""The events fixture's timestamp column has changed physical type across
driver rounds: round 1 shipped INT64 TIMESTAMP(NANOS) parquet (which Spark 4
rejects on a vanilla session with PARQUET_TYPE_ILLEGAL), round 2 ships
timestamp[us] naive (which Spark reads natively as TIMESTAMP_NTZ).
load_table must be self-sufficient on the *driver's* vanilla session for
both: r1 failed q_fn_timestamp / q_fn_json / q_join_asof_event exactly this
way."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from spark_ml_pipelines_example_spark.sources.io import (
    _NANOS_CONF,
    _rewrite_ns_parquet_to_us,
    load_table,
)


def test_load_table_is_session_self_sufficient(spark, sf_dir):
    """Simulate the driver's vanilla session: force the conf off, then load.
    Whatever the fixture's physical unit, ts must come back as a timestamp
    type (NTZ for the µs/naive fixture — DuckDB-naive semantics — or
    TIMESTAMP via the ns→µs conversion for a nanos fixture)."""
    spark.conf.set(_NANOS_CONF, "false")
    try:
        df = load_table(spark, sf_dir, "events")
        assert dict(df.dtypes)["ts"] in ("timestamp", "timestamp_ntz")
        assert df.count() > 0
        # loader re-arms the conf + pins UTC so epoch projections are
        # deterministic under any harness JVM timezone
        assert spark.conf.get(_NANOS_CONF) == "true"
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set(_NANOS_CONF, "true")


def test_pyarrow_rewrite_fallback(tmp_path, sf_dir):
    """The conf-rejected fallback: cached ns→µs rewrite, atomic + idempotent.
    The live fixture is already µs, so build a genuine ns file to exercise
    the conversion."""
    ns_path = str(tmp_path / "events_ns.parquet")
    src = pq.read_table(f"{sf_dir}/events.parquet")
    ts_idx = src.schema.get_field_index("ts")
    ns_field = pa.field("ts", pa.timestamp("ns"))
    ns_tbl = src.set_column(ts_idx, ns_field, src.column("ts").cast(pa.timestamp("ns")))
    pq.write_table(ns_tbl, ns_path)

    out = _rewrite_ns_parquet_to_us(ns_path)
    schema = pq.read_schema(out)
    assert str(schema.field("ts").type).startswith("timestamp[us")
    assert out == _rewrite_ns_parquet_to_us(ns_path)  # cached

    # values survive the ns→µs floor exactly (fixture values are µs-aligned)
    assert pq.read_table(out).column("ts").cast(pa.timestamp("us")).equals(
        src.column("ts").cast(pa.timestamp("us"))
    )


def test_native_read_matches_duckdb_naive(spark, sf_dir, duck):
    """The µs fixture path: Spark's epoch projection of ts (NTZ, UTC
    session) must equal DuckDB's epoch(naive) — the exact contract every
    events oracle relies on."""
    from pyspark.sql import functions as F

    got = (
        load_table(spark, sf_dir, "events")
        .select(F.min(F.unix_timestamp("ts")).alias("lo"))
        .collect()[0]["lo"]
    )
    # date_trunc before epoch: unix_timestamp floors to the second, while
    # DuckDB's double→bigint cast rounds — the same discipline every events
    # oracle in the registry uses
    want = duck.execute(
        "SELECT CAST(epoch(date_trunc('second', MIN(ts))) AS BIGINT) FROM events"
    ).fetchone()[0]
    assert got == want


def test_table_memo_dies_with_its_session(spark, sf_dir):
    """ADVICE r5: the per-session table memo must not outlive its session
    — it rides the session object (no process-global registry), so a
    GC'd session takes its resolved frames and JVM handles with it."""
    from spark_ml_pipelines_example_spark.sources import io as io_mod
    from spark_ml_pipelines_example_spark.sources.io import _MEMO_ATTR, load_table

    d1 = load_table(spark, sf_dir, "region")
    assert load_table(spark, sf_dir, "region") is d1  # memo hit
    memo = getattr(spark, _MEMO_ATTR)
    assert (sf_dir.rstrip("/"), "region") in memo
    # no module-level registry may anchor sessions or frames
    for attr, val in vars(io_mod).items():
        assert not isinstance(val, dict) or attr in ("TABLE_SCHEMAS", "__builtins__"), (
            f"unexpected module-global dict {attr} could anchor session state"
        )
