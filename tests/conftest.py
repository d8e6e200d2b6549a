"""Shared fixtures: one SparkSession per test session, a DuckDB connection
with the fixture tables registered as views, and the differential-compare
helper that mimics the driver's row-count + schema + order-insensitive
value check (``__spark_entry__.py`` contract)."""

from __future__ import annotations

import math
import os
from decimal import Decimal

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "8")  # small SF → few partitions
    from spark_ml_pipelines_example_spark.plans.session import get_spark

    s = get_spark(app_name="tests")
    yield s


@pytest.fixture(autouse=True)
def _release_tracked_persists():
    """Unpersist operator-tracked intermediates after every test (ADVICE
    r4 leak fix, pytest side): without this, the ~1000-test session
    accumulates cache entries from every query that persists through
    operators/_cache.persist_tracked. Recompute after release is safe —
    every tracked frame is a deterministic function of its inputs (the
    one recompute-sensitive frame, q_shuffle_global's rk, uses
    localCheckpoint instead)."""
    yield
    from spark_ml_pipelines_example_spark.operators._cache import release_tracked

    release_tracked()


@pytest.fixture(scope="session")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon(v):
    """Canonicalize a cell for cross-engine comparison."""
    import datetime

    import numpy as np
    import pandas as pd

    if v is None or (isinstance(v, float) and math.isnan(v)):
        return ("null",)
    if isinstance(v, (np.floating, float)):
        return ("f", float(v))
    if isinstance(v, (np.integer, int, bool)):
        return ("i", int(v))
    if isinstance(v, Decimal):
        return ("d", str(v))
    if isinstance(v, (list, tuple, np.ndarray)):
        return ("l", tuple(_canon(x) for x in v))
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        # pandas renders DATE columns as midnight timestamps; fold to date
        if v.hour == 0 and v.minute == 0 and v.second == 0 and v.microsecond == 0:
            return ("t", v.strftime("%Y-%m-%d"))
        return ("t", str(v))
    if isinstance(v, datetime.date):
        return ("t", v.strftime("%Y-%m-%d"))
    return ("s", str(v))


def _sort_key(row):
    out = []
    for c in row:
        if c[0] == "f":
            out.append(("f", f"{c[1]:.6e}"))
        else:
            out.append(c)
    return repr(out)


def _cells_equal(a, b) -> bool:
    if a[0] != b[0]:
        # numeric-kind interop: an int cell vs a float cell (e.g. DuckDB
        # returns BIGINT where Spark returns double) compares by value
        if {a[0], b[0]} <= {"i", "f"}:
            return math.isclose(float(a[1]), float(b[1]), rel_tol=1e-9, abs_tol=1e-12)
        return False
    if a[0] == "f":
        x, y = a[1], b[1]
        if math.isnan(x) and math.isnan(y):
            return True
        return math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-12)
    if a[0] == "l":
        return len(a[1]) == len(b[1]) and all(
            _cells_equal(x, y) for x, y in zip(a[1], b[1])
        )
    return a == b


def compare_frames(spark_df, duck_con, sql, name=""):
    """Differential check: row count, column names, canonicalized values."""
    spdf = spark_df.toPandas()
    ddf = duck_con.execute(sql).fetchdf()

    s_cols, d_cols = sorted(spdf.columns), sorted(ddf.columns)
    assert s_cols == d_cols, f"{name}: column mismatch spark={s_cols} duck={d_cols}"
    assert len(spdf) == len(ddf), f"{name}: row count spark={len(spdf)} duck={len(ddf)}"

    s_rows = sorted(
        (tuple(_canon(v) for v in row) for row in spdf[s_cols].itertuples(index=False)),
        key=_sort_key,
    )
    d_rows = sorted(
        (tuple(_canon(v) for v in row) for row in ddf[d_cols].itertuples(index=False)),
        key=_sort_key,
    )
    bad = []
    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        if not all(_cells_equal(a, b) for a, b in zip(sr, dr)):
            bad.append((i, sr, dr))
            if len(bad) >= 5:
                break
    assert not bad, f"{name}: {len(bad)}+ mismatched rows (cols {s_cols}); first: {bad[:2]}"
