"""Differential tests: every declared SQL-oracled query, Spark vs DuckDB,
at sf0.001 (the driver runs the same comparison at sf0.01). Rows-only
queries are smoke-checked for non-failure and stable schema."""

from __future__ import annotations

import pytest

from spark_ml_pipelines_example_spark.queries.registry import load_all
from tests.conftest import compare_frames

REGISTRY = load_all()
SQL_ORACLED = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.mark.parametrize("name", SQL_ORACLED)
def test_oracle_match(name, spark, duck, sf_dir):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    compare_frames(df, duck, spec.oracle, name=name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(name, spark, sf_dir):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    rows = df.collect()
    assert rows is not None and len(df.columns) > 0
