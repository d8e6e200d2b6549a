"""The driver-window auto-rotation (queries/registry.py
_rotate_for_driver) must keep its contract: the front of the registry is
always never-driver-checked SQL-oracled queries, nothing is lost or
duplicated, and the ordering is deterministic."""

from __future__ import annotations

from spark_ml_pipelines_example_spark.queries.registry import (
    REGISTRY,
    _driver_checked_queries,
    load_all,
)


def test_rotation_fronts_never_checked_sql():
    full = load_all()
    checked = _driver_checked_queries()
    names = list(full)
    n_never_sql = sum(
        1 for n, s in full.items() if n not in checked and s.oracle is not None
    )
    window = names[: min(50, n_never_sql)]
    assert all(n not in checked for n in window), "window wastes a checked slot"
    assert all(full[n].oracle is not None for n in window), "rows-only in window"


def test_rotation_is_a_permutation():
    full = load_all()
    assert set(full) == set(REGISTRY)
    assert len(full) == len(REGISTRY)


def test_rotation_deterministic():
    assert list(load_all()) == list(load_all())


def test_checked_set_reads_artifacts():
    checked = _driver_checked_queries()
    # rounds 1+2 recorded 96 distinct rows; future rounds only add
    assert len(checked) >= 96
