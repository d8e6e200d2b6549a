"""The driver-window auto-rotation (queries/registry.py
_rotate_for_driver) must keep its contract: the front of the registry is
always never-driver-checked SQL-oracled queries, nothing is lost or
duplicated, and the ordering is deterministic."""

from __future__ import annotations

from spark_ml_pipelines_example_spark.queries.registry import (
    _FORCE_RECHECK,
    _WINDOW_PIN,
    REGISTRY,
    _driver_checked_queries,
    _force_recheck_pending,
    load_all,
)


def test_rotation_fronts_never_checked_sql():
    full = load_all()
    checked = _driver_checked_queries() - _force_recheck_pending()
    names = list(full)
    n_never_sql = sum(
        1
        for n, s in full.items()
        if n not in checked and (s.oracle is not None or n in _WINDOW_PIN)
    )
    window = names[: min(50, n_never_sql)]
    assert all(n not in checked for n in window), "window wastes a checked slot"
    # rows-only entries may appear in the window only via the explicit pin
    assert all(
        full[n].oracle is not None or n in _WINDOW_PIN for n in window
    ), "unpinned rows-only in window"


def test_window_pin_lands_in_window():
    """VERDICT r4 #1: every pinned query that still lacks a valid driver
    row must land inside the ~50-query driver window."""
    full = load_all()
    checked = _driver_checked_queries() - _force_recheck_pending()
    names = list(full)
    unpinned_needed = [n for n in _WINDOW_PIN if n in full and n not in checked]
    window = set(names[:50])
    missing = [n for n in unpinned_needed if n not in window]
    assert not missing, f"pinned-but-outside-window: {missing}"


def test_rotation_is_a_permutation():
    full = load_all()
    assert set(full) == set(REGISTRY)
    assert len(full) == len(REGISTRY)


def test_rotation_deterministic():
    assert list(load_all()) == list(load_all())


def test_checked_set_reads_artifacts():
    checked = _driver_checked_queries()
    # rounds 1+2 recorded 96 distinct rows; 3 of those were rows-only
    # checks of queries that have since gained SQL oracles (they must
    # re-front), and future rounds only add
    assert len(checked) >= 93


def test_checked_requires_valid_row_and_fresh_oracle():
    """ADVICE r3 (medium): an artifact KEY alone must not count as
    checked. Errored rows never certify; a rows-only row stops
    certifying once the query gains a SQL oracle; a SQL row stops
    certifying if the declared oracle no longer matches the recorded
    fingerprint."""
    from spark_ml_pipelines_example_spark.queries.registry import (
        _checked_fingerprints,
        oracle_fingerprint,
    )

    load_all()
    checked = _driver_checked_queries()
    fps = _checked_fingerprints()
    # q_dedup_minhash / q_dedup_simhash / q_pack_ffd: their r1/r2 rows
    # were 'no_oracle' class and did NOT certify through rounds 3-4; the
    # r5 driver window recorded fresh hash-match rows against the current
    # oracles, so they certify now — but ONLY because the recorded
    # fingerprint matches the declared oracle today.
    for name in ("q_dedup_minhash", "q_dedup_simhash", "q_pack_ffd"):
        assert REGISTRY[name].oracle is not None
        assert fps.get(name) == oracle_fingerprint(REGISTRY[name])
        assert name in checked, f"{name} fresh r5 hash row should certify"
    # and the gate itself: any checked SQL-oracled query must carry a
    # matching fingerprint — a drifted oracle would silently launder an
    # old row otherwise.
    for name in checked:
        spec = REGISTRY[name]
        if spec.oracle is not None:
            assert fps.get(name) == oracle_fingerprint(spec), name


def test_fingerprint_tracks_oracle_text():
    from spark_ml_pipelines_example_spark.queries.registry import oracle_fingerprint

    spec = REGISTRY["q_tpch_q1"]
    fp = oracle_fingerprint(spec)
    assert fp != "rows-only" and len(fp) == 32
    # same oracle → same fingerprint; different oracle → different
    import dataclasses

    assert oracle_fingerprint(dataclasses.replace(spec)) == fp
    assert oracle_fingerprint(dataclasses.replace(spec, oracle=spec.oracle + " ")) != fp
    assert oracle_fingerprint(dataclasses.replace(spec, oracle=None)) == "rows-only"


def test_force_recheck_retires_on_fresh_row(tmp_path):
    """A fresh (round >= 5) good row retires the force-recheck — the trio
    must not re-front forever once the driver re-verifies them; pre-r5
    rows and errored rows must NOT retire it."""
    import json

    # no artifacts at all → everything still pending
    assert _force_recheck_pending(tmp_path) == _FORCE_RECHECK

    # a pre-r5 row does not retire (that IS the stale row)
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({"q_ml_pca": {"err": "no_oracle", "spark_rows": 8}})
    )
    assert _force_recheck_pending(tmp_path) == _FORCE_RECHECK

    # an errored r5 row does not retire
    (tmp_path / "CORRECTNESS_r05.json").write_text(
        json.dumps({"q_ml_pca": {"err": "Traceback ...", "spark_rows": None}})
    )
    assert _force_recheck_pending(tmp_path) == _FORCE_RECHECK

    # a good r5 rows-only row retires exactly that name
    (tmp_path / "CORRECTNESS_r05.json").write_text(
        json.dumps({"q_ml_pca": {"err": "no_oracle", "spark_rows": 8}})
    )
    assert _force_recheck_pending(tmp_path) == _FORCE_RECHECK - {"q_ml_pca"}


def test_rows_only_row_contract_complete():
    """VERDICT r5 #8: the pinned row-count contract covers EXACTLY the
    rows-only queries (a new rows-only query must declare its range; a
    rows-only -> SQL upgrade must retire its entry), and every driver-
    recorded rows-only count in the committed artifacts lands in range."""
    import json
    from pathlib import Path

    from spark_ml_pipelines_example_spark.queries.registry import (
        ROWS_ONLY_ROW_CONTRACT,
    )

    full = load_all()
    rows_only = {n for n, s in full.items() if s.oracle is None}
    assert set(ROWS_ONLY_ROW_CONTRACT) == rows_only
    root = Path(__file__).resolve().parents[1]
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        for name, row in json.loads(p.read_text()).items():
            if (
                name in ROWS_ONLY_ROW_CONTRACT
                and isinstance(row, dict)
                and row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
                and full[name].oracle is None  # still rows-only today
            ):
                lo, hi = ROWS_ONLY_ROW_CONTRACT[name]
                assert lo <= row["spark_rows"] <= hi, (name, p.name, row)


def test_recert_rotation_selects_oldest_vintage_sql_only():
    """VERDICT r9 #1: with the ledger closed, the window budget left
    after the pins re-fronts the OLDEST-vintage certified SQL-oracled
    queries, oldest-first. No selected name may be younger than an
    unselected eligible one, rows-only names never rotate, and the
    budget tops the window up to ~50 with the pins."""
    from spark_ml_pipelines_example_spark.queries.registry import (
        _RECERT_WINDOW,
        _certified_vintage,
        _recert_rotation_names,
    )

    rec = _recert_rotation_names()
    vintage = _certified_vintage()
    # ADVICE r10 #3: the recert budget leaves room for the pins AND any
    # never-checked (unpinned) names, which outrank the recert block —
    # a new query must never be pushed past the ~50-entry driver window.
    from spark_ml_pipelines_example_spark.queries.registry import (
        _driver_checked_queries,
        _force_recheck_pending,
    )

    fresh = _driver_checked_queries() - _force_recheck_pending()
    never = sum(1 for n in REGISTRY if n not in fresh and n not in _WINDOW_PIN)
    assert len(rec) == min(
        max(0, _RECERT_WINDOW - len(_WINDOW_PIN) - never),
        sum(1 for n in vintage if REGISTRY[n].oracle is not None),
    )
    assert all(REGISTRY[n].oracle is not None for n in rec)
    # oldest-first, name tie-break
    keys = [(vintage[n], n) for n in rec]
    assert keys == sorted(keys)
    # nothing unselected is older than anything selected
    unselected = [
        v
        for n, v in vintage.items()
        if n not in rec and REGISTRY[n].oracle is not None and n not in _WINDOW_PIN
    ]
    if rec and unselected:
        assert max(vintage[n] for n in rec) <= min(unselected)


def test_recert_rotation_fills_driver_window():
    """The rotated registry's first ~50 names must be exactly the pins
    (those that exist and still need a row) + never-checked newcomers +
    the recert selection — the driver's budget lands on re-certification,
    not on the already-fresh regression tail."""
    from spark_ml_pipelines_example_spark.queries.registry import (
        _recert_rotation_names,
    )

    full = load_all()
    rec = _recert_rotation_names()
    # r12: pinned names force-front even when they hold a valid row (an
    # optimization round's rewrites re-enter the window) — mirror
    # _rotate_for_driver's checked-set definition.
    checked = (
        _driver_checked_queries()
        - _force_recheck_pending()
        - set(rec)
        - set(_WINDOW_PIN)
    )
    n_window = sum(1 for n in full if n not in checked)
    front = list(full)[:n_window]
    # every window slot needs a fresh row (pin, newcomer, or recert)
    assert all(n not in checked for n in front)
    assert set(rec) <= set(front)
    # the recert names ride in their declared (oldest-first) order
    in_front = [n for n in front if n in rec]
    assert in_front == list(rec)


def test_recert_rotation_advances_on_fresh_row(tmp_path):
    """Self-maintenance: once a round's artifact records a fresh green
    row for a re-fronted name, its vintage advances and the next
    selection moves on to the next-oldest automatically."""
    import json

    from spark_ml_pipelines_example_spark.queries.registry import (
        _certified_vintage,
        _checked_fingerprints,
        _recert_rotation_names,
    )

    fps = _checked_fingerprints()
    # two real SQL-oracled names with committed fingerprints
    a, b = "q_agg_argmax", "q_agg_bool"
    assert fps.get(a) and fps.get(b)
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps(
            {
                a: {"hash_match": True, "err": None},
                b: {"hash_match": True, "err": None},
            }
        )
    )
    rec = _recert_rotation_names(tmp_path)
    assert rec[:2] == (a, b)  # same vintage → name order
    v = _certified_vintage(tmp_path)
    assert v[a] == 1 and v[b] == 1
    # a fresh r10 row for `a` pushes it behind `b`
    (tmp_path / "CORRECTNESS_r10.json").write_text(
        json.dumps({a: {"hash_match": True, "err": None}})
    )
    rec2 = _recert_rotation_names(tmp_path)
    assert rec2[:2] == (b, a)
    # an errored r10 row must NOT advance the vintage
    (tmp_path / "CORRECTNESS_r10.json").write_text(
        json.dumps({a: {"hash_match": False, "err": "Traceback ..."}})
    )
    v3 = _certified_vintage(tmp_path)
    assert v3[a] == 1
