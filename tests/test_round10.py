"""Round-10 pins: exact recycled-PID detection in the scratch-bucket GC
(ADVICE r9 #1 — age must never override proven live ownership) and exact
Decimal canonicalization in the driver-sim selfcheck (ADVICE r9 #2 — no
float64 round-trip above 2^53)."""

from __future__ import annotations

import os
import subprocess
import time
from decimal import Decimal

from spark_ml_pipelines_example_spark.queries.joins import (
    _gc_scratch_buckets,
    _pid_started_after,
)


def _spawn_sleeper():
    """A live child whose start time is 'now' — the recycled-PID stand-in."""
    return subprocess.Popen(["sleep", "60"])


def test_pid_started_after_detects_recycling_and_ownership():
    """A process started NOW must read as 'started after' a 10-day-old
    dir mtime (recycled PID ⇒ reclaimable) and as 'started before' a
    fresh mtime (plausible live owner ⇒ untouchable)."""
    child = _spawn_sleeper()
    try:
        old = time.time() - 10 * 24 * 3600
        assert _pid_started_after(child.pid, old) is True
        # +10s guard: the helper allows 2s clock slack around 'now'
        assert _pid_started_after(child.pid, time.time() + 10) is False
    finally:
        child.kill()
        child.wait()


def test_gc_reclaims_recycled_pid_dir_immediately(tmp_path):
    """A dir stamped with a LIVE pid whose process started AFTER the dir
    was written is a dead owner behind a recycled PID: reclaimed at once
    (the r8 cut waited 3 days for these)."""
    child = _spawn_sleeper()
    try:
        d = tmp_path / f"bkt_lineitem_x_p{child.pid}"
        d.mkdir()
        old = time.time() - 10 * 24 * 3600
        os.utime(d, (old, old))
        _gc_scratch_buckets(str(tmp_path))
        assert not d.exists()
    finally:
        child.kill()
        child.wait()


def test_gc_never_touches_live_owner_regardless_of_age(tmp_path, monkeypatch):
    """ADVICE r9 #1 repro: live owner, dir >3 days old. With ownership
    proven (process started before the dir mtime) the age rule must NOT
    fire — the r8 cut deleted here. A real 3-day-old owned dir can't be
    staged in a test, so ownership is pinned via the helper seam while
    the dir itself carries the >3-day mtime the old rule keyed on."""
    import spark_ml_pipelines_example_spark.queries.joins as joins

    child = _spawn_sleeper()
    try:
        d = tmp_path / f"bkt_orders_x_p{child.pid}"
        d.mkdir()
        old = time.time() - 10 * 24 * 3600
        os.utime(d, (old, old))
        monkeypatch.setattr(joins, "_pid_started_after", lambda pid, m: False)
        _gc_scratch_buckets(str(tmp_path))
        assert d.exists()
    finally:
        child.kill()
        child.wait()


def test_gc_still_reclaims_dead_pid_and_skips_foreign_names(tmp_path):
    child = _spawn_sleeper()
    child.kill()
    child.wait()  # pid now dead (not yet recycled: just-exited)
    dead = tmp_path / f"bkt_lineitem_x_p{child.pid}"
    dead.mkdir()
    foreign = tmp_path / "not_a_bucket_dir"
    foreign.mkdir()
    mine = tmp_path / f"bkt_orders_x_p{os.getpid()}"
    mine.mkdir()
    _gc_scratch_buckets(str(tmp_path))
    assert not dead.exists()
    assert foreign.exists()
    assert mine.exists()


# ---------------------------------------------------------------- decimal


def test_driver_sim_decimal_canon_is_exact_above_2_53():
    """Two decimal(18,2) money sums that collide in float64 must hash
    apart in the selfcheck — the exact gap class ADVICE r9 #2 names."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from driver_sim import _canon_cell

    a = Decimal("10000000000000001.23")
    b = Decimal("10000000000000001.25")
    assert float(a) == float(b)  # float64 cannot tell them apart
    assert _canon_cell(a) != _canon_cell(b)
    assert _canon_cell(a) == "10000000000000001.23"


def test_driver_sim_decimal_canon_scale_and_exponent_neutral():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from driver_sim import _canon_cell

    # scale noise folds: decimal(38,6) 1.500000 ≡ decimal(18,2) 1.50
    assert _canon_cell(Decimal("1.500000")) == _canon_cell(Decimal("1.5"))
    # normalize()'s positive exponent is re-quantized to plain digits
    assert _canon_cell(Decimal("100")) == "100"
    assert _canon_cell(Decimal("1200.00")) == "1200"
