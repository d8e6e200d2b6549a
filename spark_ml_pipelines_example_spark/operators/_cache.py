"""Session-cache hygiene for operators that persist intermediate frames.

Several operators lazily ``persist()`` a bounded intermediate (the binned
catalog frame in operators/globalrank.py, the hashed-key frame feeding
the sketch trio in queries/aggregates.py) so multi-branch plans read one
InMemoryRelation instead of re-scanning the fact table. The persist is
correct, but in a long-lived session (bench runs ~150 queries, pytest
1000+) nothing ever unpersisted them, so cache entries accumulated until
LRU eviction (ADVICE r4). Operators now persist through
``persist_tracked`` and harness loops (bench.py, tools/driver_sim.py,
and the autouse ``_release_tracked_persists`` fixture in
tests/conftest.py) call ``release_tracked`` once the consuming action
has run — each query's cache lives exactly as long as the query needs it.

SAFETY RULE for new call sites: only track frames whose recompute is a
pure deterministic function of their inputs. ``release_tracked`` is a
process-global all-or-nothing unpersist, so a released frame may be
recomputed later by a still-held DataFrame; a frame whose content
depends on physical execution (``monotonically_increasing_id``,
partition sampling, RNG) must use ``localCheckpoint()`` instead — see
q_shuffle_global (queries/curation.py).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def persist_tracked(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """``df.persist(level)`` + register the frame for later release."""
    df = df.persist(level)
    _TRACKED.append(df)
    return df


def release_tracked() -> int:
    """Unpersist every tracked frame (blocking=False: async JVM-side
    cleanup, no wait). Returns the number released. Safe to call when
    nothing is tracked or after a session restart."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            # session already stopped — the cache died with it
            pass
    return n
