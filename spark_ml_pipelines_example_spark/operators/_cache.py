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
q_shuffle_global (queries/curation.py). ADVICE r5: this rule is now
ENFORCED at track time — ``persist_tracked`` scans the analyzed plan
for nondeterministic expressions and raises, so a future call site
can't silently corrupt results when a harness loop releases between
construction and consumption.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []

# Expression markers whose presence in an analyzed plan means a released
# frame can recompute DIFFERENT content (execution-dependent ids,
# sampling, RNG). Matched against the analyzed (pre-optimization) plan
# string, where these always render with an opening paren.
_NONDETERMINISTIC_MARKERS = (
    "monotonically_increasing_id(",
    "rand(",
    "randn(",
    "uuid(",
    "shuffle(",
    "Sample ",  # logical Sample node (df.sample / randomSplit)
    "spark_partition_id(",
    "input_file_name(",
)


def persist_tracked(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """``df.persist(level)`` + register the frame for later release.

    Raises ``ValueError`` if the frame's analyzed plan contains a
    nondeterministic expression — such a frame must pin its content with
    ``localCheckpoint()`` instead of riding the releasable cache."""
    plan = df._jdf.queryExecution().analyzed().toString()
    hits = [m for m in _NONDETERMINISTIC_MARKERS if m in plan]
    if hits:
        raise ValueError(
            "persist_tracked: plan contains nondeterministic expression(s) "
            f"{hits}; a release_tracked() between construction and "
            "consumption would recompute different content. Pin the frame "
            "with localCheckpoint() instead (see q_shuffle_global)."
        )
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
