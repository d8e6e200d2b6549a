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


def _nondeterministic_hits(df: DataFrame) -> list[str]:
    """Walk the ANALYZED logical plan's tree nodes and return a rendered
    marker for every construct that can recompute DIFFERENT content
    after an unpersist (execution-dependent ids, sampling, RNG).

    ADVICE r6 #2: the previous guard substring-scanned the rendered plan
    string, so a deterministic frame whose STRING LITERAL contained a
    marker (e.g. a filter comparing to the literal ``'rand('``) raised
    spuriously. This walk asks Catalyst itself: ``Expression
    .deterministic`` is recursive over expression children (so checking
    each plan node's top-level expressions suffices), and the logical
    ``Sample`` node (df.sample / randomSplit — partition-layout-dependent
    even when seeded) is matched by node name, not by rendering.
    Subquery plans hanging off expressions are walked too
    (``QueryPlan.subqueries``). Verified empirically against rand/randn,
    monotonically_increasing_id, uuid, shuffle, spark_partition_id,
    input_file_name, Sample, and a literal-embedded false-positive
    (tests/test_round7.py)."""
    hits: list[str] = []
    stack = [df._jdf.queryExecution().analyzed()]
    while stack:
        node = stack.pop()
        if node.nodeName() == "Sample":
            hits.append("Sample")
        exprs = node.expressions()
        for i in range(exprs.size()):
            e = exprs.apply(i)
            if not e.deterministic():
                hits.append(e.toString()[:80])
        children = node.children()
        for i in range(children.size()):
            stack.append(children.apply(i))
        subqueries = node.subqueries()
        for i in range(subqueries.size()):
            stack.append(subqueries.apply(i))
    return hits


def persist_tracked(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """``df.persist(level)`` + register the frame for later release.

    Raises ``ValueError`` if the frame's analyzed plan contains a
    nondeterministic expression — such a frame must pin its content with
    ``localCheckpoint()`` instead of riding the releasable cache."""
    hits = _nondeterministic_hits(df)
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
