"""Hierarchy traversal by pointer doubling — O(log depth) rounds.

Spark has no recursive CTE; the scalable substitute for root/depth
resolution over a parent-pointer table is pointer doubling (path
halving): maintain for every node its current known ancestor and the
distance climbed, and each round compose the mapping with itself, so
the reachable distance DOUBLES per round — a depth-10 000 chain resolves
in 14 shuffles where naive one-hop propagation needs 10 000. This is the
large-star/small-star trick ADVICE round 1 pointed at for connected
components, applied to the directed-tree case where it is exact.

Each round is one self-join on the ancestor key + localCheckpoint (same
lineage discipline as operators/clusters.py); convergence = no row still
below the root, checked with a driver-side count — exhausting max_rounds
raises rather than returning silently-short paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..queries._util import t
from ..queries.registry import query

MAX_ROUNDS = 20  # 2^20-deep chains; raise for deeper hierarchies


def resolve_paths(
    nodes: DataFrame, node: str = "node", parent: str = "parent",
    max_rounds: int = MAX_ROUNDS,
) -> DataFrame:
    """Resolve (node → root, depth) over a parent-pointer table where
    roots point at themselves. Returns (node, root, depth)."""
    m = nodes.select(
        F.col(node).alias("node"),
        F.col(parent).alias("anc"),
        F.when(F.col(node) != F.col(parent), 1).otherwise(0).alias("d"),
    ).localCheckpoint()
    prev_total = m.agg(F.sum("d")).head()[0]
    for _ in range(max_rounds):
        j = m.select(
            F.col("node").alias("j_node"),
            F.col("anc").alias("j_anc"),
            F.col("d").alias("j_d"),
        )
        m2 = (
            m.join(j, m.anc == j.j_node, "left")
            .select(
                "node",
                F.coalesce("j_anc", "anc").alias("anc"),
                (F.col("d") + F.coalesce("j_d", F.lit(0))).alias("d"),
            )
            .localCheckpoint()
        )
        # converged when composing changed nothing (all pointers at roots);
        # one scalar aggregate per round, the iterative-operator pattern
        total = m2.agg(F.sum("d")).head()[0]
        m = m2
        if total == prev_total:
            break
        prev_total = total
    else:
        raise RuntimeError(
            f"resolve_paths did not converge within {max_rounds} rounds; "
            "hierarchy deeper than 2^max_rounds or contains a cycle"
        )
    return m.select("node", F.col("anc").alias("root"), F.col("d").alias("depth"))


@query(
    "q_graph_treepath",
    oracle="""
    WITH RECURSIVE walk AS (
        SELECT s_suppkey AS node, s_suppkey AS anc, 0 AS depth FROM supplier
        UNION ALL
        SELECT w.node, CAST(FLOOR(w.anc / 2) AS BIGINT), w.depth + 1
        FROM walk w WHERE w.anc > 0
    )
    SELECT node, CAST(0 AS BIGINT) AS root, MAX(depth) AS depth
    FROM walk GROUP BY node
    """,
    tags=("graph", "hierarchy", "iterative", "pointer-doubling"),
)
def q_graph_treepath(spark, sf_dir):
    """Root/depth resolution over a synthetic binary-tree hierarchy on
    supplier keys (parent = ⌊key/2⌋, root = 0 — the fixture has no
    parent column, so the tree is derived; the OPERATOR is the point).
    Pointer doubling needs ⌈log₂ depth⌉ self-join rounds vs depth rounds
    for one-hop propagation — the difference between 14 and 10 000
    shuffles on a deep hierarchy. Oracle: DuckDB recursive CTE walks the
    same chains exactly."""
    s = t(spark, sf_dir, "supplier")
    nodes = s.select(
        F.col("s_suppkey").cast("long").alias("node"),
        F.when(F.col("s_suppkey") > 0, F.floor(F.col("s_suppkey") / 2))
        .otherwise(0)
        .cast("long")
        .alias("parent"),
    )
    return resolve_paths(nodes)
