"""Connected components over near-dup pair lists (iterative operator).

Dedup pipelines end with cluster formation: the pair list from exact/
minhash/embedding dedup becomes connected components, and each component
keeps one canonical document. This is the engine's iterative-algorithm
surface (SURVEY §2.2 'non-SQL-expressible ops'): a driver-side loop of
DataFrame steps, converging in O(log n) rounds.

Algorithm — min-label propagation with pointer doubling: each round
(a) propagates labels one hop through the edge list (join on neighbor,
min), then (b) jumps each node's label to its label's OWN label
(labels⋈labels self-join). Step (a) alone converges in O(diameter)
rounds; the doubling step compresses label paths geometrically, giving
the O(log n) round bound of pointer-jumping connectivity algorithms.
Each round is two shuffle joins + an aggregation keyed on node — at
100 TB every round is embarrassingly parallel, nothing driver-side but
the convergence counter. The loop localCheckpoints every round to
truncate lineage that Catalyst would otherwise re-analyze (iterative
plans grow exponentially without it). Exhausting max_rounds without
convergence RAISES — a silently-unconverged labeling would merge or
split clusters wrongly downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..queries import dedup as _dedup  # noqa: F401 — registers the pair oracle
from ..queries.registry import REGISTRY, query

MAX_ROUNDS = 20


def connected_components(
    pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b", max_rounds: int = MAX_ROUNDS
) -> DataFrame:
    """Return (node, comp) where comp = min node id reachable through the
    pair graph. Nodes appearing in no pair are absent (callers union
    isolated nodes back if needed)."""
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.groupBy("a")
        .agg(F.min("b").alias("min_nb"))
        .select(F.col("a").alias("node"), F.least("a", "min_nb").alias("comp"))
    )
    for _ in range(max_rounds):
        # (a) propagate: my new label = min(my label, labels of my neighbors)
        neighbor_labels = edges.join(
            labels.withColumnRenamed("node", "b"), "b"
        ).select(F.col("a").alias("node"), "comp")
        propagated = (
            labels.union(neighbor_labels).groupBy("node").agg(F.min("comp").alias("comp"))
        )
        # (b) pointer-double: follow my label to ITS label (path halving).
        # comp is itself a node id, so its row always exists; the left join
        # guards the root (comp == node) case degenerating on missing rows.
        jump_target = propagated.select(
            F.col("node").alias("comp"), F.col("comp").alias("comp2")
        )
        new_labels = (
            propagated.join(jump_target, "comp", "left")
            .select("node", F.least("comp", "comp2").alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.withColumnRenamed("comp", "new_comp")
            .join(labels, "node")
            .filter(F.col("new_comp") != F.col("comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge within {max_rounds} rounds; "
        "raise max_rounds (labels would be silently wrong for chains longer "
        "than the round budget)"
    )


@query(
    "q_dedup_clusters",
    # The engine side is iterative (pointer-doubling rounds), but its
    # RESULT is SQL-expressible: a recursive CTE over the same pair list
    # computes, per node, the minimum label among all reachable nodes —
    # exactly the component labeling min-propagation converges to. The
    # pair CTE is the registered q_dedup_ngram_jaccard oracle verbatim,
    # so both engines cluster the identical edge set.
    oracle=f"""
    WITH RECURSIVE pairs AS ({REGISTRY["q_dedup_ngram_jaccard"].oracle}),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION
        SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    reach(node, lbl) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
    ),
    cc AS (SELECT node, MIN(lbl) AS comp FROM reach GROUP BY node)
    SELECT comp, COUNT(*) AS n_docs, MIN(node) AS canonical_doc, MAX(node) AS max_doc
    FROM cc GROUP BY comp
    """,
    tags=("dedup", "clusters", "iterative"),
)
def q_dedup_clusters(spark, sf_dir):
    """Near-dup cluster formation: connected components over the bigram-
    Jaccard pair graph, per-cluster stats, canonical doc = min doc_id
    (the q_dedup_exact winner rule). The iterative engine path is
    hash-checked against a recursive-CTE oracle (min reachable label);
    a driver-side union-find additionally cross-checks it in tests."""
    from ..queries.registry import REGISTRY

    pairs = REGISTRY["q_dedup_ngram_jaccard"].fn(spark, sf_dir).select("doc_a", "doc_b")
    comps = connected_components(pairs)
    return comps.groupBy("comp").agg(
        F.count("*").alias("n_docs"),
        F.min("node").alias("canonical_doc"),
        F.max("node").alias("max_doc"),
    )
