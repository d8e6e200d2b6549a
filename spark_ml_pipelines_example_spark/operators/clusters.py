"""Connected components over near-dup pair lists (iterative operator).

Dedup pipelines end with cluster formation: the pair list from exact/
minhash/embedding dedup becomes connected components, and each component
keeps one canonical document. This is the engine's iterative-algorithm
surface (SURVEY §2.2 'non-SQL-expressible ops'): a driver-side loop of
DataFrame steps, converging in O(log n) rounds.

Algorithm — min-label propagation (Hash-to-Min topology): each round
joins every node's current label against its neighbors' labels and takes
the min; converged when no label changes. Each round is one shuffle join
+ one aggregation keyed on node — at 100 TB rounds ~ log(component
diameter), every round embarrassingly parallel, nothing driver-side but
the convergence counter. The loop localCheckpoints periodically to
truncate lineage that Catalyst would otherwise re-analyze every round
(iterative plans grow exponentially without it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..queries.registry import query

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
    for i in range(max_rounds):
        # my new label = min(my label, labels of all my neighbors)
        neighbor_labels = edges.join(
            labels.withColumnRenamed("node", "b"), "b"
        ).select(F.col("a").alias("node"), "comp")
        new_labels = (
            labels.union(neighbor_labels).groupBy("node").agg(F.min("comp").alias("comp"))
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.withColumnRenamed("comp", "new_comp")
            .join(labels, "node")
            .filter(F.col("new_comp") != F.col("comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


@query("q_dedup_clusters", oracle=None, tags=("dedup", "clusters", "iterative"))
def q_dedup_clusters(spark, sf_dir):
    """Near-dup cluster formation: connected components over the bigram-
    Jaccard pair graph, per-cluster stats, canonical doc = min doc_id
    (the q_dedup_exact winner rule). Iterative → not SQL-expressible →
    rows-only; a driver-side union-find cross-checks it in tests."""
    from ..queries.registry import REGISTRY

    pairs = REGISTRY["q_dedup_ngram_jaccard"].fn(spark, sf_dir).select("doc_a", "doc_b")
    comps = connected_components(pairs)
    return comps.groupBy("comp").agg(
        F.count("*").alias("n_docs"),
        F.min("node").alias("canonical_doc"),
        F.max("node").alias("max_doc"),
    )
