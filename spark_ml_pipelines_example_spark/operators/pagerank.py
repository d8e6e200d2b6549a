"""Weighted PageRank as an iterative DataFrame operator.

Spark-first formulation of the power-iteration loop (the shape GraphX's
``staticPageRank`` runs, re-expressed on DataFrames so Catalyst/AQE plan
each round): per iteration one shuffle keyed on ``dst`` aggregates the
incoming rank mass; the rank vector is nodes-sized (tiny next to the
edge set) and ``localCheckpoint`` truncates the growing lineage each
round exactly like operators/clusters.py does for connected components.

Determinism: the per-node contribution sum is a ≤fan-in-sized double
sum whose shuffle-order variance is below 1e-12; results are rounded to
6 decimals before comparison/ranking, which absorbs it (same discipline
as every rounded double in this repo). Dangling-node mass is
redistributed uniformly, computed as a 1-row aggregate that broadcasts —
no driver collect inside the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..queries._util import t
from ..queries.registry import query

DAMPING = 0.85
ONE_MINUS_D = 1.0 - DAMPING  # same IEEE double in Python/Spark/DuckDB
N_ITERS = 3

# Driver-replay ceiling on the PRE-AGGREGATED edge-list size (node²-
# bounded by construction): under it the power iterations replay on the
# driver — the caller's fact-scale edge build stays distributed and runs
# exactly once (the collect) — past it the per-round distributed loop
# runs instead.
_PR_DRIVER_CAP = 200_000


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    iters: int = N_ITERS,
    damping: float = DAMPING,
) -> DataFrame:
    """Run ``iters`` weighted power iterations; returns (node, pr).

    ``edges`` must be pre-aggregated (one row per (src, dst)). r12
    (guide §1.2 job-count reduction — the logreg/BPE/drift playbook):
    the rank state is nodes-sized and the edge list node²-bounded, so
    when the edge list fits `_PR_DRIVER_CAP` the iterations replay on
    the driver over the collected edges — ONE distributed job (the
    fact-scale edge build) instead of 2 localCheckpoint jobs of setup
    plus one multi-join checkpoint job per round (measured 1.48 → 0.68 s
    min-of-5 at sf0.1 on the 25-node nation graph). Arithmetic is the
    identical IEEE ops per round; per-node contribution sums are
    fan-in-sized double sums whose ORDER differs from the shuffle's —
    inside the same ≤1e-12 variance band the declared 6-decimal rounding
    already absorbs between Spark and DuckDB (this module's determinism
    note; outputs verified identical at sf0.001/0.01/0.1). Past the cap
    everything runs distributed as before."""
    e_small = edges.select(
        F.col(src).alias("src"),
        F.col(dst).alias("dst"),
        F.col(weight).cast("double").alias("w"),
    )
    # limit(cap+1) is exact: fewer than cap+1 rows back == the whole list
    rows = e_small.limit(_PR_DRIVER_CAP + 1).collect()
    if len(rows) <= _PR_DRIVER_CAP:
        from pyspark.sql import types as T

        spark = edges.sparkSession
        E = [(r["src"], r["dst"], float(r["w"])) for r in rows]
        node_set = {x for sr, ds, _w in E for x in (sr, ds)}
        nodes = sorted(node_set)
        n_nodes = float(len(nodes))
        ow: dict = {}
        for sr, _ds, w in E:
            ow[sr] = ow.get(sr, 0.0) + w
        pr = {nd: 1.0 / n_nodes for nd in nodes}
        one_minus_d = 1.0 - damping
        for _ in range(iters):
            m = sum(pr[nd] for nd in nodes if nd not in ow)
            contrib: dict = {}
            for sr, ds, w in E:
                contrib[ds] = contrib.get(ds, 0.0) + pr[sr] * w / ow[sr]
            pr = {
                nd: one_minus_d / n_nodes
                + damping * (contrib.get(nd, 0.0) + m / n_nodes)
                for nd in nodes
            }
        schema = T.StructType(
            [
                T.StructField("node", edges.schema[src].dataType),
                T.StructField("pr", T.DoubleType()),
            ]
        )
        return spark.createDataFrame([(nd, pr[nd]) for nd in nodes], schema)
    return _pagerank_distributed(e_small, iters, damping)


def _pagerank_distributed(
    e_small: DataFrame, iters: int, damping: float
) -> DataFrame:
    """The pre-r12 per-round distributed loop, kept verbatim as the
    past-cap path."""
    # Materialize the (src, dst, w) edge list once: it is node²-bounded
    # (pre-aggregated), but its LINEAGE is the caller's edge build — often
    # a fact-scale join — which lazy evaluation would otherwise re-execute
    # for the node set, the out-weight table, and every iteration.
    e = e_small.localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n_nodes = float(nodes.count())
    outw = e.groupBy(F.col("src").alias("node")).agg(F.sum("w").alias("ow"))
    pr = nodes.withColumn("pr", F.lit(1.0 / n_nodes))
    one_minus_d = 1.0 - damping
    for _ in range(iters):
        dangling = (
            pr.join(outw, "node", "left_anti")
            .agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("m"))
        )
        contrib = (
            e.join(pr.withColumnRenamed("node", "src"), "src")
            .join(outw.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("pr") * F.col("w") / F.col("ow")).alias("s"))
        )
        pr = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(one_minus_d / n_nodes)
                    + F.lit(damping)
                    * (F.coalesce(F.col("s"), F.lit(0.0)) + F.col("m") / n_nodes)
                ).alias("pr"),
            )
            .localCheckpoint()
        )
    return pr


def _oracle_sql() -> str:
    """Unrolled N_ITERS power iterations as chained CTEs (exact same
    arithmetic as the Spark loop, constants injected via repr for
    bit-identical IEEE literals)."""
    omd = repr(ONE_MINUS_D)
    d = repr(DAMPING)
    sql = f"""
    WITH edges AS (
        SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
               CAST(COUNT(*) AS DOUBLE) AS w
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY 1, 2
    ), nodes AS (
        SELECT DISTINCT src AS node FROM edges
        UNION SELECT DISTINCT dst FROM edges
    ), nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    outw AS (SELECT src AS node, SUM(w) AS ow FROM edges GROUP BY 1),
    pr0 AS (SELECT node, 1.0 / nn.n AS pr FROM nodes, nn)"""
    for k in range(1, N_ITERS + 1):
        p = k - 1
        sql += f""",
    inc{k} AS (
        SELECT e.dst AS node, SUM(p.pr * e.w / ow.ow) AS s
        FROM edges e
        JOIN pr{p} p ON p.node = e.src
        JOIN outw ow ON ow.node = e.src
        GROUP BY e.dst
    ), dang{k} AS (
        SELECT COALESCE(SUM(p.pr), 0) AS m
        FROM pr{p} p LEFT JOIN outw ow ON ow.node = p.node
        WHERE ow.node IS NULL
    ), pr{k} AS (
        SELECT n.node,
               {omd} / nn.n + {d} * (COALESCE(i.s, 0) + dg.m / nn.n) AS pr
        FROM nodes n
        LEFT JOIN inc{k} i ON i.node = n.node
        CROSS JOIN nn CROSS JOIN dang{k} dg
    )"""
    sql += f"""
    SELECT node, ROUND(pr, 6) AS pr,
           ROW_NUMBER() OVER (ORDER BY ROUND(pr, 6) DESC, node) AS rk
    FROM pr{N_ITERS}
    """
    return sql


@query(
    "q_graph_pagerank",
    oracle=_oracle_sql(),
    tags=("graph", "pagerank", "iterative"),
)
def q_graph_pagerank(spark, sf_dir):
    """Weighted PageRank over the nation-level trade graph (edge
    customer-nation → supplier-nation, weight = lineitem count), 3 power
    iterations, damping 0.85 — the second iterative graph operator next
    to connected components (operators/clusters.py). The edge build is
    the star-join shape (fact ⋈ fact one shuffle, dims broadcast); each
    iteration is one shuffle on dst. Hash-checked against the same
    iterations unrolled as DuckDB CTEs. The final unpartitioned ranking
    window is safe ONLY because the rank vector is nodes-sized (≤25 rows
    here; node-count rows in general, never edge-count)."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count("*").alias("w"))
    )
    pr = pagerank(edges)
    from pyspark.sql import Window as W

    rk = W.orderBy(F.round("pr", 6).desc(), "node")
    return pr.select(
        "node",
        F.round("pr", 6).alias("pr"),
        F.row_number().over(rk).alias("rk"),
    )
