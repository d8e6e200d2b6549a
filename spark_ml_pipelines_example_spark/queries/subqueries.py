"""Subquery operators: scalar subqueries and correlated EXISTS/IN.

Catalyst decorrelates these into joins (SURVEY §4.2) — a scalar subquery
becomes a broadcast of its single-row result; a correlated EXISTS becomes
a left-semi join; NOT IN (null-safe) becomes a null-aware anti join — so
none of them re-executes per outer row the way a naive interpreter would.
Declared through ``spark.sql`` because subqueries are SQL surface, proving
the engine's SQL entry point alongside the DataFrame API.
"""

from __future__ import annotations

from ..sources.io import load_table
from ._util import t
from .registry import query

_TABLES = ("orders", "lineitem", "customer", "part", "nation")


def _register(spark, sf_dir: str) -> None:
    for name in _TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


@query(
    "q_subquery_scalar",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM orders)
    """,
    tags=("subquery", "scalar"),
)
def q_subquery_scalar(spark, sf_dir):
    """Scalar subquery in a predicate: planned as one aggregation job
    whose single-row result folds into the outer scan's filter — the
    corpus is read twice but never joined row-to-row. The round-2 fixture
    draws o_totalprice uniformly (max < 2x avg), so the original 4x cut
    selected zero rows — 1.5x selects ~25% at every SF. avg(double) is
    order-dependent in the last ulp, but prices sit on a 2-decimal grid
    while the cut carries ~16 digits: the nearest value is always orders
    of magnitude farther from the cut than any cross-engine avg
    difference, so membership can't flip (non-empty verified at
    sf0.001/sf0.01/sf0.1)."""
    _register(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM orders)
        """
    )


@query(
    "q_subquery_exists",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
    tags=("subquery", "exists"),
)
def q_subquery_exists(spark, sf_dir):
    """Correlated EXISTS → decorrelated to a left-semi join on the
    correlation key (check the plan: no per-row re-execution, one
    semi-join shuffle)."""
    _register(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        """
    )


@query(
    "q_subquery_not_in",
    oracle="""
    SELECT p_partkey, p_name
    FROM part
    WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
    """,
    tags=("subquery", "anti"),
)
def q_subquery_not_in(spark, sf_dir):
    """NOT IN subquery → null-aware anti join (l_partkey is non-null in
    the fixtures, so semantics match a plain anti join; the planner still
    must prove it)."""
    _register(spark, sf_dir)
    return spark.sql(
        """
        SELECT p_partkey, p_name
        FROM part
        WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
        """
    )


@query(
    "q_join_lateral_topk",
    oracle="""
    SELECT n.n_name, c.c_custkey, c.c_acctbal
    FROM nation n, LATERAL (
        SELECT c_custkey, c_acctbal FROM customer
        WHERE c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_custkey LIMIT 2
    ) c
    """,
    tags=("subquery", "lateral", "topk"),
)
def q_join_lateral_topk(spark, sf_dir):
    """LATERAL correlated subquery: top-2 customers by balance per
    nation. Catalyst plans the per-row subquery as ONE decorrelated
    window (rank over c_nationkey) + join — no per-nation re-execution,
    so the cost is a single customer shuffle regardless of how many
    nations drive the lateral. Deterministic via the c_custkey
    tie-break."""
    _register(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name, c.c_custkey, c.c_acctbal
        FROM nation n, LATERAL (
            SELECT c_custkey, c_acctbal FROM customer
            WHERE c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_custkey LIMIT 2
        ) c
        """
    )


@query(
    "q_sql_recursive_cte",
    oracle="""
    WITH RECURSIVE anc AS (
        SELECT s_suppkey AS node, s_suppkey AS anc, 0 AS dist
        FROM supplier
        UNION ALL
        SELECT node, (anc - 1) // 2, dist + 1 FROM anc WHERE anc > 0
    )
    SELECT dist,
           COUNT(*) AS n_pairs,
           CAST(SUM(node) AS BIGINT) AS node_sum,
           CAST(SUM(anc) AS BIGINT) AS anc_sum
    FROM anc GROUP BY 1
    """,
    tags=("sql", "recursive-cte", "hierarchy", "spark4"),
)
def q_sql_recursive_cte(spark, sf_dir):
    """Recursive CTE surface (WITH RECURSIVE, new in Spark 4): the
    ancestor closure of a heap-shaped supplier hierarchy (parent(k) =
    (k−1) div 2) — every (node, ancestor, distance) pair down to the
    root, aggregated per distance. This is the declarative twin of the
    pointer-doubling operator (operators/hierarchy.py, q_graph_treepath):
    recursion executes O(depth) joins where pointer doubling does
    O(log n) — fine when depth is logarithmic (it is here: a balanced
    hierarchy), the iterative operator is the deep-chain fallback. The
    recursion step is a self-join per level that Catalyst plans like
    any equi-join; identical SQL runs on DuckDB (integer-division
    spelling aside)."""
    for tbl in ("supplier",):
        t(spark, sf_dir, tbl).createOrReplaceTempView(tbl)
    return spark.sql(
        """
        WITH RECURSIVE anc AS (
            SELECT s_suppkey AS node, s_suppkey AS anc, 0 AS dist
            FROM supplier
            UNION ALL
            SELECT node, (anc - 1) div 2, dist + 1 FROM anc WHERE anc > 0
        )
        SELECT dist,
               COUNT(*) AS n_pairs,
               SUM(node) AS node_sum,
               SUM(anc) AS anc_sum
        FROM anc GROUP BY dist
        """
    )


@query(
    "q_sql_pipe_syntax",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1995-01-01'
    GROUP BY l_returnflag, l_linestatus
    HAVING COUNT(*) > 100
    """,
    tags=("sql", "pipe-syntax", "spark4"),
)
def q_sql_pipe_syntax(spark, sf_dir):
    """SQL pipe syntax (`|>`, new in Spark 4): the linear scan → filter
    → aggregate → post-filter → order flow written in evaluation order
    instead of inside-out SQL. Each pipe stage lowers to the same
    logical operators as classic SQL — the oracle IS the classic
    spelling, so the hash check pins that pipe lowering is semantically
    identity. `|> WHERE` after `|> AGGREGATE` references aggregate
    aliases (classic HAVING) without a subquery."""
    for tbl in ("lineitem",):
        t(spark, sf_dir, tbl).createOrReplaceTempView(tbl)
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate >= DATE '1995-01-01'
        |> AGGREGATE COUNT(*) AS n,
                     CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
           GROUP BY l_returnflag, l_linestatus
        |> WHERE n > 100
        |> ORDER BY l_returnflag, l_linestatus
        """
    )


@query(
    "q_sql_session_variables",
    oracle="""
    SELECT p_brand, COUNT(*) AS n_above,
           CAST(MIN(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS min_above
    FROM part
    WHERE p_retailprice > (SELECT MAX(p_retailprice) FROM part) * 0.5
    GROUP BY p_brand
    """,
    tags=("sql", "session-variables", "spark4"),
)
def q_sql_session_variables(spark, sf_dir):
    """SQL session variables (DECLARE / SET VAR, new in Spark 4): a
    scalar threshold is computed ONCE into a typed session variable and
    referenced by a later statement — the multi-statement parameterized
    script pattern (dbt/notebook pipelines) without string templating
    or driver-side collect in user code. The variable is set from a
    scalar subquery; the oracle inlines the same subquery, and the
    threshold (MAX * 0.5) is an exact halving of a data value, so the
    float comparison is bit-identical in both engines."""
    for tbl in ("part",):
        t(spark, sf_dir, tbl).createOrReplaceTempView(tbl)
    spark.sql("DECLARE OR REPLACE VARIABLE price_cut DOUBLE")
    spark.sql("SET VAR price_cut = (SELECT MAX(p_retailprice) FROM part) * 0.5")
    return spark.sql(
        """
        SELECT p_brand, COUNT(*) AS n_above,
               CAST(MIN(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS min_above
        FROM part
        WHERE p_retailprice > price_cut
        GROUP BY p_brand
        """
    )


@query(
    "q_sql_parameterized",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice >= 150000.0
    GROUP BY o_orderpriority
    """,
    tags=("sql", "parameterized", "spark4"),
)
def q_sql_parameterized(spark, sf_dir):
    """Parameterized SQL (`spark.sql(query, args=...)`, Spark 3.4+) plus
    the `IDENTIFIER()` clause (Spark 3.5+): values bind as TYPED literal
    parameters (:status, :floor) — no string interpolation, no injection
    surface, and Catalyst constant-folds them like hand-written literals
    — while the table name itself binds through IDENTIFIER(:tbl), the
    sanctioned way to parameterize an identifier position. The oracle is
    the fully-inlined classic spelling, so the hash check pins that
    parameter binding is semantically identity."""
    for tbl in ("orders",):
        t(spark, sf_dir, tbl).createOrReplaceTempView(tbl)
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM IDENTIFIER(:tbl)
        WHERE o_orderstatus = :status AND o_totalprice >= :floor
        GROUP BY ALL
        """,
        args={"tbl": "orders", "status": "F", "floor": 150000.0},
    )


@query(
    "q_sql_execute_immediate",
    oracle="""
    SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_acctbal > 1000.0
    GROUP BY n_name
    """,
    tags=("sql", "execute-immediate", "spark4"),
)
def q_sql_execute_immediate(spark, sf_dir):
    """EXECUTE IMMEDIATE (Spark 4): dynamic SQL held in a session
    variable, executed with a positional USING parameter — the
    stored-procedure-style dispatch surface (query text decided at
    runtime, parameters still TYPED bindings rather than string
    splices). The oracle is the inlined static spelling; the hash check
    pins that the dynamic path plans and evaluates identically."""
    for tbl in ("supplier", "nation"):
        t(spark, sf_dir, tbl).createOrReplaceTempView(tbl)
    spark.sql("DECLARE OR REPLACE VARIABLE dyn_q STRING")
    spark.sql(
        """SET VAR dyn_q =
           'SELECT n_name, COUNT(*) AS n_suppliers,
                   CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
            WHERE s_acctbal > ? GROUP BY n_name'"""
    )
    return spark.sql("EXECUTE IMMEDIATE dyn_q USING 1000.0")


SCRIPT_TARGET_N = 100  # exponential-search stop: at most this many orders


@query(
    "q_sql_scripting",
    oracle=f"""
    WITH p AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        FROM orders
    ), pw AS (
        SELECT CAST(1 AS BIGINT) << g.g AS t FROM UNNEST(range(0, 63)) AS g(g)
    ), scored AS (
        SELECT t,
               (SELECT COUNT(*) FROM p WHERE c >= pw.t) AS n_at,
               (SELECT COUNT(*) FROM p WHERE c >= pw.t // 2) AS n_at_half
        FROM pw
    )
    SELECT t AS threshold_cents, n_at AS n_at_or_above,
           CASE WHEN t = 1 THEN CAST(NULL AS BIGINT) ELSE n_at_half END
               AS n_at_half
    FROM scored WHERE n_at <= {SCRIPT_TARGET_N} ORDER BY t LIMIT 1
    """,
    tags=("sql", "scripting", "spark4", "control-flow"),
)
def q_sql_scripting(spark, sf_dir):
    """SQL scripting (Spark 4 `BEGIN … END` blocks, SQL/PSM control
    flow): an exponential search for the smallest power-of-two price
    threshold leaving at most SCRIPT_TARGET_N orders — DECLARE'd
    variables mutated by a WHILE loop whose condition is a scalar
    subquery over the real table, i.e. genuine multi-statement
    procedural SQL, not a single query. The oracle is the closed form
    (the doubling sequence's first satisfying element = the minimum
    satisfying power of two, counts being antitone in t), so the whole
    control-flow path is hash-checked. Exact integer cents throughout.

    Scale shape: each loop step is one combinable count over the scan
    (predicate pushed down); the loop runs O(log2(max price)) times and
    state is two driver-side scalars — scripting moves the LOOP to the
    engine but each iteration stays a full distributed query."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    old = spark.conf.get("spark.sql.scripting.enabled", None)
    spark.conf.set("spark.sql.scripting.enabled", "true")
    try:
        return spark.sql(f"""
        BEGIN
          DECLARE thr BIGINT = 1;
          WHILE (SELECT COUNT(*) FROM orders
                 WHERE CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                       >= thr) > {SCRIPT_TARGET_N} DO
            SET thr = thr * 2;
          END WHILE;
          SELECT thr AS threshold_cents,
                 (SELECT COUNT(*) FROM orders
                  WHERE CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                        >= thr) AS n_at_or_above,
                 CASE WHEN thr = 1 THEN CAST(NULL AS BIGINT) ELSE
                   (SELECT COUNT(*) FROM orders
                    WHERE CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                          >= thr DIV 2) END AS n_at_half;
        END
        """)
    finally:
        if old is None:
            spark.conf.unset("spark.sql.scripting.enabled")
        else:
            spark.conf.set("spark.sql.scripting.enabled", old)


@query(
    "q_sql_identifier_clause",
    oracle="""
    SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    tags=("sql", "identifier-clause", "spark4"),
)
def q_sql_identifier_clause(spark, sf_dir):
    """IDENTIFIER() clause (Spark 4): table and column names resolved
    from runtime STRING parameters as first-class identifiers — the
    SQL-injection-safe alternative to string-spliced table names in
    templated jobs (a name that isn't a valid identifier fails to
    resolve instead of smuggling SQL). The table, join column, and
    aggregated column all route through IDENTIFIER(:param) bindings;
    the oracle is the static spelling, so the hash check pins that the
    indirection resolves to the identical plan."""
    for tbl in ("customer", "nation"):
        t(spark, sf_dir, tbl).createOrReplaceTempView(tbl)
    return spark.sql(
        """
        SELECT n_name, COUNT(*) AS n_customers,
               CAST(SUM(CAST(IDENTIFIER(:balcol) AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_bal
        FROM IDENTIFIER(:tbl) JOIN nation
          ON IDENTIFIER(:tbl || '.' || :natkey) = n_nationkey
        GROUP BY n_name
        """,
        args={"tbl": "customer", "balcol": "c_acctbal", "natkey": "c_nationkey"},
    )


@query(
    "q_sql_group_by_all",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           EXTRACT(year FROM l_shipdate) AS ship_year,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem
    GROUP BY ALL
    """,
    tags=("sql", "group-by-all", "spark4"),
)
def q_sql_group_by_all(spark, sf_dir):
    """`GROUP BY ALL` (Spark 4 / modern-SQL surface): the grouping key
    list is INFERRED as every non-aggregate select item — the
    ad-hoc-analytics spelling that removes the copy-paste drift between
    the SELECT list and the GROUP BY list. Both engines support it
    natively, so the hash check pins that Spark's inference picks
    exactly the three non-aggregate items (including the computed
    EXTRACT) and lowers to the same partial+final hash aggregate as the
    explicit spelling."""
    for tbl in ("lineitem",):
        t(spark, sf_dir, tbl).createOrReplaceTempView(tbl)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               EXTRACT(year FROM l_shipdate) AS ship_year,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM lineitem
        GROUP BY ALL
        """
    )
