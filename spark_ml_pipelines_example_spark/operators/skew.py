"""Skew-mitigation join: explicit key salting.

AQE's skew-join split (enabled in plans/session.py) handles most skew by
splitting oversized shuffle partitions, but it only works for sort-merge
joins after stats exist. Explicit salting is the portable fallback — and
the only option when the skew is so extreme one KEY (not one partition)
dominates: replicate the build side over SALT copies and scatter the
probe side uniformly across them, turning one hot key's row group into
SALT independent tasks.

The declared query proves the transform is semantics-preserving: the
salted plan is hash-checked against the plain-join oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..queries._util import dec_sum, t
from ..queries.registry import query

SALT = 8


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str | list[str],
    *,
    salt: int = SALT,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the key salted ``salt`` ways.

    probe (the big/skewed side) gets a uniform pseudo-random salt per ROW
    (hash of all its columns — deterministic, no rand()); build gets every
    salt value via an explode (×salt replication — use only when build is
    much smaller than probe, the usual skew shape: huge fact, hot dim
    keys). The join key becomes (key, salt__), so one hot key's rows
    spread over ``salt`` shuffle partitions instead of one.

    Only inner/left are exposed: probe-side salting preserves both (every
    probe row has exactly one salt and every build row exists for all
    salts, so multiplicities are unchanged); right/full would need the
    anti-side repair step."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    probe_salt: Column = F.pmod(F.hash(*[F.col(c) for c in probe.columns]), F.lit(salt))
    p = probe.withColumn("salt__", probe_salt)
    b = build.withColumn(
        "salt__", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = p.join(b, keys + ["salt__"], how)
    return out.drop("salt__")


@query(
    "q_join_salted_skew",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    tags=("join", "skew", "salt"),
)
def q_join_salted_skew(spark, sf_dir):
    """lineitem ⋈ orders through the salted-join transform, aggregated per
    order priority — hash-identical to the plain join (the oracle), which
    is the whole point: salting changes the SHUFFLE LAYOUT (hot keys
    spread over SALT partitions), never the result. The aggregate's
    partial phase also runs per salt slice, so a hot key's sum is
    combined map-side before the final exchange."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    joined = salted_join(
        li.withColumnRenamed("l_orderkey", "okey"),
        orders.withColumnRenamed("o_orderkey", "okey"),
        "okey",
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        dec_sum("l_extendedprice").alias("revenue"),
    )
