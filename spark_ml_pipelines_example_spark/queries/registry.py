"""Declared-query registry.

Every operator the engine claims (SURVEY §2.2) registers here as a
``QuerySpec``: a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus,
when SQL-expressible, the DuckDB oracle SQL the driver hash-checks it
against. ``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views
over this registry.

Hash-match discipline (SURVEY §2.4) enforced by convention throughout the
query modules:
- money aggregates go through ``decimal(18,2)`` casts (exact, order-independent);
- nondeterministic-in-last-ulp doubles (stddev/corr/log/pow) are rounded;
- every computed column is aliased identically in Spark and oracle SQL;
- sorts/limits always carry a unique tie-break key;
- timestamps are projected as dates or epoch bigints, never raw ns values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL twin; None → driver does rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering a declared query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tags, doc=(fn.__doc__ or "").strip()
        )
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: registration) and return
    the full registry."""
    from . import (  # noqa: F401
        aggregates,
        dedup,
        filters,
        functions_scalar,
        joins,
        ml,
        multimodal,
        scans,
        setops,
        similarity,
        streaming_batch,
        subqueries,
        text,
        windows,
    )
    from ..operators import clusters as _op_clusters  # noqa: F401
    from ..operators import grouped_pandas as _op_grouped_pandas  # noqa: F401
    from ..operators import merge as _op_merge  # noqa: F401
    from ..operators import multimodal as _op_multimodal  # noqa: F401
    from ..operators import profile as _op_profile  # noqa: F401
    from ..operators import rangejoin as _op_rangejoin  # noqa: F401
    from ..operators import scd as _op_scd  # noqa: F401
    from ..operators import similarity as _op_similarity  # noqa: F401

    return REGISTRY
