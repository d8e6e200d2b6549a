"""Vector-similarity kernels as pure Catalyst expressions.

SURVEY §4.4: cosine has no single Spark primitive, but
``zip_with`` + ``aggregate`` compose one that stays inside whole-stage
codegen — no Python boundary, no Arrow transfer, vectorizable by Tungsten.
This beats a pandas UDF for the 64-dim case because the per-batch Arrow
round-trip dominates at small dim; a pandas-UDF variant exists in
``operators/similarity.py`` for very high dimensions where NumPy's SIMD
wins.

All arithmetic is double-precision, folded left-to-right — the same
evaluation order DuckDB's list_dot_product uses, so results are
bit-comparable for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i — elementwise product then sequential fold, in double."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """dot(a,b) / (|a|·|b|) — NaN-free for the fixture data (no zero
    vectors); callers round before hashing (§2.4)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
