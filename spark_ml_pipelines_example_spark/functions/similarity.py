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


# The fixture embedding dimensionality (FIXTURES.md §B).
EMBEDDING_DIM = 64


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i — elementwise product then sequential fold, in double
    (DuckDB list_dot_product's order, so results are bit-comparable).

    Measured note: an unrolled 64-term `element_at` chain was tried and
    LOST — it blows the Janino 64KB method limit inside join codegen
    (InternalCompilerException → interpreted fallback) and the flat
    interpreted tree evaluates ~3× slower than this higher-order
    expression. The HOF is outside whole-stage codegen but its evaluator
    loop is tight; the real pairwise-join win is precomputing each side's
    norm BEFORE the join (see cosine_prenorm) so per-pair work is one dot,
    not one dot plus two norms."""
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


def cosine_prenorm(ea: Column, eb: Column, na: Column, nb: Column) -> Column:
    """Pairwise-join cosine where each side's norm was projected before
    the join: per-pair cost drops from 3 folds to 1 (norms are per-vector,
    O(n), not per-pair, O(pairs))."""
    return dot(ea, eb) / (na * nb)


def cosine_probe(a: Column, probe: list[float]) -> Column:
    """Cosine against a driver-side constant probe (top-k search hot
    path): the probe's norm is folded to a literal here — computed with
    the same left-to-right float64 order as the engines, so oracle parity
    holds — leaving one dot + one norm of `a` per row."""
    import math

    vals = [float(v) for v in probe]
    sq = 0.0
    for v in vals:
        sq = sq + v * v
    lit_probe = F.array(*[F.lit(v) for v in vals])
    return dot(a, lit_probe) / (l2_norm(a) * F.lit(math.sqrt(sq)))
