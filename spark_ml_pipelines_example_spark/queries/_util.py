"""Shared helpers for declared queries — hash-match discipline (SURVEY §2.4).

The driver compares Spark vs DuckDB by row count + schema + order-insensitive
value hash, so every query must produce bit-identical values in both engines:

- ``dec(col)`` casts money doubles to ``decimal(18,2)`` *before* SUM: decimal
  addition is exact and order-independent, so shuffle/partition order can't
  change the result (a raw ``sum(double)`` differs run-to-run at scale).
- ``avg_exact`` derives averages as ``cast(exact_decimal_sum as double) /
  count`` — one deterministic IEEE division instead of an order-dependent
  running mean.
- ``epoch_s`` projects timestamps as floor-to-second epoch BIGINTs; raw
  timestamps differ between engines in precision (ns vs µs) and tz-ness.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.io import load_table

SCRATCH = "/root/repo/.scratch"


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def dec(col: str | Column, precision: int = 18, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dec_sum(col: str | Column, precision: int = 18, scale: int = 2) -> Column:
    """Exact, order-independent SUM of a money column.

    The accumulation happens in decimal (exact regardless of shuffle/merge
    order); the *result* is cast to double because the exact decimal →
    double conversion is bit-identical in Spark and DuckDB, while decimal
    output types round-trip differently through pandas/arrow in the two
    engines. At driver scale factors the sums are well inside double's 2^53
    exact-integer range; a production 100 TB deployment would keep the
    decimal output type."""
    return F.sum(dec(col, precision, scale)).cast("double")


def avg_exact(col: str | Column, scale: int = 2) -> Column:
    """Order-independent average: exact decimal sum → double → one division."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c, 18, scale)).cast("double") / F.count(c)


def epoch_s(col: str | Column) -> Column:
    """Timestamp → epoch seconds (floor), matching DuckDB
    ``CAST(epoch(date_trunc('second', ts)) AS BIGINT)``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_timestamp(c)


# DuckDB-side twin fragments, for readability of oracle SQL strings.
ORACLE_EPOCH_S = "CAST(epoch(date_trunc('second', {col})) AS BIGINT)"


def scratch_dir(query_name: str, sf_dir: str) -> str:
    """Per-(query, sf) scratch path for sink round-trips and model dirs."""
    tag = sf_dir.rstrip("/").replace("/", "_").lstrip("_")
    return f"{SCRATCH}/{query_name}/{tag}"


# VERDICT r9 #6: the two declared quadratic AUDIT TWINS
# (q_ml_knn_classifier, q_dedup_embedding) are recall-ground-truth
# sweeps — O(corpus²/blocks) by construction, documented and priced
# (12.1× / 24× at 10× data). Nothing used to stop a user pointing them
# at a 100× corpus; this cap does. 250k vectors ≈ 6·10^9 within-block
# pairs — past any defensible audit budget — while every test/driver SF
# (≤2k) and the staged 10×/30×/100× probe corpora (≤200k) stay under it.
QUADRATIC_AUDIT_CAP = 250_000


def guard_quadratic_audit(n_vectors: int, query: str, sibling: str) -> None:
    """Fail LOUD (with the scale-safe sibling named) when a quadratic
    audit twin is pointed at a corpus past QUADRATIC_AUDIT_CAP."""
    if n_vectors > QUADRATIC_AUDIT_CAP:
        raise ValueError(
            f"{query} is the exact quadratic audit twin (within-block "
            f"all-pairs); at {n_vectors:,} vectors (> cap "
            f"{QUADRATIC_AUDIT_CAP:,}) the pair count is past any audit "
            f"budget. Use the scale-safe declared sibling {sibling}, or "
            f"audit a sampled block under the cap."
        )
