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
