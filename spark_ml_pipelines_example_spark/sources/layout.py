"""Physical-layout helpers — the 100 TB posture (SURVEY §7 step 9).

The reference's only layout decision is `repartition(1)` before write
(reference `pipeline/Predict.scala:60` — an anti-pattern we do not
replicate). At scale, layout is the difference between a query that
shuffles the fact table and one that reads exactly the partitions it
needs:

- **Hive-partitioned writes** (`write_partitioned`): low-cardinality keys
  (date buckets, lang, cell id) become directories, so selective queries
  hit partition pruning (visible as `PartitionFilters` in the scan node)
  instead of reading and discarding.
- **Bucketed tables** (`write_bucketed`): hash-bucket both sides of a
  recurring equi-join on the join key and the shuffle disappears from
  every future join — the exchange is paid once at write time.
- **Salting** (`with_salt` / `salted_groupby_agg` / `salted_broadcast_join`):
  when one key dominates (the skew AQE can't always fix, e.g. a single
  giant group in a groupBy), spread it across `n_salts` sub-keys, do the
  heavy work per sub-key, then merge. Aggregations must be decomposable
  (sum/count/min/max re-aggregate; avg = sum/count at the merge step).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def single_file_output(df: DataFrame) -> DataFrame:
    """The reference's `repartition(1)` intent (one output file) without
    the full round-robin shuffle: coalesce folds existing partitions."""
    return df.coalesce(1)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Hive-style partitioned parquet write. `max_records_per_file` caps
    file size inside hot partitions (small-file control without a global
    repartition)."""
    w = df.write.mode(mode).partitionBy(*partition_cols)
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
    one_file_per_bucket: bool = False,
) -> None:
    """Persist as a bucketed (and optionally sorted) table. Two tables
    bucketed on the same key with the same bucket count join with zero
    exchanges (and zero sorts if sorted); Spark requires saveAsTable for
    bucket metadata.

    ``one_file_per_bucket`` repartitions on the bucket key first so each
    bucket is exactly one file — Spark only trusts ``sortBy`` metadata
    (and elides the join-side Sort) when buckets are single-file. Leave
    it False for huge tables where one file per bucket would be too big;
    the join still skips the Exchange, it just re-sorts in-bucket."""
    if one_file_per_bucket:
        df = df.repartition(num_buckets, *[F.col(c) for c in bucket_cols])
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def with_salt(df: DataFrame, n_salts: int, salt_col: str = "__salt") -> DataFrame:
    """Deterministic salt in [0, n_salts): hash of the whole row spread by
    pmod. Deterministic per row content (no rand()), so retries/speculative
    tasks agree."""
    return df.withColumn(
        salt_col, F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )


def salted_groupby_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation: groupBy(keys + salt) computes
    partials, groupBy(keys) merges. `aggs` maps output name →
    (partial_agg_expr: Column, merge: Callable[[Column], Column]); both
    phases are hash aggregates, so the giant key's work spreads over
    n_salts reducers in phase 1 and the phase-2 input is only
    |groups|·n_salts rows."""
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, "__salt").agg(
        *[p.alias(f"__p_{name}") for name, (p, _) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[merge(F.col(f"__p_{name}")).alias(name) for name, (_, merge) in aggs.items()]
    )


def salted_broadcast_join(
    skewed: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the skewed side, replicate the small side
    across all salt values (explode — it is small by assumption), join on
    key + salt. Every hot key's rows land on n_salts reducers instead of
    one. With AQE skew-join splitting this is rarely needed; it remains
    the explicit fallback for pathological keys AQE under-splits."""
    salted = with_salt(skewed, n_salts)
    replicated = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted.join(replicated, [*on, "__salt"], how)
    return out.drop("__salt")


def zorder_key(c1: Column, c2: Column, bits: int = 16) -> Column:
    """Morton (Z-order) interleave of two non-negative integer keys into
    one clustering key: bit b of each input lands at positions 2b+1 / 2b.

    Sorting by this key co-clusters BOTH dimensions, so parquet per-file
    and per-row-group min/max stats become selective for range filters
    on either column — the multi-dimensional data-skipping layout
    (Delta/Iceberg OPTIMIZE ZORDER does exactly this interleave). The
    expression is a static tree of shift/and/or ops — whole-stage
    codegen, no UDF. Inputs must fit in ``bits`` bits; production
    pipelines first normalize each column to its rank space (e.g.
    ``ntile(65536)``) so arbitrary domains and skew map uniformly."""
    k1, k2 = c1.cast("long"), c2.cast("long")
    z = F.lit(0).cast("long")
    one = F.lit(1).cast("long")
    for b in range(bits):
        z = (
            z.bitwiseOR(F.shiftleft(F.shiftright(k1, b).bitwiseAND(one), 2 * b + 1))
            .bitwiseOR(F.shiftleft(F.shiftright(k2, b).bitwiseAND(one), 2 * b))
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    c1: str,
    c2: str,
    n_files: int = 16,
    bits: int = 8,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` Z-ordered on (c1, c2): range-partition by the
    Morton key (contiguous key ranges per file → tight per-file min/max
    on both dims), sort within partitions, drop the key from the data.
    ``repartitionByRange`` samples the key distribution, so files are
    balanced even when the key space is sparse.

    Each column is first normalized linearly to its own ``bits``-wide
    cell space from one tiny min/max aggregate — WITHOUT this, the
    wider-domain key's high bits dominate the interleave and the narrow
    key degenerates to an afterthought (a plain sort on c1). Linear
    scaling assumes roughly uniform keys; heavily skewed domains should
    rank-normalize (ntile) instead."""
    lo1, hi1, lo2, hi2 = df.agg(
        F.min(c1), F.max(c1), F.min(c2), F.max(c2)
    ).head()
    cells = 1 << bits

    def norm(c, lo, hi):
        return ((F.col(c) - lo) * cells / (hi - lo + 1)).cast("long")

    zk = zorder_key(norm(c1, lo1, hi1), norm(c2, lo2, hi2), bits=bits)
    (
        df.withColumn("__zk", zk)
        .repartitionByRange(n_files, "__zk")
        .sortWithinPartitions("__zk")
        .drop("__zk")
        .write.mode(mode)
        .parquet(path)
    )
