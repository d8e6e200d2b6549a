"""Minimal file-manifest table format: snapshot isolation + time travel.

The environment ships no Delta/Iceberg, but their public READ mechanics
are simple and worth owning (Armbrust et al., "Delta Lake: High-Performance
ACID Table Storage over Cloud Object Stores", VLDB 2020): a table is a
directory of IMMUTABLE data files plus an ordered log of manifests, where
version v's manifest lists exactly the files live at v. Commits never
mutate data files — an append adds files to the next manifest, a delete
drops them from it — so any historical version stays readable forever
(time travel) and a reader that resolved its manifest before a concurrent
commit sees a consistent snapshot (isolation).

Scale posture: the log is KB-sized JSON resolved on the DRIVER (exactly
how Delta's log replay works — the data path never touches it), and the
resolved file list feeds ONE ``spark.read.parquet(*files)`` scan, so
Catalyst still sees a plain multi-file parquet relation with predicate
pushdown, column pruning, and file-level parallelism intact. Nothing
about the mechanism changes at 100 TB: manifests grow with file COUNT,
not bytes, and production formats checkpoint the log the same way.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

_LOG = "_log"


def _log_dir(base: str) -> str:
    return os.path.join(base, _LOG)


def init_table(base: str) -> None:
    """Create (or reset) an empty table at ``base``."""
    import shutil

    if os.path.exists(base):
        shutil.rmtree(base)
    os.makedirs(_log_dir(base))


def _data_files(seg_dir: str) -> list[str]:
    """The committed parquet part-files of a written segment directory."""
    return sorted(
        os.path.join(seg_dir, f)
        for f in os.listdir(seg_dir)
        if f.endswith(".parquet") and f.startswith("part-")
    )


def versions(base: str) -> list[int]:
    return sorted(
        int(f[: -len(".json")])
        for f in os.listdir(_log_dir(base))
        if f.endswith(".json")
    )


class CommitConflict(Exception):
    """Raised when an optimistic commit loses the race: the table moved
    past the version the writer based its changes on."""


def commit_snapshot(
    base: str,
    files: list[str],
    version: int | None = None,
    expect_version: int | None = None,
) -> int:
    """Write the next manifest. ``files`` is the COMPLETE live set at this
    version (copy-on-write semantics: append = previous files + new,
    delete = previous files minus dropped).

    ``expect_version`` enables OPTIMISTIC CONCURRENCY (the Delta commit
    protocol): the writer declares the version it read before computing
    its change; if the log has advanced past it, the commit raises
    CommitConflict and the writer must re-read, re-resolve, and retry —
    lost updates are impossible because the version slot itself is
    claimed atomically: the commit point is ``os.link(tmp, final)``,
    which fails with EEXIST for every racer after the first (POSIX
    link(2) never replaces an existing destination, unlike rename(2),
    which silently does — an exists()-then-rename sequence would be a
    TOCTOU lost-update window)."""
    vs = versions(base)
    latest = vs[-1] if vs else None
    if expect_version is not None and latest != expect_version:
        raise CommitConflict(
            f"table at version {latest}, writer based on {expect_version}"
        )
    v = (vs[-1] + 1 if vs else 0) if version is None else version
    manifest = {"version": v, "files": sorted(files)}
    tmp = os.path.join(_log_dir(base), f".{v}.json.tmp.{os.getpid()}")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1)
    final = os.path.join(_log_dir(base), f"{v}.json")
    try:
        # atomic slot claim: hard-link raises FileExistsError for the
        # loser, so exactly one writer's manifest becomes visible under
        # the committed name (same single-op commit protocol Delta uses)
        os.link(tmp, final)
    except FileExistsError:
        raise CommitConflict(f"version {v} already committed") from None
    finally:
        os.remove(tmp)
    return v


def manifest(base: str, version: int) -> dict:
    with open(os.path.join(_log_dir(base), f"{version}.json")) as fh:
        return json.load(fh)


def write_segment(df: DataFrame, base: str, name: str) -> list[str]:
    """Write an immutable data segment; returns its part-file paths.
    Segments are never rewritten — manifests decide liveness."""
    seg = os.path.join(base, "data", name)
    df.write.mode("errorifexists").parquet(seg)
    return _data_files(seg)


def read_version(spark: SparkSession, base: str, version: int) -> DataFrame:
    """Time-travel read: resolve version's manifest, scan exactly its
    files. An empty manifest is represented as an empty frame with no
    rows (caller supplies schema context via the files themselves)."""
    files = manifest(base, version)["files"]
    return spark.read.parquet(*files)


def read_latest(spark: SparkSession, base: str) -> DataFrame:
    return read_version(spark, base, versions(base)[-1])


def vacuum(base: str, keep_versions: int) -> dict:
    """File garbage collection (Delta VACUUM / Iceberg expire_snapshots):
    drop the manifests older than the last ``keep_versions`` commits,
    then delete every data file no RETAINED manifest references. Returns
    ``{"removed_files": n, "removed_versions": [..], "live_files": m}``.

    Correctness argument (same as the production formats'): a file is
    deletable iff no retained manifest lists it — readers of retained
    versions never touch it, and writers never re-reference old files
    (segments are immutable, commits copy-on-write). Time travel to an
    expired version fails loudly afterwards, which is the documented
    trade of running VACUUM."""
    vs = versions(base)
    retained = vs[-keep_versions:] if keep_versions > 0 else []
    expired = [v for v in vs if v not in retained]
    live: set[str] = set()
    for v in retained:
        live |= set(manifest(base, v)["files"])
    dead: set[str] = set()
    for v in expired:
        dead |= set(manifest(base, v)["files"])
    dead -= live
    for p in sorted(dead):
        if os.path.exists(p):
            os.remove(p)
    for v in expired:
        os.remove(os.path.join(_log_dir(base), f"{v}.json"))
    return {
        "removed_files": len(dead),
        "removed_versions": expired,
        "live_files": len(live),
    }
