"""Versioned collection storage — snapshot isolation on plain parquet.

The reference declares EVENTUAL read consistency client-wide
(TencentVDB.py:18-19) and upserts in place; a batch engine can do better
with zero extra infrastructure: every write lands in a fresh `v=N`
directory and a tiny `_LATEST` pointer file flips atomically (os.replace)
after the data is fully written.  Readers resolve the pointer once and
then scan an immutable directory — a reader that started on v3 keeps a
consistent snapshot while v4 lands, which is exactly the J4 semantics the
reference outsources to its service.

At scale this is the poor-man's core of Delta/Iceberg: directory-level
MVCC with last-write-wins pointer flips.  What it deliberately does NOT
provide: concurrent-WRITER conflict detection (two simultaneous writers
race on the pointer) — single-writer pipelines (the crawl->upsert loop)
are the intended regime; a lock/txn layer is the upgrade path.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_LATEST"


def _versions(path: str) -> list[int]:
    if not os.path.isdir(path):
        return []
    return sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(path)
        if d.startswith("v=") and d.split("=", 1)[1].isdigit()
    )


def versioned_write(df: DataFrame, path: str) -> int:
    """Write `df` as the next version of the collection at `path`; returns
    the new version number.  The `_LATEST` pointer flips only after the
    parquet write completes, so a crash mid-write leaves the previous
    version live and the partial directory orphaned (vacuumable)."""
    os.makedirs(path, exist_ok=True)
    version = (_versions(path)[-1] + 1) if _versions(path) else 1
    vdir = os.path.join(path, f"v={version}")
    df.write.mode("overwrite").parquet(vdir)
    fd, tmp = tempfile.mkstemp(dir=path, prefix="._latest_")
    with os.fdopen(fd, "w") as f:
        f.write(str(version))
    os.replace(tmp, os.path.join(path, _POINTER))  # atomic pointer flip
    return version


def latest_version(path: str) -> int | None:
    p = os.path.join(path, _POINTER)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return int(f.read().strip())


def read_version(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a pinned version (time travel) or the pointer's current one.
    The returned DataFrame scans an immutable directory — later writes
    never change what this reader sees."""
    v = version if version is not None else latest_version(path)
    if v is None:
        raise FileNotFoundError(f"no versions at {path}")
    return spark.read.parquet(os.path.join(path, f"v={v}"))


def list_versions(path: str) -> list[int]:
    return _versions(path)


def compact(
    spark: SparkSession,
    path: str,
    target_rows_per_file: int = 1_000_000,
) -> int:
    """Small-file compaction: rewrite the CURRENT version's data as a new
    version with ~target_rows_per_file rows per parquet file.  Returns the
    new version number.

    Incremental upserts (streaming foreachBatch, per-crawl merges) each
    land a handful of rows per task and a 100 TB table degrades into
    millions of KB-sized files — open/footer overhead then dominates every
    scan and the driver's file listing itself becomes the bottleneck.
    Compaction is the standard housekeeping (Delta OPTIMIZE / Iceberg
    rewrite_data_files): coalesce to ceil(rows/target) files, written as a
    NEW snapshot so concurrent readers of the old version are untouched
    (same MVCC guarantee as any versioned_write); old versions age out via
    vacuum().  Row content is preserved exactly — compaction is a physical
    rewrite, not a logical change.
    """
    df = read_version(spark, path)
    n_rows = df.count()
    n_files = max(1, -(-n_rows // target_rows_per_file))
    return versioned_write(df.coalesce(n_files), path)


def vacuum(path: str, keep: int = 2) -> list[int]:
    """Drop old versions (never the pointer target), keeping at least the
    newest `keep`.  Returns the removed version numbers.

    MoR-aware (ADVICE r1): under the merge-on-read layout (mor.py) a
    retained delta version is only readable through the newest `base` at or
    below it PLUS every delta between that base and itself — deleting the
    base (or any intermediate delta) would make every retained version
    unreadable or silently wrong.  The removal cutoff therefore backs up
    from the oldest retained version to its supporting base; pure-cow
    layouts (no base/ subdir anywhere) keep the plain newest-`keep`
    behavior."""
    import shutil

    vs = _versions(path)
    if len(vs) <= keep:
        return []
    live = latest_version(path)
    cutoff = vs[-keep]  # oldest retained version
    for v in reversed([v for v in vs if v <= cutoff]):
        if os.path.isdir(os.path.join(path, f"v={v}", "base")):
            cutoff = v
            break
    removable = [v for v in vs if v < cutoff and v != live]
    for v in removable:
        shutil.rmtree(os.path.join(path, f"v={v}"), ignore_errors=True)
    return removable


def history(spark: SparkSession, path: str) -> DataFrame:
    """DESCRIBE HISTORY analog (Delta/Iceberg parity): one row per
    version with its physical layout — file count, bytes, layout kind
    (cow snapshot / mor base / mor delta), and whether the pointer
    currently targets it.  Driver-side directory walk (version counts are
    small by construction); returned as a DataFrame so it composes with
    SQL like any other table."""
    live = latest_version(path)
    rows = []
    for v in _versions(path):
        vdir = os.path.join(path, f"v={v}")
        kind = "cow"
        if os.path.isdir(os.path.join(vdir, "base")):
            kind = "base"
        elif os.path.isdir(os.path.join(vdir, "delta")):
            kind = "delta"
        n_files = 0
        n_bytes = 0
        for root, _dirs, files in os.walk(vdir):
            for f in files:
                if f.endswith(".parquet"):
                    n_files += 1
                    n_bytes += os.path.getsize(os.path.join(root, f))
        rows.append((v, kind, n_files, n_bytes, v == live))
    return spark.createDataFrame(
        rows,
        "version int, kind string, n_files int, n_bytes bigint, is_latest boolean",
    )
