"""Merge-on-read deltas over the versioned store — upserts/deletes
without rewriting the base table.

versioning.py gives snapshot isolation but every upsert is a full-table
rewrite (merge.upsert_by_key → versioned_write); at 100 TB that is a
100 TB write for a 1k-row crawl increment.  The standard fix (Iceberg
equality deletes / Delta deletion vectors / Hudi MOR) is to land only
the CHANGE as a new version — a tiny parquet of deleted keys and
upserted rows — and have readers merge base + deltas at scan time;
periodic compaction folds the deltas back into a new base so read
amplification stays bounded.

Layout under the collection path (same `_LATEST` pointer contract as
versioning.py, so crash-mid-write leaves the prior version live):

    v=1/base/        full parquet snapshot
    v=2/delta/deletes/   parquet of key column only   (optional)
    v=2/delta/upserts/   parquet of full rows         (optional)
    v=3/base/        compaction output (folds v=1..2)

Read resolution for version V: newest base B ≤ V, then deltas
B+1..V applied in order — delete keys anti-join, upsert keys anti-join +
union (last writer wins per key, matching the reference's overwrite-by-id
upsert, TencentVDB.py:70).  The anti-join chain length equals deltas
since last compaction — the compaction cadence is the read-amplification
knob.  At 100 TB the delete-key files additionally carry min/max stats
(they're parquet), so Spark prunes anti-join input by key range for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawling_vectordb_llm_spark.versioning import (
    latest_version,
    promote_staged,
    stage_path,
    versioned_write,
)


def mor_write_base(df: DataFrame, path: str) -> int:
    """Full snapshot as v=N/base (the MOR analog of versioned_write).
    Staged then atomically renamed — a version directory is only ever
    observed complete (ADVICE r2)."""
    staged = stage_path(path)
    df.write.mode("overwrite").parquet(os.path.join(staged, "base"))
    return promote_staged(path, staged)


def mor_upsert(rows: DataFrame, path: str, key: str = "id") -> int:
    """Land an upsert as a delta version: only the new rows are written
    (their keys double as the implicit delete set).  O(|rows|) I/O."""
    staged = stage_path(path)
    rows.write.mode("overwrite").parquet(os.path.join(staged, "delta", "upserts"))
    return promote_staged(path, staged)


def mor_delete(keys: DataFrame, path: str, key: str = "id") -> int:
    """Land a delete as a delta version holding only the key column —
    the equality-delete file.  O(|keys|) I/O."""
    staged = stage_path(path)
    keys.select(key).write.mode("overwrite").parquet(
        os.path.join(staged, "delta", "deletes")
    )
    return promote_staged(path, staged)


def mor_read(
    spark: SparkSession, path: str, key: str = "id", version: int | None = None
) -> DataFrame:
    """Resolve base + deltas at `version` (default: pointer).  Pure plan
    construction — the merge is lazy anti-join/union stages."""
    v = version if version is not None else latest_version(path)
    if v is None:
        raise FileNotFoundError(f"no versions at {path}")
    base_v = None
    for cand in range(v, 0, -1):
        if os.path.isdir(os.path.join(path, f"v={cand}", "base")):
            base_v = cand
            break
    if base_v is None:
        raise FileNotFoundError(f"no base version at or below v={v} in {path}")
    df = spark.read.parquet(os.path.join(path, f"v={base_v}", "base"))
    for dv in range(base_v + 1, v + 1):
        ddir = os.path.join(path, f"v={dv}", "delta")
        del_dir = os.path.join(ddir, "deletes")
        up_dir = os.path.join(ddir, "upserts")
        if os.path.isdir(del_dir):
            dels = spark.read.parquet(del_dir).select(key)
            df = df.join(F.broadcast(dels), key, "left_anti")
        if os.path.isdir(up_dir):
            ups = spark.read.parquet(up_dir)
            df = df.join(
                F.broadcast(ups.select(key)), key, "left_anti"
            ).unionByName(ups)
    return df


def mor_compact(spark: SparkSession, path: str, key: str = "id") -> int:
    """Fold base + all deltas into a fresh base version (bounds the
    anti-join chain).  Readers pinned to older versions are untouched —
    same MVCC story as versioning.compact."""
    resolved = mor_read(spark, path, key=key)
    return mor_write_base(resolved, path)


def delta_chain_length(path: str, version: int | None = None) -> int:
    """How many delta versions a read at `version` must merge — the
    compaction trigger metric (compact when this exceeds the budget)."""
    v = version if version is not None else latest_version(path)
    if v is None:
        return 0
    n = 0
    for cand in range(v, 0, -1):
        if os.path.isdir(os.path.join(path, f"v={cand}", "base")):
            return n
        n += 1
    return n


__all__ = [
    "mor_write_base",
    "mor_upsert",
    "mor_delete",
    "mor_read",
    "mor_compact",
    "delta_chain_length",
    "versioned_write",
]
