"""The vector collection as a first-class Spark FORMAT — `vdb` — with
both a batch writer (the reference's upsert sink, TencentVDB.py:63-79,
re-expressed as `df.write.format("vdb")`) and a reader for round trips
(Python Data Source API, Spark 4.0+).

Write path: every task stages its partition as one parquet file; the
driver-side `commit` assembles the next version in a staging directory
(append mode additionally hardlinks the prior version's files — file
reuse, not rewrite), atomically renames it to `v=N`, then flips the
`_LATEST` pointer — the versioned-write contract of versioning.py, so a
`vdb` write is snapshot-isolated and crash-safe (an aborted or crashed
job leaves only an orphaned staging dir, never a half-visible version).
`path` must be storage every node can reach
(local disk in local mode, a shared filesystem / object store on a
cluster) — the same assumption versioning.py already makes.

Read path: one InputPartition per parquet file of the pointed-to version,
decoded with pyarrow — so `spark.read.format("vdb").load(path)` sees
exactly what `versioning.read_version` sees, through the format registry.
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

from crawling_vectordb_llm_spark.versioning import (
    _flip_pointer,
    _versions,
    latest_version,
    promote_staged,
    stage_path,
)

_ARROW_TO_DDL = {
    "string": "string",
    "large_string": "string",
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "bigint",
    "float": "float",
    "double": "double",
    "bool": "boolean",
    "binary": "binary",
    "date32[day]": "date",
}


def _arrow_field_ddl(field) -> str:
    import pyarrow as pa

    t = field.type
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        inner = _ARROW_TO_DDL.get(str(t.value_type))
        if inner is None:
            raise ValueError(f"unsupported list element type {t.value_type}")
        return f"{field.name} array<{inner}>"
    if pa.types.is_timestamp(t):
        return f"{field.name} timestamp"
    ddl = _ARROW_TO_DDL.get(str(t))
    if ddl is None:
        raise ValueError(f"unsupported arrow type {t} for column {field.name}")
    return f"{field.name} {ddl}"


def _version_files(path: str, version: int | None = None) -> list[str]:
    v = version if version is not None else latest_version(path)
    if v is None:
        raise FileNotFoundError(f"no versions at {path}")
    vdir = os.path.join(path, f"v={v}")
    if not os.path.isdir(vdir):
        raise FileNotFoundError(f"version {v} does not exist at {path}")
    return sorted(
        os.path.join(vdir, f)
        for f in os.listdir(vdir)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )


class VdbReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.path = options["path"]
        # time travel: option("version", N) pins a snapshot (default:
        # pointer), same contract as versioning.read_version
        v = options.get("version")
        self.version = int(v) if v is not None else None

    def partitions(self) -> Sequence[InputPartition]:
        return [InputPartition(f) for f in _version_files(self.path, self.version)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        import pyarrow.parquet as pq

        table = pq.read_table(partition.value)
        for batch in table.to_batches():
            yield from zip(*(col.to_pylist() for col in batch.columns))


@dataclass
class _Staged(WriterCommitMessage):
    file: str | None


def _carry_forward(path: str, staged: str, start: int) -> int:
    """Hardlink (fallback: copy) the current version's files into the
    staged dir — append semantics reuse prior data files instead of
    rewriting them, exactly how Delta/Iceberg snapshots share files.
    Returns the next file ordinal."""
    i = start
    prior = latest_version(path)
    if prior is None:
        return i
    for f in _version_files(path, prior):
        dst = os.path.join(staged, f"part-{i:05d}-{uuid.uuid4().hex[:8]}.parquet")
        try:
            os.link(f, dst)
        except OSError:
            shutil.copy2(f, dst)
        i += 1
    return i


class VdbWriter(DataSourceWriter):
    """Stage-then-promote versioned sink (S5 upsert sink semantics: each
    job lands one immutable new version; concurrent readers keep theirs).

    mode("append") unions the prior version's files (hardlinked, not
    rewritten) with the incoming rows; mode("overwrite") lands a snapshot
    of only the incoming rows (ADVICE r2 — append used to silently drop
    prior rows).  Either way the new version directory is built fully in
    staging and atomically renamed into place, so a crash mid-commit can
    never leave a half-visible version."""

    def __init__(self, options: dict, schema, overwrite: bool) -> None:
        self.path = options["path"]
        self.spark_schema = schema
        self.overwrite = overwrite
        # unique per job so two concurrent writes never share staging
        self.staging = os.path.join(self.path, f"_staging_{uuid.uuid4().hex[:12]}")

    def write(self, it: Iterator) -> _Staged:
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext
        from pyspark.sql.pandas.types import to_arrow_schema

        rows = [r.asDict() for r in it]
        if not rows:
            return _Staged(file=None)
        os.makedirs(self.staging, exist_ok=True)
        ctx = TaskContext.get()
        # attempt id in the name: a speculative/retried attempt must never
        # clobber the winner's staged file (ADVICE r2)
        f = os.path.join(
            self.staging,
            f"part-{ctx.partitionId():05d}-a{ctx.taskAttemptId()}.parquet",
        )
        # write with the DataFrame's declared schema — from_pylist would
        # re-infer (e.g. float32 arrays widen to double) and break the
        # read-back schema contract
        pq.write_table(
            pa.Table.from_pylist(rows, schema=to_arrow_schema(self.spark_schema)), f
        )
        return _Staged(file=f)

    def commit(self, messages: Sequence[_Staged]) -> None:
        files = [m.file for m in messages if m and m.file]
        staged = stage_path(self.path)
        os.makedirs(staged)
        i = 0 if self.overwrite else _carry_forward(self.path, staged, 0)
        for f in files:
            os.replace(
                f,
                os.path.join(
                    staged, f"part-{i:05d}-{uuid.uuid4().hex[:8]}.parquet"
                ),
            )
            i += 1
        promote_staged(self.path, staged)
        shutil.rmtree(self.staging, ignore_errors=True)

    def abort(self, messages: Sequence[_Staged]) -> None:
        shutil.rmtree(self.staging, ignore_errors=True)


class VdbStreamWriter(DataSourceStreamWriter):
    """Streaming sink: every micro-batch commits as ONE new immutable
    version (same stage-then-promote protocol as the batch writer).  In
    append output mode each version carries the prior version forward
    (hardlinked), so the pointer version is always the full table — the
    chain a sequence of batch `mode("append")` writes would build.  In
    complete mode (overwrite) each version is that batch's snapshot.

    Exactly-once across restarts (ADVICE r2): the batchId is recorded
    INSIDE the staged directory before the atomic rename, so promotion
    itself is idempotent-by-batch-identity — commit() first scans for an
    already-promoted version carrying this batchId and only then builds a
    new one; the `_LATEST` flip happens last and is repaired on replay.
    There is no ordering window in which a replayed batch can double-land:
    either the rename happened (batch found, skipped) or it didn't
    (staging is orphaned, batch lands fresh)."""

    def __init__(self, options: dict, schema, overwrite: bool) -> None:
        self.path = options["path"]
        self.spark_schema = schema
        self.overwrite = overwrite

    def _staging(self, batch_id: int) -> str:
        return os.path.join(self.path, f"_staging_batch_{batch_id}")

    def _promoted_version(self, batch_id: int) -> int | None:
        for v in reversed(_versions(self.path)):
            bf = os.path.join(self.path, f"v={v}", "_batch")
            try:
                if os.path.isfile(bf) and open(bf).read().strip() == str(batch_id):
                    return v
            except OSError:
                pass
        return None

    def write(self, it: Iterator) -> _Staged:
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        ctx = TaskContext.get()
        batch_id = ctx.getLocalProperty("streaming.sql.batchId")
        staging = self._staging(int(batch_id))
        rows = [r.asDict() for r in it]
        if not rows:
            return _Staged(file=None)
        from pyspark.sql.pandas.types import to_arrow_schema

        os.makedirs(staging, exist_ok=True)
        f = os.path.join(
            staging, f"part-{ctx.partitionId():05d}-a{ctx.taskAttemptId()}.parquet"
        )
        pq.write_table(
            pa.Table.from_pylist(rows, schema=to_arrow_schema(self.spark_schema)), f
        )
        return _Staged(file=f)

    def commit(self, messages: Sequence[_Staged], batchId: int) -> None:
        os.makedirs(self.path, exist_ok=True)
        v = self._promoted_version(batchId)
        if v is None:
            files = [m.file for m in messages if m and m.file]
            staged = stage_path(self.path)
            os.makedirs(staged)
            i = 0 if self.overwrite else _carry_forward(self.path, staged, 0)
            for f in files:
                os.replace(
                    f,
                    os.path.join(
                        staged, f"part-{i:05d}-{uuid.uuid4().hex[:8]}.parquet"
                    ),
                )
                i += 1
            with open(os.path.join(staged, "_batch"), "w") as fh:
                fh.write(str(batchId))
            v = promote_staged(self.path, staged, flip=False)
        # pointer flip LAST; a replay after a crash between rename and
        # flip finds the version above and repairs the pointer here
        cur = latest_version(self.path)
        if cur is None or cur < v:
            _flip_pointer(self.path, v)
        shutil.rmtree(self._staging(batchId), ignore_errors=True)

    def abort(self, messages: Sequence[_Staged], batchId: int) -> None:
        shutil.rmtree(self._staging(batchId), ignore_errors=True)


class VdbDataSource(DataSource):
    """`df.write.format("vdb").option("path", p).mode("append").save()` /
    `spark.read.format("vdb").option("path", p).load()`."""

    @classmethod
    def name(cls) -> str:
        return "vdb"

    def schema(self) -> str:
        import pyarrow.parquet as pq

        v = self.options.get("version")
        files = _version_files(
            self.options["path"], int(v) if v is not None else None
        )
        if not files:
            raise FileNotFoundError(f"version at {self.options['path']} is empty")
        sch = pq.read_schema(files[0])
        return ", ".join(_arrow_field_ddl(f) for f in sch)

    def reader(self, schema) -> VdbReader:
        return VdbReader(self.options)

    def writer(self, schema, overwrite: bool) -> VdbWriter:
        return VdbWriter(self.options, schema, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> VdbStreamWriter:
        return VdbStreamWriter(self.options, schema, overwrite)


def register(spark) -> None:
    spark.dataSource.register(VdbDataSource)
