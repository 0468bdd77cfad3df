"""The vector collection as a first-class Spark FORMAT — `vdb` — with
both a batch writer (the reference's upsert sink, TencentVDB.py:63-79,
re-expressed as `df.write.format("vdb")`) and a reader for round trips
(Python Data Source API, Spark 4.0+).

Write path: every task stages its partition as one parquet file; the
driver-side `commit` promotes the staged files into the next `v=N`
directory and flips the `_LATEST` pointer — the exact versioned-write
contract of versioning.py, so a `vdb` write is snapshot-isolated and
crash-safe (an aborted job leaves only an orphaned staging dir, never a
half-visible version).  `path` must be storage every node can reach
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

from crawling_vectordb_llm_spark.versioning import _versions, latest_version

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


class VdbWriter(DataSourceWriter):
    """Stage-then-promote versioned sink (S5 upsert sink semantics: each
    job lands one immutable new version; concurrent readers keep theirs)."""

    def __init__(self, options: dict, schema, overwrite: bool) -> None:
        self.path = options["path"]
        self.spark_schema = schema
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
        pid = TaskContext.get().partitionId()
        f = os.path.join(self.staging, f"part-{pid:05d}.parquet")
        # write with the DataFrame's declared schema — from_pylist would
        # re-infer (e.g. float32 arrays widen to double) and break the
        # read-back schema contract
        pq.write_table(
            pa.Table.from_pylist(rows, schema=to_arrow_schema(self.spark_schema)), f
        )
        return _Staged(file=f)

    def commit(self, messages: Sequence[_Staged]) -> None:
        files = [m.file for m in messages if m and m.file]
        os.makedirs(self.path, exist_ok=True)
        vs = _versions(self.path)
        v = (vs[-1] + 1) if vs else 1
        vdir = os.path.join(self.path, f"v={v}")
        os.makedirs(vdir)
        for f in files:
            shutil.move(f, os.path.join(vdir, os.path.basename(f)))
        import tempfile

        fd, tmp = tempfile.mkstemp(dir=self.path, prefix="._latest_")
        with os.fdopen(fd, "w") as fh:
            fh.write(str(v))
        os.replace(tmp, os.path.join(self.path, "_LATEST"))
        shutil.rmtree(self.staging, ignore_errors=True)

    def abort(self, messages: Sequence[_Staged]) -> None:
        shutil.rmtree(self.staging, ignore_errors=True)


class VdbStreamWriter(DataSourceStreamWriter):
    """Streaming sink: every micro-batch commits as ONE new immutable
    version (same stage-then-promote protocol as the batch writer), so a
    streaming ingest builds the exact version chain a sequence of batch
    writes would — readers always see whole batches, never partial ones.

    Exactly-once across restarts: the engine may replay a micro-batch
    after a crash between sink-commit and checkpoint-advance; commit()
    records the batchId in a `_batch=<id>` marker next to the version and
    silently skips a batchId it has already promoted, so a replayed batch
    cannot double-land."""

    def __init__(self, options: dict, schema) -> None:
        self.path = options["path"]
        self.spark_schema = schema

    def _staging(self, batch_id: int) -> str:
        return os.path.join(self.path, f"_staging_batch_{batch_id}")

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
        f = os.path.join(staging, f"part-{ctx.partitionId():05d}.parquet")
        pq.write_table(
            pa.Table.from_pylist(rows, schema=to_arrow_schema(self.spark_schema)), f
        )
        return _Staged(file=f)

    def commit(self, messages: Sequence[_Staged], batchId: int) -> None:
        import tempfile

        os.makedirs(self.path, exist_ok=True)
        marker = os.path.join(self.path, f"_batch={batchId}")
        if os.path.exists(marker):  # replayed micro-batch: already landed
            shutil.rmtree(self._staging(batchId), ignore_errors=True)
            return
        files = [m.file for m in messages if m and m.file]
        vs = _versions(self.path)
        v = (vs[-1] + 1) if vs else 1
        vdir = os.path.join(self.path, f"v={v}")
        os.makedirs(vdir)
        for f in files:
            shutil.move(f, os.path.join(vdir, os.path.basename(f)))
        fd, tmp = tempfile.mkstemp(dir=self.path, prefix="._latest_")
        with os.fdopen(fd, "w") as fh:
            fh.write(str(v))
        os.replace(tmp, os.path.join(self.path, "_LATEST"))
        with open(marker, "w") as fh:
            fh.write(str(v))
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
        return VdbStreamWriter(self.options, schema)


def register(spark) -> None:
    spark.dataSource.register(VdbDataSource)
