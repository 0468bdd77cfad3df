"""Round-trip fidelity of every interchange format (sources/formats.py):
write the documents fixture, read it back with the original schema, and
require exact content equality — the property that lets a corpus move
between this engine and external crawlers/trainers without drift.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawling_vectordb_llm_spark.catalog import table_path
from crawling_vectordb_llm_spark.sources.formats import FORMATS, read_table, write_table

from .conftest import SF_SMALL


def _sorted_rows(df):
    return [tuple(r) for r in df.orderBy("doc_id").collect()]


@pytest.mark.parametrize("fmt", FORMATS)
def test_roundtrip_exact(spark, tmp_path, fmt):
    docs = spark.read.parquet(table_path(SF_SMALL, "documents"))
    dest = str(tmp_path / f"docs_{fmt}")
    write_table(docs, dest, fmt)
    back = read_table(spark, dest, fmt, schema=docs.schema)
    assert back.schema == docs.schema
    assert _sorted_rows(back) == _sorted_rows(docs)


def test_partitioned_write_prunes(spark, tmp_path):
    docs = spark.read.parquet(table_path(SF_SMALL, "documents"))
    dest = str(tmp_path / "docs_by_lang")
    write_table(docs, dest, "parquet", partition_by=["lang"])
    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    # hive layout on disk: one directory per lang
    assert sorted(p.name for p in (tmp_path / "docs_by_lang").glob("lang=*")) == sorted(
        f"lang={lang}" for lang in langs
    )
    back = spark.read.parquet(dest)
    one = back.where(F.col("lang") == langs[0])
    plan = one._jdf.queryExecution().executedPlan().toString()
    # partition filter must prune at listing time, not post-scan
    assert "PartitionFilters: [isnotnull(lang" in plan
    assert one.count() == docs.where(F.col("lang") == langs[0]).count()
    # content identical modulo partition-column position
    cols = docs.columns
    assert _sorted_rows(back.select(*cols)) == _sorted_rows(docs)


def test_shard_partitioned_sorted_write_layout(spark, tmp_path):
    """Training-shard write path: repartition by content-hash shard,
    sort within partitions, write partitioned by shard — reads of one
    shard prune all other directories (PartitionFilters), and rows
    inside each file are doc_id-ordered for sequential packing."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "shards")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1), 16, 10)
        .cast("int")
        .alias("shard_id")
    )
    (
        docs.select("doc_id", "text", shard)
        .repartition("shard_id")
        .sortWithinPartitions("doc_id")
        .write.partitionBy("shard_id")
        .mode("overwrite")
        .parquet(out)
    )
    one = spark.read.parquet(out).where(F.col("shard_id") == 3)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(shard_id" in plan
    ids = [r["doc_id"] for r in one.collect()]
    assert ids == sorted(ids)
    full = spark.read.parquet(out)
    assert full.count() == docs.count()


def test_python_datasource_partitions_and_determinism(spark):
    """The crawl source must split the URL space across exactly the
    requested input partitions (partition count == task parallelism ==
    politeness knob) and be a pure function of its options."""
    from crawling_vectordb_llm_spark.sources import crawl_datasource

    crawl_datasource.register(spark)

    def load(parts):
        return (
            spark.read.format("synthetic_crawl")
            .option("pages", "120")
            .option("numpartitions", str(parts))
            .load()
        )

    df = load(5)
    assert df.rdd.getNumPartitions() == 5
    assert df.count() == 120
    # same rows regardless of partitioning (round-robin is a layout
    # choice, not a semantic one)
    a = sorted(r["url"] for r in load(3).collect())
    b = sorted(r["url"] for r in load(11).collect())
    assert a == b


def test_vdb_format_write_read_round_trip(spark, tmp_path):
    """The vdb format (Python Data Source writer + reader): a write lands
    as a new pointer-flipped version readable by both the format reader
    and versioning.read_version; a second write is a NEW version with the
    first intact (snapshot isolation through the format registry)."""
    from crawling_vectordb_llm_spark import versioning as V
    from crawling_vectordb_llm_spark.sources import vdb_datasource

    vdb_datasource.register(spark)
    path = str(tmp_path / "coll")
    df = spark.range(100).selectExpr(
        "CAST(id AS STRING) AS id", "id * 2 AS val", "'t' || id AS title"
    )
    df.write.format("vdb").option("path", path).mode("append").save()
    assert V.latest_version(path) == 1

    back = spark.read.format("vdb").option("path", path).load()
    assert back.count() == 100
    assert {f.name for f in back.schema.fields} == {"id", "val", "title"}
    got = {r["id"]: (r["val"], r["title"]) for r in back.collect()}
    assert got["7"] == (14, "t7")

    # second write = second version; reader follows the pointer
    spark.range(5).selectExpr(
        "CAST(id AS STRING) AS id", "id AS val", "'x' AS title"
    ).write.format("vdb").option("path", path).mode("append").save()
    assert V.latest_version(path) == 2
    assert spark.read.format("vdb").option("path", path).load().count() == 5
    # versioning API reads the same layout (time travel to v1 intact)
    assert V.read_version(spark, path, 1).count() == 100


def test_vdb_format_vector_columns_survive(spark, tmp_path):
    """array<float> embedding columns round-trip through the arrow→DDL
    schema mapping."""
    from crawling_vectordb_llm_spark.sources import vdb_datasource

    vdb_datasource.register(spark)
    path = str(tmp_path / "vec")
    df = spark.createDataFrame(
        [("a", [1.0, 2.0]), ("b", [3.0, 4.0])], "id string, vector array<float>"
    )
    df.write.format("vdb").option("path", path).mode("append").save()
    back = spark.read.format("vdb").option("path", path).load()
    assert back.schema["vector"].dataType.simpleString() == "array<float>"
    vals = {r["id"]: r["vector"] for r in back.collect()}
    assert vals["a"] == [1.0, 2.0]


def test_vdb_format_time_travel_option(spark, tmp_path):
    """option('version', N) pins a snapshot through the format reader —
    the reader-side time-travel contract of versioning.read_version."""
    from crawling_vectordb_llm_spark.sources import vdb_datasource

    vdb_datasource.register(spark)
    path = str(tmp_path / "tt")
    for n in (100, 5):
        spark.range(n).selectExpr("CAST(id AS STRING) AS id").write.format(
            "vdb"
        ).option("path", path).mode("append").save()
    read = lambda **kw: (  # noqa: E731
        spark.read.format("vdb").options(path=path, **kw).load().count()
    )
    assert read() == 5            # pointer follows the latest write
    assert read(version="1") == 100
    assert read(version="2") == 5


def test_vdb_writer_abort_and_crash_safety(spark, tmp_path):
    """Failure contract of the vdb writer: an aborted/failed job must
    leave the pointer and every committed version untouched — the only
    residue is an orphaned staging directory, never a half-visible
    version."""
    from crawling_vectordb_llm_spark import versioning as V
    from crawling_vectordb_llm_spark.sources import vdb_datasource

    vdb_datasource.register(spark)
    path = str(tmp_path / "safe")
    spark.range(10).selectExpr("CAST(id AS STRING) AS id").write.format(
        "vdb"
    ).option("path", path).mode("append").save()
    assert V.latest_version(path) == 1

    # a failing write: one task throws mid-job → Spark aborts the write
    doomed = spark.range(100).selectExpr(
        "CAST(assert_true(id < 50, 'boom') AS STRING) AS id"
    )
    with pytest.raises(Exception, match="boom"):
        doomed.write.format("vdb").option("path", path).mode("append").save()

    # pointer and v=1 untouched; no v=2 appeared
    assert V.latest_version(path) == 1
    assert V.list_versions(path) == [1]
    assert spark.read.format("vdb").option("path", path).load().count() == 10


def test_vdb_streaming_sink_versions_per_batch(spark, tmp_path):
    """writeStream.format('vdb'): each micro-batch promotes to one
    immutable version; restarts off the shared checkpoint append new
    batches without double-landing replayed ones."""
    from crawling_vectordb_llm_spark import versioning as V
    from crawling_vectordb_llm_spark.sources import crawl_datasource, vdb_datasource

    vdb_datasource.register(spark)
    crawl_datasource.register_stream(spark)
    path = str(tmp_path / "streamed")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.format("synthetic_crawl_stream")
            .option("pages", "30")
            .option("batchpages", "10")
            .load()
            .writeStream.format("vdb")
            .option("path", path)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    v1 = V.latest_version(path)
    assert v1 is not None
    assert spark.read.format("vdb").option("path", path).load().count() == 10

    drain()  # next 10 pages land as a NEW version
    drain()  # and the last 10
    assert V.latest_version(path) > v1
    # pointer version holds only the final batch; the union of versions is
    # the full feed with no page duplicated or lost
    urls = set()
    total = 0
    for v in V.list_versions(path):
        rows = [r["url"] for r in V.read_version(spark, path, v).collect()]
        urls.update(rows)
        total += len(rows)
    assert total == 30 and len(urls) == 30
