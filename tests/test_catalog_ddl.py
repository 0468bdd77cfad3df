"""S6 DDL surface: database/collection lifecycle + bucketed (sharded)
collections whose joins need no shuffle."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawling_vectordb_llm_spark import catalog as C

from .conftest import SF_SMALL

DB = "crawlingdb_test"


def test_database_and_collection_lifecycle(spark):
    C.drop_database(spark, DB)
    C.create_database(spark, DB)
    assert DB in C.list_databases(spark)

    docs = C.read_table(spark, SF_SMALL, "documents").select(
        F.col("doc_id").alias("id"), "text", "lang"
    )
    C.create_collection(spark, DB, "knowledge", docs, shards=3, key="id")
    assert "knowledge" in C.list_collections(spark, DB)
    assert spark.table(f"{DB}.knowledge").count() == docs.count()

    C.drop_collection(spark, DB, "knowledge")
    assert "knowledge" not in C.list_collections(spark, DB)
    C.drop_database(spark, DB)
    assert DB not in C.list_databases(spark)


def test_bucketed_collections_join_without_shuffle(spark):
    """shard=3 analog: two collections bucketed on the same key join with
    zero Exchange operators — the co-located join the reference gets from
    shard placement."""
    C.drop_database(spark, DB)
    C.create_database(spark, DB)
    docs = C.read_table(spark, SF_SMALL, "documents").select(
        F.col("doc_id").alias("id"), "text"
    )
    emb = C.read_table(spark, SF_SMALL, "embeddings").select(
        F.col("vec_id").alias("id"), "embedding"
    )
    C.create_collection(spark, DB, "docs_b", docs, shards=3, key="id")
    C.create_collection(spark, DB, "emb_b", emb, shards=3, key="id")
    # tiny fixtures would broadcast (also shuffle-free, but not the point):
    # disable broadcast to expose the bucketed sort-merge join path that
    # matters when BOTH sides are 100 TB-big
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(f"{DB}.docs_b").join(spark.table(f"{DB}.emb_b"), "id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan  # no shuffle
        assert joined.count() == 500
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        C.drop_database(spark, DB)
