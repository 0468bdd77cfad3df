"""Merge-on-read deltas (crawling_vectordb_llm_spark/mor.py): upserts and
deletes land as O(|change|) delta versions; reads resolve base+deltas with
last-writer-wins; compaction folds the chain; old snapshots stay pinned."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawling_vectordb_llm_spark import mor


def _base(spark, n=1000):
    return spark.range(n).select(
        F.col("id"), (F.col("id") * 2).alias("val"), F.lit("base").alias("src")
    )


def test_mor_upsert_delete_resolution(spark, tmp_path):
    path = str(tmp_path / "coll")
    v1 = mor.mor_write_base(_base(spark), path)
    assert v1 == 1

    # delete ids 0..99
    mor.mor_delete(spark.range(100).select("id"), path)
    # upsert: overwrite ids 500..549, insert 2000..2009
    ups = spark.range(500, 550).union(spark.range(2000, 2010)).select(
        F.col("id"), (F.col("id") * 3).alias("val"), F.lit("delta").alias("src")
    )
    v3 = mor.mor_upsert(ups, path)
    assert v3 == 3
    assert mor.delta_chain_length(path) == 2

    got = mor.mor_read(spark, path)
    assert got.count() == 1000 - 100 + 10
    assert got.where(F.col("id") < 100).count() == 0           # deleted
    over = got.where((F.col("id") >= 500) & (F.col("id") < 550))
    assert over.count() == 50
    assert over.where(F.col("src") == "delta").count() == 50   # last write wins
    assert got.where(F.col("id") >= 2000).count() == 10        # inserts
    # untouched rows keep base values
    keep = got.where(F.col("id") == 400).first()
    assert keep["val"] == 800 and keep["src"] == "base"


def test_mor_time_travel_and_compaction(spark, tmp_path):
    path = str(tmp_path / "coll")
    mor.mor_write_base(_base(spark, 200), path)
    mor.mor_delete(spark.range(50).select("id"), path)
    before = mor.mor_read(spark, path).orderBy("id").collect()

    # time travel: v1 still sees the full base
    assert mor.mor_read(spark, path, version=1).count() == 200
    assert mor.mor_read(spark, path, version=2).count() == 150

    v3 = mor.mor_compact(spark, path)
    assert v3 == 3
    assert mor.delta_chain_length(path) == 0  # chain folded
    after = mor.mor_read(spark, path).orderBy("id").collect()
    assert [r.asDict() for r in before] == [r.asDict() for r in after]
    # pinned old version still resolvable after compaction
    assert mor.mor_read(spark, path, version=1).count() == 200


def test_mor_read_is_lazy_and_prunable(spark, tmp_path):
    """The resolved view is a plan, not a materialization: a filter on the
    key column must reach the base file scan (pushdown through the
    anti-join chain)."""
    path = str(tmp_path / "coll")
    mor.mor_write_base(_base(spark), path)
    mor.mor_delete(spark.range(10).select("id"), path)
    df = mor.mor_read(spark, path).where(F.col("id") > 900)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(id), GreaterThan(id,900)" in plan
    assert df.count() == 99


def test_vector_collection_mor_mode(spark, tmp_path):
    """VectorCollection(write_mode='mor'): upserts/deletes are delta
    versions, search still answers, compact folds the chain, and the
    resolved content matches what a cow collection would hold."""
    from pyspark.sql import functions as F

    from crawling_vectordb_llm_spark.vectorstore import VectorCollection

    def docs(lo, hi, tag):
        return spark.range(lo, hi).select(
            F.concat(F.lit("d"), F.col("id")).alias("id"),
            F.concat(F.lit(f"{tag} title "), F.col("id")).alias("title"),
            F.concat(F.lit(f"{tag} text body "), F.col("id")).alias("text"),
        )

    coll = VectorCollection(
        spark, str(tmp_path / "mor_coll"), dim=16, write_mode="mor"
    )
    coll.upsert(docs(0, 100, "v1"), build_index=False)
    coll.upsert(docs(50, 120, "v2"), build_index=False)   # 50-99 overwritten
    coll.delete([f"d{i}" for i in range(10)])              # 0-9 gone
    assert coll.delta_chain_length() == 2

    got = coll.documents()
    assert got.count() == 110  # 120 - 10 deleted
    assert got.where(F.col("id") == "d5").count() == 0
    assert got.where(F.col("id") == "d60").first()["title"].startswith("v2")
    assert got.where(F.col("id") == "d20").first()["title"].startswith("v1")

    # search runs against the resolved view
    coll.build_index()
    hits = coll.search_by_text(["v2 text body 60"], limit=3)
    assert hits.count() == 3

    before = sorted(r["id"] for r in got.select("id").collect())
    coll.compact()
    assert coll.delta_chain_length() == 0
    after = sorted(r["id"] for r in coll.documents().select("id").collect())
    assert before == after


def test_vacuum_is_mor_aware(spark, tmp_path):
    """ADVICE r1 regression: vacuum(keep=N) must never delete the base a
    retained delta version resolves through, nor intermediate deltas —
    v1/base + v2..v4 deltas with keep=2 must keep EVERYTHING (all retained
    versions depend on v1/base)."""
    from crawling_vectordb_llm_spark import versioning as V

    path = str(tmp_path / "coll")
    mor.mor_write_base(_base(spark, 100), path)            # v1 base
    mor.mor_delete(spark.range(10).select("id"), path)     # v2 delta
    mor.mor_delete(spark.range(10, 20).select("id"), path)  # v3 delta
    mor.mor_delete(spark.range(20, 30).select("id"), path)  # v4 delta

    removed = V.vacuum(path, keep=2)
    assert removed == []  # nothing removable: v3, v4 retained need v1+v2
    assert mor.mor_read(spark, path).count() == 70  # still readable

    # compact (v5 base) + one more delta (v6): keep=2 retains v5..v6 whose
    # supporting base IS v5, so v1..v4 become removable
    mor.mor_compact(spark, path)                            # v5 base
    mor.mor_delete(spark.range(30, 40).select("id"), path)  # v6 delta
    removed = V.vacuum(path, keep=2)
    assert removed == [1, 2, 3, 4]
    assert mor.mor_read(spark, path).count() == 60
