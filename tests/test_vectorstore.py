"""VectorCollection facade: the reference SDK contract end-to-end —
upsert (embed-on-write, overwrite-by-id), searchByText (batch, filtered,
indexed), build_index."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawling_vectordb_llm_spark.catalog import read_table
from crawling_vectordb_llm_spark.vectorstore import VectorCollection

from .conftest import SF_SMALL


def _fresh(spark, tmp_path, **kw):
    docs = (
        read_table(spark, SF_SMALL, "documents")
        .where(F.col("doc_id") < 100)
        .select(
            F.concat(F.lit("https://x/"), F.col("doc_id").cast("string")).alias("id"),
            "text",
            "lang",
        )
    )
    coll = VectorCollection(spark, str(tmp_path / "coll"), dim=64, **kw)
    coll.upsert(docs, build_index=True)
    return coll, docs


def test_upsert_and_search_by_text(spark, tmp_path):
    coll, docs = _fresh(spark, tmp_path)
    assert coll.documents().count() == 100
    # query with a document's own text: that document must be rank 1
    target = docs.where(F.col("id") == "https://x/7").first()
    hits = coll.search_by_text([target["text"]], limit=3).collect()
    rank1 = [r for r in hits if r["rank"] == 1][0]
    assert rank1["id"] == "https://x/7"
    assert abs(rank1["score"] - 1.0) < 1e-6


def test_upsert_overwrites_by_id(spark, tmp_path):
    coll, docs = _fresh(spark, tmp_path)
    update = spark.createDataFrame(
        [("https://x/7", "completely new replacement text", "en")],
        "id string, text string, lang string",
    )
    coll.upsert(update)
    assert coll.documents().count() == 100  # overwrite, not append
    row = coll.documents().where(F.col("id") == "https://x/7").first()
    assert row["text"] == "completely new replacement text"
    # the new text now finds itself
    hits = coll.search_by_text(["completely new replacement text"], limit=1).collect()
    assert hits[0]["id"] == "https://x/7"


def test_filtered_search(spark, tmp_path):
    coll, docs = _fresh(spark, tmp_path)
    some_text = docs.first()["text"]
    hits = coll.search_by_text([some_text], limit=5, filter="lang = 'en'")
    ids = {r["id"] for r in hits.collect()}
    en_ids = {r["id"] for r in coll.documents().where("lang = 'en'").collect()}
    assert ids and ids <= en_ids


def test_indexed_search_matches_exact_mostly(spark, tmp_path):
    coll, docs = _fresh(spark, tmp_path, n_centroids=8)
    texts = [r["text"] for r in docs.limit(5).collect()]
    exact = {
        (r["query_id"], r["id"])
        for r in coll.search_by_text(texts, limit=5).collect()
    }
    approx = {
        (r["query_id"], r["id"])
        for r in coll.search_by_text(texts, limit=5, use_index=True, n_probe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, recall


def test_search_results_with_docs(spark, tmp_path):
    coll, docs = _fresh(spark, tmp_path)
    hits = coll.search_by_text([docs.first()["text"]], limit=3)
    enriched = coll.search_results_with_docs(hits)
    assert enriched.count() == 3
    assert {"text", "lang", "rank", "score"} <= set(enriched.columns)

def test_delete_by_id_versions_and_preserves_old_snapshot(spark, tmp_path):
    from crawling_vectordb_llm_spark.vectorstore import VectorCollection

    coll = VectorCollection(spark, str(tmp_path / "c"), dim=16, shards=2)
    docs = spark.createDataFrame(
        [(f"u{i}", f"text number {i} alpha beta", f"t{i}") for i in range(10)],
        "id string, text string, title string",
    )
    coll.upsert(docs, build_index=False)
    before = coll.documents()  # pins version 1
    v = coll.delete(["u3", "u7"])
    assert v == 2
    remaining = {r["id"] for r in coll.documents().select("id").collect()}
    assert remaining == {f"u{i}" for i in range(10)} - {"u3", "u7"}
    # pinned pre-delete snapshot still contains the deleted rows
    assert before.count() == 10


def test_indexed_search_excludes_deleted_ids(spark, tmp_path):
    """ADVICE r1 regression: after delete() (default build_index=False) an
    UNFILTERED indexed search must not surface the deleted ids — the stale
    ivf_assignment must be pinned to the current snapshot on read."""
    coll, docs = _fresh(spark, tmp_path, n_centroids=4)
    texts = [r["text"] for r in docs.limit(5).collect()]
    deleted = ["https://x/0", "https://x/3"]
    coll.delete(deleted)  # build_index stays False: assignment is now stale
    hits = coll.search_by_text(texts, limit=5, use_index=True, n_probe=4)
    ids = {r["id"] for r in hits.collect()}
    assert ids and not (ids & set(deleted))


def test_indexed_search_scores_current_vectors_after_upsert(spark, tmp_path):
    """A doc re-upserted with new text (index NOT rebuilt) must be scored by
    its current embedding, not the stale one stored in the assignment."""
    coll, docs = _fresh(spark, tmp_path, n_centroids=4)
    new_text = "entirely different replacement content xyz"
    update = spark.createDataFrame(
        [("https://x/7", new_text, "en")], "id string, text string, lang string"
    )
    coll.upsert(update, build_index=False)
    # exact search for the OLD text must not return a perfect 1.0 for x/7
    old_text = docs.where(F.col("id") == "https://x/7").first()["text"]
    hits = coll.search_by_text([old_text], limit=100, use_index=True, n_probe=4)
    x7 = [r for r in hits.collect() if r["id"] == "https://x/7"]
    assert all(abs(r["score"] - 1.0) > 1e-6 for r in x7)


def test_incremental_index_update_finds_new_docs(spark, tmp_path):
    """upsert(build_index='incremental'): the ingest delta is assigned to
    the EXISTING centroids and appended — new docs become indexed-search
    visible without a full rebuild, and the centroid table is untouched."""
    import numpy as np

    coll, docs = _fresh(spark, tmp_path, n_centroids=4)
    cents_before = coll._ensure_centroids().copy()

    new = spark.createDataFrame(
        [("https://y/1", "totally novel incremental document body", "en")],
        "id string, text string, lang string",
    )
    coll.upsert(new, build_index="incremental")
    assert np.array_equal(coll._ensure_centroids(), cents_before)

    hits = coll.search_by_text(
        ["totally novel incremental document body"], limit=3,
        use_index=True, n_probe=4,
    ).collect()
    top = [r for r in hits if r["rank"] == 1][0]
    assert top["id"] == "https://y/1"
    assert abs(top["score"] - 1.0) < 1e-6


def test_indexed_search_from_fresh_session_instance(spark, tmp_path):
    """Centroids persist with the index: a NEW VectorCollection object on
    the same path answers indexed searches without retraining (the
    cross-session / cross-node story)."""
    from crawling_vectordb_llm_spark.vectorstore import VectorCollection

    coll, docs = _fresh(spark, tmp_path, n_centroids=4)
    target = docs.where(F.col("id") == "https://x/9").first()

    fresh = VectorCollection(spark, str(tmp_path / "coll"), dim=64, n_centroids=4)
    assert fresh.centroids is None
    hits = fresh.search_by_text([target["text"]], limit=3, use_index=True).collect()
    assert [r for r in hits if r["rank"] == 1][0]["id"] == "https://x/9"
