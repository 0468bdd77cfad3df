"""IVF recall, as-of strategy agreement, multimodal round trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawling_vectordb_llm_spark.catalog import read_table
from crawling_vectordb_llm_spark.operators.asof import asof_join
from crawling_vectordb_llm_spark.operators.ivf import (
    assign_centroids,
    ivf_search,
    kmeans_centroids,
)
from crawling_vectordb_llm_spark.operators.knn import knn_join_numpy
from crawling_vectordb_llm_spark.sources import multimodal as MM

from .conftest import SF_SMALL


def _queries(emb, n=10):
    return emb.where(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def test_ivf_recall_vs_exact(spark):
    emb = read_table(spark, SF_SMALL, "embeddings")
    q = _queries(emb)
    exact = {
        (r["query_id"], r["vec_id"])
        for r in knn_join_numpy(q, emb, k=10, corpus_id="vec_id").collect()
    }
    centroids = kmeans_centroids(emb, 16)
    assigned = assign_centroids(emb, centroids)
    # n_probe=6 (not 4): on the isotropic fixture recall tracks the
    # probed fraction, and the r4 order-pinned trainer sample shifted
    # the centroid draw (4/16 measured 0.55, 6/16 = 0.69, 8/16 = 0.82)
    approx = {
        (r["query_id"], r["vec_id"])
        for r in ivf_search(q, assigned, centroids, k=10, n_probe=6).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"IVF recall@10 nprobe=6/16 too low: {recall}"


def test_ivf_full_probe_equals_exact(spark):
    emb = read_table(spark, SF_SMALL, "embeddings")
    q = _queries(emb, 5)
    exact = {
        (r["query_id"], r["vec_id"])
        for r in knn_join_numpy(q, emb, k=5, corpus_id="vec_id").collect()
    }
    centroids = kmeans_centroids(emb, 8)
    assigned = assign_centroids(emb, centroids)
    full = {
        (r["query_id"], r["vec_id"])
        for r in ivf_search(q, assigned, centroids, k=5, n_probe=8).collect()
    }
    assert full == exact


def test_lsh_ann_recall_vs_exact(spark):
    from crawling_vectordb_llm_spark.suite import QUERIES

    emb = read_table(spark, SF_SMALL, "embeddings")
    q = _queries(emb, 5)
    exact = {
        (r["query_id"], r["vec_id"])
        for r in knn_join_numpy(q, emb, k=10, corpus_id="vec_id").collect()
    }
    approx = {
        (r["query_id"], r["vec_id"])
        for r in QUERIES["lsh_ann_topk"](spark, SF_SMALL).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"LSH recall@10 too low: {recall}"


def test_asof_strategies_agree(spark):
    e = read_table(spark, SF_SMALL, "events")
    purchases = e.where(F.col("event_type") == "purchase")
    signups = e.where(F.col("event_type") == "signup")
    a = {
        (r["event_id"], str(r["asof_value"]))
        for r in asof_join(purchases, signups).collect()
    }
    b = {
        (r["event_id"], str(r["asof_value"]))
        for r in asof_join(purchases, signups, strategy="pandas").collect()
    }
    assert a == b and len(a) > 0


def test_asof_value_is_latest_prior(spark):
    df = spark.createDataFrame(
        [(1, 100, 10.0), (2, 100, 20.0), (3, 100, 35.0)],
        "event_id long, user_id long, t double",
    ).selectExpr("event_id", "user_id", "timestamp_seconds(t) AS ts")
    right = spark.createDataFrame(
        [(100, 5.0), (100, 15.0), (100, 40.0)], "user_id long, t double"
    ).selectExpr("user_id", "timestamp_seconds(t) AS ts")
    out = {
        r["event_id"]: r["asof_value"].timestamp()
        for r in asof_join(df, right).collect()
    }
    assert out == {1: 5.0, 2: 15.0, 3: 15.0}


def test_multimodal_meta_inverts_synth(spark):
    docs = read_table(spark, SF_SMALL, "documents").where(F.col("doc_id") < 30)
    meta = MM.decode_media_meta(MM.synth_media(docs)).collect()
    for r in meta:
        i = r["doc_id"]
        assert r["magic"] == "FKM1"
        assert r["width"] == 16 + i % 48
        assert r["height"] == 16 + (i * 7) % 32
        assert r["payload_bytes"] == r["width"] * r["height"]
        assert r["kind"] in ("image", "audio", "video")


def test_multimodal_features_unit_norm(spark):
    import numpy as np

    docs = read_table(spark, SF_SMALL, "documents").where(F.col("doc_id") < 10)
    feats = MM.extract_features(MM.synth_media(docs)).collect()
    for r in feats:
        assert len(r["features"]) == 16
        assert abs(np.linalg.norm(r["features"]) - 1.0) < 1e-5


def test_frame_sampling_every_nth(spark):
    docs = read_table(spark, SF_SMALL, "documents").where(F.col("doc_id") == 5)
    frames = MM.sample_frames(MM.synth_media(docs), every_n=4, frame_bytes=64).collect()
    idxs = sorted(r["frame_idx"] for r in frames)
    assert idxs == list(range(0, (21 * 19 // 64), 4))  # w=21,h=19 for doc 5
    assert all(len(r["frame"]) == 64 for r in frames)


def test_real_decode_stub_raises():
    import pytest

    with pytest.raises(NotImplementedError):
        MM.real_decode_stub(b"FKM1xxxx")


def test_schema_of_json_inference_roundtrip(spark):
    """SURVEY §2.5 JSON row: schema_of_json infers a literal sample's
    schema; from_json with that DDL parses the events props column."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    sample = ev.select("props").first()["props"]
    ddl = spark.range(1).select(
        F.schema_of_json(F.lit(sample)).alias("s")
    ).first()["s"]
    assert "k" in ddl
    parsed = ev.select(F.from_json("props", ddl).alias("p")).where(
        F.col("p.k").isNotNull()
    )
    assert parsed.count() > 0


def test_multimodal_resize_halves_dims_and_stays_decodable(spark):
    from pyspark.sql import functions as F

    from crawling_vectordb_llm_spark.sources import multimodal as MM

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(20)
    media = MM.synth_media(docs)
    orig = {r["doc_id"]: r for r in MM.decode_media_meta(media).collect()}
    resized = MM.resize_media(media, factor=2)
    re_meta = {
        r["doc_id"]: r
        for r in MM.decode_media_meta(resized.select("doc_id", "media")).collect()
    }
    for i, o in orig.items():
        r = re_meta[i]
        assert r["width"] == (o["width"] + 1) // 2
        assert r["height"] == (o["height"] + 1) // 2
        assert r["kind"] == o["kind"]
        assert r["payload_bytes"] == r["width"] * r["height"]


def test_nfc_normalize_agrees_with_duckdb_on_planted_forms(spark):
    """Composed vs decomposed forms must converge to identical bytes, and
    Spark's UDF must agree with DuckDB's nfc_normalize (the oracle used by
    the unicode_normalize query) beyond the fixture's ASCII."""
    import duckdb

    from crawling_vectordb_llm_spark.functions.text import nfc_normalize

    cases = [
        "café",              # composed é
        "café",             # decomposed e + combining acute
        "ẛ̣",           # ẛ̣ — multi-step canonical composition
        "가",                 # 가 precomposed hangul
        "가",           # 가 as jamo pair
        "ascii only",
        "emoji 🙂 and CJK 漢字",
        "",
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(cases)], "i long, s string")
    got = {r["i"]: r["n"] for r in df.select("i", nfc_normalize("s").alias("n")).collect()}
    for i, s in enumerate(cases):
        want = duckdb.sql("select nfc_normalize(?)", params=[s]).fetchone()[0]
        assert got[i] == want, (i, s, got[i], want)
    # composed/decomposed pairs land on the same bytes
    assert got[0] == got[1]
    assert got[3] == got[4]


def test_hll_rolling_matches_exact_within_tolerance(spark):
    """The HLL variant now carries its own accuracy gate: every row's
    in-query `hll_ok` (estimate within 5% of exact) must hold, the exact
    counts must equal the collect_set variant's, and the key universes
    must coincide."""
    from crawling_vectordb_llm_spark.suite import QUERIES

    from .conftest import SF_MEDIUM

    exact = {
        (r["event_type"], r["day"]): r["uniq_users_7d"]
        for r in QUERIES["rolling_distinct_users"](spark, SF_MEDIUM).collect()
    }
    hll_rows = QUERIES["rolling_distinct_users_hll"](spark, SF_MEDIUM).collect()
    got = {(r["event_type"], r["day"]): r for r in hll_rows}
    assert set(exact) == set(got), "same (event_type, day) key universe"
    for k, v in exact.items():
        assert got[k]["uniq_users_7d"] == v, (k, v, got[k])
        assert got[k]["hll_ok"], (k, got[k])


def test_triangle_counts_planted_graph(spark):
    """K4 on {1,2,3,4} (4 triangles, each node in 3) + a pendant edge and
    an isolated pair (never in a triangle) + a duplicate/reversed edge
    (must not double-count)."""
    from crawling_vectordb_llm_spark.operators.components import triangle_counts

    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),  # K4
        (2, 1),          # reversed duplicate
        (4, 5),          # pendant
        (8, 9),          # isolated pair
    ]
    df = spark.createDataFrame(edges, "a_id long, b_id long")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_heavy_hitter_sketch_exact_above_rank_40(spark, tmp_path):
    """heavy_hitter_terms' oracle counts ALL (lang, term) pairs, so the
    approx_top_k sketch must return the COMPLETE exact count set whenever
    the per-lang vocabulary fits under k — including vocabularies far
    larger than the old k=40 (ADVICE r7: the 4,110-word fresh fixtures
    realize thousands of distinct terms per lang, where rank-boundary
    ties made the top-40 form nondeterministic vs the full oracle)."""
    import collections
    import random

    from crawling_vectordb_llm_spark.suite.text_suite import (
        q_heavy_hitter_terms,
    )

    rng = random.Random(8)
    vocab = [f"w{i:04d}" for i in range(500)]  # >> 40, with heavy ties
    rows, truth = [], collections.Counter()
    for doc_id in range(200):
        lang = ("en", "zh")[doc_id % 2]
        words = [vocab[rng.randrange(len(vocab))] for _ in range(60)]
        for w in words:
            truth[(lang, w)] += 1
        rows.append((doc_id, " ".join(words), lang, "s", 1))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    got = {
        (r["lang"], r["term"]): r["cnt"]
        for r in q_heavy_hitter_terms(spark, str(tmp_path)).collect()
    }
    assert got == dict(truth)
