"""Learned quality classifier (operators/quality_clf.py): the trainer
must separate planted good/bad text, the distributed scorer must equal a
driver-side replay of the order-pinned fold, and banding must route by
the documented thresholds."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from crawling_vectordb_llm_spark.operators.quality_clf import (
    hashed_logit,
    quality_classify,
    train_quality_weights,
)


def _planted_corpus():
    good = [
        f"the quick brown fox and the lazy dog are walking in the park "
        f"with a friend of the family on a sunny afternoon number {i}"
        for i in range(40)
    ]
    bad = [f"77{i} 881 9234 00 {i*7} 4433 11 2 3 999 000 {i}" for i in range(40)]
    return good, bad


def test_trainer_separates_planted_quality():
    good, bad = _planted_corpus()
    texts = good + bad
    labels = [1] * len(good) + [0] * len(bad)
    w, b = train_quality_weights(texts, labels, dim=64)
    from crawling_vectordb_llm_spark.embedding import hash_encode_batch

    x = hash_encode_batch(texts, 64)
    pred = (x @ np.array(w) + b) > 0
    acc = (pred == np.array(labels, dtype=bool)).mean()
    assert acc >= 0.95  # linearly separable planted sets


def test_distributed_scores_equal_driver_fold(spark):
    good, bad = _planted_corpus()
    texts = good + bad
    w, b = train_quality_weights(texts, [1] * 40 + [0] * 40, dim=64)
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["logit_e6"], r["band"])
        for r in quality_classify(df, w, b, dim=64).collect()
    }
    from crawling_vectordb_llm_spark.embedding import hash_encode_batch

    mats = hash_encode_batch(texts, 64).astype(np.float32)
    for i, row in enumerate(mats):
        # replay the op's contract: float32 features widened to float64,
        # SEQUENTIAL left-fold sum of products, bias last
        acc = 0.0
        for j in range(64):
            acc = acc + float(row[j]) * w[j]
        logit = acc + b
        import math

        want_e6 = math.floor(logit * 1e6 + 0.5)
        want_band = (
            "keep" if logit >= 0.5 else "review" if logit >= -0.5 else "drop"
        )
        assert got[i] == (want_e6, want_band), i


def test_banding_routes_planted_sets(spark):
    good, bad = _planted_corpus()
    texts = good + bad
    w, b = train_quality_weights(texts, [1] * 40 + [0] * 40, dim=64)
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = quality_classify(df, w, b, dim=64).collect()
    bands = {r["doc_id"]: r["band"] for r in rows}
    good_kept = sum(1 for i in range(40) if bands[i] in ("keep", "review"))
    bad_dropped = sum(
        1 for i in range(40, 80) if bands[i] in ("drop", "review")
    )
    assert good_kept >= 38 and bad_dropped >= 38
    # logit sign agrees with band partition around zero
    for r in rows:
        if r["band"] == "keep":
            assert r["logit_e6"] >= 500_000
        elif r["band"] == "drop":
            assert r["logit_e6"] < -500_000 + 1


def test_fixture_query_is_registered_and_scores_fixture_docs(spark):
    from crawling_vectordb_llm_spark.suite import ORACLES, QUERIES

    assert "quality_classifier_filter" in QUERIES
    assert "quality_classifier_filter" in ORACLES
    out = QUERIES["quality_classifier_filter"](
        spark, "/root/testdata/sf0.001"
    )
    rows = out.collect()
    assert len(rows) == 500
    assert {r["band"] for r in rows} <= {"keep", "review", "drop"}
    # the fixture classifier must not be degenerate on its own corpus
    n_keep = sum(1 for r in rows if r["band"] == "keep")
    n_drop = sum(1 for r in rows if r["band"] == "drop")
    assert n_keep > 0 and n_drop > 0
