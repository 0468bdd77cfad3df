"""retrieval_metrics: hand-computed IR metric cases."""

from __future__ import annotations

import math

from crawling_vectordb_llm_spark.operators.eval import (
    dcg_gain_literals,
    idcg_literals,
    retrieval_metrics,
)


def test_gain_and_idcg_literals_are_consistent():
    gains = [float(g) for g in dcg_gain_literals(10)]
    idcgs = [float(v) for v in idcg_literals(10)]
    assert gains[0] == 1.0  # 1/log2(2)
    assert abs(gains[2] - 0.5) < 1e-9  # 1/log2(4)
    for m in range(1, 11):
        assert abs(idcgs[m - 1] - sum(gains[:m])) < 1e-8
    # strictly increasing prefix (each rank adds positive gain)
    assert all(b > a for a, b in zip(idcgs, idcgs[1:]))


def test_retrieval_metrics_hand_case(spark):
    # q1: rels {10,11,12}; retrieved hits 10@1, 11@3 -> recall 2/3,
    # mrr 1, dcg = 1 + 0.5, idcg(3) = 1 + 0.630929754 + 0.5
    # q2: rels {20}; nothing relevant retrieved -> all zeros
    # q3: rels {30}; hit at rank 2 -> recall 1, mrr 0.5, ndcg 0.630929754
    retrieved = spark.createDataFrame(
        [(1, 10, 1), (1, 99, 2), (1, 11, 3), (2, 98, 1), (3, 97, 1), (3, 30, 2)],
        ["query_id", "doc_id", "rank"],
    )
    qrels = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 20), (3, 30)],
        ["query_id", "doc_id"],
    )
    rows = {
        r["query_id"]: r
        for r in retrieval_metrics(retrieved, qrels, k=10).collect()
    }
    assert rows[1]["recall_at_k"] == round(2 / 3, 6)
    assert rows[1]["mrr"] == 1.0
    assert rows[1]["ndcg"] == round(1.5 / (1.0 + 0.630929754 + 0.5), 6)
    assert (rows[2]["recall_at_k"], rows[2]["mrr"], rows[2]["ndcg"]) == (0.0, 0.0, 0.0)
    assert rows[3]["recall_at_k"] == 1.0
    assert rows[3]["mrr"] == 0.5
    assert rows[3]["ndcg"] == round(0.630929754 / 1.0, 6)


def test_recall_denominator_caps_at_k(spark):
    # 12 relevant docs but k=10: a perfect top-10 must score recall 1.0
    retrieved = spark.createDataFrame(
        [(1, d, r + 1) for r, d in enumerate(range(12)) if r < 10],
        ["query_id", "doc_id", "rank"],
    )
    qrels = spark.createDataFrame(
        [(1, d) for d in range(12)], ["query_id", "doc_id"]
    )
    row = retrieval_metrics(retrieved, qrels, k=10).collect()[0]
    assert row["recall_at_k"] == 1.0
    assert row["ndcg"] == 1.0
