"""Cross-encoder rerank stage — the precision tier above the bi-encoder.

Retrieval stack in this engine: bi-encoder ANN (operators/knn.py, cheap,
corpus-scale) → optional late-interaction / MMR (suite) → CROSS-ENCODER
on the shortlist (this module, expensive, pairwise).  A real
cross-encoder scores each (query, doc) pair with full attention over the
concatenated pair; here the model seam is the same iterator pandas_udf
the embedding and generation stages use — load once per executor, Arrow
batches through — with a deterministic token-overlap stand-in so the
stage is testable without model weights (the FIXTURES.md rule: stub the
model, keep the plumbing real).

Scale shape: the cross-encoder sees only |queries| x k rows (the ANN
shortlist), never the corpus — pairwise cost is bounded by the retrieval
stage, which is the only reason cross-encoders are usable at 100 TB.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fake_cross_encode_batch(queries: list[str], docs: list[str]) -> list[float]:
    """Deterministic stand-in: Dice overlap of token sets, which a real
    cross-encoder strictly dominates but correlates with — good enough to
    exercise ordering, ties, and the blending math."""
    out = []
    for q, d in zip(queries, docs):
        qs, ds = set(q.split()), set(d.split())
        denom = len(qs) + len(ds)
        out.append(round(2.0 * len(qs & ds) / denom, 6) if denom else 0.0)
    return out


def make_cross_encoder_udf(
    score_batch: Callable[[list[str], list[str]], list[float]] | None = None,
):
    scorer = score_batch or fake_cross_encode_batch

    @F.pandas_udf("double")
    def cross_score(
        it: Iterator[tuple[pd.Series, pd.Series]]
    ) -> Iterator[pd.Series]:
        # a real cross-encoder loads HERE, once per worker process
        for q, d in it:
            yield pd.Series(
                scorer(list(q.fillna("")), list(d.fillna("")))
            )

    return cross_score


def cross_encoder_rerank(
    hits: DataFrame,
    query_text: str = "query_text",
    doc_text: str = "doc_text",
    retrieval_score: str = "score",
    alpha: float = 0.5,
    score_batch: Callable[[list[str], list[str]], list[float]] | None = None,
) -> DataFrame:
    """Blend retrieval and cross-encoder scores (alpha * retrieval +
    (1-alpha) * cross) and re-rank per query.  Input is the shortlist:
    (query_id, doc_id, score, query_text, doc_text)."""
    from pyspark.sql import Window

    ce = make_cross_encoder_udf(score_batch)
    scored = hits.withColumn(
        "ce_score", ce(F.col(query_text), F.col(doc_text))
    ).withColumn(
        "blended",
        F.round(
            F.lit(alpha) * F.col(retrieval_score)
            + F.lit(1 - alpha) * F.col("ce_score"),
            6,
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("blended"), F.asc("doc_id")
    )
    return scored.withColumn("ce_rank", F.row_number().over(w).cast("int"))
