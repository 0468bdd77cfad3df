"""Maximal Marginal Relevance rerank — context diversification for RAG.

The reference feeds the raw ANN top-3 straight into the prompt
(main_server.py:41-51); near-duplicate hits waste prompt budget on the
same content three times.  MMR greedily picks the candidate maximizing

    lambda * relevance(q, d)  -  (1 - lambda) * max_{s in selected} sim(d, s)

so each added document is relevant AND novel against what's already
selected.

Spark shape: the candidate set per query is tiny (the ANN top-N, N ~
10-100), so the greedy loop runs inside `applyInPandas` per query group —
one shuffle on query_id, numpy inside, never a driver loop.  The
quadratic term is N² per query over in-memory vectors, which is the
intended regime (N is bounded by the retrieval stage, not the corpus).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame


def mmr_rerank(
    candidates: DataFrame,
    k: int,
    lam: float = 0.7,
    query_id: str = "query_id",
    doc_id: str = "doc_id",
    vec_col: str = "vector",
    score_col: str = "score",
) -> DataFrame:
    """Per query: greedy-select k of the candidates by MMR.

    `candidates` carries (query_id, doc_id, score, vector); output adds
    `mmr_rank` (1-based pick order) and `mmr_score` (the objective at
    pick time, rounded to 6 dp).  Ties break by doc_id for determinism.
    """
    out_schema = (
        f"{query_id} long, {doc_id} long, {score_col} double, "
        "mmr_rank int, mmr_score double"
    )

    def _rerank(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([score_col, doc_id], ascending=[False, True])
        vecs = np.array(list(pdf[vec_col]), dtype=np.float64)
        norms = np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-30)
        vn = vecs / norms
        rel = pdf[score_col].to_numpy(dtype=np.float64)
        ids = pdf[doc_id].to_numpy()
        n = len(pdf)
        chosen: list[int] = []
        obj: list[float] = []
        remaining = list(range(n))
        while remaining and len(chosen) < k:
            if chosen:
                sim = vn[remaining] @ vn[chosen].T  # (|remaining|, |chosen|)
                penalty = sim.max(axis=1)
            else:
                penalty = np.zeros(len(remaining))
            scores = lam * rel[remaining] - (1.0 - lam) * penalty
            # argmax with doc_id tiebreak: remaining is ordered by
            # (score desc, id asc), and np.argmax takes the first max
            best = int(np.argmax(scores))
            chosen.append(remaining[best])
            obj.append(round(float(scores[best]), 6))
            remaining.pop(best)
        return pd.DataFrame(
            {
                query_id: pdf[query_id].iloc[0],
                doc_id: ids[chosen],
                score_col: np.round(rel[chosen], 6),
                "mmr_rank": np.arange(1, len(chosen) + 1, dtype=np.int32),
                "mmr_score": obj,
            }
        )

    return (
        candidates.select(query_id, doc_id, score_col, vec_col)
        .groupBy(query_id)
        .applyInPandas(_rerank, schema=out_schema)
    )
