"""Learned quality-classifier filtering — the model-based tier of the
curation ladder.

The heuristic quality ops (functions/text.py quality_score, Gopher
repetition, entropy) are rule-based; production training-data pipelines
(CCNet, GPT-3's WebText-similarity filter, FineWeb) additionally run a
LEARNED classifier over cheap features and keep/drop by its score.  The
Spark-first shape of that op: featurize with the hashed bag-of-words
embedder (embedding.py — one iterator pandas_udf pass, the same column a
retrieval index would use anyway), then score with a broadcast weight
vector entirely in JVM expressions (zip_with product + left-fold sum), so
the per-row cost beyond featurization is ~dim fused multiply-adds inside
whole-stage codegen.  Map-only: no shuffle at any corpus size.

Training is driver-side on a bounded sample (the codebook-trainer
contract, operators/ivf.py): plain batch-gradient logistic regression in
numpy.  The DEPLOYED artifact is a frozen (weights, bias) fixture — like
the BPE merge table, what ships is the table, not the trainer.

Determinism contract: the score is defined as the SEQUENTIAL left fold
sum(e[j]·w[j], j=0..dim-1) + bias over the float32-cast embedding — an
order-pinned IEEE sequence a SQL oracle replays bit-for-bit
(list_reduce), unlike numpy's pairwise-summed dot.  Output carries the
logit in fixed-point (logit_e6) plus the band label; sigmoid is monotone,
so thresholding the logit IS thresholding the probability without
dragging cross-libm `exp` into the comparison.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def train_quality_weights(
    texts: list[str],
    labels: list[int] | np.ndarray,
    dim: int = 64,
    epochs: int = 400,
    lr: float = 0.5,
) -> tuple[list[float], float]:
    """Batch-GD logistic regression over hashed bag-of-words features.
    Deterministic (no sampling, fixed init); returns (weights, bias)."""
    from crawling_vectordb_llm_spark.embedding import hash_encode_batch

    x = hash_encode_batch(list(texts), dim)
    y = np.asarray(labels, dtype=np.float64)
    w = np.zeros(dim)
    b = 0.0
    for _ in range(epochs):
        p = 1.0 / (1.0 + np.exp(-(x @ w + b)))
        g = p - y
        w -= lr * (x.T @ g) / len(y)
        b -= lr * float(g.mean())
    return [float(v) for v in w], float(b)


def hashed_logit(vec_col: Column | str, weights: list[float], bias: float) -> Column:
    """Order-pinned linear score: left-fold sum of e[j]*w[j] plus bias,
    all JVM expressions (see module docstring for why not a numpy dot)."""
    vec = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    warr = F.array(*[F.lit(float(w)) for w in weights])
    terms = F.zip_with(vec.cast("array<double>"), warr, lambda a, b: a * b)
    return (
        F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x) + F.lit(float(bias))
    )


def quality_classify(
    docs: DataFrame,
    weights: list[float],
    bias: float,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_tau: float = 0.5,
    drop_tau: float = -0.5,
) -> DataFrame:
    """Featurize + score + band.  Output: (id, logit_e6, band) where
    band is keep / review / drop by logit thresholds — the three-way
    routing a curation pipeline feeds into keep-all / human-audit /
    discard."""
    from crawling_vectordb_llm_spark.embedding import make_embed_udf

    if len(weights) != dim:
        raise ValueError(f"got {len(weights)} weights for dim={dim}")
    embed = make_embed_udf(dim=dim)
    scored = docs.select(
        F.col(id_col), hashed_logit(embed(F.col(text_col)), weights, bias).alias("__l")
    )
    return scored.select(
        id_col,
        F.floor(F.col("__l") * F.lit(1e6) + F.lit(0.5)).cast("bigint").alias("logit_e6"),
        F.when(F.col("__l") >= keep_tau, "keep")
        .when(F.col("__l") >= drop_tau, "review")
        .otherwise("drop")
        .alias("band"),
    )
