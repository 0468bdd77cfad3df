"""Retrieval evaluation metrics — recall@k, MRR@k, nDCG@k as distributed
relational ops.

The engine ships several retrievers (exact kNN, IVF/PQ/LSH/Hamming ANN,
BM25, hybrid RRF, rerankers); a pipeline tuning them needs the IR metric
layer evaluated AT CORPUS SCALE, not driver-side.  Everything here is two
aggregations over (query, doc, rank) relations — no collects, no UDFs.

Cross-engine determinism: the per-rank DCG gains 1/log2(rank+1) are NOT
computed at runtime (libm log2 could differ by an ulp between the JVM and
DuckDB); they are 9-dp literals baked from Python, summed as
DECIMAL(18,9) (exact, order-independent), so both engines derive
bit-identical metrics.  `dcg_gain_literals` / `idcg_literals` expose the
same tables for the SQL oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dcg_gain_literals(k: int) -> list[str]:
    """gain[rank] = round(1/log2(rank+1), 9) as exact decimal strings,
    rank = 1..k."""
    return [f"{1.0 / math.log2(r + 1):.9f}" for r in range(1, k + 1)]


def idcg_literals(k: int) -> list[str]:
    """idcg[m] = sum of the first m ROUNDED gains (exact in decimal),
    m = 1..k — the ideal DCG for a query with m relevant documents."""
    gains = dcg_gain_literals(k)
    total = 0
    out = []
    for g in gains:
        total += int(g.replace(".", ""))  # 9-dp fixed point, exact
        out.append(f"{total // 10**9}.{total % 10**9:09d}")
    return out


def retrieval_metrics(
    retrieved: DataFrame,
    qrels: DataFrame,
    k: int,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query (recall@k, mrr@k, ndcg@k), all rounded to 6 dp.

    retrieved: (query, doc, rank) with rank in 1..k; qrels: (query, doc)
    — the relevant set.  recall@k divides by min(|rels|, k); MRR is
    1/first relevant rank (0.0 when nothing relevant was retrieved);
    nDCG@k uses binary gains against the ideal prefix for min(|rels|, k).

    One shuffle joins retrieved to qrels on (query, doc); both aggregates
    group on query — at any corpus scale these relations are
    n_queries × k rows, so the metric layer costs nothing next to the
    retrieval it measures."""
    gains = dcg_gain_literals(k)
    idcgs = idcg_literals(k)
    gain_arr = F.array([F.lit(g).cast("decimal(18,9)") for g in gains])
    idcg_arr = F.array([F.lit(v).cast("decimal(18,9)") for v in idcgs])

    r = retrieved.select(
        F.col(query_col).alias("q"),
        F.col(doc_col).alias("d"),
        F.col(rank_col).cast("int").alias("rk"),
    )
    rel = qrels.select(
        F.col(query_col).alias("q"), F.col(doc_col).alias("d")
    )
    # r14 (guide §3.1): both relations are <= n_queries x k rows BY THIS
    # OPERATOR'S CONTRACT (docstring above) at any corpus scale, but they
    # arrive behind windows/aggregations whose size estimates are far too
    # high to broadcast statically — the r13 plan shows LeftOuter
    # SortMergeJoin + a 3-exchange inner join for relations of ~150 rows.
    # Explicit hints pin both metric joins to broadcast.
    n_rel = rel.groupBy("q").agg(F.count(F.lit(1)).alias("n_rel"))
    hits = r.join(F.broadcast(rel), ["q", "d"]).groupBy("q").agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.min("rk").alias("first_rank"),
        F.sum(F.element_at(gain_arr, F.col("rk"))).alias("dcg"),
    )
    m = F.least(F.col("n_rel"), F.lit(k)).cast("int")
    return (
        n_rel.join(F.broadcast(hits), "q", "left")
        .select(
            F.col("q").alias(query_col),
            F.round(
                F.coalesce(F.col("n_hits"), F.lit(0)) / m, 6
            ).alias("recall_at_k"),
            F.round(
                F.coalesce(1.0 / F.col("first_rank"), F.lit(0.0)), 6
            ).alias("mrr"),
            F.round(
                F.coalesce(F.col("dcg").cast("double"), F.lit(0.0))
                / F.element_at(idcg_arr, m).cast("double"),
                6,
            ).alias("ndcg"),
        )
    )
