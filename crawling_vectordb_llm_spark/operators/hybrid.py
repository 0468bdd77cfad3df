"""Hybrid retrieval: reciprocal-rank fusion (RRF) of ranked candidate
lists — the standard way to combine vector ANN hits with BM25 lexical hits
(neither score scale is comparable; ranks are).

    rrf(doc) = Σ_systems 1 / (c + rank_system(doc)),  c = 60

Deterministic by construction: ranks are integers, each 1/(c+r) is the
same IEEE double in any engine, and the two-term sum is written as one
fixed-order expression (no aggregation-order ambiguity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawling_vectordb_llm_spark.operators.topk import grouped_topk

RRF_C = 60


def rrf_fuse(
    a: DataFrame,
    b: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Fuse two (query_id, doc_id, rank) lists into top-k by RRF score."""
    ra = a.select(query_col, id_col, F.col(rank_col).alias("__ra"))
    rb = b.select(query_col, id_col, F.col(rank_col).alias("__rb"))
    joined = ra.join(rb, [query_col, id_col], "full_outer")
    score = F.round(
        F.coalesce(1.0 / (RRF_C + F.col("__ra")), F.lit(0.0))
        + F.coalesce(1.0 / (RRF_C + F.col("__rb")), F.lit(0.0)),
        6,
    )
    scored = joined.select(query_col, id_col, score.alias("rrf"))
    return grouped_topk(
        scored, [query_col], [F.desc("rrf"), F.asc(id_col)], k, rank_col="rank"
    ).select(query_col, id_col, F.col("rank").cast("int").alias("rank"), "rrf")
