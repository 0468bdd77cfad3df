"""Flagship composed query: the reference's RAG retrieval, end-to-end, batch.

Reproduces main_server.py:127-175 semantics per query (SURVEY §3.2):
  1. embed the query            (service-side in reference; fixture vectors /
                                 hash-embed stub here)
  2. top-k cosine search        (searchByText limit=3 ef=100, main_server.py:41)
  3. concat retrieved texts in descending-score order (listToString,
                                 main_server.py:46-51 — ORDER-SENSITIVE)
  4. prompt template + truncate 20000 (main_server.py:142-143)
  5. citations: title + "     " + id per doc, "\n\n"-joined, appended
                                 (main_server.py:171-174)

Spark shape: broadcast-kNN → one shuffle on query_id → sort-within-group
string agg.  The in-group order is made explicit by sorting (rank, ...)
structs — never rely on collect_list order (SURVEY §7 hard part a).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawling_vectordb_llm_spark.catalog import table_path
from crawling_vectordb_llm_spark.operators.knn import knn_join_numpy

PROMPT_TEMPLATE = 'summarize according to "%s", content: %s'  # P8 analog
PROMPT_MAX_CHARS = 20000  # main_server.py:143
DOC_SNIPPET_CHARS = 200
TOP_K = 3  # main_server.py:41 limit=3


def search_pipeline(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = 5,
    k: int = TOP_K,
) -> DataFrame:
    """Batch searchByText-equivalent over the fixture corpus.

    Queries = the first `n_queries` fixture embeddings (embed-free variant,
    SURVEY §5 smoke); corpus = all embeddings; texts/citations joined from
    `documents` (vec_id ↔ doc_id).  Returns one row per query:
    (query_id, context, citations, prompt).
    """
    emb = spark.read.parquet(table_path(sf_dir, "embeddings"))
    docs = spark.read.parquet(table_path(sf_dir, "documents"))

    queries = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    hits = knn_join_numpy(
        queries, emb, k=k, corpus_id="vec_id", corpus_vec="embedding"
    )
    # join back to documents for text + citation fields (P7/P10 analog);
    # documents is the small dimension side at any corpus scale ratio — but
    # here both sides are big at 100 TB, so this is the one shuffle join;
    # hits is tiny (n_queries*k rows) → broadcast it.
    enriched = docs.join(
        F.broadcast(hits), docs["doc_id"] == hits["vec_id"], "inner"
    ).select(
        "query_id",
        "rank",
        F.substring("text", 1, DOC_SNIPPET_CHARS).alias("snippet"),
        # citation line: source + 5 spaces + id (main_server.py:172 analog:
        # title + "     " + url-id)
        F.concat_ws("     ", F.col("source"), F.col("doc_id").cast("string")).alias(
            "citation"
        ),
    )
    per_query = (
        enriched.groupBy("query_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("rank", "snippet"))).alias("__ctx"),
            F.array_sort(F.collect_list(F.struct("rank", "citation"))).alias("__cit"),
        )
        .select(
            "query_id",
            F.array_join(
                F.transform("__ctx", lambda s: s["snippet"]), "\n"
            ).alias("context"),
            F.array_join(
                F.transform("__cit", lambda s: s["citation"]), "\n\n"
            ).alias("citations"),
        )
    )
    return per_query.select(
        "query_id",
        "context",
        "citations",
        F.substring(
            F.format_string(PROMPT_TEMPLATE, F.lit("query"), F.col("context")),
            1,
            PROMPT_MAX_CHARS,
        ).alias("prompt"),
    ).orderBy("query_id")
