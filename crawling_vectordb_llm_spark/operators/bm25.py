"""BM25 keyword search — the lexical complement to the vector search path
(the reference retrieves by embedding only; a training-data/RAG pipeline
needs both, and hybrid = union of the two candidate sets).

Pure DataFrame ops: tokenize → term frequencies → document frequencies →
BM25 scoring join → grouped top-k.  Everything shuffles on `term` (uniform
after stopword-heavy heads are capped by... nothing here — at 100 TB you'd
drop ultra-high-df terms, which contribute ~0 idf anyway) and then once on
(query, doc) for the final sum.

Determinism for the oracle: per-(term,doc) partial scores are cast to
DECIMAL(18,12) before the final sum, so the score is order-independent and
bit-stable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawling_vectordb_llm_spark.operators.topk import grouped_topk

K1 = 1.2
B = 0.75


def bm25_topk(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k BM25 docs per keyword query.  queries = [(query_id, text)]."""
    spark = docs.sparkSession
    qterms = spark.createDataFrame(
        [(qid, t) for qid, text in queries for t in text.split()],
        "query_id long, term string",
    ).distinct()
    scored = bm25_scores(docs, qterms, id_col=id_col, text_col=text_col)
    return grouped_topk(
        scored, ["query_id"], [F.desc("score"), F.asc(id_col)], k
    )


def bm25_scores(
    docs: DataFrame,
    qterms: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 scores (query_id, id_col, score) for DISTINCT (query_id, term)
    pairs — the core bm25_topk wraps, factored out so queries can be
    DERIVED relations (e.g. a document's own token set for self-retrieval
    evaluation) instead of driver literals, and so callers can filter the
    scored relation (exclude self-matches, thresholds) BEFORE ranking."""
    # r14 MEASURED AND REJECTED (kept as the dl-join shape): carrying dl
    # through the exploded token rows into the tf aggregation (min(dl)
    # per group) to drop the dl re-scan + join measured 1.75 -> 2.85 s
    # interleaved on bm25_search — the widened (doc, term) aggregation
    # state over the full token stream costs more than the dl attach,
    # which the planner already executes as a broadcast-side join of a
    # narrow (id, int) relation.  The dl join stays.
    toks = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = docs.select(
        F.col(id_col), F.size(F.split(F.col(text_col), " ")).alias("dl")
    )
    # r13 (guide §1/§5): n_docs and avgdl in ONE aggregation action — the
    # separate count() + agg() pair scanned the document table twice and
    # paid two driver round-trips for two scalars of the same pass.
    stats = dl.agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.col("dl").cast("decimal(22,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("a"),
    ).first()
    n_docs, avgdl = stats["n"], stats["a"]
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    idf = F.log((F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    tf_part = (F.col("tf") * (K1 + 1)) / (
        F.col("tf") + K1 * (1 - B + B * F.col("dl") / F.lit(float(avgdl)))
    )
    # qterms is the QUERY side — bounded by contract (driver literals in
    # bm25_topk, an eval set's token rows otherwise; same posture as
    # contamination_report's broadcast bench shingles, guide §3.1): hint
    # it so the scoring join never sorts/shuffles the tf relation against
    # a size misestimate of a tiny derived relation.
    partial = (
        F.broadcast(qterms).join(tf, "term")
        .join(F.broadcast(dfreq.join(qterms.select("term").distinct(), "term")), "term")
        .join(dl, id_col)
        .select(
            "query_id",
            id_col,
            # DECIMAL(18,9): coarse enough that a 1-2 ulp ln() difference
            # between JVM and libm can't straddle a rounding boundary,
            # exact enough for stable 6dp final scores
            (idf * tf_part).cast("decimal(18,9)").alias("s"),
        )
    )
    return partial.groupBy("query_id", id_col).agg(
        F.round(F.sum("s").cast("double"), 6).alias("score")
    )
