"""Text-analysis queries over `documents` (P2-P10 generalized + north-star
text ops: quality scoring, token counting, lang-id features, fingerprints).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawling_vectordb_llm_spark.catalog import table_path
from crawling_vectordb_llm_spark.functions import text as X
from crawling_vectordb_llm_spark.suite.registry import query

_STOP_SQL = "('the','and','of','to','a','in','is','for','on','with')"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, "documents"))


@query(
    "unicode_normalize",
    oracle="""
SELECT doc_id, md5(nfc_normalize(text)) AS norm_hash,
       CAST(nfc_normalize(text) = text AS BOOLEAN) AS already_nfc
FROM documents
""",
)
def q_unicode_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC canonicalization (functions/text.py nfc_normalize) —
    byte-level identity for hashing/dedup across composed/decomposed
    sources.  DuckDB's nfc_normalize is the oracle; planted non-ASCII
    agreement is pinned by tests/test_extended_ops.py."""
    d = _docs(spark, sf_dir)
    n = X.nfc_normalize("text")
    return d.select(
        "doc_id",
        F.md5(n).alias("norm_hash"),
        (n == F.col("text")).alias("already_nfc"),
    )


@query(
    "heavy_hitter_terms",
    oracle="""
SELECT lang, t AS term, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
  SELECT lang, unnest(string_split(text, ' ')) AS t FROM documents
) WHERE t <> '' GROUP BY lang, t
""",
)
def q_heavy_hitter_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language heavy hitters via the approx_top_k sketch (Spark 4.1
    built-in).  The sketch is the 100 TB shape: each partition tracks a
    bounded item set and merges combine sketches, so no full (lang, term)
    shuffle of the long tail ever happens.  k (8192) and maxItemsTracked
    (65536) are sized ABOVE any fixture's realized per-lang vocabulary
    (31 terms on driver testdata; up to 4,110 on the fresh synthetic
    fixtures), where the sketch is provably EXACT and complete — so the
    DuckDB full word-count is a valid oracle independent of rank-boundary
    ties; at real scale the same plan degrades gracefully to approximate
    tails with a smaller k."""
    d = _docs(spark, sf_dir)
    toks = d.select(
        "lang", F.explode(F.split("text", " ")).alias("t")
    ).where(F.col("t") != "")
    sk = toks.groupBy("lang").agg(
        F.expr("approx_top_k(t, 8192, 65536)").alias("top")
    )
    return sk.select("lang", F.explode("top").alias("e")).select(
        "lang",
        F.col("e.item").alias("term"),
        F.col("e.count").cast("bigint").alias("cnt"),
    )


@query(
    "pmi_term_associations",
    oracle="""
WITH dt AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS t
  FROM documents WHERE doc_id < 200
), n_docs AS (SELECT COUNT(DISTINCT doc_id) AS n FROM dt),
tf AS (SELECT t, COUNT(*) AS nt FROM dt GROUP BY t),
pairs AS (
  SELECT a.t AS term_a, b.t AS term_b, COUNT(*) AS nab
  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.t < b.t
  GROUP BY a.t, b.t HAVING COUNT(*) >= 5
)
SELECT term_a, term_b, pmi, CAST(rank AS INT) AS rank FROM (
  SELECT term_a, term_b,
         ROUND(ln(nab * n / (ta.nt * CAST(tb.nt AS DOUBLE))), 6) AS pmi,
         row_number() OVER (PARTITION BY term_a
                            ORDER BY ROUND(ln(nab * n / (ta.nt * CAST(tb.nt AS DOUBLE))), 6) DESC,
                                     term_b) AS rank
  FROM pairs JOIN tf ta ON pairs.term_a = ta.t
             JOIN tf tb ON pairs.term_b = tb.t
             CROSS JOIN n_docs
) WHERE rank <= 3
""",
)
def q_pmi_term_associations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI term co-occurrence — the query-expansion table a retrieval
    stack mines offline ("related terms" per seed term): PMI(a,b) =
    ln(P(a,b)/P(a)P(b)) over doc-level occurrence, top-3 partners per
    term.  Scale shape: doc-distinct tokens are map-only; the pair
    generation is a same-doc self-join whose cost is bounded by
    tokens-per-doc (never corpus²); support pruning (nab >= 5) kills the
    long tail before the window."""
    from crawling_vectordb_llm_spark.operators.topk import grouped_topk

    d = _docs(spark, sf_dir).where(F.col("doc_id") < 200)
    dt = d.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("t")
    )
    n_docs = dt.select("doc_id").distinct().count()
    tf = dt.groupBy("t").agg(F.count(F.lit(1)).alias("nt"))
    b = dt.select(F.col("doc_id"), F.col("t").alias("t_b"))
    pairs = (
        dt.join(b, "doc_id")
        .where(F.col("t") < F.col("t_b"))
        .groupBy(F.col("t").alias("term_a"), F.col("t_b").alias("term_b"))
        .agg(F.count(F.lit(1)).alias("nab"))
        .where(F.col("nab") >= 5)
    )
    ta = tf.select(F.col("t").alias("term_a"), F.col("nt").alias("na"))
    tb = tf.select(F.col("t").alias("term_b"), F.col("nt").alias("nb"))
    scored = (
        pairs.join(F.broadcast(ta), "term_a")
        .join(F.broadcast(tb), "term_b")
        .select(
            "term_a",
            "term_b",
            F.round(
                F.log(F.col("nab") * F.lit(n_docs) / (F.col("na") * F.col("nb").cast("double"))),
                6,
            ).alias("pmi"),
        )
    )
    out = grouped_topk(scored, ["term_a"], [F.desc("pmi"), F.asc("term_b")], 3)
    return out.select("term_a", "term_b", "pmi", F.col("rank").cast("int"))


@query(
    "text_clean_truncate",
    oracle="""
SELECT doc_id,
       substr(regexp_replace(substr(text, 1, 6000), '\\s+', ' ', 'g'), 1, 80)
         AS clean_prefix,
       length(substr(text, 1, 6000)) AS clipped_len
FROM documents
""",
)
def q_text_clean_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4/P5: the reference's clean stage (Crawling.py:45-46) as column ops."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.substring(X.clean_text("text"), 1, 80).alias("clean_prefix"),
        F.length(F.substring("text", 1, 6000)).cast("bigint").alias("clipped_len"),
    )


@query(
    "token_count",
    oracle=r"""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_ish
FROM documents
""",
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        X.token_count("text").cast("bigint").alias("n_tokens"),
        X.word_char_tokens("text").cast("bigint").alias("n_bpe_ish"),
    )


@query(
    "text_quality",
    oracle=f"""
SELECT doc_id,
       ROUND(len(list_filter(string_split(text, ' '), t -> t IN {_STOP_SQL}))
             / GREATEST(len(string_split(text, ' ')), 1), 6) AS stop_ratio,
       ROUND(len(regexp_extract_all(text, '[0-9]'))
             / GREATEST(length(text), 1), 6) AS digit_ratio,
       ROUND(0.4 * LEAST(length(text) / 500.0, 1.0)
           + 0.4 * ROUND(len(list_filter(string_split(text, ' '), t -> t IN {_STOP_SQL}))
                         / GREATEST(len(string_split(text, ' ')), 1), 6)
           + 0.2 * (1 - ROUND(len(regexp_extract_all(text, '[0-9]'))
                              / GREATEST(length(text), 1), 6)), 6) AS quality
FROM documents
""",
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        X.stopword_ratio("text").alias("stop_ratio"),
        X.digit_ratio("text").alias("digit_ratio"),
        X.quality_score("text").alias("quality"),
    )


@query(
    "lang_id_features",
    oracle=f"""
SELECT lang,
       ROUND(CAST(SUM(CAST(ROUND(len(list_filter(string_split(text, ' '),
                                                 t -> t IN {_STOP_SQL}))
                      / GREATEST(len(string_split(text, ' ')), 1), 6)
                      AS DECIMAL(22,6))) AS DOUBLE) / COUNT(*), 6) AS avg_stop_ratio,
       ROUND(CAST(SUM(CAST(ROUND(length(replace(text, ' ', ''))
                      / GREATEST(len(string_split(text, ' ')), 1), 6)
                      AS DECIMAL(22,6))) AS DOUBLE) / COUNT(*), 6) AS avg_word_len,
       COUNT(*) AS n_docs
FROM documents GROUP BY lang
""",
)
def q_lang_id_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID feature extraction: per-lang aggregate n-gram-heuristic
    features (stopword ratio, word length) — the trained-classifier stand-in
    keeps the op deterministic and oracle-checkable."""
    d = _docs(spark, sf_dir)
    per_doc = d.select(
        "lang",
        X.stopword_ratio("text").cast("decimal(22,6)").alias("sr"),
        X.avg_word_len("text").cast("decimal(22,6)").alias("wl"),
    )
    return per_doc.groupBy("lang").agg(
        F.round(F.sum("sr").cast("double") / F.count(F.lit(1)), 6).alias(
            "avg_stop_ratio"
        ),
        F.round(F.sum("wl").cast("double") / F.count(F.lit(1)), 6).alias(
            "avg_word_len"
        ),
        F.count(F.lit(1)).alias("n_docs"),
    )


_BM25_QUERIES = [(0, "spark query engine"), (1, "data table scan"), (2, "hash join")]
_BM25_QTERMS_SQL = ", ".join(
    f"({qid}, '{t}')" for qid, text in _BM25_QUERIES for t in text.split()
)


@query(
    "bm25_search",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
), dl AS (
  SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
), stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(len(string_split(text, ' ')) AS DECIMAL(22,6))) AS DOUBLE)
           / COUNT(*) AS avgdl
  FROM documents
), dfreq AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
), qterms(query_id, term) AS (VALUES {_BM25_QTERMS_SQL}),
partial AS (
  SELECT q.query_id, tf.doc_id,
         CAST(ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
              * (tf.tf * (1.2 + 1)) / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))
              AS DECIMAL(18,9)) AS sc
  FROM qterms q
  JOIN tf ON tf.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id, stats s
), scored AS (
  SELECT query_id, doc_id, ROUND(CAST(SUM(sc) AS DOUBLE), 6) AS score
  FROM partial GROUP BY 1, 2
)
SELECT query_id, doc_id, CAST(rank AS INT) AS rank, score FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY score DESC, doc_id) AS rank
  FROM scored)
WHERE rank <= 10
""",
)
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword search top-10 — the lexical retrieval path (pairs with
    the vector path for hybrid search)."""
    from crawling_vectordb_llm_spark.operators.bm25 import bm25_topk

    out = bm25_topk(_docs(spark, sf_dir), _BM25_QUERIES, k=10)
    return out.select(
        "query_id", "doc_id", F.col("rank").cast("int").alias("rank"), "score"
    )


_HYBRID_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
), dl AS (
  SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
), stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(len(string_split(text, ' ')) AS DECIMAL(22,6))) AS DOUBLE)
           / COUNT(*) AS avgdl
  FROM documents
), dfreq AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
), qterms(query_id, term) AS (VALUES {{qterms}}),
partial AS (
  SELECT q.query_id, tf.doc_id,
         CAST(ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
              * (tf.tf * (1.2 + 1)) / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))
              AS DECIMAL(18,9)) AS sc
  FROM qterms q
  JOIN tf ON tf.term = q.term
  JOIN dfreq d ON d.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id, stats s
), bscored AS (
  SELECT query_id, doc_id, ROUND(CAST(SUM(sc) AS DOUBLE), 6) AS score
  FROM partial GROUP BY 1, 2
), branks AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
  FROM bscored QUALIFY rank <= 20
), vq AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < {{nq}}
), vscored AS (
  SELECT vq.query_id, e.vec_id AS doc_id,
         list_cosine_similarity(vq.qv, CAST(e.embedding AS DOUBLE[])) AS score
  FROM vq CROSS JOIN embeddings e
), vranks AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
  FROM vscored QUALIFY rank <= 20
), fused AS (
  SELECT COALESCE(v.query_id, b.query_id) AS query_id,
         COALESCE(v.doc_id, b.doc_id) AS doc_id,
         ROUND(COALESCE(1.0 / (60 + v.rank), 0.0)
             + COALESCE(1.0 / (60 + b.rank), 0.0), 6) AS rrf
  FROM vranks v FULL OUTER JOIN branks b
    ON v.query_id = b.query_id AND v.doc_id = b.doc_id
)
SELECT query_id, doc_id, CAST(rank AS INT) AS rank, rrf FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rank
  FROM fused)
WHERE rank <= 10
"""


@query(
    "hybrid_rrf_search",
    oracle=_HYBRID_ORACLE.format(qterms=_BM25_QTERMS_SQL, nq=3),
)
def q_hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: vector kNN (top-20) ⊕ BM25 (top-20) fused by
    reciprocal-rank fusion, top-10 per query."""
    from crawling_vectordb_llm_spark.catalog import table_path
    from crawling_vectordb_llm_spark.operators.bm25 import bm25_topk
    from crawling_vectordb_llm_spark.operators.hybrid import rrf_fuse
    from crawling_vectordb_llm_spark.operators.knn import knn_join_numpy

    docs = _docs(spark, sf_dir)
    emb = spark.read.parquet(table_path(sf_dir, "embeddings"))
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    vector_hits = knn_join_numpy(queries, emb, k=20, corpus_id="vec_id").select(
        "query_id", F.col("vec_id").alias("doc_id"), "rank"
    )
    bm25_hits = bm25_topk(docs, _BM25_QUERIES, k=20).select(
        "query_id", "doc_id", "rank"
    )
    return rrf_fuse(vector_hits, bm25_hits, k=10)


@query(
    "doc_fingerprint",
    oracle="""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(string_split(text, ' '),
                          t -> CAST(length(t) * 17 + COALESCE(ascii(t), 0) AS BIGINT))),
         (acc, x) -> (acc * 31 + x) % 1000000007) AS fp
FROM documents
""",
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling polynomial fingerprint per document (dedup building block)."""
    d = _docs(spark, sf_dir)
    return d.select("doc_id", X.fingerprint("text").alias("fp"))


@query(
    "quality_band_filter",
    oracle=f"""
WITH q AS (
  SELECT doc_id, lang,
         ROUND(0.4 * LEAST(length(text) / 500.0, 1.0)
             + 0.4 * ROUND(len(list_filter(string_split(text, ' '), t -> t IN {_STOP_SQL}))
                           / GREATEST(len(string_split(text, ' ')), 1), 6)
             + 0.2 * (1 - ROUND(len(regexp_extract_all(text, '[0-9]'))
                                / GREATEST(length(text), 1), 6)), 6) AS quality
  FROM documents
), b AS (
  SELECT lang, quantile_cont(quality, 0.1) AS lo, quantile_cont(quality, 0.9) AS hi
  FROM q GROUP BY lang
)
SELECT q.doc_id, q.lang, q.quality,
       ROUND(b.lo, 6) AS lo6, ROUND(b.hi, 6) AS hi6
FROM q JOIN b ON q.lang = b.lang
WHERE q.quality BETWEEN b.lo AND b.hi
""",
)
def q_quality_band_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quality-band gate: keep documents inside the [p10, p90]
    exact-percentile band of the quality score — the curation step that
    drops both garbage and boilerplate-perfect outliers before training.
    Scale shape: one groupBy(lang) produces a tiny per-group bounds table
    (languages number in the hundreds), broadcast back onto the corpus —
    no window over the full data, no second shuffle."""
    d = _docs(spark, sf_dir)
    q = d.select("doc_id", "lang", X.quality_score("text").alias("quality"))
    b = q.groupBy("lang").agg(
        F.expr("percentile(quality, 0.1)").alias("lo"),
        F.expr("percentile(quality, 0.9)").alias("hi"),
    )
    return (
        q.join(F.broadcast(b), "lang")
        .where(F.col("quality").between(F.col("lo"), F.col("hi")))
        .select(
            "doc_id",
            "lang",
            "quality",
            F.round("lo", 6).alias("lo6"),
            F.round("hi", 6).alias("hi6"),
        )
    )


@query(
    "source_quota_filter",
    oracle=f"""
WITH q AS (
  SELECT doc_id, source,
         ROUND(0.4 * LEAST(length(text) / 500.0, 1.0)
             + 0.4 * ROUND(len(list_filter(string_split(text, ' '), t -> t IN {_STOP_SQL}))
                           / GREATEST(len(string_split(text, ' ')), 1), 6)
             + 0.2 * (1 - ROUND(len(regexp_extract_all(text, '[0-9]'))
                                / GREATEST(length(text), 1), 6)), 6) AS quality
  FROM documents
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                               ORDER BY quality DESC, doc_id) AS rn
  FROM q
)
SELECT doc_id, source, quality, CAST(rn AS INT) AS rn
FROM ranked WHERE rn <= 15
""",
)
def q_source_quota_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota: keep at most the 15 highest-quality docs per
    source — the anti-domination cap that stops one domain from flooding
    a training mix.  One shuffle on source; ranking-window row_number is
    rewritten by Spark into WindowGroupLimit, so each partition keeps a
    40-row heap instead of sorting the whole group."""
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    q = d.select("doc_id", "source", X.quality_score("text").alias("quality"))
    w = Window.partitionBy("source").orderBy(F.desc("quality"), F.asc("doc_id"))
    return (
        q.withColumn("rn", F.row_number().over(w).cast("int"))
        .where(F.col("rn") <= 15)
    )



@query(
    "unigram_logprob_score",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), freq AS (
  SELECT term, COUNT(*) AS c FROM toks GROUP BY term
), total AS (
  SELECT CAST(SUM(c) AS DOUBLE) AS n FROM freq
), scored AS (
  SELECT t.doc_id, ln(f.c / total.n) AS lp
  FROM toks t JOIN freq f ON t.term = f.term CROSS JOIN total
)
SELECT doc_id,
       COUNT(*) AS n_tokens,
       CAST(SUM(CAST(ROUND(lp, 6) AS DECIMAL(22,6))) AS DOUBLE)
         AS sum_logprob
FROM scored GROUP BY doc_id
""",
)
def q_unigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality: a unigram model estimated from the corpus
    itself (one token aggregation), each doc scored by its mean token
    log-probability — low scores flag gibberish, high scores flag
    boilerplate.  The vocabulary table is small (Zipf: unique terms <<
    tokens) and broadcasts back onto the token stream; per-token logprobs
    are rounded to 6 dp and summed as decimals, and the EXACT SUM is the
    output (with n_tokens; the mean is one division away) — a rounded
    sum/count mean hits the 6-dp midpoint lottery whenever count divides
    the scaled sum into a ...5 tail, which the fresh-entropy sf1 run
    caught on ~2/50k docs (same class and fix as dsir_importance, r4)."""
    d = _docs(spark, sf_dir)
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    # r13 (guide §1.4/§5, same fusion as bigram_logprob_score below): the
    # vocabulary total rides the checkpoint materialization as an
    # observe() metric — the old shape re-ran the full token aggregation
    # once for the total and again for the scoring broadcast.
    from crawling_vectordb_llm_spark.operators.fusion import (
        checkpoint_with_metrics,
    )

    freq, vals = checkpoint_with_metrics(
        toks.groupBy("term").agg(F.count(F.lit(1)).alias("c")),
        "unigram_total",
        F.sum("c").alias("n"),
    )
    total = (
        float(vals[0])
        if vals is not None
        else float(freq.agg(F.sum("c")).first()[0])
    )
    scored = toks.join(F.broadcast(freq), "term").select(
        "doc_id",
        F.round(F.log(F.col("c") / F.lit(total)), 6)
        .cast("decimal(22,6)")
        .alias("lp"),
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("lp").cast("double").alias("sum_logprob"),
    )


@query(
    "quality_histogram",
    oracle=f"""
WITH q AS (
  SELECT lang,
         ROUND(0.4 * LEAST(length(text) / 500.0, 1.0)
             + 0.4 * ROUND(len(list_filter(string_split(text, ' '), t -> t IN {_STOP_SQL}))
                           / GREATEST(len(string_split(text, ' ')), 1), 6)
             + 0.2 * (1 - ROUND(len(regexp_extract_all(text, '[0-9]'))
                                / GREATEST(length(text), 1), 6)), 6) AS quality
  FROM documents
)
SELECT lang,
       CAST(LEAST(floor(quality * 10), 9) AS INT) AS bucket,
       COUNT(*) AS n_docs
FROM q GROUP BY 1, 2
""",
)
def q_quality_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width quality histogram per language (10 buckets over [0,1]) —
    the distribution profile a curation run records before choosing gate
    thresholds.  Bucketing is a map-side expression; one aggregation
    shuffle on (lang, bucket)."""
    d = _docs(spark, sf_dir)
    q = d.select("lang", X.quality_score("text").alias("quality"))
    bucket = F.least(F.floor(F.col("quality") * 10), F.lit(9)).cast("int")
    return q.groupBy("lang", bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )


@query("compression_ratio_quality")
def q_compression_ratio_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: zlib compression ratio per document — highly repetitive
    or templated text compresses far below natural prose, a cheap
    model-free quality/repetition signal (used alongside the Gopher rules).
    Python stage by necessity (no JVM zlib expression), but Arrow-batched:
    one mapInPandas pass, compression in C, no per-row Python overhead.
    Bounds and monotonicity are pinned in tests."""
    d = _docs(spark, sf_dir)
    return d.select("doc_id", "text").mapInPandas(
        compression_ratio_kernel(), schema="doc_id long, n_chars long, ratio_e6 long"
    )


def compression_ratio_kernel():
    """Arrow-batch kernel: zlib-compressed size / raw size in micro-units."""
    import zlib

    import pandas as pd

    def _ratio(batches):
        for pdf in batches:
            texts = pdf["text"].fillna("")
            raw = texts.str.len().clip(lower=1)
            comp = [len(zlib.compress(t.encode("utf-8"), 6)) for t in texts]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_chars": raw.astype("int64"),
                    "ratio_e6": (
                        pd.Series(comp, index=texts.index) / raw * 1_000_000
                    ).astype("int64"),
                }
            )

    return _ratio


def _compression_gate_kernel():
    """Soundness gates for the zlib kernel, computed where the BYTES are
    known exactly (the pytest bounds live in tests; this kernel puts the
    same invariants under the per-round DuckDB oracle):

    - bounds_ok: zlib's framing floor (2-byte header + 4-byte adler +
      minimal deflate ≥ 8 total) and its stored-block worst-case ceiling
      (raw + 5 bytes per stored block + trailer, padded generously) —
      violated only if the compression call itself is broken.
    - double_ok: doubling the text adds one back-reference, not a second
      copy — comp(t||t) ≤ comp(t) + 64 whenever the whole first copy fits
      in deflate's 32 KiB window (larger texts are exempt: the match
      distance exceeds the window and the property genuinely fails).
    - ratio_e6 is recomputed with the production kernel's exact float
      path (comp / chars * 1e6, int64 truncation) so the caller can pin
      kernel-vs-kernel consistency in-plan."""
    import zlib

    import pandas as pd

    def _gates(batches):
        for pdf in batches:
            texts = pdf["text"].fillna("")
            out = {"doc_id": pdf["doc_id"], "n_chars": [], "ratio_e6": [],
                   "bounds_ok": [], "double_ok": []}
            for t in texts:
                b = t.encode("utf-8")
                raw_b = len(b)
                comp = len(zlib.compress(b, 6))
                comp2 = len(zlib.compress(b + b, 6))
                n_chars = max(len(t), 1)
                out["n_chars"].append(n_chars)
                out["ratio_e6"].append(int(comp / n_chars * 1_000_000))
                out["bounds_ok"].append(
                    8 <= comp <= raw_b + 5 * (raw_b // 16_384 + 1) + 16
                )
                out["double_ok"].append(raw_b > 30_000 or comp2 <= comp + 64)
            yield pd.DataFrame(out)

    return _gates


@query(
    "compression_ratio_perdoc_gate",
    oracle="""
SELECT doc_id, GREATEST(length(text), 1) AS n_chars,
       TRUE AS bounds_ok, TRUE AS double_ok, TRUE AS kernel_consistent
FROM documents
""",
)
def q_compression_ratio_perdoc_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-DOC oracle companion to `compression_ratio_quality` (VERDICT
    r9 #6) — the aggregate `compression_ratio_soundness` gate (below, r8)
    pins quartile-level separation; this one pins every row: zlib itself
    is not SQL-expressible, so the DuckDB side checks what IS — per-doc
    char counts as real values, and the kernel's soundness invariants as
    booleans the value hash forces to TRUE.  `kernel_consistent` joins
    the PRODUCTION kernel's ratio_e6 against an independent
    recomputation, so a regression in the shipped kernel's arithmetic
    (not just in zlib's output) fails the oracle on the exact doc that
    broke.  Two linear Arrow passes + one equi-join on doc_id — no
    collect, no quadratic stage."""
    d = _docs(spark, sf_dir)
    base = d.select("doc_id", "text").mapInPandas(
        compression_ratio_kernel(), schema="doc_id long, n_chars long, ratio_e6 long"
    )
    gates = d.select("doc_id", "text").mapInPandas(
        _compression_gate_kernel(),
        schema="doc_id long, n_chars long, ratio_e6 long, "
        "bounds_ok boolean, double_ok boolean",
    )
    return gates.alias("g").join(base.alias("b"), "doc_id").select(
        "doc_id",
        F.col("g.n_chars").alias("n_chars"),
        F.col("g.bounds_ok").alias("bounds_ok"),
        F.col("g.double_ok").alias("double_ok"),
        (F.col("g.ratio_e6") == F.col("b.ratio_e6")).alias("kernel_consistent"),
    )


@query(
    "bigram_logprob_score",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w)),
                               i -> {'h': w[i], 't': w[i + 1]})) AS g
  FROM toks WHERE len(w) >= 2
), big AS MATERIALIZED (
  -- MATERIALIZED (r8): big/bigc are each referenced by several
  -- downstream CTEs; DuckDB inlines plain CTEs per reference, and with
  -- the 4,110-word vocabulary (249k distinct bigrams at 5k docs, vs
  -- ~900 under the old 30-word vocab) the recomputed-inline plan blew
  -- past 300 s where the materialized plan takes ~1.4 s.
  SELECT doc_id, g.h AS head, g.t AS tail FROM grams
), bigc AS MATERIALIZED (
  SELECT head, tail, COUNT(*) AS c2 FROM big GROUP BY head, tail
), unic AS (
  SELECT head, SUM(c2) AS c1 FROM bigc GROUP BY head
), tailc AS (
  -- explicit tail-count table JOINed in (r8), replacing a correlated
  -- scalar subquery (SELECT SUM(c2) ... WHERE x.tail = b.tail) —
  -- same shape as the Spark side's tailc broadcast
  SELECT tail, SUM(c2) AS ct FROM bigc GROUP BY tail
), tot AS (
  SELECT CAST(SUM(c2) AS DOUBLE) AS n FROM bigc
), scored AS (
  SELECT b.doc_id,
         CAST(ROUND(ln(0.7 * (bc.c2 / u.c1)
                     + 0.3 * (tc.ct / t.n)), 6) AS DECIMAL(22,6)) AS lp
  FROM big b
  JOIN bigc bc ON bc.head = b.head AND bc.tail = b.tail
  JOIN unic u ON u.head = b.head
  JOIN tailc tc ON tc.tail = b.tail
  CROSS JOIN tot t
)
SELECT doc_id, COUNT(*) AS n_bigrams,
       CAST(SUM(lp) AS DOUBLE) AS sum_logprob
FROM scored GROUP BY doc_id
""",
)
def q_bigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram LM quality (the next rung above
    unigram_logprob_score): p(t|h) = 0.7·ML(t|h) + 0.3·p_unigram(t),
    each doc scored by its mean bigram log-probability — catches
    scrambled-word-order gibberish a unigram model scores as fluent.

    Scale shape: the bigram/unigram/tail count tables are Zipf-small
    (vocab² bounded by observed pairs) and broadcast back onto the
    bigram stream; the corpus shuffles once for the final per-doc mean.
    Per-bigram logprobs round at 6 dp and sum as decimals, and the
    EXACT SUM is the output (with n_bigrams) — the rounded sum/count
    mean was a 6-dp midpoint lottery the fresh-entropy sf1 run caught
    (see unigram_logprob_score)."""
    d = _docs(spark, sf_dir)
    toks = F.split("text", " ")
    m = F.size(toks) - 1
    grams = F.zip_with(
        F.slice(toks, 1, m), F.slice(toks, 2, m),
        lambda x, y: F.struct(x.alias("head"), y.alias("tail")),
    )
    big = d.select(
        "doc_id",
        F.explode(
            F.when(F.size(toks) >= 2, grams).otherwise(
                F.array().cast("array<struct<head:string,tail:string>>")
            )
        ).alias("g"),
    ).select("doc_id", "g.head", "g.tail")
    from crawling_vectordb_llm_spark.operators.fusion import (
        checkpoint_with_metrics,
    )

    # r13 (guide §1.4/§5): the model total rides the checkpoint
    # materialization as an observe() metric — one corpus pass + one
    # driver round-trip where checkpoint + a second agg action paid two.
    bigc, vals = checkpoint_with_metrics(
        big.groupBy("head", "tail").agg(F.count(F.lit(1)).alias("c2")),
        "bigram_total",
        F.sum("c2").alias("n"),
    )  # bigc: 3 consumers below; count once
    unic = bigc.groupBy("head").agg(F.sum("c2").alias("c1"))
    tailc = bigc.groupBy("tail").agg(F.sum("c2").alias("ct"))
    n_total = (
        float(vals[0])
        if vals is not None
        else float(bigc.agg(F.sum("c2")).first()[0])
    )
    scored = (
        big.join(F.broadcast(bigc), ["head", "tail"])
        .join(F.broadcast(unic), "head")
        .join(F.broadcast(tailc), "tail")
        .select(
            "doc_id",
            F.round(
                F.log(
                    0.7 * (F.col("c2") / F.col("c1"))
                    + 0.3 * (F.col("ct") / F.lit(n_total))
                ),
                6,
            )
            .cast("decimal(22,6)")
            .alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("lp").cast("double").alias("sum_logprob"),
    )


@query(
    "char_entropy_quality",
    oracle="""
WITH chars AS (
  SELECT doc_id,
         unnest(list_transform(range(1, length(text) + 1),
                               i -> substr(text, i, 1))) AS ch
  FROM documents WHERE length(text) > 0
), counts AS (
  SELECT doc_id, ch, COUNT(*) AS c FROM chars GROUP BY doc_id, ch
), lens AS (
  SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS n FROM counts GROUP BY doc_id
)
SELECT c.doc_id,
       CAST(COUNT(*) AS INT) AS n_distinct_chars,
       ROUND(CAST(SUM(CAST(ROUND(-(c.c / l.n) * ln(c.c / l.n), 6)
                          AS DECIMAL(22,6))) AS DOUBLE), 6) AS entropy
FROM counts c JOIN lens l USING (doc_id)
GROUP BY c.doc_id
""",
)
def q_char_entropy_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document — the classic cheap
    gibberish/boilerplate detector (near-zero entropy = repeated filler,
    abnormally high = binary junk or encoding damage); complements the
    zlib compression-ratio signal with an exactly-reproducible formula.

    Scale shape: one explode to (doc, char) and two keyed aggregations
    that share the doc_id hash partition; per-term entropy contributions
    round at 6 dp and sum as decimals (registry determinism rules)."""
    d = _docs(spark, sf_dir).where(F.length("text") > 0)
    chars = d.select("doc_id", F.explode(F.split("text", "")).alias("ch"))
    counts = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    lens = counts.groupBy("doc_id").agg(F.sum("c").cast("double").alias("n"))
    p = F.col("c") / F.col("n")
    return (
        counts.join(lens, "doc_id")
        .select(
            "doc_id",
            F.round(-p * F.log(p), 6).cast("decimal(22,6)").alias("term"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_distinct_chars"),
            F.round(F.sum("term").cast("double"), 6).alias("entropy"),
        )
    )


def _quality_clf_fixture() -> tuple[list[float], float, int]:
    """Frozen quality-classifier weights (operators/quality_clf.py):
    logistic regression over 64-dim hashed bag-of-words features,
    trained once against the repo's quality_score heuristic binarized
    at its median (84% train agreement) and checked in — the deployed
    shape of a learned curation filter, like the BPE merge fixture."""
    import json
    import os

    p = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "fixtures",
        "quality_clf_v1.json",
    )
    with open(p) as fh:
        d = json.load(fh)
    return d["weights"], d["bias"], d["dim"]


def _quality_clf_oracle() -> str:
    """Replay featurize→score→band in SQL: the md5-embed fragment
    (vector_suite) produces the identical float32-cast embedding, the
    logit is the same SEQUENTIAL left fold (list_reduce) over e[j]*w[j]
    plus bias, and the fixed-point/band outputs involve no
    transcendentals — bit-equality end to end."""
    from crawling_vectordb_llm_spark.suite.vector_suite import (
        _md5_embed_fragment,
    )

    weights, bias, dim = _quality_clf_fixture()
    wlit = "[" + ", ".join(repr(w) for w in weights) + "]"
    frag = _md5_embed_fragment(
        "SELECT doc_id AS id, text AS txt FROM documents", "emb", dim
    )
    return f"""
WITH {frag}, scored AS (
  SELECT id AS doc_id,
         list_reduce(
           list_prepend(0.0,
             list_transform(range(1, {dim + 1}), j -> e[j] * ({wlit})[j])),
           (acc, x) -> acc + x) + {repr(bias)} AS l
  FROM emb
)
SELECT doc_id,
       CAST(FLOOR(l * 1e6 + 0.5) AS BIGINT) AS logit_e6,
       CASE WHEN l >= 0.5 THEN 'keep'
            WHEN l >= -0.5 THEN 'review'
            ELSE 'drop' END AS band
FROM scored
"""


@query("quality_classifier_filter", oracle=_quality_clf_oracle())
def q_quality_classifier_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LEARNED tier of the curation ladder (CCNet / GPT-3 / FineWeb
    style): hashed bag-of-words featurization (one iterator-pandas_udf
    pass) scored by a frozen logistic-regression weight fixture entirely
    in JVM expressions — map-only at any corpus size — then banded into
    keep / review / drop.  Oracle replays featurization, the order-pinned
    fold, and the banding bit-for-bit; training is driver-side on a
    bounded sample (tests/test_quality_clf.py)."""
    from crawling_vectordb_llm_spark.operators.quality_clf import (
        quality_classify,
    )

    weights, bias, dim = _quality_clf_fixture()
    return quality_classify(
        spark.read.parquet(table_path(sf_dir, "documents")), weights, bias, dim
    )


@query(
    "term_postings_index",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT term, doc_id, COUNT(*) AS tf FROM toks GROUP BY 1, 2
)
SELECT term,
       CAST(COUNT(*) AS INT) AS df,
       CAST(SUM(tf) AS BIGINT) AS cf,
       array_to_string(list(doc_id ORDER BY doc_id)[:8], '|') AS posting_head
FROM tf GROUP BY term HAVING COUNT(*) >= 25
""",
)
def q_term_postings_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index materialization — the index ARTIFACT behind the
    BM25/hybrid path made first-class: per term, document frequency,
    collection frequency, and the sorted posting-list head (rendered as
    a string — the flat-value form the driver's comparator hashes).  One shuffle
    on (term, doc) for tf, one on term folding postings into a sorted
    array (bounded here to the 8-entry head so the demo output stays
    narrow; the full list is the same expression without the slice).  At
    scale this table IS the searchable index — written bucketed by term,
    a keyword lookup is one pruned scan."""
    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    tf = toks.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    return (
        tf.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("int").alias("df"),
            F.sum("tf").alias("cf"),
            F.concat_ws(
                "|",
                F.slice(F.array_sort(F.collect_list("doc_id")), 1, 8),
            ).alias("posting_head"),
        )
        .where(F.col("df") >= 25)
    )


@query(
    "compression_ratio_soundness",
    oracle="""
SELECT COUNT(*) AS n_docs, TRUE AS bounds_ok, TRUE AS separates_repetition
FROM documents
""",
)
def q_compression_ratio_soundness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The zlib quality signal graduated to an oracle gate (the ratio
    itself has no SQL analog): the value hash pins (1) per-doc BOUNDS —
    every ratio positive and under zlib's worst-case envelope
    1 + (12 + n/1000)/n (stored-block expansion plus the fixed ~11-byte
    header, which dominates on the fixture's shortest ~47-char docs) —
    and (2) the signal's REASON TO EXIST: docs
    in the most-repetitive quartile by distinct-token fraction (a pure
    SQL feature) must compress strictly better ON AVERAGE than the
    least-repetitive quartile.  Quartile membership comes from exact
    percentile CUT POINTS (p25/p75 aggregates broadcast back), not a
    global ntile Window — no single-partition sort of the whole
    relation, so the gate keeps the suite's scale posture (ADVICE r3).
    Aggregate-level, so fixture-robust; a broken kernel (wrong level,
    truncated input, swapped columns) flips a boolean and fails the
    hash."""
    d = _docs(spark, sf_dir)
    ratios = d.select("doc_id", "text").mapInPandas(
        compression_ratio_kernel(), schema="doc_id long, n_chars long, ratio_e6 long"
    )
    toks = F.split("text", " ")
    rep = d.select(
        "doc_id",
        (F.size(F.array_distinct(toks)) / F.greatest(F.size(toks), F.lit(1))).alias(
            "distinct_frac"
        ),
    )
    joined = ratios.join(rep, "doc_id")
    cuts = joined.agg(
        F.expr("percentile(distinct_frac, 0.25)").alias("p25"),
        F.expr("percentile(distinct_frac, 0.75)").alias("p75"),
    )
    with_cuts = joined.crossJoin(F.broadcast(cuts))
    rep_mean = (
        with_cuts.where(F.col("distinct_frac") <= F.col("p25"))
        .agg(F.avg("ratio_e6").alias("rep_mean"))
    )
    nat_mean = (
        with_cuts.where(F.col("distinct_frac") >= F.col("p75"))
        .agg(F.avg("ratio_e6").alias("nat_mean"))
    )
    within_envelope = (
        (F.col("ratio_e6") > 0)
        & (
            F.col("ratio_e6")
            <= 1_001_000 + (12_000_000 / F.col("n_chars")).cast("long")
        )
    ).cast("int")
    bounds = joined.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.min(within_envelope) == 1).alias("bounds_ok"),
    )
    return (
        bounds.crossJoin(F.broadcast(rep_mean))
        .crossJoin(F.broadcast(nat_mean))
        .select(
            "n_docs",
            "bounds_ok",
            (F.col("rep_mean") < F.col("nat_mean")).alias(
                "separates_repetition"
            ),
        )
    )
