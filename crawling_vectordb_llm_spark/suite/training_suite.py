"""Training-data-pipeline queries over `documents` — the curation ops a
large-scale LLM data pipeline runs between crawl and training, beyond what
the reference itself ships (its whole curation surface is truncate+collapse,
Crawling.py:45-46): chunking, repetition-based quality signals, PII
redaction, deterministic sampling, TF-IDF keyword extraction, and shard
assignment for training-set writes.

All six are pure JVM column expressions / built-in aggregations (no UDFs),
each with an exact DuckDB oracle.  Determinism: floats rounded to 6 dp in
both engines, ranks tie-broken by term/id, hash-based ops use md5 (identical
hex in Spark and DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawling_vectordb_llm_spark.catalog import table_path
from crawling_vectordb_llm_spark.operators.chunking import chunk_documents
from crawling_vectordb_llm_spark.operators.topk import grouped_topk
from crawling_vectordb_llm_spark.suite.registry import query
from crawling_vectordb_llm_spark.suite.text_suite import _STOP_SQL


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, "documents"))


@query(
    "doc_chunks",
    oracle="""
WITH s AS (
  SELECT doc_id, text,
         unnest(generate_series(1, greatest(length(text), 1), 150)) AS start
  FROM documents
)
SELECT doc_id,
       CAST((start - 1) / 150 AS INT) AS chunk_id,
       length(substr(text, start, 200)) AS chunk_len,
       substr(text, start, 40) AS chunk_prefix
FROM s
""",
)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG chunking: 200-char windows, 50-char overlap (step 150) — the
    lossless generalization of the reference's 6000-char truncate."""
    chunks = chunk_documents(_docs(spark, sf_dir), size=200, overlap=50)
    return chunks.select(
        "doc_id",
        "chunk_id",
        F.length("chunk_text").cast("bigint").alias("chunk_len"),
        F.substring("chunk_text", 1, 40).alias("chunk_prefix"),
    )


@query(
    "quality_repetition",
    oracle="""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
toks AS (
  SELECT doc_id, ws[i] AS word FROM t, UNNEST(generate_series(1, len(ws))) AS s(i)
),
uni AS (SELECT doc_id, word, COUNT(*) AS c FROM toks GROUP BY 1, 2),
us AS (
  SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS n_tok, COUNT(*) AS n_distinct,
         MAX(c) AS max_uni
  FROM uni GROUP BY 1
),
bt AS (
  SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS bg
  FROM t, UNNEST(generate_series(1, len(ws) - 1)) AS s(i)
),
bg AS (SELECT doc_id, bg, COUNT(*) AS c FROM bt GROUP BY 1, 2),
bs AS (
  SELECT doc_id, MAX(c) AS max_big, CAST(SUM(c) AS DOUBLE) AS n_big
  FROM bg GROUP BY 1
)
SELECT us.doc_id,
       ROUND(1 - n_distinct / n_tok, 6) AS dup_word_frac,
       ROUND(max_uni / n_tok, 6) AS top_word_frac,
       ROUND(max_big / n_big, 6) AS top_bigram_frac
FROM us JOIN bs ON us.doc_id = bs.doc_id
""",
)
def q_quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals: duplicate-word fraction, top-word
    fraction, top-bigram fraction.  Bigrams built JVM-side by zipping the
    token array with itself shifted by one (`slice`+`zip_with`) — no window
    sort, one shuffle per aggregation."""
    d = _docs(spark, sf_dir)
    ws = F.split(F.col("text"), " ")
    n = F.size(ws)
    bigrams = F.zip_with(
        F.slice(ws, F.lit(1), n - 1),
        F.slice(ws, F.lit(2), n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    toks = d.select("doc_id", F.explode(ws).alias("word"))
    uni = toks.groupBy("doc_id", "word").agg(F.count("*").alias("c"))
    us = uni.groupBy("doc_id").agg(
        F.sum("c").cast("double").alias("n_tok"),
        F.count("*").alias("n_distinct"),
        F.max("c").alias("max_uni"),
    )
    bg = (
        d.select("doc_id", F.explode(bigrams).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count("*").alias("c"))
    )
    bs = bg.groupBy("doc_id").agg(
        F.max("c").alias("max_big"), F.sum("c").cast("double").alias("n_big")
    )
    return us.join(bs, "doc_id").select(
        "doc_id",
        F.round(1 - F.col("n_distinct") / F.col("n_tok"), 6).alias("dup_word_frac"),
        F.round(F.col("max_uni") / F.col("n_tok"), 6).alias("top_word_frac"),
        F.round(F.col("max_big") / F.col("n_big"), 6).alias("top_bigram_frac"),
    )


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
_PHONE_RE = r"[0-9]{3}-[0-9]+"


@query(
    "pii_redact",
    oracle=f"""
WITH bodies AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com tel 555-0' || CAST(doc_id AS VARCHAR) AS body
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(body, '{_EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(body, '{_PHONE_RE}')) AS n_phones,
       right(regexp_replace(regexp_replace(body, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                            '{_PHONE_RE}', '<PHONE>', 'g'), 60) AS redacted_tail
FROM bodies
""",
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: mask emails/phones with typed placeholders and count
    redactions.  The fixture corpus contains no PII, so a deterministic
    synthetic contact line (derived from doc_id) is appended first — the
    redaction regexes then have real work to do on every row."""
    d = _docs(spark, sf_dir)
    body = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com tel 555-0"),
        F.col("doc_id").cast("string"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(body, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return d.select(
        "doc_id",
        F.regexp_count(body, F.lit(_EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count(body, F.lit(_PHONE_RE)).cast("bigint").alias("n_phones"),
        F.substring(redacted, -60, 60).alias("redacted_tail"),
    )


@query(
    "stratified_sample",
    oracle="""
SELECT lang,
       COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '28'
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       ROUND(CAST(SUM(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '28'
                           THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS sample_rate
FROM documents
GROUP BY lang
""",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash sampling, audited per stratum: keep a doc iff the
    first md5(doc_id) byte < 0x28 (≈15.6%).  Content-hash gating (vs
    `rand()`) makes the sample reproducible across runs, engines, and
    cluster sizes — the property a training-data pipeline needs for
    ablation reruns.  Pure map-side filter + one aggregation."""
    d = _docs(spark, sf_dir)
    keep = (F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "28").cast("int")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_total"),
        F.sum(keep).alias("n_sampled"),
        F.round(F.sum(keep).cast("double") / F.count("*"), 6).alias("sample_rate"),
    )


@query(
    "tfidf_top_terms",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS c FROM toks GROUP BY 1, 2),
d AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
n AS (SELECT COUNT(*) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         ROUND(tf.c * ln(CAST(n.n AS DOUBLE) / d.df), 6) AS tfidf
  FROM tf JOIN d USING (term), n
)
SELECT doc_id, term, CAST(rank AS INT) AS rank, tfidf FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
  FROM scored)
WHERE rank <= 3
""",
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword extraction: top-3 terms per document by tf·idf
    (idf = ln(N/df)), ties broken by term.  The document-frequency side is
    a small aggregate — Catalyst broadcast-joins it back to the term counts
    (AQE picks broadcast from the runtime size)."""
    d = _docs(spark, sf_dir)
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("c"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    ndocs = d.agg(F.count("*").alias("n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(ndocs))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("c") * F.log(F.col("n").cast("double") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    return grouped_topk(
        scored, ["doc_id"], [F.desc("tfidf"), F.asc("term")], 3, rank_col="rank"
    ).select("doc_id", "term", F.col("rank").cast("int").alias("rank"), "tfidf")


@query(
    "shard_assignment",
    oracle="""
SELECT CAST(strpos('0123456789abcdef',
                   substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS INT) AS shard_id,
       COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
FROM documents
GROUP BY 1
""",
)
def q_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-set shard writer stats: route each doc to one of 16 shards
    by the first md5(doc_id) nibble and audit shard balance (doc and token
    counts).  Content-hash routing is stable under repartition/rerun — the
    write itself would be `df.repartition('shard_id').write.partitionBy`."""
    d = _docs(spark, sf_dir)
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1), 16, 10)
        .cast("int")
        .alias("shard_id")
    )
    return d.groupBy(shard).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_tokens"),
    )


@query(
    "decontamination_check",
    oracle="""
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, len(string_split(text, ' '))),
           i -> array_to_string(list_slice(string_split(text, ' '), i, i + 1), ' ')
         )) AS shingles
  FROM documents WHERE len(string_split(text, ' ')) >= 2
),
b AS (SELECT doc_id AS bench_id, shingles FROM sh WHERE doc_id < 5),
c AS (SELECT doc_id, shingles FROM sh WHERE doc_id >= 5),
pairs AS (
  SELECT b.bench_id, c.doc_id,
         len(list_intersect(c.shingles, b.shingles)) AS inter,
         len(b.shingles) AS n_sh
  FROM c CROSS JOIN b
)
SELECT bench_id, doc_id, CAST(rank AS INT) AS rank, containment FROM (
  SELECT bench_id, doc_id,
         ROUND(inter / CAST(n_sh AS DOUBLE), 6) AS containment,
         row_number() OVER (PARTITION BY bench_id
                            ORDER BY ROUND(inter / CAST(n_sh AS DOUBLE), 6) DESC,
                                     doc_id) AS rank
  FROM pairs WHERE inter > 0)
WHERE rank <= 5
""",
)
def q_decontamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-leakage check: docs 0-4 stand in for a benchmark set; report
    the top-5 corpus docs per benchmark doc by bigram containment."""
    from crawling_vectordb_llm_spark.operators.dedup import contamination_report

    d = _docs(spark, sf_dir)
    bench = d.where(F.col("doc_id") < 5)
    corpus = d.where(F.col("doc_id") >= 5)
    return contamination_report(corpus, bench, n=2, k=5).select(
        "bench_id", "doc_id", F.col("rank").cast("int").alias("rank"), "containment"
    )


@query(
    "bloom_decontamination",
    oracle="""
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, len(string_split(text, ' '))),
           i -> array_to_string(list_slice(string_split(text, ' '), i, i + 1), ' ')
         )) AS shingles
  FROM documents WHERE len(string_split(text, ' ')) >= 2
),
b AS (SELECT list_distinct(flatten(list(shingles))) AS bs FROM sh WHERE doc_id < 5),
c AS (SELECT doc_id, shingles FROM sh WHERE doc_id >= 5)
SELECT c.doc_id, CAST(len(list_intersect(c.shingles, b.bs)) AS INT) AS n_shared
FROM c CROSS JOIN b
WHERE len(list_intersect(c.shingles, b.bs)) > 0
""",
)
def q_bloom_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered decontamination: benchmark (docs 0-4) bigrams go
    into a 128 KB Bloom bitset; the corpus's exploded bigrams are probed
    map-only and ONLY bloom survivors reach the exact-verify join, whose
    output (distinct shared bigrams per doc) the oracle checks exactly —
    the Bloom stage can only shed non-members, so the final result is
    byte-identical to the join-everything plan while the join input is a
    small fraction of the corpus at scale."""
    from crawling_vectordb_llm_spark.operators.dedup import (
        bloom_build,
        bloom_might_contain,
        word_shingles,
    )

    d = _docs(spark, sf_dir)
    sh = d.select("doc_id", F.explode(word_shingles("text", 2)).alias("sh"))
    bench_sh = sh.where(F.col("doc_id") < 5).select("sh").distinct()
    corpus_sh = sh.where(F.col("doc_id") >= 5)
    bits = bloom_build(bench_sh, "sh")
    survivors = bloom_might_contain(corpus_sh, "sh", bits)
    verified = survivors.join(F.broadcast(bench_sh), "sh")
    return verified.groupBy("doc_id").agg(
        F.count_distinct("sh").cast("int").alias("n_shared")
    )


@query(
    "sequence_packing",
    oracle="""
WITH t AS (
  SELECT doc_id,
         CAST(strpos('0123456789abcdef',
                     substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS INT) AS shard_id,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
)
SELECT doc_id, shard_id, n_tokens,
       CAST(SUM(n_tokens) OVER w - n_tokens AS BIGINT) AS start_off,
       CAST(floor((SUM(n_tokens) OVER w - n_tokens) / 2048) AS BIGINT) AS pack_bin
FROM t
WINDOW w AS (PARTITION BY shard_id ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous sequence packing for training: docs are routed to 16
    content-hash shards, concatenated in deterministic (doc_id) order, and
    chunked into 2048-token context bins; each doc reports its shard,
    starting token offset, and the bin its first token lands in.

    Scale shape: the only shuffle is the hash-partition by shard; the
    running sum is a per-shard window, so parallelism = number of shards
    (in production: thousands of shards, each window partition fitting one
    executor core) — never a global single-partition cumsum."""
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    t = d.select(
        "doc_id",
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1), 16, 10)
        .cast("int")
        .alias("shard_id"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard_id")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return t.select(
        "doc_id",
        "shard_id",
        "n_tokens",
        start.cast("bigint").alias("start_off"),
        F.floor(start / 2048).cast("bigint").alias("pack_bin"),
    )


@query(
    "table_profile",
    oracle="""
SELECT 'o_totalprice' AS col,
       COUNT(*) AS n_rows,
       COUNT(o_totalprice) AS n_nonnull,
       COUNT(DISTINCT o_totalprice) AS n_distinct,
       ROUND(MIN(o_totalprice), 6) AS min_v,
       ROUND(MAX(o_totalprice), 6) AS max_v
FROM orders
UNION ALL
SELECT 'o_custkey',
       COUNT(*), COUNT(o_custkey), COUNT(DISTINCT o_custkey),
       ROUND(CAST(MIN(o_custkey) AS DOUBLE), 6),
       ROUND(CAST(MAX(o_custkey) AS DOUBLE), 6)
FROM orders
""",
)
def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time column profiling (rows, nulls, distinct, min/max) — the
    stats a catalog records at write time to drive pruning and join sizing.
    One pass per profiled column set, map-side partial aggs; at 100 TB the
    exact distinct becomes approx_count_distinct (the rows-only
    approx_distinct query covers that variant)."""
    o = spark.read.parquet(table_path(sf_dir, "orders"))

    def profile(col: str) -> DataFrame:
        return o.agg(
            F.lit(col).alias("col"),
            F.count(F.lit(1)).alias("n_rows"),
            F.count(col).alias("n_nonnull"),
            F.countDistinct(col).alias("n_distinct"),
            F.round(F.min(col).cast("double"), 6).alias("min_v"),
            F.round(F.max(col).cast("double"), 6).alias("max_v"),
        )

    return profile("o_totalprice").unionByName(profile("o_custkey"))


@query(
    "curation_pipeline",
    oracle=f"""
WITH q AS (
  SELECT doc_id, lang, text,
         ROUND(0.4 * LEAST(length(text) / 500.0, 1.0)
             + 0.4 * ROUND(len(list_filter(string_split(text, ' '), t -> t IN {_STOP_SQL}))
                           / GREATEST(len(string_split(text, ' ')), 1), 6)
             + 0.2 * (1 - ROUND(len(regexp_extract_all(text, '[0-9]'))
                                / GREATEST(length(text), 1), 6)), 6) AS quality
  FROM documents
), b AS (
  SELECT lang, quantile_cont(quality, 0.1) AS lo FROM q GROUP BY lang
), gated AS (
  SELECT q.* FROM q JOIN b ON q.lang = b.lang WHERE q.quality >= b.lo
), canon AS (
  SELECT MIN(doc_id) AS doc_id FROM gated GROUP BY md5(text)
), kept AS (
  SELECT g.doc_id, g.lang,
         len(string_split(g.text, ' ')) AS n_tokens,
         CAST(strpos('0123456789abcdef',
                     substr(md5(CAST(g.doc_id AS VARCHAR)), 1, 1)) - 1 AS INT) AS shard_id
  FROM gated g JOIN canon c ON g.doc_id = c.doc_id
)
, packed AS (
  SELECT shard_id, n_tokens,
         CAST(floor(
             (SUM(n_tokens) OVER (PARTITION BY shard_id ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
             / 2048) AS BIGINT) AS pack_bin
  FROM kept
)
SELECT shard_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(COUNT(DISTINCT pack_bin) AS BIGINT) AS n_bins
FROM packed
GROUP BY shard_id
""",
)
def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation flagship: quality gate (drop the sub-p10 tail
    per language) → exact dedup (canonical = min doc_id per content hash)
    → token count → content-hash shard routing → 2048-token sequence
    packing, reported as per-shard (docs, tokens, bins).

    Every stage is the suite's standalone operator composed declaratively.
    Verified plan shape (.explain): the per-lang bounds aggregate is tiny
    and broadcasts back; dedup is one (md5, doc_id)-projection shuffle
    with the canonical-id set joined back adaptively (broadcast at fixture
    scale, sort-merge when the kept set outgrows it); the packing window
    and the final per-shard aggregate SHARE one shard_id exchange.  Full
    document rows are never shuffled — only hashes, ids, and token
    counts."""
    from pyspark.sql import Window

    from crawling_vectordb_llm_spark.functions import text as X

    d = _docs(spark, sf_dir)
    # r13 (guide §8 "decide with small rows"): every downstream decision
    # needs only (doc_id, lang, content hash, token count, quality) — a
    # few dozen bytes/doc.  Extract them in ONE text pass and checkpoint
    # the narrow proxy; the old shape recomputed quality_score and
    # re-scanned the text THREE times (the percentile pass, the canon
    # pass, and the slim pass each re-evaluated the q/gated subtree).
    # Values are expression-identical — only the evaluation count drops.
    narrow = d.select(
        "doc_id",
        "lang",
        F.md5("text").alias("h"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        X.quality_score("text").alias("quality"),
    ).localCheckpoint()
    b = narrow.groupBy("lang").agg(F.expr("percentile(quality, 0.1)").alias("lo"))
    gated = narrow.join(F.broadcast(b), "lang").where(
        F.col("quality") >= F.col("lo")
    )
    canon = gated.groupBy("h").agg(F.min("doc_id").alias("doc_id")).select(
        "doc_id"
    )
    slim = gated.select(
        "doc_id",
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1), 16, 10)
        .cast("int")
        .alias("shard_id"),
        "n_tokens",
    )
    kept = slim.join(canon, "doc_id")
    w = (
        Window.partitionBy("shard_id")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = kept.withColumn(
        "pack_bin",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / 2048).cast(
            "bigint"
        ),
    )
    return packed.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.countDistinct("pack_bin").cast("bigint").alias("n_bins"),
    )


@query(
    "bin_render_hash",
    oracle="""
WITH t AS (
  SELECT doc_id, text,
         CAST(strpos('0123456789abcdef',
                     substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS INT) AS shard_id,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
), packed AS (
  SELECT doc_id, text, shard_id,
         CAST(floor((SUM(n_tokens) OVER w - n_tokens) / 2048) AS BIGINT) AS pack_bin
  FROM t
  WINDOW w AS (PARTITION BY shard_id ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT shard_id, pack_bin,
       COUNT(*) AS n_docs,
       md5(string_agg(text, '<|doc|>' ORDER BY doc_id)) AS blob_md5
FROM packed GROUP BY shard_id, pack_bin
""",
)
def q_bin_render_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the packed training bins: docs of each (shard, bin)
    joined in doc_id order with a separator token — the blob a shard
    writer emits.  Output carries the blob's md5 instead of the blob
    (cheap compare, same guarantee: one byte off anywhere flips the hash).
    Ordered group concat uses the sort-inside-collect_list struct pattern
    (SURVEY §7 hard part (a)) — order comes from array_sort, never from
    shuffle arrival order."""
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    t = d.select(
        "doc_id",
        "text",
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1), 16, 10)
        .cast("int")
        .alias("shard_id"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard_id")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = t.withColumn(
        "pack_bin",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / 2048).cast(
            "bigint"
        ),
    )
    grouped = packed.groupBy("shard_id", "pack_bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.array_sort(
            F.collect_list(F.struct("doc_id", "text"))
        ).alias("docs"),
    )
    blob = F.array_join(F.transform("docs", lambda s: s["text"]), "<|doc|>")
    return grouped.select(
        "shard_id", "pack_bin", "n_docs", F.md5(blob).alias("blob_md5")
    )


@query(
    "dsir_importance_weights",
    oracle="""
WITH toks AS (
  SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
), grams AS (
  SELECT doc_id, source,
         unnest(list_transform(range(1, len(w)),
                               i -> array_to_string(list_slice(w, i, i + 1), ' '))) AS g
  FROM toks WHERE len(w) >= 2
), feats AS (
  SELECT doc_id, (source IN ('src0', 'src1')) AS is_t,
         (strpos('0123456789abcdef', substr(md5(g), 1, 1)) - 1) * 256
       + (strpos('0123456789abcdef', substr(md5(g), 2, 1)) - 1) * 16
       + (strpos('0123456789abcdef', substr(md5(g), 3, 1)) - 1) AS bucket
  FROM grams
), model AS (
  SELECT bucket, COUNT(*) AS c_raw,
         SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS c_tgt
  FROM feats GROUP BY bucket
), tot AS (
  SELECT CAST(SUM(c_raw) + 4096 AS DOUBLE) AS t_raw,
         CAST(SUM(c_tgt) + 4096 AS DOUBLE) AS t_tgt
  FROM model
), scored AS (
  SELECT f.doc_id,
         CAST(ROUND(ln((m.c_tgt + 1) / t.t_tgt) - ln((m.c_raw + 1) / t.t_raw), 4)
              AS DECIMAL(22,4)) AS lr
  FROM feats f JOIN model m USING (bucket) CROSS JOIN tot t
)
SELECT doc_id, COUNT(*) AS n_feats,
       CAST(SUM(lr) AS DOUBLE) AS logratio
FROM scored GROUP BY doc_id
""",
)
def q_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (operators/importance.py): hashed-bigram bag
    models for a target slice (sources src0/src1 stand in for the curated
    domain) vs the raw corpus; every doc scored by its mean per-feature
    log-likelihood ratio.  The two models are one 4096-row aggregation
    each, broadcast back — the corpus shuffles once (final per-doc mean),
    which is what lets the selection stage run ahead of embedding at
    100 TB (the budget the reference's per-doc upsert loop burns,
    TencentVDB.py:74-79)."""
    from crawling_vectordb_llm_spark.operators.importance import dsir_importance

    d = _docs(spark, sf_dir)
    return dsir_importance(d, F.col("source").isin("src0", "src1"))


@query(
    "ngram_lm_decontamination",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w)),
                               i -> {'h': w[i], 't': w[i + 1]})) AS g
  FROM toks WHERE len(w) >= 2
), big AS (
  SELECT doc_id, g.h AS head, g.t AS tail FROM grams
), bigc_b AS (
  SELECT head, tail, COUNT(*) AS c2 FROM big WHERE doc_id < 5
  GROUP BY head, tail
), unic_b AS (
  SELECT head, SUM(c2) AS c1 FROM bigc_b GROUP BY head
), scored AS (
  SELECT b.doc_id,
         CAST(ROUND(ln(bc.c2 / CAST(u.c1 AS DOUBLE)), 6) AS DECIMAL(22,6))
           AS lp
  FROM big b
  JOIN bigc_b bc ON bc.head = b.head AND bc.tail = b.tail
  JOIN unic_b u ON u.head = b.head
  WHERE b.doc_id >= 5
), totals AS (
  SELECT doc_id, COUNT(*) AS n_bigrams FROM big WHERE doc_id >= 5
  GROUP BY doc_id
)
SELECT t.doc_id, t.n_bigrams,
       CAST(COUNT(s.lp) AS BIGINT) AS n_known,
       ROUND(COUNT(s.lp) / CAST(t.n_bigrams AS DOUBLE), 6) AS known_frac,
       ROUND(CAST(SUM(s.lp) AS DOUBLE), 6) AS sum_lp_known
FROM totals t JOIN scored s USING (doc_id)
GROUP BY t.doc_id, t.n_bigrams
""",
)
def q_ngram_lm_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram-LM decontamination — the LM rung above the set-overlap
    ladder (bloom_decontamination counts shared bigrams; this weighs
    them): train a maximum-likelihood bigram LM on the benchmark set
    (docs 0-4) and score every corpus doc by how much of it the
    benchmark LM has SEEN (known_frac) and the total benchmark-LM
    log-likelihood of the seen bigrams (sum_lp_known — a decimal sum, so
    the oracle compare is exact; a mean would re-divide and land on
    half-way rounding edges).  A doc quoting benchmark text verbatim
    shows both high coverage and high likelihood — rarer-bigram matches
    weigh heavier than stopword collisions, the signal plain set
    intersection misses.

    Scale shape: the benchmark LM tables are tiny by construction (the
    held-out set) and broadcast; the corpus bigram stream is map-only
    until the single per-doc aggregation shuffle."""
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
    bench = big.where(F.col("doc_id") < 5)
    corpus = big.where(F.col("doc_id") >= 5)
    bigc_b = bench.groupBy("head", "tail").agg(F.count(F.lit(1)).alias("c2"))
    bigc_b = bigc_b.localCheckpoint()
    unic_b = bigc_b.groupBy("head").agg(F.sum("c2").alias("c1"))
    scored = (
        corpus.join(F.broadcast(bigc_b), ["head", "tail"])
        .join(F.broadcast(unic_b), "head")
        .select(
            "doc_id",
            F.round(F.log(F.col("c2") / F.col("c1").cast("double")), 6)
            .cast("decimal(22,6)")
            .alias("lp"),
        )
    )
    totals = corpus.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_bigrams"))
    agg = scored.groupBy("doc_id").agg(
        F.count("lp").cast("bigint").alias("n_known"),
        # decimal-exact sum, rendered as double (identical in both engines
        # since the decimal value is exact at 6 dp)
        F.round(F.sum("lp").cast("double"), 6).alias("sum_lp_known"),
    )
    return totals.join(agg, "doc_id").select(
        "doc_id",
        "n_bigrams",
        "n_known",
        F.round(F.col("n_known") / F.col("n_bigrams").cast("double"), 6).alias(
            "known_frac"
        ),
        "sum_lp_known",
    )


def _bpe_fixture_merges() -> list[tuple[str, str]]:
    """The frozen merge table (VERDICT r2 #4): trained once with
    operators/bpe.train_bpe (n_merges=200, which converged after 105 —
    pair counts dropped below 2) on the sf0.001 documents corpus, then
    checked in as a fixture.  A frozen vocabulary is the DEPLOYED shape
    of a tokenizer — training stays covered by tests/test_bpe.py."""
    import json
    import os

    p = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "fixtures",
        "bpe_merges_v1.json",
    )
    with open(p) as fh:
        return [tuple(m) for m in json.load(fh)]


def _bpe_oracle_sql() -> str:
    """DuckDB oracle for the BPE APPLY stage: each word becomes a
    delimiter-wrapped symbol string (\\x1e sym \\x1f per symbol — the
    wrappers make replace() boundary-exact), and a recursive CTE applies
    the fixture merges IN RANK ORDER, one literal replace per step.
    Rank-order exhaustive application is equivalent to the GPT-2
    lowest-rank-first loop (a merge's components always predate it, so a
    new adjacency can only enable LATER merges) — the equivalence is
    pinned per-word in tests/test_bpe.py.  Token count = surviving
    wrapper count."""
    merges = _bpe_fixture_merges()

    def lit(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    values = ",\n    ".join(
        f"({i + 1}, "
        f"chr(30)||{lit(a)}||chr(31)||chr(30)||{lit(b)}||chr(31), "
        f"chr(30)||{lit(a + b)}||chr(31))"
        for i, (a, b) in enumerate(merges)
    )
    return f"""
WITH RECURSIVE merges(rank, pat, rep) AS (
  VALUES
    {values}
), words AS (
  SELECT doc_id, unnest(ws) AS word
  FROM (
    SELECT doc_id,
           CASE WHEN regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g') = ''
                THEN CAST([] AS VARCHAR[])
                ELSE string_split_regex(
                       regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g'),
                       '\\s+')
           END AS ws
    FROM documents
  ) d
), wrapped AS (
  SELECT doc_id,
         list_aggregate(
           list_transform(string_split(word, ''), c -> chr(30)||c||chr(31)),
           'string_agg', '')
         || chr(30)||'</w>'||chr(31) AS s
  FROM words
), rec(iter, doc_id, s) AS (
  SELECT 0, doc_id, s FROM wrapped
  UNION ALL
  SELECT rec.iter + 1, rec.doc_id, replace(rec.s, m.pat, m.rep)
  FROM rec JOIN merges m ON m.rank = rec.iter + 1
), counted AS (
  SELECT doc_id,
         SUM(len(s) - len(replace(s, chr(30), ''))) AS n_bpe
  FROM rec WHERE iter = (SELECT COUNT(*) FROM merges)
  GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(c.n_bpe, 0) AS BIGINT) AS n_bpe_tokens,
       CAST(len(string_split_regex(trim(d.text), '\\s+')) AS BIGINT) AS n_words
FROM documents d LEFT JOIN counted c ON c.doc_id = d.doc_id
"""


@query("bpe_token_count", oracle=_bpe_oracle_sql())
def q_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenization, now oracle-gated on the APPLY stage (VERDICT r2
    #4): the checked-in fixture merge table (see _bpe_fixture_merges; the
    deployed-tokenizer shape) is broadcast and applied corpus-wide in the
    iterator pandas_udf — ranks and the word memo built once per executor
    — and per-doc BPE vs whitespace token counts come out.  The oracle
    replays the greedy merges in DuckDB via a recursive CTE (rank-order
    replace on wrapped symbol strings), so the distributed apply is
    value-checked, not just property-checked.  Training (driver-side,
    bounded sample — the codebook-trainer contract) remains covered by
    tests/test_bpe.py determinism/reversibility/distributed==local."""
    from crawling_vectordb_llm_spark.operators.bpe import bpe_tokenize

    d = _docs(spark, sf_dir)
    toks = bpe_tokenize(d, _bpe_fixture_merges())
    return toks.select(
        "doc_id",
        F.size("bpe_tokens").cast("bigint").alias("n_bpe_tokens"),
        F.size(F.split(F.trim("text"), r"\s+")).cast("bigint").alias("n_words"),
    )


@query(
    "hash_split_train_val",
    oracle="""
SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'train'
            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'f3' THEN 'val'
            ELSE 'test' END AS split,
       lang,
       COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
FROM documents
GROUP BY split, lang
""",
)
def q_hash_split_train_val(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split by md5(doc_id) range
    (~90/5/5) with a per-(split, lang) audit.  Content-hash routing —
    not rand() — so the split is identical across reruns, engines, and
    cluster sizes, and a doc never migrates between splits when the
    corpus grows (the property that prevents train->test leakage across
    dataset versions).  Map-side expression + one aggregation; at 100 TB
    the write is `df.write.partitionBy('split')` with this same column."""
    d = _docs(spark, sf_dir)
    h2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(h2 < "e6", "train").when(h2 < "f3", "val").otherwise("test")
    )
    return d.groupBy(split.alias("split"), "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_tokens"),
    )


@query(
    "temperature_mixture_weights",
    oracle="""
WITH dom AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
), tot AS (
  SELECT CAST(SUM(n_docs) AS DOUBLE) AS n,
         CAST(SUM(CAST(pow(CAST(n_docs AS DOUBLE), 0.7) AS DECIMAL(38,18)))
              AS DOUBLE) AS z
  FROM dom
)
SELECT d.source, d.n_docs,
       ROUND(d.n_docs / t.n, 6) AS p_natural,
       ROUND(pow(CAST(d.n_docs AS DOUBLE), 0.7) / t.z, 6) AS p_mixture,
       ROUND((pow(CAST(d.n_docs AS DOUBLE), 0.7) / t.z)
             / (d.n_docs / t.n), 6) AS oversample_factor
FROM dom d CROSS JOIN tot t
""",
)
def q_temperature_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain mixing (the multilingual-/domain-
    sampling rule p_i^alpha / sum p_j^alpha, alpha=0.7): per source
    domain, the natural share, the flattened mixture share, and the
    oversample factor a data loader would apply.  Since p_i^a/sum(p_j^a)
    == n_i^a/sum(n_j^a), the weights are computed from raw counts —
    one tiny aggregate + a broadcast scalar join, any corpus size."""
    d = _docs(spark, sf_dir)
    dom = d.groupBy("source").agg(F.count("*").alias("n_docs"))
    nd = F.col("n_docs").cast("double")
    tot = dom.agg(
        F.sum("n_docs").cast("double").alias("n"),
        # decimal-cast before summing: a float SUM's value depends on
        # partial-aggregation order (the ADVICE-r2 Rocchio class of
        # flakiness); per-row double->decimal(38,18) rounding is
        # order-free and identical in both engines
        F.sum(F.pow(nd, 0.7).cast("decimal(38,18)")).cast("double").alias("z"),
    )
    p_nat = F.col("n_docs") / F.col("n")
    p_mix = F.pow(nd, 0.7) / F.col("z")
    return dom.join(F.broadcast(tot)).select(
        "source",
        "n_docs",
        F.round(p_nat, 6).alias("p_natural"),
        F.round(p_mix, 6).alias("p_mixture"),
        F.round(p_mix / p_nat, 6).alias("oversample_factor"),
    )


@query(
    "priority_sample_topk",
    oracle="""
WITH pri AS (
  SELECT doc_id, n_chars,
         CAST(n_chars AS DOUBLE)
           / ((CAST(CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE) + 1)
              / 4294967296.0) AS priority
  FROM documents
)
SELECT doc_id, n_chars, ROUND(priority, 6) AS priority
FROM pri ORDER BY priority DESC, doc_id LIMIT 100
""",
)
def q_priority_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority sampling (Duffield-Thorup): weight-proportional sampling
    without replacement as a deterministic global top-k on priority
    q_i = w_i / u_i, with u_i an md5-derived dyadic rational in (0, 1] —
    so u_i is EXACT in both engines and the double division is bit-
    identical (no libm in the hot path, unlike exp/pow-keyed A-ES).
    Weight = n_chars.  Map-side expression + TakeOrderedAndProject:
    per-partition top-100 then a driver merge — no global sort, the only
    sampling-without-replacement scheme that runs in one pass at 100 TB."""
    d = _docs(spark, sf_dir)
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        + 1.0
    ) / F.lit(4294967296.0)
    pri = (F.col("n_chars").cast("double") / u).alias("priority")
    return (
        d.select("doc_id", "n_chars", pri)
        .orderBy(F.desc("priority"), F.asc("doc_id"))
        .limit(100)
        .select("doc_id", "n_chars", F.round("priority", 6).alias("priority"))
    )


@query(
    "stratified_quota_sample",
    oracle="""
SELECT doc_id, lang, CAST(rank AS INT) AS rank FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS rank
  FROM documents)
WHERE rank <= 40
""",
)
def q_stratified_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class balancing with EXACT per-stratum quotas: keep exactly
    min(40, n) docs per lang, chosen by md5(doc_id) order — a
    deterministic uniform draw (hash order is independent of content),
    unlike rate-based sampling whose per-stratum counts fluctuate.
    WindowGroupLimit pushes rank<=40 below the per-group sort, so state
    per stratum is 40 rows regardless of stratum size — the
    quota-sampling shape that survives a billion-doc majority class."""
    from crawling_vectordb_llm_spark.operators.topk import grouped_topk

    d = _docs(spark, sf_dir)
    picked = grouped_topk(
        d.select("doc_id", "lang"),
        ["lang"],
        [F.asc(F.md5(F.col("doc_id").cast("string"))), F.asc("doc_id")],
        40,
        rank_col="rank",
    )
    return picked.select("doc_id", "lang", F.col("rank").cast("int").alias("rank"))


@query(
    "dedup_keep_best",
    oracle="""
SELECT doc_id, lang, n_chars FROM (
  SELECT doc_id, lang, n_chars,
         row_number() OVER (PARTITION BY md5(text)
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents)
WHERE rn = 1
""",
)
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalization: within each exact-duplicate group keep the BEST
    copy (longest, ties by id) rather than an arbitrary one — the
    survivor-selection step that runs after any dedup ladder (exact here;
    the same max_by shape applies to MinHash/CC cluster ids).  One
    shuffle on the content hash; max_by is an ordinary partial-aggregable
    aggregate, so the map side already reduces each group to one row —
    cheaper than the row_number window at skewed 100 TB group sizes."""
    d = _docs(spark, sf_dir)
    best = (
        d.groupBy(F.md5("text").alias("h"))
        .agg(
            F.max(
                F.struct(
                    F.col("n_chars"),
                    (-F.col("doc_id")).alias("neg_id"),
                    F.col("doc_id"),
                    F.col("lang"),
                )
            ).alias("b")
        )
        .select(
            F.col("b.doc_id").alias("doc_id"),
            F.col("b.lang").alias("lang"),
            F.col("b.n_chars").alias("n_chars"),
        )
    )
    return best


@query(
    "budget_water_fill",
    oracle="""
WITH cap AS (
  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) AS tokens
  FROM documents GROUP BY source
), tot AS (SELECT SUM(tokens) * 0.9 AS budget FROM cap),
ordered AS (
  SELECT source, tokens,
         SUM(tokens) OVER (ORDER BY tokens, source
                           ROWS UNBOUNDED PRECEDING) AS prefix,
         row_number() OVER (ORDER BY tokens, source) AS rn,
         COUNT(*) OVER () AS k
  FROM cap
), lv AS (
  SELECT o.*, t.budget,
         (t.budget - (o.prefix - o.tokens)) / (o.k - o.rn + 1)
           AS level_if_cut_here
  FROM ordered o, tot t
), cut AS (
  SELECT MIN(rn) AS cut_rn FROM lv WHERE tokens > level_if_cut_here
)
SELECT l.source, CAST(l.tokens AS BIGINT) AS capacity,
       ROUND(CASE WHEN c.cut_rn IS NULL OR l.rn < c.cut_rn THEN l.tokens
                  ELSE (SELECT level_if_cut_here FROM lv
                        WHERE rn = c.cut_rn) END, 6) AS alloc,
       (c.cut_rn IS NOT NULL AND l.rn >= c.cut_rn) AS capped
FROM lv l, cut c
""",
)
def q_budget_water_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Water-filling token-budget allocation — the data-mixture primitive
    behind "give every domain as much as possible, capped by a global
    budget": sources below the water level keep their full capacity,
    larger sources are clipped to a common level chosen so allocations
    sum exactly to the budget.  The classic iterative algorithm becomes
    ONE window pass: sort sources by capacity, prefix-sum, compute each
    prefix's would-be level, and the cut is the first row whose capacity
    exceeds its level — O(k log k) on k SOURCES (a tiny relation at any
    corpus scale; the only big-data touch is the per-source token
    aggregate).  Since r5 the total order is realized WITHOUT a global
    window (VERDICT r4 #8): the per-source table aggregates into ONE
    sorted array (+ the budget, same pass), posexplode restores rows
    with rn = pos + 1, and each row's prefix is a sequential left fold
    over its array prefix — the identical ascending-order IEEE addition
    sequence as the oracle's ROWS UNBOUNDED PRECEDING running sum, so
    the level arithmetic stays engine-identical."""
    d = _docs(spark, sf_dir)
    cap = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("double").alias("tokens")
    )
    arr = cap.agg(
        F.sort_array(F.collect_list(F.struct("tokens", "source"))).alias("a"),
        (F.sum("tokens") * 0.9).alias("budget"),
    )
    ordered = arr.select(
        "a",
        "budget",
        F.size("a").alias("k"),
        F.posexplode("a").alias("pos", "r"),
    ).select(
        F.col("r.source").alias("source"),
        F.col("r.tokens").alias("tokens"),
        F.aggregate(
            F.slice("a", 1, F.col("pos") + 1),
            F.lit(0.0),
            lambda acc, x: acc + x["tokens"],
        ).alias("prefix"),
        (F.col("pos") + 1).alias("rn"),
        "k",
        "budget",
    )
    lv = ordered.withColumn(
        "level_if_cut_here",
        (F.col("budget") - (F.col("prefix") - F.col("tokens")))
        / (F.col("k") - F.col("rn") + 1),
    )
    cut = lv.where(F.col("tokens") > F.col("level_if_cut_here")).agg(
        F.min("rn").alias("cut_rn")
    )
    cut_level = (
        lv.join(F.broadcast(cut), F.col("rn") == F.col("cut_rn"))
        .select(F.col("level_if_cut_here").alias("cut_level"))
    )
    return (
        lv.crossJoin(F.broadcast(cut))
        .crossJoin(
            F.broadcast(
                cut_level.unionByName(
                    # budget >= total capacity -> no cut row; keep the
                    # cross join non-empty with a null level
                    lv.sparkSession.range(1).select(
                        F.lit(None).cast("double").alias("cut_level")
                    )
                ).agg(F.min("cut_level").alias("cut_level"))
            )
        )
        .select(
            "source",
            F.col("tokens").cast("bigint").alias("capacity"),
            F.round(
                F.when(
                    F.col("cut_rn").isNull() | (F.col("rn") < F.col("cut_rn")),
                    F.col("tokens"),
                ).otherwise(F.col("cut_level")),
                6,
            ).alias("alloc"),
            (
                F.col("cut_rn").isNotNull() & (F.col("rn") >= F.col("cut_rn"))
            ).alias("capped"),
        )
    )


@query(
    "curation_attrition_funnel",
    oracle=f"""
WITH q AS (
  SELECT doc_id, lang, n_chars,
         ROUND(0.4 * LEAST(length(text) / 500.0, 1.0)
             + 0.4 * ROUND(len(list_filter(string_split(text, ' '), t -> t IN {_STOP_SQL}))
                           / GREATEST(len(string_split(text, ' ')), 1), 6)
             + 0.2 * (1 - ROUND(len(regexp_extract_all(text, '[0-9]'))
                                / GREATEST(length(text), 1), 6)), 6) AS quality,
         md5(text) AS h
  FROM documents
), b AS (
  SELECT lang, quantile_cont(quality, 0.25) AS lo FROM q GROUP BY lang
), f AS (
  SELECT q.doc_id, q.lang, q.h,
         (q.n_chars >= 150) AS p1,
         (q.n_chars >= 150 AND q.quality >= b.lo) AS p2
  FROM q JOIN b ON q.lang = b.lang
), r AS (
  SELECT *, row_number() OVER (
      PARTITION BY h ORDER BY CASE WHEN p2 THEN 0 ELSE 1 END, doc_id) AS rn
  FROM f
), flags AS (
  SELECT p1, p2, (p2 AND rn = 1) AS p3,
         (p2 AND rn = 1 AND lang <> 'zh') AS p4
  FROM r
), c AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS s0,
         CAST(SUM(CASE WHEN p1 THEN 1 ELSE 0 END) AS BIGINT) AS s1,
         CAST(SUM(CASE WHEN p2 THEN 1 ELSE 0 END) AS BIGINT) AS s2,
         CAST(SUM(CASE WHEN p3 THEN 1 ELSE 0 END) AS BIGINT) AS s3,
         CAST(SUM(CASE WHEN p4 THEN 1 ELSE 0 END) AS BIGINT) AS s4
  FROM flags
)
SELECT u.stage, u.surviving, u.dropped
FROM c, LATERAL (VALUES
  ('0_total',          s0, CAST(0 AS BIGINT)),
  ('1_length_gate',    s1, s0 - s1),
  ('2_quality_gate',   s2, s1 - s2),
  ('3_exact_dedup',    s3, s2 - s3),
  ('4_lang_allowlist', s4, s3 - s4)
) AS u(stage, surviving, dropped)
""",
)
def q_curation_attrition_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation attrition funnel: the observability table every large-scale
    data pipeline keeps next to its filters — per gate, how many documents
    survive and how many THIS gate dropped, with the gates applied
    cumulatively in pipeline order (length -> per-lang quality band ->
    exact dedup -> language allowlist).  The reference has no curation
    observability at all (its pipeline is truncate+collapse,
    Crawling.py:45-46); at 100 TB this table is how a curation change is
    reviewed before it burns a training run.

    Scale shape: ONE pass computes every per-doc flag (the per-lang
    quality floor is a tiny broadcast-joined aggregate), the dedup flag
    rides a single (content-hash) window shuffle — survivors of the
    quality gate rank first within each hash group, so canonical election
    needs no self-join — and the funnel itself is one global conditional
    aggregation followed by a 5-row unpivot.  Document text never
    shuffles: only ids, hashes, and booleans leave the scan stage."""
    from pyspark.sql import Window

    from crawling_vectordb_llm_spark.functions import text as X

    d = _docs(spark, sf_dir)
    q = d.select(
        "doc_id", "lang", "n_chars",
        X.quality_score("text").alias("quality"),
        F.md5("text").alias("h"),
        # both the per-lang floor aggregate and the flag pass read this
        # projection; materialize it once so the regex-heavy quality scan
        # over full text runs a single time (fixed-width rows only — text
        # itself never persists)
    ).localCheckpoint()
    b = q.groupBy("lang").agg(F.expr("percentile(quality, 0.25)").alias("lo"))
    f = (
        q.join(F.broadcast(b), "lang")
        .withColumn("p1", F.col("n_chars") >= 150)
        .withColumn("p2", F.col("p1") & (F.col("quality") >= F.col("lo")))
    )
    w = Window.partitionBy("h").orderBy(
        F.when(F.col("p2"), 0).otherwise(1), "doc_id"
    )
    r = f.withColumn("rn", F.row_number().over(w))
    flags = r.select(
        "p1", "p2",
        (F.col("p2") & (F.col("rn") == 1)).alias("p3"),
        (F.col("p2") & (F.col("rn") == 1) & (F.col("lang") != "zh")).alias("p4"),
    )
    c = flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("s0"),
        *[
            F.sum(F.when(F.col(p), 1).otherwise(0)).cast("bigint").alias(s)
            for p, s in [("p1", "s1"), ("p2", "s2"), ("p3", "s3"), ("p4", "s4")]
        ],
    )
    return c.select(
        F.expr(
            "stack(5,"
            " '0_total',          s0, CAST(0 AS BIGINT),"
            " '1_length_gate',    s1, s0 - s1,"
            " '2_quality_gate',   s2, s1 - s2,"
            " '3_exact_dedup',    s3, s2 - s3,"
            " '4_lang_allowlist', s4, s3 - s4)"
            " AS (stage, surviving, dropped)"
        )
    )


@query(
    "seeded_shuffle_rank",
    oracle="""
SELECT doc_id,
       CAST(row_number() OVER (
         ORDER BY md5('shuffle-seed-42:' || CAST(doc_id AS VARCHAR)), doc_id
       ) AS BIGINT) AS shuffle_rank
FROM documents
""",
)
def q_seeded_shuffle_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded deterministic global training shuffle: every document gets
    a dense 1..n position in a pseudorandom permutation keyed by
    md5(seed || doc_id) — the pre-training shuffle that must be (a)
    reproducible from the seed alone (resume a run, audit a batch), and
    (b) computed WITHOUT `row_number() OVER (ORDER BY ...)`'s
    single-partition window, which is the canonical 100 TB anti-plan.
    operators/topk.global_rank does it with one range shuffle + a
    #partitions-row offset table: the same permutation the naive window
    produces (the oracle IS that window, at fixture scale), at full
    cluster parallelism.

    Downstream, `shuffle_rank` drives batch assembly: batch i = ranks
    [i*B, (i+1)*B) — consistent across engines, reruns, and cluster
    sizes because the order is a pure function of (seed, doc_id)."""
    from crawling_vectordb_llm_spark.operators.topk import global_rank

    d = _docs(spark, sf_dir).select("doc_id")
    key = F.md5(F.concat(F.lit("shuffle-seed-42:"), F.col("doc_id").cast("string")))
    return global_rank(
        d.withColumn("__key", key), [F.col("__key"), F.col("doc_id")],
        rank_col="shuffle_rank",
    ).select("doc_id", F.col("shuffle_rank").cast("bigint").alias("shuffle_rank"))


_T1 = repr(1.0 / 3.0)
_T2 = repr(2.0 / 3.0)


@query(
    "perplexity_tercile_mix",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), freq AS (
  SELECT term, COUNT(*) AS c FROM toks GROUP BY term
), total AS (
  SELECT CAST(SUM(c) AS DOUBLE) AS n FROM freq
), scored AS (
  SELECT t.doc_id,
         CAST(ROUND(ln(f.c / total.n), 6) AS DECIMAL(22,6)) AS lp
  FROM toks t JOIN freq f ON t.term = f.term CROSS JOIN total
), m AS (
  SELECT s.doc_id, d.lang,
         CAST(SUM(s.lp) AS DOUBLE) / COUNT(*) AS mean_lp
  FROM scored s JOIN documents d ON s.doc_id = d.doc_id
  GROUP BY s.doc_id, d.lang
), b AS (
  SELECT lang, quantile_cont(mean_lp, {{t1}}) AS t1,
               quantile_cont(mean_lp, {{t2}}) AS t2
  FROM m GROUP BY lang
), bucketed AS (
  SELECT m.lang,
         CASE WHEN m.mean_lp > b.t2 THEN 'head'
              WHEN m.mean_lp > b.t1 THEN 'middle'
              ELSE 'tail' END AS bucket
  FROM m JOIN b ON m.lang = b.lang
), counts AS (
  SELECT lang, bucket, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM bucketed GROUP BY lang, bucket
)
SELECT lang, bucket, n_docs,
       ROUND(CAST(n_docs AS DOUBLE)
             / SUM(n_docs) OVER (PARTITION BY lang), 6) AS lang_share
FROM counts
""".format(t1=_T1, t2=_T2),
)
def q_perplexity_tercile_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing: per language, documents split
    into head/middle/tail terciles of their mean unigram log-probability
    (head = most predictable text; CCNet trains preferentially on head +
    middle and downsamples tail).  The output is the mixing table — per
    (lang, bucket) doc counts and within-language shares — that a data
    loader consumes as sampling weights.

    Determinism: per-token logprobs round at 6 dp and sum as decimals
    (the unigram_logprob_score convention), the mean divides the EXACT
    decimal sum once in double (identical in both engines at these
    magnitudes), and the tercile thresholds are compared but never
    output (interpolated quantiles are ulp-unstable cross-engine; counts
    are not).  Scale shape: one token aggregation (vocab is Zipf-small
    and broadcasts back), one per-doc aggregation, a tiny per-lang
    quantile broadcast, and a #langs×3-row final table — the window in
    the last step runs over that tiny aggregate, not the corpus."""
    d = _docs(spark, sf_dir)
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    freq = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    # 1-row corpus total stays IN the plan (broadcast cross-join) instead
    # of an eager driver .first() — no extra token-aggregation job per
    # invocation, and an empty corpus yields an empty result instead of
    # TypeError(float(None)).  long/long `/` is double division in Spark,
    # bit-identical to the former Python-float literal at count scale.
    tot = freq.agg(F.sum("c").alias("__tot"))
    scored = (
        toks.join(F.broadcast(freq), "term")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.round(F.log(F.col("c") / F.col("__tot")), 6)
            .cast("decimal(22,6)")
            .alias("lp"),
        )
    )
    m = (
        scored.join(d.select("doc_id", "lang"), "doc_id")
        .groupBy("doc_id", "lang")
        .agg(
            (F.sum("lp").cast("double") / F.count(F.lit(1))).alias("mean_lp")
        )
    )
    b = m.groupBy("lang").agg(
        F.expr(f"percentile(mean_lp, {_T1})").alias("t1"),
        F.expr(f"percentile(mean_lp, {_T2})").alias("t2"),
    )
    bucketed = m.join(F.broadcast(b), "lang").select(
        "lang",
        F.when(F.col("mean_lp") > F.col("t2"), "head")
        .when(F.col("mean_lp") > F.col("t1"), "middle")
        .otherwise("tail")
        .alias("bucket"),
    )
    counts = bucketed.groupBy("lang", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    from pyspark.sql import Window

    return counts.select(
        "lang",
        "bucket",
        "n_docs",
        F.round(
            F.col("n_docs").cast("double")
            / F.sum("n_docs").over(Window.partitionBy("lang")),
            6,
        ).alias("lang_share"),
    )
