"""Streaming incremental near-dup: the crawl feed deduped per micro-batch
against everything previously ingested, with replay-idempotent storage.

Composes three subsystems: Structured Streaming (foreachBatch), the
incremental LSH probe (operators/incremental_dedup.py), and batch-keyed
idempotent storage.  Layout under `store_path`:

  corpus/batch=<id>/   the micro-batch's raw docs (append-only corpus)
  index/batch=<id>/    its (__id, band, band_hash) band rows
  pairs/batch=<id>/    near-dup pairs involving this batch

Each foreachBatch invocation treats strictly-earlier batches as the
indexed past (`batch < id` partition pruning on the index dir), so a
replayed micro-batch recomputes EXACTLY the same probe — and every write
lands under its own batch=<id> directory with overwrite, so at-least-once
delivery collapses to exactly-once state (same recipe as the vdb
streaming sink's batch-identity idempotency, vdb_datasource.py).

Scale: per batch the probe signs only the batch, scans only touched index
buckets, and the verify joins candidates against the corpus store by id —
all O(batch + touched), never O(corpus).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawling_vectordb_llm_spark.operators.dedup import (
    ngram_jaccard,
    word_shingles,
)
from crawling_vectordb_llm_spark.operators.incremental_dedup import (
    incremental_candidate_pairs,
    portable_banded_rows,
)

_EMPTY_INDEX_SCHEMA = "__id long, band int, band_hash bigint"


def _read_index_before(
    spark: SparkSession, index_dir: str, batch_id: int
) -> DataFrame:
    if not os.path.isdir(index_dir):
        return spark.createDataFrame([], _EMPTY_INDEX_SCHEMA)
    df = spark.read.option("basePath", index_dir).parquet(index_dir)
    return df.where(F.col("batch") < batch_id).select(
        "__id", "band", "band_hash"
    )


def process_batch(
    batch_df: DataFrame,
    batch_id: int,
    store_path: str,
    tau: float = 0.2,
    shingle_n: int = 3,
    max_bucket: int = 50,
) -> None:
    """The foreachBatch body — safe to replay: reads only batches < id,
    writes only batch=<id> dirs (overwrite)."""
    spark = batch_df.sparkSession
    corpus_dir = os.path.join(store_path, "corpus")
    index_dir = os.path.join(store_path, "index")
    pairs_dir = os.path.join(store_path, "pairs")

    docs = batch_df.select("doc_id", "text")
    docs.write.mode("overwrite").parquet(
        os.path.join(corpus_dir, f"batch={batch_id}")
    )
    new_rows = portable_banded_rows(docs, shingle_n=shingle_n)
    old_rows = _read_index_before(spark, index_dir, batch_id)
    cands = incremental_candidate_pairs(old_rows, new_rows, max_bucket)

    # verify against the corpus store (earlier batches) + this batch
    past = (
        spark.read.option("basePath", corpus_dir)
        .parquet(corpus_dir)
        .where(F.col("batch") < batch_id)
        .select("doc_id", "text")
        if os.path.isdir(corpus_dir)
        and any(e.startswith("batch=") for e in os.listdir(corpus_dir))
        else spark.createDataFrame([], "doc_id long, text string")
    )
    known = past.where(F.col("doc_id").isNotNull()).unionByName(docs)
    sh = known.select(
        "doc_id", word_shingles("text", shingle_n).alias("sh")
    ).where(F.size("sh") > 0)
    a = sh.select(F.col("doc_id").alias("a_id"), F.col("sh").alias("a_sh"))
    b = sh.select(F.col("doc_id").alias("b_id"), F.col("sh").alias("b_sh"))
    pairs = (
        cands.join(a, "a_id")
        .join(b, "b_id")
        .select(
            "a_id",
            "b_id",
            ngram_jaccard(F.col("a_sh"), F.col("b_sh")).alias("jaccard"),
        )
        .where(F.col("jaccard") >= tau)
    )
    pairs.write.mode("overwrite").parquet(
        os.path.join(pairs_dir, f"batch={batch_id}")
    )
    new_rows.write.mode("overwrite").parquet(
        os.path.join(index_dir, f"batch={batch_id}")
    )


def run_streaming_incremental_dedup(
    spark: SparkSession,
    docs_parquet_dir: str,
    store_path: str,
    tau: float = 0.2,
    max_files_per_trigger: int = 1,
    checkpoint: str | None = None,
) -> DataFrame:
    """File-stream the docs dir (one micro-batch per file by default) →
    per-batch incremental probe → batch-keyed store.  Returns all pairs
    accumulated in the store."""
    schema = spark.read.parquet(docs_parquet_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(docs_parquet_dir)
    )
    ckpt = checkpoint or os.path.join(
        store_path, f"_ckpt_{uuid.uuid4().hex[:8]}"
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda df, bid: process_batch(df, bid, store_path, tau=tau)
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.option("basePath", os.path.join(store_path, "pairs")).parquet(
        os.path.join(store_path, "pairs")
    )
