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
    portable_banded_rows_fast,
)

_EMPTY_INDEX_SCHEMA = "__id long, band int, band_hash bigint"


def _round6_half_up(v: float) -> float:
    """Bit-identical twin of Spark's round(double, 6): Spark's Round
    converts via BigDecimal.valueOf (Double.toString — shortest decimal
    repr, which Python's repr also produces), then setScale(6,
    HALF_UP).  Python's builtin round() is banker's rounding and would
    diverge on exact half-way decimals."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(v)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
    )


def _verify_pairs_local(
    cand_rows: list, texts: dict, tau: float, shingle_n: int
) -> tuple[list, list, list]:
    """Driver-side exact-Jaccard verify of the flood-cap-bounded candidate
    pairs — the bit-identical twin of the distributed
    word_shingles/ngram_jaccard plan (parity-tested): distinct n-token
    shingle sets over split(' ') tokens, jaccard = round(|A∩B| /
    max(|A∪B|, 1), 6) with Spark's HALF_UP rounding.  Docs with fewer
    than n tokens have no shingles and are dropped exactly like the
    `size(sh) > 0` filter."""
    sh: dict = {}
    for d, t in texts.items():
        toks = (t or "").split(" ")
        if len(toks) < shingle_n:
            continue
        sh[d] = {
            " ".join(toks[i : i + shingle_n])
            for i in range(len(toks) - shingle_n + 1)
        }
    a_out, b_out, j_out = [], [], []
    for r in cand_rows:
        a, b = r["a_id"], r["b_id"]
        sa, sb = sh.get(a), sh.get(b)
        if sa is None or sb is None:
            continue
        j = _round6_half_up(len(sa & sb) / max(len(sa | sb), 1))
        if j >= tau:
            a_out.append(a)
            b_out.append(b)
            j_out.append(j)
    return a_out, b_out, j_out


def _write_pairs_parquet(pairs_batch_dir: str, a, b, j) -> None:
    """Idempotent local parquet write of the verified pairs (same schema
    the Spark writer produced: a_id long, b_id long, jaccard double).
    Driver-side because the rows are flood-cap-bounded — no reason to
    launch a write job for a list already in driver memory."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    shutil.rmtree(pairs_batch_dir, ignore_errors=True)
    os.makedirs(pairs_batch_dir, exist_ok=True)
    tbl = pa.table(
        {
            "a_id": pa.array(a, type=pa.int64()),
            "b_id": pa.array(b, type=pa.int64()),
            "jaccard": pa.array(j, type=pa.float64()),
        }
    )
    pq.write_table(tbl, os.path.join(pairs_batch_dir, "part-00000.parquet"))


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
    max_collect_pairs: int = 200_000,
) -> None:
    """The foreachBatch body — safe to replay: reads only batches < id,
    writes only batch=<id> dirs (overwrite).

    Rewritten round 6 (VERDICT r6 #1 — the r5 shape measured 619 rows/s
    at sf1: O(corpus) work per micro-batch plus a double evaluation of
    the interpreted minhash expression):

    * **Vectorized signer, evaluated once.**  Band rows come from
      ``portable_banded_rows_fast`` (numpy twin of the expression plan,
      bit-identical — parity-tested) and are written to
      ``index/batch=<id>`` FIRST, then the tiny parquet is read back for
      the probe.  Replay safety is unchanged: readers only ever scan
      ``batch < id``, so a batch's own partition is invisible to its own
      probe, and a crash anywhere before the checkpoint commit replays
      the whole body with mode=overwrite on every partition dir.
    * **Flood-capped candidates drive a PRUNED verify.**  r5 shingled
      the ENTIRE past corpus every batch (6 batches = 6 corpus-wide
      shingle passes — the O(n_batches x corpus) term that buried sf1).
      The candidate pairs are bounded by the max_bucket flood cap, so
      they are collected once (<= max_collect_pairs; distributed
      semi-join fallback above the cap) and the corpus read is filtered
      with an `isin` over their doc ids BEFORE the shingle expression —
      parquet row-group stats prune the text I/O and the shingle pass
      runs over O(candidate ids), never O(corpus).
    * Emitted pairs are byte-identical to the r5 shape: pruning only
      removes rows that could never join the candidate set.

    Per batch this is 4 bounded Spark jobs (corpus write, sign+index
    write, candidate collect, pruned verify+pairs write) — none of them
    scans more than index rows O(corpus·bands of 3 longs) or touches
    text beyond the batch and its candidates.
    """
    import threading

    spark = batch_df.sparkSession
    corpus_dir = os.path.join(store_path, "corpus")
    index_dir = os.path.join(store_path, "index")
    pairs_dir = os.path.join(store_path, "pairs")
    idx_batch_dir = os.path.join(index_dir, f"batch={batch_id}")
    pairs_batch_dir = os.path.join(pairs_dir, f"batch={batch_id}")

    docs = batch_df.select("doc_id", "text")
    band_rows = portable_banded_rows_fast(docs, shingle_n=shingle_n).persist()

    # the corpus and index writes are needed only by FUTURE batches, so
    # they run concurrently with this batch's probe (Spark schedules
    # concurrent jobs fine; the persisted band_rows is computed once and
    # shared).  Both must COMPLETE before the body returns — the
    # checkpoint commit happens after foreachBatch, and exactly-once
    # replay depends on every batch=<id> dir being fully written by then.
    errs: list = []

    def _bg(fn):
        def run():
            try:
                fn()
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        t = threading.Thread(target=run, daemon=True)
        t.start()
        return t

    threads = [
        _bg(
            lambda: docs.write.mode("overwrite").parquet(
                os.path.join(corpus_dir, f"batch={batch_id}")
            )
        ),
        _bg(
            lambda: band_rows.write.mode("overwrite").parquet(idx_batch_dir)
        ),
    ]
    try:
        old_rows = _read_index_before(spark, index_dir, batch_id)
        # distinct=False: the cross-band dedup shuffle is skipped and the
        # driver dedups the (flood-cap-bounded) collect instead; the cap
        # is compared against the non-distinct row count, so a heavily
        # band-overlapping flood just falls back to the distributed path
        cands_plan = incremental_candidate_pairs(
            old_rows, band_rows, max_bucket, distinct=False
        )
        cand_rows = cands_plan.limit(max_collect_pairs + 1).collect()
        seen = set()
        deduped = []
        for r in cand_rows:
            k = (r["a_id"], r["b_id"])
            if k not in seen:
                seen.add(k)
                deduped.append(r)
        overflow = len(cand_rows) > max_collect_pairs
        cand_rows = deduped
    finally:
        for t in threads:
            t.join()
        band_rows.unpersist()
    if errs:
        raise errs[0]

    if not cand_rows:
        _write_pairs_parquet(pairs_batch_dir, [], [], [])
        return

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
    if not overflow:
        # bounded driver verify: the candidate set is flood-capped, so
        # ONE pruned collect fetches the <= 2·|pairs| candidate texts
        # (isin reaches the parquet scan as row-group pruning) and the
        # exact Jaccard + the pairs write run driver-side — no broadcast
        # materialization, no join stages, no write job
        need = sorted(
            {r["a_id"] for r in cand_rows} | {r["b_id"] for r in cand_rows}
        )
        texts = {
            r["doc_id"]: r["text"]
            for r in known.where(F.col("doc_id").isin(need)).collect()
        }
        a_out, b_out, j_out = _verify_pairs_local(
            cand_rows, texts, tau, shingle_n
        )
        _write_pairs_parquet(pairs_batch_dir, a_out, b_out, j_out)
        return

    # candidate flood past the collect cap: fully distributed fallback
    # (recomputes the probe WITH the distinct shuffle — the flood made
    # driver dedup unaffordable; band_rows was unpersisted above, but
    # re-signing the batch is linear and the fallback is the rare path)
    new_rows = spark.read.parquet(idx_batch_dir).select(
        "__id", "band", "band_hash"
    )
    cands = incremental_candidate_pairs(
        _read_index_before(spark, index_dir, batch_id),
        new_rows,
        max_bucket,
        distinct=True,
    ).localCheckpoint()
    need_df = (
        cands.select(F.col("a_id").alias("doc_id"))
        .unionByName(cands.select(F.col("b_id").alias("doc_id")))
        .distinct()
    )
    known = known.join(need_df, "doc_id", "left_semi")
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
    pairs.write.mode("overwrite").parquet(pairs_batch_dir)


def run_streaming_incremental_dedup(
    spark: SparkSession,
    docs_parquet_dir: str,
    store_path: str,
    tau: float = 0.2,
    max_files_per_trigger: int | None = 1,
    checkpoint: str | None = None,
) -> DataFrame:
    """File-stream the docs dir (one micro-batch per file by default;
    max_files_per_trigger=None lets availableNow take every outstanding
    file in ONE micro-batch — the throughput posture) → per-batch
    incremental probe → batch-keyed store.  Returns all pairs
    accumulated in the store."""
    schema = spark.read.parquet(docs_parquet_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(docs_parquet_dir)
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
