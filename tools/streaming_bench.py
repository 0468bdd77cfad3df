"""Streaming throughput bench (VERDICT r4 #4): the 10 streaming queries
are correctness-gated (restart/crash pytest + selfcheck), but no
artifact recorded micro-batch throughput/latency or how state scales.
This measures the two stateful paths end-to-end:

1. `tws` — transformWithStateInPandas per-user running totals
   (streaming/stateful.py, RocksDB state store): the events table split
   into N chunk files, streamed one file per micro-batch.  Records
   rows/s, per-batch durations (query.recentProgress), and state-store
   rows (stateOperators numRowsTotal).
2. `incremental_dedup` — the foreachBatch incremental-LSH stream
   (streaming/incremental_dedup_stream.py) fed the documents table in
   chunks ACROSS 3 SEPARATE STREAM RUNS sharing one checkpoint (the
   restart posture: each run resumes from the committed offset log and
   the batch-keyed store stays exactly-once).  Records rows/s, batches,
   accumulated band-index (state) rows, and final pair count.

Callable standalone (`python tools/streaming_bench.py [sf_dir]`) or via
bench.py, which embeds the result dict under a "streaming" key — NOT
added to the headline "value", so round-over-round headline comparisons
stay like-for-like.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def _split_table(
    spark: SparkSession, sf_dir: str, table: str, n_chunks: int, dest: str
) -> int:
    """Write table as n_chunks single parquet files chunk-00i.parquet
    (id-range split — deterministic) and return the row count."""
    from crawling_vectordb_llm_spark.catalog import read_table
    from tools.sf1 import write_single_parquet

    df = read_table(spark, sf_dir, table)
    ids = {"events": "event_id", "documents": "doc_id"}[table]
    lo, hi = df.selectExpr(f"min({ids})", f"max({ids})").first()
    total = 0
    step = (hi - lo + n_chunks) // n_chunks
    os.makedirs(dest, exist_ok=True)
    for i in range(n_chunks):
        chunk = df.where(
            (df[ids] >= lo + i * step) & (df[ids] < lo + (i + 1) * step)
        )
        write_single_parquet(chunk, dest, f"_chunk{i:03d}")
        os.replace(
            f"{dest}/_chunk{i:03d}.parquet", f"{dest}/chunk-{i:03d}.parquet"
        )
        total += chunk.count()
    return total


def bench_tws(spark: SparkSession, sf_dir: str, n_chunks: int = 8) -> dict:
    from crawling_vectordb_llm_spark.streaming.stateful import (
        run_tws_user_totals,
    )

    feed = tempfile.mkdtemp(prefix="stream_bench_tws_")
    try:
        n_rows = _split_table(spark, sf_dir, "events", n_chunks, feed)
        t0 = time.time()
        out, query = run_tws_user_totals(
            spark, feed, max_files=1, return_query=True
        )
        wall = time.time() - t0
        import json as _json

        prog = [
            p if isinstance(p, dict) else _json.loads(p.json)
            for p in query.recentProgress
            if p is not None
        ]
        batch_ms = [
            p["durationMs"].get("triggerExecution", 0)
            for p in prog
            if p.get("numInputRows", 0) > 0
        ]
        state_rows = 0
        for p in reversed(prog):
            ops = p.get("stateOperators") or []
            if ops:
                state_rows = ops[0].get("numRowsTotal", 0)
                break
        n_keys = out.select("user_id").distinct().count()
        return {
            "rows": n_rows,
            "wall_s": round(wall, 2),
            "rows_per_s": round(n_rows / wall, 1),
            "micro_batches": len(batch_ms),
            "batch_ms_median": sorted(batch_ms)[len(batch_ms) // 2]
            if batch_ms
            else None,
            "batch_ms_max": max(batch_ms) if batch_ms else None,
            "state_rows": state_rows,
            "distinct_keys": n_keys,
        }
    finally:
        shutil.rmtree(feed, ignore_errors=True)


def bench_incremental_dedup(
    spark: SparkSession, sf_dir: str, n_chunks: int = 6, runs: int = 3
) -> dict:
    from crawling_vectordb_llm_spark.streaming.incremental_dedup_stream import (
        run_streaming_incremental_dedup,
    )

    staging = tempfile.mkdtemp(prefix="stream_bench_dedup_src_")
    feed = tempfile.mkdtemp(prefix="stream_bench_dedup_feed_")
    store = tempfile.mkdtemp(prefix="stream_bench_dedup_store_")
    ckpt = os.path.join(store, "_ckpt")
    try:
        n_rows = _split_table(spark, sf_dir, "documents", n_chunks, staging)
        chunks = sorted(os.listdir(staging))
        per_run = (len(chunks) + runs - 1) // runs
        wall = 0.0
        for r in range(runs):  # each run = a fresh stream sharing the ckpt
            for c in chunks[r * per_run : (r + 1) * per_run]:
                shutil.copyfile(f"{staging}/{c}", f"{feed}/{c}")
            t0 = time.time()
            pairs = run_streaming_incremental_dedup(
                spark, feed, store, tau=0.2, checkpoint=ckpt
            )
            wall += time.time() - t0
        n_pairs = pairs.count()
        index_dir = os.path.join(store, "index")
        state_rows = (
            spark.read.option("basePath", index_dir).parquet(index_dir).count()
        )
        return {
            "rows": n_rows,
            "wall_s": round(wall, 2),
            "rows_per_s": round(n_rows / wall, 1),
            "stream_runs": runs,
            "micro_batches": n_chunks,
            "band_index_rows": state_rows,
            "near_dup_pairs": n_pairs,
        }
    finally:
        for d in (staging, feed, store):
            shutil.rmtree(d, ignore_errors=True)


def bench_incremental_dedup_throughput(
    spark: SparkSession, sf_dir: str, n_chunks: int = 6,
    files_per_trigger: int = 2,
) -> dict:
    """Throughput posture (VERDICT r6 #1: 'measure with larger
    micro-batches'): ONE stream run over all chunks with
    files_per_trigger files per micro-batch, so per-trigger overhead
    amortizes over real batch sizes while batches 2..k still probe a
    growing index (a single availableNow mega-batch would probe an
    EMPTY index and measure bulk signing, not incremental dedup).
    The restart/exactly-once posture stays covered by
    bench_incremental_dedup and the pytest restart matrix."""
    from crawling_vectordb_llm_spark.streaming.incremental_dedup_stream import (
        run_streaming_incremental_dedup,
    )

    feed = tempfile.mkdtemp(prefix="stream_bench_dedup_tp_")
    store = tempfile.mkdtemp(prefix="stream_bench_dedup_tpstore_")
    try:
        n_rows = _split_table(spark, sf_dir, "documents", n_chunks, feed)
        t0 = time.time()
        pairs = run_streaming_incremental_dedup(
            spark, feed, store, tau=0.2,
            max_files_per_trigger=files_per_trigger,
            checkpoint=os.path.join(store, "_ckpt"),
        )
        n_pairs = pairs.count()
        wall = time.time() - t0
        return {
            "rows": n_rows,
            "wall_s": round(wall, 2),
            "rows_per_s": round(n_rows / wall, 1),
            "micro_batches": -(-n_chunks // files_per_trigger),
            "near_dup_pairs": n_pairs,
        }
    finally:
        for d in (feed, store):
            shutil.rmtree(d, ignore_errors=True)


def run(spark: SparkSession, sf_dir: str) -> dict:
    return {
        "tws_user_totals": bench_tws(spark, sf_dir),
        "incremental_dedup_stream": bench_incremental_dedup(spark, sf_dir),
        "incremental_dedup_stream_throughput": bench_incremental_dedup_throughput(
            spark, sf_dir
        ),
    }


if __name__ == "__main__":
    from crawling_vectordb_llm_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("streaming_bench")
    import json

    print(json.dumps(run(spark, sf_dir), indent=1))
