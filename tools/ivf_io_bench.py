"""IVF scan-pruning at I/O-dominant scale (VERDICT r4 #3).

The r4 clustered bench showed the partitioned-by-centroid layout's
pruning was "sub-second noise either way" at 400 KB cells — too small
for I/O to matter.  This builds a ~2M x 64 clustered corpus (~0.6 GB
parquet, ~5 MB/cell at 128 cells — 12x the r4 cell size), writes it
partitioned by centroid_id (the plans/index_build.py layout), and
measures BYTES READ (Spark REST stage inputBytes, same machinery as
tools/skew_bench.py) plus wall for `ivf_search` with selective query
batches vs the exact full-scan kNN:

  - bytes-read for the pruned scan should track the probed-cell
    fraction (partition pruning happens BEFORE any byte is read), while
    the full scan always reads the whole table;
  - at this cell size the wall win should survive being I/O-dominant,
    not just flop-dominant.

Prints a markdown table for SCALE.md.  Run alone (bench noise rules,
MEMORY.md):  python tools/ivf_io_bench.py [n_rows]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from crawling_vectordb_llm_spark.operators import ivf as I
from crawling_vectordb_llm_spark.operators.knn import knn_join_numpy
from crawling_vectordb_llm_spark.sources.synthetic_embeddings import (
    clustered_embeddings,
)


def build_spark() -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    return (
        SparkSession.builder.appName("ivf_io_bench")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "true")  # REST API for inputBytes
        .getOrCreate()
    )


def next_stage_id(app_id: str) -> int:
    import requests

    st = requests.get(
        f"http://localhost:4040/api/v1/applications/{app_id}/stages",
        timeout=10,
    ).json()
    return 1 + max((s["stageId"] for s in st), default=-1)


def input_bytes_since(app_id: str, min_stage: int) -> int:
    """Sum stage inputBytes across all stage attempts >= min_stage."""
    import requests

    total = 0
    st = requests.get(
        f"http://localhost:4040/api/v1/applications/{app_id}/stages",
        timeout=10,
    ).json()
    for s in st:
        if s["stageId"] >= min_stage:
            total += s.get("inputBytes", 0)
    return total


def timed(fn):
    t0 = time.time()
    r = fn()
    return time.time() - t0, r


def main(n: int = 2_000_000) -> None:
    spark = build_spark()
    app_id = spark.sparkContext.applicationId
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm

    k_true, n_cells, n_probe = 64, 128, 8
    emb = clustered_embeddings(
        spark, n, k=k_true, sigma=0.12, partitions=64
    ).select("vec_id", "embedding")

    base = tempfile.mkdtemp(prefix="ivf_io_")
    try:
        # one-time index build + both layouts on disk
        raw = os.path.join(base, "raw")
        t0 = time.time()
        emb.write.mode("overwrite").parquet(raw)
        print(f"generated + wrote raw corpus in {time.time() - t0:.1f}s")
        emb = spark.read.parquet(raw)
        t_fit, centroids = timed(
            lambda: I.kmeans_centroids(emb, n_cells, "embedding")
        )
        assigned = I.assign_centroids(emb, centroids, "vec_id", "embedding")
        part_path = os.path.join(base, "ivf_assignment")
        t_write, _ = timed(
            lambda: assigned.repartition(n_cells, "centroid_id")
            .write.mode("overwrite")
            .partitionBy("centroid_id")
            .parquet(part_path)
        )
        full_bytes = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(part_path)
            for f in fs
            if f.endswith(".parquet")
        )
        print(
            f"index build: kmeans {t_fit:.1f}s, partitioned write "
            f"{t_write:.1f}s, table {full_bytes / 1e9:.2f} GB, "
            f"{full_bytes / n_cells / 1e6:.1f} MB/cell\n"
        )

        print(
            "| query batch | probed cells | cell fraction | GB read "
            "(pruned) | GB read (full) | bytes ratio | wall s pruned | "
            "wall s full | wall ratio |"
        )
        print("|---|---|---|---|---|---|---|---|---|")
        for nq in (5, 20, 100):
            qs = (
                emb.where(F.col("vec_id") < nq)
                .select(
                    F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("query_vec"),
                )
                .localCheckpoint()
            )
            qrows = qs.collect()
            qmat = np.array([r["query_vec"] for r in qrows], dtype=np.float64)
            qmat /= np.linalg.norm(qmat, axis=1, keepdims=True)
            probed = np.unique(
                np.argsort(-(qmat @ centroids.T), axis=1)[:, :n_probe]
            )
            frac = len(probed) / n_cells

            def pruned():
                return I.ivf_search(
                    qs,
                    spark.read.parquet(part_path).where(
                        F.col("centroid_id").isin([int(c) for c in probed])
                    ),
                    centroids,
                    10,
                    n_probe,
                    corpus_id="vec_id",
                ).count()

            def full():
                return knn_join_numpy(
                    qs, spark.read.parquet(raw), k=10, corpus_id="vec_id"
                ).count()

            pruned(), full()  # warm plan compile (page cache stays warm
            # for BOTH paths — the comparison is scan volume, not disk)
            s0 = next_stage_id(app_id)
            tp, _ = timed(pruned)
            bp = input_bytes_since(app_id, s0)
            s1 = next_stage_id(app_id)
            tf, _ = timed(full)
            bf = input_bytes_since(app_id, s1)
            print(
                f"| {nq} queries | {len(probed)}/{n_cells} | {frac:.3f} | "
                f"{bp / 1e9:.3f} | {bf / 1e9:.3f} | {bp / max(bf, 1):.3f} | "
                f"{tp:.2f} | {tf:.2f} | {tp / tf:.2f}x |"
            )
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000)
