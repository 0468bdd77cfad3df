"""IVF (inverted-file) approximate nearest-neighbor search — the batch
stand-in for the reference's HNSW index (TencentVDB.py:46: HNSW m=16,
efConstruction=200; search ef=100 → here: n_centroids / n_probe are the
recall/latency knobs, SURVEY §4).

Build (the "create index" analog, batch):
  1. KMeans over (a sample of) the corpus → centroid matrix
  2. assign every vector to its nearest centroid (one numpy GEMM pass)
  3. at scale: write the corpus partitioned by centroid_id — search then
     becomes partition PRUNING (only n_probe of n_centroids partitions are
     even read); locally the assignment column + a join achieves the same
     candidate-set reduction.

Search:
  1. score queries × centroids (tiny GEMM on the driver)
  2. per query keep n_probe nearest cells
  3. exact-score only vectors in probed cells (knn numpy path), top-k.

Recall is testable against exact kNN (tests/test_ivf.py); n_probe =
n_centroids degrades to exact search.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawling_vectordb_llm_spark.operators.topk import grouped_topk


def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)


def bounded_random_sample(
    df: DataFrame, cols: list[str], sample_limit: int, seed: int
) -> list:
    """Collect a seeded RANDOM sample of up to sample_limit rows — the
    shared trainer-sampling primitive for every codebook/centroid fit.
    `.limit()` alone takes whole first partitions, which on a sorted or
    clustered corpus trains on one region of the space and silently
    degrades recall (ADVICE r1).  The 1.2x oversample makes the
    post-sample limit almost surely full; seeded → deterministic per
    layout.

    Cost note: corpora at or under sample_limit (every training set is,
    by definition of the limit) pay exactly ONE collect — the limit+1
    probe detects that everything fit and no count/sample jobs run.  Only
    a genuinely larger corpus pays the count + sampled second pass."""
    rows = df.select(*cols).limit(sample_limit + 1).collect()
    if len(rows) <= sample_limit:
        return rows
    n = df.count()
    fraction = min(1.0, 1.2 * sample_limit / n)
    return (
        df.select(*cols)
        .sample(fraction=fraction, seed=seed)
        .limit(sample_limit)
        .collect()
    )


def kmeans_centroids(
    corpus: DataFrame,
    n_centroids: int,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 15,
    sample_limit: int = 200_000,
) -> np.ndarray:
    """Centroid fit on a bounded sample — standard IVF practice at any
    scale (FAISS trains on ~max(10k, 50*k) points): one distributed pass
    collects the sample, then vectorized Lloyd's iterations run on the
    driver (milliseconds for 200k x 64 float64; no per-iteration Spark job
    overhead).  Returns the L2-normalized centroid matrix, deterministic
    for a fixed seed."""
    rows = bounded_random_sample(corpus, [vec_col], sample_limit, seed)
    x = _normalize(np.array([r[0] for r in rows], dtype=np.float64))
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(max_iter):
        assign = np.argmax(x @ cents.T, axis=1)
        new = np.vstack(
            [
                x[assign == c].mean(axis=0) if np.any(assign == c) else cents[c]
                for c in range(len(cents))
            ]
        )
        new = _normalize(new)
        if np.allclose(new, cents, atol=1e-9):
            break
        cents = new
    return cents


def kmeans_centroids_ml(
    corpus: DataFrame,
    n_centroids: int,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
) -> np.ndarray:
    """pyspark.ml variant — the fully-distributed fit for when even the
    training sample shouldn't be collected."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = corpus.select(array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"))
    model = KMeans(k=n_centroids, seed=seed, maxIter=max_iter).fit(feats)
    return _normalize(np.array(model.clusterCenters(), dtype=np.float64))


def assign_centroids(
    corpus: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One GEMM pass per partition: nearest (cosine) centroid per vector.
    At 100 TB this column becomes the table's partition key."""
    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast(centroids)

    def _assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = _normalize(np.array(list(pdf[vec_col]), dtype=np.float64))
            cid = np.argmax(mat @ cents.T, axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    vec_col: pdf[vec_col],
                    "centroid_id": cid.astype(np.int32),
                }
            )

    vec_type = corpus.schema[vec_col].dataType.simpleString()
    id_type = corpus.schema[id_col].dataType.simpleString()
    return corpus.select(id_col, vec_col).mapInPandas(
        _assign, schema=f"{id_col} {id_type}, {vec_col} {vec_type}, centroid_id int"
    )


def ivf_search(
    queries: DataFrame,
    assigned_corpus: DataFrame,
    centroids: np.ndarray,
    k: int,
    n_probe: int,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Probe the n_probe nearest cells per query, exact-score only those
    cells' vectors, return top-k.  The candidate join key is centroid_id —
    with a centroid-partitioned table this is partition pruning."""
    spark = queries.sparkSession
    qrows = queries.select(query_id, query_vec).collect()
    qids = np.array([r[0] for r in qrows])
    qmat = _normalize(np.array([r[1] for r in qrows], dtype=np.float64))
    probe_cells = np.argsort(-(qmat @ centroids.T), axis=1)[:, :n_probe]

    probes = spark.createDataFrame(
        [
            (int(qids[i]), [int(c) for c in probe_cells[i]])
            for i in range(len(qids))
        ],
        f"{query_id} long, cells array<int>",
    ).select(query_id, F.explode("cells").alias("centroid_id"))

    bq = spark.sparkContext.broadcast({int(q): qmat[i] for i, q in enumerate(qids)})

    candidates = assigned_corpus.join(
        F.broadcast(probes), "centroid_id"
    ).select(query_id, corpus_id, corpus_vec)

    def _score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qv = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cmat = _normalize(np.array(list(pdf[corpus_vec]), dtype=np.float64))
            qarr = np.array([qv[int(q)] for q in pdf[query_id]])
            scores = np.einsum("ij,ij->i", qarr, cmat)
            yield pd.DataFrame(
                {
                    query_id: pdf[query_id],
                    corpus_id: pdf[corpus_id],
                    "score": np.round(scores, 6),
                }
            )

    cid_t = assigned_corpus.schema[corpus_id].dataType.simpleString()
    scored = candidates.mapInPandas(
        _score, schema=f"{query_id} long, {corpus_id} {cid_t}, score double"
    )
    return grouped_topk(
        scored, [query_id], [F.desc("score"), F.asc(corpus_id)], k
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    **cols,
) -> DataFrame:
    """Build + search in one call (fixture-scale convenience)."""
    vec_col = cols.get("corpus_vec", "embedding")
    id_col = cols.get("corpus_id", "vec_id")
    centroids = kmeans_centroids(corpus, n_centroids, vec_col)
    assigned = assign_centroids(corpus, centroids, id_col, vec_col)
    return ivf_search(queries, assigned, centroids, k, n_probe, **cols)
