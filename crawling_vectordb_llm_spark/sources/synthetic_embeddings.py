"""Deterministic clustered-embedding generator (VERDICT r3 #2).

The driver's `embeddings` fixture uses hash-derived vectors, which are
ISOTROPIC — uniformly spread on the sphere.  That is the provable
worst case for every cell-pruning ANN structure (IVF, triangle-bound
candidate pruning): with no cluster structure, every cell neighbors
every other and pruning admits the full grid (SCALE.md r3 conceded
exactly this).  Real embedding models produce the opposite geometry —
text/image encoders cluster by topic — so to MEASURE the prune paths
doing their job we need a corpus with that geometry, generated
deterministically with public numpy only.

Technique (public, standard): mixture of Gaussians on the unit sphere —
k seeded unit centers, each vector = normalize(center + noise) with
noise = sigma/sqrt(dim) * N(0, I), so E||noise|| ~ sigma REGARDLESS of
dim and the cluster's angular radius is ~arctan(sigma) (a raw
sigma * N(0, I) would have norm sigma*sqrt(dim) — at dim 64 that washes
the clusters out entirely).  Small sigma → tight clusters (the near-dup
regime); sigma >~ 1 → isotropy, so one knob sweeps the whole difficulty
axis.

Determinism: each row's noise RNG is seeded by (seed, vec_id), so the
corpus is a pure function of (n, dim, k, sigma, seed) — independent of
partitioning, task order, or retries (same contract as the synthetic
crawl source, crawl_datasource.py).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession


def cluster_centers(k: int, dim: int, seed: int) -> np.ndarray:
    """k unit-norm centers — one RNG draw, tiny, shared driver/executor."""
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((k, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def clustered_embeddings(
    spark: SparkSession,
    n: int,
    dim: int = 64,
    k: int = 32,
    sigma: float = 0.15,
    seed: int = 7,
    partitions: int | None = None,
) -> DataFrame:
    """(vec_id long, label int, embedding array<float>) — n vectors in k
    tight spherical clusters.  label = the generating cluster (ground
    truth for recall/dedup experiments).  Distributed generation: each
    partition materializes only its own id range."""
    centers = cluster_centers(k, dim, seed)
    bc = spark.sparkContext.broadcast(centers)

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["id"].to_numpy()
            out_vecs = np.empty((len(ids), dim), dtype=np.float64)
            labels = np.empty(len(ids), dtype=np.int32)
            for i, vid in enumerate(ids):
                rng = np.random.default_rng((seed << 32) ^ int(vid))
                lab = int(vid) % len(cents)
                v = cents[lab] + (sigma / np.sqrt(dim)) * rng.standard_normal(dim)
                out_vecs[i] = v / max(np.linalg.norm(v), 1e-30)
                labels[i] = lab
            yield pd.DataFrame(
                {
                    "vec_id": ids,
                    "label": labels,
                    "embedding": [r.astype(np.float32) for r in out_vecs],
                }
            )

    base = spark.range(n)
    if partitions:
        base = base.repartition(partitions)
    return base.mapInPandas(
        _gen, schema="vec_id long, label int, embedding array<float>"
    )
