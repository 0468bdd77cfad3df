"""Third-scale-point diagnosis for the bounded-join consumers
(VERDICT r10 #1): WHY the sf3->sf9 interleaved exponents in
AB_EXPONENT_SF9_r11.json blew through e=1.15 (ratios 4.7-7.5, e
1.41-1.83) when every sf1->sf3 pair had measured 0.91-1.15.

Hypothesis under test: on the ISOTROPIC hash-embedding fixtures the
angular triangle-inequality prune admits ~every cell pair (no cluster
structure to convert into skipped blocks), so the exact bounded join's
COMPUTE is the full pairwise GEMM — Theta(n^2 d) flops regardless of
n_cells — and sf9 (180k) is where the quadratic flop term finally
dominates the fixed overheads that had kept the two-point exponents
near 1.  If true, this is the CC-rewrite situation's OTHER outcome: the
third point falsifies the extrapolation, but the cause is not a
fixable buffer — it is the information cost of EXACT top-k at recall
1.0 on structure-free geometry (FAISS exact = brute GEMM for the same
reason).  The engineering answers are (a) a faster exact kernel
(f32-prefilter/f64-verify — same output bits), (b) the measured
clustered-geometry regime where the prune does its job (real embedding
corpora cluster; tools/clustered_bench.py), and (c) the gated
approximate ladder for corpora with no structure at all.

Measures, interleaved sf3<->sf9 in ONE process (ab_bench discipline):

  1. admit stats per fixture via _ivf_pruned_replicated(stats_out):
     admissible_blocks/total_blocks, candidate_pairs/total_pairs.
  2. stage decomposition: prep wall (assign + radius stats + replicate,
     no GEMM) vs full bounded-join wall (ivf_pruned_topk_join count) —
     GEMM share = 1 - prep/full.
  3. implied GEMM throughput: admitted_pairs * d * 2 flops / gemm wall
     — if sf3 and sf9 land at similar GFLOPS, the wall IS the flop
     count, i.e. compute-bound quadratic, not a scheduling/shuffle/skew
     defect.

Usage:  python tools/sf9_diag.py [--reps N] [--json OUT]
Run alone on the box (bench noise rules, MEMORY.md).
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawling_vectordb_llm_spark.operators.ivf import (
    _ivf_pruned_replicated,
    ivf_pruned_topk_join,
)
from crawling_vectordb_llm_spark.session import get_spark

TAU, K, N_CELLS = 0.35, 5, 16  # the consumers' operating point
SF3 = os.environ.get("SPARK_GRAFT_SF3F_DIR", "/tmp/sf3_fresh")
SF9 = os.environ.get("SPARK_GRAFT_SF9F_DIR", "/tmp/sf9_fresh")


def _emb(spark, d):
    df = spark.read.parquet(os.path.join(d, "embeddings.parquet")).select(
        "vec_id", "embedding"
    ).localCheckpoint()
    df.count()
    return df


def _prep_wall(corpus) -> tuple[float, dict]:
    stats: dict = {}
    t0 = time.time()
    prep = _ivf_pruned_replicated(
        corpus, TAU, "vec_id", "embedding", N_CELLS, 42, 65_536, None, stats
    )
    prep[0].count()  # materialize replication, but run NO block kernel
    return time.time() - t0, stats


def _full_wall(corpus) -> float:
    t0 = time.time()
    ivf_pruned_topk_join(
        corpus, tau=TAU, k=K, n_cells=N_CELLS
    ).count()
    return time.time() - t0


def main() -> None:
    args = sys.argv[1:]
    reps, json_out = 3, None
    while args and args[0].startswith("--"):
        if args[0] == "--reps":
            reps, args = int(args[1]), args[2:]
        elif args[0] == "--json":
            json_out, args = args[1], args[2:]
        else:
            raise SystemExit(f"unknown flag {args[0]!r}")
    spark = get_spark("sf9_diag")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    sides = {}
    embs = {"sf3": _emb(spark, SF3), "sf9": _emb(spark, SF9)}
    dim = len(embs["sf3"].select("embedding").first()[0])
    for name, df in embs.items():
        _full_wall(df)  # cold, uncounted
        sides[name] = {"prep_walls_s": [], "full_walls_s": []}
    for rep in range(reps):
        order = ("sf3", "sf9") if rep % 2 == 0 else ("sf9", "sf3")
        for name in order:
            p, stats = _prep_wall(embs[name])
            f = _full_wall(embs[name])
            sides[name]["prep_walls_s"].append(round(p, 3))
            sides[name]["full_walls_s"].append(round(f, 3))
            sides[name]["admit"] = stats
        spark.catalog.clearCache()
        gc.collect()
    med = statistics.median
    out = {"tau": TAU, "k": K, "n_cells": N_CELLS, "dim": dim, "reps": reps,
           "protocol": "interleaved sf3<->sf9, alternating order, 1 cold "
           "full run/side, medians reported with raw walls", "sides": {}}
    for name, s in sides.items():
        a = s["admit"]
        prep, full = med(s["prep_walls_s"]), med(s["full_walls_s"])
        gemm = max(full - prep, 1e-9)
        flops = a["candidate_pairs"] * dim * 2
        out["sides"][name] = {
            **a,
            "admit_block_rate": round(
                a["admissible_blocks"] / max(a["total_blocks"], 1), 4
            ),
            "prep_median_s": round(prep, 3),
            "full_median_s": round(full, 3),
            "gemm_share": round(gemm / full, 3),
            "implied_gemm_gflops": round(flops / gemm / 1e9, 2),
            "prep_walls_s": s["prep_walls_s"],
            "full_walls_s": s["full_walls_s"],
        }
    s3, s9 = out["sides"]["sf3"], out["sides"]["sf9"]
    out["candidate_pair_ratio_sf9_over_sf3"] = round(
        s9["candidate_pairs"] / max(s3["candidate_pairs"], 1), 3
    )
    out["full_wall_ratio"] = round(
        s9["full_median_s"] / max(s3["full_median_s"], 1e-9), 3
    )
    print(json.dumps(out, indent=1))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(out, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()
