"""Clustered-geometry THIRD SCALE POINT for the bounded similarity join
(r11, completes the EXP_SF9_DIAG_r11.json diagnosis).

EXP_SF9_DIAG_r11.json proved the isotropic sf3->sf9 blow-up (e 1.41-1.83,
AB_EXPONENT_SF9_r11.json) is the full pairwise GEMM: admit_rate 1.0 at
both scales, candidate ratio exactly 9.0 = n^2, identical implied
GFLOPS — the information cost of exact recall-1.0 top-k on
structure-free geometry, not a harness or operator defect.  This tool
measures the SAME operator over the SAME 60k->180k step on a corpus
with cluster structure — the geometry real embedding encoders produce
and the regime the angular prune exists for — at the published
clustered operating point (tools/clustered_bench.py: sigma=0.12,
tau=0.7, n_cells ~ 2x true clusters, sources/synthetic_embeddings.py
mixture-of-Gaussians on the sphere).

Scale law under test: with cluster COUNT proportional to n (constant
~625-row clusters — corpus growth adds topics, not bigger topics),
admitted candidate volume is ~n x cluster_size (the diagonal blocks;
cross-cluster cell pairs fail the triangle bound), so the exact
bounded join should run at marginal exponent ~1 where the isotropic
corpus runs at ~2.  Reports admit stats at both scales plus the
interleaved wall ratio (ab_bench discipline: alternating order, median
of per-rep ratios; e = ln(ratio)/ln(3)).

Usage:  python tools/clustered_sf9_ab.py [--reps N] [--json OUT]
Run alone on the box (bench noise rules, MEMORY.md).
"""

from __future__ import annotations

import gc
import json
import math
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
from crawling_vectordb_llm_spark.sources.synthetic_embeddings import (
    clustered_embeddings,
)

TAU, K = 0.7, 5          # clustered_bench.py's published clustered regime
SIGMA = 0.12             # dim-normalized in the generator: same angular
                         # cluster radius (~arctan(sigma)) at any dim
ROWS_PER_CLUSTER = 625   # matches clustered_bench: 40k rows / 64 clusters
SCALES = (60_000, 180_000)


def _corpus(spark, n: int, dim: int):
    k_true = n // ROWS_PER_CLUSTER
    df = (
        clustered_embeddings(
            spark, n, dim=dim, k=k_true, sigma=SIGMA, partitions=32
        )
        .select("vec_id", "embedding")
        .localCheckpoint()
    )
    df.count()
    return df, k_true


def _run(df, n_cells: "int | None") -> float:
    t0 = time.time()
    ivf_pruned_topk_join(df, tau=TAU, k=K, n_cells=n_cells).count()
    return time.time() - t0


def main() -> None:
    global SCALES
    args = sys.argv[1:]
    reps, json_out, cells_mode, dim = 5, None, "default", 64
    while args and args[0].startswith("--"):
        if args[0] == "--reps":
            reps, args = int(args[1]), args[2:]
        elif args[0] == "--json":
            json_out, args = args[1], args[2:]
        elif args[0] == "--scales":
            # --scales 700000,2100000 (r13, VERDICT r12 #2): the same
            # defaults-only protocol at a scale where adaptive_cell_count
            # exceeds the old 2048 flat cap, exercising the hierarchical
            # fit + two-step assignment regime
            SCALES = tuple(int(x) for x in args[1].split(","))
            assert len(SCALES) == 2 and SCALES[0] < SCALES[1]
            args = args[2:]
        elif args[0] == "--dim":
            # --dim 1024 (r12, VERDICT r11 #4): the clustered point at
            # the reference's operating dimension — completes the
            # geometry x dimension exponent matrix (AB_DIM_r11.json's
            # d=1024 consumer row was isotropic-only) and tests the
            # SCALE.md claim that angular concentration tightens the
            # prune at high d.
            dim, args = int(args[1]), args[2:]
        elif args[0] == "--cells":
            # "default" (r12): n_cells=None -> adaptive_cell_count + the
            # measured-cost grid planner, the engine's out-of-the-box
            # behavior (VERDICT r11 #1 done-condition: the clustered
            # exponent must hold with DEFAULTS, not hand-set cells).
            # "handset" reproduces the r11 protocol (2x true clusters).
            cells_mode, args = args[1], args[2:]
        else:
            raise SystemExit(f"unknown flag {args[0]!r}")
    spark = get_spark("clustered_sf9_ab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    sides = {}
    for n in SCALES:
        df, k_true = _corpus(spark, n, dim)
        n_cells = None if cells_mode == "default" else 2 * k_true
        stats: dict = {}
        prep = _ivf_pruned_replicated(
            df, TAU, "vec_id", "embedding", n_cells, 42, 65_536, None, stats
        )
        prep[0].count()
        sides[n] = {"df": df, "n_cells": n_cells, "k_true": k_true,
                    "admit": stats, "walls_s": []}
        print(f"n={n}: clusters={k_true} n_cells={n_cells} "
              f"executed={stats.get('executed_blocks')} "
              f"admit_blocks={stats['admissible_blocks']}/"
              f"{stats['total_blocks']} "
              f"admit_rate={stats['admit_rate']:.5f}", flush=True)
    a, b = (sides[s] for s in SCALES)
    _run(a["df"], a["n_cells"])  # cold
    _run(b["df"], b["n_cells"])
    for rep in range(reps):
        order = (a, b) if rep % 2 == 0 else (b, a)
        for s in order:
            s["walls_s"].append(round(_run(s["df"], s["n_cells"]), 3))
        spark.catalog.clearCache()
        gc.collect()
        # JVM GC between reps (r13): each join call localCheckpoints a
        # fresh ~n-row assignment RDD whose blocks are reclaimed only
        # when ContextCleaner sees the JVM-side reference die — without
        # this, 16 consecutive XL-scale joins accumulate ~25 GB of
        # checkpoint blocks and the walls climb ~2x across the run
        # (first CLUSTERED_XL_r13 attempt: 2.1M side 162->328 s; the
        # 4-rep drift test with System.gc() showed no trend).
        spark.sparkContext._jvm.System.gc()
    med = statistics.median
    ratios = sorted(wb / max(wa, 1e-9)
                    for wa, wb in zip(a["walls_s"], b["walls_s"]))
    ratio = med(ratios)
    out = {
        "tau": TAU, "k": K, "sigma": SIGMA, "cells_mode": cells_mode,
        "dim": dim,
        "rows_per_cluster": ROWS_PER_CLUSTER,
        "scales": list(SCALES),
        "protocol": f"interleaved {SCALES[0]}<->{SCALES[1]}, alternating "
        f"order, 1 cold rep/side, {reps} timed reps/side, JVM GC "
        "between reps, median of per-rep ratios",
        "sides": {
            str(n): {
                "n_cells": sides[n]["n_cells"],
                "k_true": sides[n]["k_true"],
                "admit": sides[n]["admit"],
                "median_s": round(med(sides[n]["walls_s"]), 3),
                "walls_s": sides[n]["walls_s"],
            }
            for n in SCALES
        },
        "wall_ratio_hi_over_lo": round(ratio, 3),
        "marginal_exponent": round(
            math.log(ratio) / math.log(SCALES[1] / SCALES[0]), 3
        ),
        "isotropic_reference": "AB_EXPONENT_SF9_r11.json (e 1.41-1.83), "
        "EXP_SF9_DIAG_r11.json (admit_rate 1.0, flop-bound)",
    }
    print(json.dumps(out))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(out, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()
