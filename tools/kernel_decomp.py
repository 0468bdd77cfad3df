"""Per-task kernel decomposition of the bounded-join wall (r11).

GEMM_PREFILTER_AB_r11.json's first 5-rep sf9 sample measured off/on =
0.97x while sf3 measured 1.99x in the same process — implausible if the
kernel dominates both.  This tool settles it with ACCUMULATORS instead
of walls: the `_topk_pair` task is wrapped to time (a) the
Arrow->numpy conversion and (b) the `_topk_tau_gemm` kernel call,
summed across all 136 block tasks into Spark accumulators, for
prefilter on and off at both scales in one process.

What it showed (checked-in artifact KERNEL_DECOMP_r11.json):
  - kernel core-seconds dominate the task time at BOTH scales (sf9
    f64: 2178 core-s across 136 tasks ~ 16 s/task, vs ~1.7 s for the
    same block single-threaded — a ~10x concurrency collapse: the
    d=64 skinny GEMM is MEMORY-BANDWIDTH bound when 32 workers stream
    score chunks simultaneously, so flops/s per core is set by DRAM,
    not the FPU; core-s vary run-to-run with that contention),
  - the f32 prefilter cuts kernel core-seconds 3.2x (sf9, 2178->684)
    to 10.6x (sf3, 248->23) and the directed-build wall 2.6x (sf9,
    84->32 s) to 3.8x (sf3, 13.4->3.5 s) — the first 5-rep sf9 wall
    A/B read 0.97x because 45-106 s reps drown in ambient drift (the
    7-rep re-run in GEMM_PREFILTER_AB_r11.json supersedes it),
  - conversion cost is negligible (<1% of kernel), and the directed
    intermediate (n x ~(C+1) x k rows) is linear in n.

Usage:  python tools/kernel_decomp.py [--json OUT]
Run alone on the box (bench noise rules, MEMORY.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from crawling_vectordb_llm_spark.operators import ivf as I
from crawling_vectordb_llm_spark.operators.knn import _topk_tau_gemm
from crawling_vectordb_llm_spark.operators.topk import grouped_topk
from crawling_vectordb_llm_spark.session import get_spark

TAU, K, N_CELLS = 0.35, 5, 16
FIXTURES = (
    ("sf3", os.environ.get("SPARK_GRAFT_SF3F_DIR", "/tmp/sf3_fresh")),
    ("sf9", os.environ.get("SPARK_GRAFT_SF9F_DIR", "/tmp/sf9_fresh")),
)


def main() -> None:
    args = sys.argv[1:]
    json_out = None
    while args and args[0].startswith("--"):
        if args[0] == "--json":
            json_out, args = args[1], args[2:]
        else:
            raise SystemExit(f"unknown flag {args[0]!r}")
    spark = get_spark("kernel_decomp")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    sc = spark.sparkContext
    out = {"tau": TAU, "k": K, "n_cells": N_CELLS,
           "method": "Spark accumulators around the _topk_pair task body: "
           "conversion vs kernel core-seconds, one run per side per "
           "fixture in one process", "runs": []}
    for name, path in FIXTURES:
        emb = spark.read.parquet(os.path.join(path, "embeddings.parquet")) \
            .select("vec_id", "embedding").localCheckpoint()
        emb.count()
        for pf in (False, True):
            acc_kernel = sc.accumulator(0.0)
            acc_conv = sc.accumulator(0.0)
            replicated, diag_pks, _ = I._ivf_pruned_replicated(
                emb, TAU, "vec_id", "embedding", N_CELLS, 42, 65_536, None
            )
            bc_diag = sc.broadcast(diag_pks)

            def _make(_pf, _bc, _ak, _ac):
                def _topk_pair(key, pdf):
                    t0 = time.time()
                    diagonal = int(key[0]) in _bc.value
                    a = pdf[pdf["__role"] == "a"]
                    b = a if diagonal else pdf[pdf["__role"] == "b"]
                    aid = a["__id"].to_numpy()
                    av = np.array(list(a["__v"]), dtype=np.float64)
                    bid = b["__id"].to_numpy()
                    bv = np.array(list(b["__v"]), dtype=np.float64)
                    t1 = time.time()
                    o = _topk_tau_gemm(aid, av, bid, bv, TAU, K, 2048,
                                       diagonal, prefilter=_pf)
                    _ac.add(t1 - t0)
                    _ak.add(time.time() - t1)
                    return pd.DataFrame(
                        {"item_id": o[0], "neighbor_id": o[1], "score": o[2]}
                    )
                return _topk_pair

            _topk_pair = _make(pf, bc_diag, acc_kernel, acc_conv)

            directed = replicated.groupBy("__pk").applyInPandas(
                _topk_pair,
                schema="item_id long, neighbor_id long, score double",
            )
            t0 = time.time()
            n_directed = directed.count()
            t_directed = time.time() - t0
            run = {
                "fixture": name,
                "prefilter": pf,
                "directed_wall_s": round(t_directed, 1),
                "kernel_core_s": round(acc_kernel.value, 1),
                "conversion_core_s": round(acc_conv.value, 1),
                "directed_rows": n_directed,
            }
            out["runs"].append(run)
            print(run, flush=True)
    print(json.dumps(out))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(out, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()
