"""Interleaved A/B of the r11 f32-prefilter GEMM kernel vs the pure-f64
kernel it replaces, on the REAL consumer workload at the third scale
point (VERDICT r10 #1 follow-through): `ivf_pruned_topk_join` over the
sf3 (60k) and sf9 (180k) fresh-entropy embeddings with
gemm_prefilter=True vs False — everything else identical, both sides in
ONE process, reps interleaved with alternating order (tools/ab_bench.py
discipline).

Why per-call and not an env flag: executor Python workers are reused,
so a module global flipped on the driver never reaches them — the flag
rides the applyInPandas closure instead (gemm_prefilter param).

Output equality is asserted per fixture once (count + full row
symmetric difference on sf3) before timing: the fast path must be
bit-identical, not just fast.

Usage:  python tools/gemm_prefilter_ab.py [--reps N] [--json OUT]
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

from crawling_vectordb_llm_spark.operators.ivf import ivf_pruned_topk_join
from crawling_vectordb_llm_spark.session import get_spark

TAU, K, N_CELLS = 0.35, 5, 16
SF3 = os.environ.get("SPARK_GRAFT_SF3F_DIR", "/tmp/sf3_fresh")
SF9 = os.environ.get("SPARK_GRAFT_SF9F_DIR", "/tmp/sf9_fresh")


def _emb(spark, d):
    df = spark.read.parquet(os.path.join(d, "embeddings.parquet")).select(
        "vec_id", "embedding"
    ).localCheckpoint()
    df.count()
    return df


def _run(df, prefilter: bool) -> float:
    t0 = time.time()
    ivf_pruned_topk_join(
        df, tau=TAU, k=K, n_cells=N_CELLS, gemm_prefilter=prefilter
    ).count()
    return time.time() - t0


def main() -> None:
    args = sys.argv[1:]
    reps, json_out = 5, None
    while args and args[0].startswith("--"):
        if args[0] == "--reps":
            reps, args = int(args[1]), args[2:]
        elif args[0] == "--json":
            json_out, args = args[1], args[2:]
        else:
            raise SystemExit(f"unknown flag {args[0]!r}")
    spark = get_spark("gemm_prefilter_ab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    out = {"tau": TAU, "k": K, "n_cells": N_CELLS, "reps": reps,
           "protocol": "interleaved prefilter-on/off, alternating order, "
           "1 cold rep/side, median of per-rep off/on ratios", "sides": {}}

    # output identity on the real sf3 AND sf9 fixtures before any timing
    # (r12, VERDICT r11 #2: the r11 artifact asserted sf3 only and left
    # sf9 identity to the margin math + unit test — close the gap with
    # the same full-row symmetric diff at the 180k scale point)
    for name, d in (("sf3", SF3), ("sf9", SF9)):
        emb_i = _emb(spark, d)
        on = ivf_pruned_topk_join(emb_i, tau=TAU, k=K, n_cells=N_CELLS,
                                  gemm_prefilter=True)
        off = ivf_pruned_topk_join(emb_i, tau=TAU, k=K, n_cells=N_CELLS,
                                   gemm_prefilter=False)
        diff = on.exceptAll(off).count() + off.exceptAll(on).count()
        out[f"{name}_output_symmetric_diff"] = diff
        assert diff == 0, f"prefilter output mismatch at {name}: {diff} rows"
        print(f"{name}: symmetric diff {diff}", flush=True)

    for name, d in (("sf3", SF3), ("sf9", SF9)):
        df = _emb(spark, d)
        _run(df, True)   # cold
        _run(df, False)
        walls_on, walls_off = [], []
        for rep in range(reps):
            if rep % 2 == 0:
                walls_on.append(_run(df, True))
                walls_off.append(_run(df, False))
            else:
                walls_off.append(_run(df, False))
                walls_on.append(_run(df, True))
            spark.catalog.clearCache()
            gc.collect()
        med = statistics.median
        ratios = sorted(o / max(n_, 1e-9) for n_, o in zip(walls_on, walls_off))
        out["sides"][name] = {
            "on_median_s": round(med(walls_on), 3),
            "off_median_s": round(med(walls_off), 3),
            "off_over_on_median_ratio": round(med(ratios), 3),
            "on_walls_s": [round(w, 3) for w in walls_on],
            "off_walls_s": [round(w, 3) for w in walls_off],
        }
        print(f"{name}: on {out['sides'][name]['on_median_s']}s "
              f"off {out['sides'][name]['off_median_s']}s "
              f"speedup {out['sides'][name]['off_over_on_median_ratio']}x",
              flush=True)
    print(json.dumps(out))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(out, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()
