"""REPL_PAIR_COST sensitivity check (VERDICT r12 #5).

The grid planner's cost model is cand + REPL_PAIR_COST·repl with
REPL_PAIR_COST = 350, calibrated from ONE machine / ONE dimension
(EXP_SF9_DIAG_r11.json, sf9 d=64: 2.0e-6 s/replicated-row vs 5.8e-9
s/candidate-pair).  Two reasons the single-point calibration is safe,
both made durable here:

1. DIMENSION-INVARIANCE (analytic): a replicated row costs bytes ∝ d·8
   (Arrow ship + normalize) and a candidate pair costs flops ∝ d (one
   MAC per dim in the GEMM), so both sides of the ratio scale linearly
   with d and the ratio is dimension-free to first order.  A direct
   re-derivation from CLUSTERED_DIM1024_r12.json is DEGENERATE by
   construction: cand and repl both scale exactly 3.0× between its two
   sides (18.72M→56.16M pairs, 116,875→351,250 rows), so the 2×2 solve
   has no unique solution — the artifact can bound the ratio only
   through this sensitivity sweep, not a fit.

2. ARGMIN STABILITY (measured, this tool): on the actual planner
   inputs (counts/radii/admit reconstructed with the operator's own
   fit path at the published clustered and isotropic operating
   points), the chosen (granularity, grouping) must be unchanged for
   REPL_PAIR_COST anywhere in [0.5×, 2×] — the planner today mostly
   chooses between ladder regions separated by orders of magnitude in
   repl, so the slack is wide; this makes that claim checkable.

Usage:  python tools/repl_cost_sens.py [--n N] [--json OUT]
Value-only (no timing) — no bench noise discipline needed.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawling_vectordb_llm_spark.operators import ivf as I
from crawling_vectordb_llm_spark.session import get_spark
from crawling_vectordb_llm_spark.sources.synthetic_embeddings import (
    clustered_embeddings,
)

ROWS_PER_CLUSTER = 625
TAU = 0.7
MULTS = (0.25, 0.5, 1.0, 2.0, 4.0)


def _planner_inputs(spark, n: int, sigma: float):
    """counts/admit/p_floor exactly as _ivf_pruned_replicated builds them
    (same adaptive sizing, same in-call fit params, same seed), with the
    assignment replayed driver-side (n·d doubles ≤ ~31 MB at the probe
    scale — this is a planning-input reconstruction, not the join)."""
    df = (
        clustered_embeddings(
            spark, n, dim=64, k=max(1, n // ROWS_PER_CLUSTER),
            sigma=sigma, partitions=32,
        )
        .select("vec_id", "embedding")
        .localCheckpoint()
    )
    df.count()
    k = I.adaptive_cell_count(n)
    cents = I.kmeans_centroids(
        df, k, "embedding", seed=42, max_iter=8,
        sample_limit=max(10_000, 64 * k),
    )
    rows = df.select("embedding").collect()
    mat = np.array([r[0] for r in rows], dtype=np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    sims = mat @ cents.T
    cid = np.argmax(sims, axis=1)
    theta = np.arccos(np.clip(sims[np.arange(len(cid)), cid], -1.0, 1.0))
    cells = np.unique(cid)
    radii = np.array([theta[cid == c].max() for c in cells])
    counts = np.array([(cid == c).sum() for c in cells], dtype=np.float64)
    cc = np.arccos(np.clip(cents @ cents.T, -1.0, 1.0))
    theta_tau = float(np.arccos(np.clip(TAU, -1.0, 1.0)))
    admit = (
        cc[np.ix_(cells, cells)] - radii[:, None] - radii[None, :]
        <= theta_tau + 1e-9
    )
    p_floor = I._grid_p_floor(n, 65_536, spark)
    return counts, admit, p_floor


def main() -> None:
    args = sys.argv[1:]
    n, json_out = 60_000, None
    while args and args[0].startswith("--"):
        if args[0] == "--n":
            n, args = int(args[1]), args[2:]
        elif args[0] == "--json":
            json_out, args = args[1], args[2:]
        else:
            raise SystemExit(f"unknown flag {args[0]!r}")
    spark = get_spark("repl_cost_sens")
    base = I.REPL_PAIR_COST
    out: dict = {"n": n, "base_repl_pair_cost": base, "geometries": {}}
    for geom, sigma in (("clustered", 0.12), ("isotropic", 4.0)):
        counts, admit, p_floor = _planner_inputs(spark, n, sigma)
        rows = []
        for mult in MULTS:
            I.REPL_PAIR_COST = base * mult
            try:
                group, P, st = I._plan_cell_grid(
                    counts, admit, 65_536, p_floor, seed=42
                )
            finally:
                I.REPL_PAIR_COST = base
            rows.append(
                {
                    "mult": mult,
                    "repl_pair_cost": base * mult,
                    "chosen_P": int(P),
                    "grouping": st["plan_grouping"],
                    "cand": st["plan_candidate_pairs"],
                    "repl": st["plan_replicated_rows"],
                }
            )
            print(f"{geom} x{mult}: P={P} {st['plan_grouping']}", flush=True)
        within_2x = {r["mult"]: (r["chosen_P"], r["grouping"]) for r in rows
                     if 0.5 <= r["mult"] <= 2.0}
        stable = len(set(within_2x.values())) == 1
        out["geometries"][geom] = {
            "fine_cells": int(len(counts)),
            "p_floor": int(p_floor),
            "sweep": rows,
            "argmin_stable_within_2x": stable,
        }
    out["argmin_stable_within_2x"] = all(
        g["argmin_stable_within_2x"] for g in out["geometries"].values()
    )
    print(json.dumps(out))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(out, f, indent=1)
            f.write("\n")
    raise SystemExit(0 if out["argmin_stable_within_2x"] else 1)


if __name__ == "__main__":
    main()
