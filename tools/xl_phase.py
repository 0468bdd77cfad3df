"""Phase-decomposed XL exponent measurement (r13; XL_PHASE_r13.json).

The box's documented ambient drift (±30–100% between and within
processes, MEMORY/SCALE.md noise rules) scatters whole-join wall
ratios at the 700k→2.1M scale across 2.6–6.6 within one 7-rep A/B
(CLUSTERED_XL_r13.json).  The established adjudication pattern
(KERNEL_DECOMP_r11) is accumulator/phase decomposition: time each
phase of the defaults-only pruned join separately, per scale, in
alternating reps with JVM GC between them, and compose the ratio from
per-phase medians — shorter timed units interleave tighter and the
composition is robust to a single drifting window.

Phases per rep per scale (700k / 2.1M, d=64, 625-row clusters,
cluster count ∝ n — both sides in the hierarchical-fit regime):
  fit   = kmeans_centroids_hier wall (distributed per-parent training)
  prep  = _ivf_pruned_replicated[0].count(): fit + two-step assignment
          + driver plan + replication shuffle
  join  = full ivf_pruned_topk_join().count()
  assign_plan = prep − fit,  gemm = join − prep  (per-rep)

Also runs a 4-rep same-scale drift test (700k) with System.gc()
between reps: the first CLUSTERED_XL attempt WITHOUT JVM GC climbed
~2× across 16 XL joins (2.1M side 162→328 s) — accumulated
localCheckpoint blocks, reclaimed only when ContextCleaner sees the
JVM-side reference die.

Usage: python tools/xl_phase.py [--reps N] [--skip-drift] [--json OUT]
Run alone on the box (bench noise rules).
"""
import json, os, statistics, sys, time, gc

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawling_vectordb_llm_spark.operators.ivf import (
    _ivf_pruned_replicated, ivf_pruned_topk_join, kmeans_centroids_hier,
    adaptive_cell_count,
)
from crawling_vectordb_llm_spark.session import get_spark
from crawling_vectordb_llm_spark.sources.synthetic_embeddings import clustered_embeddings

TAU, K, SIGMA, RPC = 0.7, 5, 0.12, 625
SCALES = (700_000, 2_100_000)


def corpus(spark, n):
    df = (clustered_embeddings(spark, n, dim=64, k=n // RPC, sigma=SIGMA, partitions=64)
          .select("vec_id", "embedding").localCheckpoint())
    df.count()
    return df


def one_rep(spark, df, n):
    k = adaptive_cell_count(n)
    t0 = time.time()
    kmeans_centroids_hier(df, k, "embedding", seed=42, max_iter=8, n=n)
    t_fit = time.time() - t0
    t0 = time.time()
    prep = _ivf_pruned_replicated(df, TAU, "vec_id", "embedding", None, 42, 65_536, None, {})
    prep[0].count()
    t_prep = time.time() - t0
    t0 = time.time()
    ivf_pruned_topk_join(df, tau=TAU, k=K, n_cells=None).count()
    t_join = time.time() - t0
    spark.catalog.clearCache(); gc.collect()
    spark.sparkContext._jvm.System.gc()
    return {"fit": round(t_fit, 1), "prep": round(t_prep, 1),
            "join": round(t_join, 1),
            "assign_plan": round(t_prep - t_fit, 1),
            "gemm": round(t_join - t_prep, 1)}


def main():
    args = sys.argv[1:]
    reps, skip_drift, json_out = 3, False, None
    while args:
        if args[0] == "--reps":
            reps, args = int(args[1]), args[2:]
        elif args[0] == "--skip-drift":
            skip_drift, args = True, args[1:]
        elif args[0] == "--json":
            json_out, args = args[1], args[2:]
        else:
            raise SystemExit(f"unknown flag {args[0]!r}")
    spark = get_spark("xl_phase")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    dfs = {n: corpus(spark, n) for n in SCALES}
    per = {n: [] for n in SCALES}
    for n in SCALES:  # cold rep per side, discarded
        one_rep(spark, dfs[n], n)
    for rep in range(reps):
        order = SCALES if rep % 2 == 0 else SCALES[::-1]
        for n in order:
            r = one_rep(spark, dfs[n], n)
            per[n].append(r)
            print(f"rep {rep} n={n}: {r}", flush=True)
    med = statistics.median
    phases = {}
    for n in SCALES:
        phases[n] = {ph: med(r[ph] for r in per[n])
                     for ph in ("fit", "prep", "join", "assign_plan", "gemm")}
        phases[n]["k_cells"] = adaptive_cell_count(n)
        phases[n]["reps"] = per[n]
    lo, hi = SCALES
    import math
    comp_ratio = (phases[hi]["fit"] + phases[hi]["assign_plan"] + phases[hi]["gemm"]) / (
        phases[lo]["fit"] + phases[lo]["assign_plan"] + phases[lo]["gemm"])
    out = {
        "protocol": f"1 cold + {reps} phase-decomposed reps/side, alternating order, "
                    "JVM GC between reps; per-phase medians; composed ratio = "
                    "sum of hi-side phase medians / sum of lo-side phase medians",
        "phases": {str(n): phases[n] for n in SCALES},
        "phase_ratios_hi_over_lo": {
            ph: round(phases[hi][ph] / max(phases[lo][ph], 1e-9), 3)
            for ph in ("fit", "assign_plan", "gemm", "join")
        },
        "composed_wall_ratio": round(comp_ratio, 3),
        "composed_exponent": round(math.log(comp_ratio) / math.log(hi / lo), 3),
        "join_median_ratio": round(phases[hi]["join"] / phases[lo]["join"], 3),
        "join_median_exponent": round(
            math.log(phases[hi]["join"] / phases[lo]["join"]) / math.log(hi / lo), 3),
    }
    if not skip_drift:
        walls = []
        df = dfs[700_000]
        for rep in range(4):
            t0 = time.time()
            ivf_pruned_topk_join(df, tau=TAU, k=K, n_cells=None).count()
            walls.append(round(time.time() - t0, 1))
            spark.catalog.clearCache(); gc.collect()
            spark.sparkContext._jvm.System.gc(); time.sleep(2)
            print("drift rep", rep, walls[-1], flush=True)
        out["drift_test"] = {
            "n": 700_000, "walls_s_with_jvm_gc": walls,
            "note": "no upward trend with JVM GC between reps; the first "
                    "CLUSTERED_XL attempt without it climbed 162->328 s "
                    "across 16 XL joins (accumulated localCheckpoint blocks)"}
    print(json.dumps(out))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(out, f, indent=1)


main()
