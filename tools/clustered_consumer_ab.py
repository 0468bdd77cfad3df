"""Clustered-geometry third scale point for a DOWNSTREAM consumer
(r12, VERDICT r11 #3): CLUSTERED_SF9_r11.json measured the raw bounded
join only; this tool runs the FULL `near_dup_pipeline_clusters` shape —
IVF-pruned bounded top-k join (ENGINE DEFAULTS: adaptive cells + grid
planner, no hand-set n_cells) → union-symmetrize → alternating-star
connected components → cluster labels + sizes — end-to-end over the
same 60k→180k clustered step (sigma=0.12, tau=0.7, 625-row clusters,
sources/synthetic_embeddings.py mixture-of-Gaussians on the sphere).

Law under test: with cluster count ∝ n the candidate/edge volume is
~n·cluster_size, and TRIANGLE_DECOMP_r10.json showed the CC/label
stages ~linear in edges — so the whole consumer should hold marginal
exponent ≤ ~1.15 where the isotropic fixtures ran 1.41–1.83
(AB_EXPONENT_SF9_r11.json).

Usage:  python tools/clustered_consumer_ab.py [--reps N] [--json OUT]
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

from pyspark.sql import Window
from pyspark.sql import functions as F

from crawling_vectordb_llm_spark.operators.components import (
    connected_components,
)
from crawling_vectordb_llm_spark.operators.ivf import ivf_pruned_topk_join
from crawling_vectordb_llm_spark.operators.knn import topk_edges
from crawling_vectordb_llm_spark.session import get_spark
from crawling_vectordb_llm_spark.sources.synthetic_embeddings import (
    clustered_embeddings,
)

TAU, K = 0.7, 5          # the published clustered operating point
SIGMA = 0.12
ROWS_PER_CLUSTER = 625
SCALES = (60_000, 180_000)


def _corpus(spark, n: int):
    k_true = n // ROWS_PER_CLUSTER
    df = (
        clustered_embeddings(spark, n, k=k_true, sigma=SIGMA, partitions=32)
        .select("vec_id", "embedding")
        .localCheckpoint()
    )
    df.count()
    return df, k_true


def _pipeline(df):
    # the near_dup_pipeline_clusters suite shape (dedup_suite.py), with
    # the join on engine DEFAULTS — adaptive cells, measured-cost planner
    directed = ivf_pruned_topk_join(df, tau=TAU, k=K)
    pairs = topk_edges(directed).select("a_id", "b_id")
    labels = connected_components(pairs).withColumnRenamed("node", "vec_id")
    out = (
        df.select("vec_id")
        .join(labels, "vec_id", "left")
        .select(
            "vec_id", F.coalesce("component", "vec_id").alias("cluster_id")
        )
        .select(
            "vec_id",
            "cluster_id",
            F.count(F.lit(1))
            .over(Window.partitionBy("cluster_id"))
            .alias("cluster_size"),
        )
    )
    return out


def _run(df) -> tuple[float, int]:
    t0 = time.time()
    n_rows = _pipeline(df).count()
    return time.time() - t0, n_rows


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
    spark = get_spark("clustered_consumer_ab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    sides = {}
    for n in SCALES:
        df, k_true = _corpus(spark, n)
        sides[n] = {"df": df, "k_true": k_true, "walls_s": []}
    a, b = (sides[s] for s in SCALES)
    wa, ra = _run(a["df"])  # cold
    wb, rb = _run(b["df"])
    a["out_rows"], b["out_rows"] = ra, rb
    print(f"cold: 60k {wa:.1f}s/{ra} rows, 180k {wb:.1f}s/{rb} rows",
          flush=True)
    for rep in range(reps):
        order = (a, b) if rep % 2 == 0 else (b, a)
        for s in order:
            s["walls_s"].append(round(_run(s["df"])[0], 3))
        spark.catalog.clearCache()
        gc.collect()
    med = statistics.median
    ratios = sorted(w2 / max(w1, 1e-9)
                    for w1, w2 in zip(a["walls_s"], b["walls_s"]))
    ratio = med(ratios)
    out = {
        "consumer": "near_dup_pipeline_clusters (defaults: adaptive cells)",
        "tau": TAU, "k": K, "sigma": SIGMA,
        "rows_per_cluster": ROWS_PER_CLUSTER,
        "protocol": "interleaved 60k<->180k, alternating order, 1 cold "
        f"rep/side, {reps} timed reps/side, median of per-rep ratios",
        "sides": {
            str(n): {
                "k_true": sides[n]["k_true"],
                "out_rows": sides[n]["out_rows"],
                "median_s": round(med(sides[n]["walls_s"]), 3),
                "walls_s": sides[n]["walls_s"],
            }
            for n in SCALES
        },
        "wall_ratio_180k_over_60k": round(ratio, 3),
        "marginal_exponent": round(math.log(ratio) / math.log(3), 3),
        "references": "CLUSTERED_SF9_r11.json (raw join e=1.056), "
        "TRIANGLE_DECOMP_r10.json (CC stages linear in edges), "
        "AB_EXPONENT_SF9_r11.json (isotropic e 1.41-1.83)",
    }
    print(json.dumps(out))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(out, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()
