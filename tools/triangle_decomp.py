"""Decompose `triangle_count`'s scaling (VERDICT r8 #2 / r9 #4): is the
measured marginal exponent plan cost, or combinatorial growth of the
wedge/triangle volume itself?

The bounded k-NN graph has ≤ n·k directed edges (linear by
construction), but the degree-oriented wedge join's INPUT is wedges
(Σ_v deg(v)·(deg(v)−1)/2) and its OUTPUT is triangles — both of which
can legitimately grow faster than n when scale densifies neighborhoods
(more near-duplicates of each item exist in a larger corpus, so more
of each node's top-k lands inside its own cluster and closes
triangles).  A wall exponent that TRACKS the wedge/triangle exponent is
the operator doing proportionally more required work, not a plan
defect; a wall exponent ABOVE it would be.

Protocol: at each fixture scale the bounded edge graph is materialized
ONCE (localCheckpoint, outside all timings), its wedge/triangle counts
are computed exactly, and the `triangle_counts` stage alone is timed
over the pinned graphs INTERLEAVED with alternating order (ambient
drift cancels in the per-rep ratio — tools/ab_bench.py discipline).
Exponents are ln(big/small)/ln(growth) for walls AND for each volume.

Usage:
  python tools/triangle_decomp.py [--reps N] [--json OUT] SMALL_DIR BIG_DIR GROWTH

Run alone on the box (bench noise rules, MEMORY.md).
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crawling_vectordb_llm_spark.operators.components import triangle_counts
from crawling_vectordb_llm_spark.session import get_spark
from crawling_vectordb_llm_spark.suite.dedup_suite import _bounded_edges


def _graph_stats(edges) -> dict:
    """Exact wedge/triangle volumes over the pinned edge list."""
    n_edges = edges.count()
    sym = edges.union(
        edges.select(F.col("b_id").alias("a_id"), F.col("a_id").alias("b_id"))
    ).distinct()
    deg = sym.groupBy("a_id").agg(F.count(F.lit(1)).alias("deg"))
    n_wedges = deg.agg(
        F.sum(F.col("deg") * (F.col("deg") - 1) / 2).alias("w")
    ).collect()[0]["w"]
    tri = triangle_counts(edges)
    agg = tri.agg(
        F.sum("n_triangles").alias("participations"),
        F.count(F.lit(1)).alias("nodes_in_triangles"),
    ).collect()[0]
    return {
        "n_edges": n_edges,
        "n_wedges": int(n_wedges),
        # each triangle contributes 3 node-participations
        "n_triangles": int(agg["participations"]) // 3,
        "output_rows": int(agg["nodes_in_triangles"]),
    }


def main() -> None:
    args = sys.argv[1:]
    reps, json_out = 5, None
    while args and args[0].startswith("--"):
        if args[0] == "--reps":
            reps = int(args[1])
        elif args[0] == "--json":
            json_out = args[1]
        else:
            raise SystemExit(f"unknown flag {args[0]!r}")
        args = args[2:]
    if len(args) != 3:
        raise SystemExit(__doc__)
    small_dir, big_dir, growth = args[0], args[1], float(args[2])
    spark = get_spark("triangle_decomp")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up

    graphs, stats = {}, {}
    for label, d in (("small", small_dir), ("big", big_dir)):
        emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
        edges = _bounded_edges(emb).select("a_id", "b_id").localCheckpoint()
        graphs[label] = edges
        stats[label] = {"n_vectors": emb.count(), **_graph_stats(edges)}
        print(f"{label} ({d}): {stats[label]}", flush=True)

    def run(edges) -> float:
        t0 = time.time()
        triangle_counts(edges).count()
        return time.time() - t0

    run(graphs["small"])  # cold, uncounted
    run(graphs["big"])
    walls = {"small": [], "big": []}
    for rep in range(reps):
        order = ("small", "big") if rep % 2 == 0 else ("big", "small")
        for side in order:
            walls[side].append(run(graphs[side]))
    ratios = [b / max(a, 1e-9) for a, b in zip(walls["small"], walls["big"])]
    med_ratio = statistics.median(ratios)

    def expo(key: str) -> float:
        return round(
            math.log(max(stats["big"][key], 1) / max(stats["small"][key], 1))
            / math.log(growth),
            3,
        )

    payload = {
        "small_dir": small_dir,
        "big_dir": big_dir,
        "data_growth": growth,
        "reps": reps,
        "mode": "triangle_counts stage alone over pre-materialized bounded "
        "edge graphs, reps interleaved with alternating order",
        "stats": stats,
        "volume_exponents": {k: expo(k) for k in
                             ("n_edges", "n_wedges", "n_triangles",
                              "output_rows")},
        "small_median_s": round(statistics.median(walls["small"]), 3),
        "big_median_s": round(statistics.median(walls["big"]), 3),
        "big_over_small_ratio_median": round(med_ratio, 3),
        "wall_exponent": round(math.log(med_ratio) / math.log(growth), 3),
        "small_walls_s": [round(w, 3) for w in walls["small"]],
        "big_walls_s": [round(w, 3) for w in walls["big"]],
    }
    print(json.dumps(payload, indent=1))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
            f.write("\n")


if __name__ == "__main__":
    main()
