"""Fixed-mode connected-components scaling measurement (r8).

The three-point bench measures `dedup_clusters` in its production
(adaptive) configuration, where the driver union-find handles graphs up
to `max_driver_edges`.  The 100 TB question is about the DISTRIBUTED
path specifically — the alternating large-star/small-star fixpoint that
billion-edge dup graphs land on — so this tool measures its slope at
FIXED mode: bounded k-NN graphs from two fixture scales are
materialized once (localCheckpoint, outside timing), then the
distributed fixpoint (max_driver_edges=0) is timed over both graphs
INTERLEAVED in one process (ambient drift cancels in the per-rep
ratio, same discipline as tools/ab_bench.py).

Usage:
  python tools/cc_mode_bench.py [--reps N] [--json OUT] SMALL_DIR BIG_DIR GROWTH

GROWTH is the data multiple between the dirs (e.g. 3 for sf1 -> sf3);
the reported exponent is ln(median ratio)/ln(GROWTH).

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

from crawling_vectordb_llm_spark.operators.components import connected_components
from crawling_vectordb_llm_spark.session import get_spark
from crawling_vectordb_llm_spark.suite.dedup_suite import _bounded_edges


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
    spark = get_spark("cc_mode_bench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up

    graphs = {}
    for label, d in (("small", small_dir), ("big", big_dir)):
        emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
        edges = _bounded_edges(emb).select("a_id", "b_id").localCheckpoint()
        graphs[label] = edges
        print(f"{label} ({d}): {edges.count()} bounded edges", flush=True)

    def run(edges) -> float:
        t0 = time.time()
        connected_components(edges, max_driver_edges=0).count()
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
    payload = {
        "small_dir": small_dir,
        "big_dir": big_dir,
        "data_growth": growth,
        "reps": reps,
        "mode": "distributed large-star/small-star (max_driver_edges=0), "
        "edge graphs pre-materialized, reps interleaved with alternating "
        "order",
        "small_median_s": round(statistics.median(walls["small"]), 3),
        "big_median_s": round(statistics.median(walls["big"]), 3),
        "big_over_small_ratio_median": round(med_ratio, 3),
        "exponent": round(math.log(med_ratio) / math.log(growth), 3),
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
