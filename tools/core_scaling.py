"""Core-scaling evidence at sf1 (VERDICT r13 #7).

At sf0.1 the per-query bench walls sit at the per-stage scheduling floor,
so 8-core and 32-core runs measure the same thing and parallel wins are
invisible (PERF_r13 scaling block: every ratio ~1 except knn_topk).  This
tool times the most expensive headline queries on the FRESH-ENTROPY sf1
fixture (tools/sf1_fresh.py — 10x data, duplicate rate held constant) at
32 and at 8 cores, in clean subprocess JVMs, and writes the per-query
core ratios to SCALING_SF1_r{N}.json — the artifact that separates real
parallel speedups from scheduling-floor noise for this and future rounds.

  python tools/core_scaling.py            # build fixture if absent, run both
                                          #   core counts, write artifact

Run alone on the box (bench noise rules: cross-process walls drift, so
the 8 vs 32 comparison is ratio-of-medians from back-to-back runs and is
only read for ORDER-OF-MAGNITUDE core sensitivity, not percent deltas).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the queries that cost the most at sf0.1 (round-14 baseline profile),
# plus knn_topk — the one query PERF_r13 showed genuinely core-sensitive
QUERIES = [
    "minhash_lsh_near_dup",
    "near_dup_pipeline_clusters",
    "ivf_pruned_near_dup",
    "ann_ivfpq_topk",
    "kcore_spam_filter",
    "triangle_count",
    "tpch_q11_shape",
    "interval_overlap_join",
    "rag_search_pipeline",
    "bigram_logprob_score",
    "knn_topk",
]


def _run_child(sf_dir: str, names: list[str]) -> None:
    """Child mode: time each query (1 cold + 3 warm, median) and print one
    JSON line.  SPARK_GRAFT_CPUS is read by get_spark exactly as bench.py
    does — the measurement respects the driver's core-count contract."""
    import gc
    import time

    from crawling_vectordb_llm_spark.session import get_spark
    from crawling_vectordb_llm_spark.suite import QUERIES as Q

    spark = get_spark("core_scaling")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    out = {}
    for name in names:
        fn = Q[name]

        def one() -> float:
            t0 = time.time()
            fn(spark, sf_dir).count()
            return time.time() - t0

        one()  # cold
        warm = sorted(one() for _ in range(3))
        out[name] = round(warm[1], 3)
        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()
    print(json.dumps(out), flush=True)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "_run":
        _run_child(sys.argv[2], sys.argv[3:])
        return

    from tools.sf1_fresh import BIG as FRESH1, build  # noqa: E402

    if not os.path.isdir(FRESH1):
        print("building fresh sf1 fixture...", flush=True)
        build()

    results: dict[str, dict] = {}
    for cpus in (32, 8):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "_run", FRESH1]
            + QUERIES,
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        results[str(cpus)] = json.loads(proc.stdout.strip().splitlines()[-1])
        print(f"cpus={cpus}: {results[str(cpus)]}", flush=True)

    per_query = {
        n: {
            "c32_s": results["32"][n],
            "c8_s": results["8"][n],
            "ratio_8_over_32": round(results["8"][n] / results["32"][n], 2),
        }
        for n in QUERIES
    }
    rnd = os.environ.get("SPARK_GRAFT_ROUND", "14")
    payload = {
        "sf_dir": FRESH1,
        "cpus": [32, 8],
        "stat": "median_of_3_warm_after_1_cold, clean JVM per core count",
        "per_query": per_query,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"SCALING_SF1_r{int(rnd):02d}.json",
    )
    with open(path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.write("\n")
    print("wrote", path)


if __name__ == "__main__":
    main()
