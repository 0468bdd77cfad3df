"""Interleaved A/B query bench — drift-immune round-over-round ratios
(VERDICT r6 #2).

The box's ambient load drifts ±30–100% BETWEEN runs (SCALE.md), so
comparing query walls from two separate bench processes measures the
drift as much as the code.  This tool times two registry queries in ONE
process with their reps INTERLEAVED (A,B,A,B,…): any load spike hits
adjacent A and B reps alike, so the A/B ratio cancels ambient drift to
first order.  Use it for every "X is now faster than Y" claim — e.g.
the bounded top-k consumers vs their `_allpairs` variants.

Usage:
  python tools/ab_bench.py [--reps N] [--json OUT] SF_DIR A:B [A2:B2 ...]

Each side is `query` or `query@/fixture/dir` (default dir = SF_DIR), so
the SAME query can be interleaved across two scales in one process —
the drift-immune way to measure a scaling exponent (r8): pair
`q@/tmp/sf1_fresh:q@/tmp/sf3_fresh` and e = ln(B/A ratio)/ln(3), with
ambient load canceling in the per-rep ratio exactly as for A/B of two
queries.

Each pair runs 1 untimed cold rep per side (plan compile + cache warm),
then N interleaved timed reps (default 5).  Output: a markdown table +
one JSON line with per-side medians, the median of per-rep ratios, and
all raw walls.
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawling_vectordb_llm_spark.session import get_spark
from crawling_vectordb_llm_spark.suite import QUERIES


def _run(fn, spark, sf_dir: str) -> float:
    t0 = time.time()
    fn(spark, sf_dir).count()
    return time.time() - t0


def _reap(spark) -> None:
    spark.catalog.clearCache()
    gc.collect()
    spark.sparkContext._jvm.System.gc()


def _side(spec: str, default_dir: str) -> tuple[str, str]:
    """'query' or 'query@/dir' -> (query_name, fixture_dir)."""
    name, _, d = spec.partition("@")
    return name, (d or default_dir)


def ab_pair(spark, sf_dir: str, a: str, b: str, reps: int) -> dict:
    a, dir_a = _side(a, sf_dir)
    b, dir_b = _side(b, sf_dir)
    fa, fb = QUERIES[a], QUERIES[b]
    _run(fa, spark, dir_a)  # cold, uncounted
    _run(fb, spark, dir_b)
    _reap(spark)
    walls_a, walls_b = [], []
    for rep in range(reps):
        # Alternate A,B / B,A each rep so position effects (post-GC cold
        # start, page-cache warmth, JIT drift) hit both sides symmetrically
        # instead of biasing the per-rep ratio (ADVICE r7).
        if rep % 2 == 0:
            walls_a.append(_run(fa, spark, dir_a))
            walls_b.append(_run(fb, spark, dir_b))
        else:
            walls_b.append(_run(fb, spark, dir_b))
            walls_a.append(_run(fa, spark, dir_a))
        _reap(spark)
    med = statistics.median
    ratios = sorted(wb / max(wa, 1e-9) for wa, wb in zip(walls_a, walls_b))
    return {
        "a": a,
        "b": b,
        "a_dir": dir_a,
        "b_dir": dir_b,
        "a_median_s": round(med(walls_a), 3),
        "b_median_s": round(med(walls_b), 3),
        "b_over_a_median_ratio": round(med(ratios), 3),
        "a_walls_s": [round(w, 3) for w in walls_a],
        "b_walls_s": [round(w, 3) for w in walls_b],
        "reps": reps,
    }


def main() -> None:
    args = sys.argv[1:]
    reps, json_out = 5, None
    while args and args[0].startswith("--"):
        if args[0] == "--reps":
            reps = int(args[1])
            args = args[2:]
        elif args[0] == "--json":
            json_out = args[1]
            args = args[2:]
        else:
            raise SystemExit(f"unknown flag {args[0]!r}")
    if len(args) < 2:
        raise SystemExit(__doc__)
    sf_dir, pairs = args[0], args[1:]
    for p in pairs:
        for spec in p.split(":", 1):
            name = spec.partition("@")[0]
            if name not in QUERIES:
                raise SystemExit(f"unknown query {name!r}")
    spark = get_spark("ab_bench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up
    results = [ab_pair(spark, sf_dir, *p.split(":", 1), reps) for p in pairs]
    print("| A | B | A med s | B med s | B/A (med of per-rep ratios) |")
    print("|---|---|---|---|---|")
    for r in results:
        print(
            f"| {r['a']} | {r['b']} | {r['a_median_s']} | "
            f"{r['b_median_s']} | {r['b_over_a_median_ratio']}x |"
        )
    payload = {"sf_dir": sf_dir, "pairs": results}
    print(json.dumps(payload))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
            f.write("\n")


if __name__ == "__main__":
    main()
