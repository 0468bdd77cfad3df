"""Interleaved A/B for transformWithStateInPandas changelog checkpointing
(VERDICT r7 #3).

Round 7 claimed a 26x commit-cost win from RocksDB changelog
checkpointing (SCALE.md round-7 profile) while the driver artifact
recorded a 2x WALL regression the same day (BENCH_r06 17.35 s ->
BENCH_r07 35.52 s, max batch 16.9 s) — two separate processes on a box
whose ambient load drifts ±30-100% between runs.  This tool settles it
the only way that works here: both configs in ONE process, reps
interleaved (order alternating per rep, same discipline as
tools/ab_bench.py), driver posture exactly (cold stream start per rep —
fresh temp checkpoint + memory sink, availableNow, 8 x ~12.5k-row
micro-batches from the sf0.1 events table).

Per rep and side it records wall, per-batch triggerExecution (so
batch 0 — first-batch planning — is visible separately), and cumulative
stateOperators commitTimeMs (the metric changelog mode targets).

Usage:
  python tools/tws_ab.py [--reps N] [--json OUT] [SF_DIR]

Run alone on the box (bench noise rules, MEMORY.md).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawling_vectordb_llm_spark.session import get_spark
from crawling_vectordb_llm_spark.streaming.stateful import run_tws_user_totals
from tools.streaming_bench import _split_table


def _one_run(spark, feed: str, changelog: bool) -> dict:
    t0 = time.time()
    out, query = run_tws_user_totals(
        spark, feed, max_files=1, return_query=True, changelog=changelog
    )
    wall = time.time() - t0
    out.count()  # materialize the memory sink read like the bench does
    prog = [  # noqa: E501 — read progress BEFORE dropping the sink table
        p if isinstance(p, dict) else json.loads(p.json)
        for p in query.recentProgress
        if p is not None
    ]
    batch_ms = [
        p["durationMs"].get("triggerExecution", 0)
        for p in prog
        if p.get("numInputRows", 0) > 0
    ]
    commit_ms = sum(
        op.get("commitTimeMs", 0)
        for p in prog
        for op in (p.get("stateOperators") or [])
    )
    # Drop the memory-sink table: the first r8 A/B run left every rep's
    # sink resident in the JVM and both sides slowed ~2× monotonically
    # across reps (wall 20 -> 41 s, commit_ms 320 -> 936 s) — heap
    # accumulation, not ambient.  The driver bench runs ONE stream per
    # process, so this contamination is an artifact of repeating in-process.
    spark = out.sparkSession
    spark.catalog.dropTempView(query.name)
    return {
        "wall_s": round(wall, 2),
        "batch_ms": batch_ms,
        "batch0_ms": batch_ms[0] if batch_ms else None,
        "max_batch_ms_excl_b0": max(batch_ms[1:]) if len(batch_ms) > 1 else None,
        "commit_ms_cumulative": commit_ms,
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
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    spark = get_spark("tws_ab")
    feed = tempfile.mkdtemp(prefix="tws_ab_feed_")
    try:
        n_rows = _split_table(spark, sf_dir, "events", 8, feed)
        # one uncounted warm-up per side (JIT, state-server worker paths)
        _one_run(spark, feed, changelog=False)
        _one_run(spark, feed, changelog=True)
        runs = {"changelog_off": [], "changelog_on": []}
        for rep in range(reps):
            order = (False, True) if rep % 2 == 0 else (True, False)
            for cl in order:
                key = "changelog_on" if cl else "changelog_off"
                runs[key].append(_one_run(spark, feed, changelog=cl))
        med = statistics.median
        summary = {}
        for key, rs in runs.items():
            summary[key] = {
                "wall_s_median": round(med([r["wall_s"] for r in rs]), 2),
                "wall_s_all": [r["wall_s"] for r in rs],
                "commit_ms_median": med([r["commit_ms_cumulative"] for r in rs]),
                "commit_ms_all": [r["commit_ms_cumulative"] for r in rs],
                "batch0_ms_median": med([r["batch0_ms"] for r in rs]),
                "max_batch_ms_excl_b0_median": med(
                    [r["max_batch_ms_excl_b0"] for r in rs]
                ),
                "max_batch_ms_excl_b0_all": [
                    r["max_batch_ms_excl_b0"] for r in rs
                ],
            }
        ratios = sorted(
            b["wall_s"] / max(a["wall_s"], 1e-9)
            for a, b in zip(runs["changelog_off"], runs["changelog_on"])
        )
        payload = {
            "sf_dir": sf_dir,
            "rows_per_run": n_rows,
            "micro_batches": 8,
            "reps": reps,
            "posture": "cold stream start per rep (fresh temp checkpoint + "
            "memory sink, availableNow, maxFilesPerTrigger=1), interleaved "
            "order alternating per rep",
            "on_over_off_wall_ratio_median": round(med(ratios), 3),
            "summary": summary,
            "raw": runs,
        }
        print(json.dumps(payload, indent=1))
        if json_out:
            with open(json_out, "w") as f:
                json.dump(payload, f, indent=1, sort_keys=True)
                f.write("\n")
    finally:
        shutil.rmtree(feed, ignore_errors=True)


if __name__ == "__main__":
    main()
