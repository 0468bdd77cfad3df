"""Fresh-entropy sf1 scale run (VERDICT r4 #1).

The r4 slope table (tools/sf1.py, BENCH_SF1_r04.json) replicated sf0.1
10x, so every document had 10 genuine copies and the dedup/CC family's
inputs grew quadratically — their slopes measured duplicate density,
not scaling.  This tool builds TWO fixture dirs whose only difference
is scale, with seeded-unique content and a controlled ~7%/~5% dup rate
(sources/synthetic_documents.py):

  /tmp/sf0.1_fresh  relational facts = driver sf0.1 verbatim;
                    documents (5k) / embeddings (2k) fresh-generated
  /tmp/sf1_fresh    relational facts replicated 10x (tools/sf1.py
                    recipe); documents (50k) / embeddings (20k)
                    fresh-generated under the SAME law

so ratio(fresh1 / fresh0.1) isolates data growth: the duplicate RATE is
held constant while volume grows 10x.  A scale-correct dedup query's
wall ratio now stays ~data growth (the r4 exception `dedup_clusters`
10.27x was edge-list growth by construction, not a plan defect — this
fixture removes the ambiguity).

  python tools/sf1_fresh.py build   # materialize both dirs
  python tools/sf1_fresh.py bench   # bench.py on both in clean JVMs;
                                    #   writes BENCH_SF1_r05.json
  python tools/sf1_fresh.py selfcheck [args]  # full oracle gate at
                                    #   fresh sf1 (scale-tiered oracles)

Run alone on the box (bench noise rules, MEMORY.md).
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.sf1 import (  # noqa: E402
    COPIES,
    DIMS,
    SRC,
    replicate_fact,
    run_bench,
    write_single_parquet,
)

SMALL = os.environ.get("SPARK_GRAFT_SF01F_DIR", "/tmp/sf0.1_fresh")
BIG = os.environ.get("SPARK_GRAFT_SF1F_DIR", "/tmp/sf1_fresh")
SF3 = os.environ.get("SPARK_GRAFT_SF3F_DIR", "/tmp/sf3_fresh")

# relational facts keep the replication recipe — their slopes are not
# distorted by content duplication (joins/aggs don't pair rows by text)
REL_FACTS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
}
DOC_ROWS, EMB_ROWS = 5_000, 2_000  # driver sf0.1 row counts (1x)


def build(targets: tuple[tuple[str, int], ...] = ((SMALL, 1), (BIG, 10))) -> None:
    from crawling_vectordb_llm_spark.session import get_spark
    from crawling_vectordb_llm_spark.sources.synthetic_documents import (
        fresh_documents,
        fresh_embeddings,
    )

    spark = get_spark("sf1_fresh_build")
    for dest, mult in targets:
        os.makedirs(dest, exist_ok=True)
        for name, id_cols in REL_FACTS.items():
            if mult == 1:
                shutil.copyfile(f"{SRC}/{name}.parquet", f"{dest}/{name}.parquet")
            else:
                out = replicate_fact(spark, SRC, name, id_cols, mult)
                write_single_parquet(out, dest, name)
            n = spark.read.parquet(f"{dest}/{name}.parquet").count()
            print(f"{dest}: {name} {n} rows")
        for name in DIMS:
            shutil.copyfile(f"{SRC}/{name}.parquet", f"{dest}/{name}.parquet")
        docs = fresh_documents(spark, DOC_ROWS * mult, partitions=32)
        # column order must match the driver fixture exactly (selfcheck
        # compares schemas column-by-column after sorting, but bench
        # queries select by name — order kept for byte-level parity)
        write_single_parquet(
            docs.select("doc_id", "text", "lang", "source", "n_chars"),
            dest,
            "documents",
        )
        embs = fresh_embeddings(spark, EMB_ROWS * mult, partitions=32)
        write_single_parquet(
            embs.select("vec_id", "embedding", "label"), dest, "embeddings"
        )
        for name in ("documents", "embeddings"):
            n = spark.read.parquet(f"{dest}/{name}.parquet").count()
            print(f"{dest}: {name} {n} rows (fresh)")


def bench() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    small = run_bench(SMALL)
    print(f"fresh sf0.1 total {small['value']}s")
    big = run_bench(BIG)
    print(f"fresh sf1 total {big['value']}s")
    ratios = {
        q: round(big["queries"][q] / max(small["queries"][q], 1e-9), 2)
        for q in big["queries"]
    }
    artifact = {
        "fixture": "fresh-entropy (unique seeded content, ~7% doc / ~5% "
        "vector controlled dup rate; sources/synthetic_documents.py)",
        "sf0.1_fresh": small,
        "sf1_fresh": big,
        "ratio_sf1_over_sf0.1": ratios,
        "data_growth": 10,
        "flag_threshold": 12.0,
        "flagged": sorted(
            [q for q, r in ratios.items() if r > 12.0],
            key=lambda q: -ratios[q],
        ),
    }
    path = os.path.join(repo, "BENCH_SF1_r05.json")
    with open(path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"\nwrote {path}")
    print("\n| query | fresh sf0.1 s | fresh sf1 s | ratio (data 10x) |")
    print("|---|---|---|---|")
    for q, r in sorted(ratios.items(), key=lambda kv: -kv[1]):
        print(f"| {q} | {small['queries'][q]} | {big['queries'][q]} | {r}x |")
    print(f"\nflagged (> 12x): {artifact['flagged']}")


def bench3() -> None:
    """Three-point scaling curve (VERDICT r6 #4): bench at fresh sf0.1 /
    sf1 / sf3 (data multiples x = 1, 10, 30) and fit, per query,

      t(x) = c + m*x   (least squares over the 3 points)

    separating fixed overhead (c: JVM/plan/scheduling cost that a 2-point
    ratio can't distinguish from growth) from the data-proportional term
    (m).  The flag metric is the MARGINAL exponent over the two larger
    scales, e = ln(t30/t10)/ln 3 — overhead is amortized there, so
    e >~ 1.2 means genuinely superlinear shuffle/pair growth while a big
    sf0.1->sf1 ratio with e ~ 1 is just fixed overhead at the tiny scale.
    Writes BENCH_SF1_r08.json (round-8 re-measurement on the enlarged
    4,110-word vocabulary fixtures, which invalidated the r6 numbers)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    import math

    runs = {}
    for label, d in (("sf0.1_fresh", SMALL), ("sf1_fresh", BIG),
                     ("sf3_fresh", SF3)):
        runs[label] = run_bench(d)
        print(f"{label} total {runs[label]['value']}s")
    xs = [1.0, 10.0, 30.0]
    fits, ratios = {}, {}
    for q in runs["sf3_fresh"]["queries"]:
        ts = [runs[lbl]["queries"][q] for lbl in
              ("sf0.1_fresh", "sf1_fresh", "sf3_fresh")]
        n = len(xs)
        mx, mt = sum(xs) / n, sum(ts) / n
        sxx = sum((x - mx) ** 2 for x in xs)
        sxt = sum((x - mx) * (t - mt) for x, t in zip(xs, ts))
        m = sxt / sxx
        c = mt - m * mx
        sse = sum((t - (c + m * x)) ** 2 for x, t in zip(xs, ts))
        sst = sum((t - mt) ** 2 for t in ts) or 1e-12
        e_marginal = math.log(max(ts[2], 1e-9) / max(ts[1], 1e-9)) / math.log(3)
        fits[q] = {
            "t_x1": ts[0], "t_x10": ts[1], "t_x30": ts[2],
            "fit_overhead_s": round(c, 3),
            "fit_s_per_x": round(m, 4),
            "fit_r2": round(1 - sse / sst, 4),
            "marginal_exponent_sf1_to_sf3": round(e_marginal, 3),
        }
        ratios[q] = round(ts[1] / max(ts[0], 1e-9), 2)
    superlinear = sorted(
        [q for q, f in fits.items()
         if f["marginal_exponent_sf1_to_sf3"] > 1.2],
        key=lambda q: -fits[q]["marginal_exponent_sf1_to_sf3"],
    )
    artifact = {
        "fixture": "fresh-entropy (unique seeded content, ~7% doc / ~5% "
        "vector controlled dup rate; sources/synthetic_documents.py); "
        "three scales x=1,10,30 of driver sf0.1",
        "sf0.1_fresh": runs["sf0.1_fresh"],
        "sf1_fresh": runs["sf1_fresh"],
        "sf3_fresh": runs["sf3_fresh"],
        "ratio_sf1_over_sf0.1": ratios,
        "slope_fit": fits,
        "data_growth": {"sf1": 10, "sf3": 30},
        "flag_rule": "marginal_exponent_sf1_to_sf3 > 1.2 (amortized "
        "regime superlinearity); legacy 2-point ratio kept for "
        "round-over-round continuity",
        "flagged_superlinear": superlinear,
        "flagged_ratio_gt_12": sorted(
            [q for q, r in ratios.items() if r > 12.0],
            key=lambda q: -ratios[q],
        ),
    }
    path = os.path.join(repo, "BENCH_SF1_r08.json")
    with open(path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"\nwrote {path}")
    print("\n| query | x1 s | x10 s | x30 s | overhead s | s/x | e(10->30) |")
    print("|---|---|---|---|---|---|---|")
    for q, fv in sorted(
        fits.items(),
        key=lambda kv: -kv[1]["marginal_exponent_sf1_to_sf3"],
    ):
        print(
            f"| {q} | {fv['t_x1']} | {fv['t_x10']} | {fv['t_x30']} | "
            f"{fv['fit_overhead_s']} | {fv['fit_s_per_x']} | "
            f"{fv['marginal_exponent_sf1_to_sf3']} |"
        )
    print(f"\nflagged superlinear (e > 1.2): {superlinear}")


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "build"
    if cmd == "build":
        build()
    elif cmd == "build3":
        build(targets=((SF3, 30),))
    elif cmd == "bench":
        bench()
    elif cmd == "bench3":
        bench3()
    elif cmd == "selfcheck":
        # selfcheck.py parses --flags only BEFORE the sf_dir positional;
        # forward ours there and query-name positionals after.  (r7 fix:
        # flags used to land after BIG, where selfcheck treated them as
        # query names — unknown ones now fail loudly on its side too.)
        from tools.selfcheck import VALUE_FLAGS

        rest = sys.argv[2:]
        flags: list[str] = []
        pos: list[str] = []
        i = 0
        while i < len(rest):
            if rest[i] in VALUE_FLAGS:
                flags += rest[i : i + 2]
                i += 2
            elif rest[i].startswith("--"):
                flags.append(rest[i])
                i += 1
            else:
                pos.append(rest[i])
                i += 1
        os.execv(
            sys.executable,
            [sys.executable, "tools/selfcheck.py"] + flags + [BIG] + pos,
        )
    else:
        raise SystemExit(f"unknown command {cmd!r}")
