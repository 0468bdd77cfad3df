"""sf1 scale run (VERDICT r3 #1): replicate the sf0.1 fixtures 10x into
a local sf1 directory (ids offset per copy, FK columns offset in
lockstep — the tools/stress.py recipe, so joins stay consistent within
each copy and document TEXTS genuinely repeat 10x), then:

  python tools/sf1.py build       # materialize /tmp/sf1 (~10x sf0.1)
  python tools/sf1.py bench       # bench.py at sf0.1 AND sf1 in clean
                                  #   subprocess JVMs; writes
                                  #   BENCH_SF1_r04.json with per-query
                                  #   sf0.1 -> sf1 wall ratios
  python tools/sf1.py selfcheck   # full-registry oracle gate at sf1

Fact tables grow 10x; true dims (supplier/nation/region/part) stay 1x,
as they would at a real scale factor.  A scale-correct query's wall
ratio stays at or below ~10x-plus-overhead; the bench report flags
anything above 12x for a plan audit.  Run alone on the box (bench noise
rules, MEMORY.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DEST = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sf1")
COPIES = 10
STRIDE = 10_000_000

# fact table -> id/FK columns offset per copy (lockstep with their dims)
FACTS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["supplier", "nation", "region", "part"]


def write_single_parquet(df, dest_dir: str, name: str) -> None:
    """Write df as ONE parquet file `dest_dir/name.parquet`, matching
    the driver fixtures' layout (DuckDB oracle reads the same path;
    Spark splits by row group)."""
    import glob as _glob
    import shutil as _shutil

    tmp = f"{dest_dir}/_tmp_{name}"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = _glob.glob(f"{tmp}/part-*.parquet")[0]
    final = f"{dest_dir}/{name}.parquet"
    if os.path.isdir(final) or os.path.isfile(final):
        _shutil.rmtree(final, ignore_errors=True)
        if os.path.isfile(final):
            os.remove(final)
    os.replace(part, final)
    _shutil.rmtree(tmp, ignore_errors=True)


def replicate_fact(spark, src: str, name: str, id_cols: list[str], copies: int):
    """Union `copies` id-offset copies of src/name (the stress.py recipe:
    FK columns offset in lockstep so joins stay consistent per copy)."""
    from pyspark.sql import functions as F

    from crawling_vectordb_llm_spark.catalog import read_table

    df = read_table(spark, src, name)
    out = None
    for i in range(copies):
        c = df
        for col in id_cols:
            c = c.withColumn(col, F.col(col) + i * STRIDE)
        out = c if out is None else out.unionByName(c)
    return out


def build() -> None:
    from crawling_vectordb_llm_spark.session import get_spark

    spark = get_spark("sf1_build")
    os.makedirs(DEST, exist_ok=True)
    for name, id_cols in FACTS.items():
        out = replicate_fact(spark, SRC, name, id_cols, COPIES)
        write_single_parquet(out, DEST, name)
        print(f"built {name}: {spark.read.parquet(f'{DEST}/{name}.parquet').count()} rows")
    for name in DIMS:
        import shutil as _shutil

        final = f"{DEST}/{name}.parquet"
        _shutil.rmtree(final, ignore_errors=True)
        _shutil.copyfile(f"{SRC}/{name}.parquet", final)
        print(f"copied dim {name}")


def run_bench(sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        timeout=7200,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)

def bench() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    small = run_bench(SRC)
    print(f"sf0.1 total {small['value']}s")
    big = run_bench(DEST)
    print(f"sf1 total {big['value']}s")
    ratios = {
        q: round(big["queries"][q] / max(small["queries"][q], 1e-9), 2)
        for q in big["queries"]
    }
    artifact = {
        "sf0.1": small,
        "sf1": big,
        "ratio_sf1_over_sf0.1": ratios,
        "data_growth": 10,
        "flag_threshold": 12.0,
        "flagged": sorted(
            [q for q, r in ratios.items() if r > 12.0],
            key=lambda q: -ratios[q],
        ),
    }
    path = os.path.join(repo, "BENCH_SF1_r04.json")
    with open(path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"\nwrote {path}")
    print("\n| query | sf0.1 s | sf1 s | ratio (data 10x) |")
    print("|---|---|---|---|")
    for q, r in sorted(ratios.items(), key=lambda kv: -kv[1]):
        print(f"| {q} | {small['queries'][q]} | {big['queries'][q]} | {r}x |")
    print(f"\nflagged (> 12x): {artifact['flagged']}")


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "build"
    if cmd == "build":
        build()
    elif cmd == "bench":
        bench()
    elif cmd == "selfcheck":
        os.execv(
            sys.executable,
            [sys.executable, "tools/selfcheck.py", DEST] + sys.argv[2:],
        )
    else:
        raise SystemExit(f"unknown command {cmd!r}")
