"""Self-check harness: mimic the driver's correctness gate locally.

Runs every `queries()` entry on Spark and, when an oracle exists, the same
query in DuckDB, then compares row count, column names, and values
(order-insensitive; exact equality — our queries are responsible for
rounding floats to 6 dp on both sides).

Usage: python tools/selfcheck.py [sf_dir] [query_name ...]
       python tools/selfcheck.py --json OUT.json [sf_dir] [query_name ...]
       python tools/selfcheck.py --oracle-timeout 300 [sf_dir] [...]

--json additionally writes the full per-query result map in the
driver's CORRECTNESS_r{N}.json shape, so a complete-registry artifact
can be checked in alongside the driver's 50-query sample (ADVICE r2).

--oracle-timeout N interrupts any DuckDB oracle running longer than N
seconds (duckdb's interrupt() from a watchdog thread) and records
err="oracle_timeout" instead of hanging — needed for the sf1 scale run
(VERDICT r3 #1), where a handful of oracles are QUADRATIC/recursive by
design (they're correctness gates sized for the driver's sf0.01 check;
e.g. the recursive-CTE connected-components replay over a pair list
that grows ~N^2 when fixtures are replicated with genuine duplicates).
A timed-out oracle is an infeasibility record, not a failure — the
Spark side still ran and its wall/rows are reported."""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawling_vectordb_llm_spark.catalog import TABLES, table_path
from crawling_vectordb_llm_spark.session import get_spark
from crawling_vectordb_llm_spark.suite import ORACLES, QUERIES


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical value form: exact for ints/strings; floats compared bitwise
    # after the queries' own rounding
    def canon(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<null>"
        if pd.isna(v):
            return "<null>"
        if isinstance(v, float):
            return repr(v)
        return str(v)

    out = df.map(canon)
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(
        drop=True
    )


# Scale-tiered oracle verification (VERDICT r4 #2).  Six oracles are
# quadratic/recursive gates sized for the sf0.01 driver check; above
# ~sf0.1 they are infeasible (the r4 sf1 run recorded them as
# `oracle_timeout` — execute-only, no verification).  With --tiered,
# each of these queries runs BOTH sides — the unchanged Spark fn and
# the unchanged oracle SQL — over a deterministically SAMPLED copy of
# its input tables (predicate below, applied once when the sampled
# fixture dir is materialized), so the restriction is identical on both
# sides BY CONSTRUCTION and the comparison is exact end-to-end on the
# sampled subgraph/slice at full per-row entropy.  ~10% of rows makes
# the quadratic oracles ~1% of the full cost.  recursive_cte_
# reachability keeps its seed nodes (vec_id < 5) so the frontier
# expansion stays non-trivial.
TIERED: dict[str, dict[str, str]] = {
    "dedup_clusters": {"embeddings": "vec_id % 10 = 0"},
    "near_dup_pipeline_clusters": {"embeddings": "vec_id % 10 = 0"},
    "similarity_pagerank": {"embeddings": "vec_id % 10 = 0"},
    # r7: the explicit all-pairs variants share the old entries' oracles
    # (same quadratic scored CTE + recursive fixpoint), so they tier the
    # same way; the BOUNDED headline forms above keep tiering because
    # their ORACLES still rank over the all-pairs scored CTE even though
    # the Spark side is now linear-output.
    "dedup_clusters_allpairs": {"embeddings": "vec_id % 10 = 0"},
    "near_dup_pipeline_clusters_allpairs": {"embeddings": "vec_id % 10 = 0"},
    "similarity_pagerank_allpairs": {"embeddings": "vec_id % 10 = 0"},
    # r8: the two new graph consumers rank over the same quadratic scored
    # CTE (leakage_safe_split adds the recursive reach fixpoint, kcore the
    # 16 unrolled peel stages — both cheap; the all-pairs cosine join is
    # the cost), so they tier exactly like dedup_clusters.
    "leakage_safe_split": {"embeddings": "vec_id % 10 = 0"},
    "kcore_spam_filter": {"embeddings": "vec_id % 10 = 0"},
    "recursive_cte_reachability": {
        "embeddings": "vec_id % 10 = 0 OR vec_id < 5"
    },
    "simhash_near_dup": {"documents": "doc_id % 10 = 0"},
    "bpe_token_count": {"documents": "doc_id % 10 = 0"},
}
# (r8 note: bigram_logprob_score briefly tiered here when the 4,110-word
# vocabulary pushed its oracle past 300 s at sf1; the real fix was the
# oracle itself — MATERIALIZED CTEs + decorrelated tail counts,
# text_suite.py — after which it runs untiered in ~9 s at fresh sf1.)


def build_tiered_dir(sf_dir: str, preds: dict[str, str]) -> str:
    """Materialize a sampled copy of sf_dir: named tables filtered by
    their predicate (via DuckDB COPY, schema-preserving), every other
    table symlinked.  Deterministic location per (sf_dir, preds);
    rebuilt each call (the sampled tables are small by design)."""
    import hashlib
    import shutil

    key = hashlib.md5(
        (os.path.abspath(sf_dir) + repr(sorted(preds.items()))).encode()
    ).hexdigest()[:12]
    dest = f"/tmp/selfcheck_tiered_{key}"
    shutil.rmtree(dest, ignore_errors=True)
    os.makedirs(dest)
    bcon = duckdb.connect()
    for t in TABLES:
        src = table_path(sf_dir, t)
        if not os.path.exists(src):
            continue
        dst = table_path(dest, t)
        if t in preds:
            bcon.execute(
                f"COPY (SELECT * FROM read_parquet('{src}') "
                f"WHERE {preds[t]}) TO '{dst}' (FORMAT PARQUET)"
            )
        else:
            os.symlink(os.path.abspath(src), dst)
    bcon.close()
    return dest


# Flags that take a value — shared with tools/sf1_fresh.py's forwarder so a
# new value-taking flag added here is forwarded correctly there (ADVICE r7).
VALUE_FLAGS = ("--json", "--oracle-timeout", "--rotate-sample")


def main() -> int:
    args = sys.argv[1:]
    json_out = None
    oracle_timeout = None
    tiered = False
    rotate_round = None
    while args and args[0].startswith("--"):
        if args[0] == "--json":
            json_out = args[1]
            args = args[2:]
        elif args[0] == "--oracle-timeout":
            oracle_timeout = float(args[1])
            args = args[2:]
        elif args[0] == "--tiered":
            tiered = True
            args = args[1:]
        elif args[0] == "--rotate-sample":
            # Driver-shaped ROTATING 50-query sample (VERDICT r11 #6):
            # the driver's CORRECTNESS_r{N}.json has sampled the SAME 50
            # keys since r10, leaving ~140 registry entries with no
            # driver-format evidence.  --rotate-sample N selects a
            # deterministic 50-key window into the sorted registry at
            # offset (N*50) mod len (wrapping), so consecutive rounds
            # cover the whole registry every ceil(215/50)=5 rounds.
            rotate_round = int(args[1])
            args = args[2:]
        else:
            raise SystemExit(f"unknown flag {args[0]!r}")
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    if rotate_round is not None:
        keys = sorted(QUERIES)
        off = (rotate_round * 50) % len(keys)
        window = (keys + keys)[off : off + 50]
        only = set(window) | only
        print(
            f"rotating sample round={rotate_round}: offset {off}, "
            f"{len(window)} keys {window[0]}..{window[-1]}"
        )
    unknown = only - set(QUERIES)
    if unknown:
        # a typo'd (or misplaced-flag) name must not silently report a
        # clean "0 failures" over zero queries (r7: sf1_fresh.py used to
        # forward flags here as names)
        raise SystemExit(f"unknown query names: {sorted(unknown)}")
    spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in TABLES:
        p = table_path(sf_dir, t)
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures: list[str] = []
    report: dict[str, dict] = {}

    def record(name, **kw):
        row = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
            "tiered": None,
        }
        row.update(kw)
        report[name] = row

    # predicate-set key -> (sampled dir, duckdb connection with views)
    tiered_cons: dict[str, tuple[str, duckdb.DuckDBPyConnection]] = {}

    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        q_sf_dir, q_con, tier = sf_dir, con, None
        if tiered and name in TIERED:
            tier = TIERED[name]
            tkey = repr(sorted(tier.items()))
            if tkey not in tiered_cons:
                tdir = build_tiered_dir(sf_dir, tier)
                tcon = duckdb.connect()
                for t in TABLES:
                    p = table_path(tdir, t)
                    if os.path.exists(p):
                        tcon.execute(
                            f"CREATE VIEW {t} AS SELECT * "
                            f"FROM read_parquet('{p}')"
                        )
                tiered_cons[tkey] = (tdir, tcon)
            q_sf_dir, q_con = tiered_cons[tkey]
        t0 = time.time()
        try:
            sdf = fn(spark, q_sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            record(name, err=f"spark: {e}", tiered=tier)
            continue
        took = time.time() - t0
        if name not in ORACLES:
            print(f"ok   {name}: rows-only ({len(sdf)} rows, {took:.1f}s)")
            if len(sdf) == 0:
                print(f"WARN {name}: 0 rows")
            record(name, spark_rows=len(sdf), err="no_oracle", tiered=tier)
            continue
        timer = None
        fired = []
        done = []
        if oracle_timeout:
            import threading

            def _interrupt():
                # per-query done flag: if con.sql already returned, do NOT
                # set the connection's interrupt flag — it would abort the
                # NEXT query and mis-attribute the failure (ADVICE r4)
                if not done:
                    fired.append(1)
                    q_con.interrupt()

            timer = threading.Timer(oracle_timeout, _interrupt)
            timer.start()
        try:
            ddf = q_con.sql(ORACLES[name]).df()
            done.append(1)
            if timer:
                # cancel() cannot stop an already-running callback: join()
                # so an in-flight _interrupt finishes before we read
                # `fired`, making the absorb path authoritative (ADVICE r5)
                timer.cancel()
                timer.join()
            if fired:
                # timer raced the return: absorb a possibly-stale
                # interrupt flag on a throwaway statement
                try:
                    q_con.sql("select 1").df()
                except Exception:  # noqa: BLE001
                    pass
        except Exception as e:  # noqa: BLE001
            done.append(1)
            if timer:
                timer.cancel()
                timer.join()
            if fired:
                print(f"SKIP {name}: oracle_timeout after {oracle_timeout:.0f}s "
                      f"(spark side ok: {len(sdf)} rows, {took:.1f}s)")
                record(name, spark_rows=len(sdf), err="oracle_timeout",
                       tiered=tier)
            else:
                failures.append(name)
                print(f"FAIL {name}: duckdb error: {e}")
                record(name, spark_rows=len(sdf), err=f"duckdb: {e}",
                       tiered=tier)
            continue
        finally:
            if timer:
                timer.cancel()
        ns, nd = normalize(sdf), normalize(ddf)
        rows_match = len(sdf) == len(ddf)
        schema_match = list(ns.columns) == list(nd.columns)
        values_match = rows_match and schema_match and ns.equals(nd)
        record(
            name, rows_match=rows_match, schema_match=schema_match,
            hash_match=values_match, spark_rows=len(sdf), oracle_rows=len(ddf),
            tiered=tier,
        )
        if not rows_match:
            failures.append(name)
            print(f"FAIL {name}: rows spark={len(sdf)} duckdb={len(ddf)}")
            continue
        if not schema_match:
            failures.append(name)
            print(
                f"FAIL {name}: cols spark={list(ns.columns)} duckdb={list(nd.columns)}"
            )
            continue
        if not values_match:
            failures.append(name)
            neq = (ns != nd).any(axis=1)
            print(f"FAIL {name}: {int(neq.sum())}/{len(ns)} rows differ; first:")
            idx = neq[neq].index[:3]
            for i in idx:
                print(f"  spark : {ns.loc[i].to_dict()}")
                print(f"  duckdb: {nd.loc[i].to_dict()}")
        else:
            tag = " [tiered]" if tier else ""
            print(f"PASS {name}{tag} ({len(sdf)} rows, {took:.1f}s)")
            if len(sdf) == 0:
                print(f"WARN {name}: 0 rows (trivially equal)")
    if json_out:
        import json

        if rotate_round is not None:
            # ADVICE r12: a --rotate-sample artifact is builder-produced
            # evidence in the driver's CORRECTNESS format — embed
            # provenance so it can never be mistaken for (or cited as)
            # an independent driver run.  Key sorts first and is skipped
            # by anything iterating query rows (leading underscores).
            report = {
                "__provenance__": {
                    "generated_by": f"tools/selfcheck.py --rotate-sample {rotate_round}",
                    "rotation_offset": (rotate_round * 50) % len(QUERIES),
                    "note": "builder-generated rotating sample, NOT a driver artifact",
                },
                **report,
            }
        with open(json_out, "w") as fh:
            json.dump(report, fh, indent=2)
        n_q = len(report) - (1 if rotate_round is not None else 0)
        print(f"wrote {json_out} ({n_q} queries)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
