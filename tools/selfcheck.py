"""Self-check harness: mimic the driver's correctness gate locally.

Runs every `queries()` entry on Spark and, when an oracle exists, the same
query in DuckDB, then compares row count, column names, and values
(order-insensitive; exact equality — our queries are responsible for
rounding floats to 6 dp on both sides).

Usage: python tools/selfcheck.py [sf_dir] [query_name ...]
"""

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


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in TABLES:
        p = table_path(sf_dir, t)
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures: list[str] = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        took = time.time() - t0
        if name not in ORACLES:
            print(f"ok   {name}: rows-only ({len(sdf)} rows, {took:.1f}s)")
            if len(sdf) == 0:
                print(f"WARN {name}: 0 rows")
            continue
        try:
            ddf = con.sql(ORACLES[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        ns, nd = normalize(sdf), normalize(ddf)
        if len(sdf) != len(ddf):
            failures.append(name)
            print(f"FAIL {name}: rows spark={len(sdf)} duckdb={len(ddf)}")
            continue
        if list(ns.columns) != list(nd.columns):
            failures.append(name)
            print(
                f"FAIL {name}: cols spark={list(ns.columns)} duckdb={list(nd.columns)}"
            )
            continue
        if not ns.equals(nd):
            failures.append(name)
            neq = (ns != nd).any(axis=1)
            print(f"FAIL {name}: {int(neq.sum())}/{len(ns)} rows differ; first:")
            idx = neq[neq].index[:3]
            for i in idx:
                print(f"  spark : {ns.loc[i].to_dict()}")
                print(f"  duckdb: {nd.loc[i].to_dict()}")
        else:
            print(f"PASS {name} ({len(sdf)} rows, {took:.1f}s)")
            if len(sdf) == 0:
                print(f"WARN {name}: 0 rows (trivially equal)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
