"""Dump `.explain("formatted")` for named queries to files — the
before/after plan evidence for optimization rounds.

Usage:
  python tools/plan_dump.py OUTDIR SUFFIX NAME [NAME...]
writes OUTDIR/<name>_<SUFFIX>.txt for each query (executed AQE final plan
where available: the query is run once with a noop-style count first so
AdaptiveSparkPlan is final).  Also accepts the pseudo-query `ingest`
(plans/index_build.ingest_documents over the sf documents table).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawling_vectordb_llm_spark.session import get_spark
from crawling_vectordb_llm_spark.suite import QUERIES


def formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan_dump")
    for name in names:
        if name == "ingest":
            from crawling_vectordb_llm_spark.catalog import read_table
            from crawling_vectordb_llm_spark.plans.index_build import (
                ingest_documents,
            )

            df = ingest_documents(read_table(spark, sf_dir, "documents"))
        else:
            df = QUERIES[name](spark, sf_dir)
        # finalize AQE on THIS DataFrame's QueryExecution: count() would
        # execute a different (aggregated) plan and leave this one initial
        df.collect()
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(formatted_plan(df))
        print("wrote", path, flush=True)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
