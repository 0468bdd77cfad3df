"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship RAG-retrieval query (SURVEY §3.2, embed-free
variant) at sf0.001.  `queries()` / `oracle_sql()` expose the full operator
inventory registered in crawling_vectordb_llm_spark.suite — every operator
from SURVEY.md §2 plus the north-star LLM-pipeline ops (dedup ladder,
similarity search, text analysis, event-time windows).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from crawling_vectordb_llm_spark.shipping import (  # noqa: E402
    ensure_package_shipped,
    ensure_session_confs,
)
from crawling_vectordb_llm_spark.suite import ORACLES, QUERIES  # noqa: E402


def _shipped(fn: Callable[[SparkSession, str], DataFrame]):
    """Executor workers must be able to import this package regardless of
    the harness's cwd — ship the zipped package on first use."""

    def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_package_shipped(spark)
        ensure_session_confs(spark)
        return fn(spark, sf_dir)

    wrapper.__name__ = getattr(fn, "__name__", "query")
    wrapper.__doc__ = fn.__doc__
    return wrapper


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from crawling_vectordb_llm_spark.plans.rag import search_pipeline

    ensure_package_shipped(spark)
    ensure_session_confs(spark)
    return search_pipeline(spark, "/root/testdata/sf0.001", n_queries=5, k=3)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _shipped(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query above."""
    return dict(ORACLES)
