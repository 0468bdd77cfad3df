"""The registered query inventory: every operator from SURVEY.md §2 gets a
`queries()` entry here, and (when SQL-expressible) a DuckDB oracle.

Importing this package imports every suite module, which registers into
`registry.QUERIES` / `registry.ORACLES` — __spark_entry__.py just re-exports.
"""

from crawling_vectordb_llm_spark.suite import (  # noqa: F401
    coverage_suite,
    dedup_suite,
    extended_suite,
    functions_suite,
    pipeline_suite,
    relational_suite,
    streaming_suite,
    text_suite,
    tpch_suite,
    training_suite,
    vector_suite,
)
from crawling_vectordb_llm_spark.suite.registry import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
