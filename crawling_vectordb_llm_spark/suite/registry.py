"""Registry wiring suite modules to the driver contract (__spark_entry__.py).

Each query is a callable (spark, sf_dir) -> DataFrame.  Queries with a
DuckDB-expressible equivalent also register `oracle` SQL; the driver runs
both at sf0.01 and compares row-count + schema + order-insensitive value
hash.  Determinism rules (SURVEY §7 / FIXTURES.md): float outputs rounded to
6 dp IN the query itself (both sides), decimal-cast sums for order-
independent exactness, timestamps rendered as strings, ties broken by id.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        assert name not in QUERIES, f"duplicate query name {name}"
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
