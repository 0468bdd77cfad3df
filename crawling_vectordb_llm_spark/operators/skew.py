"""Skew-aware aggregation: two-stage salted combine.

At 100 TB a handful of hot keys (one dominant language, one giant source
domain) can pin a single reducer.  AQE's skew-join splitting covers joins;
for aggregations with low key cardinality + huge groups, salting forces a
uniform first-stage spread:

    stage 1: groupBy(keys + salt)  -> partial (count, sum) per salt bucket
    stage 2: groupBy(keys)         -> combine partials

Results are identical to the direct aggregation for ALGEBRAIC aggregates
(count/sum/min/max — decimal sums keep it bit-exact); that identity is
oracle-tested (suite) and property-tested.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    sum_col: str | Column,
    salt_buckets: int = 8,
    sum_alias: str = "total",
    count_alias: str = "n",
) -> DataFrame:
    sum_col = F.col(sum_col) if isinstance(sum_col, str) else sum_col
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        F.sum(sum_col.cast("decimal(22,6)")).alias("__psum"),
        F.count(F.lit(1)).alias("__pcnt"),
    )
    return partial.groupBy(*keys).agg(
        F.sum("__psum").cast("double").alias(sum_alias),
        F.sum("__pcnt").alias(count_alias),
    )
