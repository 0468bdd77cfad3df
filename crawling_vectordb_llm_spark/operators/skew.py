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


def salted_broadcast_skew_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Skew-proof equi-join: salt the FACT side's key, explode the DIM side
    across all salt values, join on (key, salt).

    For a shuffle join this spreads one hot key over `salt_buckets`
    reducers instead of one; when the dim side is broadcast-able (the
    common case here) AQE already avoids the shuffle entirely, but the
    salted form is the portable recipe for the dim-too-big-to-broadcast
    case — the explode costs |dim| x salt_buckets rows, bounded because a
    dim table is the small side by definition.

    Join results are identical to the unsalted join (salt matches by
    construction); the suite oracle-checks that identity.
    """
    salted_facts = facts.withColumn(
        "__salt", (F.rand(seed=7) * salt_buckets).cast("int")
    )
    salted_dim = dim.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))),
    )
    return salted_facts.join(salted_dim, [key, "__salt"]).drop("__salt")
