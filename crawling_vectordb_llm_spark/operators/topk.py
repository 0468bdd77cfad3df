"""Grouped top-k — the reference's only ordering op.

`searchByText(limit=3)` (reference main_server.py:41) is semantically
`ORDER BY score DESC LIMIT k` per query.  Spark-first: a ranking window.
Ties are broken by an explicit id column so results are deterministic and
oracle-hash-stable (SURVEY §7 hard part b).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def grouped_topk(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """row_number over (group) ordered by order_cols, keep rank<=k.

    At scale: this is a single shuffle on the group key with map-side
    partial sort; AQE handles skewed groups.  For top-k over the WHOLE
    table prefer orderBy().limit(k) which Spark executes as TakeOrdered
    (no full sort, no full shuffle).
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w)).where(F.col(rank_col) <= k)
