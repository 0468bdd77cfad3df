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


def global_topk_ranked(
    df: DataFrame,
    asc_key: list[Column],
    payload: list[str],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k over the WHOLE table with a dense 1..k rank and NO global
    window (VERDICT r4 #8): `orderBy().limit(k)` executes as
    TakeOrdered (per-partition heaps, no full sort/shuffle), the <= k
    survivors aggregate into ONE sorted array, and posexplode assigns
    rank = position + 1 — an aggregate + generate where a
    single-partition WindowExec used to be.

    `asc_key`: Columns forming the ASCENDING composite total order
    (negate numeric columns for descending); must be total (ties broken
    by a unique column) for the rank to be deterministic.  `payload`:
    column names carried through to the output, in output order.
    """
    top = df.orderBy(*asc_key).limit(k)
    row = F.struct(
        *[c.alias(f"__k{i}") for i, c in enumerate(asc_key)],
        F.struct(*payload).alias("__p"),
    )
    arr = top.agg(F.sort_array(F.collect_list(row)).alias("__a"))
    return arr.select(F.posexplode("__a").alias("__pos", "__r")).select(
        "__r.__p.*", (F.col("__pos") + 1).cast("int").alias(rank_col)
    )


# Default bound for query-side collects across the ANN ladder.  The
# bounded-collect contract (knn.py docstrings; reference issues one query
# text at a time, main_server.py:41) assumes <= ~100k queries; 1M matches
# knn._threshold_join_broadcast's max_broadcast_rows default and is still
# well under driver memory at 1024 dims (float64 1M x 1024 = 8 GB would be
# too big — but the guard's point is a CLEAR error before that allocation,
# not a silent OOM; lower it per-call for wide vectors).
DEFAULT_MAX_QUERY_ROWS = 1_000_000


def collect_query_rows(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    max_rows: int = DEFAULT_MAX_QUERY_ROWS,
    caller: str = "knn",
) -> list:
    """Collect the small (query) side of an ANN operator with an explicit
    runtime bound (VERDICT r5 #3: the contract was docstring-only).

    One job: limit(max_rows + 1) caps what ever reaches the driver, so an
    oversized query relation raises ValueError after materializing at most
    max_rows + 1 rows instead of OOM-ing on the full relation.  Below the
    cap the limit is a no-op and every row is returned (order is
    irrelevant — callers build per-query top-k, never order-sensitive
    state).  Mirror of _threshold_join_broadcast's guard (knn.py:399).
    """
    rows = df.select(id_col, vec_col).limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"{caller}: query side exceeds max_query_rows={max_rows}; "
            "the query relation is broadcast to every task and must stay "
            "small — pre-aggregate, batch the queries, or use a "
            "distributed similarity join (knn.threshold_join "
            "strategy='blocked') instead"
        )
    return rows
