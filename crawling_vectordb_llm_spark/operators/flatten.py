"""Recursive tree flatten (F1) — the crawler's nav-tree walk.

The reference DFS-flattens a recursive JSON nav tree {title, link,
children:[...]} into a node list (Crawling.py:23-30).  Spark has no
recursive CTE pre-4.x, so the engine iterates explode-to-fixpoint on the
driver: each pass peels one tree level (a narrow transformation — no
shuffle per level), unioning emitted nodes.  Depth is bounded
(`max_depth`) so a malformed cyclic input can't loop forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def flatten_tree(
    nodes: DataFrame,
    children_col: str = "children",
    title_col: str = "title",
    max_depth: int = 32,
) -> DataFrame:
    """Pre-order flatten: input rows are roots (depth 0).  Children are
    structs carrying the same payload fields (and optionally their own
    `children`).  Output: every node with `depth` + `parent_title`,
    children column dropped."""
    payload_cols = [c for c in nodes.columns if c != children_col]
    flat = nodes.select(
        *payload_cols,
        F.lit(0).alias("depth"),
        F.lit(None).cast("string").alias("parent_title"),
    )
    level = nodes
    depth = 0
    while children_col in level.columns and depth < max_depth:
        depth += 1
        kids = (
            level.where(F.size(children_col) > 0)
            .select(
                F.col(title_col).alias("parent_title"),
                F.explode(children_col).alias("__c"),
            )
            .select("__c.*", F.lit(depth).alias("depth"), "parent_title")
        )
        if kids.isEmpty():
            break
        emit_cols = [c for c in payload_cols if c in kids.columns]
        flat = flat.unionByName(
            kids.select(*emit_cols, "depth", "parent_title"),
            allowMissingColumns=True,
        )
        level = kids.drop("depth", "parent_title")
    return flat
