"""Iterative graph primitives on DataFrames (no GraphFrames dependency).

≈ the reference's supervisor-hierarchy level propagation — a bounded-depth
BFS over parent edges (`/root/reference/anomaly_detection/analyzers/
org_analyzer.py:36-70`, max 20 iterations) — re-expressed as an iterative
DataFrame join loop: the only pattern in the engine where the driver loops,
because BFS depth is a genuine sequential dependency (SURVEY.md §2.5 W7).

Scale notes: each iteration is one broadcast-or-shuffle join frontier ⋈
edges; ``localCheckpoint`` truncates the growing lineage so iteration N
does not replay iterations 1..N-1; total work is O(edges × depth), and the
loop exits as soon as a frontier comes back empty.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs_levels(edges: DataFrame, root_id, max_iter: int = 20,
               id_col: str = "id", parent_col: str = "parent") -> DataFrame:
    """(id, level) for every node reachable from ``root_id`` following
    child→parent edges in reverse (level 0 = root, 1 = direct children, …).

    ``edges`` holds one row per non-root node: (id, parent). Nodes not
    reached within ``max_iter`` levels are omitted (the reference's bounded
    -depth semantics).
    """
    spark = edges.sparkSession
    levels = spark.createDataFrame([(root_id, 0)], f"{id_col} long, level int")
    frontier = levels
    for _ in range(max_iter):
        children = (
            edges.join(
                frontier.select(F.col(id_col).alias(parent_col), "level"),
                parent_col,
            )
            .select(F.col(id_col), (F.col("level") + 1).alias("level"))
            .join(levels.select(id_col), id_col, "left_anti")
            .localCheckpoint()
        )
        if children.isEmpty():
            break
        levels = levels.unionByName(children).localCheckpoint()
        frontier = children
    return levels
