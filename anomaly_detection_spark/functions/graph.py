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


def weighted_edges(df: DataFrame, src_col: str, dst_col: str,
                   weight_out: str = "weight") -> DataFrame:
    """Weighted edge list from an interaction frame: one row per (src, dst)
    with the interaction count as weight (≈ the reference's email-exchange
    edge build, ``graph_builder.py:32-81``, where each sender→recipient email
    increments the edge weight). One hash aggregation — map-side partial
    combine collapses the shuffle to one row per distinct edge."""
    return (
        df.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").alias(weight_out))
    )


def co_activity_pairs(df: DataFrame, entity_col: str, key_cols: list[str],
                      max_entities_per_key: int = 10_000) -> DataFrame:
    """(entity_a, entity_b, shared) — pairwise counts of entities sharing the
    same activity key (≈ high-risk user-pair interaction counts,
    ``multidimensional_detector.py:662-676``), with the self-join bounded.

    The pair space is Σ_key |entities(key)|² — one degenerate key (a day
    every user is active on) is quadratic at scale, so keys with more than
    ``max_entities_per_key`` distinct entities are DROPPED via a map-side-
    combinable count + broadcast anti-join before the self-join (same
    discipline as ``dedup.lsh_candidate_pairs``). Pass a cap above the true
    max co-activity for exact results; the default bounds worst-case pair
    expansion at cap²·n_keys."""
    keyed = df.select(F.col(entity_col).alias("_e"), *key_cols).distinct()
    oversize = (
        keyed.groupBy(*key_cols).agg(F.count("*").alias("_n"))
        .filter(F.col("_n") > max_entities_per_key)
        .select(*key_cols)
    )
    kept = keyed.join(F.broadcast(oversize), key_cols, "left_anti")
    a = kept.select(F.col("_e").alias("entity_a"), *key_cols)
    b = kept.select(F.col("_e").alias("entity_b"), *key_cols)
    return (
        a.join(b, key_cols)
        .filter(F.col("entity_a") < F.col("entity_b"))
        .groupBy("entity_a", "entity_b")
        .agg(F.count("*").alias("shared"))
    )


def degree_centrality(edges: DataFrame, weight_col: str = "weight") -> DataFrame:
    """Per-node degree centrality over an undirected view of weighted edges
    (≈ ``graph_metrics.py:46-52`` nx.degree_centrality + weighted degree).

    Outputs per node: ``n_neighbors`` (distinct adjacent nodes),
    ``weighted_degree`` (Σ edge weights), and ``centrality_micros`` =
    floor(1e6 · n_neighbors / (N − 1) + 0.5) with N the total node count —
    networkx's normalization in exact integer micro-units. Cost: one union + one aggregation + one broadcast of the
    1-row node count; no iteration, no driver collect — the cheap win of the
    centrality family at 10^12 edges (betweenness/closeness need sampled
    shortest paths and stay out of the default suite)."""
    # undirected view via per-row explode, NOT a union of two selects: a
    # union re-executes the whole upstream edge-build plan twice; exploding
    # both directions from each edge row keeps it to one execution
    sym = edges.select(
        F.explode(F.array(
            F.struct(F.col("src").alias("node"), F.col("dst").alias("other"),
                     F.col(weight_col).alias("w")),
            F.struct(F.col("dst").alias("node"), F.col("src").alias("other"),
                     F.col(weight_col).alias("w")),
        )).alias("_e")
    ).select("_e.node", "_e.other", "_e.w")
    deg = sym.groupBy("node").agg(
        F.countDistinct("other").alias("n_neighbors"),
        F.sum("w").alias("weighted_degree"),
    )
    n_nodes = deg.agg(F.count("*").alias("_n"))
    # centrality in exact integer micro-units: floor on identical doubles is
    # cross-engine tie-break-free, unlike decimal ROUND (oracle-compared)
    cent = F.col("n_neighbors") * 1e6 / (F.col("_n") - 1.0)
    return deg.crossJoin(F.broadcast(n_nodes)).select(
        "node", "n_neighbors", "weighted_degree",
        F.floor(cent + 0.5).cast("long").alias("centrality_micros"),
    )
