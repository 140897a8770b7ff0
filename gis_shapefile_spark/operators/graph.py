"""Bounded-hop graph traversal over spatial proximity edges.

The reference has no graph surface (its nearest-feature answers come
from one R-tree descent, ``spatial_index.cpp:151-275``); the engine adds
the next question a road/mobility pipeline asks after proximity pairing:
*how far is everything from here along the network* — reachability and
shortest distance over the edge set that ``within_distance_self_join``
(or a road topology) already produces.

Execution model (the part that must survive 100 TB): Bellman-Ford
relaxation, NOT path enumeration. The frontier state is one row per
(root, node) with the best-known integer distance; each hop is one
equi-join of the state against the edge table on the node key plus a
min-aggregation — O(hops x |E|) work, two shuffles per hop, zero Python.
Lineage is cut with an eager localCheckpoint every iteration (the loop
would otherwise stack H joins into one exponential plan — the
``zonal_stats`` planning-blowup lesson applied to iteration). The DuckDB
oracle, by contrast, ENUMERATES walks with a recursive CTE — exponential
in the hop bound — which is exactly why the distributed form is the one
that scales and the recursive SQL is only the small-scale truth twin.

Determinism: edge weights are pre-integerized BIGINTs (floor(dist *
1e6) from the pair join); path distances are BIGINT sums and the
per-(root, node) reduction is an integer ``min`` — no float ever enters
the iteration, so Spark and DuckDB agree bit-for-bit regardless of
join order, partitioning, or accumulation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def shortest_paths(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int,
    src_col: str = "src",
    dst_col: str = "dst",
    w_col: str = "w_u",
    root_col: str = "root",
) -> DataFrame:
    """Multi-source bounded-hop shortest paths (Bellman-Ford).

    ``edges``: directed (src, dst, w_u BIGINT >= 0) — symmetrize before
    calling for an undirected graph. ``sources``: one column
    ``root_col`` of start nodes. After ``max_hops`` relaxations the
    state holds, for every (root, node) pair connected by a walk of at
    most ``max_hops`` edges, the MINIMUM total weight over such walks
    (== the true shortest-path distance whenever the shortest path uses
    at most ``max_hops`` edges; roots reach themselves at distance 0).

    Returns (root, node, dist_u). Each iteration costs one join + one
    groupBy — the state is checkpointed eagerly so the loop's plan stays
    one hop deep and failed stages re-run from materialized frontiers,
    not from the start of the loop (the resumability contract of the
    checkpoint journal, applied in-memory).
    """
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    e = edges.select(
        F.col(src_col).alias("_es"),
        F.col(dst_col).alias("_ed"),
        F.col(w_col).cast("long").alias("_ew"),
    )
    state = sources.select(
        F.col(root_col).alias("root"),
        F.col(root_col).alias("node"),
        F.lit(0).cast("long").alias("dist_u"),
    )
    for _ in range(max_hops):
        relaxed = (
            state.join(e, state["node"] == e["_es"])
            .select(
                "root",
                F.col("_ed").alias("node"),
                (F.col("dist_u") + F.col("_ew")).alias("dist_u"),
            )
        )
        state = (
            state.unionByName(relaxed)
            .groupBy("root", "node")
            .agg(F.min("dist_u").alias("dist_u"))
            .localCheckpoint(eager=True)
        )
    return state


def reachable_counts(paths: DataFrame) -> DataFrame:
    """Rollup of a ``shortest_paths`` result: per root, how many nodes
    are reachable inside the hop bound and the max/mean shortest
    distance — the coverage statistic a dispatch/geofence planner reads
    (integer-exact: sum/count/max over BIGINTs)."""
    return paths.groupBy("root").agg(
        F.count("*").cast("long").alias("n_reached"),
        F.max("dist_u").alias("max_dist_u"),
        F.sum("dist_u").alias("sum_dist_u"),
    )
