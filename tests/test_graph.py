"""Bounded-hop shortest paths (operators/graph.py).

The python twin below is the literal Bellman-Ford recurrence the engine
distributes: iteration h's state maps (root, node) -> min total weight
over walks of <= h edges, relaxing ONLY from the previous iteration's
state (exactly the engine's union(state, state |x| edges) + integer
min). The reference has no graph surface (nearest-feature is one R-tree
descent, spatial_index.cpp:151-275); this layer is the engine addition
over its own proximity-join edges.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gis_shapefile_spark.operators import graph as GR


def _twin(edges, roots, hops):
    """(root, node) -> dist over walks of <= hops edges. edges directed."""
    out = {(r, r): 0 for r in roots}
    by_src: dict = {}
    for a, b, w in edges:
        by_src.setdefault(a, []).append((b, w))
    for _ in range(hops):
        prev = dict(out)
        for (r, u), d in prev.items():
            for b, w in by_src.get(u, ()):
                k = (r, b)
                if k not in out or out[k] > d + w:
                    out[k] = d + w
    return out


def _run(spark, edges, roots, hops):
    edf = spark.createDataFrame(edges, "src long, dst long, w_u long")
    rdf = spark.createDataFrame([(r,) for r in roots], "root long")
    got = GR.shortest_paths(edf, rdf, max_hops=hops).collect()
    return {(r.root, r.node): r.dist_u for r in got}


def test_relaxation_beats_greedy_first_hop(spark):
    """Diamond: the direct edge (w=10) is found at hop 1, the 2-edge
    detour (1 + 2) must OVERWRITE it at hop 2 — pins that relaxation
    keeps improving already-reached nodes, the property a greedy
    frontier-only traversal lacks."""
    edges = [(1, 2, 10), (1, 3, 1), (3, 2, 2)]
    assert _run(spark, edges, [1], 1) == {(1, 1): 0, (1, 2): 10, (1, 3): 1}
    assert _run(spark, edges, [1], 2) == {(1, 1): 0, (1, 2): 3, (1, 3): 1}


def test_hop_bound_censors_and_disconnected_absent(spark):
    """Chain 1-2-3-4-5 at hops=2: node 4 reached (2 edges), node 5 NOT
    (needs 3); isolated node 9 never appears; a second root has its own
    independent ball."""
    chain = [(i, i + 1, 1) for i in range(1, 5)]
    edges = chain + [(i + 1, i, 1) for i in range(1, 5)]
    got = _run(spark, edges, [1, 5], 2)
    assert got == _twin(edges, [1, 5], 2)
    assert (1, 4) not in got and (1, 5) not in got
    assert got[(1, 3)] == 2 and got[(5, 3)] == 2
    assert all(n != 9 for (_, n) in got)


def test_matches_python_twin_on_random_graph(spark):
    rng = np.random.RandomState(11)
    n = 40
    edges = []
    for _ in range(160):
        a, b = rng.randint(1, n + 1, 2)
        if a != b:
            w = int(rng.randint(1, 50))
            edges.append((int(a), int(b), w))
            edges.append((int(b), int(a), w))
    roots = [1, 2, 3]
    for hops in (1, 3):
        assert _run(spark, edges, roots, hops) == _twin(edges, roots, hops)


def test_reachable_counts_rollup(spark):
    edges = [(1, 2, 5), (2, 3, 7), (4, 5, 1)]
    edf = spark.createDataFrame(edges, "src long, dst long, w_u long")
    rdf = spark.createDataFrame([(1,), (4,)], "root long")
    paths = GR.shortest_paths(edf, rdf, max_hops=3)
    got = {
        r.root: (r.n_reached, r.max_dist_u, r.sum_dist_u)
        for r in GR.reachable_counts(paths).collect()
    }
    # root 1 reaches {1:0, 2:5, 3:12}; root 4 reaches {4:0, 5:1}
    assert got == {1: (3, 12, 17), 4: (2, 1, 1)}


def test_rejects_zero_hops(spark):
    with pytest.raises(ValueError):
        GR.shortest_paths(None, None, max_hops=0)


def _pr_twin(edges, iters):
    """Integerized PageRank recurrence (the engine's exact tree:
    floor((0.85 * r) / deg) per edge, integer sums, +150000 base)."""
    import math

    nodes = sorted({a for a, b in edges} | {b for a, b in edges})
    deg = {}
    for a, _ in edges:
        deg[a] = deg.get(a, 0) + 1
    r = {n: 1_000_000 for n in nodes}
    for _ in range(iters):
        m = {n: 0 for n in nodes}
        for a, b in edges:
            m[b] += math.floor(0.85 * r[a] / deg[a])
        r = {n: 150_000 + m[n] for n in nodes}
    return r


def test_pagerank_star_and_twin(spark):
    """Star graph: the hub out-ranks every leaf, exact values == the
    integerized python twin; a leaf-only receiver (dangling node) keeps
    its base+inflow and leaks nothing back — no crash, documented naive
    semantics."""
    edges = [(i, 99, 1) for i in range(1, 6)] + [(99, i, 1) for i in range(1, 6)]
    e = [(a, b) for a, b, _ in edges] + [(7, 99)]  # 7 is dangling-source only
    edf = spark.createDataFrame(e, "src long, dst long")
    got = {r.node: r.r_u for r in GR.pagerank(edf, iters=3).collect()}
    exp = _pr_twin(e, 3)
    assert got == exp
    assert got[99] > max(got[i] for i in range(1, 6))
    assert 7 in got  # appears as a node (it has an out-edge)


def test_pagerank_matches_twin_on_random_graph(spark):
    rng = np.random.RandomState(23)
    e = set()
    while len(e) < 120:
        a, b = rng.randint(1, 30, 2)
        if a != b:
            e.add((int(a), int(b)))
    e = sorted(e)
    edf = spark.createDataFrame(e, "src long, dst long")
    for iters in (1, 4):
        got = {r.node: r.r_u for r in GR.pagerank(edf, iters=iters).collect()}
        assert got == _pr_twin(e, iters), iters


def test_pagerank_oracle_sql_matches_twin():
    """The unrolled-CTE DuckDB twin (no Spark involved) == the python
    recurrence — closes the engine == oracle == twin triangle."""
    import duckdb

    e = [(1, 2), (2, 1), (2, 3), (3, 1), (4, 1)]
    vals = ", ".join(f"({a}, {b})" for a, b in e)
    sql = GR.pagerank_oracle_sql(
        f"SELECT src, dst FROM (VALUES {vals}) AS t(src, dst)", iters=3
    )
    con = duckdb.connect()
    got = {int(r.node): int(r.r_u) for r in con.sql(sql).df().itertuples()}
    assert got == _pr_twin(e, 3)


def test_pagerank_rejects_zero_iters(spark):
    with pytest.raises(ValueError):
        GR.pagerank(None, iters=0)
    with pytest.raises(ValueError):
        GR.pagerank_oracle_sql("SELECT 1", iters=0)


def test_isochrone_banding_rollup(spark):
    """Service-area bands over a known distance field: chain weights
    place nodes in exact bands (floor(dist / width)); counts and
    per-band max distances pin the rollup."""
    from pyspark.sql import functions as F

    edges = [(1, 2, 3), (2, 1, 3), (2, 3, 4), (3, 2, 4)]
    edf = spark.createDataFrame(edges, "src long, dst long, w_u long")
    rdf = spark.createDataFrame([(1,)], "root long")
    paths = GR.shortest_paths(edf, rdf, max_hops=2)  # {1:0, 2:3, 3:7}
    width = 5
    got = {
        (r.root, r.band): (r.n_nodes, r.max_dist_u)
        for r in paths.selectExpr(
            "root", "dist_u",
            f"CAST(floor(CAST(dist_u AS DOUBLE) / CAST({width} AS DOUBLE))"
            " AS BIGINT) AS band",
        )
        .groupBy("root", "band")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"),
             F.max("dist_u").alias("max_dist_u"))
        .collect()
    }
    assert got == {(1, 0): (2, 3), (1, 1): (1, 7)}


def _tri_twin(pairs):
    """Brute python triangle membership + degree (set-based)."""
    adj: dict = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {n: len(s) for n, s in adj.items()}
    tri = {n: 0 for n in adj}
    seen = set()
    for a, b in pairs:
        for c in adj[a] & adj[b]:
            t = tuple(sorted((a, b, c)))
            if t not in seen:
                seen.add(t)
                for n in t:
                    tri[n] += 1
    return {n: (deg[n], tri[n]) for n in adj}


def test_triangle_counts_micro(spark):
    """Planted structure: one triangle (1,2,3), a square (4,5,6,7 — no
    triangle), a pendant (8). Exact membership counts, zero rows for
    triangle-free nodes still present with their degree."""
    pairs = [(1, 2), (1, 3), (2, 3), (4, 5), (5, 6), (6, 7), (4, 7), (3, 8)]
    df = spark.createDataFrame(pairs, "id_1 long, id_2 long")
    got = {
        r.node: (r.degree, r.n_triangles)
        for r in GR.triangle_counts(df).collect()
    }
    assert got == _tri_twin(pairs)
    assert got[1] == (2, 1) and got[3] == (3, 1)
    assert got[4] == (2, 0) and got[8] == (1, 0)


def test_triangle_counts_random_graph_vs_twin(spark):
    """Random graph incl. a celebrity node connected to everyone (the
    degree-orientation stress: its out-degree stays tiny) == brute."""
    rng = np.random.RandomState(17)
    pairs = set()
    while len(pairs) < 150:
        a, b = sorted(rng.randint(1, 40, 2))
        if a != b:
            pairs.add((int(a), int(b)))
    pairs |= {(i, 99) for i in range(1, 40)}  # celebrity
    pairs = sorted(pairs)
    df = spark.createDataFrame(pairs, "id_1 long, id_2 long")
    got = {
        r.node: (r.degree, r.n_triangles)
        for r in GR.triangle_counts(df).collect()
    }
    exp = _tri_twin(pairs)
    assert got == exp
    total = sum(t for _, t in got.values())
    assert total % 3 == 0 and total > 0  # each triangle counted 3x by node


def test_triangle_counts_normalizes_unordered_edges(spark):
    """Edges given in either order (and duplicated both ways) count
    once; self-loops drop."""
    pairs = [(2, 1), (1, 3), (3, 2), (2, 3), (5, 5)]
    df = spark.createDataFrame(pairs, "id_1 long, id_2 long")
    got = {
        r.node: (r.degree, r.n_triangles)
        for r in GR.triangle_counts(df).collect()
    }
    assert got == {1: (2, 1), 2: (2, 1), 3: (2, 1)}
