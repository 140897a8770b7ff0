"""Grid-DBSCAN hotspot clustering (operators/clustering.py).

Pinned against a pure-python oracle (dict histogram + union-find over
8-adjacent core cells) on planted blob layouts, plus the lattice edge
cases the SQL formulation could get wrong: no wraparound across grid
edges, diagonal adjacency counted, sub-threshold cells excluded and
never bridging two hotspots.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from gis_shapefile_spark.functions import cells as C
from gis_shapefile_spark.operators.clustering import hotspot_clusters

RES = 6
N = 1 << RES
DLNG = 360.0 / N
DLAT = 180.0 / N


def _pt(gx, gy):
    """A point at the center of grid cell (gx, gy)."""
    return (-180.0 + (gx + 0.5) * DLNG, -90.0 + (gy + 0.5) * DLAT)


def _mk_points(spark, cell_counts):
    rows = []
    for (gx, gy), n in cell_counts.items():
        lng, lat = _pt(gx, gy)
        rows += [(lng, lat)] * n
    return spark.createDataFrame(rows, "lng double, lat double")


def _oracle(cell_counts, min_count):
    """Union-find over 8-adjacent core grid coords -> {coord: label}."""
    core = {k: n for k, n in cell_counts.items() if n >= min_count}
    parent = {k: k for k in core}

    def find(k):
        while parent[k] != k:
            parent[k] = parent[parent[k]]
            k = parent[k]
        return k

    for (x, y) in core:
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nb = (x + dx, y + dy)
                if nb in core and nb != (x, y):
                    ra, rb = find((x, y)), find(nb)
                    if ra != rb:
                        parent[rb] = ra
    # label = min packed cell id in the component (what the engine emits)
    packed = {k: int(C.pack_xy(np.array([k[0]]), np.array([k[1]]), RES)[0])
              for k in core}
    comp_min: dict = {}
    for k in core:
        r = find(k)
        comp_min[r] = min(comp_min.get(r, packed[k]), packed[k])
    return {packed[k]: (core[k], comp_min[find(k)]) for k in core}


def _run(spark, cell_counts, min_count):
    out = hotspot_clusters(
        _mk_points(spark, cell_counts), res=RES, min_count=min_count
    ).collect()
    return {r.cell: (r.n_points, r.cluster) for r in out}


def test_blobs_match_union_find_oracle(spark):
    """Two diagonal-linked blobs + an isolated core + noise cells."""
    counts = {
        # blob A: L-shape with a diagonal link
        (10, 10): 5, (11, 10): 6, (11, 11): 7, (12, 12): 5,
        # blob B: separated by >1 cell
        (20, 10): 9, (21, 10): 4,
        # isolated core
        (40, 40): 11,
        # noise (below threshold)
        (10, 11): 2, (15, 10): 3,
    }
    got = _run(spark, counts, min_count=4)
    assert got == _oracle(counts, 4)
    # structure sanity: blob A is ONE cluster including the diagonal cell
    labels = {got[c][1] for c in got if got[c][0] in (5, 6, 7)}
    assert len(labels) == 1


def test_sparse_cell_does_not_bridge(spark):
    """A sub-threshold cell between two hotspots must not merge them
    (DBSCAN noise semantics on the grid)."""
    counts = {(5, 5): 10, (6, 5): 2, (7, 5): 10}
    got = _run(spark, counts, min_count=5)
    assert len(got) == 2
    assert len({v[1] for v in got.values()}) == 2
    # drop the gap below ANY threshold relevance: raising its count merges
    counts[(6, 5)] = 5
    got2 = _run(spark, counts, min_count=5)
    assert len({v[1] for v in got2.values()}) == 1


def test_no_wraparound_at_grid_edges(spark):
    """Core cells on opposite grid edges (x=0 and x=N-1, same y) are NOT
    adjacent: the planar contract — and the out-of-range neighbor index
    from the edge cell must not alias any real cell."""
    counts = {(0, 30): 8, (N - 1, 30): 8, (0, 0): 8, (N - 1, N - 1): 8}
    got = _run(spark, counts, min_count=4)
    assert len(got) == 4
    assert len({v[1] for v in got.values()}) == 4  # all singletons


def test_min_count_and_res_validation(spark):
    pts = _mk_points(spark, {(1, 1): 3})
    with pytest.raises(ValueError, match="res"):
        hotspot_clusters(pts, res=26, min_count=1)
    with pytest.raises(ValueError, match="min_count"):
        hotspot_clusters(pts, res=6, min_count=0)


def test_engine_matches_duckdb_twin_on_fixture(spark):
    """The dual-dialect twin (driver oracle) agrees with the engine on
    the real images fixture — the same comparison the gate runs."""
    import duckdb

    from gis_shapefile_spark.operators.clustering import hotspot_cluster_sql
    from gis_shapefile_spark.sources import fixtures as FX

    path = FX.images_parquet_path(n=2000)
    sdf = (
        hotspot_clusters(spark.read.parquet(path), res=6, min_count=12)
        .toPandas().sort_values("cell").reset_index(drop=True)
    )
    con = duckdb.connect()  # hold the ref: a chained temp connection GCs
    odf = (
        con.sql(hotspot_cluster_sql(
            f"SELECT lng, lat FROM read_parquet('{path}')", 6, 12
        ))
        .df().sort_values("cell").reset_index(drop=True)
    )
    assert len(sdf) == len(odf) > 10
    assert sdf.cluster.nunique() > 1  # the planted skew shows up
    pd.testing.assert_frame_equal(sdf, odf.astype(sdf.dtypes.to_dict()))
