"""Web-Mercator XYZ tiles + quadkeys: three-way twin agreement
(Spark SQL == DuckDB == numpy), known boundary values, quadkey digit
semantics, and parent-fold compatibility with the packed cell scheme."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gis_shapefile_spark.functions import cells as C
from gis_shapefile_spark.functions import webmercator as WM


def _coords(seed: int = 7, n: int = 400):
    rng = np.random.default_rng(seed)
    lng = rng.uniform(-180.0, 180.0, n)
    lat = rng.uniform(-89.9, 89.9, n)  # includes beyond-clamp latitudes
    # adversarial edges: clamp boundaries, equator/meridian, poles-ish
    edges = np.array([
        (-180.0, 0.0), (179.999999, 0.0), (0.0, 0.0),
        (0.0, WM.MAX_LAT), (0.0, -WM.MAX_LAT),
        (0.0, 89.9), (0.0, -89.9), (12.3, 45.6), (-122.33, 47.61),
    ])
    return (
        np.concatenate([lng, edges[:, 0]]),
        np.concatenate([lat, edges[:, 1]]),
    )


@pytest.mark.parametrize("z", [0, 1, 5, 12])
def test_three_way_twin_agreement(spark, z):
    lng, lat = _coords()
    pdf = pd.DataFrame({"i": range(len(lng)), "lng": lng, "lat": lat})

    sdf = (
        spark.createDataFrame(pdf)
        .select(
            "i",
            F.expr(WM.tile_x_sql("lng", z, "spark")).alias("x"),
            F.expr(WM.tile_y_sql("lat", z, "spark")).alias("y"),
            F.expr(WM.wm_cell_sql("lng", "lat", z, "spark")).alias("cell"),
            F.expr(
                WM.quadkey_sql(WM.wm_cell_sql("lng", "lat", z, "spark"), z, "spark")
            ).alias("qk"),
        )
        .toPandas()
        .sort_values("i")
        .reset_index(drop=True)
    )

    con = duckdb.connect()
    con.register("t", pdf)
    odf = con.sql(
        f"""SELECT i,
            {WM.tile_x_sql('lng', z, 'duckdb')} AS x,
            {WM.tile_y_sql('lat', z, 'duckdb')} AS y,
            {WM.wm_cell_sql('lng', 'lat', z, 'duckdb')} AS cell,
            {WM.quadkey_sql(WM.wm_cell_sql('lng', 'lat', z, 'duckdb'), z, 'duckdb')} AS qk
            FROM t ORDER BY i"""
    ).df()

    nx, ny = WM.tile_xy_np(lng, lat, z)
    ncell = WM.wm_cell_of_numpy(lng, lat, z)
    nqk = WM.quadkey_of_numpy(ncell)

    assert (sdf["x"].to_numpy() == odf["x"].to_numpy()).all()
    assert (sdf["y"].to_numpy() == odf["y"].to_numpy()).all()
    assert (sdf["cell"].to_numpy() == odf["cell"].to_numpy()).all()
    assert list(sdf["qk"]) == list(odf["qk"])
    assert (sdf["x"].to_numpy() == nx).all()
    assert (sdf["y"].to_numpy() == ny).all()
    assert (sdf["cell"].to_numpy() == ncell).all()
    assert list(sdf["qk"]) == list(nqk)


def test_known_boundary_tiles():
    z = 4
    n = 1 << z
    # world corners and center per the OSM slippy-map convention
    x, y = WM.tile_xy_np([-180.0, 0.0, 179.9999], [WM.MAX_LAT, 0.0, -WM.MAX_LAT], z)
    assert list(x) == [0, n // 2, n - 1]
    assert list(y) == [0, n // 2, n - 1]
    # beyond-clamp latitudes stay on the edge rows
    _, y2 = WM.tile_xy_np([0.0, 0.0], [89.9, -89.9], z)
    assert list(y2) == [0, n - 1]


def test_quadkey_digits_exact():
    # tile (x=3, y=5, z=3): bits msb->lsb x=011, y=101 -> digits 2,1,3
    cell = int(C.pack_xy(np.array([3]), np.array([5]), 3)[0])
    assert WM.quadkey_of_numpy([cell])[0] == "213"
    # z=0 world key is the empty string
    assert WM.quadkey_sql("x", 0, "spark") == "''"
    # quadkey prefix property: the parent's quadkey is the child's minus
    # the last digit (the basis of quadkey range scans)
    parent = int(C.pack_xy(np.array([1]), np.array([2]), 2)[0])
    assert WM.quadkey_of_numpy([parent])[0] == "21"


def test_parent_fold_compatible_with_cells(spark):
    """cells.parent_sql on packed web-mercator ids IS (z-1, x>>1, y>>1):
    the whole pyramid/layout machinery applies to map tiles unchanged."""
    lng, lat = _coords(seed=3, n=200)
    z = 9
    cells9 = WM.wm_cell_of_numpy(lng, lat, z)
    pdf = pd.DataFrame({"cell": cells9})
    out = (
        spark.createDataFrame(pdf)
        .select(F.expr(C.parent_sql("cell", z, z - 1, "spark")).alias("p"))
        .toPandas()["p"]
        .to_numpy()
    )
    expected = WM.wm_cell_of_numpy(lng, lat, z - 1)
    assert (out == expected).all()
    # and the decoded x/y halve exactly
    _, x9, y9 = C.cell_xy(cells9)
    _, x8, y8 = C.cell_xy(expected)
    assert (x8 == x9 // 2).all() and (y8 == y9 // 2).all()


def test_tile_bounds_roundtrip():
    lng, lat = _coords(seed=5, n=300)
    lat = np.clip(lat, -WM.MAX_LAT + 1e-9, WM.MAX_LAT - 1e-9)
    z = 11
    cells = WM.wm_cell_of_numpy(lng, lat, z)
    w, s, e, n_ = WM.tile_bounds_np(cells)
    assert (w <= lng).all() and (lng <= e).all()
    assert (s <= lat + 1e-9).all() and (lat <= n_ + 1e-9).all()
    # bounds are strictly ordered and nest within the world
    assert (w < e).all() and (s < n_).all()
    assert (w >= -180.0).all() and (e <= 180.0 + 1e-9).all()


# ---------------------------------------------------------------------------
# vector-tile clipping (Sutherland-Hodgman)
# ---------------------------------------------------------------------------

def test_clip_ring_square_quadrants():
    """A unit square clipped by each quadrant of a 2x2 box yields the
    expected sub-squares with exact areas."""
    import numpy as np

    from gis_shapefile_spark.operators.tiling import (
        _shoelace2, clip_ring_to_box,
    )

    xs = np.array([0.0, 2.0, 2.0, 0.0, 0.0])
    ys = np.array([0.0, 0.0, 2.0, 2.0, 0.0])
    for (mx, my) in [(0, 0), (1, 0), (0, 1), (1, 1)]:
        cx, cy = clip_ring_to_box(xs, ys, mx, my, mx + 1, my + 1)
        assert abs(abs(_shoelace2(cx, cy)) - 2.0) < 1e-12  # 2A of a 1x1
        assert cx.min() >= mx - 1e-12 and cx.max() <= mx + 1 + 1e-12
    # a disjoint box clips to nothing
    cx, cy = clip_ring_to_box(xs, ys, 5, 5, 6, 6)
    assert len(cx) == 0
    # a box containing the ring returns it unchanged (closed)
    cx, cy = clip_ring_to_box(xs, ys, -1, -1, 3, 3)
    assert abs(abs(_shoelace2(cx, cy)) - 8.0) < 1e-12
    assert cx[0] == cx[-1] and cy[0] == cy[-1]


def test_clip_polygons_to_tiles_conserves_area(spark):
    """Tile boxes partition the plane, so per feature the SUM of
    clipped areas over its tiles equals its own shell-minus-holes
    area — the conservation law that vouches the whole operator
    (S-H boundary-run degeneracies cancel in the shoelace)."""
    import numpy as np

    from gis_shapefile_spark.operators.tiling import (
        _shoelace2, clip_polygons_to_tiles,
    )
    from gis_shapefile_spark.sources import fixtures as FX

    feats = FX.make_features()
    feats = feats[(feats.shape_type == 5) & (~feats.deleted)]
    res = 5
    out = clip_polygons_to_tiles(spark, feats, res=res).toPandas()
    assert len(out) > 51  # multi-tile features exist at res 5
    got_area = out.groupby("record_number").area2.sum()
    for _, r in feats.iterrows():
        sizes = [int(s) for s in r["ring_sizes"]]
        offs = np.cumsum([0] + sizes)
        xs = np.asarray(r["xs"], np.float64)  # r.xs is Series.xs (method)
        ys = np.asarray(r["ys"], np.float64)
        a2 = abs(_shoelace2(xs[offs[0]:offs[1]], ys[offs[0]:offs[1]]))
        for i in range(1, len(sizes)):
            a2 -= abs(_shoelace2(xs[offs[i]:offs[i + 1]],
                                 ys[offs[i]:offs[i + 1]]))
        assert abs(got_area[int(r["record_number"])] - a2) < 1e-9, \
            r["record_number"]
    # every clipped vertex lies inside its tile box
    from gis_shapefile_spark.functions import cells as C

    for _, row in out.head(50).iterrows():
        minx, miny, maxx, maxy = (
            float(v[0]) for v in C.cell_bounds(np.asarray([row.cell]))
        )
        assert min(row["xs"]) >= minx - 1e-9 \
            and max(row["xs"]) <= maxx + 1e-9
        assert min(row["ys"]) >= miny - 1e-9 \
            and max(row["ys"]) <= maxy + 1e-9


def test_clip_polygons_hole_spanning_tiles(spark):
    """A ring with a hole clipped across a 2-tile split keeps the hole
    subtracted on both sides (positional roles survive the clip)."""
    import numpy as np
    import pandas as pd

    from gis_shapefile_spark.operators.tiling import clip_polygons_to_tiles

    # shell 10x4 centered on a tile boundary at res 4 (tiles 22.5 x 11.25
    # deg); hole 4x2 straddling the same boundary
    feats = pd.DataFrame(
        [
            dict(
                record_number=1,
                shape_type=5,
                deleted=False,
                xs=[-5.0, 5.0, 5.0, -5.0, -5.0, -2.0, 2.0, 2.0, -2.0, -2.0],
                ys=[10.0, 10.0, 14.0, 14.0, 10.0, 11.0, 11.0, 13.0, 13.0,
                    11.0],
                ring_sizes=[5, 5],
                minx=-5.0, miny=10.0, maxx=5.0, maxy=14.0,
            )
        ]
    )
    out = clip_polygons_to_tiles(spark, feats, res=4).toPandas()
    # res-4 tile boundaries at x=0 AND y=11.25 both cross it: 4 tiles
    assert len(out) == 4
    assert sorted(out.n_rings) == [2, 2, 2, 2]  # hole on every side
    total = out.area2.sum()
    assert abs(total - ((10 * 4 - 4 * 2) * 2)) < 1e-9  # 2A of 40-8
