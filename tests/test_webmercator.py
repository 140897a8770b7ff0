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
