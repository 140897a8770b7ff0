"""Raster kernel smoothing: exact single-point kernel stamps, grid-edge
truncation, dense numpy-convolution parity, and kernel validation."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from gis_shapefile_spark.functions import cells as C
from gis_shapefile_spark.operators import raster as R

RES = 6
N_AXIS = 1 << RES
# cell extents at res 6: 360/64 deg in lng, 180/64 deg in lat
DLNG = 360.0 / N_AXIS
DLAT = 180.0 / N_AXIS


def _cell_center(xi: int, yi: int) -> tuple[float, float]:
    return (-180.0 + (xi + 0.5) * DLNG, -90.0 + (yi + 0.5) * DLAT)


def _pts_df(spark, xy_counts):
    rows = []
    for (xi, yi), n in xy_counts.items():
        lng, lat = _cell_center(xi, yi)
        rows.extend({"lng": lng, "lat": lat} for _ in range(n))
    return spark.createDataFrame(pd.DataFrame(rows))


def _dense_oracle(xy_counts, radius, kernel):
    grid = np.zeros((N_AXIS, N_AXIS), np.int64)  # [xi, yi]
    for (xi, yi), n in xy_counts.items():
        grid[xi, yi] += n
    out = np.zeros_like(grid)
    for dx, dy, w in R.kernel_weights(radius, kernel):
        src = grid
        shifted = np.zeros_like(grid)
        xs = slice(max(0, dx), N_AXIS + min(0, dx))
        ys = slice(max(0, dy), N_AXIS + min(0, dy))
        xs_src = slice(max(0, -dx), N_AXIS + min(0, -dx))
        ys_src = slice(max(0, -dy), N_AXIS + min(0, -dy))
        shifted[xs, ys] = src[xs_src, ys_src]
        out += w * shifted
    return out


def _collect(df) -> dict[tuple[int, int], int]:
    pdf = df.toPandas()
    return {
        (int(r.xi), int(r.yi)): int(r.density) for r in pdf.itertuples()
    }


def test_single_interior_point_stamps_kernel(spark):
    xi, yi = 20, 30
    out = _collect(
        R.smooth_density(_pts_df(spark, {(xi, yi): 1}), RES, radius=2)
    )
    want = {
        (xi + dx, yi + dy): w for dx, dy, w in R.kernel_weights(2, "tent")
    }
    assert out == want
    # tent kernel total mass: ((r+1)^2)^2 = 81 at r=2
    assert sum(out.values()) == 81


def test_corner_truncation_drops_offgrid_mass(spark):
    out = _collect(
        R.smooth_density(_pts_df(spark, {(0, 0): 5}), RES, radius=2)
    )
    want = {
        (dx, dy): 5 * w
        for dx, dy, w in R.kernel_weights(2, "tent")
        if dx >= 0 and dy >= 0
    }
    assert out == want
    assert all(x >= 0 and y >= 0 for x, y in out)
    assert sum(out.values()) < 5 * 81  # mass truncated, not renormalized


def test_matches_dense_numpy_convolution(spark):
    rng = np.random.default_rng(23)
    xy_counts = {
        (int(rng.integers(0, N_AXIS)), int(rng.integers(0, N_AXIS))): int(n)
        for n in rng.integers(1, 9, size=60)
    }
    for kernel, radius in (("tent", 2), ("box", 1), ("tent", 3)):
        out = _collect(
            R.smooth_density(
                _pts_df(spark, xy_counts), RES, radius=radius, kernel=kernel
            )
        )
        dense = _dense_oracle(xy_counts, radius, kernel)
        want = {
            (x, y): int(dense[x, y])
            for x, y in zip(*np.nonzero(dense))
        }
        assert out == want, f"{kernel} r={radius}"


def test_cell_ids_consistent_with_axes(spark):
    out = R.smooth_density(
        _pts_df(spark, {(10, 11): 1}), RES, radius=1
    ).toPandas()
    cr, cx, cy = C.cell_xy(out["cell"].to_numpy(np.int64))
    assert (cr == RES).all()
    assert (cx == out["xi"].to_numpy()).all()
    assert (cy == out["yi"].to_numpy()).all()


def test_kernel_validation():
    with pytest.raises(ValueError):
        R.kernel_weights(0, "tent")
    with pytest.raises(ValueError):
        R.kernel_weights(2, "gauss")
    with pytest.raises(ValueError):
        R.smooth_density(None, res=99)


def test_density_contours_matches_dense_oracle(spark):
    """Rectangles decompose back to exactly the level-classified cells:
    disjoint cover, every covered cell at the rectangle's level."""
    rng = np.random.default_rng(41)
    xy_counts = {
        (int(rng.integers(5, 40)), int(rng.integers(5, 40))): int(n)
        for n in rng.integers(1, 20, size=80)
    }
    thresholds = (10, 40, 90)
    out = R.density_contours(
        _pts_df(spark, xy_counts), RES, thresholds=thresholds, radius=2
    ).toPandas()
    dense = _dense_oracle(xy_counts, 2, "tent")
    want = {}
    for x, y in zip(*np.nonzero(dense)):
        lvl = int(sum(dense[x, y] >= t for t in thresholds))
        if lvl >= 1:
            want[(int(x), int(y))] = lvl
    got = {}
    for r in out.itertuples():
        for x in range(int(r.x0), int(r.x1) + 1):
            for y in range(int(r.y0), int(r.y1) + 1):
                assert (x, y) not in got, "rectangles overlap"
                got[(x, y)] = int(r.level)
        assert (int(r.x1) - int(r.x0) + 1) * (int(r.y1) - int(r.y0) + 1) == int(
            r.n_cells
        )
    assert got == want
    assert len(set(out["level"])) >= 2  # the fixture exercises >1 band


def test_density_contours_validates_thresholds(spark):
    with pytest.raises(ValueError):
        R.density_contours(None, RES, thresholds=())
    with pytest.raises(ValueError):
        R.density_contours(None, RES, thresholds=(50, 10))


# ---------------------------------------------------------------------------
# adaptive quadtree binning
# ---------------------------------------------------------------------------

def _quadtree_oracle(pts, max_res, cap):
    """Recursive reference: subdivide any overfull occupied cell until
    cap or max depth. Returns {(res, cell): n}."""
    from gis_shapefile_spark.functions import cells as CC

    lng = np.array([p[0] for p in pts])
    lat = np.array([p[1] for p in pts])
    out = {}

    def rec(res, mask):
        n = int(mask.sum())
        cells = CC.cell_of_numpy(lng[mask], lat[mask], res)
        for c in np.unique(cells):
            m2 = np.zeros(len(lng), bool)
            m2[np.flatnonzero(mask)[cells == c]] = True
            nc = int(m2.sum())
            if nc <= cap or res == max_res:
                out[(res, int(c))] = nc
            else:
                rec(res + 1, m2)

    root_n = len(pts)
    if root_n <= cap:
        cells = CC.cell_of_numpy(lng, lat, 0)
        for c in np.unique(cells):
            out[(0, int(c))] = int((cells == c).sum())
    else:
        rec(1, np.ones(len(lng), bool))
    return out


def test_adaptive_grid_matches_recursive_oracle(spark):
    from gis_shapefile_spark.operators import tiling as TI

    rng = np.random.default_rng(47)
    # dense cluster + sparse scatter: forces mixed leaf depths
    pts = [(float(g), float(t)) for g, t in zip(
        np.concatenate([rng.uniform(-100.2, -100.0, 300), rng.uniform(-125, -66, 60)]),
        np.concatenate([rng.uniform(40.0, 40.2, 300), rng.uniform(24, 50, 60)]),
    )]
    df = spark.createDataFrame(pd.DataFrame(pts, columns=["lng", "lat"]))
    out = TI.adaptive_grid(df, max_res=8, cap=20)
    got = {(int(r.res), int(r.cell)): int(r.n_points) for r in out.collect()}
    assert got == _quadtree_oracle(pts, 8, 20)
    # mixed depths actually exercised
    assert len({r for r, _ in got}) >= 3


def test_adaptive_grid_disjoint_cover_and_cap(spark):
    from gis_shapefile_spark.functions import cells as CC
    from gis_shapefile_spark.operators import tiling as TI

    rng = np.random.default_rng(53)
    lng = rng.uniform(-125, -66, 500)
    lat = rng.uniform(24, 50, 500)
    df = spark.createDataFrame(pd.DataFrame({"lng": lng, "lat": lat}))
    leaves = {
        (int(r.res), int(r.cell)): int(r.n_points)
        for r in TI.adaptive_grid(df, max_res=9, cap=30).collect()
    }
    # every point has EXACTLY one leaf ancestor
    for g, t in zip(lng, lat):
        hits = [
            (r, c) for (r, c) in leaves
            if int(CC.cell_of_numpy(np.array([g]), np.array([t]), r)[0]) == c
        ]
        assert len(hits) == 1, (g, t, hits)
    # cap respected except at max depth; totals conserve
    assert all(n <= 30 for (r, _), n in leaves.items() if r < 9)
    assert sum(leaves.values()) == 500


def test_adaptive_grid_validation(spark):
    from gis_shapefile_spark.operators import tiling as TI

    with pytest.raises(ValueError):
        TI.adaptive_grid(None, max_res=0, cap=5)
    with pytest.raises(ValueError):
        TI.adaptive_grid(None, max_res=5, cap=0)


# ---------------------------------------------------------------------------
# IDW surface interpolation
# ---------------------------------------------------------------------------

def _idw_numpy(pdf, res):
    """Python twin of idw_surface: exact integer dsq, the same two
    float64 divides (IEEE-identical to both engines)."""
    from gis_shapefile_spark.operators import raster as RA

    xstep, ystep = RA._idw_steps(res)
    r2 = ystep * ystep
    n = 1 << res
    sx = np.floor(pdf.lng.values * 1e6).astype(np.int64)
    sy = np.floor(pdf.lat.values * 1e6).astype(np.int64)
    v = pdf.v_u.values.astype(np.int64)
    xi = np.clip(((pdf.lng.values + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)
    yi = np.clip(((pdf.lat.values + 90.0) / 180.0 * n).astype(np.int64), 0, n - 1)
    out = {}
    for gx in range(xi.min(), xi.max() + 1):
        for gy in range(yi.min(), yi.max() + 1):
            cx = -180_000_000 + gx * xstep + xstep // 2
            cy = -90_000_000 + gy * ystep + ystep // 2
            dsq = (sx - cx) ** 2 + (sy - cy) ** 2
            m = dsq <= r2
            if not m.any():
                continue
            w = np.minimum(
                10 ** 9,
                np.floor(
                    np.float64(10 ** 15) / np.maximum(dsq[m], 1).astype(np.float64)
                ).astype(np.int64),
            )
            sum_w, sum_wv = int(w.sum()), int((w * v[m]).sum())
            out[(gx, gy)] = (
                int(m.sum()), sum_w, sum_wv,
                int(np.floor(np.float64(sum_wv) / np.float64(sum_w))),
            )
    return out


def test_idw_matches_numpy_oracle(spark):
    from gis_shapefile_spark.operators import raster as RA

    rng = np.random.default_rng(3)
    n = 500
    pdf = pd.DataFrame(
        dict(
            lng=rng.uniform(-100, -90, n),
            lat=rng.uniform(30, 38, n),
            v_u=rng.integers(0, 100000, n),
        )
    )
    got = RA.idw_surface(spark, spark.createDataFrame(pdf), res=7).toPandas()
    exp = _idw_numpy(pdf, 7)
    assert len(got) == len(exp) > 15

    def compact(v):
        v &= 0x5555555555555555
        v = (v | (v >> 1)) & 0x3333333333333333
        v = (v | (v >> 2)) & 0x0F0F0F0F0F0F0F0F
        v = (v | (v >> 4)) & 0x00FF00FF00FF00FF
        v = (v | (v >> 8)) & 0x0000FFFF0000FFFF
        return (v | (v >> 16)) & ((1 << 26) - 1)

    for r in got.itertuples(index=False):
        morton = int(r.cell) & ((1 << 52) - 1)
        key = (compact(morton), compact(morton >> 1))
        assert key in exp, key
        assert (int(r.n_samples), int(r.sum_w), int(r.sum_wv),
                int(r.idw_u)) == exp[key]


def test_idw_constant_field_and_center_sample(spark):
    """A uniform-value field interpolates to exactly that value in every
    cell, and a sample AT a cell center (dsq 0 -> clamped 1 -> weight
    capped) does not blow up."""
    from gis_shapefile_spark.operators import raster as RA

    res = 6
    xstep, ystep = RA._idw_steps(res)
    # sample exactly at the center of cell (40, 30) + a ring of others
    cx = (-180_000_000 + 40 * xstep + xstep // 2) / 1e6
    cy = (-90_000_000 + 30 * ystep + ystep // 2) / 1e6
    pdf = pd.DataFrame(
        dict(
            lng=[cx, cx + 0.3, cx - 0.3, cx, cx],
            lat=[cy, cy, cy, cy + 0.3, cy - 0.3],
            v_u=[777] * 5,
        )
    )
    got = RA.idw_surface(spark, spark.createDataFrame(pdf), res=res).toPandas()
    assert len(got) > 0
    assert (got.idw_u == 777).all()
    assert int(got.sum_w.max()) >= 10 ** 9  # the capped center weight


def test_idw_loocv_matches_python_twin(spark):
    """== python leave-one-out twin (same capped weights over the
    µdeg-floored pair distance), and a SMOOTH field cross-validates
    well while pure noise does not."""
    from gis_shapefile_spark.operators import raster as RA

    rng = np.random.default_rng(9)
    n = 200
    lng = rng.uniform(-100, -95, n)
    lat = rng.uniform(30, 34, n)
    v_smooth = np.floor((lng + 100) * 1000 + (lat - 30) * 2000).astype(
        np.int64
    )
    pdf = pd.DataFrame(
        dict(point_id=np.arange(n), lng=lng, lat=lat, v_u=v_smooth)
    )
    radius = 0.8
    got = RA.idw_loocv(
        spark.createDataFrame(pdf), radius=radius
    ).toPandas().iloc[0]

    # python twin with identical integer semantics
    d = np.sqrt(
        (lng[:, None] - lng[None, :]) ** 2
        + (lat[:, None] - lat[None, :]) ** 2
    )
    du = np.floor(d * 1e6).astype(np.int64)
    np.fill_diagonal(du, np.iinfo(np.int64).max)
    np.fill_diagonal(d, np.inf)
    n_pred, sum_err, max_err = 0, 0, 0
    for i in range(n):
        # mirror the ENGINE's order (round-4 advice): admit on the RAW
        # double distance first (the pair join's d <= radius filter),
        # floor to µdeg only for the weight — a pair with d in
        # (radius, (floor(radius*1e6)+1)/1e6) must NOT be admitted via
        # the floored comparison (latent flake if fixture/radius moves)
        m = d[i] <= radius
        if not m.any():
            continue
        w = np.minimum(
            10 ** 9,
            np.floor(
                np.float64(10 ** 15)
                / np.maximum(du[i][m].astype(np.float64) ** 2, 1)
            ).astype(np.int64),
        )
        vhat = int(np.floor(
            np.float64(int((w * v_smooth[m]).sum()))
            / np.float64(int(w.sum()))
        ))
        e = abs(vhat - int(v_smooth[i]))
        n_pred += 1
        sum_err += e
        max_err = max(max_err, e)
    assert (int(got.n_samples), int(got.n_pred)) == (n, n_pred)
    assert int(got.sum_abs_err) == sum_err
    assert int(got.max_abs_err) == max_err
    # smooth field: mean abs error well under the field's range
    rng_v = v_smooth.max() - v_smooth.min()
    assert sum_err / n_pred < rng_v / 10
