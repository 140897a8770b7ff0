"""One-pass Visvalingam simplification vs an independent numpy twin."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from gis_shapefile_spark.operators import simplify as SIM


def _np_onepass_vw(x: np.ndarray, y: np.ndarray, tol2_u: int) -> np.ndarray:
    """Independent keep-mask: anchors + integerized 2*eff-area >= tol."""
    n = len(x)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    for i in range(1, n - 1):
        cross = (x[i] - x[i - 1]) * (y[i + 1] - y[i]) - (
            y[i] - y[i - 1]
        ) * (x[i + 1] - x[i])
        if int(np.floor(abs(cross) * 1e12)) >= tol2_u:
            keep[i] = True
    return keep


def _vertices_df(spark, chains):
    rows = []
    for gid, (x, y) in enumerate(chains):
        for i, (xx, yy) in enumerate(zip(x, y)):
            rows.append((gid, 0, i + 1, float(xx), float(yy)))
    return spark.createDataFrame(
        pd.DataFrame(
            rows, columns=["record_number", "ring_idx", "idx", "x", "y"]
        )
    )


def test_zoom_tolerances_ladder():
    tols = SIM.zoom_tolerances([4, 6, 8])
    assert [z for z, _ in tols] == [4, 6, 8]
    # finer zoom -> strictly smaller tolerance; exact ints
    assert tols[0][1] > tols[1][1] > tols[2][1] > 0
    assert all(isinstance(t, int) for _, t in tols)
    px4 = 360.0 / 16 / 256
    assert tols[0][1] == int(px4 * px4 * 2 * 1e12)


def test_simplify_vw_matches_numpy_twin(spark):
    rng = np.random.default_rng(5)
    chains = []
    for _ in range(6):
        n = rng.integers(5, 40)
        chains.append(
            (rng.uniform(-10, 10, n), rng.uniform(-10, 10, n))
        )
    # a straight line with one spike: only anchors + spike survive
    xs = np.linspace(0, 10, 9)
    ys = np.zeros(9)
    ys[4] = 2.0
    chains.append((xs, ys))
    tol2_u = int(0.5 * 2 * 1e12)  # triangles under area 0.5 vanish
    out = (
        SIM.simplify_vw(_vertices_df(spark, chains), tol2_u)
        .toPandas()
        .sort_values(["record_number", "idx"])
    )
    for gid, (x, y) in enumerate(chains):
        keep = _np_onepass_vw(np.asarray(x), np.asarray(y), tol2_u)
        sub = out[out.record_number == gid]
        assert list(sub.idx) == list(np.nonzero(keep)[0] + 1), gid
        assert list(sub.pt_idx) == list(range(1, keep.sum() + 1)), gid
    spike = out[out.record_number == len(chains) - 1]
    assert list(spike.idx) == [1, 4, 5, 6, 9]  # anchors + spike triangle


def test_simplify_vw_zoom_ladder_is_nested(spark):
    """Per-vertex one-pass keep decisions are independent, so coarser
    zooms keep a SUBSET of finer zooms' vertices (nested outlines)."""
    rng = np.random.default_rng(9)
    n = 60
    x, y = rng.uniform(-5, 5, n), rng.uniform(-5, 5, n)
    verts = _vertices_df(spark, [(x, y)])
    zooms = spark.createDataFrame(
        SIM.zoom_tolerances([2, 5, 9]), "z int, tol2_u long"
    )
    from pyspark.sql import functions as F

    out = SIM.simplify_vw(
        verts.crossJoin(F.broadcast(zooms)),
        tol2_u=None,
        group_cols=("z", "record_number", "ring_idx"),
        tol_col="tol2_u",
    ).toPandas()
    kept = {z: set(out[out.z == z].idx) for z in (2, 5, 9)}
    assert kept[2] <= kept[5] <= kept[9]
    assert {1, n} <= kept[2]  # anchors always survive


def test_simplify_vw_closed_ring_stays_closed(spark):
    """Shapefile rings repeat the first vertex last; both copies are
    anchors, so simplified rings remain closed."""
    th = np.linspace(0, 2 * np.pi, 41)
    r = np.ones(41)
    r[5::8] = 1.5  # a few sharp bumps survive; the smooth arc drops
    x = r * np.cos(th)
    y = r * np.sin(th)
    x[-1], y[-1] = x[0], y[0]
    out = (
        SIM.simplify_vw(_vertices_df(spark, [(x, y)]), int(0.01 * 2 * 1e12))
        .toPandas()
        .sort_values("pt_idx")
    )
    assert out.iloc[0].x == out.iloc[-1].x
    assert out.iloc[0].y == out.iloc[-1].y
    assert 3 < len(out) < 41  # actually simplified, still a ring
