"""Point-to-polyline nearest-segment join vs a brute-force numpy oracle.

The oracle is an independent all-pairs scan (no cell cover, no SQL), so
cover-guarantee bugs and dsq-expression bugs can't self-validate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from gis_shapefile_spark.operators import lines as LN
from gis_shapefile_spark.sources import fixtures as FX


def _brute_nearest(lng, lat, segs: pd.DataFrame, radius: float):
    """(road_id, seg_id, dsq_u) of the nearest segment within radius, or
    None — argmin with the operator's (dsq_u, road_id, seg_id) tie-break,
    computed via the integerized value like both engines."""
    best = None
    for _, s in segs.iterrows():
        dsq = float(
            LN.point_segment_dsq_np(lng, lat, s.ax, s.ay, s.bx, s.by)
        )
        dsq_u = int(np.floor(dsq * 1e12))
        if dsq_u > LN.radius2_u(radius):
            continue
        key = (dsq_u, int(s.road_id), int(s.seg_id))
        if best is None or key < best:
            best = key
    return best


def test_point_segment_dsq_np_matches_geometry():
    rng = np.random.default_rng(7)
    for _ in range(200):
        ax, ay, bx, by = rng.uniform(-10, 10, 4)
        if ax == bx and ay == by:
            continue
        px, py = rng.uniform(-12, 12, 2)
        # reference computation: dense sample of the segment
        t = np.linspace(0.0, 1.0, 20001)
        qx, qy = ax + t * (bx - ax), ay + t * (by - ay)
        ref = np.min((px - qx) ** 2 + (py - qy) ** 2)
        got = float(LN.point_segment_dsq_np(px, py, ax, ay, bx, by))
        assert got <= ref + 1e-12  # closed form is the true minimum
        assert got >= ref - 1e-6  # and the dense sample approaches it


def test_polyline_segments_parts_and_degenerates():
    roads = pd.DataFrame(
        [
            # two parts of 3 vertices: segments 0-1 and 2-3, no bridge
            dict(road_id=1, xs=[0, 1, 2, 5, 6, 7], ys=[0, 0, 0, 0, 0, 0],
                 part_sizes=[3, 3]),
            # zero-length segment in the middle is dropped
            dict(road_id=2, xs=[0, 1, 1, 2], ys=[0, 0, 0, 0],
                 part_sizes=[4]),
        ]
    )
    segs = LN.polyline_segments(roads)
    r1 = segs[segs.road_id == 1]
    assert len(r1) == 4
    # no segment bridges the (2,0)->(5,0) gap
    assert not ((r1.ax == 2) & (r1.bx == 5)).any()
    r2 = segs[segs.road_id == 2]
    assert len(r2) == 2  # (0,1) and (1,2); the (1,1) pair dropped
    assert list(r2.seg_id) == [0, 1]


def test_road_fixture_spreads_over_canvas():
    roads = FX.make_road_features()
    cx0, cy0, cx1, cy1 = FX.CANVAS
    assert roads.miny.min() >= cy0 and roads.maxy.max() <= cy1
    # starts spread over the full latitude range (the small-multiplier
    # hash degeneracy this fixture once had clustered them at the south
    # edge)
    start_ys = [r["ys"][0] for _, r in roads.iterrows()]
    assert max(start_ys) - min(start_ys) > (cy1 - cy0) * 0.8
    # multi-part roads exist
    assert (roads.part_sizes.map(len) > 1).any()


def test_nearest_segment_join_matches_bruteforce(spark):
    roads = FX.make_road_features(n_roads=12, n_pts=6)
    segs = LN.polyline_segments(roads)
    rng = np.random.default_rng(11)
    n = 300
    pts = pd.DataFrame(
        dict(
            point_id=np.arange(n),
            lng=rng.uniform(-125, -66, n),
            lat=rng.uniform(24, 50, n),
        )
    )
    radius = 2.0
    got = (
        LN.nearest_segment_join(
            spark, spark.createDataFrame(pts), roads, radius=radius
        )
        .toPandas()
        .set_index("point_id")
        .sort_index()
    )
    expected = {}
    for _, p in pts.iterrows():
        best = _brute_nearest(p.lng, p.lat, segs, radius)
        if best is not None:
            expected[int(p.point_id)] = best
    assert set(got.index) == set(expected)
    for pid, (dsq_u, road_id, seg_id) in expected.items():
        row = got.loc[pid]
        assert (int(row.dsq_u), int(row.road_id), int(row.seg_id)) == (
            dsq_u, road_id, seg_id,
        ), pid


def test_nearest_segment_join_k3_ranks(spark):
    roads = FX.make_road_features(n_roads=8, n_pts=5)
    segs = LN.polyline_segments(roads)
    pts = pd.DataFrame(
        dict(point_id=[0, 1], lng=[-100.0, -80.0], lat=[35.0, 40.0])
    )
    radius = 30.0  # everything in range: rank purely by distance
    got = LN.nearest_segment_join(
        spark, spark.createDataFrame(pts), roads, radius=radius, k=3, res=4
    ).toPandas()
    for pid in (0, 1):
        sub = got[got.point_id == pid].sort_values("nn_rank")
        assert list(sub.nn_rank) == [1, 2, 3]
        # ranks are the 3 smallest integerized distances with tie-break
        p = pts[pts.point_id == pid].iloc[0]
        keys = sorted(
            (
                int(np.floor(float(LN.point_segment_dsq_np(
                    p.lng, p.lat, s.ax, s.ay, s.bx, s.by)) * 1e12)),
                int(s.road_id), int(s.seg_id),
            )
            for _, s in segs.iterrows()
        )[:3]
        gotk = [
            (int(r.dsq_u), int(r.road_id), int(r.seg_id))
            for _, r in sub.iterrows()
        ]
        assert gotk == keys


def test_segment_cover_df_matches_numpy(spark):
    roads = FX.make_road_features(n_roads=10, n_pts=5)
    segs = LN.polyline_segments(roads)
    res, radius = 6, 1.25
    got = (
        LN.segment_cover_df(spark.createDataFrame(segs), radius, res)
        .select("road_id", "seg_id", "cell")
        .toPandas()
    )
    want = LN.segment_cell_cover(segs, radius, res)[
        ["road_id", "seg_id", "cell"]
    ]
    gset = set(map(tuple, got.itertuples(index=False)))
    wset = set(map(tuple, want.itertuples(index=False)))
    assert gset == wset
    assert len(got) == len(want)  # no duplicate cover rows either


def test_nearest_segment_join_big_equals_broadcast(spark):
    import pandas as pd

    from gis_shapefile_spark.functions import cells as C

    roads = FX.make_road_features(n_roads=12, n_pts=6)
    rng = np.random.default_rng(17)
    n = 250
    pts = spark.createDataFrame(
        pd.DataFrame(
            dict(
                point_id=np.arange(n),
                lng=rng.uniform(-125, -66, n),
                lat=rng.uniform(24, 50, n),
            )
        )
    )
    radius, k = 2.0, 2
    res = C.resolution_for_bbox(2 * radius, 2 * radius, max_cells=64)
    a = (
        LN.nearest_segment_join(spark, pts, roads, radius=radius, k=k)
        .toPandas()
        .sort_values(["point_id", "nn_rank"])
        .reset_index(drop=True)
    )
    b = (
        LN.nearest_segment_join_big(
            pts,
            spark.createDataFrame(LN.polyline_segments(roads)),
            radius=radius,
            res=res,
            k=k,
        )
        .toPandas()
        .sort_values(["point_id", "nn_rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_carry_cols_pass_through(spark):
    roads = FX.make_road_features(n_roads=6, n_pts=5)
    pts = pd.DataFrame(
        dict(
            point_id=[1, 2, 3],
            device=["a", "a", "b"],
            lng=[-100.0, -99.0, -80.0],
            lat=[35.0, 36.0, 40.0],
        )
    )
    out = LN.nearest_segment_join(
        spark, spark.createDataFrame(pts), roads, radius=30.0,
        carry_cols=("device",),
    ).toPandas().sort_values("point_id")
    assert list(out.columns) == [
        "point_id", "device", "nn_rank", "road_id", "seg_id", "dsq_u"
    ]
    assert list(out.device) == ["a", "a", "b"]


def test_within_distance_of_segments_matches_bruteforce(spark):
    roads = FX.make_road_features(n_roads=10, n_pts=5)
    segs = LN.polyline_segments(roads)
    rng = np.random.default_rng(23)
    n = 200
    pts = pd.DataFrame(
        dict(
            point_id=np.arange(n),
            lng=rng.uniform(-125, -66, n),
            lat=rng.uniform(24, 50, n),
        )
    )
    radius = 1.5
    got = (
        LN.within_distance_of_segments(
            spark, spark.createDataFrame(pts), roads, radius=radius
        )
        .toPandas()
        .set_index("point_id")
        .sort_index()
    )
    r2u = LN.radius2_u(radius)
    expected = {}
    for _, p in pts.iterrows():
        dsqs = [
            int(np.floor(float(LN.point_segment_dsq_np(
                p.lng, p.lat, s.ax, s.ay, s.bx, s.by)) * 1e12))
            for _, s in segs.iterrows()
        ]
        hits = [d for d in dsqs if d <= r2u]
        if hits:
            expected[int(p.point_id)] = (len(hits), min(hits))
    assert set(got.index) == set(expected)
    for pid, (n_seg, mn) in expected.items():
        assert (int(got.loc[pid].n_segments), int(got.loc[pid].min_dsq_u)) \
            == (n_seg, mn), pid
