"""Geodesic distance: numpy-twin parity, known great-circle distances,
brute-force join parity, and candidate-cover completeness at the band
edge (where the degree square is tightest against the km disc)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gis_shapefile_spark.functions import geodesy as GD
from gis_shapefile_spark.operators import geodesic as GEO


def test_known_great_circle_distances():
    # 1 degree of longitude along the equator == 1 degree of latitude
    # along a meridian == pi * R / 180
    d_eq = GD.haversine_km_np(0.0, 0.0, 1.0, 0.0)
    d_mer = GD.haversine_km_np(10.0, 10.0, 10.0, 11.0)
    assert d_eq == pytest.approx(GD.KM_PER_DEG_LAT, rel=1e-9)
    assert d_mer == pytest.approx(GD.KM_PER_DEG_LAT, rel=1e-9)
    # antipodal points: half the circumference
    d_anti = GD.haversine_km_np(0.0, 0.0, 180.0, 0.0)
    assert d_anti == pytest.approx(math.pi * GD.EARTH_RADIUS_KM, rel=1e-9)
    # identical points
    assert GD.haversine_km_np(-100.0, 45.0, -100.0, 45.0) == 0.0
    # longitude shrinks with latitude: 1 deg lng at lat 60 ~ cos(60) ~ 1/2
    d60 = float(GD.haversine_km_np(0.0, 60.0, 1.0, 60.0))
    assert d60 == pytest.approx(GD.KM_PER_DEG_LAT * 0.5, rel=1e-3)


def test_sql_matches_numpy_twin(spark):
    rng = np.random.default_rng(7)
    n = 300
    pdf = pd.DataFrame(
        {
            "lng1": rng.uniform(-180, 180, n),
            "lat1": rng.uniform(-89, 89, n),
            "lng2": rng.uniform(-180, 180, n),
            "lat2": rng.uniform(-89, 89, n),
        }
    )
    got = (
        spark.createDataFrame(pdf)
        .select(
            F.expr(
                GD.haversine_km_sql("lng1", "lat1", "lng2", "lat2", "spark")
            ).alias("km")
        )
        .toPandas()["km"]
        .to_numpy()
    )
    want = GD.haversine_km_np(
        pdf["lng1"], pdf["lat1"], pdf["lng2"], pdf["lat2"]
    )
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-9)


def test_cover_radius_deg_properties():
    # the asin form strictly dominates the naive linear inversion (the
    # linear form UNDERCOVERS — asin(x) >= x), and converges to it for
    # small radii
    for km, lat in ((111.0, 0.0), (500.0, 45.0), (50.0, 80.0)):
        linear = km / (GD.KM_PER_DEG_LAT * math.cos(math.radians(lat)))
        got = GD.cover_radius_deg(km, lat)
        assert got >= linear
        assert got == pytest.approx(linear, rel=5e-3)
    # the covered dlng is genuinely sufficient: a pair separated by
    # exactly the returned radius in lng (both at the band edge) is at
    # LEAST km apart
    for km, lat in ((111.0, 0.0), (800.0, 60.0)):
        r = GD.cover_radius_deg(km, lat)
        d = float(GD.haversine_km_np(0.0, lat, r, lat))
        assert d >= km - 1e-6
    # monotone nondecreasing in the band edge
    r = [GD.cover_radius_deg(100.0, lat) for lat in (0, 30, 60, 80, 89)]
    assert all(a <= b for a, b in zip(r, r[1:]))
    # beyond the band's antipodal reach: full-canvas sentinel
    assert GD.cover_radius_deg(25000.0, 60.0) == 360.0
    with pytest.raises(ValueError):
        GD.cover_radius_deg(10.0, 90.0)
    with pytest.raises(ValueError):
        GD.cover_radius_deg(-1.0, 0.0)


def _features_pdf(centers):
    """Zero-area rect features centered on the given (cx, cy)."""
    rows = []
    for i, (cx, cy) in enumerate(centers, start=1):
        rows.append(
            dict(
                record_number=i, shape_type=5,
                minx=cx, maxx=cx, miny=cy, maxy=cy,
            )
        )
    return pd.DataFrame(rows)


def _points_pdf(rng, n, lng_lo, lng_hi, lat_lo, lat_hi):
    return pd.DataFrame(
        {
            "point_id": np.arange(n, dtype=np.int64),
            "lng": rng.uniform(lng_lo, lng_hi, n),
            "lat": rng.uniform(lat_lo, lat_hi, n),
        }
    )


def test_geodesic_nearest_matches_bruteforce(spark):
    rng = np.random.default_rng(11)
    centers = [(-120.0, 30.0), (-100.0, 40.0), (-80.0, 48.0), (-70.0, 25.0)]
    pts = _points_pdf(rng, 200, -125, -66, 24, 50)
    out = (
        GEO.geodesic_nearest(
            spark, spark.createDataFrame(pts), _features_pdf(centers)
        )
        .toPandas()
        .sort_values("point_id")
        .reset_index(drop=True)
    )
    cx = np.array([c[0] for c in centers])
    cy = np.array([c[1] for c in centers])
    d = GD.haversine_km_np(
        pts["lng"].to_numpy()[:, None], pts["lat"].to_numpy()[:, None],
        cx[None, :], cy[None, :],
    )
    want_rec = d.argmin(axis=1) + 1
    assert (out["record_number"].to_numpy() == want_rec).all()
    want_m = np.floor(d.min(axis=1) * 1000).astype(np.int64)
    # engine floor happens on the SQL-evaluated double; allow the last
    # integer digit to differ only where numpy and the JVM disagree by
    # ulps exactly at a meter boundary (none expected at this scale)
    assert (out["gdist_m"].to_numpy() == want_m).all()


def test_geodesic_within_km_matches_bruteforce_at_band_edge(spark):
    """Points and features pushed against lat 49.9 — the tightest spot of
    the fixture canvas for the degree cover — must still find every pair
    the exact haversine predicate admits."""
    rng = np.random.default_rng(13)
    centers = [(-110.0, 49.5), (-109.0, 49.9), (-111.5, 49.0)]
    pts = _points_pdf(rng, 400, -114, -106, 47.5, 50.0)
    km = 120.0
    out = GEO.geodesic_within_km(
        spark, spark.createDataFrame(pts), _features_pdf(centers), km=km
    ).toPandas()
    cx = np.array([c[0] for c in centers])
    cy = np.array([c[1] for c in centers])
    d = GD.haversine_km_np(
        pts["lng"].to_numpy()[:, None], pts["lat"].to_numpy()[:, None],
        cx[None, :], cy[None, :],
    )
    dm = np.floor(d * 1000).astype(np.int64)
    want = {
        (int(pts["point_id"][i]), j + 1)
        for i, j in zip(*np.nonzero(dm <= km * 1000))
    }
    got = {
        (int(r.point_id), int(r.record_number)) for r in out.itertuples()
    }
    assert got == want
    assert len(want) > 0  # the fixture actually exercises pairs


def test_geodesic_within_km_rejects_bad_radius(spark):
    with pytest.raises(ValueError):
        GEO.geodesic_within_km(
            spark,
            spark.createDataFrame(pd.DataFrame({"point_id": [1], "lng": [0.0], "lat": [0.0]})),
            _features_pdf([(0.0, 0.0)]),
            km=0.0,
        )


def test_within_km_planar_canvas_contract(spark):
    """Discs crossing the antimeridian or a pole are refused loudly: the
    degree-square cover clamps where the haversine refine wraps, so
    proceeding would silently drop qualifying pairs (code-review finding,
    pinned)."""
    pts = spark.createDataFrame(
        pd.DataFrame({"point_id": [1], "lng": [-179.9], "lat": [0.0]})
    )
    with pytest.raises(ValueError, match="antimeridian"):
        GEO.geodesic_within_km(
            spark, pts, _features_pdf([(179.95, 0.0)]), km=200.0
        )
    with pytest.raises(ValueError, match="pole"):
        GEO.geodesic_within_km(
            spark, pts, _features_pdf([(0.0, 89.95)]), km=10.0
        )


def test_within_km_threshold_rounds_not_truncates(spark):
    """km=0.29: int(0.29*1000) == 289 would exclude a point at 290.x m;
    the documented predicate floor(d_m) <= round(km*1e3) includes it."""
    from gis_shapefile_spark.functions import geodesy as GD

    dlat = 0.2905 / GD.KM_PER_DEG_LAT  # ~290.5 m due north
    pts = spark.createDataFrame(
        pd.DataFrame({"point_id": [1], "lng": [10.0], "lat": [20.0 + dlat]})
    )
    out = GEO.geodesic_within_km(
        spark, pts, _features_pdf([(10.0, 20.0)]), km=0.29
    ).toPandas()
    assert len(out) == 1
    assert out["gdist_m"][0] == 290


def test_geodesic_ops_empty_feature_table(spark):
    """All-null-shape feature tables filter to an empty dimension; both
    operators must return empty frames with stable schemas, not crash on
    schema inference / zero-size reductions."""
    empty = pd.DataFrame(
        [dict(record_number=1, shape_type=0, minx=np.nan, maxx=np.nan,
              miny=np.nan, maxy=np.nan)]
    )
    pts = spark.createDataFrame(
        pd.DataFrame({"point_id": [1], "lng": [0.0], "lat": [0.0]})
    )
    near = GEO.geodesic_nearest(spark, pts, empty)
    assert near.count() == 0
    assert near.columns == ["point_id", "record_number", "gdist_m"]
    within = GEO.geodesic_within_km(spark, pts, empty, km=10.0)
    assert within.count() == 0
    assert "gdist_m" in within.columns


def test_geodesic_pairs_matches_bruteforce_high_lat(spark):
    """Self-join vs numpy haversine brute force at lat 62-66 (strong
    cos-shrink: the lng cover must widen or pairs go missing) and at a
    radius whose lng span crosses several cells."""
    rng = np.random.default_rng(71)
    pdf = pd.DataFrame(
        {
            "point_id": np.arange(300, dtype=np.int64),
            "lng": rng.uniform(10, 30, 300),
            "lat": rng.uniform(62, 66, 300),
        }
    )
    for km in (40.0, 150.0):
        out = GEO.geodesic_pairs_within_km(
            spark.createDataFrame(pdf), km=km
        ).toPandas()
        d = GD.haversine_km_np(
            pdf["lng"].to_numpy()[:, None], pdf["lat"].to_numpy()[:, None],
            pdf["lng"].to_numpy()[None, :], pdf["lat"].to_numpy()[None, :],
        )
        dm = np.floor(d * 1000).astype(np.int64)
        thresh = int(round(km * 1000))
        want = {
            (i, j) for i in range(300) for j in range(i + 1, 300)
            if dm[i, j] <= thresh
        }
        got = list(zip(out["id_1"], out["id_2"]))
        assert len(got) == len(set(got))
        assert {(int(a), int(b)) for a, b in got} == want, km
    assert len(want) > 0


def test_geodesic_pairs_band_contract(spark):
    pts = spark.createDataFrame(
        pd.DataFrame({"point_id": [1, 2], "lng": [0.0, 0.1],
                      "lat": [89.5, 89.6]})
    )
    with pytest.raises(ValueError, match="pole"):
        GEO.geodesic_pairs_within_km(pts, km=100.0)
    with pytest.raises(ValueError):
        GEO.geodesic_pairs_within_km(pts, km=0.0)


def test_geodesic_knn_self_matches_bruteforce(spark):
    rng = np.random.default_rng(79)
    pdf = pd.DataFrame(
        {
            "point_id": np.arange(250, dtype=np.int64),
            "lng": rng.uniform(-10, 10, 250),
            "lat": rng.uniform(55, 60, 250),
        }
    )
    k, km = 3, 120.0
    out = GEO.geodesic_knn_self(
        spark.createDataFrame(pdf), k=k, km=km
    ).toPandas()
    d = GD.haversine_km_np(
        pdf["lng"].to_numpy()[:, None], pdf["lat"].to_numpy()[:, None],
        pdf["lng"].to_numpy()[None, :], pdf["lat"].to_numpy()[None, :],
    )
    dm = np.floor(d * 1000).astype(np.int64)
    thresh = int(round(km * 1000))
    want = set()
    for i in range(250):
        cand = sorted(
            (int(dm[i, j]), j) for j in range(250)
            if j != i and dm[i, j] <= thresh
        )
        for rank, (dd, j) in enumerate(cand[:k], start=1):
            want.add((i, j, rank, dd))
    got = {
        (int(r.point_id), int(r.neighbor_id), int(r.nn_rank), int(r.gdist_m))
        for r in out.itertuples()
    }
    assert got == want and len(want) > 0


def test_spherical_ring_area_known_values(spark):
    """The Chamberlain-Duquette formula is EXACT for parallel/meridian-
    bounded quads: a 1x1-deg square at the equator must give
    R^2 * (pi/180) * sin(1 deg), and the same square at lat 60 the
    sin-difference shrink; SQL == numpy twin; holes subtract."""
    xs = [0.0, 1.0, 1.0, 0.0, 0.0]
    ys = [0.0, 0.0, 1.0, 1.0, 0.0]
    rad = math.pi / 180.0
    exact_eq = (
        GD.EARTH_RADIUS_KM ** 2 * rad * (math.sin(rad) - 0.0)
    )
    a_np = abs(GD.ring_area_sph_np(np.array(xs), np.array(ys))) / 1e6
    assert a_np == pytest.approx(exact_eq, rel=1e-6)
    ys60 = [y + 60 for y in ys]
    exact_60 = GD.EARTH_RADIUS_KM ** 2 * rad * (
        math.sin(61 * rad) - math.sin(60 * rad)
    )
    a60 = abs(GD.ring_area_sph_np(np.array(xs), np.array(ys60))) / 1e6
    assert a60 == pytest.approx(exact_60, rel=1e-6)
    # SQL twin: same integerized value in Spark
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"xs": [xs], "ys": [ys]}),
        "xs array<double>, ys array<double>",
    )
    got = df.selectExpr(
        f"{GD.ring_area_sph_sql('xs', 'ys', 'spark')} AS a"
    ).first().a
    assert got == GD.ring_area_sph_np(np.array(xs), np.array(ys))
    # perimeter: 4 edges of ~1 deg at the equator (two meridian edges
    # exactly KM_PER_DEG_LAT, two parallel edges exactly the same at 0)
    gp = df.selectExpr(
        f"{GD.ring_perim_geo_sql('xs', 'ys', 'spark')} AS p"
    ).first().p
    assert gp / 1e6 == pytest.approx(4 * GD.KM_PER_DEG_LAT, rel=1e-4)
