"""Great-circle (geodesic) distance on the WGS84 mean sphere.

The reference is deliberately PLANAR — Euclidean on raw degrees
(``src/geocoding/geocoder.cpp:463-468``: "not geodesic"), and every
reference-parity operator in this engine matches that. A global image
corpus, though, needs real kilometres: "images within 50 km of a road",
"nearest city by distance a human would recognise" — at lat 50° one
longitude degree is only 71 km, so degree-space radii are ~40% wrong at
the top of the CONUS extent and unusable at high latitudes.

This module is the geodesic twin of the planar distance column: the
haversine great-circle distance on the mean-radius sphere
(R = 6371.0088 km, the IUGG mean Earth radius), in the repo's three
synchronized forms:

- ``haversine_km_sql`` — ONE expression string evaluated byte-identically
  in Spark SQL and DuckDB (the webmercator.py determinism pattern: both
  engines run libm-quality sin/cos/asin on the same IEEE tree; a
  last-ulp divergence could only flip an integerized digit on a
  measure-zero boundary set, the exposure the repo's floor-canon already
  accepts — integerize at METER granularity, not micro-degree, to keep
  that exposure ~1e-9/row).
- ``haversine_km_np`` — numpy twin with the same formula shape, for
  pytest oracles and driver-side feature math.
- ``cover_radius_deg`` — the CONSERVATIVE degree radius that turns a
  km radius into a cell-cover radius for the candidate stage of a
  geodesic join: 1° of latitude is a constant ~111.195 km on the
  sphere, 1° of longitude shrinks by cos(lat), so the safe degree
  radius over a latitude band is km / (111.195 * cos(band edge)).
  Candidates are superset-safe; the haversine refine is exact.

Formula (angles in radians, d = central angle):
    hav(d) = sin^2(dlat/2) + cos(lat1) cos(lat2) sin^2(dlng/2)
    km     = 2 R asin(sqrt(hav))
The ``least(1.0, ...)`` clamp guards asin against hav > 1 by rounding
(antipodal points); ``greatest(0.0, ...)`` is unnecessary (both terms
are squares) and omitted to keep the tree minimal.
"""

from __future__ import annotations

import math

import numpy as np

from .litsql import double_literal as _dlit

#: IUGG mean Earth radius (km) — the scipy/astropy/PostGIS default sphere.
EARTH_RADIUS_KM = 6371.0088

#: km per degree of latitude on that sphere: pi * R / 180.
KM_PER_DEG_LAT = math.pi * EARTH_RADIUS_KM / 180.0


def haversine_km_sql(
    lng1: str, lat1: str, lng2: str, lat2: str, dialect: str = "spark"
) -> str:
    """Great-circle km between two (lng, lat) degree columns.

    Identical text in both dialects (``dialect`` kept for API symmetry
    with cells.py/webmercator.py). Every literal is exponent-marked via
    ``double_literal`` so Spark never routes a bare decimal through
    DECIMAL arithmetic (CLAUDE.md float-literal rule).
    """
    rad = _dlit(math.pi / 180.0)  # one strtod-exact factor, not pi()/180
    half = _dlit(math.pi / 360.0)
    r1 = f"(({lat1}) * {rad})"
    r2 = f"(({lat2}) * {rad})"
    sdlat = f"sin((({lat2}) - ({lat1})) * {half})"
    sdlng = f"sin((({lng2}) - ({lng1})) * {half})"
    hav = f"({sdlat} * {sdlat} + cos({r1}) * cos({r2}) * {sdlng} * {sdlng})"
    # the asin clamp is a CASE, NOT least(): both engines' least/greatest
    # IGNORE nulls, so least(1.0, NULL) = 1.0 would turn a NULL input
    # (e.g. the lag() before a device's first fix) into a phantom
    # half-circumference distance — CASE propagates NULL like every
    # other arithmetic op in the tree (caught by trajectory_geo's first
    # driver gate: both engines agreed on the phantom 20,015,114 m hop
    # but then split on the NULL jump flag)
    clamped = f"(CASE WHEN {hav} > {_dlit(1.0)} THEN {_dlit(1.0)} ELSE {hav} END)"
    return f"({_dlit(2.0 * EARTH_RADIUS_KM)} * asin(sqrt({clamped})))"


def haversine_m_u_sql(
    lng1: str, lat1: str, lng2: str, lat2: str, dialect: str = "spark"
) -> str:
    """Meter-integerized great-circle distance (BIGINT): floor(km * 1e3).

    Meter granularity keeps the cross-engine ulp exposure ~1e-9/row (a
    1-ulp trig divergence at 5,000 km is ~1e-12 km against a 1e-3 km
    boundary spacing) while staying exact enough for any curation
    predicate.
    """
    km = haversine_km_sql(lng1, lat1, lng2, lat2, dialect)
    return f"cast(floor({km} * {_dlit(1000.0)}) as bigint)"


def haversine_km_np(lng1, lat1, lng2, lat2) -> np.ndarray:
    """Numpy twin of ``haversine_km_sql`` (same formula shape; pytest
    oracles compare with tolerance — engine-vs-engine exactness is the
    oracle gate's job, not numpy's)."""
    lng1 = np.asarray(lng1, np.float64)
    lat1 = np.asarray(lat1, np.float64)
    lng2 = np.asarray(lng2, np.float64)
    lat2 = np.asarray(lat2, np.float64)
    rad = math.pi / 180.0
    half = math.pi / 360.0
    sdlat = np.sin((lat2 - lat1) * half)
    sdlng = np.sin((lng2 - lng1) * half)
    hav = sdlat * sdlat + np.cos(lat1 * rad) * np.cos(lat2 * rad) * sdlng * sdlng
    return 2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(np.minimum(1.0, hav)))


def cover_radius_deg(km: float, max_abs_lat: float) -> float:
    """Conservative degree radius covering a ``km`` great-circle radius
    anywhere in the latitude band |lat| <= ``max_abs_lat``.

    PROOF SHAPE (this is the bound the candidate covers rely on, so it
    must be a theorem, not an approximation): for two points in the
    band, hav(d) >= cos(lat1) cos(lat2) sin^2(dlng/2) >=
    cos^2(band) sin^2(dlng/2), so d <= km forces
    dlng <= 2 asin(min(1, km / (2 R cos(band)))). The naive LINEAR
    inversion km / (111.195 cos(band)) is smaller than this (asin(x) >=
    x), i.e. NOT conservative — it undercovers by ~(dlng/2)^2/6
    relative, invisibly small at fixture radii but a wrongness class at
    continental ones. The latitude axis needs no such correction:
    hav(d) >= sin^2(dlat/2) gives d >= R*dlat exactly, so the linear
    km / KM_PER_DEG_LAT latitude radius is exact.

    Returns the asin-form longitude-axis radius, which dominates the
    latitude radius for every band >= 0 — a degree square of this
    radius contains the km disc for every point in the band, making any
    cell cover built from it a provable superset (the refine is exact,
    so supersets only cost candidate rows, never correctness). If the
    disc spans beyond any finite longitude radius (km >= the band's
    antipodal reach), returns 360.0 — callers' canvas contracts refuse
    such discs anyway.
    """
    if not 0.0 <= max_abs_lat < 90.0:
        raise ValueError(f"max_abs_lat must be in [0, 90), got {max_abs_lat}")
    if km < 0:
        raise ValueError(f"km must be >= 0, got {km}")
    shrink = math.cos(math.radians(max_abs_lat))
    x = km / (2.0 * EARTH_RADIUS_KM * shrink)
    if x >= 1.0:
        return 360.0
    return math.degrees(2.0 * math.asin(x))


def ring_area_sph_sql(xs: str, ys: str, dialect: str = "spark") -> str:
    """Signed SPHERICAL ring area over a closed (lng, lat) ring, in
    integerized 1e-6 km^2 units — the Chamberlain & Duquette (JPL
    07-03) formula every web-GIS area tool uses (turf.js ringArea):

        area = R^2/2 * sum over edges of
               (lng2 - lng1)_rad * (2 + sin(lat1_rad) + sin(lat2_rad))

    This is the geodesic twin of ``geometry.ring_area2_sql``'s planar
    shoelace: per-edge terms are floor-integerized so the sum is exact
    and order-free in both engines, sign follows vertex order, and
    callers combine rings positionally (shell minus holes). Accuracy is
    that of the published formula (exact for edges along parallels and
    meridians, second-order in edge length otherwise) — the right tool
    for "how many km^2 does this footprint really cover", where the
    planar shoelace in deg^2 distorts by cos(lat).
    """
    from .litsql import double_literal as dl

    rad = dl(math.pi / 180.0)
    half_r2 = dl(EARTH_RADIUS_KM * EARTH_RADIUS_KM / 2.0)
    term = (
        f"((({{x2}}) - ({{x1}})) * {rad})"
        f" * ({dl(2.0)} + sin(({{y1}}) * {rad}) + sin(({{y2}}) * {rad}))"
        f" * {half_r2}"
    )
    from . import geometry as G

    return G._edge_sum_sql(xs, ys, term, dialect)


def ring_perim_geo_sql(xs: str, ys: str, dialect: str = "spark") -> str:
    """Ring perimeter in great-circle km (integerized 1e-6 km units):
    the haversine over every edge of the closed ring, floor-integerized
    per edge — the geodesic twin of ``geometry.ring_perim_sql``."""
    from . import geometry as G

    term = haversine_km_sql("{x1}", "{y1}", "{x2}", "{y2}", dialect)
    return G._edge_sum_sql(xs, ys, term, dialect)


def ring_area_sph_np(xs: np.ndarray, ys: np.ndarray) -> float:
    """Numpy twin of ``ring_area_sph_sql`` (same per-edge floor-sum)."""
    xs = np.asarray(xs, np.float64)
    ys = np.asarray(ys, np.float64)
    if len(xs) < 2:
        return 0.0
    rad = math.pi / 180.0
    half_r2 = EARTH_RADIUS_KM * EARTH_RADIUS_KM / 2.0
    t = (
        (xs[1:] - xs[:-1]) * rad
        * (2.0 + np.sin(ys[:-1] * rad) + np.sin(ys[1:] * rad))
        * half_r2
    )
    return int(np.floor(t * 1e6).astype(np.int64).sum())
