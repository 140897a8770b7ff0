"""GPS-jump trajectory stats vs a hand-computed micro-oracle."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

from gis_shapefile_spark.operators import trajectory as TJ


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc) + dt.timedelta(
        seconds=s
    )


def test_trajectory_stats_micro(spark):
    # device 1: three fixes 100 s apart; hop1 = 0.005° (clean at
    # v_max=100 µdeg/s: 5000 < 100*100), hop2 = 1° (jump: 1e6 > 1e4).
    # device 2: a single fix (no hops). device 3: two fixes in the SAME
    # second with a nonzero hop -> dt=0 flags it.
    rows = [
        (1, 1, _ts(0), 10.0, 20.0),
        (1, 2, _ts(100), 10.005, 20.0),
        (1, 3, _ts(200), 11.005, 20.0),
        (2, 4, _ts(0), 0.0, 0.0),
        (3, 5, _ts(50), 5.0, 5.0),
        (3, 6, _ts(50), 5.001, 5.0),
    ]
    ev = spark.createDataFrame(
        pd.DataFrame(
            rows, columns=["user_id", "event_id", "ts", "lng", "lat"]
        )
    )
    out = (
        TJ.trajectory_stats(ev, v_max_udeg_per_s=100)
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    assert out.loc[1, "n_events"] == 3
    assert out.loc[1, "n_hops"] == 2
    assert out.loc[1, "n_jumps"] == 1
    assert out.loc[1, "clean_dist_u"] == int(np.floor(0.005 * 1e6))
    assert out.loc[2, "n_events"] == 1
    assert out.loc[2, "n_hops"] == 0
    assert out.loc[2, "n_jumps"] == 0
    assert out.loc[2, "clean_dist_u"] == 0
    # same-second fixes: dt=0 -> any nonzero hop is a jump (multiply
    # formulation; a divide would have crashed or NaN'd)
    assert out.loc[3, "n_hops"] == 1
    assert out.loc[3, "n_jumps"] == 1
    assert out.loc[3, "clean_dist_u"] == 0


def test_trajectory_ties_break_on_event_id(spark):
    # two fixes at the identical timestamp: order by event_id decides
    # which is "first"; the hop is attributed deterministically
    rows = [
        (7, 12, _ts(0), 1.0, 1.0),
        (7, 11, _ts(0), 0.0, 0.0),
        (7, 13, _ts(1000), 1.0, 1.0),
    ]
    ev = spark.createDataFrame(
        pd.DataFrame(
            rows, columns=["user_id", "event_id", "ts", "lng", "lat"]
        )
    )
    out = TJ.trajectory_stats(ev, v_max_udeg_per_s=10**9).toPandas()
    # order: 11 -> 12 -> 13. Hop 11->12 has dt=0 and dist sqrt(2)° -> a
    # jump at ANY v_max; hop 12->13 has dist 0 -> clean. Were the tie
    # broken the other way (12 -> 11 -> 13), the second hop would be
    # 11->13 = sqrt(2)° over 1000 s (clean at huge v_max) and
    # clean_dist_u would be 1414213, not 0 — so these values prove the
    # (ts, event_id) order.
    assert out.n_hops[0] == 2
    assert out.n_jumps[0] == 1
    assert out.clean_dist_u[0] == 0


def test_trajectory_stats_geo_micro(spark):
    """Geodesic twin vs numpy haversine: known hops in meters, a planted
    teleport, and the first fix contributing NO hop (the least()-ignores-
    NULL hazard: a NULL lag must yield a NULL distance, not a phantom
    half-circumference — caught by the driver gate, pinned here)."""
    from gis_shapefile_spark.functions import geodesy as GD

    rows = [
        # device 1: two 100 s hops at lat 48 (lng shrink matters), then
        # a teleport across the canvas in 1 s
        (1, 1, _ts(0), -100.000, 48.0),
        (1, 2, _ts(100), -100.010, 48.0),
        (1, 3, _ts(200), -100.020, 48.0),
        (1, 4, _ts(201), -70.0, 30.0),
        # device 2: a single fix — no hops at all
        (2, 5, _ts(0), -80.0, 40.0),
    ]
    pdf = pd.DataFrame(
        rows, columns=["user_id", "event_id", "ts", "lng", "lat"]
    )
    out = {
        r.user_id: r
        for r in TJ.trajectory_stats_geo(
            spark.createDataFrame(pdf), v_max_m_per_s=10
        ).collect()
    }
    hop = int(np.floor(
        float(GD.haversine_km_np(-100.000, 48.0, -100.010, 48.0)) * 1000
    ))
    # ~0.01 deg lng at lat 48: ~744 m over 100 s -> 7.4 m/s, clean
    assert 700 < hop < 800
    d1 = out[1]
    assert (d1.n_events, d1.n_hops, d1.n_jumps) == (4, 3, 1)
    assert d1.clean_dist_m == 2 * hop  # teleport excluded, first fix no hop
    d2 = out[2]
    assert (d2.n_events, d2.n_hops, d2.n_jumps, d2.clean_dist_m) == (1, 0, 0, 0)


def test_stay_points_micro(spark):
    """Hand-built device: two dwell clusters separated by a teleport,
    plus a too-short island and a single-fix device."""
    rows = [
        # device 1: 3 fixes ~200 m apart over 300 s (stay A) -> teleport
        # -> 2 fixes over 400 s (stay B)
        (1, 1, _ts(0), -100.000, 40.000),
        (1, 2, _ts(100), -100.002, 40.000),
        (1, 3, _ts(300), -100.001, 40.001),
        (1, 4, _ts(400), -90.0, 30.0),
        (1, 5, _ts(800), -90.001, 30.001),
        # device 2: two fixes 10 s apart -> island too short for 120 s
        (2, 6, _ts(0), -80.0, 35.0),
        (2, 7, _ts(10), -80.001, 35.0),
        # device 3: one fix (island duration 0 < 120)
        (3, 8, _ts(0), -70.0, 45.0),
    ]
    pdf = pd.DataFrame(
        rows, columns=["user_id", "event_id", "ts", "lng", "lat"]
    )
    out = TJ.stay_points(
        spark.createDataFrame(pdf), max_hop_m=1000, min_duration_s=120
    ).collect()
    got = {(r.user_id, r.stay_idx): r for r in out}
    assert set(got) == {(1, 0), (1, 1)}
    a = got[(1, 0)]
    assert (a.n_fixes, a.t_start_ep - a.t_end_ep) == (3, -300)
    assert a.clng_u == int(
        (sum(int(np.floor(x * 1e6)) for x in (-100.000, -100.002, -100.001))) // 3
    )
    b = got[(1, 1)]
    assert (b.n_fixes, b.duration_s) == (2, 400)


def test_od_matrix_micro(spark):
    """Hand-built OD micro-oracle: two devices, two hour buckets, a
    stationary single-fix bucket, and an out-of-order event-id
    tie-break inside one second."""
    from gis_shapefile_spark.functions import cells as C

    res = 7
    # cell centers for distinct grid cells
    def cc(gx, gy):
        n = 1 << res
        return (-180.0 + (gx + 0.5) * 360.0 / n,
                -90.0 + (gy + 0.5) * 180.0 / n)

    a, b, c = cc(30, 40), cc(31, 40), cc(32, 41)
    rows = [
        # device 1, hour 0: a -> (mid) -> b
        (1, 1, _ts(10), *a),
        (1, 2, _ts(500), *c),
        (1, 3, _ts(3000), *b),
        # device 1, hour 1: single fix at c (stationary: o = d = c)
        (1, 4, _ts(3700), *c),
        # device 2, hour 0: same-second tie at t=0: event_id 6 BEFORE 7
        # (tie-break on id), so origin is the id-6 fix at b; dest a
        (2, 6, _ts(0), *b),
        (2, 7, _ts(0), *c),
        (2, 8, _ts(1800), *a),
    ]
    pdf = pd.DataFrame(
        rows, columns=["user_id", "event_id", "ts", "lng", "lat"]
    )
    got = (
        TJ.od_matrix(spark.createDataFrame(pdf), res=res, bucket_s=3600)
        .toPandas()
    )
    cell = {p: int(C.cell_of_numpy(
        np.array([p[0]]), np.array([p[1]]), res)[0]) for p in (a, b, c)}
    flows = {
        (int(r.o_cell), int(r.d_cell)): (int(r.n_trips), int(r.n_users))
        for r in got.itertuples(index=False)
    }
    assert flows == {
        (cell[a], cell[b]): (1, 1),   # device 1 hour 0
        (cell[c], cell[c]): (1, 1),   # device 1 hour 1 stationary
        (cell[b], cell[a]): (1, 1),   # device 2 hour 0 (tie-break)
    }


def test_od_matrix_aggregates_flows(spark):
    """Three devices making the same A->B trip in one hour collapse to
    one flow row with n_trips = n_users = 3; a repeat trip by one
    device in another hour bumps n_trips but not n_users."""
    from gis_shapefile_spark.functions import cells as C

    res = 7
    n = 1 << res
    a = (-180.0 + 10.5 * 360.0 / n, -90.0 + 20.5 * 180.0 / n)
    b = (-180.0 + 11.5 * 360.0 / n, -90.0 + 20.5 * 180.0 / n)
    rows = []
    for dev in (1, 2, 3):
        rows.append((dev, dev * 10, _ts(0), *a))
        rows.append((dev, dev * 10 + 1, _ts(100), *b))
    rows.append((1, 99, _ts(3700), *a))
    rows.append((1, 100, _ts(3800), *b))
    pdf = pd.DataFrame(
        rows, columns=["user_id", "event_id", "ts", "lng", "lat"]
    )
    got = (
        TJ.od_matrix(spark.createDataFrame(pdf), res=res, bucket_s=3600)
        .toPandas()
    )
    assert len(got) == 1
    r = got.iloc[0]
    ca = int(C.cell_of_numpy(np.array([a[0]]), np.array([a[1]]), res)[0])
    cb = int(C.cell_of_numpy(np.array([b[0]]), np.array([b[1]]), res)[0])
    assert (int(r.o_cell), int(r.d_cell), int(r.n_trips), int(r.n_users)) \
        == (ca, cb, 4, 3)


def test_co_movement_micro(spark):
    """Hand-built convoy: devices 1+2 travel together on 3 days, device
    3 shares a position with them on ONE day only, device 4 is far away
    every day. min_buckets=2 keeps exactly the (1,2) pair with the
    right bucket count and integer distance extremes; min_buckets=1
    also admits the one-day contacts."""
    day = 86400
    rows = []
    # devices 1 and 2: ~0.1 deg apart on days 0, 1, 2 (several fixes/day;
    # the representative is the FIRST by ts)
    for d in range(3):
        for k in range(3):
            rows.append((1, d * 10 + k, _ts(d * day + k * 60),
                         10.0 + d, 20.0))
            rows.append((2, d * 10 + k, _ts(d * day + k * 60 + 30),
                         10.1 + d, 20.0))
    # device 3 joins the convoy on day 1 only, then leaves the canvas
    rows.append((3, 100, _ts(1 * day + 7), 11.05, 20.0))
    rows.append((3, 101, _ts(2 * day + 7), 50.0, 50.0))
    # device 4: always far
    for d in range(3):
        rows.append((4, 200 + d, _ts(d * day + 5), -100.0, 40.0))
    pdf = pd.DataFrame(rows, columns=["user_id", "event_id", "ts", "lng", "lat"])
    ev = spark.createDataFrame(pdf)

    got = {
        (r.user_1, r.user_2): (r.n_buckets, r.min_dist_u, r.max_dist_u)
        for r in TJ.co_movement(
            ev, distance=0.5, bucket_s=day, min_buckets=2
        ).collect()
    }
    # |lng1 - lng2| = 0.1 every day -> dist_u = floor(0.1 * 1e6) with the
    # engine's sqrt((10.x+d) deltas) tree; compute the exact twin value
    import math
    exp_d = [
        math.floor(math.sqrt(((10.0 + d) - (10.1 + d)) ** 2 + 0.0) * 1e6)
        for d in range(3)
    ]
    assert got == {(1, 2): (3, min(exp_d), max(exp_d))}

    loose = {
        (r.user_1, r.user_2): r.n_buckets
        for r in TJ.co_movement(
            ev, distance=0.5, bucket_s=day, min_buckets=1
        ).collect()
    }
    assert loose[(1, 2)] == 3
    assert loose[(1, 3)] == 1 and loose[(2, 3)] == 1  # one-day contact
    assert not any(4 in k for k in loose)  # far device never pairs


def test_co_movement_same_place_different_day_never_pairs(spark):
    """The temporal key is load-bearing: two devices at the IDENTICAL
    position on DIFFERENT days must produce zero pairs (the keyed
    within_distance_self_join blocks on (bucket, cell))."""
    rows = [
        (1, 0, _ts(0), 10.0, 20.0),
        (2, 1, _ts(86400 + 1), 10.0, 20.0),
    ]
    pdf = pd.DataFrame(rows, columns=["user_id", "event_id", "ts", "lng", "lat"])
    out = TJ.co_movement(
        spark.createDataFrame(pdf), distance=1.0, bucket_s=86400,
        min_buckets=1,
    )
    assert out.count() == 0


def test_co_movement_representative_is_first_fix(spark):
    """Within a bucket only the FIRST fix (by ts, event_id) represents
    the device: device 2's later in-range fix must not create a pair
    when its first fix is out of range."""
    rows = [
        (1, 0, _ts(0), 10.0, 20.0),
        (2, 1, _ts(10), 40.0, 40.0),   # first fix: far
        (2, 2, _ts(20), 10.0, 20.0),   # later fix: close, must be ignored
    ]
    pdf = pd.DataFrame(rows, columns=["user_id", "event_id", "ts", "lng", "lat"])
    out = TJ.co_movement(
        spark.createDataFrame(pdf), distance=1.0, bucket_s=86400,
        min_buckets=1,
    )
    assert out.count() == 0


def test_within_distance_keyed_matches_per_key_brute(spark):
    """within_distance_self_join(key_cols=...) == running the plain join
    independently per key value, across cell borders (fuzz positions
    span many cells), and the key column passes through the output."""
    from gis_shapefile_spark.operators import spatial_join as SJ

    rng = np.random.RandomState(5)
    rows = []
    pid = 0
    for b in (0, 1, 2):
        for _ in range(60):
            rows.append(
                (pid, b, float(rng.uniform(-10, 10)),
                 float(rng.uniform(-10, 10)))
            )
            pid += 1
    pdf = pd.DataFrame(rows, columns=["point_id", "bucket", "lng", "lat"])
    df = spark.createDataFrame(pdf)
    keyed = SJ.within_distance_self_join(
        df, distance=2.5, key_cols=("bucket",)
    )
    assert keyed.columns == ["bucket", "id_1", "id_2", "dist_u"]
    got = {(r.bucket, r.id_1, r.id_2, r.dist_u) for r in keyed.collect()}
    exp = set()
    for b in (0, 1, 2):
        sub = df.where(f"bucket = {b}").drop("bucket")
        for r in SJ.within_distance_self_join(sub, distance=2.5).collect():
            exp.add((b, r.id_1, r.id_2, r.dist_u))
    assert got == exp and len(got) > 50
