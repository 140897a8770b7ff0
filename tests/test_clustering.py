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


# ---------------------------------------------------------------------------
# Getis-Ord Gi*
# ---------------------------------------------------------------------------

def _gi_numpy(counts: dict[tuple[int, int], int]):
    """Text-book Gi* over the occupied-cell frame with binary 3x3
    weights incl. self: per-cell (nb_sum, nb_cnt, z)."""
    xs = np.array(list(counts.values()), dtype=np.float64)
    n = len(xs)
    xbar = xs.sum() / n
    s = np.sqrt((xs ** 2).sum() / n - xbar ** 2)
    out = {}
    for (gx, gy), x in counts.items():
        nbs = [
            counts[(gx + dx, gy + dy)]
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            if (gx + dx, gy + dy) in counts
        ]
        si, wi = float(sum(nbs)), float(len(nbs))
        den = s * np.sqrt((n * wi - wi * wi) / (n - 1))
        z = None if den <= 0 else (si - xbar * wi) / den
        out[(gx, gy)] = (int(sum(nbs)), len(nbs), z)
    return out


def test_getis_ord_matches_numpy_oracle(spark):
    """Planted hot cluster: a dense 2x2 block + uniform background.
    Engine == textbook numpy Gi* on every cell (integerized z within
    1 ulp-of-floor), and the hot block is strongly significant."""
    from gis_shapefile_spark.operators.clustering import getis_ord_gi

    res = 6
    rows = []
    # background: one point in each of 30 scattered cells
    for i in range(30):
        gx, gy = 3 + (i * 7) % 40, 5 + (i * 11) % 30
        rows.append((len(rows), *_cell_center(gx, gy, res)))
    # hot 2x2 block: 25 points per cell
    for gx, gy in [(20, 15), (21, 15), (20, 16), (21, 16)]:
        for _ in range(25):
            rows.append((len(rows), *_cell_center(gx, gy, res)))
    pdf = pd.DataFrame(rows, columns=["point_id", "lng", "lat"])
    got = getis_ord_gi(spark.createDataFrame(pdf), res=res).toPandas()

    counts: dict[tuple[int, int], int] = {}
    for _, r in pdf.iterrows():
        gx = int((r.lng + 180.0) / 360.0 * (1 << res))
        gy = int((r.lat + 90.0) / 180.0 * (1 << res))
        counts[(gx, gy)] = counts.get((gx, gy), 0) + 1
    exp = _gi_numpy(counts)
    assert len(got) == len(exp)

    def _compact(v: int) -> int:  # demorton, the cells.py bit-gather
        v &= 0x5555555555555555
        v = (v | (v >> 1)) & 0x3333333333333333
        v = (v | (v >> 2)) & 0x0F0F0F0F0F0F0F0F
        v = (v | (v >> 4)) & 0x00FF00FF00FF00FF
        v = (v | (v >> 8)) & 0x0000FFFF0000FFFF
        return (v | (v >> 16)) & ((1 << 26) - 1)

    got_by_key = {}
    for r in got.itertuples(index=False):
        morton = int(r.cell) & ((1 << 52) - 1)
        got_by_key[(_compact(morton), _compact(morton >> 1))] = r
    assert set(got_by_key) == set(exp)
    hot_z = []
    for key, (si, wi, z) in exp.items():
        r = got_by_key[key]
        assert (int(r.nb_sum), int(r.nb_cnt)) == (si, wi)
        if z is None:
            assert pd.isna(r.gi_u)
        else:
            assert abs(int(r.gi_u) - np.floor(z * 1e6)) <= 1
        if counts[key] == 25:
            hot_z.append(z)
    assert all(z > 1.96 for z in hot_z)  # the planted block is significant
    # background cells are not
    assert sum(
        1 for key, (_, _, z) in exp.items()
        if counts[key] == 1 and z is not None and z > 1.96
    ) == 0


def _cell_center(gx: int, gy: int, res: int) -> tuple[float, float]:
    n = 1 << res
    return (-180.0 + (gx + 0.5) * 360.0 / n, -90.0 + (gy + 0.5) * 180.0 / n)


# ---------------------------------------------------------------------------
# Mann-Kendall emerging hotspots
# ---------------------------------------------------------------------------

def _mk_python(series):
    """Textbook MK with tie correction over one dense series."""
    T = len(series)
    s = sum(
        (1 if series[j] > series[i] else -1 if series[j] < series[i] else 0)
        for i in range(T) for j in range(i + 1, T)
    )
    from collections import Counter

    ties = Counter(series)
    tie18 = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    var18 = T * (T - 1) * (2 * T + 5) - tie18
    if var18 <= 0:
        z = None
    elif s == 0:
        z = 0.0
    else:
        sd = np.sqrt(var18 / 18.0)
        z = (s - 1) / sd if s > 0 else (s + 1) / sd
    return s, var18, z


def test_emerging_hotspots_matches_python_mk(spark):
    """Planted per-cell series: monotone rising, monotone falling,
    constant (degenerate variance -> NULL), and a bursty tie-heavy
    series — engine == textbook MK for every cell."""
    import datetime as dt

    from gis_shapefile_spark.operators.clustering import emerging_hotspots

    res = 6
    n = 1 << res

    def center(gx, gy):
        return (-180.0 + (gx + 0.5) * 360.0 / n,
                -90.0 + (gy + 0.5) * 180.0 / n)

    day0 = dt.datetime(2024, 3, 1, tzinfo=dt.timezone.utc)
    series = {
        (10, 10): [1, 2, 3, 4, 5, 6, 7, 8],        # rising
        (12, 10): [8, 7, 6, 5, 4, 3, 2, 1],        # falling
        (14, 10): [3, 3, 3, 3, 3, 3, 3, 3],        # constant -> NULL z
        (16, 10): [0, 5, 0, 5, 0, 5, 0, 5],        # bursty ties
        (18, 10): [2, 0, 0, 0, 0, 0, 0, 0],        # day-1 only -> falls
    }
    rows = []
    for (gx, gy), xs in series.items():
        lng, lat = center(gx, gy)
        for d, cnt in enumerate(xs):
            for k in range(cnt):
                rows.append((lng, lat, day0 + dt.timedelta(days=d,
                                                           seconds=k)))
    pdf = pd.DataFrame(rows, columns=["lng", "lat", "ts"])
    got = emerging_hotspots(
        spark.createDataFrame(pdf), res=res, bucket_s=86400
    ).toPandas()
    assert len(got) == len(series)

    def _compact2(v):
        v &= 0x5555555555555555
        v = (v | (v >> 1)) & 0x3333333333333333
        v = (v | (v >> 2)) & 0x0F0F0F0F0F0F0F0F
        v = (v | (v >> 4)) & 0x00FF00FF00FF00FF
        v = (v | (v >> 8)) & 0x0000FFFF0000FFFF
        return (v | (v >> 16)) & ((1 << 26) - 1)

    for r in got.itertuples(index=False):
        m = int(r.cell) & ((1 << 52) - 1)
        key = (_compact2(m), _compact2(m >> 1))
        xs = series[key]
        s, var18, z = _mk_python(xs)
        assert (int(r.s_stat), int(r.var18)) == (s, var18), key
        assert int(r.n_obs) == sum(1 for x in xs if x > 0)
        if z is None:
            assert pd.isna(r.mk_z_u), key
        else:
            assert abs(int(r.mk_z_u) - np.floor(z * 1e6)) <= 1, key
    # signs land where planted
    by_key = {}
    for r in got.itertuples(index=False):
        m = int(r.cell) & ((1 << 52) - 1)
        by_key[(_compact2(m), _compact2(m >> 1))] = r
    assert int(by_key[(10, 10)].mk_z_u) > 2_000_000
    assert int(by_key[(12, 10)].mk_z_u) < -2_000_000
    assert int(by_key[(18, 10)].mk_z_u) < 0  # dense zeros force the fall


# ---------------------------------------------------------------------------
# Ripley's K
# ---------------------------------------------------------------------------

def test_ripley_k_matches_bruteforce_and_detects_clustering(spark):
    """== brute-force K on a mixed pattern, and the diagnostic reads
    right: a tightly clustered pattern gives K >> CSR at small r, a
    near-regular grid gives K << CSR at sub-spacing r."""
    import math

    from gis_shapefile_spark.operators.clustering import ripley_k

    rng = np.random.default_rng(5)
    area = 10.0 * 10.0
    # clustered: 5 tight blobs of 40 points
    blobs = []
    for c in range(5):
        cx, cy = rng.uniform(-48, -42), rng.uniform(32, 38)
        for _ in range(40):
            # NB: len(blobs) must advance per point (a comprehension
            # evaluates it against the pre-append list -> duplicate ids
            # -> id_1 < id_2 silently drops every intra-blob pair)
            blobs.append(
                (len(blobs), cx + rng.normal(0, 0.05),
                 cy + rng.normal(0, 0.05))
            )
    pdf = pd.DataFrame(blobs, columns=["point_id", "lng", "lat"])
    radii = (0.25, 1.0)
    got = (
        ripley_k(spark.createDataFrame(pdf), radii=radii, area=area)
        .toPandas().set_index("r_u").sort_index()
    )
    # brute force
    n = len(pdf)
    xs, ys = pdf.lng.values, pdf.lat.values
    d = np.sqrt(
        (xs[:, None] - xs[None, :]) ** 2 + (ys[:, None] - ys[None, :]) ** 2
    )
    iu = np.triu_indices(n, 1)
    du = np.floor(d[iu] * 1e6).astype(np.int64)
    for r in radii:
        r_u = int(math.floor(r * 1e6))
        npairs = int((du <= r_u).sum()) * 2
        row = got.loc[r_u]
        assert int(row.n_pairs) == npairs
        k = 2 * (npairs / 2) * area / (n * (n - 1))
        assert abs(int(row.k_u) - math.floor(k * 1e12)) <= 1
        # tight blobs: strongly clustered at r = 0.25
        if r == 0.25:
            assert int(row.k_u) > 3 * int(row.csr_u)

    # near-regular grid: dispersed below the 1-deg spacing
    grid = [
        (i * 20 + j, -48.0 + i * 1.0, 32.0 + j * 1.0)
        for i in range(10) for j in range(10)
    ]
    gdf = pd.DataFrame(grid, columns=["point_id", "lng", "lat"])
    got2 = (
        ripley_k(spark.createDataFrame(gdf), radii=(0.5,), area=81.0)
        .toPandas().iloc[0]
    )
    assert int(got2.n_pairs) == 0          # no pair within half the spacing
    assert int(got2.k_u) == 0 < int(got2.csr_u)


def test_ripley_k_validation():
    from gis_shapefile_spark.operators.clustering import ripley_k

    import pytest as _pytest

    with _pytest.raises(ValueError):
        ripley_k(None, radii=(), area=1.0)
    with _pytest.raises(ValueError):
        ripley_k(None, radii=(0.5,), area=0.0)


def test_g_function_matches_bruteforce(spark):
    """== numpy NN-distance CDF on a mixed pattern; tight pairs push
    G(small r) high while the singleton tail keeps it < 1."""
    import math

    from gis_shapefile_spark.operators.clustering import g_function

    rng = np.random.default_rng(11)
    rows = []
    # 30 tight pairs (NN ~ 0.01) + 40 scattered singletons
    for i in range(30):
        cx, cy = rng.uniform(-50, -40), rng.uniform(30, 40)
        rows.append((len(rows), cx, cy))
        rows.append((len(rows), cx + 0.01, cy))
    for i in range(40):
        rows.append(
            (len(rows), rng.uniform(-70, -60), rng.uniform(30, 40))
        )
    pdf = pd.DataFrame(rows, columns=["point_id", "lng", "lat"])
    radii = (0.05, 0.5)
    got = (
        g_function(spark.createDataFrame(pdf), radii=radii)
        .toPandas().set_index("r_u").sort_index()
    )
    xs, ys = pdf.lng.values, pdf.lat.values
    d = np.sqrt(
        (xs[:, None] - xs[None, :]) ** 2 + (ys[:, None] - ys[None, :]) ** 2
    )
    np.fill_diagonal(d, np.inf)
    nn_u = np.floor(d.min(axis=1) * 1e6).astype(np.int64)
    n = len(pdf)
    for r in radii:
        r_u = int(math.floor(r * 1e6))
        n_le = int((nn_u <= r_u).sum())
        row = got.loc[r_u]
        assert int(row.n_le) == n_le, r
        assert int(row.g_bp) == math.floor(10000 * n_le / n)
    # the planted structure reads correctly
    assert int(got.loc[50000].n_le) == 60      # exactly the tight pairs
    assert 0 < int(got.loc[50000].g_bp) < 10000
