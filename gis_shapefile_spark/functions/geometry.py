"""Vectorized geometry kernels (numpy over Arrow batches).

Reimplements, batch-vectorized, the reference's geometry semantics:

* bbox fold over all parts/rings   — ``src/shapefile/geometry.cpp:29-76``
* ray-cast even-odd point-in-ring  — ``src/shapefile/geometry.cpp:87-103``
* polygon contains = inside ring 0 (shell) AND inside no later ring (hole);
  ring role is positional, winding ignored — ``geometry.cpp:106-118``
* closed-interval bbox contains    — ``geometry.cpp:9-12``
* bbox intersects (touching edges count) — ``geometry.cpp:14-17``
* Euclidean-on-degrees distance    — ``src/geocoding/geocoder.cpp:463-468``

Geometry wire format used everywhere in the engine (never a Python object
per row): flattened vertex arrays + ring-size offsets —
``xs: array<double>, ys: array<double>, ring_sizes: array<int>`` — which map
1:1 onto Arrow ListArrays, so pandas_udf batches see contiguous buffers.

The PIP kernel is the *refine* phase of the cell-join (coarse phase =
cell equi-join planned by Catalyst); it vectorizes across the whole Arrow
batch: one flat edge table for all (point, polygon) candidate rows, one
``np.add.reduceat``-free bincount per ring — no per-row Python loops.
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# bbox predicates / folds (column-expression analogues live in operators/)
# ---------------------------------------------------------------------------

def bbox_of_rings(xs: list[np.ndarray], ys: list[np.ndarray]) -> tuple[float, float, float, float]:
    """Min/max fold over every vertex of every ring (geometry.cpp:56-76)."""
    ax = np.concatenate([np.asarray(a, np.float64) for a in xs]) if xs else np.empty(0)
    ay = np.concatenate([np.asarray(a, np.float64) for a in ys]) if ys else np.empty(0)
    if ax.size == 0:
        return (0.0, 0.0, 0.0, 0.0)
    return (float(ax.min()), float(ay.min()), float(ax.max()), float(ay.max()))


def bbox_contains(minx, miny, maxx, maxy, px, py) -> np.ndarray:
    """Closed-interval containment (geometry.cpp:9-12), vectorized."""
    return (px >= minx) & (px <= maxx) & (py >= miny) & (py <= maxy)


def bbox_intersects(aminx, aminy, amaxx, amaxy, bminx, bminy, bmaxx, bmaxy) -> np.ndarray:
    """Negated-disjoint test (geometry.cpp:14-17): touching edges intersect."""
    return ~((bminx > amaxx) | (bmaxx < aminx) | (bminy > amaxy) | (bmaxy < aminy))


def euclid_degrees(x1, y1, x2, y2) -> np.ndarray:
    """Reference distance: Euclidean on raw degrees (geocoder.cpp:463-468)."""
    dx = np.asarray(x1, np.float64) - np.asarray(x2, np.float64)
    dy = np.asarray(y1, np.float64) - np.asarray(y2, np.float64)
    return np.sqrt(dx * dx + dy * dy)


# ---------------------------------------------------------------------------
# point-in-polygon, batch-vectorized
# ---------------------------------------------------------------------------

def _ring_crossings(px_e, py_e, x1, y1, x2, y2) -> np.ndarray:
    """Per-edge ray-cast predicate, exactly geometry.cpp:96-99.

    Edge (pi=(x1,y1) -> pj=(x2,y2)); crossing iff
    ``(y1 > py) != (y2 > py)`` and ``px < (x2-x1)*(py-y1)/(y2-y1) + x1``.
    """
    straddles = (y1 > py_e) != (y2 > py_e)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = (x2 - x1) * (py_e - y1) / (y2 - y1) + x1
    return straddles & (px_e < xint)


def points_in_rings(
    px: np.ndarray,
    py: np.ndarray,
    flat_xs: np.ndarray,
    flat_ys: np.ndarray,
    ring_sizes: np.ndarray,
    ring_row: np.ndarray,
    ring_is_shell: np.ndarray,
) -> np.ndarray:
    """Batch PIP over heterogeneous candidate rows.

    Inputs describe R rows (point, polygon candidate) whose rings were
    flattened into one global vertex buffer:

    * ``px, py``          — (R,) point coords per row
    * ``flat_xs/flat_ys`` — all vertices of all rings of all rows, concat'd
    * ``ring_sizes``      — (G,) vertex count per ring (global ring order)
    * ``ring_row``        — (G,) owning row index of each ring
    * ``ring_is_shell``   — (G,) True for ring 0 of its row (positional role)

    Returns (R,) bool: inside shell AND inside no hole (geometry.cpp:106-118).
    """
    R = px.shape[0]
    G = ring_sizes.shape[0]
    if G == 0 or flat_xs.size == 0:
        return np.zeros(R, dtype=bool)

    ring_sizes = ring_sizes.astype(np.int64)
    starts = np.zeros(G, dtype=np.int64)
    np.cumsum(ring_sizes[:-1], out=starts[1:])

    # Edge i of a ring connects vertex i (pi) to the previous vertex (pj),
    # wrapping so vertex 0 pairs with the last — mirrors j=size-1 init at
    # geometry.cpp:89-101. One edge per vertex.
    n_vert = int(flat_xs.size)
    vert_ring = np.repeat(np.arange(G, dtype=np.int64), ring_sizes)

    prev_idx = np.arange(n_vert, dtype=np.int64) - 1
    ring_last = starts + ring_sizes - 1
    prev_idx[starts] = ring_last  # wrap within each ring

    x1, y1 = flat_xs, flat_ys                      # pi
    x2, y2 = flat_xs[prev_idx], flat_ys[prev_idx]  # pj

    edge_row = ring_row[vert_ring]
    crossings = _ring_crossings(px[edge_row], py[edge_row], x1, y1, x2, y2)

    # odd number of crossings per ring => inside that ring
    ring_cross = np.bincount(vert_ring, weights=crossings, minlength=G)
    inside_ring = (ring_cross.astype(np.int64) & 1).astype(bool)

    in_shell = np.zeros(R, dtype=bool)
    shell_rows = ring_row[ring_is_shell]
    # a row has exactly one shell (ring 0); scatter is safe
    in_shell[shell_rows] = inside_ring[ring_is_shell]

    in_hole = np.zeros(R, dtype=bool)
    hole_mask = ~ring_is_shell
    if hole_mask.any():
        hole_hits = np.bincount(
            ring_row[hole_mask], weights=inside_ring[hole_mask], minlength=R
        )
        in_hole = hole_hits > 0

    return in_shell & ~in_hole


def polygon_contains_points(
    ring_xs: list[np.ndarray], ring_ys: list[np.ndarray], px: np.ndarray, py: np.ndarray
) -> np.ndarray:
    """Single polygon vs many points (convenience/oracle path)."""
    px = np.asarray(px, np.float64)
    py = np.asarray(py, np.float64)
    R = px.shape[0]
    if not ring_xs:
        return np.zeros(R, dtype=bool)
    inside = np.zeros(R, dtype=bool)
    for k, (rx, ry) in enumerate(zip(ring_xs, ring_ys)):
        rx = np.asarray(rx, np.float64)
        ry = np.asarray(ry, np.float64)
        x1, y1 = rx, ry
        x2 = np.roll(rx, 1)
        y2 = np.roll(ry, 1)
        cross = _ring_crossings(
            px[:, None], py[:, None], x1[None, :], y1[None, :], x2[None, :], y2[None, :]
        )
        in_ring = (cross.sum(axis=1) & 1).astype(bool)
        if k == 0:
            inside = in_ring
        else:
            inside &= ~in_ring
    return inside


def simplify_ring(
    x: np.ndarray, y: np.ndarray, epsilon: float
) -> tuple[np.ndarray, np.ndarray]:
    """Douglas-Peucker ring simplification (iterative, numpy distances).

    Keeps every vertex whose perpendicular distance from the chord of its
    enclosing kept-segment exceeds ``epsilon``. Rings (closed) anchor on
    the first vertex and the farthest vertex from it, guaranteeing >= 3
    surviving vertices. Used to thin polygon outlines before per-tile
    rasterization — at tile pixel size p, epsilon ~ p/2 is visually
    lossless while cutting ray-cast edge counts.
    """
    n = len(x)
    if n <= 3:
        return x.copy(), y.copy()
    d0 = (x - x[0]) ** 2 + (y - y[0]) ** 2
    anchor = int(np.argmax(d0))
    keep = np.zeros(n, dtype=bool)
    keep[[0, anchor]] = True
    stack = [(0, anchor), (anchor, n - 1)]
    keep[n - 1] = True
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        sx, sy = x[i], y[i]
        exx, eyy = x[j], y[j]
        dx, dy = exx - sx, eyy - sy
        seg = x[i + 1: j], y[i + 1: j]
        L2 = dx * dx + dy * dy
        if L2 == 0.0:
            d = np.sqrt((seg[0] - sx) ** 2 + (seg[1] - sy) ** 2)
        else:
            d = np.abs(dy * seg[0] - dx * seg[1] + exx * sy - eyy * sx) / np.sqrt(L2)
        m = int(np.argmax(d))
        if d[m] > epsilon:
            k = i + 1 + m
            keep[k] = True
            stack.append((i, k))
            stack.append((k, j))
    return x[keep], y[keep]


def simplify_features(features_pdf, epsilon: float):
    """Simplify every ring of every polygon row in a feature frame
    (driver-side, dimension-scale), recomputing ring_sizes; bounds are
    preserved exactly only when their extreme vertices survive — callers
    needing exact bounds keep the originals (they are stored columns)."""
    import pandas as pd

    out = features_pdf.copy()
    new_xs, new_ys, new_sizes = [], [], []
    for _, row in features_pdf.iterrows():
        if row["shape_type"] != 5 or len(row["ring_sizes"]) == 0:
            new_xs.append(row["xs"]); new_ys.append(row["ys"])
            new_sizes.append(row["ring_sizes"])
            continue
        xs = np.asarray(row["xs"], np.float64)
        ys = np.asarray(row["ys"], np.float64)
        offs = np.concatenate([[0], np.cumsum(row["ring_sizes"])])
        rx, ry, sizes = [], [], []
        for i in range(len(row["ring_sizes"])):
            sx, sy = simplify_ring(
                xs[offs[i]: offs[i + 1]], ys[offs[i]: offs[i + 1]], epsilon
            )
            rx.append(sx); ry.append(sy); sizes.append(len(sx))
        new_xs.append(np.concatenate(rx).tolist())
        new_ys.append(np.concatenate(ry).tolist())
        new_sizes.append(sizes)
    out["xs"] = new_xs
    out["ys"] = new_ys
    out["ring_sizes"] = new_sizes
    return out


# ---------------------------------------------------------------------------
# ring measures (engine addition — the reference computes only bounds).
# Dual-dialect SQL over the flattened-array wire format: higher-order
# functions only (JVM codegen in Spark / native list kernels in DuckDB),
# no UDFs. Integerized per-EDGE (floor(term * 1e6) as BIGINT before the
# sum) so the reduction is an exact integer in any accumulation order —
# the cross-engine determinism rule for float aggregates.
# ---------------------------------------------------------------------------

_SCALE_DBL = "CAST(1000000 AS DOUBLE)"


def _edge_sum_sql(xs: str, ys: str, term: str, dialect: str) -> str:
    """SUM over edges i=1..n-1 of integerized ``term`` (uses x1,y1,x2,y2).

    ``term`` is a SQL template over ``{x1} {y1} {x2} {y2}`` (vertex i and
    i+1). Rings arrive closed (first vertex repeated last), so the edge
    range covers the full boundary.

    Degenerate rings (< 2 vertices) sum to 0 in BOTH dialects: Spark's
    ``sequence(1, 0)`` counts DOWN (same hazard CASE-gated in
    text_analysis.py::shingles_sql), so the range is gated; DuckDB's
    empty ``range`` already yields NULL -> coalesce 0.
    """
    if dialect == "spark":
        x1, y1 = f"element_at({xs}, i)", f"element_at({ys}, i)"
        x2, y2 = f"element_at({xs}, i + 1)", f"element_at({ys}, i + 1)"
        t = term.format(x1=x1, y1=y1, x2=x2, y2=y2)
        return (
            f"(CASE WHEN size({xs}) >= 2 THEN "
            f"aggregate(sequence(1, size({xs}) - 1), CAST(0 AS BIGINT), "
            f"(acc, i) -> acc + CAST(floor(({t}) * {_SCALE_DBL}) AS BIGINT)) "
            f"ELSE CAST(0 AS BIGINT) END)"
        )
    x1, y1 = f"{xs}[i]", f"{ys}[i]"
    x2, y2 = f"{xs}[i + 1]", f"{ys}[i + 1]"
    t = term.format(x1=x1, y1=y1, x2=x2, y2=y2)
    return (
        f"CAST(coalesce(list_sum(list_transform(range(1, len({xs})), "
        f"i -> CAST(floor(({t}) * {_SCALE_DBL}) AS BIGINT))), 0) AS BIGINT)"
    )


def ring_area2_sql(xs: str, ys: str, dialect: str = "spark") -> str:
    """Signed shoelace 2*area of one closed ring, integerized (1e-6 units).

    Sign follows vertex order; callers combine rings by POSITIONAL role
    (ring 0 shell minus later holes), matching the engine's PIP convention
    (geometry.cpp:106-118 ignores winding too).
    """
    return _edge_sum_sql(
        xs, ys, "{x1} * {y2} - {x2} * {y1}", dialect
    )


def ring_perim_sql(xs: str, ys: str, dialect: str = "spark") -> str:
    """Ring perimeter in Euclidean degrees, integerized (1e-6 units).

    Per-edge sqrt is a single IEEE op on identical inputs, exact in both
    engines; the floor-then-sum makes the total order-independent.
    """
    return _edge_sum_sql(
        xs,
        ys,
        "sqrt(({x2} - {x1}) * ({x2} - {x1}) + ({y2} - {y1}) * ({y2} - {y1}))",
        dialect,
    )


def ring_centroid_num_sql(xs: str, ys: str, axis: str, dialect: str = "spark") -> str:
    """Numerator of the shoelace (area-weighted) ring centroid for one
    axis, integerized per edge: ``sum floor((c1 + c2) * cross * 1e6)``
    where ``cross = x1*y2 - x2*y1``. Divide by ``3 * area2`` (in the same
    1e-6 units) for the centroid coordinate — the reference only ever
    computes bbox CENTERS (geocoder.cpp centroid = bbox midpoint); this
    is the exact polygon centroid the bbox approximation stands in for.
    """
    if axis == "x":
        c1, c2 = "{x1}", "{x2}"
    elif axis == "y":
        c1, c2 = "{y1}", "{y2}"
    else:
        raise ValueError(f"axis must be 'x' or 'y', got {axis!r}")
    return _edge_sum_sql(
        xs,
        ys,
        f"(({c1}) + ({c2})) * ({{x1}} * {{y2}} - {{x2}} * {{y1}})",
        dialect,
    )
