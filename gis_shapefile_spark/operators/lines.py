"""Point-to-polyline operators (nearest road / within-distance-of-line).

The reference decodes polyline geometry (``src/shapefile_reader.cpp``
PolyLine branch) but its spatial index only ever queries bbox centers —
nearest-LINE lookup is an engine addition the tiling/geocoding pipeline
needs (snap an image point to the nearest road segment).

Design (same shape as ``spatial_join.within_distance_join``):

* the line table is dimension-scale — explode polylines to SEGMENTS on
  the driver (``polyline_segments``), pad each segment bbox by the search
  radius, cover with cells, broadcast the (cell, segment) table;
* the point side (10^12 rows) computes its cell key and equi-joins —
  pure codegen, zero Python, no shuffle of the point table beyond the
  broadcast hash join;
* point→segment distance is ONE dual-dialect arithmetic expression
  (``point_segment_dsq_sql``): clamp the projection parameter t to
  [0, 1] with greatest/least, then squared distance to the clamped
  foot. The same text runs in Spark (whole-stage codegen) and DuckDB
  (the oracle), so the IEEE op tree is identical and the integerized
  ``floor(dsq * 1e12)`` matches bit-for-bit;
* the radius filter and the argmin both use the INTEGERIZED value, so a
  1-ulp boundary disagreement cannot change the output row set;
* top-1 per point = row_number over (dsq_u, road_id, seg_id) — the
  deterministic tie-break.

Candidate guarantee: a point within ``radius`` of a segment lies inside
that segment's radius-padded bbox, hence its cell is one of the covering
cells — the equi-join can only ADD candidates (pruned by the dsq filter),
never lose the true nearest-within-radius.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import cells as C

_SCALE12 = "CAST(1000000000000 AS DOUBLE)"  # 1e-12 deg^2 integerization


def polyline_segments(roads_pdf: pd.DataFrame) -> pd.DataFrame:
    """Explode polyline rows (xs, ys, part_sizes) into one row per segment.

    seg_id numbers segments consecutively within a road, skipping across
    part boundaries (a two-part road with sizes [4, 4] yields segments
    0-2 and 3-5 — no segment bridges the gap). Zero-length segments are
    dropped (their dsq expression would divide by zero; they add no
    distance information a neighboring segment endpoint doesn't carry).
    """
    rows = []
    for _, r in roads_pdf.iterrows():
        xs = np.asarray(r["xs"], np.float64)
        ys = np.asarray(r["ys"], np.float64)
        offs = np.concatenate([[0], np.cumsum(r["part_sizes"])]).astype(int)
        seg = 0
        for p in range(len(r["part_sizes"])):
            for k in range(offs[p], offs[p + 1] - 1):
                ax, ay, bx, by = xs[k], ys[k], xs[k + 1], ys[k + 1]
                if ax == bx and ay == by:
                    continue
                rows.append(
                    (int(r["road_id"]), seg, float(ax), float(ay),
                     float(bx), float(by))
                )
                seg += 1
    return pd.DataFrame(
        rows, columns=["road_id", "seg_id", "ax", "ay", "bx", "by"]
    )


def point_segment_dsq_sql(
    px: str, py: str, ax: str, ay: str, bx: str, by: str
) -> str:
    """Squared point→segment distance as ONE ANSI expression (both dialects).

    t = clamp(dot(p-a, b-a) / |b-a|^2, 0, 1); dsq = |p - (a + t*(b-a))|^2.
    Callers must guarantee non-degenerate segments (|b-a| > 0) — enforced
    by ``polyline_segments``. The text is shared verbatim between Spark
    and DuckDB so the IEEE op tree is identical (CLAUDE.md determinism
    rule); inputs must already be DOUBLE columns.
    """
    l2 = f"(({bx}-{ax})*({bx}-{ax}) + ({by}-{ay})*({by}-{ay}))"
    dot = f"(({px}-{ax})*({bx}-{ax}) + ({py}-{ay})*({by}-{ay}))"
    t = f"greatest(CAST(0 AS DOUBLE), least(CAST(1 AS DOUBLE), {dot} / {l2}))"
    qx = f"({ax} + {t} * ({bx}-{ax}))"
    qy = f"({ay} + {t} * ({by}-{ay}))"
    return f"(({px}-{qx})*({px}-{qx}) + ({py}-{qy})*({py}-{qy}))"


def point_segment_dsq_np(px, py, ax, ay, bx, by):
    """Vectorized numpy twin of ``point_segment_dsq_sql`` (same op order)."""
    px, py = np.asarray(px, np.float64), np.asarray(py, np.float64)
    l2 = (bx - ax) * (bx - ax) + (by - ay) * (by - ay)
    dot = (px - ax) * (bx - ax) + (py - ay) * (by - ay)
    t = np.maximum(0.0, np.minimum(1.0, dot / l2))
    qx = ax + t * (bx - ax)
    qy = ay + t * (by - ay)
    return (px - qx) * (px - qx) + (py - qy) * (py - qy)


def dsq_u_sql(px: str, py: str, ax: str, ay: str, bx: str, by: str) -> str:
    dsq = point_segment_dsq_sql(px, py, ax, ay, bx, by)
    return f"CAST(floor({dsq} * {_SCALE12}) AS BIGINT)"


def radius2_u(radius: float) -> int:
    """The integerized radius^2 threshold (exact Python int, both engines
    compare against the same literal)."""
    return int(np.floor(radius * radius * 1e12))


def segment_cell_cover(
    segments_pdf: pd.DataFrame, radius: float, res: int
) -> pd.DataFrame:
    """(cell, road_id, seg_id, ax, ay, bx, by): covering cells of each
    segment's radius-padded bbox. Driver-side, dimension-scale; the
    explode factor is bounded by res choice (long segments cover
    O(len/cell + 2) × O(2) cells — overcount is pruned by the dsq
    filter, never a correctness issue)."""
    rows = []
    # itertuples + hoisted scalars: the inner loop runs once per covered
    # CELL (thousands per segment at buffer radii), and pandas row
    # attribute access inside it cost 2.1M Series.__getattr__ calls /
    # ~25 s of DRIVER time at sf0.01 (profiled round 4); plain tuples
    # make the same enumeration sub-second
    for s in segments_pdf.itertuples(index=False):
        ax, ay = float(s.ax), float(s.ay)
        bx, by = float(s.bx), float(s.by)
        rid, sid = int(s.road_id), int(s.seg_id)
        cover = C.cover_bbox(
            min(ax, bx) - radius, min(ay, by) - radius,
            max(ax, bx) + radius, max(ay, by) + radius, res,
        )
        rows.extend(
            (int(c), rid, sid, ax, ay, bx, by) for c in cover
        )
    return pd.DataFrame(
        rows,
        columns=["cell", "road_id", "seg_id", "ax", "ay", "bx", "by"],
    )


def _score_and_topk(
    joined: DataFrame,
    radius: float,
    k: int,
    lng_col: str,
    lat_col: str,
    point_id_col: str,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Shared tail of both join variants: integerized dsq + radius filter
    + windowed top-k (map-side WindowGroupLimit before the one exchange).
    ``carry_cols`` pass through from the point side (e.g. a device key
    for map-matching rollups); names that collide with the output or
    internal columns are rejected up front (an ambiguous-reference
    analysis error — or a silently wrong selection — otherwise)."""
    reserved = {
        point_id_col, "road_id", "seg_id", "dsq_u", "nn_rank", "cell",
        "ax", "ay", "bx", "by",
    }
    clash = [c for c in carry_cols if c in reserved]
    if clash:
        raise ValueError(
            f"carry_cols {clash} collide with reserved output/internal "
            f"columns {sorted(reserved)}; alias them on the point side first"
        )
    scored = joined.withColumn(
        "dsq_u",
        F.expr(dsq_u_sql(lng_col, lat_col, "ax", "ay", "bx", "by")),
    ).where(F.col("dsq_u") <= F.lit(radius2_u(radius)))
    w = Window.partitionBy(point_id_col).orderBy("dsq_u", "road_id", "seg_id")
    return (
        scored.withColumn("nn_rank", F.row_number().over(w))
        .where(F.col("nn_rank") <= k)
        .select(
            point_id_col,
            *carry_cols,
            F.col("nn_rank").cast("long").alias("nn_rank"),
            F.col("road_id").cast("long").alias("road_id"),
            F.col("seg_id").cast("long").alias("seg_id"),
            "dsq_u",
        )
    )


def within_distance_of_segments(
    spark: SparkSession,
    points: DataFrame,
    roads_pdf: pd.DataFrame,
    radius: float,
    res: int | None = None,
    lng_col: str = "lng",
    lat_col: str = "lat",
    point_id_col: str = "point_id",
) -> DataFrame:
    """Line-buffer membership: one row per point with ANY segment within
    ``radius`` (the curation predicate "keep/drop images near a road"),
    with the count of in-range segments and the min integerized dsq.

    Same broadcast cell-cover candidates as ``nearest_segment_join`` but
    NO window — a partial-aggregable groupBy, so the plan is scan →
    broadcast join → filter → partial agg → one exchange.
    """
    segs = polyline_segments(roads_pdf)
    if res is None:
        res = C.resolution_for_bbox(2 * radius, 2 * radius, max_cells=64)
    dim = spark.createDataFrame(segment_cell_cover(segs, radius, res))
    pts = points.withColumn("__cell", C.cell_col(lng_col, lat_col, res))
    scored = (
        pts.join(F.broadcast(dim), pts["__cell"] == dim["cell"], "inner")
        .drop("cell", "__cell")
        .withColumn(
            "dsq_u",
            F.expr(dsq_u_sql(lng_col, lat_col, "ax", "ay", "bx", "by")),
        )
        .where(F.col("dsq_u") <= F.lit(radius2_u(radius)))
    )
    return scored.groupBy(point_id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        F.min("dsq_u").alias("min_dsq_u"),
    )


def nearest_segment_join(
    spark: SparkSession,
    points: DataFrame,
    roads_pdf: pd.DataFrame,
    radius: float,
    res: int | None = None,
    k: int = 1,
    lng_col: str = "lng",
    lat_col: str = "lat",
    point_id_col: str = "point_id",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """k nearest road segments within ``radius`` of each point —
    DIMENSION-SCALE road sets (city/state networks, <= millions of
    covering rows): segments explode on the driver and broadcast.

    Output: point_id, nn_rank (1..k), road_id, seg_id, dsq_u. Points with
    no segment within ``radius`` produce no rows (the reference's
    spatial-index miss semantics — callers wanting a fallback union the
    anti-join side). For planet-scale road tables use
    ``nearest_segment_join_big`` (identical output, no driver work).
    """
    segs = polyline_segments(roads_pdf)
    if res is None:
        res = C.resolution_for_bbox(2 * radius, 2 * radius, max_cells=64)
    dim = spark.createDataFrame(segment_cell_cover(segs, radius, res))
    pts = points.withColumn("__cell", C.cell_col(lng_col, lat_col, res))
    joined = pts.join(
        F.broadcast(dim), pts["__cell"] == dim["cell"], "inner"
    ).drop("cell", "__cell")
    return _score_and_topk(joined, radius, k, lng_col, lat_col,
                           point_id_col, carry_cols)


def segment_cover_df(
    segments: DataFrame, radius: float, res: int
) -> DataFrame:
    """Distributed twin of ``segment_cell_cover``: covering cells of each
    segment's radius-padded bbox enumerated IN the plan — two
    sequence-explodes over the clamped axis-index ranges, then the
    integer pack (``cells.pack_xy_sql``). Pure codegen; cover fan-out is
    the caller's res policy, exactly like the numpy path (value-parity
    tested)."""
    from ..functions.litsql import double_literal

    r = double_literal(radius)
    x0 = f"(least(ax, bx) - {r})"
    x1 = f"(greatest(ax, bx) + {r})"
    y0 = f"(least(ay, by) - {r})"
    y1 = f"(greatest(ay, by) + {r})"
    xi0 = C.axis_index_sql(x0, 180.0, 360.0, res, "spark")
    xi1 = C.axis_index_sql(x1, 180.0, 360.0, res, "spark")
    yi0 = C.axis_index_sql(y0, 90.0, 180.0, res, "spark")
    yi1 = C.axis_index_sql(y1, 90.0, 180.0, res, "spark")
    return (
        segments.withColumn("__xi", F.explode(F.expr(f"sequence({xi0}, {xi1})")))
        .withColumn("__yi", F.explode(F.expr(f"sequence({yi0}, {yi1})")))
        .withColumn("cell", F.expr(C.pack_xy_sql("__xi", "__yi", res, "spark")))
        .drop("__xi", "__yi")
    )


def nearest_segment_join_big(
    points: DataFrame,
    segments: DataFrame,
    radius: float,
    res: int,
    k: int = 1,
    lng_col: str = "lng",
    lat_col: str = "lat",
    point_id_col: str = "point_id",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """k nearest segments within ``radius`` — PLANET-SCALE road tables
    (OSM: ~10^8 segments), where a driver-side explode/broadcast is the
    scale-killer. The covering-cell table is built in the plan
    (``segment_cover_df``) and the point↔cover join shuffles on the cell
    key (AQE picks broadcast anyway when the road side is small, so this
    variant strictly dominates except for the res-policy default).
    Output is row-identical to ``nearest_segment_join`` (both oracle-
    checked against the same SQL)."""
    cov = segment_cover_df(
        segments.select("road_id", "seg_id", "ax", "ay", "bx", "by"),
        radius,
        res,
    )
    pts = points.withColumn("__cell", C.cell_col(lng_col, lat_col, res))
    joined = pts.join(cov, pts["__cell"] == cov["cell"], "inner").drop(
        "cell", "__cell"
    )
    return _score_and_topk(joined, radius, k, lng_col, lat_col,
                           point_id_col, carry_cols)
