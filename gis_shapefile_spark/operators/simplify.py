"""Distributed geometry simplification (zoom-dependent vector outlines).

Two tiers, matching how a 10^12-geometry table is actually thinned for
vector-tile materialization:

* ``simplify_vw`` — ONE-PASS Visvalingam effective-area filter over a
  LONG vertex table (one row per vertex): a vertex survives if the
  triangle it forms with its immediate neighbors has area >= tol. Pure
  window SQL (lag/lead + one arithmetic term), one shuffle on the
  geometry key, linear work, no iteration — the shape that runs over
  billions of geometries. Dual-dialect: the area term is one shared
  text (``eff_area2_u_term``), so the DuckDB oracle matches bit-for-bit.
  Chain anchors (first/last vertex of each ring, which for closed
  shapefile rings is the repeated closing vertex) always survive, so
  rings stay closed.

  vs the classic iterative Visvalingam (re-scoring after each removal):
  the one-pass filter removes every vertex whose ORIGINAL effective
  area is below tol. It keeps strictly more vertices than the iterative
  version at the same tol (scores only grow as neighbors vanish), so it
  errs on the conservative side — the right trade for a single
  distributed pass.

* ``simplify_features`` in functions/geometry.py (Douglas-Peucker) is
  the DRIVER-side twin for dimension-scale feature tables (51 polygons)
  feeding rasterization; it guarantees a max-deviation bound the
  one-pass filter doesn't, at the cost of per-ring recursion that does
  not distribute as a window.

Zoom parameterization (``zoom_tolerances``): at web-mercator zoom z a
tile spans 360/2^z degrees of longitude and renders ~256 px, so a
triangle smaller than one pixel square (span/256)^2 is invisible —
that is the tolerance ladder vector-tile pipelines use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SCALE12 = "CAST(1000000000000 AS DOUBLE)"


def eff_area2_u_term(
    xp: str, yp: str, x: str, y: str, xn: str, yn: str
) -> str:
    """Integerized 2*effective-area of vertex (x,y) between its neighbors
    — ONE ANSI text shared by Spark codegen and the DuckDB oracle.
    |cross(v - prev, next - v)| = twice the triangle area."""
    cross = f"(({x}-{xp})*({yn}-{y}) - ({y}-{yp})*({xn}-{x}))"
    return f"CAST(floor(abs({cross}) * {_SCALE12}) AS BIGINT)"


def zoom_tolerances(zooms: list[int], tile_px: int = 256) -> list[tuple[int, int]]:
    """(zoom, tol2_u) pairs: one-pixel-square triangle area at each zoom,
    integerized as 2*area*1e12 (matching ``eff_area2_u_term``'s 2x scale).
    Computed in exact Python so both engines compare against the same
    BIGINT literal."""
    out = []
    for z in zooms:
        px = 360.0 / (1 << z) / tile_px
        out.append((z, int(px * px * 2 * 1e12)))
    return out


def simplify_vw(
    vertices: DataFrame,
    tol2_u: int | None,
    group_cols: tuple[str, ...] = ("record_number", "ring_idx"),
    idx_col: str = "idx",
    x_col: str = "x",
    y_col: str = "y",
    tol_col: str | None = None,
) -> DataFrame:
    """One-pass effective-area filter over a long vertex table.

    Keeps chain anchors (no prev / no next) plus every vertex whose
    integerized effective area >= the tolerance (``tol2_u`` literal, or
    per-row ``tol_col`` when the zoom dimension is part of the group).
    Output = surviving rows with ``pt_idx`` renumbered 1..k per group
    (original ``idx_col`` order). One shuffle (the group window); the
    area term is whole-stage codegen.
    """
    if tol2_u is None and tol_col is None:
        raise ValueError(
            "simplify_vw: provide tol2_u (a single integerized tolerance) "
            "or tol_col (a per-row tolerance column) — both are None"
        )
    w = Window.partitionBy(*group_cols).orderBy(idx_col)
    nb = (
        vertices.withColumn("__xp", F.lag(x_col).over(w))
        .withColumn("__yp", F.lag(y_col).over(w))
        .withColumn("__xn", F.lead(x_col).over(w))
        .withColumn("__yn", F.lead(y_col).over(w))
    )
    area = F.expr(
        eff_area2_u_term("__xp", "__yp", x_col, y_col, "__xn", "__yn")
    )
    tol = F.col(tol_col) if tol_col else F.lit(int(tol2_u))
    kept = nb.where(
        F.col("__xp").isNull() | F.col("__xn").isNull() | (area >= tol)
    ).drop("__xp", "__yp", "__xn", "__yn")
    return kept.withColumn(
        "pt_idx", F.row_number().over(w).cast("long")
    )
