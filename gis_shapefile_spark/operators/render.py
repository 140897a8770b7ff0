"""Map-tile rendering: points -> Web-Mercator XYZ density tiles -> PNG.

The serving side of the image/tile pipeline (reference scope: the
engine's tiling operators; the reference itself stops at bbox tile
stats, ``src/spatial/spatial_index.cpp``). This renders the standard
slippy-map tile set a browser map consumes, with the scale split the
100-TB design demands:

1. ``density_pixels`` — pixel assignment ENTIRELY in JVM codegen: the
   pixel grid of a z-level tile at 2^k px is exactly the web-mercator
   tile grid at z+k (floor(u * 2^(z+k)) >> k == floor(u * 2^z) for
   u >= 0), so one transcendental y-projection per point yields
   (tile_x, tile_y, px, py) by shifts and masks, then a single
   partial-agg count per pixel. 10^12 points never touch Python; the
   aggregated output is bounded by tiles x tile_px^2, not points.
2. ``render_png_tiles`` — applyInPandas ONLY over those pixel-count
   rows (<= 2^2k per tile): normalize counts to uint8 (floor(n*255 /
   tile max) — brightest pixel is always 255), write a real PNG
   (``functions/png.py``; filter-0 grayscale, deterministic bytes).

Binary tile payloads follow the repo rule: never repartitioned; write
them through ``plans/layout.py`` partitioned by a coarse parent tile
for XYZ-path-shaped reads.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import png as PNG
from ..functions import webmercator as WM
from ..functions.cells import _shr


def pixel_sql_parts(
    lng: str, lat: str, z: int, px_log2: int, dialect: str = "spark"
) -> tuple[str, str, dict[str, str]]:
    """(fine_x_expr, fine_y_expr, {tx,ty,px,py} exprs over names _txf/_tyf).

    Shared by the DataFrame op and the DuckDB oracle so both engines
    evaluate the identical expression tree (CLAUDE.md determinism rule).
    """
    zf = z + px_log2
    mask = (1 << px_log2) - 1
    txf = WM.tile_x_sql(lng, zf, dialect)
    tyf = WM.tile_y_sql(lat, zf, dialect)
    derived = {
        "tx": _shr("_txf", px_log2, dialect),
        "ty": _shr("_tyf", px_log2, dialect),
        "px": f"(_txf & {mask})",
        "py": f"(_tyf & {mask})",
    }
    return txf, tyf, derived


def density_pixels(
    points: DataFrame,
    z: int,
    px_log2: int = 5,
    lng_col: str = "lng",
    lat_col: str = "lat",
) -> DataFrame:
    """(tx, ty, px, py, n) per non-empty pixel of each z-level tile at
    2^px_log2 px — pure codegen + one partial-agg shuffle; output
    bounded by occupied pixels, never point count. py is top-down
    (tile row 0 = north), matching both XYZ convention and PNG rows."""
    txf, tyf, d = pixel_sql_parts(lng_col, lat_col, z, px_log2, "spark")
    fine = points.select(
        F.expr(txf).alias("_txf"), F.expr(tyf).alias("_tyf")
    )
    return (
        fine.select(
            F.expr(d["tx"]).alias("tx"),
            F.expr(d["ty"]).alias("ty"),
            F.expr(d["px"]).alias("px"),
            F.expr(d["py"]).alias("py"),
        )
        .groupBy("tx", "ty", "px", "py")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def render_png_tiles(pixels: DataFrame, tile_px: int) -> DataFrame:
    """Encode per-tile pixel counts into real grayscale PNG tiles.

    Input: ``density_pixels`` output. Per tile: val = (n * 255) //
    max(n) (integer floor division — brightest pixel exactly 255,
    empty pixels 0), grid[py, px] = val, PNG-encode. applyInPandas
    input is pixel-count rows only (<= tile_px^2 per group).
    Output: (tx, ty, n_points, nonzero_px, png binary).
    """
    schema = "tx long, ty long, n_points long, nonzero_px long, png binary"

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = (int(k) for k in key)
        n = pdf["n"].to_numpy(np.int64)
        grid = np.zeros((tile_px, tile_px), dtype=np.int64)
        grid[pdf["py"].to_numpy(np.int64), pdf["px"].to_numpy(np.int64)] = n
        img = ((grid * 255) // max(int(n.max()), 1)).astype(np.uint8)
        return pd.DataFrame(
            {
                "tx": [tx],
                "ty": [ty],
                "n_points": [int(n.sum())],
                "nonzero_px": [int(len(pdf))],
                "png": [PNG.encode_png(img)],
            }
        )

    return pixels.groupBy("tx", "ty").applyInPandas(fn, schema)


def decode_tile_stats(tiles: DataFrame) -> DataFrame:
    """Decode rendered PNG tiles back to verifiable pixel facts:
    (tx, ty, n_points, nonzero_px, lit_px, top_px, top_py, top_val).
    ``lit_px`` counts image pixels that survived scaling (val > 0 —
    a dense tile can scale sparse pixels to 0); ``top_*`` is the
    brightest pixel, row-major first on ties (min py, then px). All
    independently recomputable by the SQL oracle from the raw pixel
    counts. Arrow-batched; exists so the ENTIRE encode path sits inside
    the value-hash gate, not just the stats beside it."""
    schema = (
        "tx long, ty long, n_points long, nonzero_px long, lit_px long, "
        "top_px long, top_py long, top_val long"
    )

    def fn(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = PNG.decode_png(bytes(r.png))
                flat = int(np.argmax(img))  # row-major first max
                py, px = divmod(flat, img.shape[1])
                rows.append(
                    (
                        int(r.tx), int(r.ty), int(r.n_points),
                        int(r.nonzero_px),
                        int(np.count_nonzero(img)),
                        int(px), int(py), int(img[py, px]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "tx", "ty", "n_points", "nonzero_px", "lit_px",
                    "top_px", "top_py", "top_val",
                ],
            )

    return tiles.mapInPandas(fn, schema)
