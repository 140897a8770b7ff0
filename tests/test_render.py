"""PNG codec round-trips + map-tile render pipeline (pixel math in
codegen, PNG encode/decode at Arrow boundaries) against numpy oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gis_shapefile_spark.functions import png as PNG
from gis_shapefile_spark.functions import webmercator as WM
from gis_shapefile_spark.operators import render as RD


def test_png_gray_roundtrip():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (13, 21), dtype=np.uint8)
    data = PNG.encode_png(img)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    out = PNG.decode_png(data)
    assert out.shape == (13, 21) and (out == img).all()
    # deterministic bytes (cache-stable tiles)
    assert PNG.encode_png(img) == data


def test_png_rgba_roundtrip():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (8, 5, 4), dtype=np.uint8)
    out = PNG.decode_png(PNG.encode_png(img))
    assert out.shape == (8, 5, 4) and (out == img).all()


def test_png_decoder_handles_standard_filters():
    """The decoder must read filters 1/2/3/4 too (re-encoded tiles)."""
    import struct
    import zlib

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (6, 7), dtype=np.uint8)
    for filt in (1, 2, 3, 4):
        # build scanlines with the chosen filter applied
        lines = []
        prev = np.zeros(7, dtype=np.int32)
        for r in range(6):
            cur = img[r].astype(np.int32)
            if filt == 1:
                pred = np.concatenate([[0], cur[:-1]])
            elif filt == 2:
                pred = prev
            elif filt == 3:
                left = np.concatenate([[0], cur[:-1]])
                pred = (left + prev) // 2
            else:
                left = np.concatenate([[0], cur[:-1]])
                ul = np.concatenate([[0], prev[:-1]])
                p = left + prev - ul
                pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
                )
            lines.append(bytes([filt]) + ((cur - pred) & 0xFF).astype(np.uint8).tobytes())
            prev = cur
        ihdr = struct.pack(">IIBBBBB", 7, 6, 8, 0, 0, 0, 0)
        data = (
            b"\x89PNG\r\n\x1a\n"
            + PNG._chunk(b"IHDR", ihdr)
            + PNG._chunk(b"IDAT", zlib.compress(b"".join(lines)))
            + PNG._chunk(b"IEND", b"")
        )
        assert (PNG.decode_png(data) == img).all(), f"filter {filt}"


def test_png_rgb_roundtrip_and_standard_filters():
    """RGB (color type 2, bpp=3 — the image-table codec path): encoder
    round-trip plus decode of filters 1-4, whose left-neighbor is the
    byte 3 positions back (a bpp bug would pass every grayscale test)."""
    import struct
    import zlib

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (5, 6, 3), dtype=np.uint8)
    out = PNG.decode_png(PNG.encode_png(img))
    assert out.shape == (5, 6, 3) and (out == img).all()

    flat = img.reshape(5, 18).astype(np.int32)  # byte rows, stride 18
    for filt in (1, 2, 3, 4):
        lines = []
        prev = np.zeros(18, dtype=np.int32)
        for r in range(5):
            cur = flat[r]
            left = np.concatenate([[0, 0, 0], cur[:-3]])  # i - bpp
            ul = np.concatenate([[0, 0, 0], prev[:-3]])
            if filt == 1:
                pred = left
            elif filt == 2:
                pred = prev
            elif filt == 3:
                pred = (left + prev) // 2
            else:
                p = left + prev - ul
                pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
                )
            lines.append(
                bytes([filt]) + ((cur - pred) & 0xFF).astype(np.uint8).tobytes()
            )
            prev = cur
        ihdr = struct.pack(">IIBBBBB", 6, 5, 8, 2, 0, 0, 0)
        data = (
            b"\x89PNG\r\n\x1a\n"
            + PNG._chunk(b"IHDR", ihdr)
            + PNG._chunk(b"IDAT", zlib.compress(b"".join(lines)))
            + PNG._chunk(b"IEND", b"")
        )
        assert (PNG.decode_png(data) == img).all(), f"RGB filter {filt}"


def test_png_rejects_corruption():
    img = np.zeros((4, 4), dtype=np.uint8)
    data = bytearray(PNG.encode_png(img))
    data[40] ^= 0xFF
    with pytest.raises(ValueError):
        PNG.decode_png(bytes(data))
    with pytest.raises(ValueError):
        PNG.decode_png(b"nota png at all")
    with pytest.raises(ValueError):
        PNG.encode_png(np.zeros((4, 4), dtype=np.int32))


def _pts(seed=9, n=3000):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "lng": rng.uniform(-120.0, -70.0, n),
            "lat": rng.uniform(25.0, 48.0, n),
        }
    )


def test_density_pixels_matches_numpy(spark):
    pdf = _pts()
    z, k = 5, 3  # 8x8 px tiles
    out = (
        RD.density_pixels(spark.createDataFrame(pdf), z, k)
        .toPandas()
        .sort_values(["tx", "ty", "px", "py"])
        .reset_index(drop=True)
    )
    fx, fy = WM.tile_xy_np(pdf["lng"].to_numpy(), pdf["lat"].to_numpy(), z + k)
    exp = (
        pd.DataFrame(
            {"tx": fx >> k, "ty": fy >> k, "px": fx & 7, "py": fy & 7}
        )
        .groupby(["tx", "ty", "px", "py"])
        .size()
        .rename("n")
        .reset_index()
        .sort_values(["tx", "ty", "px", "py"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
    # conservation: every point lands in exactly one pixel
    assert out["n"].sum() == len(pdf)


def test_render_and_decode_roundtrip(spark):
    pdf = _pts(seed=11, n=2000)
    z, k, px = 4, 4, 16
    pix = RD.density_pixels(spark.createDataFrame(pdf), z, k)
    tiles = RD.render_png_tiles(pix, px).cache()
    rows = tiles.collect()
    assert sum(r.n_points for r in rows) == len(pdf)
    # every png is a valid, correctly-sized grayscale image with the
    # brightest pixel exactly 255
    for r in rows:
        img = PNG.decode_png(bytes(r.png))
        assert img.shape == (px, px)
        assert img.max() == 255
        assert np.count_nonzero(img) <= r.nonzero_px
    # decoded stats equal a numpy recomputation from the pixel counts
    stats = {
        (r.tx, r.ty): r
        for r in RD.decode_tile_stats(tiles).collect()
    }
    pixpdf = pix.toPandas()
    for (tx, ty), g in pixpdf.groupby(["tx", "ty"]):
        grid = np.zeros((px, px), dtype=np.int64)
        grid[g["py"], g["px"]] = g["n"]
        img = (grid * 255) // max(int(g["n"].max()), 1)
        s = stats[(tx, ty)]
        assert s.n_points == int(g["n"].sum())
        assert s.lit_px == int(np.count_nonzero(img))
        flat = int(np.argmax(img))
        assert (s.top_py, s.top_px) == divmod(flat, px)
        assert s.top_val == 255
    tiles.unpersist()


def test_render_orientation_north_up(spark):
    """A single northern point must light a LOW py row (row 0 = north)."""
    pdf = pd.DataFrame({"lng": [0.1, 0.1], "lat": [80.0, -80.0]})
    pix = RD.density_pixels(spark.createDataFrame(pdf), 0, 4).toPandas()
    north = pix.loc[pix["py"].idxmin()]
    south = pix.loc[pix["py"].idxmax()]
    assert north["py"] < south["py"]
    fx, fy = WM.tile_xy_np([0.1], [80.0], 4)
    assert north["py"] == fy[0]
