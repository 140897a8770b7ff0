"""Deterministic synthetic fixtures (seed=42 everywhere; no external data).

Two tables drive every test and benchmark:

* ``features`` — GADM-shaped polygon table mirroring the reference's data
  (``/root/reference/data/gadm41_USA_1.dbf``: 51 records, NAME_1 = US state
  names — README.md:85-109 golden cases key off "Texas"/"New York").
  Geometry is synthesized (the reference repo's .shp payloads are stripped):
  a jittered-rectangle per state on a CONUS grid, some with holes, some
  multi-ring, plus degenerate rows exercising reader skip paths.
* ``images`` — the driver-mandated image+caption table (BASELINE.json
  ``input_hint``): (image_id, bytes, w, h, fmt, caption, phash) plus a
  deterministic (lng, lat) per image. Point distribution = uniform CONUS
  mixed with a Zipfian hot cluster inside one "urban" cell so join skew is
  real and salting measurable.

Codecs are pure numpy/zlib (no Pillow in the sandbox): ``raw`` is lossless
zlib, ``qz`` quantizes to 6 bits/channel (PSNR ≈ 47 dB > 40 dB requirement),
``png`` is a real ISO 15948 PNG (functions/png.py, lossless) and ``jpeg`` a
real ISO 10918-1 baseline JPEG at quality 98 (functions/jpeg.py, lossy but
>= 40 dB even on noise fixtures). ``phash`` is a 64-bit average-hash of the
*decoded* pixels, so recompute equality holds through every stage for all
four codecs.
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pandas as pd

SEED = 42
FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".fixtures")

# 50 states + DC — mirrors the reference's state map (geocoder.cpp:26-44)
STATE_ABBREV = {
    "AL": "Alabama", "AK": "Alaska", "AZ": "Arizona", "AR": "Arkansas",
    "CA": "California", "CO": "Colorado", "CT": "Connecticut", "DE": "Delaware",
    "FL": "Florida", "GA": "Georgia", "HI": "Hawaii", "ID": "Idaho",
    "IL": "Illinois", "IN": "Indiana", "IA": "Iowa", "KS": "Kansas",
    "KY": "Kentucky", "LA": "Louisiana", "ME": "Maine", "MD": "Maryland",
    "MA": "Massachusetts", "MI": "Michigan", "MN": "Minnesota", "MS": "Mississippi",
    "MO": "Missouri", "MT": "Montana", "NE": "Nebraska", "NV": "Nevada",
    "NH": "New Hampshire", "NJ": "New Jersey", "NM": "New Mexico", "NY": "New York",
    "NC": "North Carolina", "ND": "North Dakota", "OH": "Ohio", "OK": "Oklahoma",
    "OR": "Oregon", "PA": "Pennsylvania", "RI": "Rhode Island", "SC": "South Carolina",
    "SD": "South Dakota", "TN": "Tennessee", "TX": "Texas", "UT": "Utah",
    "VT": "Vermont", "VA": "Virginia", "WA": "Washington", "WV": "West Virginia",
    "WI": "Wisconsin", "WY": "Wyoming", "DC": "District of Columbia",
}
STATE_NAMES = sorted(STATE_ABBREV.values())

# CONUS-ish canvas the synthetic states tile (no antimeridian crossing)
CANVAS = (-125.0, 24.0, -66.0, 50.0)
GRID_COLS, GRID_ROWS = 9, 6
URBAN_CENTER = (-74.006, 40.7128)  # hot cluster ("New York"-ish)


def _jitter_rect(rng: np.random.Generator, x0, y0, x1, y1, n_per_edge=6):
    """Closed ring tracing a rectangle with jittered edge vertices (CCW)."""
    jx = (x1 - x0) * 0.04
    jy = (y1 - y0) * 0.04
    xs, ys = [], []

    def edge(ax, ay, bx, by):
        t = np.linspace(0.0, 1.0, n_per_edge, endpoint=False)
        ex = ax + (bx - ax) * t
        ey = ay + (by - ay) * t
        # jitter interior vertices only (keep corners exact)
        ex[1:] += rng.uniform(-jx, jx, n_per_edge - 1) * (1.0 if ax == bx else 0.0)
        ey[1:] += rng.uniform(-jy, jy, n_per_edge - 1) * (1.0 if ay == by else 0.0)
        xs.extend(ex.tolist())
        ys.extend(ey.tolist())

    edge(x0, y0, x1, y0)
    edge(x1, y0, x1, y1)
    edge(x1, y1, x0, y1)
    edge(x0, y1, x0, y0)
    xs.append(x0)  # close the ring, as shapefile rings repeat the first point
    ys.append(y0)
    return np.asarray(xs), np.asarray(ys)


def make_features(n_extra_parts: int = 0) -> pd.DataFrame:
    """The 51-row state-level feature table.

    Columns follow FIXTURES.md §1: record_number, shape_type, rings as
    flattened arrays (xs, ys, ring_sizes), bbox, GADM attribute columns.
    Rows 1..51 are polygons; a trailing Null-shape row and a deleted-DBF
    row exercise the skip paths (shapefile_reader.cpp:155-177, 320-323).
    """
    rng = np.random.default_rng(SEED)
    cx0, cy0, cx1, cy1 = CANVAS
    cw = (cx1 - cx0) / GRID_COLS
    ch = (cy1 - cy0) / GRID_ROWS
    rows = []
    for i, name in enumerate(STATE_NAMES):
        col, rw = i % GRID_COLS, i // GRID_COLS
        x0 = cx0 + col * cw + cw * 0.06
        y0 = cy0 + rw * ch + ch * 0.06
        x1 = x0 + cw * 0.88
        y1 = y0 + ch * 0.88
        sx, sy = _jitter_rect(rng, x0, y0, x1, y1)
        ring_xs, ring_ys = [sx], [sy]
        # every 5th state gets a hole in its center
        if i % 5 == 0:
            hx0 = x0 + (x1 - x0) * 0.4
            hy0 = y0 + (y1 - y0) * 0.4
            hx1 = x0 + (x1 - x0) * 0.6
            hy1 = y0 + (y1 - y0) * 0.6
            hxs, hys = _jitter_rect(rng, hx0, hy0, hx1, hy1, n_per_edge=3)
            ring_xs.append(hxs)
            ring_ys.append(hys)
        flat_x = np.concatenate(ring_xs)
        flat_y = np.concatenate(ring_ys)
        sizes = [len(r) for r in ring_xs]
        abbrev = [a for a, n in STATE_ABBREV.items() if n == name][0]
        rows.append(
            dict(
                record_number=i + 1,
                shape_type=5,
                xs=flat_x.tolist(),
                ys=flat_y.tolist(),
                ring_sizes=sizes,
                minx=float(flat_x.min()),
                miny=float(flat_y.min()),
                maxx=float(flat_x.max()),
                maxy=float(flat_y.max()),
                deleted=False,
                GID_1=f"USA.{i + 1}_1",
                GID_0="USA",
                COUNTRY="United States",
                NAME_1=name,
                VARNAME_1="",
                NL_NAME_1="",
                TYPE_1="State",
                ENGTYPE_1="State",
                CC_1="",
                HASC_1=f"US.{abbrev}",
                ISO_1=f"US-{abbrev}",
                num_attr=float(i) * 1.5,
                flag_attr=bool(i % 2),
            )
        )
    # degenerate rows: null shape; deleted record (attrs emptied, geom kept)
    rows.append(
        dict(
            record_number=52, shape_type=0, xs=[], ys=[], ring_sizes=[],
            minx=0.0, miny=0.0, maxx=0.0, maxy=0.0, deleted=False,
            GID_1="", GID_0="", COUNTRY="", NAME_1="", VARNAME_1="",
            NL_NAME_1="", TYPE_1="", ENGTYPE_1="", CC_1="", HASC_1="",
            ISO_1="", num_attr=0.0, flag_attr=False,
        )
    )
    dx, dy = _jitter_rect(rng, -80.0, 20.0, -78.0, 22.0, n_per_edge=3)
    rows.append(
        dict(
            record_number=53, shape_type=5, xs=dx.tolist(), ys=dy.tolist(),
            ring_sizes=[len(dx)], minx=float(dx.min()), miny=float(dy.min()),
            maxx=float(dx.max()), maxy=float(dy.max()), deleted=True,
            GID_1="", GID_0="", COUNTRY="", NAME_1="", VARNAME_1="",
            NL_NAME_1="", TYPE_1="", ENGTYPE_1="", CC_1="", HASC_1="",
            ISO_1="", num_attr=0.0, flag_attr=False,
        )
    )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# image codecs (numpy/zlib only)
# ---------------------------------------------------------------------------

def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    """pixels: (h, w, 3) uint8 -> bytes.

    'raw' lossless zlib, 'qz' 6-bit lossy zlib, 'png' a REAL standard PNG
    (ISO/IEC 15948 RGB color-type 2 via ``functions/png.py`` — bytes any
    browser renders, lossless), 'jpeg' a REAL baseline JPEG (ISO/IEC
    10918-1 4:4:4 JFIF via ``functions/jpeg.py``, quality 98 — the lossy
    leg of the input_hint PSNR>=40dB invariant, which holds even on the
    uniform-noise fixture content; measured 43.6 dB worst case).
    """
    h, w, _ = pixels.shape
    if fmt == "raw":
        payload = pixels.tobytes()
    elif fmt == "qz":
        q = (pixels >> 2).astype(np.uint8)  # 6 bits/channel
        payload = q.tobytes()
    elif fmt == "png":
        from ..functions.png import encode_png

        return encode_png(pixels, level=1)
    elif fmt == "jpeg":
        from ..functions.jpeg import encode_jpeg

        return encode_jpeg(pixels, quality=98)
    else:
        raise NotImplementedError(f"codec {fmt!r} not available in this sandbox")
    return zlib.compress(payload, 1)


def decode_image(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    if fmt == "png":
        from ..functions.png import decode_png

        arr = decode_png(data)
        if arr.shape != (h, w, 3):
            raise ValueError(f"PNG shape {arr.shape} != metadata ({h}, {w}, 3)")
        return arr
    if fmt == "jpeg":
        from ..functions.jpeg import decode_jpeg

        arr = decode_jpeg(data)
        if arr.shape != (h, w, 3):
            raise ValueError(f"JPEG shape {arr.shape} != metadata ({h}, {w}, 3)")
        return arr
    raw = zlib.decompress(data)
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
    if fmt == "raw":
        return arr.copy()
    if fmt == "qz":
        # dequantize to bucket center: q*4 + 2 caps error at +/-2 -> PSNR ~47dB
        return (arr.astype(np.uint16) * 4 + 2).clip(0, 255).astype(np.uint8)
    raise NotImplementedError(f"codec {fmt!r} not available in this sandbox")


def phash64(pixels: np.ndarray) -> int:
    """64-bit average hash over an 8x8 luma downsample (deterministic)."""
    return int(phash64_batch(pixels[None, ...])[0])


def phash64_batch(pix: np.ndarray) -> np.ndarray:
    """Vectorized phash for a (n, h, w, 3) uint8 stack -> int64[n].

    Bit order matches the scalar definition: bit i of the 8x8 mean-mask
    (row-major) is bit (63 - i) of the value; int64 is the two's-complement
    view of the packed uint64.
    """
    n, h, w, _ = pix.shape
    luma = pix.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    bh, bw = max(h // 8, 1), max(w // 8, 1)
    small = luma[:, : bh * 8, : bw * 8].reshape(n, 8, bh, 8, bw).mean(axis=(2, 4))
    bits = small > small.mean(axis=(1, 2), keepdims=True)
    packed = np.packbits(bits.reshape(n, 64), axis=1)  # (n, 8), MSB-first
    v = np.zeros(n, dtype=np.uint64)
    for i in range(8):
        v = (v << np.uint64(8)) | packed[:, i].astype(np.uint64)
    return v.view(np.int64)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def make_images(n: int, w: int = 16, h: int = 16, hot_frac: float = 0.2) -> pd.DataFrame:
    """The input_hint table + deterministic (lng, lat) per image.

    ``hot_frac`` of the points land in a tight Gaussian around URBAN_CENTER
    (one hot cell at the join resolution) — the planted skew from
    FIXTURES.md §2.
    """
    rng = np.random.default_rng(SEED)
    cx0, cy0, cx1, cy1 = CANVAS
    n_hot = int(n * hot_frac)
    lng = np.empty(n)
    lat = np.empty(n)
    lng[: n - n_hot] = rng.uniform(cx0 - 5, cx1 + 5, n - n_hot)
    lat[: n - n_hot] = rng.uniform(cy0 - 3, cy1 + 3, n - n_hot)
    lng[n - n_hot:] = URBAN_CENTER[0] + rng.normal(0, 0.05, n_hot)
    lat[n - n_hot:] = URBAN_CENTER[1] + rng.normal(0, 0.05, n_hot)

    # One draw, banded into four codecs (same rng stream as the historical
    # raw/qz split, so coords and pixel content are unchanged): the mix puts
    # the REAL codecs (png per ISO 15948, jpeg per ISO 10918-1) on every
    # driver-oracle decode path that reads this table, not just their own
    # unit tests. jpeg rows store phash of the lossy DECODE (the invariant
    # is stored-phash == rehash-of-decode, not == hash-of-source).
    r = rng.random(n)
    fmts = np.select(
        [r < 0.35, r < 0.70, r < 0.85], ["raw", "qz", "png"], default="jpeg"
    )
    recs = []
    for i in range(n):
        pix = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        fmt = str(fmts[i])
        data = encode_image(pix, fmt)
        dec = decode_image(data, w, h, fmt)
        recs.append(
            dict(
                image_id=f"img_{i:09d}",
                bytes=data,
                w=np.int32(w),
                h=np.int32(h),
                fmt=fmt,
                caption=f"caption of img_{i:09d}: a synthetic scene #{i % 97}",
                phash=phash64(dec),
                lng=float(lng[i]),
                lat=float(lat[i]),
            )
        )
    return pd.DataFrame(recs)


def images_parquet_path(n: int, w: int = 16, h: int = 16) -> str:
    """Generate-once cache of the images table as parquet."""
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    # v2: fmt mix gained png/jpeg rows — bust generate-once caches from the
    # raw/qz-only era (same n/w/h would otherwise serve stale bytes).
    path = os.path.join(FIXTURE_DIR, f"images_v2_n{n}_w{w}_h{h}.parquet")
    if not os.path.exists(path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pdf = make_images(n, w, h)
        tbl = pa.Table.from_pandas(pdf, preserve_index=False)
        pq.write_table(
            tbl, path + ".tmp", compression="snappy",
            # many small row groups: Spark parallelizes a single-file
            # scan by byte-range splits that snap to row-group
            # boundaries — one big row group serializes every decode
            # downstream onto ONE core (measured: the whole 20k-row
            # table in one split). At production scale files are
            # plentiful; this keeps the same property at test scale.
            row_group_size=max(len(pdf) // 32, 64),
        )
        os.rename(path + ".tmp", path)  # atomic publish
    return path


# Per-row (w, h) choices for the varied-dims images table: aspect ratios
# span 0.25-4.0 (the SDXL bucket-ladder range) at small pixel counts so
# the fixture stays cheap while the RATIO distribution is realistic.
VARIED_DIMS = [
    (32, 32), (40, 30), (30, 40), (48, 32), (32, 48), (56, 28), (28, 56),
    (64, 24), (24, 64), (60, 17), (17, 60), (64, 16), (16, 64), (36, 30),
    (34, 32), (44, 26), (26, 44), (128, 16),
]


def make_varied_images(n: int) -> pd.DataFrame:
    """The input_hint images table with VARIED per-row dimensions.

    Same schema and invariants as ``make_images`` (bytes decode to exactly
    (h, w, 3); stored phash == phash of the decode) but (w, h) is drawn
    per row from ``VARIED_DIMS`` — the fixture for aspect-ratio bucketing,
    where a constant-dims table would be degenerate (every image in one
    bucket)."""
    rng = np.random.default_rng(SEED + 7)
    fmts = np.array(["raw", "qz", "png"])
    recs = []
    for i in range(n):
        w, h = VARIED_DIMS[int(rng.integers(0, len(VARIED_DIMS)))]
        pix = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        fmt = str(fmts[int(rng.integers(0, 3))])
        data = encode_image(pix, fmt)
        dec = decode_image(data, w, h, fmt)
        recs.append(
            dict(
                image_id=f"vimg_{i:09d}",
                bytes=data,
                w=np.int32(w),
                h=np.int32(h),
                fmt=fmt,
                caption=f"caption of vimg_{i:09d}: a synthetic scene #{i % 97}",
                phash=phash64(dec),
            )
        )
    return pd.DataFrame(recs)


def varied_images_parquet_path(n: int) -> str:
    """Generate-once cache of the varied-dims images table as parquet."""
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    path = os.path.join(FIXTURE_DIR, f"images_varied_n{n}.parquet")
    if not os.path.exists(path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pdf = make_varied_images(n)
        tbl = pa.Table.from_pandas(pdf, preserve_index=False)
        pq.write_table(
            tbl, path + ".tmp", compression="snappy",
            # many small row groups: Spark parallelizes a single-file
            # scan by byte-range splits that snap to row-group
            # boundaries — one big row group serializes every decode
            # downstream onto ONE core (measured: the whole 20k-row
            # table in one split). At production scale files are
            # plentiful; this keeps the same property at test scale.
            row_group_size=max(len(pdf) // 32, 64),
        )
        os.rename(path + ".tmp", path)  # atomic publish
    return path


def make_near_dup_images(
    n: int, n_dup: int, w: int = 16, h: int = 16
) -> pd.DataFrame:
    """The images table plus ``n_dup`` PERTURBED copies of its first rows
    — planted image near-duplicates for perceptual-hash dedup.

    Each copy inverts one phash-block-aligned 2x2 pixel patch (patch
    position varies with the row), re-encodes with the row's own codec,
    and stores the TRUE phash recomputed from the perturbed decode — the
    same stored-phash invariant as the base fixture, so the engine's
    decode->rehash path is value-checkable against the stored column.
    Copies land at small nonzero hamming from their source (one block
    mean flips hard, the global-mean ripple may flip a few marginal
    bits); unrelated fixture images sit at hamming >= 14.
    """
    base = make_images(n, w, h)
    rows = []
    bh, bw = max(h // 8, 1), max(w // 8, 1)
    for i in range(n_dup):
        src = base.iloc[i]
        pix = decode_image(src["bytes"], w, h, src["fmt"]).copy()
        by, bx = (i * 3) % 8, (i * 5) % 8
        pix[by * bh : (by + 1) * bh, bx * bw : (bx + 1) * bw] = (
            255 - pix[by * bh : (by + 1) * bh, bx * bw : (bx + 1) * bw]
        )
        data = encode_image(pix, src["fmt"])
        dec = decode_image(data, w, h, src["fmt"])
        rows.append(
            dict(
                image_id=f"img_dup{i:06d}",
                bytes=data,
                w=np.int32(w),
                h=np.int32(h),
                fmt=src["fmt"],
                caption=src["caption"],
                phash=phash64(dec),
                lng=src["lng"],
                lat=src["lat"],
            )
        )
    return pd.concat([base, pd.DataFrame(rows)], ignore_index=True)


def near_dup_images_parquet_path(
    n: int, n_dup: int, w: int = 16, h: int = 16
) -> str:
    """Generate-once cache of the images ∪ perturbed-copies table."""
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    path = os.path.join(
        FIXTURE_DIR, f"images_neardup_v2_n{n}_d{n_dup}_w{w}_h{h}.parquet"
    )
    if not os.path.exists(path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pdf = make_near_dup_images(n, n_dup, w, h)
        tbl = pa.Table.from_pandas(pdf, preserve_index=False)
        pq.write_table(
            tbl, path + ".tmp", compression="snappy",
            # many small row groups: Spark parallelizes a single-file
            # scan by byte-range splits that snap to row-group
            # boundaries — one big row group serializes every decode
            # downstream onto ONE core (measured: the whole 20k-row
            # table in one split). At production scale files are
            # plentiful; this keeps the same property at test scale.
            row_group_size=max(len(pdf) // 32, 64),
        )
        os.rename(path + ".tmp", path)  # atomic publish
    return path


def make_grid_features() -> pd.DataFrame:
    """Exact-rectangle variant of the 51-state table (no jitter, no holes).

    For axis-aligned rectangles the reference ray-cast (geometry.cpp:87-103)
    reduces to the half-open box test ``x0 <= px < x1 AND y0 <= py < y1``
    (left/bottom edges in, right/top out), which is plain ANSI SQL — so
    these features anchor the driver's DuckDB-oracle checks while the
    engine still runs its general cell-join + ray-cast path.

    Grid pitch uses non-terminating decimals (59/9, 26/6) so synthesized
    test points (1e-6 rationals) never land exactly on an edge.
    """
    cx0, cy0, cx1, cy1 = CANVAS
    cw = (cx1 - cx0) / GRID_COLS
    ch = (cy1 - cy0) / GRID_ROWS
    rows = []
    for i, name in enumerate(STATE_NAMES):
        col, rw = i % GRID_COLS, i // GRID_COLS
        x0 = cx0 + col * cw
        y0 = cy0 + rw * ch
        x1 = x0 + cw
        y1 = y0 + ch
        xs = [x0, x1, x1, x0, x0]
        ys = [y0, y0, y1, y1, y0]
        rows.append(
            dict(
                record_number=i + 1,
                shape_type=5,
                xs=xs,
                ys=ys,
                ring_sizes=[5],
                minx=x0, miny=y0, maxx=x1, maxy=y1,
                deleted=False,
                NAME_1=name,
            )
        )
    return pd.DataFrame(rows)


def make_road_features(n_roads: int = 40, n_pts: int = 12) -> pd.DataFrame:
    """Deterministic polyline "road network" for point-to-line operators.

    The reference decodes polylines (shapefile_reader.cpp PolyLine branch,
    shape_type 3) but never queries them; the engine adds nearest-segment
    joins, so it needs a line table the DuckDB oracle can reproduce as a
    VALUES literal. Coordinates are exact 1e-6-degree rationals built from
    the same Knuth-style integer hashes as the synthetic points (see
    entry_queries.POINT_LNG_SQL), so ``repr()`` round-trips bit-identically
    into SQL. Roads drift west→east across the CONUS canvas with hashed
    latitude wander (clamped to the canvas); every 4th road is two-part
    (a gap mid-line) to exercise part handling in segment explode.
    """
    cx0, cy0, cx1, cy1 = CANVAS
    y_lo, y_hi = int(cy0 * 1e6), int(cy1 * 1e6)
    rows = []
    for i in range(1, n_roads + 1):
        # Knuth-style multipliers must be LARGE relative to the index
        # range (i <= n_roads, j <= n_pts) or the modulo never wraps and
        # the "hash" degenerates to a linear ramp (all roads hugging one
        # canvas edge) — the point formulas get this for free from the
        # big custkey domain.
        sx = int(cx0 * 1e6) + (i * 2654435761) % 18_000_000
        sy = y_lo + (i * 2246822519) % 26_000_000
        xs_u, ys_u = [sx], [sy]
        for j in range(1, n_pts):
            dx = 2_000_000 + ((i * 2654435761 + j * 40503196) % 4_000_000)
            dy = ((i * 3266489917 + j * 668265263) % 9_000_000) - 4_500_000
            x = xs_u[-1] + dx
            y = min(max(ys_u[-1] + dy, y_lo), y_hi)
            xs_u.append(x)
            ys_u.append(y)
        xs = [u / 1e6 for u in xs_u]
        ys = [u / 1e6 for u in ys_u]
        part_sizes = [n_pts]
        if i % 4 == 0:  # two parts: vertices [0, h) and [h, n)
            h = n_pts // 2
            part_sizes = [h, n_pts - h]
        rows.append(
            dict(
                road_id=i,
                shape_type=3,
                xs=xs,
                ys=ys,
                part_sizes=part_sizes,
                minx=min(xs), miny=min(ys), maxx=max(xs), maxy=max(ys),
            )
        )
    return pd.DataFrame(rows)


def features_parquet_path() -> str:
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    path = os.path.join(FIXTURE_DIR, "features_states.parquet")
    if not os.path.exists(path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pdf = make_features()
        tbl = pa.Table.from_pandas(pdf, preserve_index=False)
        pq.write_table(
            tbl, path + ".tmp", compression="snappy",
            # many small row groups: Spark parallelizes a single-file
            # scan by byte-range splits that snap to row-group
            # boundaries — one big row group serializes every decode
            # downstream onto ONE core (measured: the whole 20k-row
            # table in one split). At production scale files are
            # plentiful; this keeps the same property at test scale.
            row_group_size=max(len(pdf) // 32, 64),
        )
        os.rename(path + ".tmp", path)
    return path
