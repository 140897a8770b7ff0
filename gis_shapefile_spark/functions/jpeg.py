"""Baseline JPEG (ISO/IEC 10918-1) codec in pure numpy + stdlib.

This closes the lossy leg of the image-table codec seam (BASELINE.json
input_hint: "decoded-pixel allclose (PSNR>=40dB for lossy formats)"):
``fmt="jpeg"`` rows carry bytes any browser / libjpeg / javax.imageio
renders, produced and consumed without Pillow or any native codec.

Scope — the baseline sequential DCT process:

- ``decode_jpeg``: SOF0/SOF1 frames, 1-4 components with sampling
  factors 1-2 (4:4:4, 4:2:2, 4:2:0), Huffman tables and quantization
  tables read from the stream (8- and 16-bit DQT precision), restart
  intervals (DRI/RSTn), byte stuffing, APPn/COM skip.  Progressive
  (SOF2) and arithmetic coding raise ``NotImplementedError`` loudly —
  same honest-seam policy as the other codecs.
- ``encode_jpeg``: baseline 4:4:4 JFIF with Annex K quantization
  tables under the IJG quality scaling and Annex K Huffman tables.

The hot math (color transform, 8x8 DCT/IDCT, quantization, zigzag) is
vectorized over ALL blocks of an image at once; only the entropy
coding walks symbols sequentially, inside the same Arrow-batched
``mapInPandas`` seam as the PNG/zlib codecs (decode parallelism comes
from source splits — see ``operators/multimodal.py``).

External validation (tests/test_jpeg.py): both directions are checked
against the JVM's independent ``javax.imageio`` decoder through
``spark.read.format("image")`` on Spark's own bundled mllib JPEG test
images — our decoder's pixels match ImageIO's on real camera JPEGs,
and ImageIO decodes our encoder's bytes back to PSNR>=40dB vs the
source pixels.  This is the same two-independent-implementations
anchoring used for the real-world DBF/SHX bytes.
"""

from __future__ import annotations

import numpy as np

__all__ = ["encode_jpeg", "decode_jpeg"]

# ---------------------------------------------------------------- constants

# Zigzag scan order (ISO 10918-1 Figure 5): ZIGZAG[i] = raster index of the
# i-th coefficient in zigzag order.
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
_UNZIG = np.argsort(ZIGZAG)  # raster -> zigzag position

# Annex K.1 quantization tables (raster order).
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL).
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# Orthonormal 8x8 DCT-II matrix: block_dct = C @ B @ C.T (float64 exact
# enough; conformance bound is the ISO 10918-2 IDCT accuracy spec).
def _dct_matrix() -> np.ndarray:
    x = np.arange(8, dtype=np.float64)
    u = x[:, None]
    c = np.cos((2.0 * x[None, :] + 1.0) * u * np.pi / 16.0) * 0.5
    c[0, :] *= 1.0 / np.sqrt(2.0)
    return c


_C = _dct_matrix()


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) for a (BITS, HUFFVAL) table (Annex C)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _lookahead_table(bits: list[int], vals: list[int]) -> tuple[list[int], list[int]]:
    """(BITS, HUFFVAL) -> 16-bit-lookahead (symbol, code_length) tables.

    Every canonical code of length L owns the 2^(16-L) table slots whose
    16-bit prefix starts with it, so one peek + one list index decodes a
    symbol (the classic libjpeg fast path; JPEG codes are <= 16 bits so
    the table is total). Slots no code owns keep length 0 = invalid.
    Returned as plain Python lists: per-symbol list indexing is ~3x a
    numpy scalar index in the sequential entropy loop.

    Memoized on the raw (BITS ‖ HUFFVAL) bytes: building the 65k-slot
    tables costs ~1 ms, which would dominate SMALL images (measured: it
    made 16x16 decodes 3x slower than the bit-by-bit path it replaced).
    Real corpora reuse a handful of tables (our encoder always emits
    Annex K; cameras ship libjpeg defaults), so this is a standing cache
    of a few entries, 0.5 MB each.
    """
    key = bytes(bits) + bytes(vals)
    hit = _LOOKAHEAD_CACHE.get(key)
    if hit is not None:
        return hit
    sym = np.zeros(1 << 16, dtype=np.int32)
    ln = np.zeros(1 << 16, dtype=np.int32)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = lo + (1 << (16 - length))
            sym[lo:hi] = vals[k]
            ln[lo:hi] = length
            code += 1
            k += 1
        code <<= 1
    out = (sym.tolist(), ln.tolist())
    if len(_LOOKAHEAD_CACHE) >= 32:  # foreign-table flood guard
        _LOOKAHEAD_CACHE.clear()
    _LOOKAHEAD_CACHE[key] = out
    return out


_LOOKAHEAD_CACHE: dict[bytes, tuple[list[int], list[int]]] = {}


# ---------------------------------------------------------------- color

def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 -> (h, w, 3) float64 YCbCr (JFIF / BT.601)."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) with H, W multiples of 8 -> (n, 8, 8), raster MCU-free order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _from_blocks(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    return (
        blocks.reshape(h // 8, w // 8, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(h, w)
    )


# ---------------------------------------------------------------- encoder

def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    quality = int(min(100, max(1, quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (QT_LUMA, QT_CHROMA):
        q = (base * scale + 50) // 100
        out.append(np.clip(q, 1, 255).astype(np.int64))
    return out[0], out[1]


class _BitWriter:
    """Accumulate (value, nbits) pairs; pack with FF00 byte stuffing."""

    __slots__ = ("_acc", "_n", "_out")

    def __init__(self) -> None:
        self._acc = 0
        self._n = 0
        self._out = bytearray()

    def put(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._n += nbits
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self._out.append(byte)
            if byte == 0xFF:
                self._out.append(0x00)
        self._acc &= (1 << self._n) - 1

    def finish(self) -> bytes:
        if self._n:
            # pad with 1-bits (F.1.2.3)
            pad = 8 - self._n
            self.put((1 << pad) - 1, pad)
        return bytes(self._out)


def _csize(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _dht_segment(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    payload = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + (len(payload) + 2).to_bytes(2, "big") + payload


def encode_jpeg(arr: np.ndarray, quality: int = 90) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline 4:4:4 JFIF bytes.

    Deterministic: fixed Annex K tables under IJG quality scaling, no
    optimization passes. 4:4:4 keeps the codec exactly invertible up to
    quantization error, which is what the PSNR>=40 invariant measures.
    """
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) uint8, got {arr.dtype} {arr.shape}")
    h, w, _ = arr.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qt_l, qt_c = _quality_tables(quality)

    ycc = _rgb_to_ycbcr(arr)
    pad_h, pad_w = (-h) % 8, (-w) % 8
    if pad_h or pad_w:
        ycc = np.pad(ycc, ((0, pad_h), (0, pad_w), (0, 0)), mode="edge")

    dc_l = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    # Vectorized DCT + quantization for all blocks of all three planes.
    zz_planes = []
    for ci in range(3):
        qt = qt_l if ci == 0 else qt_c
        blocks = _to_blocks(ycc[..., ci]) - 128.0
        # C @ B @ C.T as two broadcast matmuls — einsum(optimize=True)
        # re-ran its path planner per call, which dominated small images
        coef = _C @ blocks @ _C.T
        q = np.round(coef.reshape(-1, 64) / qt.reshape(8, 8).reshape(64).astype(np.float64))
        zz_planes.append(q.astype(np.int64)[:, ZIGZAG])

    # 4:4:4 interleaved scan: one block per component per MCU, in raster
    # block order — interleave by stacking columns.
    writer = _BitWriter()
    n_blocks = zz_planes[0].shape[0]
    prev = [0, 0, 0]
    tables = [(dc_l, ac_l), (dc_c, ac_c), (dc_c, ac_c)]
    for b in range(n_blocks):
        for ci in range(3):
            _encode_single_block(writer, zz_planes[ci][b], prev, ci, tables[ci])
    scan = writer.finish()

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += (
        b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )  # APP0
    for tq, qt in ((0, qt_l), (1, qt_c)):
        payload = bytes([tq]) + bytes(int(x) for x in qt[ZIGZAG])
        out += b"\xff\xdb" + (len(payload) + 2).to_bytes(2, "big") + payload
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([3])
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += bytes([cid, 0x11, tq])  # sampling 1x1 each
    out += b"\xff\xc0" + (len(sof) + 2).to_bytes(2, "big") + sof
    out += _dht_segment(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += _dht_segment(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    out += _dht_segment(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
    out += _dht_segment(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + sos
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _encode_single_block(
    writer: _BitWriter,
    blk: np.ndarray,
    prev: list[int],
    ci: int,
    tables: tuple[dict[int, tuple[int, int]], dict[int, tuple[int, int]]],
) -> None:
    dc_codes, ac_codes = tables
    diff = int(blk[0]) - prev[ci]
    prev[ci] = int(blk[0])
    size = _csize(diff)
    code, ln = dc_codes[size]
    writer.put(code, ln)
    if size:
        writer.put(diff if diff >= 0 else diff + (1 << size) - 1, size)
    nz = np.flatnonzero(blk[1:]) + 1
    pos = 0
    for idx in nz:
        run = int(idx) - pos - 1
        while run >= 16:
            code, ln = ac_codes[0xF0]
            writer.put(code, ln)
            run -= 16
        v = int(blk[idx])
        size = _csize(v)
        code, ln = ac_codes[(run << 4) | size]
        writer.put(code, ln)
        writer.put(v if v >= 0 else v + (1 << size) - 1, size)
        pos = int(idx)
    if pos != 63:
        code, ln = ac_codes[0x00]
        writer.put(code, ln)


# ---------------------------------------------------------------- decoder

def _split_entropy_segments(data: bytes, pos: int) -> list[tuple[bytes, bool]]:
    """Scan data from ``pos`` into entropy-coded segments split at RSTn.

    Returns [(unstuffed_bytes, ended_at_marker), ...] — one segment per
    restart interval (a single segment when there are no restarts).
    FF00 un-stuffing runs at C speed via ``bytes.replace`` (within a
    segment a literal FF in the output can only come from a stuffed
    FF00, and every other FFxx ends the segment first). FF fill bytes
    before a marker are skipped per B.1.1.2. ``ended_at_marker`` is
    False only when the data ran out with no terminating marker — the
    reader then refuses to pad (truncated stream) instead of applying
    the F.2.2.5 1-bit padding that a real segment boundary gets.
    """
    segs: list[tuple[bytes, bool]] = []
    n = len(data)
    start = pos
    p = pos
    while True:
        f = data.find(b"\xff", p)
        if f < 0 or f + 1 >= n:
            segs.append((data[start:n].replace(b"\xff\x00", b"\xff"), False))
            return segs
        nxt = data[f + 1]
        if nxt == 0x00:  # stuffed data byte
            p = f + 2
            continue
        if nxt == 0xFF:  # fill byte before a marker
            p = f + 1
            continue
        segs.append((data[start:f].replace(b"\xff\x00", b"\xff"), True))
        if 0xD0 <= nxt <= 0xD7:  # RSTn: next interval follows
            start = p = f + 2
            continue
        return segs  # EOI or next header segment: scan is over


def _upsample2(plane: np.ndarray, axis: int) -> np.ndarray:
    """2x chroma upsampling with the triangular filter (libjpeg's "fancy
    upsampling": out_even = (3*cur + prev)/4, out_odd = (3*cur + next)/4,
    edges replicated). Matches javax.imageio within ~51+ dB on real 4:2:0
    camera JPEGs where nearest-neighbor diverges to ~38 dB on sharp-chroma
    content (measured, tests/test_jpeg.py)."""
    cur = plane
    if axis == 1:
        prev = np.concatenate([cur[:, :1], cur[:, :-1]], axis=1)
        nxt = np.concatenate([cur[:, 1:], cur[:, -1:]], axis=1)
        out = np.empty((cur.shape[0], cur.shape[1] * 2), dtype=np.float64)
        out[:, 0::2] = (3.0 * cur + prev) * 0.25
        out[:, 1::2] = (3.0 * cur + nxt) * 0.25
    else:
        prev = np.concatenate([cur[:1], cur[:-1]], axis=0)
        nxt = np.concatenate([cur[1:], cur[-1:]], axis=0)
        out = np.empty((cur.shape[0] * 2, cur.shape[1]), dtype=np.float64)
        out[0::2] = (3.0 * cur + prev) * 0.25
        out[1::2] = (3.0 * cur + nxt) * 0.25
    return out


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> (h, w, 3) uint8 RGB.

    Reads quantization + Huffman tables from the stream (a real decoder,
    not a mirror of our encoder's constants): handles 1-4 components,
    sampling factors 1-2, 16-bit DQT precision, DRI/RSTn, byte stuffing.
    Grayscale output is replicated to 3 channels to keep the engine's
    (h, w, 3) contract.

    Corruption contract (foreign bytes at corpus scale): malformed input
    raises ValueError (or NotImplementedError for honest codec gaps) —
    never an untyped container error, never a corruption-sized
    allocation. The hot structural hazards are validated explicitly
    (dimension cap, undefined DQT/DHT ids, DC size); entropy-level
    corruption that surfaces as a residual KeyError/IndexError/
    OverflowError in segment parsing is re-raised as ValueError here
    (4k-trial byte-flip fuzz in tests/test_jpeg.py).
    """
    try:
        return _decode_jpeg_checked(data)
    except (KeyError, IndexError, OverflowError) as e:
        raise ValueError(f"corrupt JPEG stream: {e!r}") from e


def _decode_jpeg_checked(data: bytes) -> np.ndarray:
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    restart_interval = 0
    frame = None  # (h, w, comps) where comps = [(cid, hs, vs, tq)]
    pos = 2
    n = len(data)
    while pos < n - 1:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        seg_len = int.from_bytes(data[pos + 2 : pos + 4], "big")
        seg = data[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT (may hold several tables)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq:
                    tbl = np.frombuffer(seg[i : i + 128], dtype=">u2").astype(np.int64)
                    i += 128
                else:
                    tbl = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(np.int64)
                    i += 64
                raster = np.empty(64, dtype=np.int64)
                raster[ZIGZAG] = tbl
                qt[tq] = raster
        elif marker == 0xC4:  # DHT (may hold several tables)
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1 : i + 17])
                nvals = sum(bits)
                vals = list(seg[i + 17 : i + 17 + nvals])
                huff[(tc, th)] = _lookahead_table(bits, vals)
                i += 17 + nvals
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1 baseline
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            # cap BEFORE the coefficient allocation: corrupt 2-byte dims
            # reach 65535x65535 = 4.3 GP, a 17 GB np.zeros — reject like
            # libjpeg's 65500 limit instead of letting corruption DoS
            # the executor (67 MP is far beyond this engine's payloads)
            if h == 0 or w == 0 or h * w > (1 << 26):
                raise ValueError(f"implausible JPEG dimensions {w}x{h}")
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid = seg[6 + 3 * c]
                hs, vs = seg[7 + 3 * c] >> 4, seg[7 + 3 * c] & 15
                tq = seg[8 + 3 * c]
                if hs not in (1, 2) or vs not in (1, 2):
                    raise NotImplementedError(
                        f"JPEG sampling factor {hs}x{vs} outside 1-2"
                    )
                comps.append((cid, hs, vs, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG process SOF{marker - 0xC0} (progressive/arithmetic/"
                "hierarchical) not supported — baseline sequential only"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan_tables = {}
            for c in range(ns):
                cid = seg[1 + 2 * c]
                td, ta = seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 15
                scan_tables[cid] = (td, ta)
            return _decode_scan(
                data, pos + 2 + seg_len, frame, scan_tables, qt, huff,
                restart_interval,
            )
        pos += 2 + seg_len
    raise ValueError("JPEG has no scan (SOS) segment")


def _decode_scan(
    data: bytes,
    scan_start: int,
    frame: tuple[int, int, list[tuple[int, int, int, int]]],
    scan_tables: dict[int, tuple[int, int]],
    qt: dict[int, np.ndarray],
    huff: dict[tuple[int, int], dict[tuple[int, int], int]],
    restart_interval: int,
) -> np.ndarray:
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    n_mcus = mcus_x * mcus_y

    # Entropy-decode everything first (sequential; one 16-bit-lookahead
    # list index per Huffman symbol — see _lookahead_table), then
    # dequantize + IDCT + assemble vectorized over all blocks per
    # component. The scan is pre-split at RSTn boundaries and un-stuffed
    # at C speed so the Python loop never inspects marker bytes.
    segs = _split_entropy_segments(data, scan_start)
    seg_i = 0
    coef = []  # per component: (n_mcus * hs * vs, 64) int32 zigzag blocks
    for _cid, hs, vs, _tq in comps:
        coef.append(np.zeros((n_mcus * hs * vs, 64), dtype=np.int32))
    # (component, block-in-MCU) schedule with tables resolved once
    sched = []
    for ci, (cid, hs, vs, _tq) in enumerate(comps):
        if cid not in scan_tables:
            raise ValueError(f"JPEG scan missing component id {cid}")
        td, ta = scan_tables[cid]
        if (0, td) not in huff or (1, ta) not in huff:
            raise ValueError("JPEG scan references undefined Huffman table")
        dc_sym, dc_len = huff[(0, td)]
        ac_sym, ac_len = huff[(1, ta)]
        sched.append((ci, hs * vs, dc_sym, dc_len, ac_sym, ac_len))
    pred = [0] * len(comps)
    # The bit buffer lives in LOCALS (acc/nbits/spos), not a reader object:
    # this loop runs once per Huffman symbol and the method-call version
    # spent a third of its time on call overhead (profiled). Invariant at
    # each symbol start: >= 32 buffered bits (a code is <= 16 bits and its
    # value field <= 16, so one top-up per symbol suffices).
    from_bytes = int.from_bytes
    sdata, pad = segs[0]
    sn = len(sdata)
    spos = 0
    acc = 0
    nbits = 0
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            seg_i += 1
            if seg_i >= len(segs):
                raise ValueError("expected RST marker in JPEG scan")
            sdata, pad = segs[seg_i]
            sn = len(sdata)
            spos = 0
            acc = 0
            nbits = 0
            pred = [0] * len(comps)
        for ci, nblk, dc_sym, dc_len, ac_sym, ac_len in sched:
            out = coef[ci]
            pci = pred[ci]
            for b in range(nblk):
                blk = [0] * 64
                while nbits < 32:
                    take = sn - spos
                    if take > 0:
                        if take > 8:
                            take = 8
                        acc = (acc << (8 * take)) | from_bytes(
                            sdata[spos : spos + take], "big"
                        )
                        nbits += 8 * take
                        spos += take
                    elif pad:  # F.2.2.5: 1-bit padding past a real marker
                        acc = (acc << 16) | 0xFFFF
                        nbits += 16
                    else:
                        raise ValueError("truncated JPEG scan")
                idx = (acc >> (nbits - 16)) & 0xFFFF
                ln = dc_len[idx]
                if ln == 0:
                    raise ValueError("invalid Huffman code in JPEG scan")
                nbits -= ln
                size = dc_sym[idx]
                if size:
                    if size > 16:  # corrupt DHT: breaks the 32-bit-buffer invariant
                        raise ValueError("invalid DC size in JPEG scan")
                    nbits -= size
                    v = (acc >> nbits) & ((1 << size) - 1)
                    if v < (1 << (size - 1)):
                        v -= (1 << size) - 1
                    pci += v
                blk[0] = pci
                k = 1
                while k < 64:
                    while nbits < 32:
                        take = sn - spos
                        if take > 0:
                            if take > 8:
                                take = 8
                            acc = (acc << (8 * take)) | from_bytes(
                                sdata[spos : spos + take], "big"
                            )
                            nbits += 8 * take
                            spos += take
                        elif pad:
                            acc = (acc << 16) | 0xFFFF
                            nbits += 16
                        else:
                            raise ValueError("truncated JPEG scan")
                    idx = (acc >> (nbits - 16)) & 0xFFFF
                    ln = ac_len[idx]
                    if ln == 0:
                        raise ValueError("invalid Huffman code in JPEG scan")
                    nbits -= ln
                    sym = ac_sym[idx]
                    if sym == 0x00:  # EOB
                        break
                    size = sym & 15
                    if size == 0:
                        if sym != 0xF0:
                            raise ValueError("invalid AC symbol")
                        k += 16  # ZRL
                        continue
                    k += sym >> 4
                    if k > 63:
                        raise ValueError("AC coefficient index overflow")
                    nbits -= size
                    v = (acc >> nbits) & ((1 << size) - 1)
                    if v < (1 << (size - 1)):
                        v -= (1 << size) - 1
                    blk[k] = v
                    k += 1
                acc &= (1 << nbits) - 1  # trim consumed high bits
                out[m * nblk + b] = blk
            pred[ci] = pci

    planes = []
    for ci, (_cid, hs, vs, tq) in enumerate(comps):
        if tq not in qt:
            raise ValueError(f"JPEG frame references undefined DQT id {tq}")
        q = qt[tq].astype(np.float64)
        zz = coef[ci].astype(np.float64)
        raster = zz[:, _UNZIG] * q[None, :]
        blocks = raster.reshape(-1, 8, 8)
        # C.T @ B @ C as two broadcast matmuls (see encoder note on einsum)
        pix = _C.T @ blocks @ _C + 128.0
        # Assemble MCU-interleaved blocks into the component plane.
        # block index = m * hs*vs + v*hs + hh, m raster over (mcus_y, mcus_x)
        pw, ph = mcus_x * hs * 8, mcus_y * vs * 8
        b5 = pix.reshape(mcus_y, mcus_x, vs, hs, 8, 8)
        plane = b5.transpose(0, 2, 4, 1, 3, 5).reshape(ph, pw)
        # Upsample to full resolution (triangular filter, see _upsample2;
        # sampling factors are 1-2 so each axis needs at most one doubling).
        if hs != hmax:
            plane = _upsample2(plane, axis=1)
        if vs != vmax:
            plane = _upsample2(plane, axis=0)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(y[..., None], 3, axis=2)
    if len(planes) != 3:
        raise NotImplementedError(f"{len(planes)}-component JPEG not supported")
    return _ycbcr_to_rgb(planes[0], planes[1], planes[2])
