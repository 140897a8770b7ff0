"""Minimal deterministic PNG codec (stdlib zlib only).

The sandbox has no imaging libraries (CLAUDE.md / multimodal.py seam),
but PNG itself is a tiny public container (ISO/IEC 15948): signature,
IHDR, zlib-compressed filter-prefixed scanlines in IDAT, IEND, each
chunk CRC32-framed. Implementing it directly keeps the map-tile render
sink REAL — the bytes this engine writes are valid PNGs any browser
renders — while staying fully deterministic (fixed zlib level, filter 0
on every scanline) so tiles are reproducible and cache-stable.

Encoder supports 8-bit grayscale, RGB, and RGBA (map tiles plus the
image-table codec seam — ``fmt="png"`` rows in the input_hint table are
REAL PNGs, encoded and decoded by this module); decoder supports exactly
what the encoder emits plus the other standard filters (1-4), so
round-trip tests decode any re-encoded variant.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, level: int = 6) -> bytes:
    """Encode uint8 pixels: (h, w) grayscale, (h, w, 3) RGB, (h, w, 4) RGBA."""
    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        raise ValueError(f"PNG encode needs uint8, got {arr.dtype}")
    if arr.ndim == 2:
        color_type, channels = 0, 1
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type, channels = 2, 3
    elif arr.ndim == 3 and arr.shape[2] == 4:
        color_type, channels = 6, 4
    else:
        raise ValueError(
            f"unsupported shape {arr.shape} (want (h,w), (h,w,3) or (h,w,4))"
        )
    h, w = arr.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = arr.reshape(h, w * channels)
    # filter byte 0 (None) per scanline: deterministic and cheap; density
    # tiles are mostly zeros, zlib handles them well without Paeth
    scan = np.zeros((h, 1 + w * channels), dtype=np.uint8)
    scan[:, 1:] = raw
    idat = zlib.compress(scan.tobytes(), level)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit grayscale or RGBA PNG to (h, w[, 4]) uint8."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + ln]
        crc = struct.unpack(">I", data[pos + 8 + ln:pos + 12 + ln])[0]
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r}")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(f"unsupported PNG params {ihdr}")
    channels = {0: 1, 6: 4, 2: 3}.get(color_type)
    if channels is None:
        raise ValueError(f"unsupported color type {color_type}")
    stride = w * channels
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    raw = raw.reshape(h, 1 + stride)
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at depth 8
    for r in range(h):
        f = raw[r, 0]
        line = raw[r, 1:].astype(np.int32)
        prev = out[r - 1].astype(np.int32) if r > 0 else np.zeros(stride, np.int32)
        if f == 0:
            rec = line
        elif f == 2:  # Up
            rec = (line + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth need left-recurrence
            rec = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                b = prev[i]
                if f == 1:
                    rec[i] = (line[i] + a) & 0xFF
                elif f == 3:
                    rec[i] = (line[i] + (a + b) // 2) & 0xFF
                else:
                    c = prev[i - bpp] if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    rec[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown filter {f}")
        out[r] = rec.astype(np.uint8)
    img = out.reshape(h, w, channels)
    return img[:, :, 0] if channels == 1 else img
