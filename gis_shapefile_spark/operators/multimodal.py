"""Multimodal (image payload) stages over the input_hint table.

The driver-mandated table is ``(image_id: string, bytes: binary, w: int32,
h: int32, fmt: string, caption: string, phash: int64)`` (BASELINE.json
``input_hint``). Images are opaque binary + typed metadata; every stage
here is ``mapInPandas`` over Arrow batches — the *plumbing* (schema,
batching, partition preservation) is real and tested, while the codec
itself is the sandbox's numpy/zlib pair (``sources/fixtures.py``:
``raw`` lossless, ``qz`` 6-bit quantization, PSNR ≈ 47 dB). Real-world
codecs (JPEG/PNG/WebP) plug into ``_decode_batch`` — any unknown ``fmt``
raises ``NotImplementedError`` loudly rather than guessing.

Per-row invariants (input_hint): decoded-pixel allclose (exact for
``raw``, PSNR >= 40 dB for ``qz``), byte-exact caption, recomputed
``phash`` equality. ``verify_invariants`` is the checkable stage every
pipeline run appends.

Scale notes: stages are embarrassingly parallel (no shuffle), preserve
the input partitioning (so a downstream cell-join reuses it), and the
Arrow batch size bounds executor memory (batch rows x w x h x 3 bytes).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..sources import fixtures as FX

IMAGE_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long"
)


def _decode_batch(pdf: pd.DataFrame) -> list[np.ndarray]:
    """Decode every row of an Arrow batch to (h, w, 3) uint8 pixels.

    Unknown ``fmt`` values raise NotImplementedError (clearly-marked stub
    seam for real codecs; see module docstring).
    """
    out = []
    for data, w, h, fmt in zip(pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]):
        out.append(FX.decode_image(data, int(w), int(h), str(fmt)))
    return out


def decode_stats(images: DataFrame) -> DataFrame:
    """Decode + per-image channel stats and recomputed phash.

    Output: image_id, mean_r/g/b (x1e6, integerized), phash_rec, phash_ok.
    """
    schema = (
        "image_id string, mean_r long, mean_g long, mean_b long, "
        "phash_rec long, phash_ok boolean"
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pix = _decode_batch(pdf)
            means = np.array([p.reshape(-1, 3).mean(axis=0) for p in pix])
            ph = np.array([FX.phash64(p) for p in pix], dtype=np.int64)
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"].values,
                    "mean_r": np.floor(means[:, 0] * 1e6).astype(np.int64),
                    "mean_g": np.floor(means[:, 1] * 1e6).astype(np.int64),
                    "mean_b": np.floor(means[:, 2] * 1e6).astype(np.int64),
                    "phash_rec": ph,
                    "phash_ok": ph == pdf["phash"].values.astype(np.int64),
                }
            )

    return images.mapInPandas(fn, schema)


def resize_images(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-pixel resize on a deterministic integer sample grid,
    re-encoded in the same fmt. Output keeps the full input_hint schema;
    phash is recomputed from the resized pixels, caption passes through
    byte-exact."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for (_, r), pix in zip(pdf.iterrows(), _decode_batch(pdf)):
                # nearest-pixel sample grid: deterministic for any ratio
                yi = (np.arange(out_h) * r["h"] // out_h).astype(np.int64)
                xi = (np.arange(out_w) * r["w"] // out_w).astype(np.int64)
                small = pix[yi][:, xi]
                fmt = str(r["fmt"])
                dec = FX.decode_image(
                    FX.encode_image(small, fmt), out_w, out_h, fmt
                )
                rows.append(
                    (
                        r["image_id"],
                        FX.encode_image(small, fmt),
                        out_w,
                        out_h,
                        fmt,
                        r["caption"],
                        FX.phash64(dec),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
                ],
            )

    return images.mapInPandas(fn, IMAGE_SCHEMA)


def extract_features(images: DataFrame, grid: int = 4) -> DataFrame:
    """Deterministic visual embedding: ``grid x grid`` block-mean luma,
    L2-normalized — the engine's stand-in for a vision encoder (the seam
    where a real model's batch inference plugs in).

    Output: (image_id, embedding: array<float>), dim = grid*grid.
    """
    schema = "image_id string, embedding array<float>"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            embs = []
            for pix in _decode_batch(pdf):
                luma = pix.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
                h, w = luma.shape
                bh, bw = max(h // grid, 1), max(w // grid, 1)
                small = luma[: bh * grid, : bw * grid].reshape(
                    grid, bh, grid, bw
                ).mean(axis=(1, 3)).ravel()
                n = np.linalg.norm(small)
                embs.append((small / n if n > 0 else small).astype(np.float32))
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"].values,
                    "embedding": [e.tolist() for e in embs],
                }
            )

    return images.mapInPandas(fn, schema)


def verify_invariants(
    images: DataFrame, reencode: bool = True, min_psnr: float = 40.0
) -> DataFrame:
    """The input_hint per-row invariant stage.

    For each row: decode; recompute phash (must equal the carried column);
    optionally re-encode + re-decode and score PSNR (codec-idempotence —
    for these codecs the roundtrip is exact, so PSNR is inf; a real lossy
    codec would bottom out near its quality setting). The decoded-vs-
    *pre-encode* PSNR >= 40 dB invariant is asserted where the originals
    exist: at fixture generation (tests/test_multimodal_tiling.py).
    Caption hash passes through for byte-exactness checks across stages.

    Output: image_id, phash_ok, psnr_u (x1e3; 10^9 sentinel for inf),
    psnr_ok, caption_sha — one row per input row (no shuffle).
    """
    schema = (
        "image_id string, phash_ok boolean, psnr_u long, psnr_ok boolean, "
        "caption_sha string"
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if len(pdf) == 0:
                continue
            phash_ok, psnr_u, psnr_ok, cap_sha = [], [], [], []
            for (_, r), pix in zip(pdf.iterrows(), _decode_batch(pdf)):
                phash_ok.append(FX.phash64(pix) == int(r["phash"]))
                if reencode:
                    rt = FX.decode_image(
                        FX.encode_image(pix, str(r["fmt"])),
                        int(r["w"]), int(r["h"]), str(r["fmt"]),
                    )
                    p = FX.psnr(pix, rt)
                else:
                    p = float("inf")
                psnr_u.append(
                    10**9 if np.isinf(p) else int(np.floor(p * 1000))
                )
                psnr_ok.append(p >= min_psnr)
                cap_sha.append(
                    hashlib.sha256(str(r["caption"]).encode()).hexdigest()[:16]
                )
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"].values,
                    "phash_ok": phash_ok,
                    "psnr_u": np.asarray(psnr_u, dtype=np.int64),
                    "psnr_ok": psnr_ok,
                    "caption_sha": cap_sha,
                }
            )

    return images.mapInPandas(fn, schema)
