"""Perceptual image fingerprint (dHash) over decoded pixels.

The image-side analog of the text near-dup family: a 64-bit
difference hash (dHash — Krawetz's gradient variant of aHash: compare
each pixel to its right neighbor on a 9x8 downsample) that is
invariant to uniform brightness shifts and JPEG-grade noise, so
near-identical images land within a small Hamming distance and the
simhash64-style 4x16-bit banded join finds them without an all-pairs
scan.

Everything is integer arithmetic on decoded pixels (the repo's real
PNG/BMP codecs), so the hash is bit-reproducible across engines and
platforms: integer luma (299/587/114 per mille, floor), the repo's
deterministic nearest_resize, strict > comparisons, MSB-first bit
order, returned as a SIGNED int64 (Spark LongType twos-complement).

Reference analog: the per-page PNGs the reference renders
(docker/main.py:209-227) are exactly the corpus this fingerprints —
re-rendered pages differing by a timestamp pixel or antialiasing land
at Hamming <= 3 and dedupe.
"""

from __future__ import annotations

import numpy as np

from .png import nearest_resize

DHASH_W = 9  # columns sampled; 8 comparisons per row
DHASH_H = 8


def _gray(pixels: np.ndarray) -> np.ndarray:
    """Integer luma: (H, W) uint16 from (H, W) or (H, W, C) uint8.
    Exact: (299*R + 587*G + 114*B) // 1000; gray/GA use the gray
    channel; alpha is ignored (fingerprint of the color content)."""
    if pixels.ndim == 2:
        return pixels.astype(np.uint16)
    c = pixels.shape[2]
    if c in (1, 2):  # gray / gray+alpha
        return pixels[:, :, 0].astype(np.uint16)
    p = pixels.astype(np.uint32)
    return (
        (299 * p[:, :, 0] + 587 * p[:, :, 1] + 114 * p[:, :, 2]) // 1000
    ).astype(np.uint16)


def dhash64(pixels: np.ndarray) -> int:
    """64-bit dHash of a decoded pixel array, as signed int64.

    Bit (row r, comparison k) = 1 iff g[r, k] > g[r, k+1] on the 9x8
    nearest-downsample of the integer luma; bit order is MSB-first by
    (row, k) so the value is platform-independent."""
    g = _gray(pixels)
    small = nearest_resize(g[:, :, None], DHASH_W, DHASH_H)[:, :, 0]
    bits = (small[:, :-1] > small[:, 1:]).flatten()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


def hamming64(a: int, b: int) -> int:
    """Hamming distance between two signed-int64 hashes."""
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")
