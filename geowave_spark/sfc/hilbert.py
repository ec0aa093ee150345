"""Vectorized 2-D Hilbert curve over numpy arrays.

Role model: GeoWave's Hilbert SFC (`core/index/.../sfc/hilbert/HilbertSFC.java:174-178`
and `PrimitiveHilbertSFCOperations.java` in /root/reference), which maps
normalized 2-D coordinates onto a compact-Hilbert 1-D sort key so that nearby
points get nearby keys.  This is a from-scratch numpy implementation of the
classic iterative rotate/reflect Hilbert mapping (public algorithm, see
Hamilton's compact Hilbert papers / the well-known iterative formulation):
the loop is over *bits* (<= 31 iterations), every iteration is a vectorized
mask/where over the whole array — no per-row Python.
"""

from __future__ import annotations

import numpy as np

MAX_BITS_PER_DIM = 31


def encode(x: np.ndarray, y: np.ndarray, bits: int = MAX_BITS_PER_DIM) -> np.ndarray:
    """(x, y) integer grid coords in [0, 2**bits) -> Hilbert distance (uint64)."""
    x = np.asarray(x, dtype=np.uint64).copy()
    y = np.asarray(y, dtype=np.uint64).copy()
    d = np.zeros(x.shape, dtype=np.uint64)
    one = np.uint64(1)
    s = np.uint64(1) << np.uint64(bits - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.uint64)
        ry = ((y & s) > 0).astype(np.uint64)
        d += s * s * ((np.uint64(3) * rx) ^ ry)
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == 1)
        sm1 = s - one
        x_f = np.where(flip, sm1 - x, x)
        y_f = np.where(flip, sm1 - y, y)
        x, y = np.where(swap, y_f, x_f), np.where(swap, x_f, y_f)
        s >>= one
    return d


def decode(d: np.ndarray, bits: int = MAX_BITS_PER_DIM) -> tuple[np.ndarray, np.ndarray]:
    """Hilbert distance -> (x, y) integer grid coords (inverse of :func:`encode`)."""
    d = np.asarray(d, dtype=np.uint64)
    x = np.zeros(d.shape, dtype=np.uint64)
    y = np.zeros(d.shape, dtype=np.uint64)
    t = d.copy()
    one = np.uint64(1)
    two = np.uint64(2)
    s = np.uint64(1)
    n = np.uint64(1) << np.uint64(bits)
    while s < n:
        rx = one & (t // two)
        ry = one & (t ^ rx)
        # rotate quadrant back
        swap = ry == 0
        flip = swap & (rx == 1)
        sm1 = s - one
        x_f = np.where(flip, sm1 - x, x)
        y_f = np.where(flip, sm1 - y, y)
        x, y = np.where(swap, y_f, x_f), np.where(swap, x_f, y_f)
        x += s * rx
        y += s * ry
        t //= np.uint64(4)
        s <<= one
    return x, y
