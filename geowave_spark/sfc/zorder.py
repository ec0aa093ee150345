"""Vectorized 2-D Z-order (Morton) curve over numpy uint64 arrays.

Role model: GeoWave's Z-order SFC (`core/index/.../sfc/zorder/ZOrderSFC.java:54-71`,
`ZOrderUtils.java` in /root/reference) which interleaves per-dimension bits of
normalized coordinates into a single sort key.  This is a from-scratch numpy
re-expression: bit spreading via magic-mask shifts, fully vectorized — no
per-row Python (the whole array is transformed with ~6 shift/mask ops).

Keys are `uint64`: two interleaved 31-bit dimensions (62 bits used), matching
the reference's "primitive ops up to 62 bits" fast path
(`PrimitiveHilbertSFCOperations.java`).
"""

from __future__ import annotations

import numpy as np

#: max bits per dimension for a 2-D morton key in an int64-safe key space
MAX_BITS_PER_DIM = 31

_MASKS = (
    np.uint64(0x0000_0000_FFFF_FFFF),
    np.uint64(0x0000_FFFF_0000_FFFF),
    np.uint64(0x00FF_00FF_00FF_00FF),
    np.uint64(0x0F0F_0F0F_0F0F_0F0F),
    np.uint64(0x3333_3333_3333_3333),
    np.uint64(0x5555_5555_5555_5555),
)


def _spread_bits(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of each uint64 so bit i lands at position 2*i."""
    v = v.astype(np.uint64) & _MASKS[0]
    v = (v | (v << np.uint64(16))) & _MASKS[1]
    v = (v | (v << np.uint64(8))) & _MASKS[2]
    v = (v | (v << np.uint64(4))) & _MASKS[3]
    v = (v | (v << np.uint64(2))) & _MASKS[4]
    v = (v | (v << np.uint64(1))) & _MASKS[5]
    return v


def _compact_bits(v: np.ndarray) -> np.ndarray:
    """Inverse of :func:`_spread_bits` (keep bits at even positions)."""
    v = v.astype(np.uint64) & _MASKS[5]
    v = (v | (v >> np.uint64(1))) & _MASKS[4]
    v = (v | (v >> np.uint64(2))) & _MASKS[3]
    v = (v | (v >> np.uint64(4))) & _MASKS[2]
    v = (v | (v >> np.uint64(8))) & _MASKS[1]
    v = (v | (v >> np.uint64(16))) & _MASKS[0]
    return v


def encode(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Interleave integer grid coords (x, y) -> morton key (uint64).

    Bit layout: y occupies odd bit positions, x even positions, i.e.
    key = sum_i (x_i << 2i | y_i << (2i+1)).
    """
    return _spread_bits(np.asarray(x)) | (_spread_bits(np.asarray(y)) << np.uint64(1))


def decode(z: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Morton key -> (x, y) integer grid coords."""
    z = np.asarray(z, dtype=np.uint64)
    return _compact_bits(z), _compact_bits(z >> np.uint64(1))
