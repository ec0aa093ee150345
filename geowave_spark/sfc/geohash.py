"""Geohash binning: vectorized numpy encode + closed-form SQL twin.

Reference analog (/root/reference): `core/geotime/src/main/java/.../geotime/
binning/GeohashBinningHelper.java` (120 LoC) — one of the three spatial
binning types (`SpatialBinningType.java:15-16`, H3 / S2 / GEOHASH) usable
by any binned aggregation/statistic.

Standard geohash: interleave lon/lat bits (lon first) over the bisected
[-180,180] x [-90,90] domain, emit base32 chars (5 bits each).  The SQL
generator produces the IDENTICAL arithmetic for Spark SQL and DuckDB
(pure div/mod + substr — no UDF), so geohash-binned aggregations get full
oracle parity like every other cell query.
"""

from __future__ import annotations

import numpy as np

BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _bit_counts(precision: int) -> tuple[int, int]:
    total = 5 * precision
    lon_bits = (total + 1) // 2  # lon first -> gets the extra bit
    lat_bits = total // 2
    return lon_bits, lat_bits


def encode(lon: np.ndarray, lat: np.ndarray, precision: int = 6) -> np.ndarray:
    """Vectorized geohash strings at the given precision."""
    lon_bits, lat_bits = _bit_counts(precision)
    x = np.clip(
        np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / 360.0 * (1 << lon_bits)),
        0, (1 << lon_bits) - 1,
    ).astype(np.int64)
    y = np.clip(
        np.floor((np.asarray(lat, dtype=np.float64) + 90.0) / 180.0 * (1 << lat_bits)),
        0, (1 << lat_bits) - 1,
    ).astype(np.int64)
    total = 5 * precision
    # interleave MSB-first: even global bit index -> lon, odd -> lat
    val = np.zeros(x.shape, dtype=np.int64)
    for b in range(total):
        if b % 2 == 0:
            bit = (x >> np.int64(lon_bits - 1 - b // 2)) & 1
        else:
            bit = (y >> np.int64(lat_bits - 1 - b // 2)) & 1
        val = (val << np.int64(1)) | bit
    chars = np.empty((len(np.atleast_1d(val)), precision), dtype="<U1")
    flat = np.atleast_1d(val)
    for c in range(precision):
        idx = (flat >> np.int64(5 * (precision - 1 - c))) & 31
        chars[:, c] = np.array(list(BASE32))[idx]
    return np.array(["".join(row) for row in chars])


def geohash_sql(lon: str, lat: str, precision: int = 6) -> str:
    """SQL fragment (Spark SQL == DuckDB) computing the same geohash.

    The ordinate expressions are inlined per bit term (fixed 5*precision
    repetitions of O(1) arithmetic — cheap, and keeps the fragment a plain
    scalar expression valid in both dialects).  Integer division is
    spelled cast(floor(a / p) as bigint): ordinates are < 2^31 so the
    double division is exact in both engines.
    """
    lon_bits, lat_bits = _bit_counts(precision)
    nx, ny = 1 << lon_bits, 1 << lat_bits
    x = (
        f"least(greatest(cast(floor((({lon}) + 180e0) / 360e0 * {nx}) as bigint), 0), {nx - 1})"
    )
    y = (
        f"least(greatest(cast(floor((({lat}) + 90e0) / 180e0 * {ny}) as bigint), 0), {ny - 1})"
    )
    chars = []
    for c in range(precision):
        bits = []
        for k in range(5):
            b = 5 * c + k  # global interleaved bit index, MSB-first
            if b % 2 == 0:
                src, nbits, i = x, lon_bits, b // 2
            else:
                src, nbits, i = y, lat_bits, b // 2
            p = 1 << (nbits - 1 - i)
            bit = f"(cast(floor({src} / {p}.0) as bigint) % 2)"
            bits.append(f"{bit} * {1 << (4 - k)}")
        v = " + ".join(bits)
        chars.append(f"substr('{BASE32}', cast({v} as int) + 1, 1)")
    return "concat(" + ", ".join(chars) + ")"
