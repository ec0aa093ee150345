"""Minimal WKT codec for the SQL geometry function surface.

Reference analog (/root/reference): GeomFromWKT
(`analytics/spark/src/main/java/.../sparksql/udf/wkt/GeomFromWKT.java`) and
the JTS-backed geometry UDT columns.  This engine keeps geometry in plain
columns (lon/lat doubles or WKT strings at the SQL surface); only POINT and
single-ring POLYGON are needed by the query surface.

Parsing is driver-side or per-distinct-literal inside UDFs (polygon
literals are query constants, never per-row hot-path work).
"""

from __future__ import annotations

import re
from functools import lru_cache

import numpy as np

_NUM = r"[-+]?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?"
_POINT_RE = re.compile(rf"^\s*POINT\s*\(\s*({_NUM})\s+({_NUM})\s*\)\s*$", re.I)
_POLY_RE = re.compile(r"^\s*POLYGON\s*\(\s*\((.*?)\)\s*\)\s*$", re.I | re.S)
_LINE_RE = re.compile(r"^\s*LINESTRING\s*\((.*?)\)\s*$", re.I | re.S)


def parse_point(wkt: str) -> tuple[float, float]:
    m = _POINT_RE.match(wkt)
    if not m:
        raise ValueError(f"not a POINT WKT: {wkt[:80]!r}")
    return float(m.group(1)), float(m.group(2))


@lru_cache(maxsize=4096)
def parse_polygon(wkt: str) -> np.ndarray:
    """POLYGON ((x y, x y, ...)) -> (n, 2) float array, closing vertex dropped."""
    m = _POLY_RE.match(wkt)
    if not m:
        raise ValueError(f"not a POLYGON WKT: {wkt[:80]!r}")
    pts = []
    for pair in m.group(1).split(","):
        x, y = pair.split()
        pts.append((float(x), float(y)))
    arr = np.asarray(pts, dtype=np.float64)
    if len(arr) > 1 and np.all(arr[0] == arr[-1]):
        arr = arr[:-1]
    return arr


@lru_cache(maxsize=4096)
def parse_linestring(wkt: str) -> np.ndarray:
    """LINESTRING (x y, x y, ...) -> (n, 2) float array (open polyline)."""
    m = _LINE_RE.match(wkt)
    if not m:
        raise ValueError(f"not a LINESTRING WKT: {wkt[:80]!r}")
    pts = []
    for pair in m.group(1).split(","):
        x, y = pair.split()
        pts.append((float(x), float(y)))
    return np.asarray(pts, dtype=np.float64)


def geom_type(wkt: str) -> str:
    s = wkt.lstrip()[:12].upper()
    if s.startswith("POINT"):
        return "point"
    if s.startswith("POLYGON"):
        return "polygon"
    if s.startswith("LINESTRING"):
        return "linestring"
    raise ValueError(f"unsupported WKT type: {wkt[:40]!r}")


def linestring_wkt(coords: np.ndarray) -> str:
    coords = np.asarray(coords, dtype=np.float64).reshape(-1, 2)
    body = ", ".join(f"{x!r} {y!r}" for x, y in coords)
    return f"LINESTRING ({body})"


def point_wkt(lon: float, lat: float) -> str:
    return f"POINT ({lon!r} {lat!r})"


def polygon_wkt(ring: np.ndarray) -> str:
    ring = np.asarray(ring, dtype=np.float64)
    if not np.all(ring[0] == ring[-1]):
        ring = np.vstack([ring, ring[:1]])
    body = ", ".join(f"{x!r} {y!r}" for x, y in ring)
    return f"POLYGON (({body}))"
