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


def _parse_ring(body: str) -> np.ndarray:
    pts = []
    for pair in body.split(","):
        x, y = pair.split()
        pts.append((float(x), float(y)))
    arr = np.asarray(pts, dtype=np.float64)
    if len(arr) > 1 and np.all(arr[0] == arr[-1]):
        arr = arr[:-1]
    return arr


_RING_RE = re.compile(r"\(([^()]*)\)")


@lru_cache(maxsize=4096)
def parse_polygon(wkt: str) -> np.ndarray:
    """Single-ring POLYGON ((x y, ...)) -> (n, 2) float array, closing
    vertex dropped.  Raises on holed/multi geometries — use
    `parse_polygon_rings` for the general surface."""
    rings = parse_polygon_rings(wkt)
    if len(rings) != 1:
        raise ValueError(
            f"multi-ring geometry needs parse_polygon_rings: {wkt[:80]!r}"
        )
    return rings[0]


@lru_cache(maxsize=4096)
def parse_polygon_rings(wkt: str) -> tuple[np.ndarray, ...]:
    """POLYGON (with holes) or MULTIPOLYGON -> tuple of (n, 2) rings
    (shells and holes flattened; the even-odd kernels in `geom.core`
    interpret them uniformly).  Reference analog: the JTS-backed
    Polygon/MultiPolygon UDT columns
    (`analytics/spark/.../sparksql/udt/MultiPolygonUDT.java`)."""
    s = wkt.lstrip()
    head = s[:12].upper()
    if not (head.startswith("POLYGON") or head.startswith("MULTIPOLYGON")):
        raise ValueError(f"not a POLYGON/MULTIPOLYGON WKT: {wkt[:80]!r}")
    rings = tuple(_parse_ring(m.group(1)) for m in _RING_RE.finditer(s))
    if not rings:
        raise ValueError(f"no rings in WKT: {wkt[:80]!r}")
    return rings


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
    s = wkt.lstrip()[:16].upper()
    if s.startswith("POINT"):
        return "point"
    if s.startswith("MULTIPOLYGON") or s.startswith("POLYGON"):
        return "polygon"
    if s.startswith("MULTILINESTRING"):
        return "multilinestring"
    if s.startswith("LINESTRING"):
        return "linestring"
    raise ValueError(f"unsupported WKT type: {wkt[:40]!r}")


@lru_cache(maxsize=4096)
def parse_multilinestring(wkt: str) -> tuple[np.ndarray, ...]:
    """MULTILINESTRING ((x y, ...), (...)) -> tuple of open polylines.
    Reference analog: MultiLineStringUDT."""
    s = wkt.lstrip()
    if not s[:16].upper().startswith("MULTILINESTRING"):
        raise ValueError(f"not a MULTILINESTRING WKT: {wkt[:80]!r}")
    parts = []
    for m in _RING_RE.finditer(s):
        pts = []
        for pair in m.group(1).split(","):
            x, y = pair.split()
            pts.append((float(x), float(y)))
        parts.append(np.asarray(pts, dtype=np.float64))
    if not parts:
        raise ValueError(f"no parts in WKT: {wkt[:80]!r}")
    return tuple(parts)


def multipolygon_wkt(rings) -> str:
    """Ring list -> POLYGON (one shell + holes) stays `polygon_wkt`; this
    emits each ring as its own MULTIPOLYGON part (disjoint shells)."""
    bodies = []
    for ring in rings:
        ring = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
        if not np.all(ring[0] == ring[-1]):
            ring = np.vstack([ring, ring[:1]])
        bodies.append("((" + ", ".join(f"{x!r} {y!r}" for x, y in ring) + "))")
    return f"MULTIPOLYGON ({', '.join(bodies)})"


def polygon_wkt_holes(rings) -> str:
    """Shell + hole rings -> POLYGON ((shell), (hole), ...)."""
    bodies = []
    for ring in rings:
        ring = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
        if not np.all(ring[0] == ring[-1]):
            ring = np.vstack([ring, ring[:1]])
        bodies.append("(" + ", ".join(f"{x!r} {y!r}" for x, y in ring) + ")")
    return f"POLYGON ({', '.join(bodies)})"


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


def bounds(wkt: str) -> tuple[float, float, float, float]:
    """Envelope (minx, miny, maxx, maxy) of any supported WKT geometry.
    Reference analog: JTS Geometry.getEnvelopeInternal() as used by the
    loose/envelope query paths."""
    t = geom_type(wkt)
    if t == "point":
        x, y = parse_point(wkt)
        return x, y, x, y
    if t == "polygon":
        pts = np.concatenate(parse_polygon_rings(wkt))
    elif t == "linestring":
        pts = parse_linestring(wkt)
    else:
        pts = np.concatenate(parse_multilinestring(wkt))
    return (float(pts[:, 0].min()), float(pts[:, 1].min()),
            float(pts[:, 0].max()), float(pts[:, 1].max()))
