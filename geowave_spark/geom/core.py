"""Vectorized computational geometry (pure numpy) — the exact-refine kernel.

Role model: GeoWave's spatial predicate set
(`core/geotime/.../store/query/filter/SpatialQueryFilter.java:47-140` and the
filter-expression tree `.../filter/expression/spatial/*.java` in
/root/reference) which refines candidate rows with exact JTS geometry tests
after the index range scan.  shapely is unavailable in this environment, so
the predicates are implemented directly as numpy array ops: every function is
vectorized over N points (or N cells) against one polygon; multi-polygon
candidate sets are handled by the callers grouping per polygon.

Polygons are flat float64 arrays [x0, y0, x1, y1, ...] (unclosed ring is
accepted; closure is implicit).
"""

from __future__ import annotations

import numpy as np


def poly_xy(poly) -> tuple[np.ndarray, np.ndarray]:
    a = np.asarray(poly, dtype=np.float64).reshape(-1, 2)
    return a[:, 0], a[:, 1]


def poly_bbox(poly) -> tuple[float, float, float, float]:
    x, y = poly_xy(poly)
    return float(x.min()), float(y.min()), float(x.max()), float(y.max())


def point_in_polygon(px: np.ndarray, py: np.ndarray, poly) -> np.ndarray:
    """Ray-cast point-in-polygon, vectorized over points.

    Boundary semantics ~ JTS `contains`: points exactly on a horizontal-ray
    crossing edge follow the half-open rule (consistent, deterministic).
    """
    vx, vy = poly_xy(poly)
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    inside = np.zeros(px.shape, dtype=bool)
    j = len(vx) - 1
    for i in range(len(vx)):
        xi, yi, xj, yj = vx[i], vy[i], vx[j], vy[j]
        cond = (yi > py) != (yj > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (xj - xi) * (py - yi) / (yj - yi) + xi
        inside ^= cond & (px < xint)
        j = i
    return inside


def bboxes_within_polygon(lon0, lat0, lon1, lat1, poly,
                          margin: float = 1e-9) -> np.ndarray:
    """Which of N bboxes (cells) lie FULLY inside one polygon.

    Used to classify cover cells: points in a fully-interior cell need no
    exact refine (GeoWave's XZ-order makes the same interior/boundary
    distinction for extended objects).  Conservative by ``margin``: the
    bbox is inflated before the edge tests, so any polygon edge passing
    within ``margin`` of the cell demotes it to "partial" — float rounding
    in the exact ray-cast (~1e-14 abs) can then never disagree with the
    classification.
    """
    lon0 = np.asarray(lon0, dtype=np.float64) - margin
    lat0 = np.asarray(lat0, dtype=np.float64) - margin
    lon1 = np.asarray(lon1, dtype=np.float64) + margin
    lat1 = np.asarray(lat1, dtype=np.float64) + margin
    vx, vy = poly_xy(poly)

    # all 4 inflated corners strictly inside
    full = np.ones(lon0.shape, dtype=bool)
    for cx, cy in ((lon0, lat0), (lon0, lat1), (lon1, lat0), (lon1, lat1)):
        full &= point_in_polygon(cx, cy, poly)
    # no polygon vertex inside the inflated bbox
    for k in range(len(vx)):
        full &= ~((vx[k] >= lon0) & (vx[k] <= lon1)
                  & (vy[k] >= lat0) & (vy[k] <= lat1))
    # no polygon edge crossing any inflated bbox edge
    j = len(vx) - 1
    for i in range(len(vx)):
        ex0, ey0, ex1, ey1 = vx[j], vy[j], vx[i], vy[i]
        if not full.any():
            break
        for bx0, by0, bx1, by1 in (
            (lon0, lat0, lon1, lat0),
            (lon1, lat0, lon1, lat1),
            (lon1, lat1, lon0, lat1),
            (lon0, lat1, lon0, lat0),
        ):
            full &= ~_segments_intersect(
                np.full(lon0.shape, ex0), np.full(lon0.shape, ey0),
                np.full(lon0.shape, ex1), np.full(lon0.shape, ey1),
                bx0, by0, bx1, by1,
            )
        j = i
    return full


def pack_polygons(polys: dict[int, np.ndarray]):
    """Pack a polygon dict into padded vertex matrices for the batch kernel.

    Returns (ids_sorted, VX, VY, NV): ids_sorted is the sorted poly-id
    vector; VX/VY are (P, max_nv) row-padded vertex matrices; NV the true
    vertex count per polygon.  `np.searchsorted(ids_sorted, poly_id_col)`
    maps a per-row polygon-id column to row indices.
    """
    ids_sorted = np.array(sorted(polys), dtype=np.int64)
    xs, ys = [], []
    for p in ids_sorted:
        vx, vy = poly_xy(polys[int(p)])
        xs.append(vx)
        ys.append(vy)
    max_nv = max(len(v) for v in xs)
    vx_pad = np.zeros((len(ids_sorted), max_nv), dtype=np.float64)
    vy_pad = np.zeros((len(ids_sorted), max_nv), dtype=np.float64)
    nv = np.empty(len(ids_sorted), dtype=np.int64)
    for r, (vx, vy) in enumerate(zip(xs, ys)):
        vx_pad[r, : len(vx)] = vx
        vy_pad[r, : len(vy)] = vy
        nv[r] = len(vx)
    return ids_sorted, vx_pad, vy_pad, nv


def point_in_polygons(px, py, poly_rows, vx_pad, vy_pad, nv) -> np.ndarray:
    """Batch ray-cast: point i against polygon ``poly_rows[i]``.

    Bit-identical to `point_in_polygon` (same per-edge formula and order)
    but vectorized across a batch of MIXED polygons — no per-polygon
    sub-slicing, which costs ~100us/group in pandas and dominates when
    Arrow batches contain many small groups (the spatial-join refine).
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    inside = np.zeros(px.shape, dtype=bool)
    row_nv = nv[poly_rows]
    for k in range(vx_pad.shape[1]):
        active = k < row_nv
        j = np.where(k == 0, row_nv - 1, k - 1)
        xi = vx_pad[poly_rows, k]
        yi = vy_pad[poly_rows, k]
        xj = vx_pad[poly_rows, j]
        yj = vy_pad[poly_rows, j]
        cond = (yi > py) != (yj > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (xj - xi) * (py - yi) / (yj - yi) + xi
        inside ^= active & cond & (px < xint)
    return inside


def point_in_bbox(px, py, lon0, lat0, lon1, lat1) -> np.ndarray:
    """Closed-boundary bbox test (matches SQL BETWEEN semantics so the DuckDB
    oracle join agrees exactly)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    return (px >= lon0) & (px <= lon1) & (py >= lat0) & (py <= lat1)


def _segments_intersect(ax0, ay0, ax1, ay1, bx0, by0, bx1, by1) -> np.ndarray:
    """Proper/improper segment intersection, vectorized (orientations)."""

    def orient(ox, oy, px_, py_, qx, qy):
        return (px_ - ox) * (qy - oy) - (py_ - oy) * (qx - ox)

    d1 = orient(bx0, by0, bx1, by1, ax0, ay0)
    d2 = orient(bx0, by0, bx1, by1, ax1, ay1)
    d3 = orient(ax0, ay0, ax1, ay1, bx0, by0)
    d4 = orient(ax0, ay0, ax1, ay1, bx1, by1)
    general = ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0)) & (d1 != 0) & (d2 != 0) & (d3 != 0) & (d4 != 0)

    def on_seg(ox, oy, px_, py_, qx, qy, d):
        return (d == 0) & (np.minimum(ox, px_) <= qx) & (qx <= np.maximum(ox, px_)) & \
               (np.minimum(oy, py_) <= qy) & (qy <= np.maximum(oy, py_))

    col = on_seg(bx0, by0, bx1, by1, ax0, ay0, d1) | on_seg(bx0, by0, bx1, by1, ax1, ay1, d2) | \
          on_seg(ax0, ay0, ax1, ay1, bx0, by0, d3) | on_seg(ax0, ay0, ax1, ay1, bx1, by1, d4)
    return general | col


def bboxes_intersect_polygon(lon0, lat0, lon1, lat1, poly) -> np.ndarray:
    """Which of N bboxes (cells) intersect one polygon — the cover-trim step
    (reference: `RDDUtils.java:158-183` trims insertion ids to cells actually
    intersecting the geometry).

    True iff: any bbox corner inside poly, OR any poly vertex inside bbox,
    OR any poly edge crosses any bbox edge.
    """
    lon0 = np.asarray(lon0, dtype=np.float64)
    lat0 = np.asarray(lat0, dtype=np.float64)
    lon1 = np.asarray(lon1, dtype=np.float64)
    lat1 = np.asarray(lat1, dtype=np.float64)
    vx, vy = poly_xy(poly)

    hit = np.zeros(lon0.shape, dtype=bool)
    # poly vertex inside bbox
    for k in range(len(vx)):
        hit |= (vx[k] >= lon0) & (vx[k] <= lon1) & (vy[k] >= lat0) & (vy[k] <= lat1)
    # bbox corner inside poly
    for cx, cy in ((lon0, lat0), (lon0, lat1), (lon1, lat0), (lon1, lat1)):
        hit |= point_in_polygon(cx, cy, poly)
    # edge crossings: each poly edge vs each of the 4 bbox edges
    j = len(vx) - 1
    for i in range(len(vx)):
        ex0, ey0, ex1, ey1 = vx[j], vy[j], vx[i], vy[i]
        m = ~hit
        if not m.any():
            break
        for bx0, by0, bx1, by1 in (
            (lon0, lat0, lon1, lat0),
            (lon1, lat0, lon1, lat1),
            (lon1, lat1, lon0, lat1),
            (lon0, lat1, lon0, lat0),
        ):
            hit |= _segments_intersect(ex0, ey0, ex1, ey1, bx0, by0, bx1, by1)
        j = i
    return hit


def planar_distance(ax, ay, bx, by) -> np.ndarray:
    """Euclidean distance in degree space — the join/kNN metric.

    Deliberately planar so the DuckDB oracle can reproduce it bit-for-bit
    with sqrt(dx*dx + dy*dy); haversine() exists for real deployments.
    """
    dx = np.asarray(ax, dtype=np.float64) - np.asarray(bx, dtype=np.float64)
    dy = np.asarray(ay, dtype=np.float64) - np.asarray(by, dtype=np.float64)
    return np.sqrt(dx * dx + dy * dy)


def haversine_km(ax, ay, bx, by) -> np.ndarray:
    """Great-circle distance in km (reference: orthodromic distance in
    `OrthodromicDistancePartitioner.java`)."""
    lon1, lat1, lon2, lat2 = (np.radians(np.asarray(v, dtype=np.float64)) for v in (ax, ay, bx, by))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    h = np.sin(dlat / 2) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2) ** 2
    return 2 * 6371.0088 * np.arcsin(np.sqrt(np.clip(h, 0, 1)))


def point_to_polygon_distance(px, py, poly) -> np.ndarray:
    """Min distance from N points to a polygon boundary (0 if inside)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    vx, vy = poly_xy(poly)
    best = np.full(px.shape, np.inf)
    j = len(vx) - 1
    for i in range(len(vx)):
        x0, y0, x1, y1 = vx[j], vy[j], vx[i], vy[i]
        dx, dy = x1 - x0, y1 - y0
        L2 = dx * dx + dy * dy
        if L2 == 0:
            t = np.zeros(px.shape)
        else:
            t = np.clip(((px - x0) * dx + (py - y0) * dy) / L2, 0.0, 1.0)
        cx = x0 + t * dx
        cy = y0 + t * dy
        best = np.minimum(best, np.hypot(px - cx, py - cy))
        j = i
    return np.where(point_in_polygon(px, py, poly), 0.0, best)


def point_to_ring_distance(px, py, poly) -> np.ndarray:
    """Min distance from N points to the polygon *boundary* (not 0 inside)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    vx, vy = poly_xy(poly)
    best = np.full(px.shape, np.inf)
    j = len(vx) - 1
    for i in range(len(vx)):
        x0, y0, x1, y1 = vx[j], vy[j], vx[i], vy[i]
        dx, dy = x1 - x0, y1 - y0
        L2 = dx * dx + dy * dy
        t = np.zeros(px.shape) if L2 == 0 else np.clip(
            ((px - x0) * dx + (py - y0) * dy) / L2, 0.0, 1.0
        )
        best = np.minimum(best, np.hypot(px - (x0 + t * dx), py - (y0 + t * dy)))
        j = i
    return best


def point_strictly_in_polygon(px, py, poly) -> np.ndarray:
    """Interior-only membership (the half-open ray cast counts left/bottom
    boundary as inside; touch/overlap semantics need the strict interior)."""
    return point_in_polygon(px, py, poly) & (point_to_ring_distance(px, py, poly) > 0)


def _poly_edges(poly) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    vx, vy = poly_xy(poly)
    return np.roll(vx, 1), np.roll(vy, 1), vx, vy


def polygons_edges_intersect(a, b) -> bool:
    """Any edge of ring a intersects any edge of ring b (mesh of the two
    edge sets through the vectorized segment test)."""
    ax0, ay0, ax1, ay1 = _poly_edges(a)
    bx0, by0, bx1, by1 = _poly_edges(b)
    n, m = len(ax0), len(bx0)
    ii, jj = np.meshgrid(np.arange(n), np.arange(m), indexing="ij")
    return bool(
        _segments_intersect(
            ax0[ii], ay0[ii], ax1[ii], ay1[ii],
            bx0[jj], by0[jj], bx1[jj], by1[jj],
        ).any()
    )


def polygons_intersect(a, b) -> bool:
    """Area-area intersects: any vertex containment either way, or any edge
    crossing (sufficient for simple rings)."""
    ax, ay = poly_xy(a)
    bx, by = poly_xy(b)
    if point_in_polygon(bx, by, a).any() or point_in_polygon(ax, ay, b).any():
        return True
    return polygons_edges_intersect(a, b)


def polygon_contains_polygon(a, b) -> bool:
    """a contains b: every vertex of b interior to a and no edge crossings
    (exact for simple rings)."""
    bx, by = poly_xy(b)
    if not point_in_polygon(bx, by, a).all():
        return False
    return not polygons_edges_intersect(a, b)


def polygons_equal(a, b) -> bool:
    """Ring equality up to rotation and direction."""
    va = np.asarray(a, dtype=np.float64).reshape(-1, 2)
    vb = np.asarray(b, dtype=np.float64).reshape(-1, 2)
    if len(va) != len(vb):
        return False
    for cand in (vb, vb[::-1]):
        starts = np.flatnonzero((cand == va[0]).all(axis=1))
        for s in starts:
            if np.array_equal(np.roll(cand, -s, axis=0), va):
                return True
    return False


def polygons_overlap(a, b) -> bool:
    """DE-9IM overlaps for areas: interiors intersect, neither contains the
    other, intersection has interior extent (edge crossing or mutual
    strict vertex containment)."""
    if polygon_contains_polygon(a, b) or polygon_contains_polygon(b, a):
        return False
    ax, ay = poly_xy(a)
    bx, by = poly_xy(b)
    some_inside = (
        point_strictly_in_polygon(bx, by, a).any()
        or point_strictly_in_polygon(ax, ay, b).any()
    )
    return some_inside or (
        polygons_edges_intersect(a, b) and _interior_probe_overlap(a, b)
    )


def _interior_probe_overlap(a, b) -> bool:
    """Edge-crossing rings without vertex containment: probe edge-midpoint
    neighborhoods of a for interior-of-b membership."""
    ax0, ay0, ax1, ay1 = _poly_edges(a)
    mx, my = (ax0 + ax1) / 2, (ay0 + ay1) / 2
    return bool(point_strictly_in_polygon(mx, my, b).any())


def polygons_touch(a, b) -> bool:
    """Boundaries meet but interiors do not (no vertex of either strictly
    inside the other, yet some edge contact exists)."""
    ax, ay = poly_xy(a)
    bx, by = poly_xy(b)
    if (
        point_strictly_in_polygon(bx, by, a).any()
        or point_strictly_in_polygon(ax, ay, b).any()
    ):
        return False
    return polygons_edges_intersect(a, b)


def _line_edges(line) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Open polyline [x0,y0,x1,y1,...] -> consecutive segment endpoints."""
    vx, vy = poly_xy(line)
    return vx[:-1], vy[:-1], vx[1:], vy[1:]


def _segments_properly_cross(ax0, ay0, ax1, ay1, bx0, by0, bx1, by1) -> np.ndarray:
    """Proper (interior-point) crossing only — excludes touch/collinear."""

    def orient(ox, oy, px_, py_, qx, qy):
        return (px_ - ox) * (qy - oy) - (py_ - oy) * (qx - ox)

    d1 = orient(bx0, by0, bx1, by1, ax0, ay0)
    d2 = orient(bx0, by0, bx1, by1, ax1, ay1)
    d3 = orient(ax0, ay0, ax1, ay1, bx0, by0)
    d4 = orient(ax0, ay0, ax1, ay1, bx1, by1)
    return (
        ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0))
        & (d1 != 0) & (d2 != 0) & (d3 != 0) & (d4 != 0)
    )


def line_crosses_polygon(line, poly) -> bool:
    """DE-9IM crosses for line/area: the line has points in the polygon's
    interior AND exterior.  Exact for the generic cases: a proper crossing
    of any boundary edge, or vertices strictly on both sides."""
    lx0, ly0, lx1, ly1 = _line_edges(line)
    px0, py0, px1, py1 = _poly_edges(poly)
    n, m = len(lx0), len(px0)
    ii, jj = np.meshgrid(np.arange(n), np.arange(m), indexing="ij")
    if _segments_properly_cross(
        lx0[ii], ly0[ii], lx1[ii], ly1[ii],
        px0[jj], py0[jj], px1[jj], py1[jj],
    ).any():
        return True
    vx, vy = poly_xy(line)
    inside = point_strictly_in_polygon(vx, vy, poly)
    on_b = point_to_ring_distance(vx, vy, poly) == 0
    return bool(inside.any() and (~inside & ~on_b).any())


def line_intersects_polygon(line, poly) -> bool:
    """Line touches or enters the polygon (closed-region semantics)."""
    vx, vy = poly_xy(line)
    if point_in_polygon(vx, vy, poly).any() or (
        point_to_ring_distance(vx, vy, poly) == 0
    ).any():
        return True
    lx0, ly0, lx1, ly1 = _line_edges(line)
    px0, py0, px1, py1 = _poly_edges(poly)
    n, m = len(lx0), len(px0)
    ii, jj = np.meshgrid(np.arange(n), np.arange(m), indexing="ij")
    return bool(
        _segments_intersect(
            lx0[ii], ly0[ii], lx1[ii], ly1[ii],
            px0[jj], py0[jj], px1[jj], py1[jj],
        ).any()
    )


def line_within_polygon(line, poly) -> bool:
    """Every vertex inside (closed) and no boundary crossing."""
    vx, vy = poly_xy(line)
    closed_in = point_in_polygon(vx, vy, poly) | (
        point_to_ring_distance(vx, vy, poly) == 0
    )
    if not closed_in.all():
        return False
    lx0, ly0, lx1, ly1 = _line_edges(line)
    px0, py0, px1, py1 = _poly_edges(poly)
    n, m = len(lx0), len(px0)
    ii, jj = np.meshgrid(np.arange(n), np.arange(m), indexing="ij")
    return not _segments_properly_cross(
        lx0[ii], ly0[ii], lx1[ii], ly1[ii],
        px0[jj], py0[jj], px1[jj], py1[jj],
    ).any()


def lines_cross(a, b) -> bool:
    """DE-9IM crosses for line/line: a proper interior crossing point."""
    ax0, ay0, ax1, ay1 = _line_edges(a)
    bx0, by0, bx1, by1 = _line_edges(b)
    n, m = len(ax0), len(bx0)
    ii, jj = np.meshgrid(np.arange(n), np.arange(m), indexing="ij")
    return bool(
        _segments_properly_cross(
            ax0[ii], ay0[ii], ax1[ii], ay1[ii],
            bx0[jj], by0[jj], bx1[jj], by1[jj],
        ).any()
    )


def lines_intersect(a, b) -> bool:
    ax0, ay0, ax1, ay1 = _line_edges(a)
    bx0, by0, bx1, by1 = _line_edges(b)
    n, m = len(ax0), len(bx0)
    ii, jj = np.meshgrid(np.arange(n), np.arange(m), indexing="ij")
    return bool(
        _segments_intersect(
            ax0[ii], ay0[ii], ax1[ii], ay1[ii],
            bx0[jj], by0[jj], bx1[jj], by1[jj],
        ).any()
    )


def point_to_line_distance(px, py, line) -> np.ndarray:
    """Min distance from N points to an open polyline."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    x0s, y0s, x1s, y1s = _line_edges(line)
    best = np.full(px.shape, np.inf)
    for x0, y0, x1, y1 in zip(x0s, y0s, x1s, y1s):
        dx, dy = x1 - x0, y1 - y0
        L2 = dx * dx + dy * dy
        t = np.zeros(px.shape) if L2 == 0 else np.clip(
            ((px - x0) * dx + (py - y0) * dy) / L2, 0.0, 1.0
        )
        best = np.minimum(best, np.hypot(px - (x0 + t * dx), py - (y0 + t * dy)))
    return best


def regular_polygon(cx: float, cy: float, radius: float, sides: int, phase: float = 0.0) -> np.ndarray:
    """Deterministic test-polygon factory (flat [x,y,...] ring)."""
    ang = phase + 2 * np.pi * np.arange(sides) / sides
    return np.stack([cx + radius * np.cos(ang), cy + radius * np.sin(ang)], axis=1).ravel()
