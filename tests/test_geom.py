"""Geometry predicate truth tables (reference analog:
`core/geotime/src/test/.../store/query/SpatialQueryTest.java:27-80`)."""

import numpy as np

from geowave_spark.geom import core as g


SQUARE = np.array([0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0])  # flat ring
CONCAVE = np.array([0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 5.0, 5.0, 0.0, 10.0])


def test_point_in_polygon_square():
    px = np.array([5.0, -1.0, 15.0, 5.0])
    py = np.array([5.0, 5.0, 5.0, -2.0])
    np.testing.assert_array_equal(g.point_in_polygon(px, py, SQUARE), [True, False, False, False])


def test_point_in_polygon_concave():
    # the notch at (5, 7) is outside the concave polygon
    px = np.array([5.0, 2.0, 8.0])
    py = np.array([7.0, 2.0, 2.0])
    np.testing.assert_array_equal(g.point_in_polygon(px, py, CONCAVE), [False, True, True])


def test_bbox_intersects_polygon_cases():
    # fully inside, overlapping edge, fully outside, bbox containing polygon,
    # crossing without any vertex containment (thin sliver)
    lon0 = np.array([2.0, 8.0, 20.0, -5.0, -1.0])
    lat0 = np.array([2.0, 8.0, 20.0, -5.0, 4.0])
    lon1 = np.array([3.0, 12.0, 21.0, 15.0, 11.0])
    lat1 = np.array([3.0, 12.0, 21.0, 15.0, 6.0])
    got = g.bboxes_intersect_polygon(lon0, lat0, lon1, lat1, SQUARE)
    np.testing.assert_array_equal(got, [True, True, False, True, True])


def test_point_to_polygon_distance():
    px = np.array([5.0, 15.0, -3.0])
    py = np.array([5.0, 5.0, 0.0])
    d = g.point_to_polygon_distance(px, py, SQUARE)
    np.testing.assert_allclose(d, [0.0, 5.0, 3.0])


def test_planar_and_haversine():
    assert g.planar_distance(0, 0, 3, 4) == 5.0
    # quarter of the equator
    np.testing.assert_allclose(g.haversine_km(0, 0, 90, 0), 6371.0088 * np.pi / 2, rtol=1e-6)


def test_regular_polygon_closed_ring_area_sign():
    p = g.regular_polygon(0, 0, 1, 8)
    x, y = g.poly_xy(p)
    assert len(x) == 8
    inside = g.point_in_polygon(np.array([0.0]), np.array([0.0]), p)
    assert inside[0]


def test_point_in_polygons_batch_matches_scalar_kernel():
    """The padded-matrix batch kernel must agree bit-for-bit with the
    per-polygon ray-cast on mixed polygons of different vertex counts,
    including points on edges/vertices and far outside."""
    rng = np.random.RandomState(7)
    polys = {
        3: g.regular_polygon(10, 5, 4.0, 5),
        8: g.regular_polygon(-20, -10, 7.0, 12, phase=0.3),
        11: np.array([0, 0, 10, 0, 10, 10, 5, 3, 0, 10], dtype=float),  # concave
        40: g.regular_polygon(100, 40, 2.0, 3),
    }
    n = 5000
    px = rng.uniform(-40, 120, n)
    py = rng.uniform(-30, 60, n)
    ids = np.array(sorted(polys))
    poly_id = ids[rng.randint(0, len(ids), n)]
    # sprinkle exact vertices (boundary half-open semantics must agree too)
    for k, p in polys.items():
        vx, vy = g.poly_xy(p)
        px[:len(vx)] = vx
        py[:len(vy)] = vy
        poly_id[:len(vx)] = k

    ids_sorted, vx_pad, vy_pad, nv = g.pack_polygons(polys)
    rows = np.searchsorted(ids_sorted, poly_id)
    batch = g.point_in_polygons(px, py, rows, vx_pad, vy_pad, nv)

    expect = np.zeros(n, dtype=bool)
    for k, p in polys.items():
        m = poly_id == k
        expect[m] = g.point_in_polygon(px[m], py[m], p)
    assert (batch == expect).all()
