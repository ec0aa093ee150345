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
