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

    ids_sorted, eax, eay, ebx, eby = g.pack_polygons(polys)
    rows = np.searchsorted(ids_sorted, poly_id)
    batch = g.point_in_polygons(px, py, rows, eax, eay, ebx, eby)

    expect = np.zeros(n, dtype=bool)
    for k, p in polys.items():
        m = poly_id == k
        expect[m] = g.point_in_polygon(px[m], py[m], p)
    assert (batch == expect).all()


class TestMultiRingGeometries:
    """Holed-polygon / MultiPolygon truth tables (mirrors the reference's
    SpatialQueryTest coverage of the full JTS geometry surface,
    core/geotime/src/test/.../SpatialQueryTest.java:27-80)."""

    HOLED = [
        np.asarray([0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0]),   # shell
        np.asarray([3.0, 3.0, 7.0, 3.0, 7.0, 7.0, 3.0, 7.0]),       # hole
    ]
    MULTI = [
        np.asarray([0.0, 0.0, 4.0, 0.0, 2.0, 3.0]),
        np.asarray([10.0, 10.0, 14.0, 10.0, 12.0, 13.0]),
    ]

    def test_point_in_rings_even_odd(self):
        px = np.array([1.0, 5.0, 11.0, 5.0])
        py = np.array([1.0, 5.0, 5.0, 9.0])
        # in shell / in hole / outside / in shell above hole
        assert g.point_in_rings(px, py, self.HOLED).tolist() == [
            True, False, False, True]

    def test_point_in_rings_multipolygon(self):
        px = np.array([2.0, 12.0, 7.0])
        py = np.array([1.0, 11.0, 7.0])
        assert g.point_in_rings(px, py, self.MULTI).tolist() == [
            True, True, False]

    def test_distance_zero_only_in_interior(self):
        d = g.point_to_polygon_distance(
            np.array([5.0, 1.0]), np.array([5.0, 1.0]), self.HOLED)
        assert d[1] == 0.0 and d[0] > 0.0  # hole center is OUTSIDE

    def test_contains_respects_holes(self):
        inner = np.asarray([4.0, 4.0, 6.0, 4.0, 6.0, 6.0, 4.0, 6.0])
        ring_band = np.asarray([1.0, 1.0, 2.0, 1.0, 2.0, 2.0, 1.0, 2.0])
        # square inside the hole: not contained, not intersecting
        assert not g.polygon_contains_polygon(self.HOLED, inner)
        assert not g.polygons_intersect(self.HOLED, inner)
        # square inside the solid band: contained
        assert g.polygon_contains_polygon(self.HOLED, ring_band)
        # shell-sized square is NOT contained by the holed polygon
        big = np.asarray([0.5, 0.5, 9.5, 0.5, 9.5, 9.5, 0.5, 9.5])
        assert not g.polygon_contains_polygon(self.HOLED, big)
        # ...but it does intersect
        assert g.polygons_intersect(self.HOLED, big)

    def test_cover_classify_ring_aware(self):
        # a cell fully inside the hole neither intersects nor is within
        inter = g.bboxes_intersect_polygon(
            [4.0, 1.0, 20.0], [4.0, 1.0, 20.0], [6.0, 2.0, 21.0],
            [6.0, 2.0, 21.0], self.HOLED)
        assert inter.tolist() == [False, True, False]
        within = g.bboxes_within_polygon(
            [4.0, 1.0], [4.0, 1.0], [6.0, 2.0], [6.0, 2.0], self.HOLED)
        assert within.tolist() == [False, True]

    def test_wkt_roundtrip_holes_and_multi(self):
        from geowave_spark.geom import wkt as wktm

        w = wktm.polygon_wkt_holes(self.HOLED)
        rings = wktm.parse_polygon_rings(w)
        assert len(rings) == 2 and wktm.geom_type(w) == "polygon"
        assert g.polygons_equal(list(rings), self.HOLED)
        mw = wktm.multipolygon_wkt(self.MULTI)
        mrings = wktm.parse_polygon_rings(mw)
        assert len(mrings) == 2 and wktm.geom_type(mw) == "polygon"
        assert g.polygons_equal(list(mrings), self.MULTI)

    def test_edge_kernel_matches_ring_kernel(self):
        rng = np.random.default_rng(3)
        px = rng.uniform(-2, 16, 500)
        py = rng.uniform(-2, 16, 500)
        for gm in (self.HOLED, self.MULTI):
            ids, eax, eay, ebx, eby = g.pack_polygons({0: gm, 1: self.HOLED})
            rows = np.zeros(len(px), dtype=np.int64)
            batch = g.point_in_polygons(px, py, rows, eax, eay, ebx, eby)
            assert (batch == g.point_in_rings(px, py, gm)).all()
