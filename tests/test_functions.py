"""Geometry SQL function surface truth tables (reference analog:
`core/geotime/src/test/.../store/query/SpatialQueryTest.java:27-80` and the
UDF registry `UDFRegistrySPI.java:15-27`)."""

import numpy as np
import pytest

from geowave_spark.functions.register import register_geometry_functions
from geowave_spark.geom import core as geom
from geowave_spark.geom import wkt as wktm
from geowave_spark.plans import sqlrewrite

SQUARE = wktm.polygon_wkt(np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float))
SQUARE_FAR = wktm.polygon_wkt(np.array([[20, 20], [30, 20], [30, 30], [20, 30]], float))
SQUARE_OVERLAP = wktm.polygon_wkt(np.array([[5, 5], [15, 5], [15, 15], [5, 15]], float))
SQUARE_INNER = wktm.polygon_wkt(np.array([[2, 2], [8, 2], [8, 8], [2, 8]], float))
SQUARE_TOUCH = wktm.polygon_wkt(np.array([[10, 0], [20, 0], [20, 10], [10, 10]], float))


@pytest.fixture(scope="module")
def geomf(spark):
    register_geometry_functions(spark)
    return spark


def _one(spark, expr: str):
    return spark.sql(f"SELECT {expr} AS v").collect()[0]["v"]


def test_point_polygon_truth_table(geomf):
    inside = "GeomPoint(5.0, 5.0)"
    outside = "GeomPoint(50.0, 50.0)"
    assert _one(geomf, f"GeomWithin({inside}, '{SQUARE}')")
    assert not _one(geomf, f"GeomWithin({outside}, '{SQUARE}')")
    assert _one(geomf, f"GeomContains('{SQUARE}', {inside})")
    assert _one(geomf, f"GeomIntersects({inside}, '{SQUARE}')")
    assert _one(geomf, f"GeomDisjoint({outside}, '{SQUARE}')")
    assert not _one(geomf, f"GeomDisjoint({inside}, '{SQUARE}')")
    # boundary point: touches, not within
    assert _one(geomf, f"GeomTouches(GeomPoint(10.0, 5.0), '{SQUARE}')")


def test_polygon_polygon_truth_table(geomf):
    assert _one(geomf, f"GeomIntersects('{SQUARE}', '{SQUARE_OVERLAP}')")
    assert _one(geomf, f"GeomOverlaps('{SQUARE}', '{SQUARE_OVERLAP}')")
    assert _one(geomf, f"GeomDisjoint('{SQUARE}', '{SQUARE_FAR}')")
    assert _one(geomf, f"GeomContains('{SQUARE}', '{SQUARE_INNER}')")
    assert _one(geomf, f"GeomWithin('{SQUARE_INNER}', '{SQUARE}')")
    assert _one(geomf, f"GeomEquals('{SQUARE}', '{SQUARE}')")
    assert not _one(geomf, f"GeomEquals('{SQUARE}', '{SQUARE_INNER}')")
    assert _one(geomf, f"GeomTouches('{SQUARE}', '{SQUARE_TOUCH}')")
    assert not _one(geomf, f"GeomOverlaps('{SQUARE}', '{SQUARE_INNER}')")
    # edge-sharing squares touch but do not overlap
    assert not _one(geomf, f"GeomOverlaps('{SQUARE}', '{SQUARE_TOUCH}')")
    assert not _one(geomf, f"GeomTouches('{SQUARE}', '{SQUARE_OVERLAP}')")


def test_distance_and_within_distance(geomf):
    d = _one(geomf, "GeomDistance(GeomPoint(0.0, 0.0), 'POINT (3.0 4.0)')")
    assert abs(d - 5.0) < 1e-12
    d2 = _one(geomf, f"GeomDistance(GeomPoint(15.0, 5.0), '{SQUARE}')")
    assert abs(d2 - 5.0) < 1e-12
    assert _one(geomf, "GeomWithinDistance(GeomPoint(0.0, 0.0), 'POINT (3.0 4.0)', 5.0)")
    assert not _one(geomf, "GeomWithinDistance(GeomPoint(0.0, 0.0), 'POINT (3.0 4.0)', 4.9)")


def test_prefilter_rewrite_preserves_semantics(geomf):
    """The injected cell prefilter must not change results (cover superset)."""
    ring = geom.regular_polygon(20.0, 10.0, 25.0, 6, phase=0.3).reshape(-1, 2)
    poly = wktm.polygon_wkt(ring)
    base = f"""
        SELECT count(*) AS n FROM (
          SELECT id * 1.7 - 150 AS lon, id * 0.9 - 80 AS lat FROM range(0, 150)
        ) WHERE GeomWithin(GeomPoint(lon, lat), '{poly}')
    """
    plain = sqlrewrite.spatial_sql(geomf, base, optimize=False).collect()[0]["n"]
    opt = sqlrewrite.spatial_sql(geomf, base, optimize=True, res=6).collect()[0]["n"]
    assert plain == opt
    # and the rewrite actually injected an IN-list
    rewritten = sqlrewrite.inject_cell_prefilter(base, res=6)
    assert " IN (" in rewritten


def test_geom_from_wkt_canonicalizes(geomf):
    got = _one(geomf, "GeomFromWKT('POINT(3.5  -2.25)')")
    assert got == "POINT (3.5 -2.25)"
    sq = _one(geomf, f"GeomFromWKT('{SQUARE}')")
    assert sq == SQUARE
    assert _one(
        geomf, f"GeomIntersects(GeomFromWKT('POINT(5 5)'), '{SQUARE}')"
    ) is True


def test_wkt_roundtrip():
    ring = np.array([[1.5, 2.5], [3.5, 2.5], [2.5, 4.0]], float)
    assert np.allclose(wktm.parse_polygon(wktm.polygon_wkt(ring)), ring)
    lon, lat = wktm.parse_point(wktm.point_wkt(-3.25, 7.5))
    assert (lon, lat) == (-3.25, 7.5)


LINE_CHORD = "LINESTRING (-5.0 5.0, 15.0 5.0)"       # enters and exits SQUARE
LINE_INSIDE = "LINESTRING (2.0 2.0, 8.0 8.0)"         # fully interior
LINE_OUTSIDE = "LINESTRING (20.0 20.0, 30.0 25.0)"    # disjoint from SQUARE
LINE_TOUCH = "LINESTRING (10.0 2.0, 10.0 8.0)"        # runs along the boundary
LINE_A = "LINESTRING (0.0 0.0, 10.0 10.0)"
LINE_B = "LINESTRING (0.0 10.0, 10.0 0.0)"            # crosses LINE_A
LINE_C = "LINESTRING (20.0 0.0, 30.0 10.0)"           # disjoint from LINE_A


def test_linestring_polygon_predicates(geomf):
    assert _one(geomf, f"GeomCrosses('{LINE_CHORD}', '{SQUARE}')")
    assert not _one(geomf, f"GeomCrosses('{LINE_INSIDE}', '{SQUARE}')")
    assert not _one(geomf, f"GeomCrosses('{LINE_OUTSIDE}', '{SQUARE}')")
    assert _one(geomf, f"GeomWithin('{LINE_INSIDE}', '{SQUARE}')")
    assert not _one(geomf, f"GeomWithin('{LINE_CHORD}', '{SQUARE}')")
    assert _one(geomf, f"GeomIntersects('{LINE_CHORD}', '{SQUARE}')")
    assert _one(geomf, f"GeomIntersects('{LINE_TOUCH}', '{SQUARE}')")
    assert _one(geomf, f"GeomDisjoint('{LINE_OUTSIDE}', '{SQUARE}')")
    assert _one(geomf, f"GeomContains('{SQUARE}', '{LINE_INSIDE}')")


def test_linestring_linestring_predicates(geomf):
    assert _one(geomf, f"GeomCrosses('{LINE_A}', '{LINE_B}')")
    assert _one(geomf, f"GeomIntersects('{LINE_A}', '{LINE_B}')")
    assert _one(geomf, f"GeomDisjoint('{LINE_A}', '{LINE_C}')")
    assert not _one(geomf, f"GeomCrosses('{LINE_A}', '{LINE_C}')")


def test_point_linestring_distance(geomf):
    d = _one(geomf, f"GeomDistance(GeomPoint(5.0, 10.0), '{LINE_A}')")
    import math
    assert abs(d - 5.0 / math.sqrt(2)) < 1e-12
    assert _one(geomf, f"GeomIntersects(GeomPoint(5.0, 5.0), '{LINE_A}')")
    assert _one(geomf, f"GeomDisjoint(GeomPoint(5.0, 10.0), '{LINE_A}')")
    # crosses undefined for point/point and area/area -> false
    assert not _one(geomf, f"GeomCrosses('{SQUARE}', '{SQUARE_OVERLAP}')")
    assert not _one(geomf, "GeomCrosses(GeomPoint(1.0, 1.0), GeomPoint(1.0, 1.0))")


def test_within_distance_rewrite_fires_and_preserves_results(spark, sf_dir):
    """Radius extraction (`SqlQueryRunner.java:164-245` parity): the
    GeomWithinDistance predicate gains a closed-form grid-disk IN-list
    prefilter, and the optimized result equals the brute (UDF-only) one."""
    from geowave_spark.plans import sqlrewrite
    from geowave_spark.table import geo
    from geowave_spark.table.views import register_views

    register_views(spark, sf_dir)
    sql = f"""
        WITH p AS ({geo.events_points_sql()})
        SELECT eid FROM p
        WHERE GeomWithinDistance(GeomPoint(lon, lat), 'POINT (-40.25 12.75)', 6.5)
    """
    rewritten = sqlrewrite.inject_cell_prefilter(sql, res=6)
    assert " IN (" in rewritten and "GeomWithinDistance" in rewritten
    fast = sqlrewrite.spatial_sql(spark, sql, optimize=True, res=6)
    slow = sqlrewrite.spatial_sql(spark, sql, optimize=False)
    assert fast.exceptAll(slow).isEmpty() and slow.exceptAll(fast).isEmpty()
    assert fast.count() > 0


def test_geojsonl_ingest_roundtrip(spark, tmp_path):
    """GeoJSONL vector ingest: distributed parse -> WKT usable by the
    Geom* surface and the polygon join (extensions/formats/geojson
    analog)."""
    import json as _json

    from geowave_spark.geom import core as gcore
    from geowave_spark.geom import wkt as wktm
    from geowave_spark.table import geojson

    feats = [
        {"type": "Feature",
         "geometry": {"type": "Point", "coordinates": [1.5, 2.5]},
         "properties": {"name": "a"}},
        {"type": "Feature",
         "geometry": {"type": "Polygon",
                      "coordinates": [
                          [[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]],
                          [[3, 3], [7, 3], [7, 7], [3, 7], [3, 3]]]},
         "properties": {"name": "holed"}},
        {"type": "Feature",
         "geometry": {"type": "MultiPolygon",
                      "coordinates": [
                          [[[20, 20], [24, 20], [22, 23], [20, 20]]],
                          [[[30, 30], [34, 30], [32, 33], [30, 30]]]]},
         "properties": {"name": "multi"}},
        {"type": "Feature",
         "geometry": {"type": "LineString",
                      "coordinates": [[0, 0], [5, 5], [10, 0]]},
         "properties": {}},
    ]
    p = tmp_path / "feats.geojsonl"
    p.write_text("\n".join(_json.dumps(f) for f in feats) + "\n")

    df = geojson.read_geojsonl(spark, str(p)).toPandas().sort_values("geom_type")
    assert sorted(df["geom_type"]) == ["linestring", "multipolygon", "point", "polygon"]
    holed = df.loc[df["geom_type"] == "polygon", "geom_wkt"].iloc[0]
    rings = wktm.parse_polygon_rings(holed)
    assert len(rings) == 2
    # hole center excluded, band included — even-odd semantics survive the trip
    import numpy as np
    assert not gcore.point_in_rings(np.array([5.0]), np.array([5.0]), list(rings))[0]
    assert gcore.point_in_rings(np.array([1.0]), np.array([1.0]), list(rings))[0]
    # FeatureCollection path agrees with the line path
    fc = tmp_path / "feats.geojson"
    fc.write_text(_json.dumps({"type": "FeatureCollection", "features": feats}))
    df2 = geojson.read_geojson(spark, str(fc)).toPandas()
    assert sorted(df2["geom_wkt"]) == sorted(df["geom_wkt"])


def test_geojsonl_export_roundtrip(spark, tmp_path):
    """write_geojsonl is the inverse of read_geojsonl for every geometry
    type (reference analog: per-mapper vector export,
    `VectorMRExportJobRunner.java`)."""
    import json as _json

    from geowave_spark.table import geojson

    wkts = [
        ("point", "POINT (1.5 2.5)"),
        ("multipoint", "MULTIPOINT (1.0 2.0, 3.0 4.0)"),
        ("linestring", "LINESTRING (0.0 0.0, 1.0 1.0, 2.0 0.5)"),
        ("multilinestring",
         "MULTILINESTRING ((0.0 0.0, 1.0 0.0), (5.0 5.0, 6.0 6.0))"),
        ("polygon",
         "POLYGON ((0.0 0.0, 4.0 0.0, 4.0 4.0, 0.0 4.0, 0.0 0.0), "
         "(1.0 1.0, 1.0 2.0, 2.0 2.0, 2.0 1.0, 1.0 1.0))"),
        ("multipolygon",
         "MULTIPOLYGON (((10.0 10.0, 12.0 10.0, 12.0 12.0, 10.0 10.0)), "
         "((20.0 20.0, 22.0 20.0, 22.0 22.0, 20.0 20.0)))"),
    ]
    # pure round trip: wkt -> geometry dict -> wkt
    for t, w in wkts:
        t2, w2 = geojson.feature_to_wkt(geojson.wkt_to_geometry(w))
        assert (t2, w2) == (t, w)

    df = spark.createDataFrame(
        [(w, _json.dumps({"k": i})) for i, (_, w) in enumerate(wkts)],
        "geom_wkt string, properties string")
    out = str(tmp_path / "export")
    geojson.write_geojsonl(df, out)
    back = geojson.read_geojsonl(spark, out).toPandas()
    assert sorted(back["geom_wkt"]) == sorted(w for _, w in wkts)
    ks = sorted(_json.loads(p)["k"] for p in back["properties"])
    assert ks == list(range(6))
