"""CQL filter compilation (plans/cql.py) — grammar coverage, error
handling, and end-to-end equivalence with hand-written SQL.

Mirrors the reference's CQL surface tests: the visitor coverage of
`core/geotime/.../CQLToGeoWaveFilterVisitor.java` and the constraint
extraction of `OptimalCQLQuery.java` (in /root/reference).
"""

import pytest

from geowave_spark.plans.cql import CQLError, cql_to_sql

GM = {"geom": "GeomPoint(lon, lat)"}


def test_scalar_predicates_compile():
    s = cql_to_sql("a = 5 AND b <> 'x''y' OR NOT c >= 1.5e3", GM)
    assert "(a = 5)" in s and "(b <> 'x''y')" in s and "(c >= 1.5e3)" in s
    assert " OR " in s and " AND " in s and "NOT" in s


def test_between_like_in_null():
    s = cql_to_sql(
        "v BETWEEN 1 AND 2 AND t LIKE 'p%' AND u IN (1, 2, 3) "
        "AND w IS NOT NULL AND x IS NULL AND y NOT IN ('a')", GM)
    assert "(v BETWEEN 1 AND 2)" in s
    assert "(t LIKE 'p%')" in s
    assert "(u IN (1, 2, 3))" in s
    assert "(w IS NOT NULL)" in s
    assert "(x IS NULL)" in s
    assert "(NOT (y IN ('a')))" in s


def test_include_exclude():
    assert cql_to_sql("INCLUDE", GM) == "true"
    assert cql_to_sql("EXCLUDE", GM) == "false"


def test_bbox_becomes_polygon_intersects():
    s = cql_to_sql("BBOX(geom, -10, -5, 10, 5)", GM)
    assert s.startswith("GeomIntersects(GeomPoint(lon, lat), 'POLYGON((")
    assert "-10.0 -5.0" in s and "10.0 5.0" in s


def test_spatial_predicates_and_wkt_literals():
    s = cql_to_sql(
        "INTERSECTS(geom, POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))) "
        "AND WITHIN(geom, POLYGON((0 0, 9 0, 9 9, 0 9, 0 0)))", GM)
    assert "GeomIntersects(GeomPoint(lon, lat), 'POLYGON((0 0," in s
    assert "GeomWithin(GeomPoint(lon, lat), 'POLYGON((0 0, 9 0," in s


def test_dwithin_units():
    assert cql_to_sql("DWITHIN(geom, POINT(1 2), 3.5, degrees)", GM) == \
        "GeomWithinDistance(GeomPoint(lon, lat), 'POINT(1 2)', 3.5)"
    assert cql_to_sql("DWITHIN(geom, POINT(1 2), 5000, meters)", GM) == \
        "GeodesicWithinDistance(GeomPoint(lon, lat), 'POINT(1 2)', 5.0)"
    assert cql_to_sql("DWITHIN(geom, POINT(1 2), 5, kilometers)", GM) == \
        "GeodesicWithinDistance(GeomPoint(lon, lat), 'POINT(1 2)', 5.0)"
    with pytest.raises(CQLError):
        cql_to_sql("DWITHIN(geom, POINT(1 2), 5, feet)", GM)


def test_temporal_predicates():
    s = cql_to_sql(
        "ts AFTER '2024-01-01 00:00:00' AND ts BEFORE '2024-02-01 00:00:00' "
        "AND ts DURING '2024-01-05 00:00:00', '2024-01-06 00:00:00'", GM)
    assert "(ts > TIMESTAMP '2024-01-01 00:00:00')" in s
    assert "(ts < TIMESTAMP '2024-02-01 00:00:00')" in s
    assert ("(ts >= TIMESTAMP '2024-01-05 00:00:00' AND "
            "ts <= TIMESTAMP '2024-01-06 00:00:00')") in s


def test_errors():
    with pytest.raises(CQLError):
        cql_to_sql("BBOX(nogeom, 0, 0, 1, 1)", GM)  # unmapped attribute
    with pytest.raises(CQLError):
        cql_to_sql("a = ", GM)  # missing literal
    with pytest.raises(CQLError):
        cql_to_sql("a = 1 extra_tokens_here 5 5", GM)  # trailing junk
    with pytest.raises(CQLError):
        cql_to_sql("INTERSECTS(geom, POLYGON((0 0, 1 1)", GM)  # unbalanced


def test_precedence_not_binds_tighter_than_and_or():
    s = cql_to_sql("NOT a = 1 AND b = 2 OR c = 3", GM)
    # ((NOT (a=1)) AND (b=2)) OR (c=3)
    assert s == "(((NOT (a = 1)) AND (b = 2)) OR (c = 3))"


def test_end_to_end_matches_plain_sql(spark):
    """Compiled CQL over a real DataFrame == the equivalent hand-written
    predicate, including the spatial part via the Geom* UDFs."""
    from geowave_spark.plans.sqlrewrite import spatial_sql

    df = spark.range(500).selectExpr(
        "id",
        "cast(pmod(id * 37, 360) - 180 as double) AS lon",
        "cast(pmod(id * 53, 160) - 80 as double) AS lat",
        "cast(id % 97 as double) AS value",
        "CASE WHEN id % 3 = 0 THEN 'click' ELSE 'view' END AS event_type",
    )
    df.createOrReplaceTempView("cql_pts")
    pred = cql_to_sql(
        "(BBOX(geom, -60, -40, 80, 40) AND value BETWEEN 10 AND 80) "
        "OR (event_type LIKE 'cl%' AND NOT value IN (3, 6, 9))", GM)
    got = spatial_sql(
        spark, f"SELECT id FROM cql_pts WHERE {pred} ORDER BY id",
        optimize=True, res=5,
    ).toPandas()["id"].tolist()
    exp = spark.sql("""
        SELECT id FROM cql_pts
        WHERE (lon >= -60 AND lon <= 80 AND lat >= -40 AND lat <= 40
               AND value BETWEEN 10 AND 80)
           OR (event_type LIKE 'cl%' AND NOT value IN (3, 6, 9))
        ORDER BY id
    """).toPandas()["id"].tolist()
    assert got == exp and len(got) > 0
