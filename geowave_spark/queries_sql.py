"""SQL-surface queries (q31-q32): the Geom* UDF registry + the
SqlQueryRunner-style cover-prefilter rewrite, each with a DuckDB oracle.

The polygon literal is a CCW convex hexagon so the oracle can express
point-in-polygon as half-plane sign tests (geo.convex_inside_sql); the
engine side runs the REAL surface — registered pandas-UDF predicate behind
an injected closed-form cell prefilter (plans/sqlrewrite.py).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from .geom import core as geom
from .geom import wkt as wktm
from .plans import sqlrewrite
from .table import geo
from .table.views import register_views

HEX_RING = geom.regular_polygon(20.0, 10.0, 25.0, 6, phase=0.3).reshape(-1, 2)
HEX_WKT = wktm.polygon_wkt(HEX_RING)

QUERY_POINT = (-40.25, 12.75)


def q31_sql_geom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark SQL with GeomWithin(GeomPoint(...), 'POLYGON...') — rewritten to
    cell-prefilter + UDF refine (SqlQueryRunner parity)."""
    register_views(spark, sf_dir)
    sql = f"""
        WITH p AS ({geo.events_points_sql()})
        SELECT event_type,
               cast(count(*) as bigint) AS n,
               cast(sum(cast(round(value * 100) as bigint)) as bigint) AS sum_cents
        FROM p
        WHERE GeomWithin(GeomPoint(lon, lat), '{HEX_WKT}')
        GROUP BY event_type ORDER BY event_type
    """
    return sqlrewrite.spatial_sql(spark, sql, optimize=True, res=6)


Q31_SQL = f"""
WITH p AS ({geo.events_points_sql()})
SELECT event_type,
       cast(count(*) as bigint) AS n,
       cast(sum(cast(round(value * 100) as bigint)) as bigint) AS sum_cents
FROM p
WHERE {geo.convex_inside_sql(HEX_RING, 'lon', 'lat')}
GROUP BY event_type ORDER BY event_type
"""


def q32_sql_geom_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GeomDistance over the SQL surface: nearest-event distance per type to
    a fixed query point (pandas-UDF distance, integerized)."""
    register_views(spark, sf_dir)
    qx, qy = QUERY_POINT
    sql = f"""
        WITH p AS ({geo.events_points_sql()})
        SELECT event_type,
               min(cast(floor(GeomDistance(GeomPoint(lon, lat),
                                           'POINT ({qx!r} {qy!r})') * 1000000) as bigint))
                 AS min_dist_micro
        FROM p GROUP BY event_type ORDER BY event_type
    """
    return sqlrewrite.spatial_sql(spark, sql, optimize=False)


Q32_SQL = f"""
WITH p AS ({geo.events_points_sql()})
SELECT event_type,
       min(cast(floor(sqrt((lon - {QUERY_POINT[0]!r}) * (lon - {QUERY_POINT[0]!r})
                         + (lat - {QUERY_POINT[1]!r}) * (lat - {QUERY_POINT[1]!r})) * 1000000) as bigint))
         AS min_dist_micro
FROM p GROUP BY event_type ORDER BY event_type
"""


def q51_sql_within_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GeomWithinDistance over the SQL surface WITH the radius-extraction
    rewrite: the injected grid-disk IN-list prefilter (closed-form, codegen)
    gates the pandas-UDF exact test — `SqlQueryRunner.java:164-245` distance
    parity.  tests/test_functions.py asserts the rewrite fires and the
    optimized result equals the unoptimized one."""
    register_views(spark, sf_dir)
    qx, qy = QUERY_POINT
    sql = f"""
        WITH p AS ({geo.events_points_sql()})
        SELECT event_type,
               cast(count(*) as bigint) AS n,
               cast(sum(cast(round(value * 100) as bigint)) as bigint) AS sum_cents
        FROM p
        WHERE GeomWithinDistance(GeomPoint(lon, lat), 'POINT ({qx!r} {qy!r})', 6.5)
        GROUP BY event_type ORDER BY event_type
    """
    return sqlrewrite.spatial_sql(spark, sql, optimize=True, res=6)


Q51_SQL = f"""
WITH p AS ({geo.events_points_sql()})
SELECT event_type,
       cast(count(*) as bigint) AS n,
       cast(sum(cast(round(value * 100) as bigint)) as bigint) AS sum_cents
FROM p
WHERE sqrt((lon - {QUERY_POINT[0]!r}) * (lon - {QUERY_POINT[0]!r})
         + (lat - {QUERY_POINT[1]!r}) * (lat - {QUERY_POINT[1]!r})) <= 6.5
GROUP BY event_type ORDER BY event_type
"""


def q59_sql_spatial_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A Geom* predicate JOINING TWO VIEWS through the SQL surface: without
    the rewrite Spark must plan a cartesian product (the UDF is the only
    join condition); `rewrite_spatial_join` re-plugs the engine's cell
    equi-join in front of the exact UDF refine — the reference's two-store
    join acceleration (`SqlQueryRunner.java:109-245`).  The plan swap is
    pinned in tests/test_plans.py."""
    register_views(spark, sf_dir)
    spark.sql(geo.lineitem_points_sql()).createOrReplaceTempView("gw_pts")
    (
        spark.sql(geo.customer_points_sql())
        .filter("cid % 23 = 0")
        .withColumnRenamed("cid", "qid")
        .createOrReplaceTempView("gw_qrs")
    )
    sql = """
        SELECT q.qid, cast(count(*) as bigint) AS n_within
        FROM gw_pts p JOIN gw_qrs q
          ON GeomWithinDistance(GeomPoint(p.lon, p.lat),
                                GeomPoint(q.lon, q.lat), 2.5)
        GROUP BY q.qid ORDER BY qid
    """
    return sqlrewrite.spatial_sql(spark, sql, optimize=True, join_res=7)


Q59_SQL = f"""
WITH p AS ({geo.lineitem_points_sql()}),
     q AS (SELECT cid AS qid, lon AS qlon, lat AS qlat
           FROM ({geo.customer_points_sql()}) c WHERE cid % 23 = 0)
SELECT qid, cast(count(*) as bigint) AS n_within
FROM p JOIN q
  ON sqrt((lon - qlon) * (lon - qlon) + (lat - qlat) * (lat - qlat)) <= 2.5
GROUP BY qid ORDER BY qid
"""


def _events_points_ts_sql() -> str:
    """events point table WITH the event timestamp (CQL temporal predicates
    need it; the shared helper omits it)."""
    return (f"SELECT event_id AS eid, {geo.lon_sql('event_id')} AS lon, "
            f"{geo.lat_sql('event_id')} AS lat, value, event_type, ts "
            f"FROM events")


_Q61_CQL = (
    "(BBOX(geom, -90, -40, 40, 44) AND value BETWEEN 50 AND 900 "
    "AND event_type IN ('click', 'view') "
    "AND ts DURING '2024-01-05 00:00:00', '2024-01-22 00:00:00') "
    "OR (DWITHIN(geom, POINT (120 20), 9.5, degrees) "
    "AND NOT (event_type LIKE 'p%'))"
)


def q61_cql_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CQL filter text as the query surface: the reference parses GeoTools
    ECQL into its filter tree (`CQLToGeoWaveFilterVisitor.java`,
    `OptimalCQLQuery.java` extracts index constraints from it).  Spark-first
    twin: `plans/cql.cql_to_sql` compiles the same grammar subset to a SQL
    predicate over the registered Geom* UDFs, then `spatial_sql` injects the
    closed-form cell prefilter — CQL gets the same index acceleration as
    hand-written SQL.  Exercises BBOX, DWITHIN, DURING, BETWEEN, IN, LIKE,
    NOT, and OR in one filter."""
    from .plans.cql import cql_to_sql

    register_views(spark, sf_dir)
    # bind the CQL geometry attribute to the UDF-surface expression the
    # sqlrewrite prefilter patterns recognize
    pred = cql_to_sql(_Q61_CQL, {"geom": "GeomPoint(lon, lat)"})
    sql = f"""
        WITH p AS ({_events_points_ts_sql()})
        SELECT event_type,
               cast(count(*) as bigint) AS n,
               cast(sum(cast(round(value * 100) as bigint)) as bigint) AS sum_cents
        FROM p
        WHERE {pred}
        GROUP BY event_type ORDER BY event_type
    """
    return sqlrewrite.spatial_sql(spark, sql, optimize=True, res=6)


Q61_SQL = f"""
WITH p AS ({_events_points_ts_sql()})
SELECT event_type,
       cast(count(*) as bigint) AS n,
       cast(sum(cast(round(value * 100) as bigint)) as bigint) AS sum_cents
FROM p
WHERE (lon >= -90 AND lon <= 40 AND lat >= -40 AND lat <= 44
       AND value BETWEEN 50 AND 900
       AND event_type IN ('click', 'view')
       AND ts >= TIMESTAMP '2024-01-05 00:00:00'
       AND ts <= TIMESTAMP '2024-01-22 00:00:00')
   OR (sqrt((lon - 120) * (lon - 120) + (lat - 20) * (lat - 20)) <= 9.5
       AND NOT event_type LIKE 'p%')
GROUP BY event_type ORDER BY event_type
"""


def _hex_wkt_view_sql() -> str:
    """Hexagon zone table with BOTH a WKT geometry column (the SQL-surface
    input) and the raw vertex columns (what the DuckDB oracle raycasts)."""
    ring = ", ".join(f"vx{i}, ' ', vy{i}, ', '" for i in range(6))
    return (
        "SELECT aid, "
        + ", ".join(f"vx{i}, vy{i}" for i in range(6))
        + ", concat('POLYGON ((', "
        + ring
        + ", vx0, ' ', vy0, '))') AS geom "
        + f"FROM ({geo.hex_a_sql()}) h"
    )


def q66_sql_pip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon JOIN through the SQL surface where the polygon is
    a COLUMN of the second view (not a literal): without the rewrite the
    Geom* UDF is the only join condition and Spark must plan a cartesian
    product.  `rewrite_pip_join` re-registers the zone view with its WKT
    bbox-cover cells exploded and re-plugs a cell hash equi-join in front
    of the exact UDF refine (`SqlQueryRunner.java:109-245` re-plug; plan
    swap pinned in tests/test_plans.py).  Oracle: brute-force raycast
    join over the same hexagons' vertex columns."""
    register_views(spark, sf_dir)
    spark.sql(geo.lineitem_points_sql()).createOrReplaceTempView("gw_pts3")
    spark.sql(_hex_wkt_view_sql()).createOrReplaceTempView("gw_zones")
    sql = """
        SELECT z.aid, cast(count(*) as bigint) AS n_points
        FROM gw_pts3 p JOIN gw_zones z
          ON GeomContains(z.geom, GeomPoint(p.lon, p.lat))
        GROUP BY z.aid ORDER BY aid
    """
    # res 8: measured 21s/11s/9s at join_res 7/8/9 on sf0.1 — past 8 the
    # cover fan-out grows faster than the candidate set shrinks
    return sqlrewrite.spatial_sql(spark, sql, optimize=True, join_res=8)


def _q66_sql() -> str:
    from .join import spatial

    raycast = spatial.raycast_flat_sql("p.lon", "p.lat", 6)
    return f"""
WITH p AS ({geo.lineitem_points_sql()}),
z AS ({_hex_wkt_view_sql()})
SELECT z.aid, cast(count(*) as bigint) AS n_points
FROM p JOIN z ON {raycast}
GROUP BY z.aid ORDER BY aid
"""


_Q70_GWQL = (
    "SELECT COUNT(*) AS n, MIN(value) AS min_v, MAX(value) AS max_v, "
    "SUM(cents) AS sum_cents FROM event_points "
    "WHERE bbox(geom, -120.3500003, -55.1500003, 60.2500003, 62.4500003) "
    "AND ts DURING '2024-01-03/2024-05-20' "
    "AND (strstartswith(event_type, 's') OR strcontains(event_type, 'i')) "
    "AND value * 2e0 + 1e1 > 1e2"
)


def _event_points_cents_sql() -> str:
    """event_points + an exact integer cents column: the GWQL grammar's
    aggregate arg is a bare column (GWQL.g4 functionArg), and an int64 SUM
    is order-independent (a float SUM would hash-mismatch the oracle)."""
    return (f"SELECT *, cast(round(value * 100) as bigint) AS cents "
            f"FROM ({_events_points_ts_sql()})")


def q70_gwql_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GWQL — the reference's query language — as the query surface: the
    full SELECT statement (aggregates, spatial BBOX, temporal DURING, text
    predicates, arithmetic) compiled by `plans/gwql.py` to one Spark SQL
    string and accelerated by the same sqlrewrite cell prefilter as
    hand-written SQL.  Reference: grammar GWQL.g4 + SelectStatement.java
    (core/store/.../query/gwql in /root/reference)."""
    from .plans.gwql import gwql

    register_views(spark, sf_dir)
    spark.sql(_event_points_cents_sql()).createOrReplaceTempView("event_points")
    return gwql(spark, _Q70_GWQL, geom_map={"geom": "GeomPoint(lon, lat)"},
                res=6)


Q70_SQL = f"""
WITH p AS ({_events_points_ts_sql()})
SELECT cast(count(*) as bigint) AS n, min(value) AS min_v,
       max(value) AS max_v,
       cast(sum(cast(round(value * 100) as bigint)) as bigint) AS sum_cents
FROM p
WHERE lon >= -120.3500003 AND lon <= 60.2500003
  AND lat >= -55.1500003 AND lat <= 62.4500003
  AND ts >= TIMESTAMP '2024-01-03 00:00:00'
  AND ts <= TIMESTAMP '2024-05-20 00:00:00'
  AND (starts_with(event_type, 's') OR contains(event_type, 'i'))
  AND value * 2 + 10 > 100
"""


_Q71_GWQL = (
    "SELECT eid, event_type AS kind, value FROM event_points "
    "WHERE (value BETWEEN 50 AND 120 AND NOT strcontains(event_type, 'i')) "
    "OR [strendswith(event_type, 'w') AND value::number > 850 "
    "AND eid IS NOT NULL]"
)


def q71_gwql_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GWQL column-selector statement: aliases, BETWEEN, NOT, bracket
    grouping, ::number cast, IS NOT NULL, OR — the non-aggregating half of
    the reference's SelectStatement surface."""
    from .plans.gwql import gwql

    register_views(spark, sf_dir)
    spark.sql(_events_points_ts_sql()).createOrReplaceTempView("event_points")
    return gwql(spark, _Q71_GWQL)


Q71_SQL = f"""
WITH p AS ({_events_points_ts_sql()})
SELECT eid, event_type AS kind, value
FROM p
WHERE (value BETWEEN 50 AND 120 AND NOT contains(event_type, 'i'))
   OR (suffix(event_type, 'w') AND cast(value as double) > 850
       AND eid IS NOT NULL)
"""


def _rect_wkt_view_sql(base_sql: str, id_expr: str) -> str:
    """Rectangle table with BOTH a WKT geometry column (the SQL-surface
    input) and the raw bounds (what the DuckDB oracle interval-tests)."""
    return (
        f"SELECT {id_expr} AS rid, lon0, lat0, lon1, lat1, "
        "concat('POLYGON ((', lon0, ' ', lat0, ', ', lon1, ' ', lat0, ', ',"
        " lon1, ' ', lat1, ', ', lon0, ' ', lat1, ', ',"
        " lon0, ' ', lat0, '))') AS geom "
        f"FROM ({base_sql}) b"
    )


def _q301_rects_a_sql() -> str:
    """Supplier-keyed query rects with the lon/lat LCG multipliers SWAPPED
    vs `geo.supplier_rects_sql`: the standard rects share the image
    footprints' 7919 longitude lattice and provably never overlap them
    (both sets sit on interleaved residue classes — measured 0 pairs at
    every sf).  Swapping the multipliers decorrelates the lattices."""
    cx = geo.lon_sql("s_suppkey * 104729 + 31")
    cy = geo.lat_sql("s_suppkey * 7919 + 101")
    w = "(2e0 + (s_suppkey % 700) / 1e2)"
    h = "(1e0 + (s_suppkey % 500) / 1e2)"
    return (
        f"SELECT s_suppkey AS rid, "
        f"greatest({cx} - {w}, -180e0) AS lon0, "
        f"greatest({cy} - {h}, -90e0) AS lat0, "
        f"least({cx} + {w}, 180e0) AS lon1, "
        f"least({cy} + {h}, 90e0) AS lat1 FROM supplier"
    )


def q301_sql_polypoly_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polygon x polygon JOIN through the SQL surface — BOTH sides carry a
    WKT geometry COLUMN, so neither the literal prefilter nor the pip-join
    rewrite can fire and the naive plan is a cartesian UDF theta-join
    (BroadcastNestedLoopJoin).  `rewrite_polypoly_join` re-registers both
    views with their bbox-cover cells exploded and re-plugs a cell hash
    equi-join with reporting-cell dedup in front of the exact Geom UDF
    refine (plan swap pinned in tests/test_plans.py) — closing the last
    SQL auto-acceleration gap vs `SqlQueryRunner.java:109-245` (VERDICT
    r2 #4).  Geometries are the supplier query rects x the image
    footprints (as WKT rectangles), so the DuckDB oracle is the exact
    closed-interval overlap join on the raw bounds."""
    from .table import images as images_mod

    register_views(spark, sf_dir)
    spark.sql(
        _rect_wkt_view_sql(_q301_rects_a_sql(), "rid")
    ).createOrReplaceTempView("gw_recta")
    spark.sql(
        _rect_wkt_view_sql(images_mod.images_base_sql(), "doc_id")
    ).createOrReplaceTempView("gw_rectb")
    sql = """
        SELECT a.rid AS aid, cast(count(*) as bigint) AS n_hits,
               cast(min(b.rid) as bigint) AS min_bid
        FROM gw_recta a JOIN gw_rectb b ON GeomIntersects(a.geom, b.geom)
        GROUP BY a.rid ORDER BY aid
    """
    return sqlrewrite.spatial_sql(spark, sql, optimize=True)


def _q301_sql() -> str:
    from .table import images as images_mod

    return f"""
WITH a AS ({_rect_wkt_view_sql(_q301_rects_a_sql(), "rid")}),
b AS ({_rect_wkt_view_sql(images_mod.images_base_sql(), "doc_id")})
SELECT a.rid AS aid, cast(count(*) as bigint) AS n_hits,
       cast(min(b.rid) as bigint) AS min_bid
FROM a JOIN b
  ON a.lon0 <= b.lon1 AND b.lon0 <= a.lon1
 AND a.lat0 <= b.lat1 AND b.lat0 <= a.lat1
GROUP BY a.rid ORDER BY aid
"""


SQL_QUERIES = {
    "q301_sql_polypoly_join": (q301_sql_polypoly_join, _q301_sql()),
    "q31_sql_geom_filter": (q31_sql_geom_filter, Q31_SQL),
    "q32_sql_geom_distance": (q32_sql_geom_distance, Q32_SQL),
    "q51_sql_within_distance": (q51_sql_within_distance, Q51_SQL),
    "q59_sql_spatial_join": (q59_sql_spatial_join, Q59_SQL),
    "q61_cql_filter": (q61_cql_filter, Q61_SQL),
    "q66_sql_pip_join": (q66_sql_pip_join, _q66_sql()),
    "q70_gwql_agg": (q70_gwql_agg, Q70_SQL),
    "q71_gwql_select": (q71_gwql_select, Q71_SQL),
}
