"""Spatial SQL runner: execute SQL containing Geom* predicates, with an
index-accelerating rewrite.

Reference analog (/root/reference): `analytics/spark/src/main/java/.../
sparksql/SqlQueryRunner.java:109-245` — GeoWave parses the SQL, walks the
logical-plan JSON for a Filter containing a geometry UDF, string-parses the
WHERE clause to extract the predicate and its arguments, and re-plugs an
index-accelerated join in place of the brute-force UDF filter.

Spark-first re-expression: the Geom* pandas UDFs (functions/register.py)
make the SQL *correct* on their own; this module makes it *fast* by
injecting a closed-form cell-cover prefilter next to the UDF predicate:

    GeomWithin(GeomPoint(p.lon, p.lat), 'POLYGON (...)')
 -> (cell(p.lon, p.lat) IN (covered cells) AND GeomWithin(...))

The IN-list is plain integer arithmetic (whole-stage codegen) and prunes
parquet row groups via min/max stats, so the expensive Arrow-batched UDF
only sees candidate rows — the same cover-then-refine contract as the
engine API, expressed through SQL surgery exactly like the reference.
"""

from __future__ import annotations

import re

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from ..functions.register import register_geometry_functions
from ..geom import wkt as wktm
from ..index import cover as cov
from ..table import geo

_IDENT = r"[A-Za-z_][\w.]*"
# GeomXxx(GeomPoint(lon, lat), 'POLYGON (...)')  /  GeomXxx('POLYGON...', GeomPoint(...))
_PAT_POINT_FIRST = re.compile(
    rf"Geom(Within|Intersects|Contains|Covers)\(\s*GeomPoint\(\s*({_IDENT})\s*,\s*({_IDENT})\s*\)\s*,\s*'(POLYGON[^']*)'\s*\)",
    re.I,
)
_PAT_POLY_FIRST = re.compile(
    rf"Geom(Contains|Intersects|Covers)\(\s*'(POLYGON[^']*)'\s*,\s*GeomPoint\(\s*({_IDENT})\s*,\s*({_IDENT})\s*\)\s*\)",
    re.I,
)
_NUM = r"[-+]?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?"
# GeomWithinDistance(GeomPoint(lon, lat), 'POINT (x y)', r) — the radius
# extraction the reference does by string-parsing the WHERE clause
# (`SqlQueryRunner.java:164-245` getDistance/radius plumbing)
_PAT_WITHIN_DIST = re.compile(
    rf"GeomWithinDistance\(\s*GeomPoint\(\s*({_IDENT})\s*,\s*({_IDENT})\s*\)\s*,"
    rf"\s*'POINT\s*\(\s*({_NUM})\s+({_NUM})\s*\)'\s*,\s*({_NUM})\s*\)",
    re.I,
)


def _prefilter(lon: str, lat: str, poly_wkt: str, res: int, max_cells: int) -> str:
    ring = wktm.parse_polygon(poly_wkt)
    pdf = cov.polygon_cover({0: ring.ravel()}, res=res, max_cells=max_cells,
                            curve="rowmajor")
    cells = sorted(int(c) for c in pdf["cell"].unique())
    cell_expr = geo.rowmajor_cell_sql(lon, lat, res)
    in_list = ", ".join(str(c) for c in cells)
    return f"{cell_expr} IN ({in_list})"


def inject_cell_prefilter(sql: str, res: int = 8, max_cells: int = 512) -> str:
    """Rewrite every point-vs-polygon-literal Geom predicate into
    (cover-cell prefilter AND original predicate)."""

    def sub_within_dist(m: re.Match) -> str:
        lon, lat, cx, cy, r = m.groups()
        cells = _disk_cells(float(cx), float(cy), float(r), res)
        if len(cells) > max_cells:
            return m.group(0)  # too coarse to help — leave the UDF alone
        cell_expr = geo.rowmajor_cell_sql(lon, lat, res)
        in_list = ", ".join(str(c) for c in cells)
        return f"({cell_expr} IN ({in_list}) AND {m.group(0)})"

    def sub_point_first(m: re.Match) -> str:
        _, lon, lat, poly = m.groups()
        return f"({_prefilter(lon, lat, poly, res, max_cells)} AND {m.group(0)})"

    def sub_poly_first(m: re.Match) -> str:
        _, poly, lon, lat = m.groups()
        return f"({_prefilter(lon, lat, poly, res, max_cells)} AND {m.group(0)})"

    sql = _PAT_POINT_FIRST.sub(sub_point_first, sql)
    sql = _PAT_POLY_FIRST.sub(sub_poly_first, sql)
    sql = _PAT_WITHIN_DIST.sub(sub_within_dist, sql)
    return sql


def _disk_cells(cx: float, cy: float, r: float, res: int) -> list[int]:
    """Cells whose k-ring disk is guaranteed to cover the radius-r circle
    around (cx, cy): k rings span k*cell_h latitude (the tighter dimension),
    so k = ceil(r / cell_h) + 1 over-covers (GeomWithinDistance buffer
    contract, `udf/GeomWithinDistance.java:30-46` buffered envelope)."""
    from ..sfc import grid

    cell_h = 180.0 / (1 << res)
    k = int(np.ceil(r / cell_h)) + 1
    center = grid.latlng_to_cell(
        np.array([cx]), np.array([cy]), res, "rowmajor")
    disk = grid.grid_disk(center, res, k, "rowmajor")
    return sorted(set(int(c) for c in np.asarray(disk).ravel()))


# spatial JOIN between two registered views on a Geom predicate over both
# sides' coordinate columns — the brute-force plan is a cartesian product
# (BroadcastNestedLoopJoin); the rewrite re-plugs the engine's cell
# equi-join, like the reference's two-store join acceleration
# (`SqlQueryRunner.java:109-245` InnerJoin detection + re-plug).
_PAT_DIST_JOIN = re.compile(
    rf"FROM\s+({_IDENT})\s+(\w+)\s+JOIN\s+({_IDENT})\s+(\w+)\s+ON\s+"
    rf"(GeomWithinDistance\(\s*GeomPoint\(\s*(\w+)\.(\w+)\s*,\s*(\w+)\.(\w+)\s*\)\s*,"
    rf"\s*GeomPoint\(\s*(\w+)\.(\w+)\s*,\s*(\w+)\.(\w+)\s*\)\s*,\s*({_NUM})\s*\))",
    re.I,
)


def rewrite_spatial_join(spark: SparkSession, sql: str,
                         res: int = 7) -> str:
    """Detect `FROM a x JOIN b y ON GeomWithinDistance(GeomPoint(x.c1,
    x.c2), GeomPoint(y.c3, y.c4), R)` and re-plug the engine join: the
    second view is re-registered with its grid-disk candidate cells
    exploded (vectorized UDF, distributed — never collected), and the
    join condition becomes `cell(x) = y.__gw_cell AND <original
    predicate>` — a hash-joinable equi-key in front of the exact UDF
    refine, instead of a cartesian product.

    Same constrained-shape string surgery the reference performs on its
    parsed WHERE clause; unmatched SQL passes through untouched.
    """
    m = _PAT_DIST_JOIN.search(sql)
    if not m:
        return sql
    (view_a, alias_a, view_b, alias_b, pred,
     pa1, ca1, pa2, ca2, pb1, cb1, pb2, cb2, radius) = m.groups()
    # the predicate's first point must come from one alias, second from the
    # other; normalize so (lon_a, lat_a) belongs to alias_a
    if pa1 == alias_a and pb1 == alias_b:
        lon_a, lat_a, lon_b, lat_b = ca1, ca2, cb1, cb2
    elif pa1 == alias_b and pb1 == alias_a:
        lon_b, lat_b, lon_a, lat_a = ca1, ca2, cb1, cb2
    else:
        return sql
    cell_h = 180.0 / (1 << res)
    k = int(np.ceil(float(radius) / cell_h))
    cover_view = f"__gw_cover_{view_b}_{res}_{k}"
    from pyspark.sql import functions as F  # noqa: N812

    (
        spark.table(view_b)
        .withColumn("__gw_cell", F.explode(
            cov.point_disk_cells_udf(res, k, curve="rowmajor")(
                F.col(lon_b), F.col(lat_b))))
        .createOrReplaceTempView(cover_view)
    )
    cell_a = geo.rowmajor_cell_sql(f"{alias_a}.{lon_a}", f"{alias_a}.{lat_a}", res)
    replacement = (
        f"FROM {view_a} {alias_a} JOIN {cover_view} {alias_b} "
        f"ON {cell_a} = {alias_b}.__gw_cell AND {pred}"
    )
    return sql[: m.start()] + replacement + sql[m.end():]


def spatial_sql(spark: SparkSession, sql: str, *, optimize: bool = True,
                res: int = 8, max_cells: int = 512,
                join_res: int = 7) -> DataFrame:
    """Run a SQL string that may use the Geom* function surface."""
    register_geometry_functions(spark)
    if optimize:
        sql = inject_cell_prefilter(sql, res=res, max_cells=max_cells)
        sql = rewrite_spatial_join(spark, sql, res=join_res)
    return spark.sql(sql)
