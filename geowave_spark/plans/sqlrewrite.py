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


def spatial_sql(spark: SparkSession, sql: str, *, optimize: bool = True,
                res: int = 8, max_cells: int = 512) -> DataFrame:
    """Run a SQL string that may use the Geom* function surface."""
    register_geometry_functions(spark)
    if optimize:
        sql = inject_cell_prefilter(sql, res=res, max_cells=max_cells)
    return spark.sql(sql)
