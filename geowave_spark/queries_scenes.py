"""Satellite scene-catalog workflow (Landsat8/Sentinel2 analog).

Reference: `extensions/cli/{landsat8,sentinel2}` in /root/reference —
`Landsat8/SceneFeatureIterator.java:60-92,235` (scene features with
entityId/acquisitionDate/cloudCover/path/row + WRS2 footprint geometry,
CQL-filtered, optional "n best scenes" = lowest cloudCover, optionally per
(path,row) group — the `BEST_CLOUD_COVERAGE_COMPARATOR` at :60-68) and
`BandFeatureIterator.java:57-118` (band expansion of the selected scenes).
The reference streams a public CSV catalog through one iterator; the
Spark-first form is a catalog DataFrame + compiled CQL + a window top-n —
every stage scales with the catalog, which at 10^7 scenes is exactly the
pruned-scan + window shape everything else in this engine already uses.

The downstream raster ingest of selected scenes is the already-shipped
GeoTIFF path (`raster/geotiff.py`); this module covers the
catalog-selection stage both CLIs share.

The scene catalog is synthesized deterministically from the orders table
(WRS2-like lattice footprints from closed-form path/row), so the DuckDB
oracle re-derives the selection with hand-written comparisons — it never
touches the CQL compiler or the Geom* UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .table.views import register_views

# WRS2-like lattice: 233 paths x 248 rows, 2 deg x 1.5 deg footprints
_CATALOG_SQL = """
SELECT o_orderkey AS scene_id,
       cast((o_orderkey * 13) % 233 + 1 as bigint) AS path,
       cast((o_orderkey * 29) % 248 + 1 as bigint) AS row_n,
       cast((o_orderkey * 37) % 100000 as bigint) AS cloud_milli,
       o_orderdate AS acq_ts,
       ((o_orderkey * 13) % 233 + 1) * 360e0 / 233e0 - 180e0 AS lon0,
       ((o_orderkey * 29) % 248 + 1) * 180e0 / 248e0 - 90e0 AS lat0,
       ((o_orderkey * 13) % 233 + 1) * 360e0 / 233e0 - 180e0 + 2e0 AS lon1,
       ((o_orderkey * 29) % 248 + 1) * 180e0 / 248e0 - 90e0 + 1.5e0 AS lat1
FROM orders
"""

_Q109_CQL = (
    "BBOX(geom, -60.3, -25.7, 55.4, 48.9) "
    "AND cloud_milli < 30000 "
    "AND acq_ts DURING '1994-01-01 00:00:00', '1996-12-31 00:00:00'"
)

_N_BEST = 2  # scenes kept per (path, row) group


def q109_scene_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene selection: CQL filter over the catalog (footprint BBOX +
    cloud-cover ceiling + acquisition window), then "n best scenes by
    path/row" — lowest cloudCover wins, scene_id tie-break (the
    reference's nBestScenesByPathRow path, `SceneFeatureIterator.java:235`
    + the cloud-cover comparator at :60-68).

    Spark shape: the compiled CQL is a plain WHERE (scalar conjuncts push
    to the parquet scan; the footprint test is the Geom* UDF surface), and
    n-best is one window — rank inside the (path, row) hash partition.
    """
    from .functions.register import register_geometry_functions
    from .plans.cql import cql_to_sql

    register_views(spark, sf_dir)
    register_geometry_functions(spark)
    geom = ("GeomFromWKT(concat('POLYGON ((', lon0, ' ', lat0, ', ', "
            "lon1, ' ', lat0, ', ', lon1, ' ', lat1, ', ', lon0, ' ', lat1, "
            "', ', lon0, ' ', lat0, '))'))")
    pred = cql_to_sql(_Q109_CQL, {"geom": geom})
    return spark.sql(f"""
        WITH scenes AS ({_CATALOG_SQL}),
        hits AS (SELECT * FROM scenes WHERE {pred}),
        ranked AS (
          SELECT scene_id, path, row_n, cloud_milli,
                 row_number() OVER (PARTITION BY path, row_n
                                    ORDER BY cloud_milli, scene_id) AS rk
          FROM hits
        )
        SELECT scene_id, path, row_n, cloud_milli
        FROM ranked WHERE rk <= {_N_BEST}
        ORDER BY path, row_n, cloud_milli, scene_id
    """)


def _q109_sql() -> str:
    # hand-written re-derivation: bbox overlap as plain comparisons (the
    # measure-zero touching case cannot occur: lattice edges are k*360/233
    # or k*180/248 while the query box corners are exact decimals)
    return f"""
WITH scenes AS ({_CATALOG_SQL}),
hits AS (
  SELECT * FROM scenes
  WHERE lon1 > -60.3 AND lon0 < 55.4 AND lat1 > -25.7 AND lat0 < 48.9
    AND cloud_milli < 30000
    AND acq_ts >= TIMESTAMP '1994-01-01 00:00:00'
    AND acq_ts <= TIMESTAMP '1996-12-31 00:00:00'
),
ranked AS (
  SELECT scene_id, path, row_n, cloud_milli,
         row_number() OVER (PARTITION BY path, row_n
                            ORDER BY cloud_milli, scene_id) AS rk
  FROM hits
)
SELECT scene_id, path, row_n, cloud_milli
FROM ranked WHERE rk <= {_N_BEST}
ORDER BY path, row_n, cloud_milli, scene_id
"""


SCENE_QUERIES = {
    "q109_scene_selection": (q109_scene_selection, _q109_sql()),
}
