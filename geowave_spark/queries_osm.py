"""OSM PBF ingest + way-assembly registry query.

q107 — the reference's OSM pipeline end-to-end
(`extensions/cli/osm/.../parser/OsmPbfParser.java` stage +
`mapreduce/Convert/OsmProvider/OsmProvider.java:138-212` way geometry
assembly), re-expressed Spark-first: block-index fan-out read of one .pbf
(intra-file parallelism) and the ref->coordinate resolution as a
distributed hash join + keyed ordered reassembly instead of per-way
Accumulo lookups.

The fixture .pbf is staged ONCE per sf_dir from the events table (node
coords are the standard derived lon/lat, exact micro-degree integers, so
the nanodegree PBF round-trip is lossless); the DuckDB oracle recomputes
every per-way statistic straight from events — it never touches the PBF,
the parser, or the join.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F  # noqa: N812

from .table import geo, osm
from .table.views import register_views

_SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        ".scratch")

_LON_MICRO = f"(event_id % {geo.LON_MOD}) * {geo.LON_MULT} % {geo.LON_MOD} - 180000000"
_LAT_MICRO = f"(event_id % {geo.LAT_MOD}) * {geo.LAT_MULT} % {geo.LAT_MOD} - 90000000"


def _stage_pbf(spark: SparkSession, sf_dir: str) -> str:
    sfn = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(_SCRATCH, f"osm_events_{sfn}.pbf")
    if os.path.exists(path):
        return path
    os.makedirs(_SCRATCH, exist_ok=True)
    register_views(spark, sf_dir)
    pdf = spark.sql(f"""
        SELECT event_id, user_id, ts,
               cast({_LON_MICRO} as long) AS lon_micro,
               cast({_LAT_MICRO} as long) AS lat_micro
        FROM events
    """).toPandas()
    nodes = [(int(r.event_id) + 1, int(r.lon_micro) * 1000, int(r.lat_micro) * 1000, {})
             for r in pdf.itertuples()]
    ways = []
    for uid, grp in pdf.sort_values(["ts", "event_id"]).groupby("user_id"):
        refs = [int(e) + 1 for e in grp["event_id"]]
        ways.append((int(uid), refs, {"highway": "track"}))
    ways.sort()
    tmp = path + ".tmp"
    osm.write_osm_pbf(tmp, nodes, ways, [])
    os.replace(tmp, path)
    return path


def q107_osm_way_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _stage_pbf(spark, sf_dir)
    dfs = osm.read_osm_pbf(spark, path)
    nodes = dfs["nodes"].select(
        F.col("id").alias("ref"),
        (F.col("lon_nano") / 1000).cast("long").alias("lon_micro"),
        (F.col("lat_nano") / 1000).cast("long").alias("lat_micro"),
    )
    w = dfs["ways"].select(
        F.col("id").alias("way_id"),
        F.posexplode("refs").alias("pos", "ref"),
    )
    win = Window.partitionBy("way_id").orderBy("pos")
    d = w.join(nodes, "ref").select(
        "way_id",
        (F.col("lon_micro") - F.lag("lon_micro").over(win)).alias("dx"),
        (F.col("lat_micro") - F.lag("lat_micro").over(win)).alias("dy"),
    )
    return (
        d.groupBy("way_id")
        .agg(F.count("*").alias("n_nodes"),
             F.coalesce(F.sum(F.abs(F.col("dx")) + F.abs(F.col("dy"))), F.lit(0))
             .cast("long").alias("path_micro"))
        .orderBy("way_id")
    )


def _q107_sql() -> str:
    return f"""
WITH pts AS (
  SELECT user_id, ts, event_id,
         cast({_LON_MICRO} as bigint) AS lon_micro,
         cast({_LAT_MICRO} as bigint) AS lat_micro
  FROM events
), d AS (
  SELECT user_id,
         lon_micro - lag(lon_micro) OVER w AS dx,
         lat_micro - lag(lat_micro) OVER w AS dy
  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id AS way_id,
       cast(count(*) as bigint) AS n_nodes,
       cast(coalesce(sum(abs(dx) + abs(dy)), 0) as bigint) AS path_micro
FROM d GROUP BY user_id ORDER BY way_id
"""


OSM_QUERIES = {
    "q107_osm_way_assembly": (q107_osm_way_assembly, _q107_sql()),
}
