"""Clustering analytics queries (q33-q34).

- q33 KMeans + convex hulls (reference: KMeansRunner.java:195-217,
  KMeansHullGenerator.java:35-60): iterative/seeded -> rows-only check
  (no SQL oracle; pytest validates hull properties instead).
- q34 DBSCAN (reference: DBScanMapReduce.java + DBScanIterationsJobRunner):
  FULL oracle parity — DuckDB computes the same deterministic DBSCAN spec
  (core = |N_eps incl self| >= min_pts; cluster label = min core id of the
  connected component; border adopts min core-neighbor label) using a
  9-offset cell equi-join for eps-pairs and a recursive CTE for the
  transitive closure.  eps is chosen sub-percolation so components stay
  small at every sf.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .agg import dbscan as dbscan_mod
from .agg import kmeans as kmeans_mod
from .table import geo
from .table.views import register_views

EPS = 0.8
MIN_PTS = 4
_DB_RES = 7  # cell height 180/2^7 = 1.406 > EPS -> 9-neighborhood suffices


def q33_kmeans_hulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMeans over lineitem points; per-cluster hull summary (rows-only)."""
    register_views(spark, sf_dir)
    pts = spark.sql(geo.lineitem_points_sql())
    clustered = kmeans_mod.kmeans_clusters(pts, k=8, seed=42)
    return (
        kmeans_mod.cluster_hulls(clustered)
        .select("cluster", "n_points", "hull_n")
        .orderBy("cluster")
    )


def q34_dbscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN cluster summary: per-cluster size + core count (noise = -1)."""
    register_views(spark, sf_dir)
    pts = spark.sql(geo.lineitem_points_sql())
    labeled = dbscan_mod.dbscan(spark, pts, eps=EPS, min_pts=MIN_PTS,
                                id_col="pid", res=8)
    return (
        labeled.groupBy("cluster")
        .agg(
            F.count("*").alias("n_points"),
            F.sum(F.col("is_core").cast("bigint")).alias("n_core"),
        )
        .orderBy("cluster")
    )


def _dbscan_oracle_sql(points_sql: str, id_col: str, eps: float,
                       min_pts: int, res: int) -> str:
    n = 1 << res
    x = f"least(greatest(cast(ceil((lon + 180e0) / 360e0 * {n}) as bigint) - 1, 0), {n - 1})"
    y = f"least(greatest(cast(ceil((lat + 90e0) / 180e0 * {n}) as bigint) - 1, 0), {n - 1})"
    return f"""
WITH RECURSIVE
p AS (SELECT {id_col} AS id, lon, lat, {x} AS cx, {y} AS cy FROM ({points_sql}) s),
offs AS (SELECT (i % 3) - 1 AS dx, (i // 3) - 1 AS dy FROM (SELECT unnest(range(0, 9)) AS i) t),
pairs AS (
  SELECT a.id AS a, b.id AS b
  FROM p a JOIN offs o ON true
  JOIN p b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy
  WHERE a.id <> b.id
    AND sqrt((a.lon - b.lon) * (a.lon - b.lon) + (a.lat - b.lat) * (a.lat - b.lat)) <= {eps!r}
),
core AS (SELECT a AS id FROM pairs GROUP BY a HAVING count(*) + 1 >= {min_pts}),
core_edges AS (
  SELECT pr.a, pr.b FROM pairs pr
  JOIN core ca ON pr.a = ca.id JOIN core cb ON pr.b = cb.id
),
reach(id, r) AS (
  SELECT id, id FROM core
  UNION
  SELECT e.a, r.r FROM core_edges e JOIN reach r ON e.b = r.id
),
labels AS (SELECT id, min(r) AS label FROM reach GROUP BY id),
border AS (
  SELECT pr.a AS id, min(l.label) AS label
  FROM pairs pr
  JOIN core cb ON pr.b = cb.id
  JOIN labels l ON l.id = pr.b
  WHERE pr.a NOT IN (SELECT id FROM core)
  GROUP BY pr.a
),
assigned AS (
  SELECT id, label, true AS is_core FROM labels
  UNION ALL
  SELECT id, label, false AS is_core FROM border
)
SELECT coalesce(a.label, -1) AS cluster,
       cast(count(*) as bigint) AS n_points,
       cast(sum(case when coalesce(a.is_core, false) then 1 else 0 end) as bigint) AS n_core
FROM p LEFT JOIN assigned a ON p.id = a.id
GROUP BY 1 ORDER BY cluster
"""


Q34_SQL = _dbscan_oracle_sql(geo.lineitem_points_sql(), "pid", EPS, MIN_PTS, _DB_RES)


ANALYTICS_QUERIES = {
    "q33_kmeans_hulls": (q33_kmeans_hulls, None),
    "q34_dbscan": (q34_dbscan, Q34_SQL),
}
