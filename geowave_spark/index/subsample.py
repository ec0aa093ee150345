"""Resolution subsampling: keep one representative row per coarse cell.

Reference analog (/root/reference): `maxResolutionSubsamplingPerDimension`
(`core/store/src/main/java/.../core/store/base/BaseQueryOptions.java:64,128`)
— rendering queries skip rows that would map to the same screen pixel by
subsampling the SFC key at a coarser bit resolution.

Spark-first: group by the coarse cell and keep the minimum row id — a single
partial-aggregated groupBy (no window, no sort), expressed in closed-form
cell arithmetic shared with the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..table import geo


def subsample_by_resolution(df: DataFrame, res: int, id_col: str,
                            lon: str = "lon", lat: str = "lat") -> DataFrame:
    """One row id per touched cell at ``res``: (cell, keep_id, n_collapsed)."""
    cell = geo.rowmajor_cell_sql(lon, lat, res)
    return (
        df.withColumn("cell", F.expr(cell))
        .groupBy("cell")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_collapsed"),
        )
    )


def subsample_oracle_sql(points_sql: str, res: int, id_col: str,
                         lon: str = "lon", lat: str = "lat") -> str:
    cell = geo.rowmajor_cell_sql(lon, lat, res)
    return f"""
WITH p AS ({points_sql})
SELECT {cell} AS cell, min({id_col}) AS keep_id,
       cast(count(*) as bigint) AS n_collapsed
FROM p GROUP BY 1 ORDER BY cell
"""
