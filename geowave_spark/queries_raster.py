"""Raster/image query registry entries: tile assignment, merge, pyramid.

The engine side runs the real distributed pipeline (mapInPandas synthesis ->
cover -> keyed shuffle merge); the oracle recomputes the closed-form
assignment plan in DuckDB SQL (level selection + generate_series bbox cover)
— the indexed-vs-independent-formulation equivalence pattern of the
reference (`test/.../spark/GeoWaveSparkSpatialJoinIT.java:98-176`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: N812

from .raster import tiles
from .table import images


def _register_documents(spark: SparkSession, sf_dir: str) -> None:
    images._register_documents(spark, sf_dir)


def _images(spark: SparkSession, sf_dir: str) -> DataFrame:
    return images.images_df(spark, sf_dir)


def q11_tile_assign_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster->vector tile assignment plan (image_id, res, tile_id).

    Runs the JVM-only closed-form path (no pixel synthesis, no Python):
    the plan needs only footprints, and `images_scalars_df` keeps Catalyst
    column pruning + WholeStageCodegen intact end-to-end.  Equality with
    the mapInPandas path is asserted in tests/test_raster.py.
    """
    return tiles.assign_plan_sql_df(
        images.images_scalars_df(spark, sf_dir)
    ).orderBy("image_id", "res", "tile_id")


def _plan_oracle_sql(order_by: bool = True) -> str:
    res_sql = tiles.level_res_sql("lon0", "lon1", "w")
    n = "cast(pow(2, res) as bigint)"
    return f"""
WITH base AS ({images.images_base_sql()}),
b2 AS (SELECT image_id, lon0, lat0, lon1, lat1, {res_sql} AS res FROM base),
b3 AS (SELECT image_id, res,
  least(greatest(cast(ceil((lon0 + 180e0) / 360e0 * {n}) as bigint) - 1, 0), {n}-1) AS x0,
  least(greatest(cast(ceil((lat0 + 90e0) / 180e0 * {n}) as bigint) - 1, 0), {n}-1) AS y0,
  least(greatest(cast(ceil((lon1 + 180e0) / 360e0 * {n}) as bigint) - 1, 0), {n}-1) AS x1,
  least(greatest(cast(ceil((lat1 + 90e0) / 180e0 * {n}) as bigint) - 1, 0), {n}-1) AS y1,
  {n} AS n FROM b2)
SELECT image_id, cast(res as int) AS res, (y0 + dy.g) * n + (x0 + dx.g) AS tile_id
FROM b3, LATERAL (SELECT unnest(generate_series(0, y1 - y0)) AS g) dy,
         LATERAL (SELECT unnest(generate_series(0, x1 - x0)) AS g) dx
{"ORDER BY image_id, res, tile_id" if order_by else ""}
"""


Q11_SQL = _plan_oracle_sql()


def q12_tile_merge_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pixel path: synthesize -> decode -> tile -> no-data merge; the
    hash-checked output is the per-tile mosaic source count."""
    t = tiles.assign_tiles_df(_images(spark, sf_dir))
    merged = tiles.merge_tiles_df(t)
    return merged.select("res", "tile_id", "n_src").orderBy("res", "tile_id")


Q12_SQL = f"""
WITH plan AS ({_plan_oracle_sql(order_by=False)})
SELECT res, tile_id, cast(count(*) as int) AS n_src
FROM plan GROUP BY res, tile_id ORDER BY res, tile_id
"""


def q13_image_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Input-table integrity: the distributed synthesis (mapInPandas) must
    reproduce the closed-form scalar projection bit-for-bit, caption
    included (caption-equality invariant of the north rule)."""
    df = _images(spark, sf_dir)
    return df.select(
        "image_id", "w", "h", "fmt", "caption",
        F.expr("cast(floor(lon0 * 1000000) as bigint)").alias("lon0_micro"),
        F.expr("cast(floor(lat0 * 1000000) as bigint)").alias("lat0_micro"),
        F.expr("cast(floor(lon1 * 1000000) as bigint)").alias("lon1_micro"),
        F.expr("cast(floor(lat1 * 1000000) as bigint)").alias("lat1_micro"),
    ).orderBy("image_id")


Q13_SQL = f"""
WITH base AS ({images.images_base_sql()})
SELECT image_id, w, h, fmt, caption,
       cast(floor(lon0 * 1000000) as bigint) AS lon0_micro,
       cast(floor(lat0 * 1000000) as bigint) AS lat0_micro,
       cast(floor(lon1 * 1000000) as bigint) AS lon1_micro,
       cast(floor(lat1 * 1000000) as bigint) AS lat1_micro
FROM base ORDER BY image_id
"""


def q14_pyramid_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pyramid build: merged tiles -> parent level; verify parent tile ids +
    child counts against the closed-form parent computed in SQL."""
    t = tiles.assign_tiles_df(_images(spark, sf_dir))
    merged = tiles.merge_tiles_df(t)
    parents = tiles.pyramid_level_df(merged)
    return parents.select("res", "tile_id", "n_src").orderBy("res", "tile_id")


# parent of rowmajor cell at res r: (y>>1)*2^(r-1) + (x>>1)
Q14_SQL = f"""
WITH plan AS ({_plan_oracle_sql(order_by=False)}),
tiles AS (SELECT DISTINCT res, tile_id FROM plan),
parents AS (
  SELECT res,
         (tile_id // cast(pow(2, res) as bigint) // 2) * cast(pow(2, res - 1) as bigint)
           + (tile_id % cast(pow(2, res) as bigint)) // 2 AS ptile
  FROM tiles
)
SELECT cast(res - 1 as int) AS res, ptile AS tile_id, cast(count(*) as int) AS n_src
FROM parents GROUP BY 1, 2 ORDER BY res, tile_id
"""

def q35_raster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-coverage pixel statistics (RasterHistogramStatistic /
    RasterOverviewStatistic analogs).  The engine decodes real bytes
    (mapInPandas -> numpy); the oracle recomputes every pixel's luma from
    the closed-form synthesis parameters — two independent paths."""
    from .raster import stats as rstats

    return (
        rstats.image_stats_df(_images(spark, sf_dir))
        .select("image_id", "n_px", "luma_min", "luma_max", "luma_mean_milli")
        .orderBy("image_id")
    )


Q35_SQL = f"""
WITH dims AS (
  SELECT doc_id, {images.image_id_sql()} AS image_id,
         {images.w_sql()} AS w, {images.h_sql()} AS h
  FROM documents
),
lum AS (
  SELECT doc_id, image_id, {images.luma_sql('px.g', 'py.g', decoded=True)} AS luma
  FROM dims, LATERAL (SELECT unnest(generate_series(0, w - 1)) AS g) px,
             LATERAL (SELECT unnest(generate_series(0, h - 1)) AS g) py
)
SELECT image_id, cast(count(*) as bigint) AS n_px,
       cast(min(luma) as int) AS luma_min,
       cast(max(luma) as int) AS luma_max,
       cast((sum(luma) * 1000) // count(*) as bigint) AS luma_mean_milli
FROM lum GROUP BY image_id ORDER BY image_id
"""


def q49_tile_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tile resize / re-tile (RasterTileResizeSparkRunner analog,
    `analytics/spark/.../resize/RasterTileResizeSparkRunner.java:100-178` in
    /root/reference): merged mosaics resampled to an 8px tile size; tile ids
    are preserved and every output tile decodes to the new dimensions.
    The oracle recomputes the surviving (res, tile_id) set closed-form."""
    import pandas as pd

    from .raster import codec

    t = tiles.assign_tiles_df(_images(spark, sf_dir))
    merged = tiles.merge_tiles_df(t)
    small = tiles.resize_tiles_df(merged.select("res", "tile_id", "px"), 8)

    def dims(pdf_iter):
        for pdf in pdf_iter:
            hw = [codec.png_decode(bytes(b)).shape[:2] for b in pdf["px"]]
            yield pd.DataFrame(
                {
                    "res": pdf["res"],
                    "tile_id": pdf["tile_id"],
                    "out_h": [h for h, _ in hw],
                    "out_w": [w for _, w in hw],
                }
            )

    return small.mapInPandas(
        dims, schema="res int, tile_id long, out_h int, out_w int"
    ).orderBy("res", "tile_id")


Q49_SQL = f"""
WITH plan AS ({_plan_oracle_sql(order_by=False)})
SELECT DISTINCT res, tile_id, cast(8 as int) AS out_h, cast(8 as int) AS out_w
FROM plan ORDER BY res, tile_id
"""


RASTER_QUERIES = {
    "q11_tile_assign_plan": (q11_tile_assign_plan, Q11_SQL),
    "q12_tile_merge_counts": (q12_tile_merge_counts, Q12_SQL),
    "q13_image_scalars": (q13_image_scalars, Q13_SQL),
    "q14_pyramid_counts": (q14_pyramid_counts, Q14_SQL),
    "q35_raster_stats": (q35_raster_stats, Q35_SQL),
    "q49_tile_resize": (q49_tile_resize, Q49_SQL),
}
