"""spark-submit job: flagship spatial join + tile assignment.

North-rule evidence: "The job runs via spark-submit --py-files on
multi-executor clusters".  Usage:

    python tools/make_pyfiles_zip.py
    spark-submit --master local[8] --py-files dist/geowave_spark.zip \
        tools/job_spatial_join.py --sf-dir /root/testdata/sf0.01

Prints one JSON line with output row counts and wall seconds.  The script
imports `geowave_spark` from the --py-files zip (no repo on sys.path), so
it exercises exactly the deployment shape a real cluster uses.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--with-tiles", action="store_true")
    ap.add_argument(
        "--checkpoint-dir",
        help="write the join output via the resumable per-partition "
        "checkpoint protocol (atomic commits + lineage/metrics sidecars); "
        "a re-run against the same dir skips committed partitions",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("geowave-submit-job").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from geowave_spark.join import spatial
    from geowave_spark.table import geo
    from geowave_spark.table.views import register_views

    register_views(spark, args.sf_dir)
    out = {"sf_dir": args.sf_dir, "master": spark.sparkContext.master}

    t0 = time.time()
    pts = spark.sql(geo.lineitem_points_sql())
    rects = spark.sql(geo.supplier_rects_sql()).toPandas()
    joined = spatial.point_in_rects_join(spark, pts, rects, res=8)
    if args.checkpoint_dir:
        # the full north-rule job shape: spark-submit --py-files driving a
        # resumable checkpointed sink with per-partition lineage + metrics
        from geowave_spark.plans import checkpoint

        summary = checkpoint.resumable_write(joined, args.checkpoint_dir, key="pid")
        out["ckpt"] = summary
        out["ckpt_metrics_files"] = len(checkpoint.partition_metrics(args.checkpoint_dir))
        out["join_rows"] = checkpoint.load(spark, args.checkpoint_dir).count()
    else:
        out["join_rows"] = joined.count()
    out["join_sec"] = round(time.time() - t0, 3)

    if args.with_tiles:
        from geowave_spark.raster import tiles
        from geowave_spark.table import images

        t0 = time.time()
        merged = tiles.merge_tiles_df(tiles.assign_tiles_df(images.images_df(spark, args.sf_dir)))
        out["tile_rows"] = merged.count()
        out["tile_sec"] = round(time.time() - t0, 3)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
