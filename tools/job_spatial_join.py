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
    ap.add_argument(
        "--amplify", type=int, default=0,
        help="north-rule scale mode: amplify the point side to this many "
        "rows and run the flagship POLYGON join (supplier-rect 12-gons, "
        "single-tier cover + codegen raycast), best-of --reps timed counts",
    )
    ap.add_argument("--polys", type=int, default=100)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--tile-target", type=int, default=40_000,
        help="row count of the staged corpus snapshot table (--amplify mode)",
    )
    ap.add_argument(
        "--corpus-root", default=None,
        help="directory holding the staged corpus table (default: repo .scratch)",
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

    if args.amplify:
        # same workload definition as bench.py --scaling: scan the staged
        # Iceberg-analog image+caption snapshot table, amplify in flight
        from geowave_spark.table import corpus

        path = corpus.ensure_image_table(spark, args.sf_dir, args.tile_target,
                                         root=args.corpus_root)
        pts, _ = corpus.image_points(spark, path, amplify=args.amplify)
        polys = corpus.query_polygons(spark, args.sf_dir, max_polys=args.polys)
        joined = spatial.point_in_polygon_join(
            spark, pts, polys, data_res=10, max_cells=1024
        )
        out["join_rows"] = joined.count()  # warm
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.time()
            joined.count()
            best = min(best, time.time() - t0)
        out["join_sec"] = round(best, 3)
        out["join_rows_per_sec"] = round(out["join_rows"] / best, 1)
        print(json.dumps(out))
        spark.stop()
        return

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
