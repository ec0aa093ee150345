"""Benchmark driver: runs headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is materialized with the noop sink (full execution, no driver
collect overhead).  `python bench.py --scaling` additionally runs the two
north-rule workloads — the flagship spatial join and the raster tile
assignment — at two parallelism levels (N and 4N cores, same input) and
reports rows/sec at both plus throughput scaling efficiency: the sandbox
evidence for the north rule's N->4N executor criterion.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "q01_pricing_summary",
    "q02_top_revenue_orders",
    "q05_pip_rect_join",
    "q06_pip_rect_agg",
    "q07_distance_join_agg",
    "q08_knn",
    "q09_binned_agg",
    "q11_tile_assign_plan",
    "q12_tile_merge_counts",
    "q16_minhash_lsh_pairs",
    "q24_kde_heatmap",
]


def make_spark(cores: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"geowave-bench-{cores}")
        .config("spark.sql.shuffle.partitions", str(max(cores, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )


def run_query(spark, name: str, sf_dir: str) -> float:
    from geowave_spark.queries import QUERIES

    fn, _ = QUERIES[name]
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def _count_timed(df) -> tuple[int, float]:
    t0 = time.time()
    n = df.count()
    return n, time.time() - t0


def _scaling_workloads(spark, sf_dir: str) -> dict[str, tuple[int, float]]:
    """The two north-rule workloads; returns {name: (output_rows, sec)}."""
    from pyspark.sql import functions as F

    from geowave_spark.join import spatial
    from geowave_spark.raster import tiles
    from geowave_spark.table import geo, images
    from geowave_spark.table.views import register_views

    register_views(spark, sf_dir)
    out: dict[str, tuple[int, float]] = {}

    pts = spark.sql(geo.lineitem_points_sql())
    rects = spark.sql(geo.supplier_rects_sql()).toPandas()
    join_df = spatial.point_in_rects_join(spark, pts, rects, res=8)
    out["join"] = _count_timed(join_df)

    tile_df = tiles.merge_tiles_df(tiles.assign_tiles_df(images.images_df(spark, sf_dir)))
    out["tiles"] = _count_timed(tile_df)
    return out


def main() -> None:
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    spark = make_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/python workers with a trivial job
    spark.range(1000).count()

    times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        times[name] = round(run_query(spark, name, SF_DIR), 3)
    spark.stop()

    total = round(sum(times.values()), 3)
    out = {
        "metric": "headline_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "cpus": CPUS,
    }

    if "--scaling" in sys.argv:
        # same jobs, two parallelism levels, same input -> scaling efficiency
        n_lo, n_hi = CPUS // 4, CPUS
        runs: dict[int, dict[str, tuple[int, float]]] = {}
        for cores in (n_lo, n_hi):
            s = make_spark(cores)
            s.sparkContext.setLogLevel("ERROR")
            s.range(1000).count()
            _scaling_workloads(s, SF_DIR)  # warm (python workers, code paths)
            best: dict[str, tuple[int, float]] = {}
            for _ in range(2):
                r = _scaling_workloads(s, SF_DIR)
                for k, (rows, sec) in r.items():
                    if k not in best or sec < best[k][1]:
                        best[k] = (rows, sec)
            runs[cores] = best
            s.stop()
        scaling = {"cores_n": n_lo, "cores_4n": n_hi}
        for k in ("join", "tiles"):
            rows, sec_lo = runs[n_lo][k]
            _, sec_hi = runs[n_hi][k]
            # efficiency = (throughput_4N / throughput_N) / 4 = t_N / (4 * t_4N)
            scaling[k] = {
                "output_rows": rows,
                "sec_n": round(sec_lo, 3),
                "sec_4n": round(sec_hi, 3),
                "rows_per_sec_n": round(rows / sec_lo, 1),
                "rows_per_sec_4n": round(rows / sec_hi, 1),
                "efficiency": round(sec_lo / (4 * sec_hi), 3),
            }
        out["scaling"] = scaling

    print(json.dumps(out))


if __name__ == "__main__":
    main()
