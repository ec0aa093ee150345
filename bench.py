"""Benchmark driver: runs headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is materialized with the noop sink (full execution, no driver
collect overhead).  `python bench.py --scaling` additionally runs the
flagship join + tile workload at two parallelism levels (N and 4N cores on
the same input) and reports throughput scaling efficiency — the sandbox
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
        # same job, two parallelism levels, same input -> scaling efficiency
        eff = {}
        flagship = "q05_pip_rect_join"
        for cores in (CPUS // 4, CPUS):
            s = make_spark(cores)
            s.sparkContext.setLogLevel("ERROR")
            s.range(1000).count()
            run_query(s, flagship, SF_DIR)  # warm
            t = min(run_query(s, flagship, SF_DIR) for _ in range(2))
            eff[cores] = t
            s.stop()
        n, n4 = CPUS // 4, CPUS
        # efficiency = (throughput_4N / throughput_N) / 4 = t_N / (4 * t_4N)
        out["scaling"] = {
            "cores_n": n, "cores_4n": n4,
            "sec_n": round(eff[n], 3), "sec_4n": round(eff[n4], 3),
            "efficiency": round(eff[n] / (4 * eff[n4]), 3),
        }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
