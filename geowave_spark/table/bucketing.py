"""Bucketed (co-located) cell joins: the shuffle-free big-big join path.

Reference analog (/root/reference): GeoWave physically sorts rows by
(tier, bin, SFC key) inside its key/value store so range scans and the
tiered join's cogroups read co-located data
(`core/index/.../sfc/tiered/TieredSFCIndexStrategy.java:392-407` key
layout; `analytics/spark/.../spatial/TieredSpatialJoin.java:168-172`
re-partitions both RDDs onto one HashPartitioner before cogrouping).

Spark-first re-expression: persist each side bucketed BY THE CELL KEY
(`bucketBy(n, "cell")` + `sortBy("cell")`).  Two tables bucketed on the
same key with the same bucket count join with ZERO Exchange — each task
zips bucket i of both sides — which at 100 TB removes the single largest
cost of a big-big spatial join (shuffling both sides).  This is the
parquet-warehouse twin of Iceberg's `bucket(N, cell)` partition transform +
storage-partitioned joins; AQE handles residual bucket skew.

The write itself costs one shuffle (that is where the co-location is
paid for), amortized across every subsequent join — exactly the
reference's ingest-time SFC sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int,
    key: str = "cell",
    sort: bool = True,
) -> None:
    """Persist ``df`` as a parquet table bucketed (and bucket-sorted) on
    ``key``.  Overwrites an existing table of the same name."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_equi_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str = "cell",
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on ``key`` without any shuffle.

    Disables broadcast so the plan demonstrates the co-located
    SortMergeJoin both sides read bucket-aligned; on real data sizes the
    optimizer keeps this shape on its own (neither side fits broadcast).
    """
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.hint("merge").join(right, key, how)
