"""Statistics sidecar: persisted dataset summaries that drive planning.

Reference analog (/root/reference): GeoWave maintains incrementally-updated
per-index / per-type / per-field statistics used for query planning and split
balancing — `core/store/src/main/java/.../core/store/statistics/*`:

- CountStatistic.java, BoundingBoxStatistic.java, TimeRangeStatistic.java
- NumericMeanStatistic / NumericRangeStatistic / NumericStatsStatistic
- FixedBinNumericHistogramStatistic / NumericHistogramStatistic
- HyperLogLogStatistic / CountMinSketchStatistic / BloomFilterStatistic
- RowRangeHistogramStatistic (drives SplitsProvider.java:284-325 split
  balancing and OptimalExpressionQuery.java:176-193 index selection)

Spark-first re-expression: statistics are *snapshot* aggregates over the
DataFrame (Spark's partial+final aggregation replaces GeoWave's
server-side merge of Mergeable statistics), persisted by the caller as a
small sidecar table.  The row-range histogram becomes a per-cell row-count
table whose only consumer is `recommend_salt` — the explicit skew-handling
knob the north rule requires.  Everything here is JVM-side (whole-stage
codegen); no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..table import geo


def count_stat(df: DataFrame) -> DataFrame:
    """CountStatistic analog."""
    return df.agg(F.count("*").alias("n"))


def bbox_stat(df: DataFrame, lon: str = "lon", lat: str = "lat") -> DataFrame:
    """BoundingBoxStatistic analog: envelope union as 4 scalar aggs."""
    return df.agg(
        F.min(lon).alias("min_lon"), F.max(lon).alias("max_lon"),
        F.min(lat).alias("min_lat"), F.max(lat).alias("max_lat"),
    )


def time_range_stat(df: DataFrame, ts: str) -> DataFrame:
    """TimeRangeStatistic analog."""
    return df.agg(F.min(ts).alias("min_ts"), F.max(ts).alias("max_ts"))


def numeric_stats(df: DataFrame, col: str) -> DataFrame:
    """NumericStatsStatistic analog (count/min/max/mean/stddev/M2)."""
    return df.agg(
        F.count(col).alias("n"),
        F.min(col).alias("min"),
        F.max(col).alias("max"),
        F.avg(col).alias("mean"),
        F.stddev_pop(col).alias("stddev"),
    )


def fixed_bin_histogram(df: DataFrame, col: str, lo: float, hi: float,
                        bins: int = 32) -> DataFrame:
    """FixedBinNumericHistogramStatistic analog.

    Closed-form bucket arithmetic (shared with the SQL oracle via
    `bucket_sql`) instead of width_bucket so both engines agree bit-for-bit.
    """
    return (
        df.withColumn("bucket", F.expr(bucket_sql(col, lo, hi, bins)))
        .groupBy("bucket").agg(F.count("*").alias("n"))
    )


def bucket_sql(col: str, lo: float, hi: float, bins: int) -> str:
    """SQL fragment valid in Spark SQL and DuckDB: value -> bin [0, bins)."""
    return (
        f"least(greatest(cast(floor((({col}) - {lo!r}) / ({hi!r} - {lo!r}) "
        f"* {bins}) as bigint), 0), {bins - 1})"
    )


def approx_distinct(df: DataFrame, col: str, rsd: float = 0.05) -> DataFrame:
    """HyperLogLogStatistic analog (Spark's own HLL++)."""
    return df.agg(F.approx_count_distinct(col, rsd).alias("approx_distinct"))


def countmin_sketch(df: DataFrame, col: str, width: int = 256,
                    depth: int = 4) -> DataFrame:
    """CountMinSketchStatistic analog as a mergeable counter table.

    One groupBy over (hash-row, bucket) pairs; the result is a small
    (depth x width) sparse counter DataFrame that merges across datasets by
    element-wise sum — the same commutative-monoid contract as the
    reference's Mergeable statistics.  Buckets use xxhash64 with the row
    index as seed, so `cms_estimate` can re-derive them for any probe value.
    """
    rows = [
        df.select(
            F.lit(d).alias("row"),
            F.pmod(F.xxhash64(F.col(col), F.lit(d)), F.lit(width)).alias("bucket"),
        )
        for d in range(depth)
    ]
    allrows = rows[0]
    for r in rows[1:]:
        allrows = allrows.unionByName(r)
    return allrows.groupBy("row", "bucket").agg(F.count("*").alias("n"))


def _probe_lit(value):
    """Literal with the same Spark type the column hash saw (xxhash64 is
    type-sensitive: int32 and int64 of the same value hash differently)."""
    c = F.lit(value)
    if isinstance(value, bool):
        return c
    if isinstance(value, int):
        return c.cast("long")
    return c


def cms_estimate(spark, sketch_rows, value, width: int = 256,
                 depth: int = 4) -> int:
    """Point estimate from a collected countmin sketch (min over rows).

    ``sketch_rows`` is `countmin_sketch(...).collect()`.  Probe buckets are
    computed with the same JVM xxhash64 (one tiny local job) so build and
    probe hashing can never drift.
    """
    counters = {(r["row"], r["bucket"]): r["n"] for r in sketch_rows}
    probe = spark.range(1).select(
        *[
            F.pmod(F.xxhash64(_probe_lit(value), F.lit(d)), F.lit(width)).alias(f"b{d}")
            for d in range(depth)
        ]
    ).collect()[0]
    return min(counters.get((d, probe[f"b{d}"]), 0) for d in range(depth))


def bloom_filter(df: DataFrame, col: str, m_bits: int = 1 << 16,
                 k_hashes: int = 5) -> DataFrame:
    """BloomFilterStatistic analog: DataFrame of set bit positions.

    Mergeable by union/distinct.  At scale the position set is bounded by
    m_bits regardless of input size.
    """
    rows = [
        df.select(F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(m_bits)).alias("bit"))
        for i in range(k_hashes)
    ]
    allrows = rows[0]
    for r in rows[1:]:
        allrows = allrows.unionByName(r)
    return allrows.distinct()


def bloom_might_contain(spark, bits: set, value, m_bits: int = 1 << 16,
                        k_hashes: int = 5) -> bool:
    """Probe a collected bloom bit set (bits = {r['bit'] for r in collect()})."""
    probe = spark.range(1).select(
        *[
            F.pmod(F.xxhash64(_probe_lit(value), F.lit(i)), F.lit(m_bits)).alias(f"b{i}")
            for i in range(k_hashes)
        ]
    ).collect()[0]
    return all(probe[f"b{i}"] in bits for i in range(k_hashes))


# ---------------------------------------------------------------------------
# row-range histogram -> salting factor (the skew-handling loop)


def cell_histogram(df: DataFrame, res: int, lon: str = "lon",
                   lat: str = "lat") -> DataFrame:
    """RowRangeHistogramStatistic analog: rows per grid cell.

    Uses the closed-form row-major cell id (JVM arithmetic, oracle-shared) —
    this is planner metadata, so the cheap curve is the right one.
    """
    return (
        df.withColumn("cell", F.expr(geo.rowmajor_cell_sql(lon, lat, res)))
        .groupBy("cell").agg(F.count("*").alias("n"))
    )


def recommend_salt(cell_hist: DataFrame, target_rows_per_task: int = 100_000,
                   cap: int = 64) -> int:
    """Salt-bucket count from the hottest cell (SplitsProvider balancing
    analog): enough buckets that the hottest cell splits to ~target rows."""
    row = cell_hist.agg(F.max("n").alias("hot")).collect()[0]
    hot = row["hot"] or 0
    import math

    return max(1, min(cap, math.ceil(hot / max(1, target_rows_per_task))))


def partition_metrics(df: DataFrame) -> DataFrame:
    """PartitionsStatistic analog: rows per physical Spark partition
    (observability for the north rule's per-partition metrics)."""
    return (
        df.withColumn("pid_", F.spark_partition_id())
        .groupBy("pid_").agg(F.count("*").alias("n"))
        .withColumnRenamed("pid_", "partition")
    )


def balance_partitions(df: DataFrame, key: str, n_parts: int) -> DataFrame:
    """Statistics-balanced splits: range-partition on ``key`` into
    equal-CARDINALITY chunks.

    Reference analog (/root/reference): `core/mapreduce/.../splits/
    SplitsProvider.java:62-325` slices SFC key ranges into splits of equal
    estimated row count using the RowRangeHistogram statistic, so no task
    owns a disproportionate key range.  Spark-first: `repartitionByRange`
    IS that operator — it samples the key distribution (the histogram) and
    picks quantile boundaries, so skewed keys still land in balanced
    partitions.  Pair with `sortWithinPartitions(key)` to reproduce the
    reference's within-split SFC ordering for scan locality.
    """
    from pyspark.sql import functions as F  # noqa: N812

    return df.repartitionByRange(n_parts, F.col(key)).sortWithinPartitions(key)


# ------------------------------------------------- incremental maintenance

def stats_state(
    df: DataFrame,
    *,
    lon: str = "lon",
    lat: str = "lat",
    value: str | None = None,
    distinct: str | None = None,
    ts: str | None = None,
) -> DataFrame:
    """One MERGEABLE statistics row for a batch of rows.

    The reference maintains its statistics incrementally at write time —
    every ingested entry flows through `StatisticUpdateCallback.
    entryIngested` (`core/store/src/main/java/.../statistics/
    StatisticUpdateCallback.java:87`) and periodically-merged partials
    (`StatisticValueWriter`/`StatisticValueReader`).  Spark-first, the
    same contract is a commutative-monoid state row per ingest batch:
    every component merges associatively (`merge_stats_states`), so a
    100 TB store never recomputes statistics from scratch — each new
    batch contributes one tiny state row, and reads fold the rows.

    Components: row count; bbox (min/max lon/lat); optional time range;
    optional value min/max/sum/sum-of-squares (mean/std derivable);
    optional distinct-count as a Datasketches HLL sketch binary
    (`hll_sketch_agg` — sketches union losslessly, unlike a scalar
    `approx_count_distinct` which cannot be merged after the fact).
    """
    from pyspark.sql import functions as F  # noqa: N812

    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.min(lon).alias("lon0"), F.max(lon).alias("lon1"),
        F.min(lat).alias("lat0"), F.max(lat).alias("lat1"),
    ]
    if ts is not None:
        aggs += [F.min(ts).alias("ts0"), F.max(ts).alias("ts1")]
    if value is not None:
        c = F.col(value).cast("double")
        aggs += [
            F.min(c).alias("vmin"), F.max(c).alias("vmax"),
            F.sum(c).alias("vsum"), F.sum(c * c).alias("vsumsq"),
        ]
    if distinct is not None:
        aggs += [F.hll_sketch_agg(distinct).alias("hll")]
    return df.agg(*aggs)


def merge_stats_states(*states: DataFrame) -> DataFrame:
    """Fold any number of `stats_state` rows into one (associative and
    commutative — the reference's `StatisticValueReader` merge loop)."""
    from functools import reduce

    from pyspark.sql import functions as F  # noqa: N812

    u = reduce(lambda a, b: a.unionByName(b), states)
    cols = set(u.columns)
    aggs = [
        F.sum("n").alias("n"),
        F.min("lon0").alias("lon0"), F.max("lon1").alias("lon1"),
        F.min("lat0").alias("lat0"), F.max("lat1").alias("lat1"),
    ]
    if "ts0" in cols:
        aggs += [F.min("ts0").alias("ts0"), F.max("ts1").alias("ts1")]
    if "vmin" in cols:
        aggs += [
            F.min("vmin").alias("vmin"), F.max("vmax").alias("vmax"),
            F.sum("vsum").alias("vsum"), F.sum("vsumsq").alias("vsumsq"),
        ]
    if "hll" in cols:
        aggs += [F.hll_union_agg("hll").alias("hll")]
    return u.agg(*aggs)


def stats_report(state: DataFrame) -> DataFrame:
    """Finalize a (possibly merged) state row into user-facing numbers:
    distinct estimate from the HLL sketch, mean/std from the moments."""
    from pyspark.sql import functions as F  # noqa: N812

    cols = set(state.columns)
    out = state
    if "hll" in cols:
        out = out.withColumn(
            "n_distinct", F.hll_sketch_estimate("hll")).drop("hll")
    if "vmin" in cols:
        mean = F.col("vsum") / F.col("n")
        out = (
            out.withColumn("vmean", mean)
            .withColumn(
                "vstd",
                F.sqrt(F.greatest(
                    F.col("vsumsq") / F.col("n") - mean * mean,
                    F.lit(0.0))))
            .drop("vsum", "vsumsq")
        )
    return out


def merge_cell_hists(*hists: DataFrame) -> DataFrame:
    """Merge per-batch `cell_histogram` outputs: union + keyed sum —
    the binned-statistic merge (`StatisticValueWriter` per-bin merge)."""
    from functools import reduce

    from pyspark.sql import functions as F  # noqa: N812

    u = reduce(lambda a, b: a.unionByName(b), hists)
    return u.groupBy("cell").agg(F.sum("n").alias("n"))
