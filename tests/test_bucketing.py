"""Bucketed co-located join: correctness + zero-Exchange plan guarantee
(the ingest-time SFC-sort analog — see geowave_spark/table/bucketing.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geowave_spark.index import cover as cov
from geowave_spark.table import bucketing
from geowave_spark.table.views import register_views


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    # warehouse.dir is a static conf — park the managed tables in a
    # tmp-located database instead
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bdb LOCATION '{wh}'")
    register_views(spark, sf_dir)
    from geowave_spark.table import geo

    pts = spark.sql(geo.lineitem_points_sql())
    left = cov.add_point_cells(pts, "lon", "lat", 6).select("pid", "cell")
    right = (
        cov.add_point_cells(
            spark.sql(geo.lineitem_points_sql()).withColumn(
                "lon", F.col("lon") * 0.999
            ),
            "lon", "lat", 6,
        )
        .select(F.col("pid").alias("rid"), "cell")
    )
    bucketing.write_bucketed(left, "bdb.b_left", 8)
    bucketing.write_bucketed(right, "bdb.b_right", 8)
    return "bdb.b_left", "bdb.b_right"


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    df = bucketing.bucketed_equi_join(spark, lt, rt)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    lt, rt = bucketed_tables
    got = (
        bucketing.bucketed_equi_join(spark, lt, rt)
        .groupBy().agg(F.count("*").alias("n"), F.sum("cell").alias("s"))
        .collect()[0]
    )
    want = (
        spark.table(lt).join(spark.table(rt), "cell")
        .groupBy().agg(F.count("*").alias("n"), F.sum("cell").alias("s"))
        .collect()[0]
    )
    assert got["n"] == want["n"] and got["s"] == want["s"]
    assert got["n"] > 0


def test_bucket_pruning_single_key(spark, bucketed_tables):
    """Point lookup on the bucketed key scans only the matching bucket
    (SelectedBucketsCount in the scan) — the key/value range-scan analog."""
    lt, _ = bucketed_tables
    some = spark.table(lt).limit(1).collect()[0]["cell"]
    # the planner turns bucketed scans off when no join needs them; force
    # the bucketed read so the filter can prune to a single bucket
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled",
                   "false")
    try:
        df = spark.table(lt).filter(F.col("cell") == int(some))
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
        assert df.count() > 0
    finally:
        spark.conf.unset(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled")
