"""Statistics sidecar tests (reference test analog:
`core/store/src/test/.../statistics/*` + SplitsProvider balancing)."""

import pytest

from geowave_spark.table import geo
from geowave_spark.agg import stats


@pytest.fixture(scope="module")
def events_pts(spark, sf_dir):
    from geowave_spark.table.views import register_views

    register_views(spark, sf_dir)
    return spark.sql(geo.events_points_sql()).cache()


def test_count_bbox_timerange(spark, sf_dir, events_pts):
    n = stats.count_stat(events_pts).collect()[0]["n"]
    assert n == events_pts.count()
    bb = stats.bbox_stat(events_pts).collect()[0]
    assert -180 <= bb["min_lon"] <= bb["max_lon"] <= 180
    assert -90 <= bb["min_lat"] <= bb["max_lat"] <= 90
    tr = stats.time_range_stat(spark.table("events"), "ts").collect()[0]
    assert tr["min_ts"] <= tr["max_ts"]


def test_numeric_stats_and_histogram(spark, events_pts):
    st = stats.numeric_stats(events_pts, "value").collect()[0]
    assert st["min"] <= st["mean"] <= st["max"]
    hist = stats.fixed_bin_histogram(events_pts, "value", 0.0, 500.0, 16)
    rows = hist.collect()
    assert sum(r["n"] for r in rows) == st["n"]
    assert all(0 <= r["bucket"] < 16 for r in rows)


def test_approx_distinct_close_to_exact(spark, events_pts):
    approx = stats.approx_distinct(events_pts, "eid").collect()[0]["approx_distinct"]
    exact = events_pts.select("eid").distinct().count()
    assert abs(approx - exact) / exact < 0.1


def test_countmin_and_bloom(spark, sf_dir, events_pts):
    ev = spark.table("events")
    sketch = stats.countmin_sketch(ev, "event_type").collect()
    exact = ev.filter("event_type = 'view'").count()
    est = stats.cms_estimate(spark, sketch, "view")
    # CMS overestimates but never underestimates
    assert est >= exact
    assert est <= ev.count()

    bits = {r["bit"] for r in stats.bloom_filter(ev, "user_id").collect()}
    uid = ev.select("user_id").first()["user_id"]
    assert stats.bloom_might_contain(spark, bits, uid)
    # an id far outside the domain is (overwhelmingly likely) absent
    assert not stats.bloom_might_contain(spark, bits, -987654321012345)


def test_cell_histogram_drives_salt(spark, events_pts):
    hist = stats.cell_histogram(events_pts, res=4).cache()
    n_cells = hist.count()
    assert n_cells > 0
    total = hist.agg({"n": "sum"}).collect()[0][0]
    assert total == events_pts.count()
    # tiny target forces multiple buckets; huge target forces 1
    assert stats.recommend_salt(hist, target_rows_per_task=1) > 1
    assert stats.recommend_salt(hist, target_rows_per_task=10**9) == 1


def test_partition_metrics(spark, events_pts):
    pm = stats.partition_metrics(events_pts.repartition(4)).collect()
    assert sum(r["n"] for r in pm) == events_pts.count()
    assert len(pm) <= 4


def test_balance_partitions_equalizes_skewed_key(spark, sf_dir):
    """SplitsProvider analog: on a heavily skewed cell key, range
    partitioning by sampled quantiles yields near-equal partition row
    counts where hash partitioning leaves the hot key in one partition."""
    from pyspark.sql import functions as F

    from geowave_spark.agg import stats as S

    # 90% of rows share one hot key, the rest spread over 1000 keys
    df = spark.range(0, 100_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 1000)
        .cast("long").alias("cell")
    )
    parts = (
        S.balance_partitions(df, "cell", 8)
        .withColumn("p", F.spark_partition_id())
        .groupBy("p").count().collect()
    )
    sizes = sorted(r["count"] for r in parts)
    # the hot key is indivisible (all-equal values can't straddle a range
    # boundary usefully), but no partition should exceed hot+fair share,
    # and the non-hot mass must spread: at least 4 real partitions
    assert len(sizes) >= 4
    assert max(sizes) <= 91_000
    # hash partitioning for contrast: hot partition ~90k AND collisions
    hash_parts = (
        df.repartition(8, "cell").withColumn("p", F.spark_partition_id())
        .groupBy("p").count().collect()
    )
    assert max(r["count"] for r in hash_parts) >= 90_000


def test_incremental_stats_monoid_parity(spark, events_pts):
    """stats over the full table == merge of per-batch states — the
    reference's write-time incremental maintenance contract
    (`StatisticUpdateCallback.java:87`, partial-value merges in
    `StatisticValueWriter`/`Reader`)."""
    ev = events_pts
    halves = [ev.filter(f"pmod(eid, 2) = {i}") for i in (0, 1)]

    full = stats.stats_report(stats.stats_state(
        ev, value="value", distinct="event_type")).collect()[0]
    merged = stats.stats_report(stats.merge_stats_states(*[
        stats.stats_state(h, value="value", distinct="event_type")
        for h in halves])).collect()[0]

    assert merged["n"] == full["n"]
    for c in ("lon0", "lon1", "lat0", "lat1", "vmin", "vmax"):
        assert merged[c] == full[c], c
    # sketches union losslessly: identical estimate, not just close
    assert merged["n_distinct"] == full["n_distinct"]
    assert abs(merged["vmean"] - full["vmean"]) < 1e-9
    assert abs(merged["vstd"] - full["vstd"]) < 1e-9

    # three-way split and merge-of-merges (associativity)
    thirds = [ev.filter(f"pmod(eid, 3) = {i}") for i in range(3)]
    s = [stats.stats_state(t, value="value", distinct="event_type")
         for t in thirds]
    m1 = stats.merge_stats_states(stats.merge_stats_states(s[0], s[1]), s[2])
    r1 = stats.stats_report(m1).collect()[0]
    assert r1["n"] == full["n"] and r1["n_distinct"] == full["n_distinct"]


def test_merge_cell_hists(spark, events_pts):
    ev = events_pts
    halves = [ev.filter(f"pmod(eid, 2) = {i}") for i in (0, 1)]
    full = {r["cell"]: r["n"]
            for r in stats.cell_histogram(ev, 4).collect()}
    merged = {r["cell"]: r["n"]
              for r in stats.merge_cell_hists(
                  *[stats.cell_histogram(h, 4) for h in halves]).collect()}
    assert merged == full
