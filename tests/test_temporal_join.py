"""Generic temporal join operators (`join/temporal.py`) vs brute-force
window/theta formulations."""
from pyspark.sql import Window, functions as F  # noqa: N812

from geowave_spark.join.temporal import asof_join, interval_join

DAY = 86_400


def _left(spark, n=3000):
    return spark.range(n).selectExpr(
        "id AS lid",
        f"cast(1000000 + (id * 7919) % (40 * {DAY}) as long) AS ts",
        "concat('k', id % 4) AS sym",
    )


def _right(spark, n=400):
    return spark.range(n).selectExpr(
        "id AS rid",
        f"cast(1000000 + (id * 104729) % (40 * {DAY}) as long) AS rts",
        "concat('k', id % 4) AS sym",
        "id * 10 AS px",
    )


def _brute_asof(left, right, by):
    cond = right["rts"] <= left["ts"]
    for k in by:
        cond = cond & (left[k] == right[k])
    w = Window.partitionBy("lid").orderBy(F.desc("rts"), F.desc("rid"))
    return (
        left.join(right, cond, "left")
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("lid", "rts", "rid", "px")
    )


def _norm(df):
    return sorted(tuple(r) for r in df.select("lid", "rts", "rid", "px").collect())


def test_asof_join_matches_brute_force(spark):
    left, right = _left(spark), _right(spark)
    got = asof_join(left, right, "ts", "rts", bin_size=DAY)
    assert _norm(got) == _norm(_brute_asof(left, right, []))


def test_asof_join_keyed(spark):
    left, right = _left(spark), _right(spark)
    got = asof_join(left, right, "ts", "rts", by=["sym"], bin_size=DAY)
    assert _norm(got) == _norm(_brute_asof(left, right, ["sym"]))


def test_asof_join_inner_drops_unmatched(spark):
    left = _left(spark)
    right = _right(spark).filter(f"rts > 20 * {DAY}")  # early rows unmatched
    outer = asof_join(left, right, "ts", "rts", bin_size=DAY)
    inner = asof_join(left, right, "ts", "rts", bin_size=DAY, how="inner")
    assert outer.count() == left.count()
    assert inner.count() == outer.filter("rid IS NOT NULL").count() < left.count()


def test_asof_join_no_cartesian_in_plan(spark):
    plan = asof_join(_left(spark), _right(spark), "ts", "rts",
                     bin_size=DAY)._jdf.queryExecution().executedPlan().toString()
    # the theta piece is only the per-(key,bin) fallback table (one row per
    # bin — broadcastable at any volume); a cartesian over the data sides
    # would mean the bin decomposition failed
    assert "CartesianProduct" not in plan


def test_interval_join_matches_theta(spark):
    rows = _left(spark)
    iv = spark.range(30).selectExpr(
        "id AS ivl_id",
        f"cast(1000000 + id * {DAY} as long) AS s",
        f"cast(1000000 + id * {DAY} + (id % 5 + 1) * {DAY} as long) AS e",
    )
    got = interval_join(rows, iv, ts="ts", start="s", end="e", bin_size=DAY)
    exp = rows.join(iv, (rows["ts"] >= iv["s"]) & (rows["ts"] < iv["e"]))
    key = lambda df: sorted((r["lid"], r["ivl_id"]) for r in df.collect())  # noqa: E731
    assert key(got) == key(exp)
    # shuffle variant agrees
    got2 = interval_join(rows, iv, ts="ts", start="s", end="e", bin_size=DAY,
                         broadcast_intervals=False)
    assert key(got2) == key(exp)
