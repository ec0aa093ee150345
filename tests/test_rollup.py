"""Continuous aggregate / hypertable rollup (`table/rollup.py`):
incremental refresh must scan only appended files yet equal a
from-scratch aggregation; non-append source ops force a rebuild."""
import pytest
from pyspark.sql import functions as F  # noqa: N812

from geowave_spark.table import rollup as R, snapshots as S


def _events(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id",
        "timestamp'2024-01-01' + make_interval(0,0,0,0,0,0, id*97) AS ts",
        "concat('t', id % 3) AS kind",
        "id % 101 AS v",
    )


def _full(spark, df):
    return (
        df.groupBy(F.date_trunc("day", "ts").alias("bucket"), "kind")
        .agg(F.count("*").alias("n"), F.sum("v").alias("sum_v"),
             F.min("v").alias("min_v"), F.max("v").alias("max_v"))
    )


def _assert_equals_full(spark, dst, df):
    got = sorted(S.scan(spark, dst).collect())
    exp = sorted(_full(spark, df).collect())
    assert got == exp


def test_incremental_refresh_scans_only_new_files(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "roll")
    S.create(_events(spark, 0, 5000), src, num_files=4)
    info = R.refresh_rollup(spark, src, dst, time_col="ts", keys=["kind"],
                            value_col="v")
    assert info["mode"] == "rebuild" and info["files_scanned"] == 4
    _assert_equals_full(spark, dst, _events(spark, 0, 5000))

    S.append(_events(spark, 5000, 7000), src, num_files=2)
    info = R.refresh_rollup(spark, src, dst, time_col="ts", keys=["kind"],
                            value_col="v")
    assert info["mode"] == "incremental"
    assert info["files_scanned"] == 2  # ONLY the appended files
    _assert_equals_full(spark, dst, _events(spark, 0, 7000))

    # idempotent: nothing new -> noop
    info = R.refresh_rollup(spark, src, dst, time_col="ts", keys=["kind"],
                            value_col="v")
    assert info["mode"] == "noop"


def test_non_append_source_forces_rebuild(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "roll")
    S.create(_events(spark, 0, 3000), src, num_files=3)
    R.refresh_rollup(spark, src, dst, time_col="ts", keys=["kind"],
                     value_col="v")
    S.delete_where(spark, src, "v >= 50")
    info = R.refresh_rollup(spark, src, dst, time_col="ts", keys=["kind"],
                            value_col="v")
    assert info["mode"] == "rebuild"  # delete rewrote already-counted rows
    _assert_equals_full(spark, dst,
                        _events(spark, 0, 3000).filter("v < 50"))


def test_rollup_time_travel(spark, tmp_path):
    """Each refresh is a snapshot: the rollup AS OF the first batch stays
    readable after later refreshes."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "roll")
    S.create(_events(spark, 0, 2000), src, num_files=2)
    R.refresh_rollup(spark, src, dst, time_col="ts", keys=["kind"],
                     value_col="v")
    S.append(_events(spark, 2000, 4000), src, num_files=2)
    R.refresh_rollup(spark, src, dst, time_col="ts", keys=["kind"],
                     value_col="v")
    v1 = S.scan(spark, dst, snapshot=1).agg(F.sum("n")).first()[0]
    v2 = S.scan(spark, dst).agg(F.sum("n")).first()[0]
    assert (v1, v2) == (2000, 4000)


def test_overwrite_op(spark, tmp_path):
    path = str(tmp_path / "t")
    S.overwrite(spark.range(10).selectExpr("id", "id*2 AS y"), path,
                num_files=1, summary_extra={"mark": 7})
    S.overwrite(spark.range(3).selectExpr("id", "id*3 AS y"), path,
                num_files=1, summary_extra={"mark": 9})
    assert S.scan(spark, path).count() == 3
    assert S.scan(spark, path, snapshot=1).count() == 10
    assert S.load_manifest(path)["summary"]["mark"] == 9
    assert [h["operation"] for h in S.history(path)] == ["overwrite", "overwrite"]


def test_expired_window_snapshot_forces_rebuild(spark, tmp_path):
    """An expired manifest inside the diff window could hide a delete, so
    the refresh must not trust the remaining history — rebuild."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "roll")
    S.create(_events(spark, 0, 2000), src, num_files=2)
    R.refresh_rollup(spark, src, dst, time_col="ts", keys=["kind"],
                     value_col="v")
    S.delete_where(spark, src, "v >= 50")          # snapshot 2 (delete)
    S.append(_events(spark, 2000, 2500), src)      # snapshot 3
    S.expire_snapshots(src, keep_last=1)           # delete's manifest gone
    info = R.refresh_rollup(spark, src, dst, time_col="ts", keys=["kind"],
                            value_col="v")
    assert info["mode"] == "rebuild"
    full = _events(spark, 0, 2000).filter("v < 50").union(
        _events(spark, 2000, 2500))
    _assert_equals_full(spark, dst, full)
