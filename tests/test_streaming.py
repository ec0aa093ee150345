"""Structured Streaming ingest tests: exactly-once file ingest with
checkpoint resume + watermarked windowed aggregation."""

import shutil

import pytest

from geowave_spark.streaming import ingest


@pytest.fixture()
def dirs(tmp_path):
    src = tmp_path / "src"
    dest = tmp_path / "dest"
    cp = tmp_path / "cp"
    src.mkdir()
    return src, str(dest), str(cp)


def _events_schema(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet").schema


def test_exactly_once_ingest_and_resume(spark, sf_dir, dirs):
    src, dest, cp = dirs
    shutil.copy(f"{sf_dir}/events.parquet", src / "part1.parquet")
    n1 = spark.read.parquet(f"{sf_dir}/events.parquet").count()

    schema = _events_schema(spark, sf_dir)
    stream = ingest.indexed_file_stream(spark, str(src), schema, res=8)
    ingest.run_ingest(stream, dest, cp)
    out1 = spark.read.parquet(dest)
    assert out1.count() == n1
    assert {"lon", "lat", "cell"} <= set(out1.columns)

    # second run with NO new files: checkpoint makes it a no-op
    ingest.run_ingest(ingest.indexed_file_stream(spark, str(src), schema), dest, cp)
    assert spark.read.parquet(dest).count() == n1

    # new file appears -> only the delta is ingested (exactly once)
    shutil.copy(f"{sf_dir}/events.parquet", src / "part2.parquet")
    ingest.run_ingest(ingest.indexed_file_stream(spark, str(src), schema), dest, cp)
    assert spark.read.parquet(dest).count() == 2 * n1


def test_stateful_dedup_across_batches(spark, sf_dir, dirs):
    """applyInPandasWithState dedup: a key re-arriving in a later
    micro-batch (even after a restart from checkpoint) emits nothing."""
    from geowave_spark.streaming import stateful

    src, dest, cp = dirs
    shutil.copy(f"{sf_dir}/events.parquet", src / "part1.parquet")
    schema = _events_schema(spark, sf_dir)
    n_keys = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id").distinct().count()
    )

    def run():
        stream = spark.readStream.schema(schema).parquet(str(src))
        deduped = stateful.stateful_dedup(
            stream.select("event_id", "event_type"),
            "event_id", "event_id long, event_type string",
        )
        q = (
            deduped.writeStream.format("parquet")
            .option("path", dest)
            .option("checkpointLocation", cp)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    assert spark.read.parquet(dest).count() == n_keys

    # same keys arrive again in a NEW file after a "restart": state in the
    # checkpoint remembers them -> zero new rows
    shutil.copy(f"{sf_dir}/events.parquet", src / "part2.parquet")
    run()
    out = spark.read.parquet(dest)
    assert out.count() == n_keys
    assert out.select("event_id").distinct().count() == n_keys


def test_running_cell_counts_accumulate(spark, sf_dir, dirs):
    from pyspark.sql import functions as F

    from geowave_spark.streaming import stateful
    from geowave_spark.table import geo

    src, _dest, cp = dirs
    shutil.copy(f"{sf_dir}/events.parquet", src / "part1.parquet")
    schema = _events_schema(spark, sf_dir)
    stream = ingest.indexed_file_stream(spark, str(src), schema, res=4)
    counts = stateful.running_cell_counts(stream, "cell")
    q = (
        counts.writeStream.format("memory").queryName("cell_counts")
        .option("checkpointLocation", cp)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r["cell"]: r["total"] for r in spark.table("cell_counts").collect()}
    batch = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .withColumn("lon", F.expr(geo.lon_sql("event_id")))
        .withColumn("lat", F.expr(geo.lat_sql("event_id")))
        .withColumn("cell", F.expr(geo.rowmajor_cell_sql("lon", "lat", 4)))
        .groupBy("cell").count()
    )
    want = {r["cell"]: r["count"] for r in batch.collect()}
    assert got == want


def test_windowed_counts_match_batch(spark, sf_dir, dirs):
    src, _dest, cp = dirs
    shutil.copy(f"{sf_dir}/events.parquet", src / "part1.parquet")
    schema = _events_schema(spark, sf_dir)

    stream = ingest.indexed_file_stream(spark, str(src), schema)
    ingest.run_to_memory(
        ingest.windowed_counts(stream), "win_counts", cp
    )
    got = {
        (r["win_start"], r["event_type"]): r["n"]
        for r in spark.table("win_counts").collect()
    }

    from pyspark.sql import functions as F

    batch = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy(F.date_trunc("day", "ts").alias("win_start"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    want = {(r["win_start"], r["event_type"]): r["n"] for r in batch.collect()}
    assert got == want


def test_streaming_sessions_match_batch_q67(spark, sf_dir, dirs):
    """The streaming session_window aggregation produces EXACTLY the
    session set of the batch q67 operator over the same events — the
    claim in q67's docstring, proven end-to-end through a checkpointed
    availableNow stream."""
    src, _dest, cp = dirs
    shutil.copy(f"{sf_dir}/events.parquet", src / "part1.parquet")
    schema = _events_schema(spark, sf_dir)

    stream = ingest.indexed_file_stream(spark, str(src), schema)
    ingest.run_to_memory(ingest.session_counts(stream), "sessions", cp)
    got = sorted(
        (r["user_id"], r["n"], r["t0"], r["t1"])
        for r in spark.table("sessions").collect()
    )

    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"))
    batch = (
        ev.groupBy("user_id", F.session_window("ts", "12 hours"))
        .agg(F.count("*").alias("n"),
             F.min(F.unix_micros("ts")).alias("t0"),
             F.max(F.unix_micros("ts")).alias("t1"))
    )
    want = sorted(
        (r["user_id"], r["n"], r["t0"], r["t1"]) for r in batch.collect())
    assert got == want and len(got) > 0


def test_streaming_snapshot_table_with_continuous_rollup(spark, sf_dir, dirs):
    """Stream -> snapshot-table commits per micro-batch, each followed by
    an incremental rollup refresh; the final rollup equals a from-scratch
    aggregation of everything ingested, and the table history is one
    atomic commit per batch."""
    from pyspark.sql import functions as F
    from geowave_spark.table import snapshots as S

    src, dest, cp = dirs
    tbl = dest + "_tbl"
    roll = dest + "_roll"
    schema = _events_schema(spark, sf_dir)
    kw = dict(time_col="ts", keys=["event_type"], value_col="value")

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")

    def _drop(df, name):
        # the file stream lists plain files: write to a staging dir, copy
        # the single part file into the watched directory
        import glob

        stage = str(src) + f"_stage_{name}"
        df.coalesce(1).write.parquet(stage)
        shutil.copy(glob.glob(f"{stage}/part-*.parquet")[0], src / name)

    _drop(ev.filter("event_id % 2 = 0"), "batch1.parquet")
    stream = ingest.indexed_file_stream(spark, str(src), schema, res=8)
    ingest.run_ingest_to_table(stream, tbl, cp, rollup_path=roll, rollup_kw=kw)

    _drop(ev.filter("event_id % 2 = 1"), "batch2.parquet")
    ingest.run_ingest_to_table(stream, tbl, cp, rollup_path=roll, rollup_kw=kw)

    assert S.scan(spark, tbl).count() == ev.count()
    got = {(r["bucket"], r["event_type"]): (r["n"], r["sum_v"]) for r in
           S.scan(spark, roll).select("bucket", "event_type", "n", "sum_v").collect()}
    exp = {(r["bucket"], r["event_type"]): (r["n"], r["sum_v"]) for r in
           ev.groupBy(F.date_trunc("day", "ts").alias("bucket"), "event_type")
           .agg(F.count("*").alias("n"), F.sum("value").alias("sum_v")).collect()}
    assert got.keys() == exp.keys()
    for k, (n, sv) in exp.items():
        assert got[k][0] == n
        assert got[k][1] == pytest.approx(sv)  # float-sum order differs
    # one atomic table commit per non-empty micro-batch
    ops = [h["operation"] for h in S.history(tbl)]
    assert ops[0] == "create" and set(ops[1:]) <= {"append"}


def test_streaming_dedup_accumulates_full_q16(spark, sf_dir, dirs):
    """Three document micro-batches through the streaming dedup: the
    accumulated pairs table equals the from-scratch q16 pair set, the
    band index grows one atomic commit per batch."""
    import glob

    from geowave_spark.queries_text import TEXT_QUERIES
    from geowave_spark.table import snapshots as S

    src, dest, cp = dirs
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")

    def _drop(df, name):
        stage = str(src) + f"_stage_{name}"
        df.coalesce(1).write.parquet(stage)
        shutil.copy(glob.glob(f"{stage}/part-*.parquet")[0], src / name)

    stream = spark.readStream.schema(docs.schema).parquet(str(src))
    for b in range(3):
        _drop(docs.filter(f"doc_id % 3 = {b}"), f"batch{b}.parquet")
        out = ingest.run_streaming_dedup(stream, dest, cp)

    got = {(r["d1"], r["d2"], r["jac_micro"])
           for r in S.scan(spark, out["pairs"]).collect()}
    full = TEXT_QUERIES["q16_minhash_lsh_pairs"][0](spark, sf_dir)
    exp = {(r["d1"], r["d2"], r["jac_micro"]) for r in full.collect()}
    assert got == exp
    assert S.current_snapshot(out["index"]) == 3
    assert S.scan(spark, out["docs"]).count() == docs.count()


def test_geofence_alerts_match_batch_filter(spark, sf_dir, dirs):
    """Streaming geofence over two micro-batch files == the batch
    point-in-rect filter (cover+refine, exactly-once resume)."""
    src, dest, cp = dirs
    shutil.copy(f"{sf_dir}/events.parquet", src / "part1.parquet")

    zones = spark.createDataFrame(
        [(1, -170.0, -80.0, -30.0, -10.0), (2, 10.0, 5.0, 160.0, 75.0),
         (3, -20.0, -88.0, 15.0, 88.0)],
        "zone_id int, lon0 double, lat0 double, lon1 double, lat1 double",
    )
    schema = _events_schema(spark, sf_dir)

    def drain():
        stream = ingest.indexed_file_stream(spark, str(src), schema, res=8)
        ingest.run_ingest(
            ingest.geofence_alerts(stream, zones, res=7).select(
                "event_id", "zone_id"),
            dest, cp,
        )

    drain()
    got = {(r["event_id"], r["zone_id"])
           for r in spark.read.parquet(dest).collect()}

    from geowave_spark.table import geo

    batch = spark.sql(
        f"SELECT event_id, {geo.lon_sql('event_id')} AS lon, "
        f"{geo.lat_sql('event_id')} AS lat "
        f"FROM parquet.`{sf_dir}/events.parquet`"
    ).join(zones).where(
        "lon >= lon0 AND lon < lon1 AND lat >= lat0 AND lat < lat1")
    want = {(r["event_id"], r["zone_id"]) for r in batch.collect()}
    assert got == want and len(want) > 0

    # a second identical file arrives: resume ingests ONLY the new file,
    # so every alert pair now appears exactly twice
    shutil.copy(f"{sf_dir}/events.parquet", src / "part2.parquet")
    drain()
    out = spark.read.parquet(dest).groupBy("event_id", "zone_id").count()
    assert out.filter("count <> 2").count() == 0
    assert out.count() == len(want)


def test_streaming_trending_counts_match_batch_q117(spark, sf_dir, dirs):
    """The watermarked sliding-window per-cell aggregate over an
    availableNow stream equals the batch q117 pre-top-k aggregate — the
    same (window_start, cell, n) rows through the state store."""
    src, _dest, cp = dirs
    shutil.copy(f"{sf_dir}/events.parquet", src / "part1.parquet")
    schema = _events_schema(spark, sf_dir)

    stream = ingest.indexed_file_stream(spark, str(src), schema)
    ingest.run_to_memory(
        ingest.trending_cell_counts(stream), "trending", cp)
    got = sorted(
        (r["ws"], r["cell"], r["n"])
        for r in spark.table("trending").collect()
    )

    from geowave_spark.queries import _TREND_RES
    from geowave_spark.table import geo

    cell = geo.rowmajor_cell_sql(geo.lon_sql("event_id"),
                                 geo.lat_sql("event_id"), _TREND_RES)
    batch = spark.sql(f"""
        SELECT unix_micros(w.start) AS ws, cell, count(*) AS n
        FROM (
          SELECT window(cast(ts as timestamp), '6 hours', '2 hours') AS w,
                 {cell} AS cell
          FROM parquet.`{sf_dir}/events.parquet`
        ) t GROUP BY 1, 2
    """)
    want = sorted((r["ws"], r["cell"], r["n"]) for r in batch.collect())
    assert got == want and len(got) > 0


def test_streaming_session_rollup_matches_batch_q136(spark, sf_dir, dirs):
    """The watermarked session_window per-user rollup over an availableNow
    stream equals the batch q136 sessionization — the same
    (user_id, sess_start_us, dur_us, n_events) rows through the state
    store's session-merge path."""
    src, _dest, cp = dirs
    shutil.copy(f"{sf_dir}/events.parquet", src / "part1.parquet")
    schema = _events_schema(spark, sf_dir)

    stream = ingest.indexed_file_stream(spark, str(src), schema)
    ingest.run_to_memory(
        ingest.session_rollup(stream), "sessions", cp)
    got = sorted(
        (r["user_id"], r["sess_start_us"], r["dur_us"], r["n_events"])
        for r in spark.table("sessions").collect()
    )

    from geowave_spark.queries import QUERIES

    batch = QUERIES["q136_sessionization"][0](spark, sf_dir)
    want = sorted(
        (r["user_id"], r["sess_start_us"], r["dur_us"], r["n_events"])
        for r in batch.collect()
    )
    assert got == want and len(got) > 0
    # sessions actually merge: somewhere more than one event per session
    assert max(n for *_, n in got) > 1


def test_stream_stream_proximity_join_matches_batch(spark, sf_dir, dirs):
    """Stream-stream rendezvous join (same cell, |dt| <= 10 min) over two
    watermarked file streams == the identical batch join; the state store
    holds both sides keyed by cell.  sf0.001's 1000 events need coarse
    cells (res 3) + a 1-day lag for a non-degenerate pair set."""
    from pyspark.sql import functions as F

    src, dest, cp = dirs
    shutil.copy(f"{sf_dir}/events.parquet", src / "part1.parquet")
    schema = _events_schema(spark, sf_dir)

    def sides(df_fn):
        a = df_fn().where("user_id % 2 = 0").select("event_id", "ts", "lon", "lat")
        b = (df_fn().where("user_id % 2 = 1")
             .select(F.col("event_id").alias("eid2"),
                     F.col("ts").alias("ts2"), "lon", "lat"))
        return a, b

    a, b = sides(lambda: ingest.indexed_file_stream(spark, str(src), schema, res=8))
    pairs = ingest.proximity_pairs(
        a, b.withColumnRenamed("ts2", "ts"), ts_col="ts", res=3,
        max_lag_s=86_400, watermark="2 days",
    ).selectExpr("a.event_id AS e1", "b.eid2 AS e2")
    ingest.run_ingest(pairs, dest, cp)
    got = {(r["e1"], r["e2"]) for r in spark.read.parquet(dest).collect()}

    from geowave_spark.table import geo

    ev = spark.sql(
        f"SELECT event_id, cast(ts as timestamp) AS ts, user_id, "
        f"{geo.lon_sql('event_id')} AS lon, {geo.lat_sql('event_id')} AS lat "
        f"FROM parquet.`{sf_dir}/events.parquet`")
    cell = f"cast({geo.rowmajor_cell_sql('lon', 'lat', 3)} as bigint)"
    a2 = ev.where("user_id % 2 = 0").selectExpr(
        "event_id AS e1", "ts AS t1", f"{cell} AS c1")
    b2 = ev.where("user_id % 2 = 1").selectExpr(
        "event_id AS e2", "ts AS t2", f"{cell} AS c2")
    want = {(r["e1"], r["e2"]) for r in a2.join(
        b2, F.expr("c1 = c2 AND t2 BETWEEN t1 - interval 86400 second "
                   "AND t1 + interval 86400 second")).collect()}
    assert got == want and len(want) > 0


def test_streaming_dedup_replayed_batch_lands_exactly_once(spark, sf_dir, dirs):
    """The same events file delivered TWICE (replay/backfill) through
    dedup_stream produces each event_id exactly once — equal to the
    batch DISTINCT over one copy."""
    src, _dest, cp = dirs
    shutil.copy(f"{sf_dir}/events.parquet", src / "part1.parquet")
    shutil.copy(f"{sf_dir}/events.parquet", src / "part2.parquet")
    schema = _events_schema(spark, sf_dir)

    stream = ingest.indexed_file_stream(spark, str(src), schema)
    ingest.run_to_memory(
        ingest.dedup_stream(stream).select("event_id", "user_id", "cell"),
        "deduped", cp, mode="append")
    got = sorted(
        (r["event_id"], r["user_id"], r["cell"])
        for r in spark.table("deduped").collect()
    )

    from geowave_spark.table import geo
    want = sorted(
        (r["event_id"], r["user_id"], r["cell"])
        for r in spark.sql(
            f"SELECT event_id, user_id, "
            f"{geo.rowmajor_cell_sql(geo.lon_sql('event_id'), geo.lat_sql('event_id'), 8)} AS cell "
            f"FROM parquet.`{sf_dir}/events.parquet`").collect()
    )
    assert got == want and len(got) > 0


def test_streaming_windowed_percentiles_match_batch_q291(spark, sf_dir, dirs):
    """Exact percentiles from the streamed per-window histogram equal
    the batch q291 operator over the same events — the monoid claim in
    q291's docstring, proven through a checkpointed availableNow
    stream."""
    import shutil as _sh

    from pyspark.sql import functions as F

    from geowave_spark.queries_overlay import (
        _Q291_WIN_US,
        q291_windowed_percentiles,
    )

    src, _dest, cp = dirs
    _sh.copy(f"{sf_dir}/events.parquet", src / "part_a.parquet")
    schema = _events_schema(spark, sf_dir)

    stream = ingest.indexed_file_stream(spark, str(src), schema)
    ingest.run_to_memory(
        ingest.windowed_value_histogram(stream), "wvh", cp)
    got_df = ingest.percentiles_from_histogram(spark.table("wvh"))
    got = sorted(
        (r["win_start"].timestamp() * 1_000_000 // _Q291_WIN_US,
         r["p"], r["cents"], r["n"])
        for r in got_df.collect()
    )

    batch = q291_windowed_percentiles(spark, sf_dir)
    want = sorted(
        (float(r["win"]), r["p"], r["cents"], r["n"])
        for r in batch.collect()
    )
    assert got == want and len(got) > 0


def test_track_assembler_emits_on_event_time_timeout(spark, dirs):
    """Users silent for > gap emit their assembled track when the
    watermark passes; users whose data is still fresh stay in state.
    Two files forced into separate micro-batches (maxFilesPerTrigger=1)
    so the watermark advances between them."""
    import math
    import time as _time

    import pandas as pd

    from geowave_spark.streaming import stateful

    src, _dest, cp = dirs
    t0 = pd.Timestamp("2024-01-01 00:00:00")

    def pts(uid, base, coords):
        return [
            {"user_id": uid, "ts": base + pd.Timedelta(minutes=i),
             "x_micro": x, "y_micro": y}
            for i, (x, y) in enumerate(coords)
        ]

    early = (pts(1, t0, [(0, 0), (3_000_000, 4_000_000), (6_000_000, 8_000_000)])
             + pts(2, t0, [(10_000_000, 0), (10_000_000, 1_000_000)]))
    late = pts(3, t0 + pd.Timedelta(days=3), [(0, 0), (1_000_000, 0)])

    spark.createDataFrame(pd.DataFrame(early)).coalesce(1).write.parquet(
        str(src / "a.parquet"))
    _time.sleep(1.1)  # distinct file mtimes -> deterministic batch order
    spark.createDataFrame(pd.DataFrame(late)).coalesce(1).write.parquet(
        str(src / "b.parquet"))

    stream = (
        spark.readStream.schema(
            "user_id long, ts timestamp, x_micro long, y_micro long")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src) + "/*.parquet")
    )
    out = stateful.track_assembler(stream, gap="1 hour")
    q = (out.writeStream.format("memory").queryName("tracks")
         .option("checkpointLocation", cp)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {r["user_id"]: r for r in spark.table("tracks").collect()}
    assert set(got) == {1, 2}  # user 3 is still fresh -> still in state
    u1 = got[1]
    assert (u1["n_points"], u1["x0_micro"], u1["x1_micro"]) == (3, 0, 6_000_000)
    assert u1["path_micro"] == int(math.sqrt(3e6**2 + 4e6**2)) * 2  # 5M + 5M
    u2 = got[2]
    assert (u2["n_points"], u2["path_micro"]) == (2, 1_000_000)


def test_track_assembler_matches_batch_q295(spark, sf_dir, dirs):
    """Force every real user to time out (a far-future sentinel file
    advances the watermark years past the data) and pin the assembled
    tracks equal to the batch q295 relation over the same events."""
    import time as _time

    import pandas as pd
    from pyspark.sql import functions as F

    from geowave_spark.queries_overlay import q295_track_summaries
    from geowave_spark.streaming import stateful
    from geowave_spark.table import geo

    src, _dest, cp = dirs
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "event_id", F.col("ts").cast("timestamp").alias("ts"),
        F.expr(f"cast(floor(({geo.lon_sql('event_id')}) * 1000000) as bigint)")
        .alias("x_micro"),
        F.expr(f"cast(floor(({geo.lat_sql('event_id')}) * 1000000) as bigint)")
        .alias("y_micro"),
    )
    ev.coalesce(1).write.parquet(str(src / "a.parquet"))
    _time.sleep(1.1)
    sentinel = pd.DataFrame([{
        "user_id": -1, "event_id": -1,
        "ts": pd.Timestamp("2034-01-01"), "x_micro": 0, "y_micro": 0,
    }])
    spark.createDataFrame(sentinel).coalesce(1).write.parquet(
        str(src / "b.parquet"))

    stream = (
        spark.readStream.schema(
            "user_id long, event_id long, ts timestamp, "
            "x_micro long, y_micro long")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src) + "/*.parquet")
    )
    out = stateful.track_assembler(stream, gap="1 hour")
    q = (out.writeStream.format("memory").queryName("tracks295")
         .option("checkpointLocation", cp)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = {r["user_id"]: (r["n_points"], r["x0_micro"], r["y0_micro"],
                          r["x1_micro"], r["y1_micro"], r["path_micro"])
           for r in spark.table("tracks295").collect()}
    want = {r["user_id"]: (r["n_points"], r["x0_micro"], r["y0_micro"],
                           r["x1_micro"], r["y1_micro"], r["path_micro"])
            for r in q295_track_summaries(spark, sf_dir).collect()}
    assert got == want and len(want) > 0


def test_track_assembler_honors_watermark_parameter(spark):
    """Regression (ADVICE r2): the `watermark` argument must reach
    `withWatermark`, not be silently replaced by a 10-minute default,
    and bad intervals fail fast like bad gaps do."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from geowave_spark.streaming import stateful

    # must be a real stream source: Spark silently drops EventTimeWatermark
    # from batch plans, which is exactly how the original bug hid
    df = (spark.readStream.format("rate").option("rowsPerSecond", "1").load()
          .select(F.col("value").alias("user_id"),
                  F.col("timestamp").alias("ts"),
                  F.lit(0).alias("x_micro"), F.lit(0).alias("y_micro")))
    out = stateful.track_assembler(df, gap="1 hour", watermark="45 minutes")
    plan = out._jdf.queryExecution().logical().toString()
    assert "45 minutes" in plan and "10 minutes" not in plan
    with _pytest.raises(ValueError):
        stateful.track_assembler(df, gap="1 hour", watermark="sometimes")
    with _pytest.raises(ValueError):
        stateful.track_assembler(df, gap="1 fortnight")


def test_stream_source_factory_is_source_agnostic(spark, dirs, tmp_path):
    """VERDICT r2 #8: the source factory isolates source construction —
    the SAME indexing + windowed-count + sink code path runs unchanged
    over a files source and a live rate source, and the kafka branch
    builds the standard from_json plumbing (validated by construction;
    no broker in this sandbox)."""
    import pandas as pd
    import pytest as _pytest
    from pyspark.sql.types import (
        LongType, StructField, StructType, TimestampType)

    from geowave_spark.streaming import ingest

    schema = StructType([
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
    ])
    src, _dest, cp = dirs
    # 10 days x 10 rows: with the default 2-day watermark, append mode
    # finalizes the windows for days 0..6 -> 70 rows emitted
    rows = pd.DataFrame({
        "event_id": range(100),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta([i // 10 for i in range(100)], "D")
        + pd.to_timedelta([i % 10 for i in range(100)], "h"),
    })
    import glob

    stage = str(src) + "_stage"
    spark.createDataFrame(rows).coalesce(1).write.parquet(stage)
    shutil.copy(glob.glob(f"{stage}/part-*.parquet")[0], src / "a.parquet")

    from pyspark.sql import functions as F

    def pipeline(raw):
        # shared downstream path: indexing + windowed counts + memory sink
        idx = ingest.index_stream(raw, res=6).withColumn(
            "event_type", F.expr("cast(event_id % 3 as string)"))
        return ingest.windowed_counts(idx, ts_col="ts", window="1 day")

    out_files = pipeline(ingest.stream_source(
        spark, "files", schema=schema, src_dir=str(src)))
    name = "src_agnostic_files"
    ingest.run_to_memory(out_files, name, cp + "_f", timeout_s=60)
    got = spark.sql(f"SELECT sum(n) FROM {name}").collect()[0][0]
    assert got == 100  # complete mode: every window emitted

    out_rate = pipeline(ingest.stream_source(spark, "rate", schema=schema))
    assert out_rate.schema == out_files.schema  # same relation downstream
    assert out_rate.isStreaming

    # kafka: same downstream shape, constructed but not runnable here
    try:
        out_kafka = pipeline(ingest.stream_source(
            spark, "kafka", schema=schema,
            brokers="broker:9092", topic="events"))
        assert out_kafka.schema == out_files.schema
    except Exception as e:  # connector jar absent in this sandbox
        assert "kafka" in str(e).lower()

    with _pytest.raises(ValueError):
        ingest.stream_source(spark, "files", schema=schema)
    with _pytest.raises(ValueError):
        ingest.stream_source(spark, "carrier-pigeon", schema=schema)
