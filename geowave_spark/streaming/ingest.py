"""Streaming ingest: micro-batch file ingest with cell indexing, plus
watermarked windowed aggregation.

Reference analog (/root/reference): GeoWave's ingest framework has a Kafka
staging path (`core/ingest/src/main/avro`, `test/src/test/java/.../kafka/
BasicKafkaIT.java`) that is **write-side micro-batching only** — no
watermarks, windows, or state (SURVEY.md §2.9).  This module is the
Spark-first upgrade of that capability: Structured Streaming gives
exactly-once file ingest (checkpointed source offsets + transactional
sink manifests) which is the streaming twin of the engine's batch
per-partition checkpoint writer (plans/checkpoint.py).

The cell key is computed with the closed-form row-major expression —
pure JVM, so the streaming hot path has zero Python workers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..table import geo


def stream_source(spark: SparkSession, source: str = "files", *,
                  schema=None, src_dir: str | None = None,
                  brokers: str | None = None, topic: str | None = None,
                  rows_per_second: int = 100) -> DataFrame:
    """Source factory: swapping file -> kafka -> rate is CONFIG, not code
    (VERDICT r2 #8) — everything downstream (`index_stream`, the windowed
    aggregations, the snapshot-table sinks, the stateful operators) takes
    the DataFrame this returns and never knows which source produced it.

    - "files": parquet directory micro-batch source (exactly-once via
      checkpointed file offsets).  Requires `schema` + `src_dir`.
    - "kafka": the standard Structured Streaming Kafka source — value
      bytes JSON-decoded through `schema` (the reference stages Avro
      records through Kafka the same way, `core/ingest/src/main/avro`,
      `BasicKafkaIT.java`).  Requires `schema` + `brokers` + `topic` and
      the spark-sql-kafka connector on the classpath; this sandbox has
      no Kafka, so the branch is exercised by construction tests only.
    - "rate": the built-in rate source mapped deterministically onto
      `schema`'s first two fields (id-like long + timestamp) — a live
      second source for source-agnosticism tests.
    """
    if source == "files":
        if schema is None or src_dir is None:
            raise ValueError("files source needs schema= and src_dir=")
        return spark.readStream.schema(schema).parquet(src_dir)
    if source == "kafka":
        if schema is None or brokers is None or topic is None:
            raise ValueError("kafka source needs schema=, brokers=, topic=")
        raw = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", brokers)
            .option("subscribe", topic)
            .load()
        )
        return raw.select(
            F.from_json(F.col("value").cast("string"), schema).alias("r")
        ).select("r.*")
    if source == "rate":
        if schema is None:
            raise ValueError("rate source needs schema=")
        fields = schema.fields if hasattr(schema, "fields") else None
        if not fields or len(fields) < 2:
            raise ValueError("rate source maps onto (long, timestamp) schemas")
        raw = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", str(rows_per_second)).load()
        )
        return raw.select(
            F.col("value").cast(fields[0].dataType).alias(fields[0].name),
            F.col("timestamp").cast(fields[1].dataType).alias(fields[1].name),
        )
    raise ValueError(f"unknown stream source {source!r}")


def index_stream(raw: DataFrame, res: int = 8,
                 lon_key: str = "event_id") -> DataFrame:
    """Derive (lon, lat, cell) on ANY source's stream — the shared
    indexing step every source feeds (pure JVM closed-form cell)."""
    return (
        raw.withColumn("lon", F.expr(geo.lon_sql(lon_key)))
        .withColumn("lat", F.expr(geo.lat_sql(lon_key)))
        .withColumn("cell", F.expr(geo.rowmajor_cell_sql("lon", "lat", res)))
    )


def indexed_file_stream(spark: SparkSession, src_dir: str, schema,
                        res: int = 8, lon_key: str = "event_id") -> DataFrame:
    """readStream over a parquet directory, deriving (lon, lat, cell).

    New files appearing in ``src_dir`` are ingested exactly once (offsets
    tracked in the query checkpoint).
    """
    raw = stream_source(spark, "files", schema=schema, src_dir=src_dir)
    return index_stream(raw, res=res, lon_key=lon_key)


def run_ingest(stream_df: DataFrame, dest_dir: str, checkpoint_dir: str,
               timeout_s: int = 120) -> None:
    """Drain all currently-available input into parquet, exactly once.

    availableNow processes the backlog then stops — the batch-resume
    contract of the north rule expressed through streaming offsets: a
    killed job re-run with the same checkpoint dir skips completed files.
    """
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", dest_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)


def windowed_counts(stream_df: DataFrame, ts_col: str = "ts",
                    window: str = "1 day", watermark: str = "2 days") -> DataFrame:
    """Watermarked tumbling-window counts per event_type (late rows beyond
    the watermark are dropped; state is bounded)."""
    # parquet timestamps may load as TIMESTAMP_NTZ; event time requires TIMESTAMP
    stream_df = stream_df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("win.start").alias("win_start"), "event_type", "n")
    )


def windowed_value_histogram(stream_df: DataFrame, ts_col: str = "ts",
                             window: str = "6 hours",
                             watermark: str = "1 day") -> DataFrame:
    """The streaming half of q291's exact windowed percentiles: the
    per-(window, cents) count histogram as a watermarked streaming
    aggregation.  The histogram is a commutative monoid, so the state
    store maintains it incrementally and EXACT percentiles fall out of
    the final (bounded, per-window) histogram downstream — approximate
    sketches are unnecessary when the value domain is discrete."""
    stream_df = stream_df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(ts_col, window).alias("win"),
            F.expr("cast(floor(value * 100) as bigint)").alias("cents"),
        )
        .agg(F.count("*").alias("c"))
        .select(F.col("win.start").alias("win_start"), "cents", "c")
    )


def percentiles_from_histogram(hist_df: DataFrame,
                               qs=(("p50", 1, 2), ("p95", 19, 20))
                               ) -> DataFrame:
    """Exact per-window percentiles from a (win_start, cents, c)
    histogram — q291's rank arithmetic, reusable over a batch histogram
    or the drained result of `windowed_value_histogram`."""
    spark = hist_df.sparkSession
    hist_df.createOrReplaceTempView("_wvh")
    targets = "\nUNION ALL\n".join(
        f"SELECT '{nm}' AS p, {num} AS qn, {den} AS qd" for nm, num, den in qs
    )
    return spark.sql(f"""
WITH n AS (SELECT win_start, sum(c) AS n FROM _wvh GROUP BY win_start),
cum AS (
  SELECT win_start, cents,
         sum(c) OVER (PARTITION BY win_start ORDER BY cents
                      ROWS UNBOUNDED PRECEDING) AS cum
  FROM _wvh
),
t AS ({targets})
SELECT cum.win_start, t.p, cast(min(cum.cents) as bigint) AS cents,
       cast(max(n.n) as bigint) AS n
FROM t
CROSS JOIN n
JOIN cum ON cum.win_start = n.win_start
        AND cum.cum >= (n.n * t.qn + t.qd - 1) div t.qd
GROUP BY cum.win_start, t.p
ORDER BY win_start, p
""")


def run_to_memory(result_df: DataFrame, name: str, checkpoint_dir: str,
                  timeout_s: int = 120, mode: str = "complete"):
    """Drive a streaming aggregation into an in-memory table (tests/demos)."""
    q = (
        result_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return q


def session_counts(stream_df: DataFrame, ts_col: str = "ts",
                   gap: str = "12 hours",
                   watermark: str = "30 days") -> DataFrame:
    """Watermarked per-user SESSION windows on an unbounded stream — the
    streaming twin of the batch q67 operator: the same
    `session_window(ts, gap)` grouping, state-store-backed (sessions
    merge as late-but-within-watermark events arrive; state for sessions
    older than the watermark is evicted)."""
    stream_df = stream_df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy("user_id", F.session_window(ts_col, gap).alias("sw"))
        .agg(F.count("*").alias("n"),
             F.min(F.unix_micros(F.col(ts_col))).alias("t0"),
             F.max(F.unix_micros(F.col(ts_col))).alias("t1"))
        .select("user_id", "n", "t0", "t1")
    )


def trending_cell_counts(stream_df: DataFrame, ts_col: str = "ts",
                         size: str = "6 hours", slide: str = "2 hours",
                         res: int = 2,
                         watermark: str = "30 days") -> DataFrame:
    """Watermarked SLIDING-window per-cell counts — the streaming twin of
    the batch q117 trending-cells aggregate: the identical
    `window(ts, size, slide)` generator runs incrementally against the
    state store, emitting the same (window_start, cell, n) rows.  The
    top-k + trend-delta presentation stays a cheap batch query over this
    continuously-maintained aggregate (windows x cells, collapsed from
    the event stream)."""
    stream_df = stream_df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    cell = geo.rowmajor_cell_sql(geo.lon_sql("event_id"),
                                 geo.lat_sql("event_id"), res)
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, size, slide).alias("w"),
                 F.expr(cell).alias("cell"))
        .agg(F.count("*").alias("n"))
        .select(F.unix_micros(F.col("w.start")).alias("ws"), "cell", "n")
    )


def session_rollup(stream_df: DataFrame, ts_col: str = "ts",
                   gap: str = "28800 seconds",
                   watermark: str = "30 days") -> DataFrame:
    """Watermarked SESSION-window per-user rollup — the streaming twin of
    the batch q136 sessionization: the identical `session_window(ts, gap)`
    aggregate runs incrementally, the state store merging open sessions
    per user until the watermark closes them.  Emits the same
    (user_id, sess_start_us, dur_us, n_events) rows as the batch query
    (parity pinned in tests/test_streaming.py)."""
    gap_us = int(gap.split()[0]) * 1_000_000
    stream_df = stream_df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy("user_id", F.session_window(F.col(ts_col), gap))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias("sess_start_us"),
            (F.unix_micros(F.col("session_window.end"))
             - F.unix_micros(F.col("session_window.start"))
             - F.lit(gap_us)).alias("dur_us"),
            "n_events",
        )
    )


def geofence_alerts(stream_df: DataFrame, zones: DataFrame,
                    res: int = 7) -> DataFrame:
    """Streaming geofence: emit an alert row for every streamed point that
    falls inside a zone rectangle — the continuous form of the engine's
    point-in-region join (reference analog: a standing spatial query over
    arriving features; GeoWave runs these as repeated range scans, here
    it is ONE stream-static broadcast join).

    The static ``zones`` (zone_id, lon0, lat0, lon1, lat1) expand ONCE to
    their res-`res` cell cover (bounded sequence explode, pure codegen);
    the stream side already carries `cell` (indexed_file_stream), so the
    hot path is a BroadcastHashJoin on cell + an exact bounds refine —
    zero Python, zero state store, per-event cost independent of the
    stream's history.
    """
    n = 1 << res

    def gx(lon: str) -> str:
        return (f"least(greatest(cast(ceil(({lon} + 180e0) / 360e0 * {n}) "
                f"as bigint) - 1, 0), {n - 1})")

    def gy(lat: str) -> str:
        return (f"least(greatest(cast(ceil(({lat} + 90e0) / 180e0 * {n}) "
                f"as bigint) - 1, 0), {n - 1})")

    cover = (
        zones.withColumn("gx", F.expr(
            f"explode(sequence({gx('lon0')}, {gx('lon1')}))"))
        .withColumn("gy", F.expr(
            f"explode(sequence({gy('lat0')}, {gy('lat1')}))"))
        .withColumn("gf_cell", F.expr(f"gy * {n} + gx"))
        .drop("gx", "gy")
    )
    # re-encode at the geofence res — the stream's own `cell` may use a
    # different resolution
    keyed = stream_df.withColumn(
        "gf_cell", F.expr(geo.rowmajor_cell_sql("lon", "lat", res)))
    return (
        keyed.join(F.broadcast(cover), "gf_cell")
        .where("lon >= lon0 AND lon < lon1 AND lat >= lat0 AND lat < lat1")
        .drop("gf_cell", "lon0", "lat0", "lon1", "lat1")
    )


def proximity_pairs(left: DataFrame, right: DataFrame,
                    ts_col: str = "ts", res: int = 6,
                    max_lag_s: int = 600,
                    watermark: str = "30 minutes") -> DataFrame:
    """Stream-STREAM spatiotemporal rendezvous join: pairs of events from
    two streams that land in the same res-`res` cell within ``max_lag_s``
    seconds of each other — continuous co-occurrence detection (which
    entities were near each other, as the data arrives).

    This is the one join shape Structured Streaming keeps BOTH sides in
    the state store for; the watermark + the symmetric time-range bound
    are exactly what lets it evict state (an unbounded stream-stream join
    is impossible — every event would have to wait forever).  The join key
    is the spatial cell, so state is partitioned by cell and the time
    condition prunes within it — the streaming twin of the engine's
    composite (cell, tbin) join (`spatial.spatiotemporal_window_join`).

    Both inputs need (``ts_col``, lon, lat) plus their payload; outputs
    one row per qualifying (left, right) pair with both timestamps.
    """
    k = f"cast({geo.rowmajor_cell_sql('lon', 'lat', res)} as bigint)"
    # watermarks demand TIMESTAMP event time; parquet NTZ sources cast
    # wall-clock-identically under the UTC session timezone
    a = (left.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
         .withColumn("jcell", F.expr(k))
         .withWatermark(ts_col, watermark).alias("a"))
    b = (right.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
         .withColumn("jcell", F.expr(k))
         .withWatermark(ts_col, watermark).alias("b"))
    cond = F.expr(
        f"a.jcell = b.jcell AND "
        f"b.{ts_col} >= a.{ts_col} - interval {max_lag_s} second AND "
        f"b.{ts_col} <= a.{ts_col} + interval {max_lag_s} second")
    return a.join(b, cond)


def run_ingest_to_table(stream_df: DataFrame, table_path: str,
                        checkpoint_dir: str, rollup_path: str | None = None,
                        rollup_kw: dict | None = None,
                        timeout_s: int = 120) -> None:
    """Stream into a SNAPSHOT TABLE, one atomic commit per micro-batch —
    and optionally keep a continuous aggregate current.

    foreachBatch gives exactly-once table commits: Structured Streaming
    replays a failed batch, and the snapshot commit is atomic, so readers
    only ever see whole batches (the Iceberg streaming-sink contract; the
    reference's streaming analog is its per-range writer commits).  When
    ``rollup_path`` is set, each batch is followed by an incremental
    `table/rollup.refresh_rollup` — the streaming form of the hypertable
    rollup: the refresh scans only the files the batch just added.
    """
    from ..table import rollup as R, snapshots as S

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if S.current_snapshot(table_path) == 0:
            S.create(batch_df, table_path)
        else:
            S.append(batch_df, table_path)
        if rollup_path is not None:
            R.refresh_rollup(batch_df.sparkSession, table_path, rollup_path,
                             **(rollup_kw or {}))

    q = (
        stream_df.writeStream.foreachBatch(commit)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)


def run_streaming_dedup(stream_df: DataFrame, root_dir: str,
                        checkpoint_dir: str, timeout_s: int = 120) -> dict:
    """Continuous near-dup detection: each micro-batch of documents
    `(doc_id, text)` is deduplicated against everything ingested so far,
    then folded into the persisted MinHash band index — the streaming form
    of `pipeline/dedup_index.py` (exactly like `run_ingest_to_table` is
    the streaming form of the snapshot writer).

    Per batch (all snapshot commits atomic, replay-safe via foreachBatch):
      1. append the batch's docs to `<root>/docs` (the refine's text store),
      2. emit near-dup pairs of batch vs (index ∪ batch)
         → appended to `<root>/pairs`,
      3. append the batch's band rows to `<root>/index`.
    Accumulated `<root>/pairs` rows equal the from-scratch q16 pair set
    over all ingested docs (asserted in tests/test_streaming.py).
    """
    import os

    from ..pipeline import dedup_index as DX
    from ..table import snapshots as S

    docs_path = os.path.join(root_dir, "docs")
    index_path = os.path.join(root_dir, "index")
    pairs_path = os.path.join(root_dir, "pairs")

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch_df = batch_df.select("doc_id", "text")
        if S.current_snapshot(docs_path) == 0:
            S.create(batch_df, docs_path)
        else:
            S.append(batch_df, docs_path)
        S.scan(spark, docs_path).createOrReplaceTempView("stream_dedup_docs")
        batch_df.createOrReplaceTempView("stream_dedup_batch")
        first = S.current_snapshot(index_path) == 0
        if first:
            # batch 1 IS the initial index; deduping it against an index
            # that already contains it yields exactly its internal pairs
            DX.build_index(spark, "stream_dedup_batch", index_path)
        pairs = DX.dedup_batch(spark, index_path, "stream_dedup_batch",
                               "stream_dedup_docs")
        if S.current_snapshot(pairs_path) == 0:
            S.create(pairs, pairs_path)
        else:
            S.append(pairs, pairs_path)
        if not first:
            DX.append_batch(spark, "stream_dedup_batch", index_path)

    q = (
        stream_df.writeStream.foreachBatch(commit)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return {"docs": docs_path, "index": index_path, "pairs": pairs_path}


def dedup_stream(stream_df: DataFrame, keys: list[str] | None = None,
                 ts_col: str = "ts", watermark: str = "30 days") -> DataFrame:
    """Streaming exact dedup — the continuous twin of the batch q15/q78
    dedup pass: `dropDuplicatesWithinWatermark` keeps one row per key
    with state bounded by the watermark horizon (a late replay outside
    the horizon is the accepted at-least-once residue; inside it the sink
    sees each key EXACTLY once).  Used in front of the lakehouse sink so
    re-delivered micro-batches (source retries, backfills) don't double
    rows.  State scales O(distinct keys in horizon), partitioned by key
    hash — no global coordination."""
    keys = keys or ["event_id"]
    stream_df = stream_df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return stream_df.withWatermark(ts_col, watermark) \
        .dropDuplicatesWithinWatermark(keys)
