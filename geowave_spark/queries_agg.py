"""Aggregation / statistics / temporal / subsample / anti-join queries
(q24-q30) — each with a DuckDB oracle built from the same SQL fragments.

Reference parity targets (/root/reference):
- q24: KDE heatmap `analytics/spark/.../kde/KDERunner.java:234-315`
- q25: numeric field statistics `core/store/.../statistics/field/*`
- q26: fixed-bin histogram `FixedBinNumericHistogramStatistic.java`
- q27: row-range histogram `RowRangeHistogramStatistic.java` +
  `SplitsProvider.java:284-325`
- q28: temporal filter expressions `core/geotime/.../expression/temporal/*`
- q29: resolution subsampling `BaseQueryOptions.java:64,128`
- q30: negative-predicate spatial join `TieredSpatialJoin.java:362-368`
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .agg import kde, stats
from .functions import temporal
from .index import subsample as sub
from .join import spatial
from .table import geo
from .table.views import register_views


def q24_kde_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaussian-style KDE splat + percentile rank per cell (pure JVM)."""
    register_views(spark, sf_dir)
    pts = spark.sql(geo.events_points_sql())
    return kde.kde_heatmap(spark, pts, res=6, k=2).orderBy("cell")


Q24_SQL = kde.kde_oracle_sql(geo.events_points_sql(), res=6, k=2)


def q25_numeric_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type numeric field statistics, integerized for hash stability:
    avg = intdiv(sum_cents, n) so no float-sum order dependence."""
    register_views(spark, sf_dir)
    return (
        spark.table("events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.min(F.expr("cast(round(value * 100) as bigint)")).alias("min_cents"),
            F.max(F.expr("cast(round(value * 100) as bigint)")).alias("max_cents"),
            F.expr(
                "sum(cast(round(value * 100) as bigint)) div count(*)"
            ).alias("avg_cents"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("event_type")
    )


Q25_SQL = """
SELECT event_type,
       cast(count(*) as bigint) AS n,
       min(cast(round(value * 100) as bigint)) AS min_cents,
       max(cast(round(value * 100) as bigint)) AS max_cents,
       cast(sum(cast(round(value * 100) as bigint)) // count(*) as bigint) AS avg_cents,
       cast(count(DISTINCT user_id) as bigint) AS n_users
FROM events GROUP BY event_type ORDER BY event_type
"""


def q26_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bin histogram of event value over [0, 500) in 32 bins."""
    register_views(spark, sf_dir)
    return (
        stats.fixed_bin_histogram(spark.table("events"), "value", 0.0, 500.0, 32)
        .orderBy("bucket")
    )


Q26_SQL = f"""
SELECT {stats.bucket_sql('value', 0.0, 500.0, 32)} AS bucket,
       cast(count(*) as bigint) AS n
FROM events GROUP BY 1 ORDER BY bucket
"""


def q27_cell_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-range histogram: rows per grid cell at res 5 (planner metadata
    that feeds `stats.recommend_salt`)."""
    register_views(spark, sf_dir)
    pts = spark.sql(geo.events_points_sql())
    return stats.cell_histogram(pts, res=5).orderBy("cell")


Q27_SQL = f"""
WITH p AS ({geo.events_points_sql()})
SELECT {geo.rowmajor_cell_sql('lon', 'lat', 5)} AS cell,
       cast(count(*) as bigint) AS n
FROM p GROUP BY 1 ORDER BY cell
"""


T0, T1 = "2024-01-08 00:00:00", "2024-01-15 00:00:00"
T_AFTER = "2024-01-22 00:00:00"


def q28_temporal_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """During [T0,T1) vs After T_AFTER counts per event_type (temporal
    filter-expression tree surface)."""
    register_views(spark, sf_dir)
    ev = spark.table("events")
    return (
        ev.filter(temporal.during("ts", T0, T1) | temporal.after("ts", T_AFTER))
        .groupBy("event_type")
        .agg(
            F.sum(temporal.during("ts", T0, T1).cast("bigint")).alias("n_during"),
            F.sum(temporal.after("ts", T_AFTER).cast("bigint")).alias("n_after"),
        )
        .orderBy("event_type")
    )


Q28_SQL = f"""
SELECT event_type,
       cast(sum(case when {temporal.during_sql('ts', T0, T1)} then 1 else 0 end) as bigint) AS n_during,
       cast(sum(case when {temporal.after_sql('ts', T_AFTER)} then 1 else 0 end) as bigint) AS n_after
FROM events
WHERE {temporal.during_sql('ts', T0, T1)} OR {temporal.after_sql('ts', T_AFTER)}
GROUP BY event_type ORDER BY event_type
"""


def q29_subsample_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolution subsampling: one representative event per res-6 cell."""
    register_views(spark, sf_dir)
    pts = spark.sql(geo.events_points_sql())
    return sub.subsample_by_resolution(pts, res=6, id_col="eid").orderBy("cell")


Q29_SQL = sub.subsample_oracle_sql(geo.events_points_sql(), res=6, id_col="eid")


def q30_pip_rect_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative-predicate spatial join: customer points inside NO supplier
    rect (reference subtractByKey -> left_anti)."""
    register_views(spark, sf_dir)
    pts = spark.sql(geo.customer_points_sql()).withColumnRenamed("cid", "pid")
    rects = spark.sql(geo.supplier_rects_sql()).toPandas()
    return (
        spatial.point_in_rects_join(spark, pts, rects, res=8, negative=True)
        .orderBy("pid")
    )


Q30_SQL = f"""
WITH p AS (SELECT cid AS pid, lon, lat FROM ({geo.customer_points_sql()}) c),
     r AS ({geo.supplier_rects_sql()})
SELECT p.pid FROM p
WHERE NOT EXISTS (
  SELECT 1 FROM r
  WHERE p.lon BETWEEN r.lon0 AND r.lon1 AND p.lat BETWEEN r.lat0 AND r.lat1
)
ORDER BY p.pid
"""


def q36_pip_loose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loose (index-envelope-only) point-in-rect join: candidates from the
    cell cover with NO exact refine (reference LooseBBox semantics).  The
    oracle reproduces cover membership in closed form — a point is a
    candidate iff its grid ordinates fall in the rect's ordinate ranges,
    which is curve-independent."""
    register_views(spark, sf_dir)
    pts = spark.sql(geo.lineitem_points_sql())
    rects = spark.sql(geo.supplier_rects_sql()).toPandas()
    return (
        spatial.point_in_rects_join(spark, pts, rects, res=8, loose=True)
        .orderBy("pid", "rid")
    )


def _ord_sql(v: str, lo: float, hi: float, n: int) -> str:
    return (
        f"least(greatest(cast(ceil((({v}) - {lo!r}) / ({hi!r} - {lo!r}) * {n}) "
        f"as bigint) - 1, 0), {n - 1})"
    )


_N8 = 1 << 8
# ordinates hoisted into CTE columns: DuckDB's inequality join raises an
# internal error when the ON clause recomputes them inline
Q36_SQL = f"""
WITH p0 AS ({geo.lineitem_points_sql()}), r0 AS ({geo.supplier_rects_sql()}),
p AS (SELECT pid, {_ord_sql('lon', -180.0, 180.0, _N8)} AS ox,
             {_ord_sql('lat', -90.0, 90.0, _N8)} AS oy FROM p0),
r AS (SELECT rid, {_ord_sql('lon0', -180.0, 180.0, _N8)} AS x0,
             {_ord_sql('lon1', -180.0, 180.0, _N8)} AS x1,
             {_ord_sql('lat0', -90.0, 90.0, _N8)} AS y0,
             {_ord_sql('lat1', -90.0, 90.0, _N8)} AS y1 FROM r0)
SELECT p.pid, r.rid
FROM p JOIN r ON p.ox BETWEEN r.x0 AND r.x1 AND p.oy BETWEEN r.y0 AND r.y1
ORDER BY p.pid, r.rid
"""


def q37_spatiotemporal_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatiotemporal composite index: (time_bin, cell) keys — GeoWave's
    spatial-temporal index binning (`TimeDefinition.java` periodicity bins x
    SFC cells; `CompositeBinningStrategy.java`).  Count + value sum per
    (week, res-5 cell), filtered to a query window x bbox."""
    register_views(spark, sf_dir)
    ev = spark.sql(
        f"SELECT p.eid, p.lon, p.lat, p.value, "
        f"date_trunc('week', e.ts) AS week FROM ({geo.events_points_sql()}) p "
        f"JOIN events e ON e.event_id = p.eid"
    )
    cell = geo.rowmajor_cell_sql("lon", "lat", 5)
    return (
        ev.filter("week >= timestamp '2024-01-01 00:00:00'")
        .filter("lon BETWEEN -90 AND 90 AND lat BETWEEN -45 AND 45")
        .withColumn("cell", F.expr(cell))
        .groupBy("week", "cell")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.expr("cast(round(value * 100) as bigint)")).alias("sum_cents"),
        )
        .orderBy("week", "cell")
    )


Q37_SQL = f"""
WITH p AS ({geo.events_points_sql()}),
e AS (SELECT p.eid, p.lon, p.lat, p.value, date_trunc('week', ev.ts) AS week
      FROM p JOIN events ev ON ev.event_id = p.eid)
SELECT week, {geo.rowmajor_cell_sql('lon', 'lat', 5)} AS cell,
       cast(count(*) as bigint) AS n,
       cast(sum(cast(round(value * 100) as bigint)) as bigint) AS sum_cents
FROM e
WHERE week >= timestamp '2024-01-01 00:00:00'
  AND lon BETWEEN -90 AND 90 AND lat BETWEEN -45 AND 45
GROUP BY 1, 2 ORDER BY week, cell
"""


def q42_rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical binned aggregation via GROUP BY ROLLUP(cell, type).

    The reference has no grouping-sets concept (SURVEY.md §2.5 — absent);
    Spark gives the multi-level cell/type/grand-total rollup in ONE pass
    with partial aggregation, where GeoWave would need one scan per level.
    Sentinel coalesce keeps the null-marker rows hash-comparable.
    """
    register_views(spark, sf_dir)
    return spark.sql(_Q42_BODY)


_Q42_BODY = f"""
WITH e AS ({geo.events_points_sql()})
SELECT coalesce(cell, -1) AS cell, coalesce(event_type, 'ALL') AS event_type,
       cast(count(*) as bigint) AS n,
       cast(sum(cast(round(value * 100) as bigint)) as bigint) AS sum_cents
FROM (SELECT {geo.rowmajor_cell_sql('lon', 'lat', 4)} AS cell, event_type, value FROM e) t
GROUP BY ROLLUP(cell, event_type)
ORDER BY cell, event_type
"""

Q42_SQL = _Q42_BODY


def q43_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operators over two spatial result sets (INTERSECT / EXCEPT) —
    the reference uses `except` only in tests
    (`GeoWaveSparkSpatialJoinIT.java:162-172`); Spark has them built in.
    Points in rect A but not rect B, plus points in both, tagged.
    """
    register_views(spark, sf_dir)
    return spark.sql(_Q43_BODY)


_Q43_BODY = f"""
WITH p AS ({geo.lineitem_points_sql()}),
a AS (SELECT pid FROM p WHERE lon BETWEEN -60 AND 60 AND lat BETWEEN -30 AND 30),
b AS (SELECT pid FROM p WHERE lon BETWEEN 0 AND 120 AND lat BETWEEN 0 AND 60)
SELECT 'only_a' AS tag, pid FROM (SELECT pid FROM a EXCEPT SELECT pid FROM b) x
UNION ALL
SELECT 'both' AS tag, pid FROM (SELECT pid FROM a INTERSECT SELECT pid FROM b) y
ORDER BY tag, pid
"""

Q43_SQL = _Q43_BODY


# interval endpoints in epoch seconds, derived deterministically from order
# keys into the events' time range (Jan 2024) — shared by engine and oracle
_EPOCH_2024 = 1704067200  # timestamp '2024-01-01 00:00:00' UTC
_IVL = (
    "SELECT o_orderkey AS ivl_id, "
    f"cast({_EPOCH_2024} + (o_orderkey % 29) * 86400 + (o_orderkey % 24) * 3600 as bigint) AS start_s, "
    f"cast({_EPOCH_2024} + (o_orderkey % 29) * 86400 + (o_orderkey % 24) * 3600 "
    "+ (1 + o_orderkey % 8) * 3600 as bigint) AS end_s "
    "FROM orders WHERE o_orderkey % 40 = 1"
)


def q47_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal interval join: events falling in derived time intervals.

    Engine path mirrors the spatial cover join in the time dimension
    (reference: temporal binning `TemporalBinningStrategy.java` + During
    predicate, /root/reference): intervals explode to covering DAY bins
    (`explode(sequence(...))`, JVM-only), events key by their day bin, a
    broadcast equi-join on the bin produces candidates, and the exact
    `ts_s >= start AND ts_s < end` refine is a pure-JVM filter.  Pairs are
    unique by construction (an interval covers each of its bins once).
    Oracle: brute-force range join.  At 100 TB the bin equi-join is the
    only scalable shape — a naive theta-join would be a cartesian product.
    """
    from .join.temporal import interval_join

    register_views(spark, sf_dir)
    iv = spark.sql(_IVL)
    ev = spark.table("events").select(
        "event_id",
        F.expr("unix_timestamp(ts)").alias("ts_s"),
        F.expr("cast(round(value * 100) as bigint)").alias("value_cents"),
    )
    return (
        interval_join(ev, iv, ts="ts_s", start="start_s", end="end_s")
        .groupBy("ivl_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value_cents").alias("sum_value_cents"),
        )
        .orderBy("ivl_id")
    )


Q47_SQL = f"""
WITH iv AS ({_IVL}),
ev AS (SELECT event_id, cast(floor(epoch(ts)) as bigint) AS ts_s,
              cast(round(value * 100) as bigint) AS value_cents FROM events)
SELECT ivl_id, cast(count(*) as bigint) AS n_events,
       cast(sum(value_cents) as bigint) AS sum_value_cents
FROM ev JOIN iv ON ev.ts_s >= iv.start_s AND ev.ts_s < iv.end_s
GROUP BY ivl_id ORDER BY ivl_id
"""


# reference-point ("quote") series for the as-of join, epoch seconds
_QUOTES = (
    "SELECT o_orderkey AS qid, "
    f"cast({_EPOCH_2024} + (o_orderkey % 29) * 86400 + (o_orderkey % 19) * 4000 as bigint) AS tq "
    "FROM orders WHERE o_orderkey % 40 = 3"
)


def q48_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every event, the latest quote at-or-before its time.

    Spark has no asof operator; a naive formulation is a theta-join
    (cartesian).  Scalable composition:

    1. candidates within the event's own DAY bin: equi-join on bin +
       `tq <= ts_s` filter + `max(struct(tq, qid))` per event (struct max
       = lexicographic latest-then-highest-id, deterministic);
    2. events whose bin holds no earlier quote fall back to a *cumulative
       per-bin last-quote table* — one row per day regardless of data
       volume, so it stays broadcastable at 10^12 rows;
    3. coalesce(in-bin winner, fallback).

    Oracle: brute-force `row_number() over (order by tq desc)` theta-join.

    The bin size is METADATA-ADAPTIVE (the q08 idiom in the time
    dimension): the fixture's quotes all land in a FIXED 29-day span, so
    with a fixed day bin both quotes-per-bin and events-per-bin grow
    with sf and the in-bin candidate join is quadratic — the r5
    full-registry sweep measured 154 s at sf1 (~100x candidate mass at
    10x data).  Shrinking the bin as quote density grows (86400 /
    (n_quotes // 4000), floored to an hour) holds quotes-per-bin
    ~constant; the as-of result is bin-size INVARIANT (any event's
    latest-at-or-before quote is found in its bin or the cumulative
    fallback), so the oracle and all gate results are unchanged — at
    <= 4000 quotes (every gate sf) the divisor is 1 and the plan is
    byte-identical.
    """
    import os

    from .join.temporal import asof_join
    from .queries import _parquet_num_rows

    register_views(spark, sf_dir)
    n_quotes = _parquet_num_rows(os.path.join(sf_dir, "orders.parquet")) // 40
    bin_size = max(3600, 86_400 // max(1, n_quotes // 4000))
    q = spark.sql(_QUOTES)
    ev = spark.table("events").select(
        "event_id", F.expr("unix_timestamp(ts)").alias("ts_s")
    )
    return (
        asof_join(ev, q, left_ts="ts_s", right_ts="tq", how="inner",
                  bin_size=bin_size)
        .select(
            "event_id",
            F.col("tq").alias("quote_ts_s"),
            F.col("qid").alias("quote_id"),
        )
        .orderBy("event_id")
    )


Q48_SQL = f"""
WITH q AS ({_QUOTES}),
ev AS (SELECT event_id, cast(floor(epoch(ts)) as bigint) AS ts_s FROM events),
pairs AS (
  SELECT e.event_id, q.tq, q.qid,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY q.tq DESC, q.qid DESC) AS rn
  FROM ev e JOIN q ON q.tq <= e.ts_s
)
SELECT event_id, tq AS quote_ts_s, qid AS quote_id
FROM pairs WHERE rn = 1 ORDER BY event_id
"""


def q53_kde_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level KDE pyramid: one finest-res splat, then closed-form
    parent-cell rollups per level (one data scan for the whole pyramid;
    KDERunner re-splats per level — `KDERunner.java:234-315`)."""
    register_views(spark, sf_dir)
    pts = spark.sql(geo.events_points_sql())
    return kde.kde_pyramid(spark, pts, res=6, levels=3).orderBy("res", "cell")


Q53_SQL = kde.kde_pyramid_oracle_sql(geo.events_points_sql(), res=6, levels=3)


AGG_QUERIES = {
    "q24_kde_heatmap": (q24_kde_heatmap, Q24_SQL),
    "q53_kde_pyramid": (q53_kde_pyramid, Q53_SQL),
    "q42_rollup_agg": (q42_rollup_agg, Q42_SQL),
    "q43_set_ops": (q43_set_ops, Q43_SQL),
    "q47_interval_join": (q47_interval_join, Q47_SQL),
    "q48_asof_join": (q48_asof_join, Q48_SQL),
    "q25_numeric_stats": (q25_numeric_stats, Q25_SQL),
    "q26_value_histogram": (q26_value_histogram, Q26_SQL),
    "q27_cell_histogram": (q27_cell_histogram, Q27_SQL),
    "q28_temporal_predicates": (q28_temporal_predicates, Q28_SQL),
    "q29_subsample_resolution": (q29_subsample_resolution, Q29_SQL),
    "q30_pip_rect_anti": (q30_pip_rect_anti, Q30_SQL),
    "q36_pip_loose": (q36_pip_loose, Q36_SQL),
    "q37_spatiotemporal_bins": (q37_spatiotemporal_bins, Q37_SQL),
    "q38_geohash_binning": (None, None),  # placeholder replaced below
}


def q38_geohash_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash-binned aggregation (SpatialBinningType.GEOHASH analog):
    count + value sum per precision-3 geohash."""
    from .sfc import geohash

    register_views(spark, sf_dir)
    ev = spark.sql(geo.events_points_sql())
    return (
        ev.withColumn("gh", F.expr(geohash.geohash_sql("lon", "lat", 3)))
        .groupBy("gh")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.expr("cast(round(value * 100) as bigint)")).alias("sum_cents"),
        )
        .orderBy("gh")
    )


def _q38_sql() -> str:
    from .sfc import geohash

    return f"""
WITH p AS ({geo.events_points_sql()})
SELECT {geohash.geohash_sql('lon', 'lat', 3)} AS gh,
       cast(count(*) as bigint) AS n,
       cast(sum(cast(round(value * 100) as bigint)) as bigint) AS sum_cents
FROM p GROUP BY 1 ORDER BY gh
"""


AGG_QUERIES["q38_geohash_binning"] = (q38_geohash_binning, _q38_sql())


def q62_mercator_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom-CRS binned aggregation: events assigned to EPSG:3857
    (web-mercator) slippy-map tiles at zoom 5 — the reference's
    custom-CRS KDE/raster path (`CustomCRSKDERasterResizeIT.java`,
    GeoTools-reprojected indices) re-expressed as a closed-form projection
    in whole-stage-codegen SQL (`sfc/crs.py`); the oracle runs the
    IDENTICAL expression text on DuckDB."""
    from .sfc import crs

    register_views(spark, sf_dir)
    z = 5
    ev = spark.sql(geo.events_points_sql())
    tx, ty = crs.tile_xy_sql("lon", "lat", z)
    return (
        ev.withColumn("tx", F.expr(tx)).withColumn("ty", F.expr(ty))
        .groupBy("tx", "ty")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.expr("cast(round(value * 100) as bigint)")).alias("sum_cents"),
        )
        .orderBy("ty", "tx")
    )


def _q62_sql() -> str:
    from .sfc import crs

    tx, ty = crs.tile_xy_sql("lon", "lat", 5)
    return f"""
WITH p AS ({geo.events_points_sql()})
SELECT {tx} AS tx, {ty} AS ty,
       cast(count(*) as bigint) AS n,
       cast(sum(cast(round(value * 100) as bigint)) as bigint) AS sum_cents
FROM p GROUP BY 1, 2 ORDER BY ty, tx
"""


AGG_QUERIES["q62_mercator_tiles"] = (q62_mercator_tiles, _q62_sql())


_SESSION_GAP_US = 12 * 3600 * 1_000_000  # 12 hours


def q67_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessionization — the log-pipeline op Structured Streaming
    runs with the SAME operator on an unbounded stream.  Spark-first:
    the native `session_window(ts, gap)` grouping (state-store-backed in
    streaming, a single keyed aggregation in batch — no window-function
    shuffle-sort over the raw events).  Session semantics: an event
    extends the session iff it falls strictly inside the previous
    event's gap window; the oracle is the classic gaps-and-islands
    lag/cumsum formulation with the matching `>= gap` break rule.
    Reference has no sessionization (no streaming engine, SURVEY §2.9);
    this is training-data-pipeline surface."""
    register_views(spark, sf_dir)
    ev = spark.table("events").select(
        "user_id", "ts", F.expr("unix_micros(cast(ts as timestamp))").alias("tus"))
    sess = (
        ev.groupBy("user_id", F.session_window("ts", "12 hours"))
        .agg(F.count("*").alias("n"),
             F.min("tus").alias("t0"), F.max("tus").alias("t1"))
    )
    return (
        sess.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n").alias("n_events"),
            F.max(F.col("t1") - F.col("t0")).alias("max_span_us"),
            F.max("n").alias("max_session_events"),
        )
        .orderBy("user_id")
    )


def _q67_sql() -> str:
    return f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS tus FROM events),
x AS (
  SELECT user_id, tus,
         CASE WHEN tus - lag(tus) OVER w >= {_SESSION_GAP_US}
              OR lag(tus) OVER w IS NULL THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus)
),
s AS (
  SELECT user_id, tus,
         sum(brk) OVER (PARTITION BY user_id ORDER BY tus
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM x
),
g AS (
  SELECT user_id, sid, count(*) AS n, min(tus) AS t0, max(tus) AS t1
  FROM s GROUP BY user_id, sid
)
SELECT user_id, cast(count(*) as bigint) AS n_sessions,
       cast(sum(n) as bigint) AS n_events,
       cast(max(t1 - t0) as bigint) AS max_span_us,
       cast(max(n) as bigint) AS max_session_events
FROM g GROUP BY user_id ORDER BY user_id
"""


AGG_QUERIES["q67_sessionize"] = (q67_sessionize, _q67_sql())
