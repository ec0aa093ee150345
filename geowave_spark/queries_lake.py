"""Registry queries for the snapshot-table (lakehouse) layer.

q68 — the reference's indexed range scan re-expressed as manifest file
pruning: the events point set is written clustered by its SFC cell key, a
query window decomposes to a cell-range conjunct, and only files whose
footer stats overlap reach the Spark job (reference:
`core/store/.../base/BaseConstraintsQuery.java:332-341` range scan in
/root/reference).  q69 — snapshot isolation through a copy-on-write DELETE
and a compaction: every snapshot stays readable at its own version
(reference analog: delete/requery cycles in
`test/src/test/java/.../GeoWaveBasicSpatialVectorIT.java`).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: N812

from .table import geo, snapshots as S

_SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        ".scratch")

_RES = 7
_N = 1 << _RES
# query window: lat band x lon range (band → contiguous row-major cell range)
_LAT0, _LAT1 = 10.0, 35.0
_LON0, _LON1 = -120.0, 30.0


def _events_table(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per sf_dir) the snapshot table of events clustered by
    cell — the write-side 'sortedBy(cell)' that makes pruning sharp."""
    path = os.path.join(_SCRATCH, f"snap_events_{os.path.basename(os.path.normpath(sf_dir))}")
    if S.current_snapshot(path) == 0:
        shutil.rmtree(path, ignore_errors=True)  # clear any crashed half-build
        ev = spark.sql(geo.events_points_sql(sf_dir=sf_dir)).withColumn(
            "cell", F.expr(geo.rowmajor_cell_sql("lon", "lat", _RES))
        )
        S.create(ev, path, cluster_by=["cell"], num_files=16)
    return path


def _band_y(lat: float) -> int:
    """Row index of a latitude (same ceil(c*n)-1 normalization as
    geo.rowmajor_cell_sql)."""
    import math
    return min(max(int(math.ceil((lat + 90.0) / 180.0 * _N)) - 1, 0), _N - 1)


def _band_cells() -> tuple[int, int]:
    """Row-major cell bounds of the latitude band."""
    return _band_y(_LAT0) * _N, (_band_y(_LAT1) + 1) * _N - 1


_WHERE = (
    f"lat >= {_LAT0} AND lat < {_LAT1} AND lon >= {_LON0} AND lon < {_LON1}"
)


def q68_snapshot_prune_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range scan through the manifest: prune files by the cell-range
    conjunct (a superset of the window), refine with the exact predicate,
    aggregate.  Pruning effectiveness is pinned in tests/test_snapshots.py."""
    path = _events_table(spark, sf_dir)
    lo, hi = _band_cells()
    return (
        S.scan(spark, path, prune=[("cell", "between", (lo, hi))], where=_WHERE)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.expr("cast(round(value * 100) as bigint)")).alias("sum_value_cents"),
        )
        .orderBy("event_type")
    )


Q68_SQL = f"""
WITH e AS ({geo.events_points_sql()})
SELECT event_type,
       cast(count(*) as bigint) AS n_events,
       cast(sum(cast(round(value * 100) as bigint)) as bigint) AS sum_value_cents
FROM e
WHERE {_WHERE}
GROUP BY event_type
ORDER BY event_type
"""


def q69_snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """create → copy-on-write DELETE → compact, then read every snapshot at
    its own version.  The per-snapshot aggregates prove isolation: v1 keeps
    the deleted rows, v3 (rewritten files) equals v2 exactly."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").selectExpr(
        "l_orderkey", "l_linenumber", "cast(l_quantity as bigint) AS qty"
    )
    path = os.path.join(_SCRATCH, f"snap_tt_{uuid.uuid4().hex}")
    try:
        S.create(li, path, cluster_by=["l_orderkey"], num_files=8)
        S.delete_where(spark, path, "qty > 40")
        S.compact(spark, path, target_rows=1_000_000)
        rows = []
        for snap in (1, 2, 3):
            r = S.scan(spark, path, snapshot=snap).agg(
                F.count("*").alias("n"), F.sum("qty").alias("s")
            ).first()
            rows.append((snap, r["n"], r["s"]))
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(
        rows, "snapshot int, n_rows bigint, sum_qty bigint"
    ).orderBy("snapshot")


Q69_SQL = """
WITH q AS (SELECT cast(l_quantity as bigint) AS qty FROM lineitem)
SELECT cast(1 as int) AS snapshot, cast(count(*) as bigint) AS n_rows,
       cast(sum(qty) as bigint) AS sum_qty FROM q
UNION ALL
SELECT cast(2 as int), cast(count(*) as bigint), cast(sum(qty) as bigint)
FROM q WHERE NOT (qty > 40)
UNION ALL
SELECT cast(3 as int), cast(count(*) as bigint), cast(sum(qty) as bigint)
FROM q WHERE NOT (qty > 40)
ORDER BY snapshot
"""


def _orders_attr_table(spark: SparkSession, sf_dir: str) -> str:
    """Snapshot table of orders clustered by o_totalprice — the reference's
    ATTRIBUTE (secondary) index: an index whose sort dimension is a plain
    field, so range predicates on that field prune at the index instead of
    scanning (`core/store/.../index/AttributeIndexImpl.java` and the
    secondary-index fast paths `BaseDataStore.java:381-465` in
    /root/reference).  Spark-first: cluster_by=attribute => disjoint
    footer-stat ranges => manifest planning skips the files."""
    path = os.path.join(
        _SCRATCH, f"snap_orders_{os.path.basename(os.path.normpath(sf_dir))}")
    if S.current_snapshot(path) == 0:
        shutil.rmtree(path, ignore_errors=True)
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").selectExpr(
            "o_orderkey", "o_custkey", "o_orderstatus",
            "cast(round(o_totalprice * 100) as bigint) AS price_cents",
            "o_orderdate",
        )
        S.create(orders, path, cluster_by=["price_cents"], num_files=16)
    return path


_Q72_LO, _Q72_HI = 5_000_00, 40_000_00  # 5k..40k dollars in cents


def q72_attribute_index_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range predicate on the attribute-index sort key: manifest stats
    pruning keeps only the files whose [min,max] price overlaps, the exact
    predicate refines, and the aggregate runs over the survivors.  A
    pruning-effectiveness pytest pins that files are actually skipped."""
    path = _orders_attr_table(spark, sf_dir)
    return (
        S.scan(spark, path,
               prune=[("price_cents", "between", (_Q72_LO, _Q72_HI))],
               where=f"price_cents BETWEEN {_Q72_LO} AND {_Q72_HI}")
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("price_cents").alias("sum_cents"),
            F.min("price_cents").alias("min_cents"),
            F.max("price_cents").alias("max_cents"),
        )
        .orderBy("o_orderstatus")
    )


Q72_SQL = f"""
SELECT o_orderstatus,
       cast(count(*) as bigint) AS n_orders,
       cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint) AS sum_cents,
       cast(min(cast(round(o_totalprice * 100) as bigint)) as bigint) AS min_cents,
       cast(max(cast(round(o_totalprice * 100) as bigint)) as bigint) AS max_cents
FROM orders
WHERE cast(round(o_totalprice * 100) as bigint) BETWEEN {_Q72_LO} AND {_Q72_HI}
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def _rollup_tables(spark: SparkSession, sf_dir: str) -> str:
    """Events snapshot table built in TWO appends + a rollup refreshed
    after each — the hypertable-rollup flow (`table/rollup.py`).  Build is
    idempotent per sf_dir; a half-built state (crashed run) is detected
    and rebuilt."""
    sfn = os.path.basename(os.path.normpath(sf_dir))
    src = os.path.join(_SCRATCH, f"snap_ev_ts_{sfn}")
    dst = os.path.join(_SCRATCH, f"rollup_ev_{sfn}")
    from .table import rollup as R

    def _ev(half: int):
        return spark.sql(
            f"SELECT event_id, ts, event_type, "
            f"cast(round(value * 100) as bigint) AS cents "
            f"FROM parquet.`{sf_dir}/events.parquet` "
            f"WHERE event_id % 2 = {half}"
        )

    complete = (S.current_snapshot(src) == 2
                and S.current_snapshot(dst) >= 2
                and S.load_manifest(dst)["summary"].get("src_snapshot") == 2)
    if not complete:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(dst, ignore_errors=True)
        S.create(_ev(0), src, cluster_by=["ts"], num_files=4)
        R.refresh_rollup(spark, src, dst, time_col="ts",
                         keys=["event_type"], value_col="cents")
        S.append(_ev(1), src, num_files=4)
        info = R.refresh_rollup(spark, src, dst, time_col="ts",
                                keys=["event_type"], value_col="cents")
        assert info["mode"] == "incremental", info
    return dst


def q73_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous aggregate refreshed INCREMENTALLY across two ingest
    batches: the second refresh scans only the appended files (pinned in
    tests/test_rollup.py), yet the result equals a from-scratch
    aggregation — the oracle computes exactly that from the raw events."""
    dst = _rollup_tables(spark, sf_dir)
    return (
        S.scan(spark, dst)
        .selectExpr("bucket", "event_type", "n", "sum_v AS sum_cents",
                    "min_v AS min_cents", "max_v AS max_cents")
        .orderBy("bucket", "event_type")
    )


Q73_SQL = """
SELECT date_trunc('day', ts) AS bucket, event_type,
       cast(count(*) as bigint) AS n,
       cast(sum(cast(round(value * 100) as bigint)) as bigint) AS sum_cents,
       cast(min(cast(round(value * 100) as bigint)) as bigint) AS min_cents,
       cast(max(cast(round(value * 100) as bigint)) as bigint) AS max_cents
FROM events
GROUP BY 1, 2
ORDER BY bucket, event_type
"""


# window for q86 — disjoint from q68's band so the two oracles differ
_O_LAT0, _O_LAT1 = -55.0, -20.0
_O_LON0, _O_LON1 = -40.0, 100.0
_O_WHERE = (
    f"lat >= {_O_LAT0} AND lat < {_O_LAT1} "
    f"AND lon >= {_O_LON0} AND lon < {_O_LON1}"
)


def _optimized_events_table(spark: SparkSession, sf_dir: str) -> str:
    """Events written UNCLUSTERED (ingest order — every file's cell range
    spans the world), then rewritten with `snapshots.optimize` clustered
    by the SFC cell key.  Snapshot 1 keeps the messy layout (time travel
    shows the before state); snapshot 2 is the pruning-sharp one."""
    sfn = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(_SCRATCH, f"snap_opt_{sfn}")
    complete = (S.current_snapshot(path) == 2
                and S.load_manifest(path)["operation"] == "optimize")
    if not complete:
        shutil.rmtree(path, ignore_errors=True)
        ev = spark.sql(geo.events_points_sql(sf_dir=sf_dir)).withColumn(
            "cell", F.expr(geo.rowmajor_cell_sql("lon", "lat", _RES))
        )
        S.create(ev, path, num_files=16)  # ingest order: no cluster key
        total = sum(f["rows"] for f in S.load_manifest(path)["files"])
        S.optimize(spark, path, cluster_by=["cell"],
                   target_rows=max(1, -(-total // 16)))
    return path


def q86_optimize_recluster_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE (re-cluster) then pruned range scan: the table starts in
    ingest order where every file overlaps every query window (manifest
    pruning keeps all 16 files — measured in tests/test_snapshots.py),
    one `optimize(cluster_by=cell)` rewrite later the same window query
    plans only the overlapping files.  This is the Delta
    ``OPTIMIZE ZORDER``/Iceberg sort-order-rewrite operation expressed
    against the snapshot layer — the write-side dual of the reference's
    indexed range scan (`core/store/.../base/BaseConstraintsQuery.java:
    332-341` in /root/reference): same predicate, same answer, the layout
    alone decides how much data moves.  The oracle never sees the table —
    it recomputes the aggregate from raw events."""
    path = _optimized_events_table(spark, sf_dir)
    lo_y = _band_y(_O_LAT0) * _N
    hi_y = (_band_y(_O_LAT1) + 1) * _N - 1
    return (
        S.scan(spark, path, prune=[("cell", "between", (lo_y, hi_y))],
               where=_O_WHERE)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.expr("cast(round(value * 100) as bigint)")).alias("sum_value_cents"),
        )
        .orderBy("event_type")
    )


Q86_SQL = f"""
WITH e AS ({geo.events_points_sql()})
SELECT event_type,
       cast(count(*) as bigint) AS n_events,
       cast(sum(cast(round(value * 100) as bigint)) as bigint) AS sum_value_cents
FROM e
WHERE {_O_WHERE}
GROUP BY event_type
ORDER BY event_type
"""


def _cdc_events_table(spark: SparkSession, sf_dir: str) -> str:
    """Events in THREE append-only snapshots (event_id % 3 thirds) — the
    producer side of an incremental-consumption pipeline."""
    sfn = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(_SCRATCH, f"snap_cdc_{sfn}")
    if S.current_snapshot(path) != 3:
        shutil.rmtree(path, ignore_errors=True)

        def third(i: int):
            return spark.sql(
                f"SELECT event_id, event_type, "
                f"cast(round(value * 100) as bigint) AS cents "
                f"FROM parquet.`{sf_dir}/events.parquet` "
                f"WHERE event_id % 3 = {i}"
            )

        S.create(third(0), path, num_files=4)
        S.append(third(1), path, num_files=4)
        S.append(third(2), path, num_files=4)
    return path


def q91_incremental_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style incremental read: rows added AFTER snapshot 1 (appends 2
    and 3 only — the create batch never re-reads), aggregated per event
    type.  The consumer contract of Iceberg's incremental append scan:
    each batch is processed exactly once, history is never rescanned
    (`snapshots.incremental_scan` plans only files with snapshot_added in
    the range; non-append ops in the range raise)."""
    path = _cdc_events_table(spark, sf_dir)
    return (
        S.incremental_scan(spark, path, from_snapshot=1)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"), F.sum("cents").alias("sum_cents"))
        .orderBy("event_type")
    )


Q91_SQL = """
SELECT event_type, cast(count(*) as bigint) AS n_events,
       cast(sum(cast(round(value * 100) as bigint)) as bigint) AS sum_cents
FROM events WHERE event_id % 3 <> 0
GROUP BY event_type ORDER BY event_type
"""


def q92_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO (copy-on-write upsert): update every key ≡ 0 mod 7
    (qty + 1000, whole-row replace) and insert a fresh row (negated key)
    for every key ≡ 3 mod 11, in ONE merge commit that rewrites only the
    files holding matched keys.  Output: per-snapshot row counts and
    aggregates — v1 proves time travel (pre-merge state intact), v2
    proves the merge semantics against the closed-form oracle."""
    li = spark.sql(geo.lineitem_points_sql(sf_dir=sf_dir)).selectExpr(
        "pid", "cast(qty as bigint) AS qty"
    )
    path = os.path.join(_SCRATCH, f"snap_merge_{uuid.uuid4().hex}")
    try:
        S.create(li, path, cluster_by=["pid"], num_files=8)
        src = spark.sql(f"""
            SELECT pid, cast(qty as bigint) + 1000 AS qty
            FROM ({geo.lineitem_points_sql(sf_dir=sf_dir)}) WHERE pid % 7 = 0
            UNION ALL
            SELECT -pid - 1 AS pid, cast(qty as bigint) AS qty
            FROM ({geo.lineitem_points_sql(sf_dir=sf_dir)}) WHERE pid % 11 = 3
        """)
        info = S.merge_into(spark, path, src, key_cols=["pid"])
        assert info["updated_rows"] > 0 and info["inserted_rows"] > 0, info
        rows = []
        for snap in (1, 2):
            r = S.scan(spark, path, snapshot=snap).agg(
                F.count("*").alias("n"), F.sum("qty").alias("s"),
                F.sum(F.expr("CASE WHEN pid < 0 THEN 1 ELSE 0 END")).alias("ins"),
            ).first()
            rows.append((snap, r["n"], r["s"], r["ins"]))
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(
        rows, "snapshot int, n_rows bigint, sum_qty bigint, n_inserted bigint"
    ).orderBy("snapshot")


Q92_SQL = f"""
WITH base AS (SELECT pid, cast(qty as bigint) AS qty
              FROM ({geo.lineitem_points_sql()}) t)
SELECT cast(1 as int) AS snapshot, cast(count(*) as bigint) AS n_rows,
       cast(sum(qty) as bigint) AS sum_qty, cast(0 as bigint) AS n_inserted
FROM base
UNION ALL
SELECT cast(2 as int),
       cast(count(*) + (SELECT count(*) FROM base WHERE pid % 11 = 3) as bigint),
       cast(sum(qty + CASE WHEN pid % 7 = 0 THEN 1000 ELSE 0 END)
            + (SELECT sum(qty) FROM base WHERE pid % 11 = 3) as bigint),
       cast((SELECT count(*) FROM base WHERE pid % 11 = 3) as bigint)
FROM base
ORDER BY snapshot
"""


_Q124_TERMS = ("vector", "stream", "merge")


def _postings_table(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per sf_dir) the inverted-index postings snapshot table
    (term, doc_id, tf) CLUSTERED BY term — the text secondary index as a
    lake table (reference: the n-gram text index plugin,
    `core/index/.../text/TextIndexStrategy.java` in /root/reference, whose
    key prefix is the term; here the cluster key + footer stats give the
    same only-touch-matching-ranges scan)."""
    sfn = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(_SCRATCH, f"snap_postings_{sfn}")
    if S.current_snapshot(path) == 0:
        shutil.rmtree(path, ignore_errors=True)
        post = spark.sql(
            f"SELECT term, doc_id, cast(count(*) as bigint) AS tf FROM ("
            f"SELECT doc_id, explode(split(text, ' ')) AS term "
            f"FROM parquet.`{sf_dir}/documents.parquet`) t "
            f"GROUP BY term, doc_id")
        S.create(post, path, cluster_by=["term"], num_files=16)
    return path


def q124_inverted_index_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive term search through the postings snapshot table: the
    term IN-list prunes manifest files by the cluster-key stats (only
    term-range files holding the query terms are opened — pinned by a
    pytest), then one keyed aggregate finds docs containing ALL terms.
    At corpus scale the postings table is the big side and the query
    touches O(matching files), never the corpus."""
    path = _postings_table(spark, sf_dir)
    terms = ", ".join(f"'{t}'" for t in _Q124_TERMS)
    return (
        S.scan(spark, path, prune=[("term", "in", list(_Q124_TERMS))],
               where=f"term IN ({terms})")
        .groupBy("doc_id")
        .agg(F.countDistinct("term").alias("n_terms"),
             F.sum("tf").alias("total_tf"))
        .filter(F.col("n_terms") == len(_Q124_TERMS))
        .select("doc_id", "total_tf")
        .orderBy("doc_id")
    )


Q124_SQL = f"""
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
             FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
       WHERE term IN ({", ".join(f"'{t}'" for t in _Q124_TERMS)})
       GROUP BY 1, 2)
SELECT doc_id, cast(sum(tf) as bigint) AS total_tf
FROM tf GROUP BY doc_id HAVING count(DISTINCT term) = {len(_Q124_TERMS)}
ORDER BY doc_id
"""


def q123_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-audit-publish: stage an append as an UNPUBLISHED snapshot
    (CURRENT does not move — production readers keep the audited view),
    audit it by scanning the staged id, publish atomically, then pin a
    reproducibility tag.  Iceberg's WAP pattern (`wap.id` staged commits +
    cherry-pick publish) on the linear snapshot chain; the reference has
    no transactional staging — its writers are visible per-row as written.
    Output: (phase, snapshot, n_rows, sum_qty) per workflow phase, all
    derivable in closed form from the source table."""
    li = spark.sql(geo.lineitem_points_sql(sf_dir=sf_dir)).selectExpr(
        "pid", "cast(qty as bigint) AS qty")
    path = os.path.join(_SCRATCH, f"snap_wap_{uuid.uuid4().hex}")
    rows = []

    def phase(name: str, snap) -> None:
        r = S.scan(spark, path, snapshot=snap).agg(
            F.count("*").alias("n"), F.sum("qty").alias("s")).first()
        rows.append((name, S.current_snapshot(path), r["n"], r["s"]))

    try:
        S.create(li.filter("pid % 5 <> 0"), path, num_files=4)
        S.append(li.filter("pid % 5 = 0"), path, stage_only=True)
        phase("staged_current", None)       # readers still see v1 only
        phase("staged_audit", 2)            # the audit scans the staged id
        S.publish(path)
        phase("published", None)            # one atomic pointer swap later
        S.create_tag(path, "prod")
        phase("tagged", "prod")             # named ref == published snapshot
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(
        rows, "phase string, current int, n_rows bigint, sum_qty bigint"
    ).orderBy("phase")


Q123_SQL = f"""
WITH base AS (SELECT pid, cast(qty as bigint) AS qty
              FROM ({geo.lineitem_points_sql()}) t),
a AS (SELECT count(*) AS n, sum(qty) AS s FROM base WHERE pid % 5 <> 0),
t AS (SELECT count(*) AS n, sum(qty) AS s FROM base)
SELECT 'staged_current' AS phase, cast(1 as int) AS current,
       cast(a.n as bigint) AS n_rows, cast(a.s as bigint) AS sum_qty FROM a
UNION ALL
SELECT 'staged_audit', cast(1 as int), cast(t.n as bigint),
       cast(t.s as bigint) FROM t
UNION ALL
SELECT 'published', cast(2 as int), cast(t.n as bigint),
       cast(t.s as bigint) FROM t
UNION ALL
SELECT 'tagged', cast(2 as int), cast(t.n as bigint),
       cast(t.s as bigint) FROM t
ORDER BY phase
"""


def q296_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level semantic diff across a NON-APPEND history (the CDC read
    q91's incremental scan refuses): create -> MERGE (update pid%7=0,
    insert -pid-1 for pid%11=3) -> copy-on-write DELETE (pid>=0 and
    pid%5=1), then `snapshots.diff` labels every key added / deleted /
    updated / unchanged between snapshot 1 and snapshot 3.  Output:
    per-status counts + key checksum, against the closed-form oracle
    derived from the same modular construction rules.

    The checksum is sum(pid % 1000003), NOT sum(pid): pid is the
    composite lineitem key (~1e15 at sf0.1, growing with orderkey), so
    a raw sum bursts int64 once a status group passes ~10^4 rows — the
    r5 full-registry scale sweep caught exactly that (ANSI Spark and
    DuckDB both raise; sf0.01 sat just under the edge, which is why
    the small-scale gate stayed green).  The mod keeps per-row terms
    under 1e6, safe to ~9e12 rows per group; both dialects use
    truncation-mod so negative 'added' keys agree."""
    li = spark.sql(geo.lineitem_points_sql(sf_dir=sf_dir)).selectExpr(
        "pid", "cast(qty as bigint) AS qty"
    )
    path = os.path.join(_SCRATCH, f"snap_diff_{uuid.uuid4().hex}")
    try:
        S.create(li, path, cluster_by=["pid"], num_files=8)
        src = spark.sql(f"""
            SELECT pid, cast(qty as bigint) + 1000 AS qty
            FROM ({geo.lineitem_points_sql(sf_dir=sf_dir)}) WHERE pid % 7 = 0
            UNION ALL
            SELECT -pid - 1 AS pid, cast(qty as bigint) AS qty
            FROM ({geo.lineitem_points_sql(sf_dir=sf_dir)}) WHERE pid % 11 = 3
        """)
        S.merge_into(spark, path, src, key_cols=["pid"])
        S.delete_where(spark, path, "pid >= 0 AND pid % 5 = 1")
        d = S.diff(spark, path, 1, 3, key_cols=["pid"])
        out = (
            d.groupBy("status")
            .agg(F.count("*").alias("n"),
                 F.sum(F.expr("pid % 1000003")).alias("sum_pid"))
            .orderBy("status")
        )
        rows = [(r["status"], r["n"], r["sum_pid"]) for r in out.collect()]
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(
        rows, "status string, n bigint, sum_pid bigint").orderBy("status")


Q296_SQL = f"""
WITH base AS (SELECT pid FROM ({geo.lineitem_points_sql()}) t)
SELECT 'added' AS status,
       cast(count(*) as bigint) AS n,
       cast(sum((-pid - 1) % 1000003) as bigint) AS sum_pid
FROM base WHERE pid % 11 = 3 HAVING count(*) > 0
UNION ALL
SELECT 'deleted', cast(count(*) as bigint), cast(sum(pid % 1000003) as bigint)
FROM base WHERE pid % 5 = 1 HAVING count(*) > 0
UNION ALL
SELECT 'unchanged', cast(count(*) as bigint), cast(sum(pid % 1000003) as bigint)
FROM base WHERE pid % 5 <> 1 AND pid % 7 <> 0 HAVING count(*) > 0
UNION ALL
SELECT 'updated', cast(count(*) as bigint), cast(sum(pid % 1000003) as bigint)
FROM base WHERE pid % 5 <> 1 AND pid % 7 = 0 HAVING count(*) > 0
ORDER BY status
"""


LAKE_QUERIES = {
    "q296_snapshot_diff": (q296_snapshot_diff, Q296_SQL),
    "q68_snapshot_prune_scan": (q68_snapshot_prune_scan, Q68_SQL),
    "q69_snapshot_time_travel": (q69_snapshot_time_travel, Q69_SQL),
    "q72_attribute_index_scan": (q72_attribute_index_scan, Q72_SQL),
    "q73_hypertable_rollup": (q73_hypertable_rollup, Q73_SQL),
    "q86_optimize_recluster_scan": (q86_optimize_recluster_scan, Q86_SQL),
    "q91_incremental_scan": (q91_incremental_scan, Q91_SQL),
    "q92_merge_upsert": (q92_merge_upsert, Q92_SQL),
    "q123_wap_publish": (q123_wap_publish, Q123_SQL),
    "q124_inverted_index_search": (q124_inverted_index_search, Q124_SQL),
}


def _diff_events_table(spark: SparkSession, sf_dir: str) -> str:
    """Events table mutated across three snapshots: create (event_id%3=0),
    copy-on-write DELETE (%7=0 of those), append (%3=1) — the fixture
    for the snapshot-diff operator."""
    sfn = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(_SCRATCH, f"snap_diff_{sfn}")
    if S.current_snapshot(path) != 3:
        shutil.rmtree(path, ignore_errors=True)

        def part(i: int):
            return spark.sql(
                f"SELECT event_id, event_type, "
                f"cast(round(value * 100) as bigint) AS cents "
                f"FROM parquet.`{sf_dir}/events.parquet` "
                f"WHERE event_id % 3 = {i}"
            )

        S.create(part(0), path, num_files=4)
        S.delete_where(spark, path, "event_id % 7 = 0")
        S.append(part(1), path, num_files=4)
    return path


def q245_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot DIFF — the table-level change summary between two
    versions (what Iceberg calls a changelog scan, generalized past
    appends: q91's incremental scan refuses non-append history, this
    reads BOTH endpoints and reconciles by key).  Classifies every key
    as added / removed between snapshot 1 and the current version via
    one full-outer key join of two time-travel reads, then rolls the
    changes up per event type.

    Scale shape: two manifest-planned snapshot reads (file-pruned
    independently), ONE keyed full-outer join on the table key, keyed
    roll-up; nothing scans history in between — cost is the two
    endpoint sizes, not the number of intervening snapshots."""
    path = _diff_events_table(spark, sf_dir)
    old = S.scan(spark, path, snapshot=1).select(
        F.col("event_id").alias("k_old"),
        F.col("event_type").alias("t_old"))
    new = S.scan(spark, path).select(
        F.col("event_id").alias("k_new"),
        F.col("event_type").alias("t_new"))
    diff = old.join(new, old["k_old"] == new["k_new"], "full_outer")
    return (
        diff.withColumn(
            "change",
            F.when(F.col("k_old").isNull(), F.lit("added"))
             .when(F.col("k_new").isNull(), F.lit("removed")))
        .filter(F.col("change").isNotNull())
        .withColumn("event_type", F.coalesce("t_old", "t_new"))
        .groupBy("change", "event_type")
        .agg(F.count("*").cast("bigint").alias("n_keys"))
        .orderBy("change", "event_type")
    )


Q245_SQL = """
WITH old AS (
  SELECT event_id, event_type FROM events WHERE event_id % 3 = 0
),
new AS (
  SELECT event_id, event_type FROM events
  WHERE (event_id % 3 = 0 AND event_id % 7 <> 0) OR event_id % 3 = 1
),
d AS (
  SELECT CASE WHEN o.event_id IS NULL THEN 'added'
              WHEN n.event_id IS NULL THEN 'removed' END AS change,
         coalesce(o.event_type, n.event_type) AS event_type
  FROM old o FULL OUTER JOIN new n ON n.event_id = o.event_id
)
SELECT change, event_type, cast(count(*) as bigint) AS n_keys
FROM d WHERE change IS NOT NULL
GROUP BY change, event_type ORDER BY change, event_type
"""

LAKE_QUERIES["q245_snapshot_diff"] = (q245_snapshot_diff, Q245_SQL)
