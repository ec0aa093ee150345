"""Temp-view registration for the driver testdata tables."""

from __future__ import annotations

from pyspark.sql import SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def ensure_arrow(spark: SparkSession) -> None:
    """Turn on Arrow for driver<->JVM DataFrame conversion (runtime conf).

    Without it, `spark.createDataFrame(pandas)` pickles row-by-row —
    measured 4.1s vs 0.5s for an 85k-row broadcast cover table.  Set here
    (and in the engine operators that build covers) because the harness
    may hand us a session created without this conf.
    """
    try:
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    except Exception:
        pass  # conf locked down — operators still work, just slower


def register_views(spark: SparkSession, sf_dir: str,
                   force: bool = False) -> None:
    """Register the base parquet tables as temp views (idempotent).

    Registration is cached per (session, sf_dir): each `spark.read.parquet`
    is a driver-side footer read (~100ms x 10 tables), and every query entry
    point calls this — without the cache a 0.5s aggregate pays ~1.3s of
    re-registration (measured).  A different sf_dir re-registers.

    The cache is verified against a sentinel view (a caller may have
    dropped or replaced a temp view mid-session); ``force=True`` skips the
    cache entirely (e.g. after regenerating parquet under the same path).
    """
    if (
        not force
        and getattr(spark, "_geowave_views_sf", None) == sf_dir
        and spark.catalog.tableExists("lineitem")
    ):
        return
    ensure_arrow(spark)
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    spark._geowave_views_sf = sf_dir


def mat_view(spark, name: str, sql_or_df, eager: bool = True):
    """Materialize a relation once and expose it as a temp view.

    Spark SQL inlines WITH-CTEs: a CTE referenced k times executes k
    times, and an unrolled iterative query (Bellman-Ford, label
    propagation, k-core, power iteration) re-executes its base-relation
    subtree 2^rounds..3^rounds times.  `localCheckpoint(eager=True)`
    cuts the lineage and stores the partitions, so every later reference
    is a scan of the materialized result — the Spark analog of the
    reference's MEMORY_ONLY_SER persists inside its tiered join
    (`TieredSpatialJoin.java:352` in /root/reference)."""
    df = spark.sql(sql_or_df) if isinstance(sql_or_df, str) else sql_or_df
    df = df.localCheckpoint(eager=eager)
    df.createOrReplaceTempView(name)
    return df
