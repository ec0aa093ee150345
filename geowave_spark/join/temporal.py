"""Temporal join operators: as-of join and interval join.

Spark has neither operator natively; naive formulations are theta-joins
that plan as cartesian products.  Both operators here re-use the engine's
cover-join idea in the TIME dimension (reference analog: temporal binning
`core/geotime/.../binning/TemporalBinningStrategy.java` + the During
predicate in /root/reference): decompose to time-bin equi-joins, refine
exactly, never materialize the cross product.

Scale shape, in both operators:
- the only joins are hash equi-joins on (keys…, bin);
- per-bin reference tables have ONE row per (key, bin) regardless of row
  volume, so the broadcast side stays executor-sized at 10^12 input rows;
- everything is JVM codegen (no UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F  # noqa: N812


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    by: list[str] | None = None,
    bin_size: int = 86_400,
    how: str = "left",
) -> DataFrame:
    """For every left row, the LATEST right row with
    ``right_ts <= left_ts`` (optionally within the same ``by`` keys) —
    the point-in-time / as-of join of time-series stores.

    Composition (no theta-join anywhere):

    1. in-bin candidates: equi-join on (by…, bin), filter
       ``right_ts <= left_ts``, keep ``max(struct(right_ts, …))`` per left
       row — struct max is the lexicographically latest row,
       deterministic through the remaining columns as tie-breakers;
    2. left rows whose bin has no earlier right row fall back to a
       cumulative per-bin last-row table (one row per (by…, bin) — tiny
       at any scale), joined on ``prev_bin < bin`` within the same keys;
    3. ``coalesce`` of the two.

    ``how='left'`` keeps unmatched left rows with NULLs; ``'inner'``
    drops them.  Right columns come back under their own names; clashes
    with left columns get an ``_r`` suffix.
    """
    by = list(by or [])
    rcols = [c for c in right.columns if c not in by and c != right_ts]
    payload = F.struct(F.col(right_ts), *[F.col(c) for c in rcols]).alias("_p")

    r = right.select(*by, payload).withColumn(
        "_bin", F.expr(f"_p.{right_ts} div {bin_size}"))
    lt = left.withColumn("_bin", F.expr(f"{left_ts} div {bin_size}")) \
             .withColumn("_lid", F.monotonically_increasing_id())

    inbin = (
        lt.select("_lid", left_ts, *by, "_bin")
        .join(r, by + ["_bin"])
        .filter(F.expr(f"_p.{right_ts} <= {left_ts}"))
        .groupBy("_lid").agg(F.max("_p").alias("_m"))
    )
    # one row per (by…, bin): the latest right row in that bin
    binagg = r.groupBy(*by, "_bin").agg(F.max("_p").alias("_m"))
    lbins = lt.select(*by, "_bin").distinct()
    bq = binagg.withColumnRenamed("_bin", "_qbin")
    cond = F.col("_qbin") < F.col("_bin")
    for k in by:
        cond = cond & (bq[k] == lbins[k])
    fallback = (
        lbins.join(F.broadcast(bq), cond)
        .groupBy(*[lbins[k] for k in by], lbins["_bin"])
        .agg(F.max("_m").alias("_pm"))
    )

    out = (
        lt.join(inbin, "_lid", "left")
        .join(F.broadcast(fallback), by + ["_bin"], "left")
        .withColumn("_w", F.coalesce("_m", "_pm"))
    )
    if how == "inner":
        out = out.filter(F.col("_w").isNotNull())
    elif how != "left":
        raise ValueError(f"asof_join: how must be left|inner, got {how!r}")
    taken = set(left.columns)
    sel = [out[c] for c in left.columns]
    sel.append(F.col(f"_w.{right_ts}").alias(
        right_ts if right_ts not in taken else right_ts + "_r"))
    for c in rcols:
        sel.append(F.col(f"_w.{c}").alias(c if c not in taken else c + "_r"))
    return out.select(*sel)


def interval_join(
    rows: DataFrame,
    intervals: DataFrame,
    ts: str,
    start: str,
    end: str,
    bin_size: int = 86_400,
    broadcast_intervals: bool = True,
) -> DataFrame:
    """Rows joined to every interval with ``start <= ts < end`` (1-D range
    join).  Intervals explode to their covering bins
    (``explode(sequence(...))``, JVM-only), rows key by their bin, a hash
    equi-join on the bin produces candidates, and the exact range test
    refines.  Pairs are unique by construction — an interval covers each
    of its bins exactly once.  Set ``broadcast_intervals=False`` when the
    exploded interval side exceeds executor memory; the equi-join then
    shuffles both sides on the bin.
    """
    iv = intervals.withColumn(
        "_bin",
        F.explode(F.expr(f"sequence({start} div {bin_size}, "
                         f"({end} - 1) div {bin_size})")),
    )
    if broadcast_intervals:
        iv = F.broadcast(iv)
    r = rows.withColumn("_bin", F.expr(f"{ts} div {bin_size}"))
    return (
        r.join(iv, "_bin")
        .filter((F.col(ts) >= F.col(start)) & (F.col(ts) < F.col(end)))
        .drop("_bin")
    )
