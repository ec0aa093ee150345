"""k-nearest-neighbors join with iterative ring expansion.

Reference analog: `analytics/mapreduce/.../nn/NNMapReduce.java:59-145` in
/root/reference — grid-partition by distance, per-partition neighbor search,
top-K selection, dedup across partitions.  Re-expressed Spark-first:

1. encode query points at a coarse resolution, explode a k-ring grid_disk
   as the broadcast candidate cell set,
2. equi-join data points on cell, compute exact distance (pure JVM),
3. `row_number()` over Window(partitionBy=query, orderBy=dist) <= k,
4. correctness guard: a query's k-th neighbor must be closer than the
   nearest unexplored cell (ring_radius * cell_height); under-filled or
   unproven queries re-run with a wider ring (driver loop, few iterations).

The rank tie-break is (dist, pid) so results are deterministic and match a
SQL window oracle exactly.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..index import cover as cov


def knn_join(
    spark: SparkSession,
    pts: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    pid_col: str = "pid",
    qid_col: str = "qid",
    res: int = 6,
    initial_ring: int = 1,
    max_iters: int = 8,
    broadcast_queries: bool | str = "auto",
    salt_buckets: int = 8,
    brute_tail_max: int | None = 10_000,
) -> DataFrame:
    """For each query point, the k nearest data points (planar metric).

    Returns (qid, pid, dist, rank).  Deterministic: ties broken by pid.

    ``broadcast_queries`` defaults to "auto" (count the query side
    against the session broadcast threshold via
    `spatial.resolve_query_side`); False switches every ring iteration's candidate
    join from broadcast-hash to a SALTED shuffled hash join (query cover
    replicated per salt, data side salted by hash(pid)) — the big-big
    path when the query set itself is beyond broadcast size (reference:
    `TieredSpatialJoin.java:168-172` hash-partitions both sides).  The
    remaining/done bookkeeping joins stay on the (shrinking) query side.

    ``brute_tail_max`` bounds the brute-force fallback for queries still
    unresolved after ``max_iters`` ring doublings: if more than this many
    remain, raise instead of silently turning the job into a cross join
    (default 10_000).  Pass ``None`` for the pre-r3 always-correct
    unbounded contract.
    """
    cell_h = 180.0 / (1 << res)
    from ..join.spatial import resolve_query_side
    broadcast_queries = resolve_query_side(
        spark, queries, broadcast_queries, initial_ring)

    q_named = queries.select(
        F.col(qid_col), F.col("lon").alias("qlon"), F.col("lat").alias("qlat")
    )
    # data side: closed-form row-major cell (pure JVM, codegen) — the big
    # table never enters Python; only the small query side pays an Arrow
    # round trip (the fused disk UDF below, row-major to match)
    from ..table import geo as geo_sql

    pts_c = pts.select(pid_col, "lon", "lat").withColumn(
        "cell", F.expr(geo_sql.rowmajor_cell_sql("lon", "lat", res))
    )

    win = Window.partitionBy(qid_col).orderBy(F.col("dist").asc(), F.col(pid_col).asc())
    # Multiply, not pow: bit-identical to the SQL oracle's (a-b)*(a-b)
    dx = F.col("lon") - F.col("qlon")
    dy = F.col("lat") - F.col("qlat")
    dist = F.sqrt(dx * dx + dy * dy)

    # the encode runs once; every ring iteration joins against the SAME
    # cached encoded points instead of re-running the UDF over the table
    pts_c = pts_c.persist()

    remaining = q_named
    results = None
    ring = initial_ring
    for _ in range(max_iters):
        # fused point->disk UDF dedups each disk in-batch, so the exploded
        # (qid, jcell) pairs are unique with no dropDuplicates shuffle
        q_cover = remaining.withColumn(
            "jcell",
            F.explode(
                cov.point_disk_cells_udf(res, ring, curve="rowmajor")(
                    F.col("qlon"), F.col("qlat")
                )
            ),
        )
        if broadcast_queries:
            cand = pts_c.withColumnRenamed("cell", "jcell").join(
                F.broadcast(q_cover), "jcell"
            )
        else:
            q_salted = q_cover.withColumn(
                "salt",
                F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
            )
            cand = cov.salted(
                pts_c.withColumnRenamed("cell", "jcell"), pid_col, salt_buckets
            ).join(q_salted.hint("shuffle_hash"), ["jcell", "salt"])
        # persist the per-iteration top-k (tiny: <= k rows per query): the
        # convergence check executes it once, and without the persist the
        # final materialization would re-run every iteration's join+window
        topk = (
            cand.withColumn("dist", dist)
            .withColumn("rank", F.row_number().over(win))
            .filter(F.col("rank") <= k)
            .select(qid_col, pid_col, "dist", "rank")
        ).persist()
        # guarantee: the k-th distance must not exceed the closest possible
        # point in an unexplored cell (ring * cell_height)
        guard = float(ring) * cell_h
        stats = topk.groupBy(qid_col).agg(
            F.count("*").alias("n"), F.max("dist").alias("kth")
        )
        done_q = stats.filter((F.col("n") == k) & (F.col("kth") <= F.lit(guard)))
        done = topk.join(done_q.select(qid_col), qid_col)
        results = done if results is None else results.unionByName(done)
        remaining = remaining.join(done_q.select(qid_col), qid_col, "left_anti")
        if remaining.isEmpty():
            break
        ring *= 2
    else:
        # fall back to brute force for stubborn queries (e.g. k > points in
        # a huge neighborhood) — correctness over speed for the tail.  The
        # tail is explicitly BOUNDED: a full-scan cross join per stubborn
        # query is only affordable for a residue, and at 10^9 queries an
        # unbounded tail would silently become the whole job — fail loudly
        # instead so the caller raises max_iters/initial_ring.
        if brute_tail_max is not None and (
                remaining.limit(brute_tail_max + 1).count() > brute_tail_max):
            n_tail = brute_tail_max
            raise RuntimeError(
                f"knn_join brute-force tail exceeds brute_tail_max="
                f"{brute_tail_max} ({n_tail}+ queries unresolved after "
                f"{max_iters} ring doublings); raise max_iters, "
                f"initial_ring, or brute_tail_max")
        cand = pts_c.crossJoin(F.broadcast(remaining))
        topk = (
            cand.withColumn("dist", dist)
            .withColumn("rank", F.row_number().over(win))
            .filter(F.col("rank") <= k)
            .select(qid_col, pid_col, "dist", "rank")
        )
        results = topk if results is None else results.unionByName(topk)
    return results


def knn_join_geodesic(
    spark: SparkSession,
    pts: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    pid_col: str = "pid",
    qid_col: str = "qid",
    res: int = 6,
    r0_km: float = 400.0,
    max_iters: int = 8,
    brute_tail_max: int | None = 10_000,
) -> DataFrame:
    """kNN under the GEODESIC (haversine km) metric — the reference's
    actual kNN metric (`OrthodromicDistancePartitioner.java` +
    `NNMapReduce.java:59-145`).

    Iterative RADIUS doubling instead of ring doubling: each iteration
    covers every remaining query's geodesic disk of radius r
    (`grid.geodisk_cells` — latitude-aware, pole-safe), joins, takes the
    window top-k, and retires queries whose k-th distance is <= r.  The
    guard is exact by the disk's conservative cover: any point outside
    the covered cells is farther than r, so a proven query can never be
    beaten by an unexplored point.  Stubborn queries fall back to brute
    force (correctness over speed for the tail), bounded by
    ``brute_tail_max`` (None = unbounded, the pre-r3 contract).
    """
    from ..join.spatial import haversine_km_sql
    from ..table import geo as geo_sql

    q_named = queries.select(
        F.col(qid_col), F.col("lon").alias("qlon"), F.col("lat").alias("qlat")
    )
    pts_c = pts.select(pid_col, "lon", "lat").withColumn(
        "cell", F.expr(geo_sql.rowmajor_cell_sql("lon", "lat", res))
    ).persist()

    win = Window.partitionBy(qid_col).orderBy(F.col("dist").asc(), F.col(pid_col).asc())
    dist = F.expr(haversine_km_sql("lon", "lat", "qlon", "qlat"))

    remaining = q_named
    results = None
    r = r0_km
    for _ in range(max_iters):
        q_cover = remaining.withColumn(
            "cell",
            F.explode(cov.point_geodisk_cells_udf(res, r)(
                F.col("qlon"), F.col("qlat"))),
        )
        cand = pts_c.join(F.broadcast(q_cover), "cell")
        topk = (
            cand.withColumn("dist", dist)
            .withColumn("rank", F.row_number().over(win))
            .filter(F.col("rank") <= k)
            .select(qid_col, pid_col, "dist", "rank")
        ).persist()
        stats = topk.groupBy(qid_col).agg(
            F.count("*").alias("n"), F.max("dist").alias("kth")
        )
        done_q = stats.filter((F.col("n") == k) & (F.col("kth") <= F.lit(r)))
        done = topk.join(done_q.select(qid_col), qid_col)
        results = done if results is None else results.unionByName(done)
        remaining = remaining.join(done_q.select(qid_col), qid_col, "left_anti")
        if remaining.isEmpty():
            break
        r *= 2
    else:
        # bounded brute tail — same contract as knn_join above
        if brute_tail_max is not None and (
                remaining.limit(brute_tail_max + 1).count() > brute_tail_max):
            n_tail = brute_tail_max
            raise RuntimeError(
                f"knn_join_geodesic brute-force tail exceeds "
                f"brute_tail_max={brute_tail_max} ({n_tail}+ queries "
                f"unresolved after {max_iters} ring doublings)")
        cand = pts_c.crossJoin(F.broadcast(remaining))
        topk = (
            cand.withColumn("dist", dist)
            .withColumn("rank", F.row_number().over(win))
            .filter(F.col("rank") <= k)
            .select(qid_col, pid_col, "dist", "rank")
        )
        results = topk if results is None else results.unionByName(topk)
    return results
