"""DBSCAN density clustering as iterative cell-joins.

Reference analog (/root/reference):
`analytics/mapreduce/src/main/java/.../mapreduce/dbscan/DBScanMapReduce.java`
(359 LoC) + `DBScanIterationsJobRunner.java` — neighbor search over the NN
grid partitioning, then iterative merge of cluster fragments across
partitions until no change.

Spark-first re-expression:
1. eps-neighbor pairs via the engine's `within_distance_join` self-join
   (grid_disk candidate cells -> exact distance refine, all JVM);
2. core points = neighbor count >= min_pts (one groupBy);
3. labels = connected components of the core-core graph via the shared
   large-star/small-star contraction (`agg/components.py`): O(log^2)
   rounds instead of O(graph diameter) min-label propagation, and no
   per-round full label-diff — the round-1 propagation loop measured
   49 s at sf0.1 where the contraction converges in 3-4 rounds;
4. border points adopt the minimum core-neighbor label.

At scale every round is a single keyed shuffle on point ids; no driver
collect except the 1-row convergence count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..join import spatial


def dbscan(spark: SparkSession, pts: DataFrame, eps: float, min_pts: int,
           *, id_col: str = "pid", res: int = 8,
           max_rounds: int = 25) -> DataFrame:
    """Returns (id, cluster, is_core); noise rows get cluster = -1.

    `cluster` is the minimum point id of the cluster's core set — a
    deterministic canonical label independent of partitioning.
    """
    # 1. eps-neighbor pairs (excluding self) via the indexed distance join
    qs = pts.select(F.col(id_col).alias("qid"), "lon", "lat")
    pairs = (
        spatial.within_distance_join(spark, pts, qs, radius=eps,
                                     pid_col=id_col, qid_col="qid", res=res)
        .filter(F.col(id_col) != F.col("qid"))
        .select(F.col(id_col).alias("a"), F.col("qid").alias("b"))
        .persist()
    )

    # 2. core points: >= min_pts neighbors (self counts in classic DBSCAN)
    core = (
        pairs.groupBy("a").agg((F.count("*") + 1).alias("n"))
        .filter(F.col("n") >= min_pts)
        .select(F.col("a").alias("id"))
        .persist()
    )

    # 3. connected components of the core-core edge set (shared operator;
    # isolated core points — no core neighbor — label themselves)
    from .components import connected_components

    core_edges = (
        pairs.join(core.withColumnRenamed("id", "a"), "a")
        .join(core.withColumnRenamed("id", "b"), "b")
        .select("a", "b")
    )
    comp = connected_components(core_edges, "a", "b",
                                max_iters=max_rounds)
    labels = (
        core.join(comp, core["id"] == comp["node"], "left")
        .select(core["id"],
                F.coalesce("component", core["id"]).alias("label"))
    )

    # 4. border points: non-core with a core neighbor adopt min core label
    border = (
        pairs.join(core.withColumnRenamed("id", "b"), "b")
        .join(core.withColumnRenamed("id", "a"), "a", "left_anti")
        .join(labels.withColumnRenamed("id", "b"), "b")
        .groupBy("a").agg(F.min("label").alias("label"))
        .withColumnRenamed("a", "id")
    )

    assigned = (
        labels.withColumn("is_core", F.lit(True))
        .unionByName(border.withColumn("is_core", F.lit(False)))
    )
    return (
        pts.select(F.col(id_col).alias("id"))
        .join(assigned, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("label", F.lit(-1)).alias("cluster"),
            F.coalesce("is_core", F.lit(False)).alias("is_core"),
        )
    )
