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
3. labels = connected components of the core-core graph by iterative
   min-label propagation (each round: one join + one groupBy-min;
   `localCheckpoint` truncates lineage).  Rounds are O(graph diameter in
   label-space) — doubling propagation, fine for cluster graphs;
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

    # 3. min-label propagation over the core-core edge set
    core_edges = (
        pairs.join(core.withColumnRenamed("id", "a"), "a")
        .join(core.withColumnRenamed("id", "b"), "b")
        .select("a", "b")
        .persist()
    )
    labels = core.select(F.col("id"), F.col("id").alias("label"))
    for _ in range(max_rounds):
        neigh_min = (
            core_edges.join(labels.withColumnRenamed("id", "b")
                            .withColumnRenamed("label", "nlabel"), "b")
            .groupBy("a").agg(F.min("nlabel").alias("nlabel"))
            .withColumnRenamed("a", "id")
        )
        new_labels = (
            labels.join(neigh_min, "id", "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce("nlabel", "label")).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n").join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1).count()
        )
        labels = new_labels
        if changed == 0:
            break

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
