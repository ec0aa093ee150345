"""Incremental IVF ANN index: a persisted inverted-file (snapshot table)
that new embedding batches are ASSIGNED INTO without re-scanning or
re-clustering the accumulated corpus.

This is the maintain-on-write form of q41's one-shot IVF: a training-data
pipeline's embedding store grows by batches, and rebuilding the inverted
file per batch is O(corpus) per day.  Instead the coarse quantizer is
FROZEN at index creation (the production IVF contract — FAISS et al.
train the quantizer once and stream inserts through it; re-training
re-shuffles every cell), each batch pays one broadcast assignment join
against the 16 centroid rows, and queries probe exactly one cell.

Design (all engine-native pieces):
- The index is a snapshot table (`table/snapshots.py`) of rows
  `(vec_id, cent_id, is_cent, embedding)` CLUSTERED BY cent_id, so
  footer min/max stats prune single-cell probes to the files of that
  cell; committed atomically per batch (`append`), time-travelable.
- The centroid rows live IN the table (`is_cent = 1`) — appends read the
  frozen quantizer from the index itself, not from a side channel, so
  the table is self-describing and an append cannot silently use a
  different quantizer.
- Assignment = batch CROSS JOIN (16 broadcast centroid rows) + one
  max-cosine window — K independent of n (the q41 round-1 lesson).
- Query = assign the query batch the same way, then ONE hash equi-join
  on cent_id + per-query top-k window; nprobe=1 by construction.

Reference parity: GeoWave maintains secondary indexes on write
(`core/store/.../index/SecondaryIndexDataStore`) and updates statistics
per ingest batch (`StatisticUpdateCallback.java:87`); this applies the
same contract to the ANN inverted file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions import sqlgen as G
from ..table import snapshots

K_CENT = 16


def _assign_sql(vec_view: str, cent_view: str) -> str:
    """(vec_id, cent_id, embedding) with each vector at its max-cosine
    frozen centroid; ties broken by cent_id (q41's rule)."""
    dt = G.dot(G.SPARK, "a.v", "c.v", 64)
    return f"""
WITH a0 AS (SELECT vec_id, embedding,
                   {G.to_double_arr(G.SPARK, 'embedding')} AS v
            FROM {vec_view}),
a AS (SELECT vec_id, embedding, v,
             sqrt({G.dot(G.SPARK, 'v', 'v', 64)}) AS nv FROM a0),
c0 AS (SELECT vec_id AS cent_id,
              {G.to_double_arr(G.SPARK, 'embedding')} AS v
       FROM {cent_view}),
c AS (SELECT cent_id, v, sqrt({G.dot(G.SPARK, 'v', 'v', 64)}) AS nv FROM c0)
SELECT vec_id, cent_id, embedding FROM (
  SELECT a.vec_id, c.cent_id, a.embedding,
         row_number() OVER (
           PARTITION BY a.vec_id
           ORDER BY ({dt}) / (a.nv * c.nv) DESC, c.cent_id ASC
         ) AS rn
  FROM a CROSS JOIN c
) t WHERE rn = 1
"""


def build_index(spark: SparkSession, vec_view: str, path: str) -> dict:
    """Create the inverted file from the initial corpus: quantizer = the
    K_CENT smallest vec_ids (deterministic, K independent of n), frozen
    into the table as `is_cent = 1` rows."""
    spark.sql(
        f"SELECT vec_id, embedding FROM {vec_view} "
        f"ORDER BY vec_id LIMIT {K_CENT}"
    ).createOrReplaceTempView("_ann_cent")
    rows = spark.sql(f"""
SELECT vec_id, cent_id, cast(0 as int) AS is_cent, embedding
FROM ({_assign_sql(vec_view, '_ann_cent')})
UNION ALL
SELECT vec_id, vec_id AS cent_id, cast(1 as int) AS is_cent, embedding
FROM _ann_cent
""")
    return snapshots.create(rows, path, cluster_by=["cent_id"])


def _centroid_view(spark: SparkSession, path: str) -> str:
    """Register the frozen quantizer read from the index itself."""
    snapshots.scan(
        spark, path, where="is_cent = 1", columns=["vec_id", "embedding"]
    ).createOrReplaceTempView("_ann_cent")
    return "_ann_cent"


def append_batch(spark: SparkSession, path: str, vec_view: str) -> dict:
    """Assign a new batch against the FROZEN quantizer and append one
    atomic snapshot; cost is O(batch x K), never O(corpus)."""
    cent = _centroid_view(spark, path)
    rows = spark.sql(
        f"SELECT vec_id, cent_id, cast(0 as int) AS is_cent, embedding "
        f"FROM ({_assign_sql(vec_view, cent)})"
    )
    return snapshots.append(rows, path)


def query_topk(spark: SparkSession, path: str, query_view: str,
               k: int = 3) -> DataFrame:
    """nprobe=1 top-k: queries assign to their cell (broadcast join) and
    rank ONLY that cell's members; one hash equi-join on cent_id.
    Single-cell point probes prune to that cell's files via the
    cluster_by footer stats (`snapshots.plan_files`)."""
    cent = _centroid_view(spark, path)
    spark.sql(_assign_sql(query_view, cent)) \
        .createOrReplaceTempView("_ann_q")
    snapshots.scan(
        spark, path, where="is_cent = 0",
        columns=["vec_id", "cent_id", "embedding"],
    ).createOrReplaceTempView("_ann_x")
    dt = G.dot(G.SPARK, "q.v", "x.v", 64)
    return spark.sql(f"""
WITH q0 AS (SELECT vec_id, cent_id,
                   {G.to_double_arr(G.SPARK, 'embedding')} AS v FROM _ann_q),
q AS (SELECT vec_id, cent_id, v,
             sqrt({G.dot(G.SPARK, 'v', 'v', 64)}) AS nv FROM q0),
x0 AS (SELECT vec_id, cent_id,
              {G.to_double_arr(G.SPARK, 'embedding')} AS v FROM _ann_x),
x AS (SELECT vec_id, cent_id, v,
             sqrt({G.dot(G.SPARK, 'v', 'v', 64)}) AS nv FROM x0)
SELECT qid, cid, cent_id, sim_micro, rank FROM (
  SELECT q.vec_id AS qid, x.vec_id AS cid, q.cent_id,
         cast(floor(1000000.0 * ({dt}) / (q.nv * x.nv)) as bigint)
           AS sim_micro,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY cast(floor(1000000.0 * ({dt}) / (q.nv * x.nv)) as bigint)
                      DESC,
                    x.vec_id ASC
         ) AS rank
  FROM q JOIN x ON x.cent_id = q.cent_id AND x.vec_id <> q.vec_id
) t WHERE rank <= {k}
ORDER BY qid, rank
""")
