"""Distributed connected components: alternating large-star / small-star.

The canonical-document step of a web-scale dedup pipeline: near-dup PAIR
generation (MinHash/SimHash banding, `queries_text.py`) yields an edge
list; picking one keeper per duplicate CLUSTER requires the connected
components of that graph.  The reference's closest analog is DBSCAN's
iterative cluster-union loop (`analytics/mapreduce/.../dbscan/
DBScanMapReduce.java` in /root/reference, mirrored by `agg/dbscan.py`);
this operator is the general graph version.

Algorithm: alternating Large-Star / Small-Star contractions (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC 2014 — public):

  large-star(u): attach every neighbor v > u to m = min(N(u) + {u})
  small-star(u): attach every neighbor v <= u, and u itself, to
                 m = min(N<=(u) + {u})

Alternating the two provably converges to one star per component whose
center is the component's minimum id, in O(log^2 n) rounds (in practice
2-4 for dedup graphs, whose components are small).  Each half-round is
one keyed aggregation + one equi-join on node id — two shuffles, no
driver-side graph state, no Python row code; skew from a high-degree
component min is exactly what large-star splits (the paper's motivation).

Spark shape notes:
  - the edge set is kept SYMMETRIC (both directions) so N(u) is one
    groupBy("u"); star outputs are re-symmetrized each half-round.
  - each iteration ends in localCheckpoint(eager=True): iterative plans
    otherwise grow lineage linearly and Catalyst re-analysis dominates
    past ~10 rounds.
  - convergence = (count, xor-of-hashes) fingerprint unchanged — one
    tiny action per round, no edge-set collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetrize(e: DataFrame) -> DataFrame:
    return e.union(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).filter(F.col("u") != F.col("v")).distinct()


def _large_star(sym: DataFrame) -> DataFrame:
    m = sym.groupBy("u").agg(F.min("v").alias("mv"))
    m = m.select("u", F.least("u", "mv").alias("m"))
    out = (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    return _symmetrize(out)


def _small_star(sym: DataFrame) -> DataFrame:
    le = sym.filter(F.col("v") <= F.col("u"))
    m = le.groupBy("u").agg(F.min("v").alias("mv"))
    m = m.select("u", F.least("u", "mv").alias("m"))
    out = (
        le.join(m, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(m.select("u", F.col("m").alias("v")))
    )
    return _symmetrize(out)


def _fingerprint(sym: DataFrame) -> tuple:
    row = sym.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(F.hash("u", "v").cast("long")), F.lit(0)).alias("s"),
    ).collect()[0]
    return row["n"], row["s"]


def connected_components(
    edges: DataFrame,
    a: str = "a",
    b: str = "b",
    *,
    max_iters: int = 25,
) -> DataFrame:
    """Edge list -> (node, component) where component = min node id in the
    node's connected component.  Nodes appear iff they appear in an edge;
    callers wanting singleton rows coalesce against their node table."""
    e = (
        edges.select(F.col(a).cast("long").alias("u"),
                     F.col(b).cast("long").alias("v"))
        .filter(F.col("u") != F.col("v"))
    )
    sym = _symmetrize(e).localCheckpoint(eager=True)
    fp = _fingerprint(sym)
    for _ in range(max_iters):
        nxt = _small_star(_large_star(sym)).localCheckpoint(eager=True)
        nfp = _fingerprint(nxt)
        sym, prev = nxt, sym
        prev.unpersist()
        if nfp == fp:
            break
        fp = nfp
    else:
        raise RuntimeError(f"connected_components: no convergence in "
                           f"{max_iters} rounds")
    # converged star graph: every non-root points at its component min;
    # roots (component minima) map to themselves
    comp = sym.groupBy("u").agg(F.min("v").alias("component"))
    comp = comp.select(
        "u", F.least("u", "component").alias("component"))
    roots = (
        comp.select(F.col("component").alias("u"),
                    F.col("component"))
        .distinct()
    )
    return (
        comp.unionByName(roots).groupBy("u")
        .agg(F.min("component").alias("component"))
        .select(F.col("u").alias("node"), "component")
    )
