"""Connected components (large-star/small-star) vs a union-find oracle."""
from __future__ import annotations

import random

from geowave_spark.agg.components import connected_components


def _union_find(n_edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in n_edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = min of component
    return {x: find(x) for x in parent}


def _check(spark, edges):
    got = {
        r["node"]: r["component"]
        for r in connected_components(
            spark.createDataFrame(edges, "a long, b long"), "a", "b"
        ).collect()
    }
    want = _union_find(edges)
    assert got == want


def test_components_random_graph(spark):
    rnd = random.Random(7)
    edges = [(rnd.randrange(120), rnd.randrange(120)) for _ in range(90)]
    edges = [(a, b) for a, b in edges if a != b]
    _check(spark, edges)


def test_components_long_chain(spark):
    # a 64-node path exercises the O(log) round bound (naive one-hop
    # propagation would need 64 rounds and trip max_iters)
    edges = [(i, i + 1) for i in range(63)]
    _check(spark, edges)


def test_components_stars_and_singletons(spark):
    edges = [(100, i) for i in range(5)] + [(200, 201)]
    _check(spark, edges)


def test_q64_cluster_semantics(spark, sf_dir):
    from geowave_spark.queries_text import _q64_spark

    pdf = _q64_spark(spark, str(sf_dir)).toPandas()
    # one row per document; canonical <= doc_id; singletons map to self
    assert pdf["doc_id"].is_unique
    assert (pdf["canonical_id"] <= pdf["doc_id"]).all()
    # every canonical id is itself a document mapping to itself
    canon = set(pdf["canonical_id"])
    self_rows = pdf[pdf["doc_id"].isin(canon)]
    assert (self_rows["canonical_id"] == self_rows["doc_id"]).all()
    # n_members is consistent with the label histogram
    sizes = pdf.groupby("canonical_id").size()
    assert all(pdf["n_members"] == pdf["canonical_id"].map(sizes))
