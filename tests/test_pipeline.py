"""Sampling / mixing / packing operators (pipeline/)."""

import pandas as pd
from pyspark.sql import functions as F  # noqa: N812

from geowave_spark.pipeline.packing import pack_sequences
from geowave_spark.pipeline.sampling import (
    stratified_sample,
    topk_per_stratum,
    weighted_mixture,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_stratified_sample_balances_and_is_deterministic(spark, sf_dir):
    docs = _docs(spark, sf_dir).select("doc_id", "lang")
    out = stratified_sample(docs, ["lang"], "doc_id")
    counts = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    base = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    t = min(base.values())
    # every stratum thinned to ~target (Bernoulli: allow binomial spread)
    for lang, n in counts.items():
        assert n <= base[lang]
        assert abs(n - min(t, base[lang])) <= max(6, t // 3)
    # deterministic: second run identical
    again = stratified_sample(docs, ["lang"], "doc_id")
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_stratified_sample_plan_is_broadcast(spark, sf_dir):
    docs = _docs(spark, sf_dir).select("doc_id", "lang")
    plan = stratified_sample(docs, ["lang"], "doc_id")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_topk_per_stratum_exact_k(spark, sf_dir):
    docs = _docs(spark, sf_dir).select("doc_id", "lang", "source")
    out = topk_per_stratum(docs, ["lang", "source"], "doc_id", k=3).collect()
    per = {}
    for r in out:
        per.setdefault((r["lang"], r["source"]), []).append(r["rk"])
    base = {
        (r["lang"], r["source"]): r["n"]
        for r in docs.groupBy("lang", "source")
        .agg(F.count("*").alias("n")).collect()
    }
    for key, rks in per.items():
        assert sorted(rks) == list(range(1, min(3, base[key]) + 1))
    assert set(per) == set(base)


def test_weighted_mixture_budget_and_damping(spark, sf_dir):
    docs = _docs(spark, sf_dir).select(
        "doc_id", "source", F.expr("n_chars div 4 + 1").alias("tok")
    )
    sel = weighted_mixture(docs, "source", "tok", "doc_id")
    agg = sel.groupBy("source", "src_budget").agg(
        F.sum("tok").alias("taken")
    ).collect()
    assert agg, "mixture selected nothing"
    for r in agg:
        assert r["taken"] <= r["src_budget"]
    # sqrt damping: per-source budgets are flatter than raw token shares
    toks = {
        r["source"]: r["t"]
        for r in docs.groupBy("source").agg(F.sum("tok").alias("t")).collect()
    }
    budgets = {r["source"]: r["src_budget"] for r in agg}
    big = max(toks, key=toks.get)
    small = min(toks, key=toks.get)
    if toks[big] > toks[small]:  # damping compresses the ratio
        assert (
            budgets[big] / max(budgets[small], 1)
            < toks[big] / toks[small] + 1e-9
        )


def _brute_pack(ids, toks, budget):
    """Reference next-fit fold (id order assumed pre-sorted)."""
    packs, pack, running = [], 0, 0
    for t in toks:
        if running > 0 and running + t > budget:
            pack += 1
            running = 0
        packs.append(pack)
        running += t
    return packs


def test_pack_sequences_matches_brute_force(spark):
    pdf = pd.DataFrame({
        "doc_id": range(1, 101),
        "tok": [(i * 37) % 90 + 10 for i in range(1, 101)],
    })
    df = spark.createDataFrame(pdf)
    out = pack_sequences(df, "doc_id", "tok", budget=128, shards=4) \
        .orderBy("shard", "pack_id", "pos").collect()
    # engine output covers every doc exactly once
    assert sorted(r["id"] for r in out) == list(range(1, 101))
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rows in by_shard.items():
        # reproduce the shard's deterministic order and brute-force fold
        srt = sorted(rows, key=lambda r: ((r["id"] * 48271 + 7) % 1000003,
                                          r["id"]))
        packs = _brute_pack([r["id"] for r in srt], [r["tok"] for r in srt],
                            128)
        got = {r["id"]: r["pack_id"] for r in rows}
        for r, want in zip(srt, packs):
            assert got[r["id"]] == want
        # invariant: no pack exceeds budget unless it is a single oversized doc
        sums = {}
        for r in rows:
            sums.setdefault(r["pack_id"], []).append(r["tok"])
        for toks in sums.values():
            assert sum(toks) <= 128 or len(toks) == 1


def test_pack_oversized_doc_gets_own_pack(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 4, 8], "tok": [500, 20, 30]})
    )
    out = pack_sequences(df, "doc_id", "tok", budget=100, shards=1).collect()
    packs = {r["id"]: r["pack_id"] for r in out}
    # the 500-token doc shares no pack with another doc
    big_pack = packs[0]
    assert [p for i, p in packs.items() if p == big_pack] == [big_pack]


def test_q257_waterfill_invariants(spark, sf_dir):
    """Independent python recompute of the water-fill: sum(alloc) == B
    exactly, uncapped sources keep everything, capped allocations level
    within 1 token and never exceed capacity."""
    import duckdb

    from geowave_spark.queries_pipeline import PIPELINE_QUERIES

    pdf = (PIPELINE_QUERIES["q257_token_waterfill"][0](spark, sf_dir)
           .toPandas())
    per = duckdb.sql(
        f"SELECT source, sum(n_chars // 4 + 1) AS toks FROM "
        f"'{sf_dir}/documents.parquet' GROUP BY source ORDER BY toks, source"
    ).df()
    budget = int(per["toks"].sum()) // 2
    # python water-fill
    toks = per["toks"].astype(int).tolist()
    m = len(toks)
    alloc = dict(zip(per["source"], toks))
    pfx = 0
    j = None
    for i, t in enumerate(toks, start=1):
        if pfx + t * (m - i + 1) >= budget:
            j = i
            break
        pfx += t
    if j is not None:
        spread = budget - pfx
        nc = m - j + 1
        base, rem = divmod(spread, nc)
        for off, src in enumerate(per["source"].tolist()[j - 1:]):
            alloc[src] = base + 1 if off < rem else base
    got = dict(zip(pdf["source"], pdf["alloc"].astype(int)))
    assert got == alloc
    assert int(pdf["alloc"].sum()) == budget
    assert (pdf["alloc"] <= pdf["toks"]).all()
    capped = pdf[pdf["capped"] == 1]["alloc"]
    if len(capped) > 1:
        assert capped.max() - capped.min() <= 1


def test_q264_cluster_sample_debiases_dup_mass(spark, sf_dir):
    """Cluster-aware picks at most one row per cluster, and its dup-mass
    fraction must not exceed the naive sample's (the bias it removes)."""
    from geowave_spark.queries_pipeline import PIPELINE_QUERIES

    pdf = (PIPELINE_QUERIES["q264_cluster_aware_sample"][0](spark, sf_dir)
           .toPandas())
    assert (pdf["cluster_rows"] <= pdf["n_clusters"]).all()
    naive = pdf["naive_dup_rows"].sum() / max(pdf["naive_rows"].sum(), 1)
    clus = pdf["cluster_dup_rows"].sum() / max(pdf["cluster_rows"].sum(), 1)
    assert clus <= naive + 1e-9
