"""Third-implementation recomputes for the SHARED-text registry queries
that had only the dual-dialect gate as evidence (VERDICT r3 item 2 — the
`intdiv` lesson: two engines running the same SQL text can agree on a
wrong value).  Each test rebuilds the expected output in pure python
(hashlib / string ops / dict aggregation — no SQL shared with either
engine) and compares against the Spark query.

Covered here: q10, q15, q42, q43, q50, q195 (the audit's action list —
`tools/audit_oracles.py`; the SHARED_SPLIT spatial-join family is
already independent by architecture: cell-blocked engine vs brute-force
oracle).
"""
from __future__ import annotations

import hashlib
import math

import duckdb

from geowave_spark.queries import QUERIES
from geowave_spark.table import geo

SF = "/root/testdata/sf0.001"


def _lon(k: int) -> float:
    return ((k % geo.LON_MOD) * geo.LON_MULT % geo.LON_MOD) / 1e6 - 180.0


def _lat(k: int) -> float:
    return ((k % geo.LAT_MOD) * geo.LAT_MULT % geo.LAT_MOD) / 1e6 - 90.0


def _cell(lon: float, lat: float, res: int) -> int:
    n = 1 << res
    x = min(max(math.ceil((lon + 180.0) / 360.0 * n) - 1, 0), n - 1)
    y = min(max(math.ceil((lat + 90.0) / 180.0 * n) - 1, 0), n - 1)
    return y * n + x


def _run(spark, name):
    fn, _sql = QUERIES[name]
    return fn(spark, SF).collect()


def test_q10_bbox_agg_matches_python(spark):
    rows = duckdb.sql(
        f"SELECT c_custkey, c_nationkey FROM '{SF}/customer.parquet'"
    ).fetchall()
    agg: dict[int, list] = {}
    for ck, nk in rows:
        lo = math.floor(_lon(ck * 31 + 5) * 1e6)
        la = math.floor(_lat(ck * 37 + 11) * 1e6)
        a = agg.setdefault(nk, [lo, lo, la, la, 0])
        a[0] = min(a[0], lo)
        a[1] = max(a[1], lo)
        a[2] = min(a[2], la)
        a[3] = max(a[3], la)
        a[4] += 1
    got = {r.nationkey: (r.min_lon_micro, r.max_lon_micro, r.min_lat_micro,
                         r.max_lat_micro, r.n)
           for r in _run(spark, "q10_bbox_agg")}
    assert got == {nk: tuple(a) for nk, a in agg.items()} and got


SF01 = "/root/testdata/sf0.1"  # smallest sf with exact-dup text groups


def _md5_clusters():
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF01}/documents.parquet'").fetchall()
    clusters: dict[str, list] = {}
    for did, text in rows:
        h = hashlib.md5(text.encode("utf-8")).hexdigest()
        c = clusters.setdefault(h, [did, 0])
        c[0] = min(c[0], did)
        c[1] += 1
    return clusters


def test_q15_exact_dedup_matches_python(spark):
    clusters = _md5_clusters()
    fn, _sql = QUERIES["q15_exact_dedup"]
    got = {r.text_hash: (r.canonical_id, r.n_dups)
           for r in fn(spark, SF01).collect()}
    assert got == {h: tuple(c) for h, c in clusters.items()} and got
    # the corpus actually contains duplicate groups (the test has teeth)
    assert any(c[1] > 1 for c in clusters.values())


def test_q195_leakage_safe_split_matches_python(spark):
    clusters = _md5_clusters()
    split_agg: dict[str, list] = {}
    for _h, (canon, sz) in clusters.items():
        b = (canon * 2654435761) % 1000
        split = "train" if b < 900 else ("val" if b < 950 else "test")
        s = split_agg.setdefault(split, [0, 0, canon])
        s[0] += 1
        s[1] += sz
        s[2] = min(s[2], canon)
    fn, _sql = QUERIES["q195_leakage_safe_split"]
    got = {r.split: (r.n_clusters, r.n_docs, r.first_canonical)
           for r in fn(spark, SF01).collect()}
    assert got == {k: tuple(v) for k, v in split_agg.items()} and got


def test_q42_rollup_agg_matches_python(spark):
    rows = duckdb.sql(
        f"SELECT event_id, event_type, value FROM '{SF}/events.parquet'"
    ).fetchall()
    base: dict[tuple, list] = {}
    for eid, et, val in rows:
        cell = _cell(_lon(eid), _lat(eid), 4)
        cents = math.floor(val * 100 + 0.5)  # round-half-up matches
        for key in ((cell, et), (cell, "ALL"), (-1, "ALL")):
            a = base.setdefault(key, [0, 0])
            a[0] += 1
            a[1] += cents
    got = {(r.cell, r.event_type): (r.n, r.sum_cents)
           for r in _run(spark, "q42_rollup_agg")}
    assert got == {k: tuple(v) for k, v in base.items()} and got


def test_q43_set_ops_matches_python(spark):
    rows = duckdb.sql(
        "SELECT DISTINCT (((l_orderkey * 8 + l_linenumber) * 200000 "
        "+ l_partkey) * 10000 + l_suppkey) AS pid "
        f"FROM '{SF}/lineitem.parquet'").fetchall()
    expect = []
    for (pid,) in rows:
        lon, lat = _lon(pid), _lat(pid)
        in_a = -60 <= lon <= 60 and -30 <= lat <= 30
        in_b = 0 <= lon <= 120 and 0 <= lat <= 60
        if in_a and in_b:
            expect.append(("both", pid))
        elif in_a:
            expect.append(("only_a", pid))
    got = sorted((r.tag, r.pid) for r in _run(spark, "q43_set_ops"))
    assert got == sorted(expect) and got


def test_q50_text_search_matches_python(spark):
    rows = duckdb.sql(
        f"SELECT source, text FROM '{SF}/documents.parquet'").fetchall()
    agg: dict[str, list] = {}
    for src, text in rows:
        a = agg.setdefault(src, [0, 0, 0, 0])
        a[0] += text.startswith("the ")
        a[1] += "model" in text.lower()
        a[2] += text.endswith(".")
        a[3] += 1
    got = {r.source: (r.n_prefix, r.n_contains, r.n_suffix, r.n_docs)
           for r in _run(spark, "q50_text_search")}
    assert got == {k: tuple(v) for k, v in agg.items()} and got
