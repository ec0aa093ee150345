"""Semantic invariants for the fleet-scale operational queries
(queries_fleet.py) beyond the oracle equality already asserted by
tests/test_queries.py::test_query_matches_oracle.
"""
from __future__ import annotations

import numpy as np

from geowave_spark.queries_fleet import FLEET_QUERIES


def _run(name, spark, sf_dir):
    return FLEET_QUERIES[name][0](spark, sf_dir).toPandas()


def test_q249_hrw_moves_less_than_mod(spark, sf_dir):
    """Rendezvous hashing must move strictly fewer rows than mod-N on
    every source, and the corpus-wide HRW move fraction must sit near the
    theoretical 4/20 = 20% (new-bucket mass), far from mod-N's ~95%."""
    pdf = _run("q249_reshard_stability", spark, sf_dir)
    assert (pdf["moved_hrw"] <= pdf["moved_mod"]).all()
    hrw_frac = pdf["moved_hrw"].sum() / pdf["n"].sum()
    mod_frac = pdf["moved_mod"].sum() / pdf["n"].sum()
    assert 0.10 < hrw_frac < 0.35
    # exact mod-N move rate is 0.8 in the large-N limit (stay iff
    # doc_id mod 80 < 16); finite corpora sit slightly under
    assert mod_frac > 0.70


def test_q249_hrw_matches_numpy(spark, sf_dir):
    """HRW winner per doc recomputed with a numpy argmax."""
    import duckdb

    ids = duckdb.sql(
        f"SELECT doc_id FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
    ).df()["doc_id"].to_numpy()
    P = 1000003
    k = np.arange(20)[None, :]
    m = (ids[:, None] % P + 104729 * k + 17) % P
    h = ((m * m % P) * (m * m % P) % P) * m % P
    enc = h * 64 + (63 - k)
    hrw20 = 63 - enc.max(axis=1) % 64
    hrw16 = 63 - enc[:, :16].max(axis=1) % 64
    moved = int((hrw16 != hrw20).sum())
    pdf = _run("q249_reshard_stability", spark, sf_dir)
    assert int(pdf["moved_hrw"].sum()) == moved


def test_q250_rowmajor_east_gap_is_one(spark, sf_dir):
    """Control row: row-major east-neighbor key gap is exactly 1 per pair,
    and Z-order total E+N gap must beat row-major's (dominated by the
    2^res north gaps)."""
    pdf = _run("q250_sfc_locality", spark, sf_dir).set_index("dir")
    assert pdf.loc["E", "row_max_gap"] == 1
    assert pdf.loc["E", "row_total_gap"] == pdf.loc["E", "pairs"]
    assert pdf.loc["N", "row_max_gap"] == 256
    # the Z-order trade: worse-than-1 east gaps buy better-than-2^res
    # north gaps (row-major's N gap is always exactly 2^res)
    assert pdf.loc["E", "z_total_gap"] > pdf.loc["E", "pairs"]
    assert pdf.loc["N", "z_total_gap"] < 256 * pdf.loc["N", "pairs"]


def test_q251_mmr_is_greedy_optimal_stepwise(spark, sf_dir):
    """Each round's pick recomputed by numpy greedy MMR."""
    import duckdb

    emb = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).df()
    iv = np.floor(
        np.stack(emb["embedding"].to_numpy()).astype(np.float64) * 1_000_000
    ).astype(np.int64)
    vid = emb["vec_id"].to_numpy()
    rel = (vid * 48271 + 11) % 1000
    seed = np.argmax(rel * 4096 + (4095 - vid))
    sel = [seed]
    picks = [(0, vid[seed], 0)]
    for rnd in range(1, 6):
        dots = iv @ iv[sel].T  # (n, |sel|)
        maxsim = dots.max(axis=1)
        # SQL `div` truncates toward zero (numpy // floors) — matters
        # when the max dot-product to the selected set is negative
        msq = np.sign(maxsim) * (np.abs(maxsim) // 100)
        sc = 7 * rel * 10**10 - 3 * msq
        sc[sel] = np.iinfo(np.int64).min
        enc = sc * 4096 + (4095 - vid)
        j = int(np.argmax(enc))
        picks.append((rnd, vid[j], int(sc[j])))
        sel.append(j)
    pdf = _run("q251_mmr_selection", spark, sf_dir)
    got = list(pdf.itertuples(index=False, name=None))
    assert [(r, v) for r, v, _ in picks] == [(r, v) for r, v, _ in got]
    # scores match from round 1 on (round 0 is the seed, score 0 by spec)
    assert [s for _, _, s in picks[1:]] == [s for _, _, s in got[1:]]


def test_q253_wrap_join_counts_positive_and_wrapped(spark, sf_dir):
    """Every rect crosses the dateline, so each must pick up points from
    BOTH sides of it; with 12 rects x ~14 deg lat bands over a uniform
    corpus, every rect matches something."""
    pdf = _run("q253_dateline_wrap_join", spark, sf_dir)
    assert len(pdf) == 12
    assert (pdf["n_pts"] > 0).all()


def test_q254_interleave_is_fair(spark, sf_dir):
    """The first 240 curriculum positions contain exactly 24 docs of every
    decile (perfect round-robin), and positions are the dense prefix."""
    pdf = _run("q254_curriculum_interleave", spark, sf_dir)
    assert list(pdf["pos"]) == list(range(240))
    counts = pdf["decile"].value_counts()
    assert set(counts.index) == set(range(1, 11))
    assert (counts == 24).all()


def test_q255_partition_of_cells(spark, sf_dir):
    """Owners partition the occupied cells (sum of n_cells = distinct
    occupied cells) and every boundary edge is counted once per side."""
    pdf = _run("q255_voronoi_boundary", spark, sf_dir)
    import duckdb

    from geowave_spark.table import geo

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'"
    )
    n_cells = con.sql(f"""
        WITH pts AS ({geo.lineitem_points_sql()})
        SELECT count(*) FROM (
          SELECT DISTINCT cast(floor((lon + 180) / 360 * 128) as bigint),
                          cast(floor((lat + 90) / 180 * 128) as bigint)
          FROM pts
          WHERE lon >= -180 AND lon < 180 AND lat >= -90 AND lat < 90)
    """).fetchone()[0]
    assert int(pdf["n_cells"].sum()) == n_cells
    # boundary edges are double-counted across owners -> even total
    assert int(pdf["boundary_edges"].sum()) % 2 == 0


def test_q259_estimate_upper_bounds_actual(spark, sf_dir):
    """Full-cell counting over-counts boundary cells, so the estimate is
    a guaranteed upper bound on the true join size, and it should be
    within ~one cell-ring of truth for large rects (over_milli >= 1000)."""
    pdf = _run("q259_selectivity_estimator", spark, sf_dir)
    has = pdf[pdf["actual_rows"] > 0]
    assert (has["est_rows"] >= has["actual_rows"]).all()
    assert (has["over_milli"] >= 1000).all()


def test_q260_quadtree_python_recompute(spark, sf_dir):
    """Leaves partition the in-bounds point mass, never descend from
    another leaf, and match an independent python quadtree."""
    import duckdb

    from geowave_spark.table import geo

    pdf = _run("q260_quadtree_tiering", spark, sf_dir)
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'"
    )
    pts = con.sql(f"""
        WITH pts AS ({geo.lineitem_points_sql()})
        SELECT lon*lon*lon/32400 AS lon, lat*lat*lat/8100 AS lat FROM pts
    """).df()
    pts = pts[(pts.lon >= -180) & (pts.lon < 180)
              & (pts.lat >= -90) & (pts.lat < 90)]
    import collections
    cnt = [collections.Counter() for _ in range(5)]
    for lo, la in zip(pts.lon, pts.lat):
        x4 = int((lo + 180) / 360 * 16)
        y4 = int((la + 90) / 180 * 16)
        for k in range(4, -1, -1):
            cnt[k][(x4 >> (4 - k), y4 >> (4 - k))] += 1
    CAP = 256
    leaves = {}
    for k in range(5):
        for (x, y), n in cnt[k].items():
            parent_split = k == 0 or cnt[k - 1][(x // 2, y // 2)] > CAP
            own_ok = n <= CAP or k == 4
            if parent_split and (k == 0 and n <= CAP or k > 0 and own_ok):
                if k < 4 and n > CAP:
                    continue
                leaves[(k, x, y)] = n
    got = {(int(r.level), int(r.cx), int(r.cy)): int(r.n)
           for r in pdf.itertuples()}
    assert got == leaves
    assert sum(got.values()) == len(pts)


def test_hilbert_sql_matches_numpy_exhaustive(spark, sf_dir):
    """The chained-CTE SQL Hilbert encoder must agree with
    sfc.hilbert.encode on EVERY res-8 cell and be a bijection."""
    import duckdb
    import numpy as np

    from geowave_spark.functions import sqlgen as G
    from geowave_spark.queries_fleet import hilbert_ctes
    from geowave_spark.sfc import hilbert

    con = duckdb.connect()
    con.sql("CREATE TABLE cells AS SELECT x AS cx, y AS cy FROM "
            "generate_series(0, 255) s(x), generate_series(0, 255) t(y)")
    sql = ("WITH " + ",".join(hilbert_ctes(G.DUCK, "cells", 8))
           + " SELECT cx, cy, acc FROM h0 ORDER BY cx, cy")
    df = con.sql(sql).df()
    exp = hilbert.encode(df.cx.to_numpy(), df.cy.to_numpy(),
                         bits=8).astype(np.int64)
    assert (df.acc.to_numpy() == exp).all()
    assert len(set(df.acc)) == 256 * 256


def test_q262_hilbert_wins_cluster_count(spark, sf_dir):
    """Moon et al.'s clustering claim on our curves: averaged over the
    sampled windows, Hilbert needs no more range scans than Z-order and
    strictly fewer in aggregate; row-major needs exactly 8 (one per row)
    for every 8-wide window."""
    pdf = _run("q262_sfc_window_clusters", spark, sf_dir)
    assert (pdf["rowmajor_clusters"] == 8).all()
    assert (pdf["hilbert_clusters"] <= pdf["zorder_clusters"]).all()
    assert pdf["hilbert_clusters"].sum() < pdf["zorder_clusters"].sum()


def test_q263_ring_planner_consistent_with_histogram(spark, sf_dir):
    """Total queries accounted for, radii within [0, 5], and a python
    recompute of the minimal ring radius distribution."""
    import duckdb
    import numpy as np

    from geowave_spark.table import geo

    pdf = _run("q263_knn_ring_planner", spark, sf_dir)
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'"
    )
    pts = con.sql(
        f"WITH pts AS ({geo.lineitem_points_sql()}) "
        "SELECT pid, lon, lat FROM pts WHERE lon >= -180 AND lon < 180 "
        "AND lat >= -90 AND lat < 90"
    ).df()
    cx = np.floor((pts.lon + 180) / 360 * 64).astype(int)
    cy = np.floor((pts.lat + 90) / 180 * 64).astype(int)
    hist = {}
    for x, y in zip(cx, cy):
        hist[(x, y)] = hist.get((x, y), 0) + 1
    qcells = sorted({(x, y) for x, y, p in zip(cx, cy, pts.pid)
                     if p % 199 == 0})
    from collections import Counter
    dist = Counter()
    for qx, qy in qcells:
        need = 5
        cum = 0
        for r in range(5):
            for dx in range(-r, r + 1):
                for dy in range(-r, r + 1):
                    if max(abs(dx), abs(dy)) == r:
                        cum += hist.get((qx + dx, qy + dy), 0)
            if cum >= 9:
                need = r
                break
        dist[need] += 1
    got = dict(zip(pdf["r_needed"].astype(int), pdf["n_queries"].astype(int)))
    assert got == dict(dist)
    assert sum(got.values()) == len(qcells)


def test_q265_salting_improves_balance(spark, sf_dir):
    """Salting must strictly reduce the worst shuffle-key load whenever
    any cell is hot, and never push the max key below the target-1."""
    pdf = _run("q265_skew_salt_planner", spark, sf_dir).iloc[0]
    if pdf["hot_cells"] > 0:
        assert pdf["max_key_after"] <= pdf["max_key_before"]
        assert pdf["max_key_after"] <= 128
        assert pdf["imbalance_after_milli"] <= pdf["imbalance_before_milli"]
    assert pdf["shuffle_keys"] >= pdf["n_cells"]


def test_q266_lateness_monotone(spark, sf_dir):
    """A larger watermark can only drop fewer events, and nothing can be
    later than the max observed disorder."""
    pdf = _run("q266_watermark_late_audit", spark, sf_dir)
    assert (pdf["late_5m"] <= pdf["late_1m"]).all()
    assert (pdf["late_15m"] <= pdf["late_5m"]).all()
    assert (pdf["late_1m"] <= pdf["n_events"]).all()


def test_q269_mass_conserved_exactly(spark, sf_dir):
    """Integer quarter-units make conservation exact: sum(mass4) must be
    exactly 4x the number of in-bounds points."""
    import duckdb

    from geowave_spark.table import geo

    pdf = _run("q269_conservative_regrid", spark, sf_dir)
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'"
    )
    n = con.sql(
        f"WITH pts AS ({geo.lineitem_points_sql()}) "
        "SELECT count(*) FROM pts WHERE lon >= -180 AND lon < 180 "
        "AND lat >= -90 AND lat < 90"
    ).fetchone()[0]
    assert int(pdf["mass4"].sum()) == 4 * n
    assert pdf["jx"].min() >= -1 and pdf["jx"].max() <= 64
    assert pdf["jy"].min() >= -1 and pdf["jy"].max() <= 64


def test_q268_transitivity_sane(spark, sf_dir):
    """Closure within [0, 1000] and wedges/closed counts consistent."""
    from geowave_spark.queries_text import TEXT_QUERIES

    pdf = (TEXT_QUERIES["q268_neardup_transitivity"][0](spark, sf_dir)
           .toPandas().iloc[0]) 
    assert pdf["closed"] + pdf["open_wedges"] == pdf["wedges"]
    assert 0 <= pdf["closure_milli"] <= 1000


def test_q270_kmv_error_bounded(spark, sf_dir):
    """KMV union estimate must sit within the standard ~3/sqrt(k) band of
    the exact union (k = 64 -> ~37% hard bound, typical ~12%), and the
    intersection estimate may never exceed the union estimate."""
    pdf = _run("q270_kmv_sketch_overlap", spark, sf_dir)
    rel = (pdf["union_est"] - pdf["union_exact"]).abs() / pdf["union_exact"]
    assert (rel < 0.4).all()
    assert (pdf["inter_est"] <= pdf["union_est"]).all()
    assert (pdf["both_k"] <= 64).all()


def test_q271_bloom_no_false_negatives(spark, sf_dir):
    """Blooms may only over-approximate: every true hit must be a
    candidate (true_hits == exact membership count), opens_with_bloom
    = true_hits + false_positives, and the bloom must actually save
    opens at this density."""
    import duckdb

    pdf = _run("q271_bloom_skipping_audit", spark, sf_dir).iloc[0]
    assert pdf["opens_with_bloom"] == pdf["true_hits"] + pdf["false_positives"]
    assert pdf["opens_with_bloom"] < pdf["opens_without_bloom"]
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet'"
    )
    exact = con.sql("""
        WITH probes AS (
          SELECT g AS probe_id,
                 CASE WHEN g % 2 = 0
                      THEN (SELECT min(doc_id) FROM documents) + g * 7
                      ELSE 900000000 + g * 13 END AS probe_key
          FROM generate_series(0, 99) s(g))
        SELECT count(*) FROM (
          SELECT DISTINCT p.probe_id, d.source
          FROM probes p JOIN documents d ON d.doc_id = p.probe_key)
    """).fetchone()[0]
    assert int(pdf["true_hits"]) == exact


def test_q273_reversed_rings_detected(spark, sf_dir):
    """Exactly the p % 3 == 0 polygons are CW (planted), all others CCW,
    and the shoelace matches a python recompute."""
    import math

    pdf = _run("q273_polygon_winding_audit", spark, sf_dir)
    assert (pdf["needs_reversal"] == (pdf["poly_id"] % 3 == 0)
            .astype(int)).all()
    cos_t = [1000, 924, 707, 383, 0, -383, -707, -924,
             -1000, -924, -707, -383, 0, 383, 707, 924]
    sin_t = [0, 383, 707, 924, 1000, 924, 707, 383,
             0, -383, -707, -924, -1000, -924, -707, -383]
    for p in range(12):
        pts = []
        for v in range(8):
            step = (7 - v) * 2 if p % 3 == 0 else v * 2
            r = 1000 + (p * 173 + v * 97) % 800
            pts.append((r * cos_t[step], r * sin_t[step]))
        area2 = sum(
            x * pts[(i + 1) % 8][1] - pts[(i + 1) % 8][0] * y
            for i, (x, y) in enumerate(pts)
        )
        row = pdf[pdf["poly_id"] == p].iloc[0]
        assert int(row["area2_signed"]) == area2
        assert math.copysign(1, area2) == (1 if row["is_ccw"] else -1)


def test_q274_cms_never_undercounts(spark, sf_dir):
    """est >= exact per token (structural CMS guarantee) and the top-1
    token's exact count matches a direct groupBy."""
    import duckdb

    pdf = _run("q274_cms_heavy_hitters", spark, sf_dir)
    assert (pdf["cms_est"] >= pdf["exact_count"]).all()
    assert (pdf["overcount"] >= 0).all()
    top = duckdb.sql(
        f"SELECT w, count(*) AS n FROM (SELECT unnest(string_split(text, ' ')) AS w "
        f"FROM '{sf_dir}/documents.parquet') GROUP BY w ORDER BY n DESC, w LIMIT 1"
    ).fetchone()
    assert pdf.iloc[0]["token"] == top[0]
    assert int(pdf.iloc[0]["exact_count"]) == top[1]


def test_q275_model_error_shrinks_with_buckets(spark, sf_dir):
    """A 4x bigger CDF model must not be worse, and the max error bounds
    the mean (milli) by construction."""
    pdf = _run("q275_learned_index_audit", spark, sf_dir).set_index(
        "model_buckets")
    assert pdf.loc[64, "max_err"] <= pdf.loc[16, "max_err"]
    assert pdf.loc[64, "mean_err_milli"] <= pdf.loc[16, "mean_err_milli"]
    for b in (16, 64):
        assert pdf.loc[b, "mean_err_milli"] <= pdf.loc[b, "max_err"] * 1000
