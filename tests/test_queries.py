"""Every oracle-paired query must match DuckDB at sf0.001 (fast gate;
the driver re-checks at sf0.01).  Reference analog: indexed-vs-brute
equivalence `GeoWaveSparkSpatialJoinIT.java:98-176`."""

import pytest

from geowave_spark.queries import QUERIES
from geowave_spark.testing import compare, duckdb_conn


@pytest.fixture(scope="module")
def oracle(sf_dir):
    return duckdb_conn(sf_dir)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, oracle):
    fn, sql = QUERIES[name]
    sdf = fn(spark, sf_dir).toPandas()
    if sql is None:
        assert len(sdf) >= 0  # rows-only check
        return
    odf = oracle.sql(sql).df()
    problems = compare(sdf, odf)
    assert not problems, f"{name}: {problems}"


def _band_candidates(sigs, band_defs):
    """Candidate pair count from a banded equi-join over int signatures:
    pairs sharing any band value (the q39/q46 candidate-generation model,
    same key definitions, driver-side for speed)."""
    import numpy as np
    import pandas as pd

    frames = []
    for j, extract in enumerate(band_defs):
        frames.append(pd.DataFrame({
            "id": np.arange(len(sigs)), "band": j, "bh": extract(sigs)}))
    b = pd.concat(frames)
    m = b.merge(b, on=["band", "bh"])
    pairs = m[m.id_x < m.id_y][["id_x", "id_y"]].drop_duplicates()
    return len(pairs)


def test_q39_band_candidates_scale():
    """The 16-bit band keys must keep candidate growth ~O(n * dup_rate):
    doubling a mostly-distinct signature table must NOT ~4x the candidate
    count (quadratic).  The round-1 4-bit banding fails exactly this."""
    import numpy as np

    rng = np.random.default_rng(7)

    def table(n):
        sigs = rng.integers(0, 1 << 62, size=n, dtype=np.int64)
        sigs[: n // 10] = sigs[n // 10: 2 * (n // 10)]  # 10% dup pairs
        return sigs

    wide = [lambda s, j=j: (s >> (16 * j)) & 0xFFFF for j in range(4)]
    narrow = [lambda s, j=j: (s >> (4 * j)) & 0xF for j in range(16)]

    n = 1000
    c1, c2 = _band_candidates(table(n), wide), _band_candidates(table(2 * n), wide)
    # linear-ish growth: true dups double (2% of n), random 16-bit
    # collisions stay negligible at this n
    assert c2 < 3.0 * c1, (c1, c2)
    # and the wide banding is orders of magnitude below the old 4-bit keys
    c_narrow = _band_candidates(table(n), narrow)
    assert c_narrow > 50 * c1, (c_narrow, c1)


def test_shingle_codegen_matches_hof(spark, sf_dir):
    """The codegen shingle build (posexplode + lead windows,
    `shingle_rows_sql_spark`) yields the IDENTICAL (doc_id, shingle) set
    as the dual-dialect HOF transform the DuckDB oracle evaluates."""
    from geowave_spark.functions import sqlgen as G
    from geowave_spark.queries_text import shingle_rows_sql_spark
    from geowave_spark.table.views import register_views

    register_views(spark, str(sf_dir))
    d = G.SPARK
    sh = G.shingles3_from(d, "v")
    old = spark.sql(f"""
        SELECT DISTINCT doc_id, {d.explode(sh)} AS shingle
        FROM (SELECT doc_id, {G.wordvals(d)} AS v FROM documents) wv
        WHERE {d.size('v')} >= 3
    """)
    new = spark.sql(shingle_rows_sql_spark())
    assert old.exceptAll(new).isEmpty() and new.exceptAll(old).isEmpty()
    assert new.count() > 0


def test_q39_sig_codegen_matches_fold(spark, sf_dir):
    """The 64-SUM codegen SimHash signature equals the dual-dialect
    64-fold HOF formulation bit for bit."""
    from geowave_spark.functions import sqlgen as G
    from geowave_spark.queries_text import (_q39_sig_sql,
                                            _q39_sig_sql_spark_fast)
    from geowave_spark.table.views import register_views

    register_views(spark, str(sf_dir))
    old = spark.sql(_q39_sig_sql(G.SPARK))
    new = spark.sql(_q39_sig_sql_spark_fast())
    assert old.exceptAll(new).isEmpty() and new.exceptAll(old).isEmpty()
    assert new.count() > 0


def test_q82_pq_adc_ranks_and_recall(spark, sf_dir):
    """PQ/ADC sanity: 3 ranked rows per query, and the ADC top-3 of each
    query lands inside the TRUE L2 top-20 — the quantizer is lossy by
    design, but an 8x-compressed code that can't keep its nearest
    neighbors in the top-4% would be broken."""
    import numpy as np

    from geowave_spark.queries_text import TEXT_QUERIES

    rows = TEXT_QUERIES["q82_ann_pq_adc"][0](spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append((r["rk"], r["neighbor_id"],
                                               r["adc_dist"]))
    emb = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
           for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .collect()}
    assert by_q and set(by_q) == {v for v in emb if v % 100 == 7}
    for q, entries in by_q.items():
        assert [e[0] for e in sorted(entries)] == [1, 2, 3]
        dists = [e[2] for e in sorted(entries)]
        assert dists == sorted(dists)
        qa = emb[q]
        true = sorted((float(((qa - v) ** 2).sum()), i)
                      for i, v in emb.items() if i != q)[:20]
        true_ids = {i for _, i in true}
        got_ids = {e[1] for e in entries}
        assert got_ids & true_ids, f"query {q}: no ADC hit in true top-20"


def test_q83_semdedup_matches_numpy_brute_force(spark, sf_dir):
    """Independent recomputation of the whole SemDeDup pipeline (centroid
    assignment, intra-cluster pairs, threshold, per-drop aggregates) in
    numpy — the engine's SQL and this share no code path."""
    import numpy as np

    from geowave_spark.queries_text import TEXT_QUERIES

    rows = TEXT_QUERIES["q83_semantic_dedup"][0](spark, sf_dir).collect()
    got = {r["drop_id"]: (r["kept_for"], r["cent_id"], r["n_similar"],
                          r["max_sim_micro"]) for r in rows}

    pdf = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .orderBy("vec_id").toPandas())
    V = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()
    nv = np.linalg.norm(V, axis=1)
    C, cn, cids = V[:16], nv[:16], ids[:16]
    cell = ((V @ C.T) / np.outer(nv, cn)).argmax(axis=1)  # ties -> lowest
    want: dict[int, list] = {}
    for c in range(16):
        idx = np.where(cell == c)[0]
        S = (V[idx] @ V[idx].T) / np.outer(nv[idx], nv[idx])
        for a in range(len(idx)):
            for b in range(a + 1, len(idx)):
                sim = int(np.floor(1_000_000 * S[a, b]))
                if sim >= 340_000:
                    e = want.setdefault(int(ids[idx[b]]),
                                        [int(ids[idx[a]]), int(cids[c]), 0, sim])
                    e[2] += 1
                    e[3] = max(e[3], sim)
    assert got == {k: tuple(v) for k, v in want.items()}
    assert len(got) > 10  # threshold actually bites


def test_q84_familiarity_properties(spark, sf_dir):
    """Every doc's familiarity >= 1.0 (a trigram is at least in its own
    doc), rare flag consistent with the threshold, and a doc made of
    corpus-common trigrams scores above a doc of unique ones."""
    from geowave_spark.queries_text import TEXT_QUERIES

    pdf = TEXT_QUERIES["q84_lm_familiarity"][0](spark, sf_dir).toPandas()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    # every trigram is at least in its own doc: fam >= 1e6 / n_docs
    assert (pdf["fam_micro"] >= 1_000_000 // n_docs).all()
    assert ((pdf["fam_micro"] < 3400) == (pdf["is_rare"] == 1)).all()
    assert 0 < pdf["is_rare"].sum() < len(pdf)  # the gate splits the corpus


def test_q85_canonical_has_best_caption(spark, sf_dir):
    """The selected canonical really carries the longest caption of its
    duplicate group (ties to lowest id), checked against raw documents."""
    from geowave_spark.queries_multimodal import MULTIMODAL_QUERIES

    pdf = (MULTIMODAL_QUERIES["q85_dup_canonical_by_quality"][0](spark, sf_dir)
           .toPandas())
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .selectExpr("doc_id", "n_chars").toPandas())
    docs["seed"] = docs["doc_id"] % 101
    best = {}
    for seed, grp in docs.groupby("seed"):
        mx = grp["n_chars"].max()
        best[seed] = (int(grp.loc[grp["n_chars"] == mx, "doc_id"].min()),
                      int(mx), len(grp))
    got = {int(r.canonical_id) % 101: (int(r.canonical_id),
                                       int(r.best_caption_chars),
                                       int(r.n_copies))
           for r in pdf.itertuples()}
    assert got == best


def test_q87_zonal_stats_pixel_exact(spark, sf_dir):
    """Recompute one zone's clipped pixel sum straight from gen_pixels —
    independent of BOTH the engine's decode path and the oracle's
    closed-form luma."""
    import numpy as np

    from geowave_spark.queries_raster import RASTER_QUERIES, _q87_zones_sql
    from geowave_spark.table.images import gen_images_pdf, gray
    from geowave_spark.raster import codec

    pdf = RASTER_QUERIES["q87_zonal_stats"][0](spark, sf_dir).toPandas()
    assert len(pdf) > 0
    assert ((pdf["mean_luma"] >= 0) & (pdf["mean_luma"] <= 255)).all()
    assert (pdf["sum_luma"] == pdf["mean_luma"] * pdf["n_pixels"]
            + pdf["sum_luma"] % pdf["n_pixels"]).all()

    zones = spark.sql(
        _q87_zones_sql(f"parquet.`{sf_dir}/supplier.parquet`")).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text").toPandas()
    imgs = gen_images_pdf(docs)
    want = {}
    for z in zones.itertuples():
        n_img = n_px = s_luma = 0
        for r in imgs.itertuples():
            if not (r.lon1 > z.zlon0 and r.lon0 < z.zlon1
                    and r.lat1 > z.zlat0 and r.lat0 < z.zlat1):
                continue
            g = gray(codec.decode(r.bytes, r.fmt)).astype(np.int64)
            h, w = g.shape
            cx = r.lon0 + (np.arange(w) + 0.5) * (r.lon1 - r.lon0) / w
            cy = r.lat0 + (np.arange(h) + 0.5) * (r.lat1 - r.lat0) / h
            mx = (cx >= z.zlon0) & (cx < z.zlon1)
            my = (cy >= z.zlat0) & (cy < z.zlat1)
            n = int(mx.sum()) * int(my.sum())
            if n == 0:
                continue
            n_img += 1
            n_px += n
            s_luma += int(g[np.ix_(my, mx)].sum())
        if n_img:
            want[z.rid] = (n_img, n_px, s_luma)
    got = {int(r.rid): (int(r.n_images), int(r.n_pixels), int(r.sum_luma))
           for r in pdf.itertuples()}
    assert got == want


def test_q88_trajectory_matches_pandas_fold(spark, sf_dir):
    """Independent per-user recomputation with geom.haversine_km over the
    pandas-sorted event stream."""
    import numpy as np
    import pandas as pd

    from geowave_spark.geom.core import haversine_km
    from geowave_spark.queries import QUERIES
    from geowave_spark.table import geo

    got = {int(r.user_id): (int(r.n_points), int(r.total_dist_m),
                            int(r.max_seg_m), int(r.max_speed_mps))
           for r in QUERIES["q88_trajectory_stats"][0](spark, sf_dir)
           .toPandas().itertuples()}

    ev = spark.sql(
        f"SELECT user_id, unix_micros(cast(ts as timestamp)) AS us, event_id, "
        f"{geo.lon_sql('event_id')} AS lon, {geo.lat_sql('event_id')} AS lat "
        f"FROM parquet.`{sf_dir}/events.parquet`").toPandas()
    want = {}
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["us", "event_id"])
        if len(g) < 2:
            continue
        lon, lat = g["lon"].to_numpy(), g["lat"].to_numpy()
        us = g["us"].to_numpy()
        seg = np.floor(haversine_km(lon[:-1], lat[:-1], lon[1:], lat[1:])
                       * 1000).astype(np.int64)
        dt = us[1:] - us[:-1]
        sp = np.where(dt > 0, np.floor(seg * 1_000_000.0 / np.where(dt > 0, dt, 1)), 0)
        want[int(uid)] = (len(g), int(seg.sum()), int(seg.max()),
                          int(sp.max()))
    assert got == want


def test_q89_idw_matches_numpy(spark, sf_dir):
    """Exact numpy recomputation of the neighborhood-IDW surface (splat
    fan-out, radius cutoff, integer-floored weight terms)."""
    import numpy as np

    from geowave_spark.queries import QUERIES
    from geowave_spark.table import geo

    got = {int(r.cell): (int(r.n_pts), int(r.idw_milli))
           for r in QUERIES["q89_idw_interpolation"][0](spark, sf_dir)
           .toPandas().itertuples()}

    ev = spark.sql(
        f"SELECT value, {geo.lon_sql('event_id')} AS lon, "
        f"{geo.lat_sql('event_id')} AS lat "
        f"FROM parquet.`{sf_dir}/events.parquet`").toPandas()
    n = 64
    lon, lat, val = (ev["lon"].to_numpy(), ev["lat"].to_numpy(),
                     ev["value"].to_numpy())
    x = np.clip(np.ceil((lon + 180.0) / 360.0 * n).astype(np.int64) - 1, 0, n - 1)
    y = np.clip(np.ceil((lat + 90.0) / 180.0 * n).astype(np.int64) - 1, 0, n - 1)
    acc: dict[int, list] = {}
    for gx in (-1, 0, 1):
        for gy in (-1, 0, 1):
            tx, ty = x + gx, y + gy
            ok = (tx >= 0) & (tx < n) & (ty >= 0) & (ty < n)
            cx = (tx + 0.5) * 360.0 / n - 180.0
            cy = (ty + 0.5) * 180.0 / n - 90.0
            d2 = (lon - cx) ** 2 + (lat - cy) ** 2
            ok &= d2 <= 9.0
            wn = np.floor(1_000_000.0 * val / (d2 + 1e-2)).astype(np.int64)
            wd = np.floor(1_000_000.0 / (d2 + 1e-2)).astype(np.int64)
            for c, a, b in zip((ty[ok] * n + tx[ok]).tolist(),
                               wn[ok].tolist(), wd[ok].tolist()):
                e = acc.setdefault(int(c), [0, 0, 0])
                e[0] += 1
                e[1] += a
                e[2] += b
    want = {c: (m, (1000 * sn) // sd) for c, (m, sn, sd) in acc.items() if sd > 0}
    assert got == want


def test_q90_change_detection_matches_pandas(spark, sf_dir):
    """Conditional-aggregation change report equals the two-pass pandas
    recomputation."""
    import numpy as np

    from geowave_spark.queries import QUERIES
    from geowave_spark.table import geo

    got = {int(r.cell): (int(r.n_before), int(r.n_after), int(r.delta_n),
                         int(r.delta_cents))
           for r in QUERIES["q90_change_detection"][0](spark, sf_dir)
           .toPandas().itertuples()}

    ev = spark.sql(
        f"SELECT day(ts) AS d, value, {geo.lon_sql('event_id')} AS lon, "
        f"{geo.lat_sql('event_id')} AS lat "
        f"FROM parquet.`{sf_dir}/events.parquet`").toPandas()
    n = 64
    x = np.clip(np.ceil((ev['lon'].to_numpy() + 180.0) / 360.0 * n)
                .astype(np.int64) - 1, 0, n - 1)
    y = np.clip(np.ceil((ev['lat'].to_numpy() + 90.0) / 180.0 * n)
                .astype(np.int64) - 1, 0, n - 1)
    ev = ev.assign(cell=y * n + x,
                   cents=np.round(ev['value'].to_numpy() * 100).astype(np.int64))
    want = {}
    for cell, g in ev.groupby("cell"):
        nb = int((g['d'] <= 15).sum())
        na = int((g['d'] > 15).sum())
        if abs(na - nb) >= 3:
            cb = int(g.loc[g['d'] <= 15, 'cents'].sum())
            ca = int(g.loc[g['d'] > 15, 'cents'].sum())
            want[int(cell)] = (nb, na, na - nb, ca - cb)
    assert got == want
    # the |delta| >= 3 gate only bites with enough events per cell; the
    # driver's sf0.01 gate checks the non-trivial case (390 rows there)
    if len(ev) >= 5000:
        assert len(got) > 0


def test_q93_moran_components_match_numpy(spark, sf_dir):
    import numpy as np

    from geowave_spark.queries import QUERIES
    from geowave_spark.table import geo

    r = QUERIES["q93_spatial_autocorrelation"][0](spark, sf_dir).first()

    ev = spark.sql(
        f"SELECT {geo.lon_sql('event_id')} AS lon, "
        f"{geo.lat_sql('event_id')} AS lat "
        f"FROM parquet.`{sf_dir}/events.parquet`").toPandas()
    n = 64
    x = np.clip(np.ceil((ev['lon'].to_numpy() + 180.0) / 360.0 * n)
                .astype(np.int64) - 1, 0, n - 1)
    y = np.clip(np.ceil((ev['lat'].to_numpy() + 90.0) / 180.0 * n)
                .astype(np.int64) - 1, 0, n - 1)
    cnt: dict[tuple, int] = {}
    for xi, yi in zip(x.tolist(), y.tolist()):
        cnt[(xi, yi)] = cnt.get((xi, yi), 0) + 1
    n_cells = len(cnt)
    mu_milli = (1000 * sum(cnt.values())) // n_cells
    dev = {k: 1000 * v - mu_milli for k, v in cnt.items()}
    num = links = 0
    for (xi, yi), da in dev.items():
        for gx in (-1, 0, 1):
            for gy in (-1, 0, 1):
                if gx == gy == 0:
                    continue
                db = dev.get((xi + gx, yi + gy))
                if db is not None:
                    links += 1
                    num += da * db
    den = sum(v * v for v in dev.values())
    assert (r["n_cells"], r["w_links"], r["i_num_milli2"],
            r["i_den_milli2"]) == (n_cells, links, num, den)
    assert links > 0


def test_q94_gaps_are_truly_empty(spark, sf_dir):
    import numpy as np

    from geowave_spark.queries import QUERIES
    from geowave_spark.table import geo

    gaps = {int(r.cell) for r in
            QUERIES["q94_coverage_gaps"][0](spark, sf_dir).toPandas()
            .itertuples()}
    ev = spark.sql(
        f"SELECT {geo.lon_sql('event_id')} AS lon, "
        f"{geo.lat_sql('event_id')} AS lat "
        f"FROM parquet.`{sf_dir}/events.parquet`").toPandas()
    n = 64
    x = np.clip(np.ceil((ev['lon'].to_numpy() + 180.0) / 360.0 * n)
                .astype(np.int64) - 1, 0, n - 1)
    y = np.clip(np.ceil((ev['lat'].to_numpy() + 90.0) / 180.0 * n)
                .astype(np.int64) - 1, 0, n - 1)
    occupied = set((y * n + x).tolist())
    region = {yy * n + xx for xx in range(26, 43) for yy in range(32, 48)}
    assert gaps == region - occupied


def test_q96_decontamination_matches_python_shingles(spark, sf_dir):
    """Exact recomputation of the eval-overlap scrub with pure-python
    trigram sets (same word-hash as the engine's shingle build)."""
    from geowave_spark.queries_text import TEXT_QUERIES

    got = {(r["train_id"], r["eval_id"]): r["n_shared"]
           for r in TEXT_QUERIES["q96_decontamination"][0](spark, sf_dir)
           .collect()}

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text").toPandas()

    def wv(w):
        import geowave_spark.functions.sqlgen as _G
        coeffs = [_G._splitmix31(100 + i) % 500_000 | 1 for i in range(16)]
        clen = _G._splitmix31(99) % 500_000 | 1
        return (sum(c * ord(w[i]) for i, c in enumerate(coeffs) if i < len(w))
                + clen * len(w))

    def tri(text):
        v = [wv(w) for w in text.split()]
        return {(v[i] * 1009 + v[i + 1]) * 1009 + v[i + 2]
                for i in range(len(v) - 2)}

    sh = {int(r.doc_id): tri(r.text) for r in docs.itertuples()
          if len(r.text.split()) >= 3}
    ev = {d: s for d, s in sh.items() if d % 50 == 7}
    want = {}
    for t, ts in sh.items():
        if t % 50 == 7:
            continue
        for e, es in ev.items():
            n = len(ts & es)
            if n >= 5:
                want[(t, e)] = n
    assert got == want


def test_q97_json_rollup_matches_pandas(spark, sf_dir):
    import json as _json

    from geowave_spark.queries import QUERIES

    got = {(r["event_type"], r["k_bucket"]): (r["n"], r["sum_cents"],
                                              r["min_k"], r["max_k"])
           for r in QUERIES["q97_json_props_rollup"][0](spark, sf_dir)
           .collect()}

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "value", "props").toPandas()
    acc = {}
    for r in ev.itertuples():
        k = _json.loads(r.props).get("k")
        if k is None or int(k) < 10:
            continue
        k = int(k)
        key = (r.event_type, k - k % 20)
        e = acc.setdefault(key, [0, 0, k, k])
        e[0] += 1
        e[1] += round(r.value * 100)
        e[2] = min(e[2], k)
        e[3] = max(e[3], k)
    assert got == {k: tuple(v) for k, v in acc.items()} and len(got) > 0


def test_q99_bm25_matches_python(spark, sf_dir):
    """Pure-python BM25 recompute (same rational-idf formula, floats via
    the identical two-division shape)."""
    import math

    from geowave_spark.queries_text import TEXT_QUERIES

    got = [(r["doc_id"], r["score_micro"])
           for r in TEXT_QUERIES["q99_bm25_scoring"][0](spark, sf_dir)
           .collect()]

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text").toPandas()
    words = {int(r.doc_id): r.text.split() for r in docs.itertuples()}
    qterms = sorted(set(words[7]))[:8]
    n_docs = len(words)
    total_len = sum(len(w) for w in words.values())
    df = {q: sum(1 for ws in words.values() if q in ws) for q in qterms}
    scores = {}
    for d, ws in words.items():
        s = 0
        dl = len(ws)
        for q in qterms:
            tf = ws.count(q)
            if tf == 0:
                continue
            idf = (2 * n_docs - 2 * df[q] + 1) / (2 * df[q] + 1)
            rest = (22 * tf * total_len) / (
                10 * tf * total_len + 3 * total_len + 9 * dl * n_docs)
            s += math.floor(1000000.0 * idf * rest)
        if s:
            scores[d] = s
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert got == want and len(got) == 20


def test_q100_gi_hotspots_match_numpy(spark, sf_dir):
    import numpy as np

    from geowave_spark.queries import QUERIES
    from geowave_spark.table import geo

    got = [(r["x"], r["y"], r["n_nb"], r["local_sum"], r["gi_num_milli"])
           for r in QUERIES["q100_hotspots_gi"][0](spark, sf_dir).collect()]

    ev = spark.sql(
        f"SELECT {geo.lon_sql('event_id')} AS lon, "
        f"{geo.lat_sql('event_id')} AS lat "
        f"FROM parquet.`{sf_dir}/events.parquet`").toPandas()
    n = 64
    x = np.clip(np.ceil((ev['lon'].to_numpy() + 180.0) / 360.0 * n)
                .astype(np.int64) - 1, 0, n - 1)
    y = np.clip(np.ceil((ev['lat'].to_numpy() + 90.0) / 180.0 * n)
                .astype(np.int64) - 1, 0, n - 1)
    cnt: dict[tuple, int] = {}
    for xi, yi in zip(x.tolist(), y.tolist()):
        cnt[(xi, yi)] = cnt.get((xi, yi), 0) + 1
    mu_milli = (1000 * sum(cnt.values())) // len(cnt)
    rows = []
    for (xi, yi) in cnt:
        n_nb = local = 0
        for gx in (-1, 0, 1):
            for gy in (-1, 0, 1):
                c = cnt.get((xi + gx, yi + gy))
                if c is not None:
                    n_nb += 1
                    local += c
        rows.append((xi, yi, n_nb, local, 1000 * local - mu_milli * n_nb))
    rows.sort(key=lambda r: (-r[4], r[0], r[1]))
    assert got == rows[:25]


def test_q101_overlay_matches_bruteforce(spark, sf_dir):
    """Brute-force all-pairs rect intersection (pandas) vs the cover-join
    engine path with SW-corner dedup."""
    import math

    from geowave_spark.queries import QUERIES, _q101_zones_sql
    from geowave_spark.table import images as images_mod

    got = {(r["aid"], r["bid"]): r["area_micro"]
           for r in QUERIES["q101_rect_overlay"][0](spark, sf_dir).collect()}

    zones = spark.sql(_q101_zones_sql()).toPandas()
    fps = spark.sql(
        f"SELECT doc_id AS bid, lon0, lat0, lon1, lat1 "
        f"FROM ({images_mod.images_base_sql()})").toPandas()
    want = {}
    for a in zones.itertuples():
        for b in fps.itertuples():
            if (a.lon0 < b.lon1 and b.lon0 < a.lon1
                    and a.lat0 < b.lat1 and b.lat0 < a.lat1):
                area = ((min(a.lon1, b.lon1) - max(a.lon0, b.lon0))
                        * (min(a.lat1, b.lat1) - max(a.lat0, b.lat0)))
                want[(int(a.aid), int(b.bid))] = math.floor(1000000.0 * area)
    assert got == want and len(got) > 0


def test_q102_mann_kendall_matches_python(spark, sf_dir):
    import numpy as np

    from geowave_spark.queries import QUERIES
    from geowave_spark.table import geo

    got = [(r["x"], r["y"], r["n_periods"], r["s_stat"])
           for r in QUERIES["q102_emerging_hotspots"][0](spark, sf_dir)
           .collect()]

    ev = spark.sql(
        f"SELECT ts, {geo.lon_sql('event_id')} AS lon, "
        f"{geo.lat_sql('event_id')} AS lat "
        f"FROM parquet.`{sf_dir}/events.parquet`").toPandas()
    n = 16
    x = np.clip(np.ceil((ev['lon'].to_numpy() + 180.0) / 360.0 * n)
                .astype(np.int64) - 1, 0, n - 1)
    y = np.clip(np.ceil((ev['lat'].to_numpy() + 90.0) / 180.0 * n)
                .astype(np.int64) - 1, 0, n - 1)
    m = (ev['ts'].dt.year * 10000 + ev['ts'].dt.month * 100
         + ev['ts'].dt.day).to_numpy()
    cnt: dict[tuple, int] = {}
    for xi, yi, mi in zip(x.tolist(), y.tolist(), m.tolist()):
        cnt[(xi, yi, mi)] = cnt.get((xi, yi, mi), 0) + 1
    bycell: dict[tuple, list] = {}
    for (xi, yi, mi), c in cnt.items():
        bycell.setdefault((xi, yi), []).append((mi, c))
    rows = []
    for (xi, yi), periods in bycell.items():
        periods.sort()
        s = 0
        for i in range(len(periods)):
            for j in range(i + 1, len(periods)):
                d = periods[j][1] - periods[i][1]
                s += (d > 0) - (d < 0)
        rows.append((xi, yi, len(periods), s))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    assert got == rows[:25]


def test_q103_sobel_matches_whole_image_numpy(spark, sf_dir):
    """Whole-image Sobel (no tiling/halo) recompute; interior pixels only."""
    import numpy as np

    from geowave_spark.queries_raster import RASTER_QUERIES
    from geowave_spark.raster import codec
    from geowave_spark.table import images

    got = {(r["image_id"], r["ty"], r["tx"]):
           (r["n_px"], r["sum_f"], r["min_f"], r["max_f"])
           for r in RASTER_QUERIES["q103_focal_sobel"][0](spark, sf_dir)
           .collect()}

    import duckdb
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' "
        f"WHERE doc_id % 5 = 3 ORDER BY doc_id").df()
    img_pdf = images.gen_images_pdf(docs)
    kx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=np.int64)
    ky = np.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], dtype=np.int64)
    want = {}
    for _, row in img_pdf.iterrows():
        g = images.gray(codec.decode(row["bytes"], row["fmt"]))
        h, w = g.shape
        gx = np.zeros((h, w), dtype=np.int64)
        gy = np.zeros((h, w), dtype=np.int64)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                win = g[1 + dy:h - 1 + dy, 1 + dx:w - 1 + dx]
                gx[1:h - 1, 1:w - 1] += kx[dy + 1, dx + 1] * win
                gy[1:h - 1, 1:w - 1] += ky[dy + 1, dx + 1] * win
        mag = np.abs(gx) + np.abs(gy)
        valid = np.zeros((h, w), dtype=bool)
        valid[1:h - 1, 1:w - 1] = True
        for ty in range((h + 15) // 16):
            for tx in range((w + 15) // 16):
                sl = (slice(ty * 16, (ty + 1) * 16),
                      slice(tx * 16, (tx + 1) * 16))
                v = mag[sl][valid[sl]]
                if v.size:
                    want[(row["image_id"], ty, tx)] = (
                        v.size, int(v.sum()), int(v.min()), int(v.max()))
    assert got == want and len(got) > 0


def test_q108_raster_warp_pixel_exact(spark, sf_dir):
    """Recompute one image's warped tile stats straight from gen_pixels
    (python floats + per-pixel loops) — independent of BOTH the engine's
    vectorized inverse map and the oracle's SQL formulation."""
    import numpy as np

    from geowave_spark.queries_raster import RASTER_QUERIES, _WARP_G, _WARP_T
    from geowave_spark.raster import codec
    from geowave_spark.table.images import gen_images_pdf, gray

    pdf = RASTER_QUERIES["q108_raster_warp"][0](spark, sf_dir).toPandas()
    assert len(pdf) > 0
    assert ((pdf["min_luma"] >= 0) & (pdf["max_luma"] <= 255)).all()
    assert (pdf["n_px"] >= 1).all()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text").toPandas()
    docs = docs[docs["doc_id"] % 7 == 1].head(3)
    imgs = gen_images_pdf(docs)
    G, T = _WARP_G, _WARP_T
    for r in imgs.itertuples():
        g = gray(codec.decode(r.bytes, r.fmt)).astype(np.int64)
        h, w = g.shape
        got = pdf[pdf["image_id"] == r.image_id]
        tiles = {}
        x0 = int(np.ceil((r.lon0 + 180.0) * G - 0.5))
        x1 = int(np.ceil((r.lon1 + 180.0) * G - 0.5)) - 1
        y0 = int(np.ceil((r.lat0 + 90.0) * G - 0.5))
        y1 = int(np.ceil((r.lat1 + 90.0) * G - 0.5)) - 1
        for ty in range(y0, y1 + 1):
            for tx in range(x0, x1 + 1):
                ix = int(np.floor(((tx + 0.5) / G - 180.0 - r.lon0)
                                  * w / (r.lon1 - r.lon0)))
                iy = int(np.floor(((ty + 0.5) / G - 90.0 - r.lat0)
                                  * h / (r.lat1 - r.lat0)))
                ix = min(max(ix, 0), w - 1)
                iy = min(max(iy, 0), h - 1)
                key = (ty // T, tx // T)
                tiles.setdefault(key, []).append(int(g[iy, ix]))
        assert len(got) == len(tiles)
        for row in got.itertuples():
            vals = tiles[(row.tty, row.ttx)]
            assert row.n_px == len(vals)
            assert row.sum_luma == sum(vals)
            assert row.min_luma == min(vals)
            assert row.max_luma == max(vals)


def _wordval(w: str) -> int:
    import geowave_spark.functions.sqlgen as _G
    coeffs = [_G._splitmix31(100 + i) % 500_000 | 1 for i in range(16)]
    clen = _G._splitmix31(99) % 500_000 | 1
    return (sum(c * ord(w[i]) for i, c in enumerate(coeffs) if i < len(w))
            + clen * len(w)) % 2**31


def test_wordval_non_ascii_cross_engine(spark):
    """WORDVAL must agree across Spark / DuckDB / python for tokens with
    codepoints >= ~5351 (CJK etc.): the pre-fix expression multiplied
    ascii() by ~4e5 coefficients in INT32, so DuckDB raised an overflow
    error while Spark silently wrapped — the engines diverged on any
    non-ASCII text (ADVICE r4, medium).  Per-term bigint widening + the
    % 2^31 bound fixes it without changing any ASCII hash value."""
    import duckdb

    import geowave_spark.functions.sqlgen as G

    words = ["hello", "中文词", "naïve", "Ωmega", "日本語のテキスト",
             "кириллица", "x" * 40]
    con = duckdb.connect()
    for w in words:
        lit = "'" + w + "'"
        sv = spark.sql(f"SELECT {G._wordval_expr(lit)} AS v").collect()[0].v
        dv = con.execute("SELECT " + G._wordval_expr(lit)).fetchone()[0]
        pv = _wordval(w)
        assert sv == dv == pv, (w, sv, dv, pv)
        assert 0 <= sv < 2**31


def test_q110_spans_match_python_bruteforce(spark, sf_dir):
    """Recompute every shared->=8-word span by brute force over the raw
    word lists (O(pairs * n * m) python loops — independent of both the
    SQL islands formulation and the positional-hash join)."""
    from geowave_spark.queries_text import TEXT_QUERIES

    got = TEXT_QUERIES["q110_exact_span_dedup"][0](spark, sf_dir).toPandas()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text").toPandas()
    words = {int(r.doc_id): r.text.split(" ") for r in docs.itertuples()}

    expected = {}
    ids = sorted(words)
    for i, d1 in enumerate(ids):
        for d2 in ids[i + 1:]:
            a, b = words[d1], words[d2]
            # longest common substring (word-level) via DP row sweep
            best, shared = 0, 0
            prev = [0] * (len(b) + 1)
            for x in a:
                cur = [0] * (len(b) + 1)
                for j, y in enumerate(b, 1):
                    if x == y:
                        cur[j] = prev[j - 1] + 1
                        if cur[j] > best:
                            best = cur[j]
                prev = cur
            if best >= 8:
                # count shared 8-gram (pa, pb) matches for n_shared_grams
                g1 = {}
                for p in range(len(a) - 7):
                    g1.setdefault(tuple(a[p:p + 8]), []).append(p)
                n = 0
                for p in range(len(b) - 7):
                    n += len(g1.get(tuple(b[p:p + 8]), ()))
                expected[(d1, d2)] = (best, n)

    got_map = {(int(r.d1), int(r.d2)): (int(r.longest_span_words),
                                        int(r.n_shared_grams))
               for r in got.itertuples()}
    assert got_map == expected
    assert all(v[0] >= 8 for v in got_map.values())


def test_q111_repetition_matches_pandas(spark, sf_dir):
    from collections import Counter

    from geowave_spark.queries_text import TEXT_QUERIES

    got = TEXT_QUERIES["q111_repetition_signals"][0](spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text").toPandas()
    import math

    for r in docs.itertuples():
        toks = [_wordval(w) for w in r.text.split(" ")]
        if len(toks) < 2:
            continue
        row = got[got["doc_id"] == r.doc_id].iloc[0]
        n = len(toks)
        assert row.n_tok == n
        assert row.dup_word_micro == math.floor(
            1000000.0 * (n - len(set(toks))) / n)
        bgs = Counter((toks[i] * 100003 + toks[i + 1]) for i in range(n - 1))
        assert row.top_bigram_micro == math.floor(
            1000000.0 * max(bgs.values()) / (n - 1))


def test_q112_chunk_hashes_match_python_fold(spark, sf_dir):
    from geowave_spark.queries_text import TEXT_QUERIES

    got = TEXT_QUERIES["q112_token_chunking"][0](spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text").toPandas()
    W, S = 40, 32
    total = 0
    for r in docs.itertuples():
        toks = [_wordval(w) for w in r.text.split(" ")]
        n = len(toks)
        nch = max(-(-(n - W) // S), 0) + 1
        rows = got[got["doc_id"] == r.doc_id].sort_values("chunk_idx")
        assert len(rows) == nch
        for ck in range(nch):
            lo = ck * S
            hi = min(lo + W, n)
            h = 7
            for v in toks[lo:hi]:
                h = (h * 1009 + v) % 1099511627791
            row = rows.iloc[ck]
            assert (row.tok_lo, row.tok_hi) == (lo + 1, hi)
            assert row.chunk_hash == h
            total += 1
    assert total == len(got)


def test_q113_resample_matches_pandas_interp(spark, sf_dir):
    import math

    from geowave_spark.queries import QUERIES, _RESAMPLE_US
    from geowave_spark.table import geo

    got = QUERIES["q113_trajectory_resample"][0](spark, sf_dir).toPandas()
    ev = spark.sql(
        f"""SELECT user_id, unix_micros(cast(ts as timestamp)) AS us, event_id,
            {geo.lon_sql('event_id')} AS lon, {geo.lat_sql('event_id')} AS lat
            FROM parquet.`{sf_dir}/events.parquet`"""
    ).toPandas()
    H = _RESAMPLE_US
    expected = []
    for uid, grp in ev.groupby("user_id"):
        grp = grp.sort_values(["us", "event_id"]).reset_index(drop=True)
        for i in range(len(grp) - 1):
            us, nus = int(grp.us[i]), int(grp.us[i + 1])
            if nus <= us:
                continue
            lon, lat = float(grp.lon[i]), float(grp.lat[i])
            nlon, nlat = float(grp.lon[i + 1]), float(grp.lat[i + 1])
            h0 = -(-us // H)
            h1 = (nus - 1) // H
            for h in range(h0, h1 + 1):
                frac = (h * H - us) * 1.0 / (nus - us)
                expected.append((int(uid), h,
                                 math.floor(1000000.0 * (lon + (nlon - lon) * frac)),
                                 math.floor(1000000.0 * (lat + (nlat - lat) * frac))))
    expected.sort()
    got_rows = sorted(map(tuple, got[["user_id", "grid_idx",
                                      "lon_micro", "lat_micro"]].values.tolist()))
    assert got_rows == expected


def test_q114_composite_matches_numpy(spark, sf_dir):
    """Whole-composite recompute: warp EVERY selected scene with numpy,
    take the per-lattice-pixel max + scene count in a dict, roll up to
    tiles — independent of the engine's aggregate path."""
    import numpy as np

    from geowave_spark.queries_raster import RASTER_QUERIES, _COMP_G, _COMP_T
    from geowave_spark.raster import codec
    from geowave_spark.table.images import gen_images_pdf, gray

    got = RASTER_QUERIES["q114_temporal_composite"][0](spark, sf_dir).toPandas()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text").toPandas()
    docs = docs[docs["doc_id"] % 2 == 1]
    imgs = gen_images_pdf(docs)
    G = _COMP_G
    comp: dict[tuple[int, int], int] = {}
    cnt: dict[tuple[int, int], int] = {}
    for r in imgs.itertuples():
        g = gray(codec.decode(r.bytes, r.fmt)).astype(np.int64)
        h, w = g.shape
        x0 = int(np.ceil((r.lon0 + 180.0) * G - 0.5))
        x1 = int(np.ceil((r.lon1 + 180.0) * G - 0.5)) - 1
        y0 = int(np.ceil((r.lat0 + 90.0) * G - 0.5))
        y1 = int(np.ceil((r.lat1 + 90.0) * G - 0.5)) - 1
        for gy in range(y0, y1 + 1):
            for gx in range(x0, x1 + 1):
                ix = int(np.floor(((gx + 0.5) / G - 180.0 - r.lon0)
                                  * w / (r.lon1 - r.lon0)))
                iy = int(np.floor(((gy + 0.5) / G - 90.0 - r.lat0)
                                  * h / (r.lat1 - r.lat0)))
                ix = min(max(ix, 0), w - 1)
                iy = min(max(iy, 0), h - 1)
                v = int(g[iy, ix])
                comp[(gx, gy)] = max(comp.get((gx, gy), -1), v)
                cnt[(gx, gy)] = cnt.get((gx, gy), 0) + 1
    tiles: dict[tuple[int, int], list] = {}
    T = _COMP_T
    for (gx, gy), v in comp.items():
        tiles.setdefault((gy // T, gx // T), []).append(
            (v, cnt[(gx, gy)]))
    assert len(got) == len(tiles)
    assert (got["n_multi"] > 0).any()  # the lattice actually overlaps
    for row in got.itertuples():
        vals = tiles[(row.tty, row.ttx)]
        assert row.n_px == len(vals)
        assert row.n_multi == sum(1 for _, c in vals if c >= 2)
        assert row.sum_comp_luma == sum(v for v, _ in vals)
        assert row.max_comp_luma == max(v for v, _ in vals)


def test_q115_zipf_matches_counter(spark, sf_dir):
    import math
    from collections import Counter

    from geowave_spark.queries_text import TEXT_QUERIES

    got = TEXT_QUERIES["q115_zipf_vocab"][0](spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text").toPandas()
    freq: Counter = Counter()
    dfq: Counter = Counter()
    for r in docs.itertuples():
        ws = r.text.split(" ")
        freq.update(ws)
        dfq.update(set(ws))
    order = sorted(freq, key=lambda w: (-freq[w], w))
    total = sum(freq.values())
    cum = 0
    for rank, w in enumerate(order, 1):
        cum += freq[w]
        row = got[got["word"] == w].iloc[0]
        assert (row.freq, row.doc_freq, row.zipf_rank) == (freq[w], dfq[w], rank)
        assert row.cum_share_micro == math.floor(1000000.0 * cum / total)
    assert len(got) == len(order)


def test_q116_outliers_match_numpy(spark, sf_dir):
    import math

    import numpy as np

    from geowave_spark.queries_text import TEXT_QUERIES

    got = TEXT_QUERIES["q116_embedding_outliers"][0](spark, sf_dir).toPandas()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").toPandas()
    vi = {int(r.vec_id): np.floor(
        np.array(r.embedding, dtype=np.float64) * 1000000).astype(np.int64)
        for r in emb.itertuples()}
    cents: dict[int, np.ndarray] = {}
    for r in emb.itertuples():
        cents.setdefault(int(r.label), np.zeros(64, dtype=np.int64))
        cents[int(r.label)] += vi[int(r.vec_id)]
    assert len(got) == len(emb)
    for r in emb.itertuples():
        v, c = vi[int(r.vec_id)], cents[int(r.label)]
        cos = 1000000.0 * int((v * c).sum()) / (
            math.sqrt(int((v * v).sum())) * math.sqrt(int((c * c).sum())))
        row = got[got["vec_id"] == r.vec_id].iloc[0]
        assert row.cos_centroid_micro == math.floor(cos)
        assert row.outlier == (1 if cos < 250000 else 0)


def test_q117_trending_matches_python(spark, sf_dir):
    """Recompute sliding-window membership, counts, deltas and top-3 with
    plain python dicts (window instants from integer k-ranges)."""
    import math

    from geowave_spark.queries import (QUERIES, _TREND_RES, _TREND_SIZE_US,
                                       _TREND_SLIDE_US)
    from geowave_spark.table import geo

    got = QUERIES["q117_trending_cells"][0](spark, sf_dir).toPandas()
    ev = spark.sql(
        f"""SELECT unix_micros(cast(ts as timestamp)) AS us, event_id
            FROM parquet.`{sf_dir}/events.parquet`"""
    ).toPandas()

    n = 1 << _TREND_RES
    LON_MOD, LON_MULT = geo.LON_MOD, geo.LON_MULT
    LAT_MOD, LAT_MULT = geo.LAT_MOD, geo.LAT_MULT
    counts: dict[tuple[int, int], int] = {}
    for r in ev.itertuples():
        k = int(r.event_id)
        lon = ((k % LON_MOD) * LON_MULT % LON_MOD) / 1e6 - 180.0
        lat = ((k % LAT_MOD) * LAT_MULT % LAT_MOD) / 1e6 - 90.0
        x = min(max(math.ceil((lon + 180.0) / 360.0 * n) - 1, 0), n - 1)
        y = min(max(math.ceil((lat + 90.0) / 180.0 * n) - 1, 0), n - 1)
        cell = y * n + x
        us = int(r.us)
        k0 = (us - _TREND_SIZE_US) // _TREND_SLIDE_US + 1
        k1 = us // _TREND_SLIDE_US
        for kk in range(k0, k1 + 1):
            counts[(kk * _TREND_SLIDE_US, cell)] = counts.get(
                (kk * _TREND_SLIDE_US, cell), 0) + 1

    expected = []
    for ws in sorted({w for w, _ in counts}):
        cells = sorted(((c, nn) for (w, c), nn in counts.items() if w == ws),
                       key=lambda t: (-t[1], t[0]))
        for rnk, (c, nn) in enumerate(cells[:3], 1):
            prev = counts.get((ws - _TREND_SLIDE_US, c), 0)
            expected.append((ws, c, nn, nn - prev, rnk))
    got_rows = sorted(map(tuple, got[["ws", "cell", "n", "delta",
                                      "rnk"]].values.tolist()))
    assert got_rows == sorted(expected)


def test_q118_centrality_matches_python_pagerank(spark, sf_dir):
    import math

    import numpy as np

    from geowave_spark.queries_text import TEXT_QUERIES

    got = TEXT_QUERIES["q118_graph_centrality"][0](spark, sf_dir).toPandas()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").toPandas()
    ids = sorted(int(r.vec_id) for r in emb.itertuples())
    vecs = {int(r.vec_id): np.array(r.embedding, dtype=np.float64)
            for r in emb.itertuples()}

    def fold_dot(a, b):
        acc = 0.0
        for i in range(64):
            acc += a[i] * b[i]
        return acc

    edges: dict[int, list[int]] = {}
    for u in ids:
        nu = math.sqrt(fold_dot(vecs[u], vecs[u]))
        sims = []
        for v in ids:
            if v == u:
                continue
            nv = math.sqrt(fold_dot(vecs[v], vecs[v]))
            sims.append((math.floor(
                1000000.0 * fold_dot(vecs[u], vecs[v]) / (nu * nv)), v))
        sims.sort(key=lambda t: (-t[0], t[1]))
        edges[u] = [v for _, v in sims[:5]]

    r = {u: 1000000 for u in ids}
    for _ in range(4):
        nxt = {u: 150000 for u in ids}
        for u in ids:
            c = (17 * r[u]) // 100
            for v in edges[u]:
                nxt[v] += c
        r = nxt

    assert len(got) == len(ids)
    for row in got.itertuples():
        assert r[int(row.vec_id)] == int(row.rank_fp)


def test_q121_hillshade_matches_whole_image_numpy(spark, sf_dir):
    """Whole-image hillshade (no tiling/halo) recompute — Horn gradients +
    the rational NW sun vector; interior pixels only."""
    import numpy as np

    from geowave_spark.queries_raster import RASTER_QUERIES
    from geowave_spark.raster import codec
    from geowave_spark.table import images

    got = {(r["image_id"], r["ty"], r["tx"]):
           (r["n_px"], r["sum_f"], r["min_f"], r["max_f"])
           for r in RASTER_QUERIES["q121_focal_hillshade"][0](spark, sf_dir)
           .collect()}

    import duckdb
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' "
        f"WHERE doc_id % 5 = 3 ORDER BY doc_id").df()
    img_pdf = images.gen_images_pdf(docs)
    kx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=np.int64)
    ky = np.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], dtype=np.int64)
    want = {}
    for _, row in img_pdf.iterrows():
        g = images.gray(codec.decode(row["bytes"], row["fmt"]))
        h, w = g.shape
        gx = np.zeros((h, w), dtype=np.int64)
        gy = np.zeros((h, w), dtype=np.int64)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                win = g[1 + dy:h - 1 + dy, 1 + dx:w - 1 + dx]
                gx[1:h - 1, 1:w - 1] += kx[dy + 1, dx + 1] * win
                gy[1:h - 1, 1:w - 1] += ky[dy + 1, dx + 1] * win
        num = (gx + gy + 16).astype(np.float64)
        den = np.sqrt((gx * gx + gy * gy + 64).astype(np.float64))
        shade = np.floor(1000.0 * num / den).astype(np.int64)
        valid = np.zeros((h, w), dtype=bool)
        valid[1:h - 1, 1:w - 1] = True
        for ty in range((h + 15) // 16):
            for tx in range((w + 15) // 16):
                sl = (slice(ty * 16, (ty + 1) * 16),
                      slice(tx * 16, (tx + 1) * 16))
                v = shade[sl][valid[sl]]
                if v.size:
                    want[(row["image_id"], ty, tx)] = (
                        v.size, int(v.sum()), int(v.min()), int(v.max()))
    assert got == want and len(got) > 0
    # self-shadowed (negative) pixels exist, i.e. the op isn't trivially abs()
    assert any(t[2] < 0 for t in want.values())


def test_q122_pii_scrub_matches_python_re(spark, sf_dir):
    """Python `re` recompute of the PII injection + scrub (counts and the
    md5 of the redacted text) — independent of both SQL dialects."""
    import hashlib
    import re

    import duckdb

    from geowave_spark.queries_text import TEXT_QUERIES

    got = {r["doc_id"]: (r["n_emails"], r["n_phones"], r["scrub_md5"])
           for r in TEXT_QUERIES["q122_pii_scrub"][0](spark, sf_dir).collect()}

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'").df()
    email = re.compile(r"[a-z0-9]+@[a-z0-9.]+")
    phone = re.compile(r"[+]1-555-01[0-9][0-9]")
    n_em = n_ph = 0
    for _, row in docs.iterrows():
        did, t = int(row.doc_id), row.text
        if did % 3 == 0:
            t = f"{t} contact user{did}@mail.example.com now"
        elif did % 3 == 1:
            t = f"{t} call +1-555-01{did % 100:02d} or +1-555-0199 today"
        scrubbed = phone.sub("<PHONE>", email.sub("<EMAIL>", t))
        want = (len(email.findall(t)), len(phone.findall(t)),
                hashlib.md5(scrubbed.encode()).hexdigest())
        assert got[did] == want
        n_em += want[0]
        n_ph += want[1]
    assert n_em > 0 and n_ph > 0
    assert len(got) == len(docs)


def test_q126_rasterize_matches_numpy_lattice(spark, sf_dir):
    """Full-lattice numpy recompute of the polygon burn (half-plane test
    per cell center), independent of both SQL formulations."""
    import numpy as np

    from geowave_spark.queries import QUERIES, register_views
    from geowave_spark.table import geo

    got = {r["cell"]: (r["n_polys"], r["min_doc"])
           for r in QUERIES["q126_rasterize_polygons"][0](spark, sf_dir)
           .collect()}

    register_views(spark, sf_dir)
    hx = spark.sql(geo.hex_a_sql()).toPandas()
    n = 64
    gx, gy = np.meshgrid(np.arange(n), np.arange(n))
    cx = (gx.ravel() + 0.5) / n * 360.0 - 180.0
    cy = (gy.ravel() + 0.5) / n * 180.0 - 90.0
    cells = gy.ravel() * n + gx.ravel()
    want: dict[int, tuple[int, int]] = {}
    for _, r in hx.iterrows():
        inside = np.ones(cx.shape, dtype=bool)
        for i in range(6):
            j = (i + 1) % 6
            vxi, vyi = r[f"vx{i}"], r[f"vy{i}"]
            vxj, vyj = r[f"vx{j}"], r[f"vy{j}"]
            inside &= ((vxj - vxi) * (cy - vyi)
                       - (vyj - vyi) * (cx - vxi)) > 0
        doc = int(r["aid"][3:])
        for c in cells[inside].tolist():
            prev = want.get(c)
            if prev is None:
                want[c] = (1, doc)
            else:
                want[c] = (prev[0] + 1, min(prev[1], doc))
    assert got == want and len(got) > 0
    assert max(v[0] for v in want.values()) > 1  # overlapping burns exist


def test_q128_cost_distance_matches_python_dijkstra_8hop(spark, sf_dir):
    """Pure-python 8-round relaxation recompute of the bounded
    cost-distance transform — independent of both SQL formulations."""
    from geowave_spark.queries import QUERIES, _Q128_RES, _Q128_ROUNDS
    from geowave_spark.table import geo

    got = {r["cell"]: r["dist"]
           for r in QUERIES["q128_cost_distance"][0](spark, sf_dir).collect()}

    ev = spark.sql(
        f"SELECT event_id, {geo.rowmajor_cell_sql(geo.lon_sql('event_id'), geo.lat_sql('event_id'), _Q128_RES)} AS cell "
        f"FROM parquet.`{sf_dir}/events.parquet`").toPandas()
    n = 1 << _Q128_RES
    cost: dict[int, int] = {}
    for c in ev["cell"].tolist():
        cost[c] = cost.get(c, 1) + 1
    src = int(ev.sort_values("event_id").iloc[0]["cell"])
    dist = {src: 0}
    for _ in range(_Q128_ROUNDS):
        new = dict(dist)
        for c, d in dist.items():
            gx, gy = c % n, c // n
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    if (dx, dy) == (0, 0):
                        continue
                    nx, ny = gx + dx, gy + dy
                    if not (0 <= nx < n and 0 <= ny < n):
                        continue
                    b = ny * n + nx
                    if b in cost:
                        cand = d + cost[b]
                        if b not in new or cand < new[b]:
                            new[b] = cand
        dist = new
    assert got == dist and len(got) > 1


def test_q132_flow_direction_matches_whole_image_numpy(spark, sf_dir):
    """Whole-image D8 recompute (no tiling/halo); interior pixels only;
    pits/flats get code 0."""
    import numpy as np

    from geowave_spark.queries_raster import RASTER_QUERIES
    from geowave_spark.raster import codec
    from geowave_spark.raster.focal import _D8
    from geowave_spark.table import images

    got = {(r["image_id"], r["ty"], r["tx"]):
           (r["n_px"], r["sum_f"], r["min_f"], r["max_f"])
           for r in RASTER_QUERIES["q132_flow_direction"][0](spark, sf_dir)
           .collect()}

    import duckdb
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' "
        f"WHERE doc_id % 5 = 3 ORDER BY doc_id").df()
    img_pdf = images.gen_images_pdf(docs)
    want = {}
    for _, row in img_pdf.iterrows():
        g = images.gray(codec.decode(row["bytes"], row["fmt"])).astype(np.int64)
        h, w = g.shape
        enc = np.full((h, w), np.iinfo(np.int64).max)
        for (dy, dx), code in _D8.items():
            nb = np.full((h, w), 1 << 40)
            nb[max(0, -dy):h - max(0, dy), max(0, -dx):w - max(0, dx)] = \
                g[max(0, dy):h - max(0, -dy), max(0, dx):w - max(0, -dx)]
            enc = np.minimum(enc, (nb - g + 256) * 16 + code)
        codes = np.where(enc // 16 - 256 < 0, enc % 16, 0)
        valid = np.zeros((h, w), dtype=bool)
        valid[1:h - 1, 1:w - 1] = True
        for ty in range((h + 15) // 16):
            for tx in range((w + 15) // 16):
                sl = (slice(ty * 16, (ty + 1) * 16),
                      slice(tx * 16, (tx + 1) * 16))
                v = codes[sl][valid[sl]]
                if v.size:
                    want[(row["image_id"], ty, tx)] = (
                        v.size, int(v.sum()), int(v.min()), int(v.max()))
    assert got == want and len(got) > 0
    assert any(t[3] == 8 for t in want.values())  # every code value occurs
    assert any(t[2] == 0 for t in want.values())  # incl. pits/flats


def test_q133_flow_accumulation_matches_python(spark):
    """Pure-python recompute: drainage edges by steepest strictly-lower D8
    neighbor over the occupied density grid, 8 accumulation rounds.
    sf0.01: the sf0.001 density surface is flat (all counts ~2, no
    strictly-lower neighbors, zero edges)."""
    from geowave_spark.queries import QUERIES, _Q128_RES, _Q128_ROUNDS
    from geowave_spark.table import geo

    sf_dir = "/root/testdata/sf0.01"
    got = {r["cell"]: r["acc"]
           for r in QUERIES["q133_flow_accumulation"][0](spark, sf_dir)
           .collect()}

    ev = spark.sql(
        f"SELECT {geo.rowmajor_cell_sql(geo.lon_sql('event_id'), geo.lat_sql('event_id'), _Q128_RES)} AS cell "
        f"FROM parquet.`{sf_dir}/events.parquet`").toPandas()
    n = 1 << _Q128_RES
    cost: dict[int, int] = {}
    for c in ev["cell"].tolist():
        cost[c] = cost.get(c, 1) + 1
    codes = [(1, 0, 1), (1, 1, 2), (0, 1, 3), (-1, 1, 4),
             (-1, 0, 5), (-1, -1, 6), (0, -1, 7), (1, -1, 8)]
    edges = {}
    for c, v in cost.items():
        gx, gy = c % n, c // n
        best = None
        for dx, dy, code in codes:
            nx, ny = gx + dx, gy + dy
            if not (0 <= nx < n and 0 <= ny < n):
                continue
            b = ny * n + nx
            if b in cost:
                e = (cost[b] - v + 4096) * 16 + code
                if best is None or e < best:
                    best = e
        if best is not None and best // 16 - 4096 < 0:
            code = best % 16
            dx, dy = next((dx, dy) for dx, dy, cd in codes if cd == code)
            edges[c] = (gy + dy) * n + (gx + dx)
    acc = {c: 1 for c in cost}
    for _ in range(_Q128_ROUNDS):
        inflow: dict[int, int] = {}
        for src, dst in edges.items():
            inflow[dst] = inflow.get(dst, 0) + acc[src]
        acc = {c: 1 + inflow.get(c, 0) for c in cost}
    assert got == acc and len(got) > 100
    assert max(acc.values()) > 2  # real accumulation happens somewhere


def test_q134_watershed_basins_matches_python_follow(spark):
    """Python recompute: FULLY follow each cell's drainage chain to its
    pit (no doubling), then compare basin sizes — also proves the 4
    doubling rounds converge on this surface (max chain length <= max
    density).  sf0.01 (sf0.001's surface is flat — every cell its own
    basin — which the engine handles but proves nothing)."""
    from geowave_spark.queries import QUERIES, _Q128_RES
    from geowave_spark.table import geo

    sf_dir = "/root/testdata/sf0.01"
    got = {r["basin"]: r["n_cells"]
           for r in QUERIES["q134_watershed_basins"][0](spark, sf_dir)
           .collect()}

    ev = spark.sql(
        f"SELECT {geo.rowmajor_cell_sql(geo.lon_sql('event_id'), geo.lat_sql('event_id'), _Q128_RES)} AS cell "
        f"FROM parquet.`{sf_dir}/events.parquet`").toPandas()
    n = 1 << _Q128_RES
    cost: dict[int, int] = {}
    for c in ev["cell"].tolist():
        cost[c] = cost.get(c, 1) + 1
    codes = [(1, 0, 1), (1, 1, 2), (0, 1, 3), (-1, 1, 4),
             (-1, 0, 5), (-1, -1, 6), (0, -1, 7), (1, -1, 8)]
    nxt = {}
    for c, v in cost.items():
        gx, gy = c % n, c // n
        best = None
        for dx, dy, code in codes:
            nx_, ny = gx + dx, gy + dy
            if 0 <= nx_ < n and 0 <= ny < n and (ny * n + nx_) in cost:
                e = (cost[ny * n + nx_] - v + 4096) * 16 + code
                if best is None or e < best:
                    best = e
        if best is not None and best // 16 - 4096 < 0:
            code = best % 16
            dx, dy = next((dx, dy) for dx, dy, cd in codes if cd == code)
            nxt[c] = (gy + dy) * n + (gx + dx)
    want: dict[int, int] = {}
    for c in cost:
        p = c
        while p in nxt:
            p = nxt[p]
        want[p] = want.get(p, 0) + 1
    assert got == want
    assert len(want) < len(cost)          # basins actually merge cells
    assert max(want.values()) > 3


def test_q135_strahler_order_matches_python(spark):
    """Python recompute: same drainage edges, then 8 Strahler rounds
    (max child order; +1 when >= 2 children tie at the max).  sf0.01
    (flat sf0.001 surface has zero edges)."""
    from geowave_spark.queries import QUERIES, _Q128_RES, _Q135_ROUNDS
    from geowave_spark.table import geo

    sf_dir = "/root/testdata/sf0.01"
    got = {r["cell"]: r["ord"]
           for r in QUERIES["q135_strahler_order"][0](spark, sf_dir)
           .collect()}

    ev = spark.sql(
        f"SELECT {geo.rowmajor_cell_sql(geo.lon_sql('event_id'), geo.lat_sql('event_id'), _Q128_RES)} AS cell "
        f"FROM parquet.`{sf_dir}/events.parquet`").toPandas()
    n = 1 << _Q128_RES
    cost: dict[int, int] = {}
    for c in ev["cell"].tolist():
        cost[c] = cost.get(c, 1) + 1
    codes = [(1, 0, 1), (1, 1, 2), (0, 1, 3), (-1, 1, 4),
             (-1, 0, 5), (-1, -1, 6), (0, -1, 7), (1, -1, 8)]
    edges = {}
    for c, v in cost.items():
        gx, gy = c % n, c // n
        best = None
        for dx, dy, code in codes:
            nx_, ny = gx + dx, gy + dy
            if 0 <= nx_ < n and 0 <= ny < n and (ny * n + nx_) in cost:
                e = (cost[ny * n + nx_] - v + 4096) * 16 + code
                if best is None or e < best:
                    best = e
        if best is not None and best // 16 - 4096 < 0:
            code = best % 16
            dx, dy = next((dx, dy) for dx, dy, cd in codes if cd == code)
            edges[c] = (gy + dy) * n + (gx + dx)
    ordr = {c: 1 for c in cost}
    for _ in range(_Q135_ROUNDS):
        children: dict[int, list[int]] = {}
        for src, dst in edges.items():
            children.setdefault(dst, []).append(ordr[src])
        nxt_ord = {}
        for c in cost:
            ch = children.get(c)
            if not ch:
                nxt_ord[c] = ordr[c]
            else:
                m = max(ch)
                nxt_ord[c] = max(ordr[c], m + 1 if ch.count(m) >= 2 else m)
        ordr = nxt_ord
    assert got == ordr and len(got) > 100
    assert max(ordr.values()) >= 2        # a real confluence exists


def test_q136_sessionization_matches_python_fold(spark):
    """Python fold recompute of the gap-based sessions: per user, sorted
    event micros, split where the gap >= 8h — the native session_window
    aggregate must produce exactly these (start, dur, count) triples."""
    from geowave_spark.queries import QUERIES, _Q136_GAP_US

    sf_dir = "/root/testdata/sf0.01"
    got = sorted(
        (r["user_id"], r["sess_start_us"], r["dur_us"], r["n_events"])
        for r in QUERIES["q136_sessionization"][0](spark, sf_dir).collect()
    )

    pdf = spark.sql(
        f"SELECT user_id, unix_micros(cast(ts as timestamp)) AS us "
        f"FROM parquet.`{sf_dir}/events.parquet`").toPandas()
    want = []
    for uid, grp in pdf.groupby("user_id"):
        times = sorted(grp["us"].tolist())
        start, prev, cnt = times[0], times[0], 1
        for t in times[1:]:
            if t - prev >= _Q136_GAP_US:
                want.append((uid, start, prev - start, cnt))
                start, cnt = t, 0
            prev = t
            cnt += 1
        want.append((uid, start, prev - start, cnt))
    want.sort()
    assert got == want and len(got) > 150
    assert max(n for *_, n in got) > 1    # sessions actually merge events


def test_q142_bpe_merges_match_python_greedy(spark, sf_dir):
    """Independent python recompute of the BPE merge rounds: a SEQUENTIAL
    left-to-right greedy merge scan per document — the SQL formulation
    relies on a != b making occurrences disjoint, so the order-independent
    relational merge must equal the order-dependent greedy one."""
    from collections import Counter

    from geowave_spark.queries_text import TEXT_QUERIES, _Q142_ROUNDS

    got = [(r["merge_round"], r["a"], r["b"], r["freq"], r["corpus_tokens"])
           for r in TEXT_QUERIES["q142_bpe_merge_rounds"][0](spark, sf_dir)
           .collect()]

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "text").toPandas()
    corpus = [t.split(" ") for t in docs["text"].tolist()]
    want = []
    for i in range(1, _Q142_ROUNDS + 1):
        pairs = Counter()
        for toks in corpus:
            for x, y in zip(toks, toks[1:]):
                if x != y:
                    pairs[(x, y)] += 1
        (a, b), freq = min(pairs.items(),
                           key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merged = []
        for toks in corpus:
            out, j = [], 0
            while j < len(toks):
                if j + 1 < len(toks) and toks[j] == a and toks[j + 1] == b:
                    out.append(a + "_" + b)
                    j += 2
                else:
                    out.append(toks[j])
                    j += 1
            merged.append(out)
        corpus = merged
        want.append((i, a, b, freq, sum(len(t) for t in corpus)))
    assert got == want and len(got) == _Q142_ROUNDS
    # the corpus actually shrinks every round
    assert all(w[4] < (want[k - 1][4] if k else got[0][4] + w[3])
               for k, w in enumerate(want))


def test_q144_stay_points_match_python_fold(spark):
    """Python fold recompute: per user, sorted events with their res-3
    cells; split where the cell changes or the gap >= 24h; keep episodes
    of >= 2 events."""
    from geowave_spark.queries import (QUERIES, _Q144_GAP_US, _Q144_RES)
    from geowave_spark.table import geo

    sf_dir = "/root/testdata/sf0.01"
    got = sorted(
        (r["user_id"], r["cell"], r["start_us"], r["dur_us"], r["n_events"])
        for r in QUERIES["q144_stay_points"][0](spark, sf_dir).collect()
    )

    pdf = spark.sql(
        f"SELECT user_id, unix_micros(cast(ts as timestamp)) AS us, "
        f"{geo.rowmajor_cell_sql(geo.lon_sql('event_id'), geo.lat_sql('event_id'), _Q144_RES)} AS cell "
        f"FROM parquet.`{sf_dir}/events.parquet`").toPandas()
    want = []
    for uid, grp in pdf.groupby("user_id"):
        evs = sorted(zip(grp["us"].tolist(), grp["cell"].tolist()))
        episode = [evs[0]]
        for prev, cur in zip(evs, evs[1:]):
            if cur[1] != prev[1] or cur[0] - prev[0] >= _Q144_GAP_US:
                if len(episode) >= 2:
                    want.append((uid, episode[0][1], episode[0][0],
                                 episode[-1][0] - episode[0][0],
                                 len(episode)))
                episode = []
            episode.append(cur)
        if len(episode) >= 2:
            want.append((uid, episode[0][1], episode[0][0],
                         episode[-1][0] - episode[0][0], len(episode)))
    want.sort()
    assert got == want and len(got) > 50
    assert max(n for *_, n in got) >= 3   # a real multi-event dwell exists


def test_q145_od_transitions_match_python_fold(spark):
    """Python recompute of the OD matrix: per-user sorted events, count
    (from_cell, to_cell) for consecutive pairs under the 24h gap, then
    row-normalize in integer micro."""
    from collections import Counter

    from geowave_spark.queries import QUERIES, _Q144_GAP_US, _Q144_RES
    from geowave_spark.table import geo

    sf_dir = "/root/testdata/sf0.01"
    got = sorted(
        (r["from_cell"], r["to_cell"], r["n_trans"], r["p_micro"])
        for r in QUERIES["q145_od_transitions"][0](spark, sf_dir).collect()
    )

    pdf = spark.sql(
        f"SELECT user_id, unix_micros(cast(ts as timestamp)) AS us, "
        f"{geo.rowmajor_cell_sql(geo.lon_sql('event_id'), geo.lat_sql('event_id'), _Q144_RES)} AS cell "
        f"FROM parquet.`{sf_dir}/events.parquet`").toPandas()
    trans = Counter()
    for _, grp in pdf.groupby("user_id"):
        evs = sorted(zip(grp["us"].tolist(), grp["cell"].tolist()))
        for (pu, pc), (cu, cc) in zip(evs, evs[1:]):
            if cu - pu < _Q144_GAP_US:
                trans[(pc, cc)] += 1
    row_tot = Counter()
    for (fc, _), n in trans.items():
        row_tot[fc] += n
    want = sorted((fc, tc, n, n * 1_000_000 // row_tot[fc])
                  for (fc, tc), n in trans.items())
    assert got == want and len(got) > 500
    # probabilities per origin sum to <= 1e6 (floor) and > 0
    assert all(0 < p <= 1_000_000 for *_, p in got)


def test_q147_kdop_extremes_match_python_and_dominate(spark):
    """Python recompute of the 8-direction support points + the hull
    property: no event beats its direction's extreme dot product."""
    from geowave_spark.queries import QUERIES, _Q147_DIRS
    from geowave_spark.table import geo

    sf_dir = "/root/testdata/sf0.01"
    got = {(r["user_id"], r["dir_idx"]): (r["event_id"], r["dot_micro"])
           for r in QUERIES["q147_kdop_hull_extremes"][0](spark, sf_dir)
           .collect()}

    pdf = spark.sql(
        f"SELECT user_id, event_id, "
        f"cast(floor(({geo.lon_sql('event_id')}) * 1000000) as bigint) AS lon_u, "
        f"cast(floor(({geo.lat_sql('event_id')}) * 1000000) as bigint) AS lat_u "
        f"FROM parquet.`{sf_dir}/events.parquet`").toPandas()
    want = {}
    for uid, grp in pdf.groupby("user_id"):
        rows = list(zip(grp["event_id"], grp["lon_u"], grp["lat_u"]))
        for i, (dx, dy) in enumerate(_Q147_DIRS):
            best = max(rows, key=lambda r: (dx * r[1] + dy * r[2], -r[0]))
            want[(uid, i)] = (best[0], dx * best[1] + dy * best[2])
    assert got == want and len(got) == 8 * pdf["user_id"].nunique()
    # dominance: every event's dot <= the recorded extreme
    for uid, grp in pdf.groupby("user_id"):
        for i, (dx, dy) in enumerate(_Q147_DIRS):
            dots = dx * grp["lon_u"].to_numpy() + dy * grp["lat_u"].to_numpy()
            assert got[(uid, i)][1] == dots.max()


def test_q149_heading_reversals_match_python(spark):
    """Python recompute of the dot-sign reversal counts per user."""
    from geowave_spark.queries import QUERIES
    from geowave_spark.table import geo

    sf_dir = "/root/testdata/sf0.01"
    got = {r["user_id"]: (r["n_points"], r["n_reversals"],
                          r["rev_share_micro"])
           for r in QUERIES["q149_heading_reversals"][0](spark, sf_dir)
           .collect()}

    pdf = spark.sql(
        f"SELECT user_id, unix_micros(cast(ts as timestamp)) AS us, "
        f"cast(floor(({geo.lon_sql('event_id')}) * 1000000) as bigint) AS x, "
        f"cast(floor(({geo.lat_sql('event_id')}) * 1000000) as bigint) AS y "
        f"FROM parquet.`{sf_dir}/events.parquet`").toPandas()
    want = {}
    for uid, grp in pdf.groupby("user_id"):
        pts = [(x, y) for _, x, y in
               sorted(zip(grp["us"], grp["x"], grp["y"]))]
        rev = turns = 0
        for i in range(2, len(pts)):
            pdx, pdy = pts[i - 1][0] - pts[i - 2][0], pts[i - 1][1] - pts[i - 2][1]
            dx, dy = pts[i][0] - pts[i - 1][0], pts[i][1] - pts[i - 1][1]
            turns += 1
            if pdx * dx + pdy * dy < 0:
                rev += 1
        if turns:
            want[uid] = (len(pts), rev, rev * 1_000_000 // turns)
    assert got == want and len(got) > 100
    # the synthetic tracks are hash-scattered: reversals are common
    assert sum(r for _, r, _ in got.values()) > 100


def test_q152_covariance_matches_numpy(spark):
    """numpy recompute of the integer-floored covariance matrix."""
    import numpy as np

    from geowave_spark.queries_text import TEXT_QUERIES

    sf_dir = "/root/testdata/sf0.01"
    got = {(r["dim_i"], r["dim_j"]): (r["cov_sum"], r["n_vecs"])
           for r in TEXT_QUERIES["q152_embedding_covariance"][0](spark, sf_dir)
           .collect()}

    pdf = spark.read.parquet(f"{sf_dir}/embeddings.parquet").toPandas()
    m = np.floor(np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
                 * 1_000_000).astype(np.int64)
    n, d = m.shape
    # both engines' integer division truncates toward zero on negatives
    # (Spark `div`, DuckDB `//`) — numpy's // floors, so emulate trunc
    s = m.sum(axis=0)
    means = np.sign(s) * (np.abs(s) // n)
    c = m - means[None, :]
    cov = c.T @ c
    want = {(i + 1, j + 1): (int(cov[i, j]), n)
            for i in range(d) for j in range(i, d)}
    assert got == want and len(got) == d * (d + 1) // 2
    # diagonal is a variance: strictly positive
    assert all(got[(i, i)][0] > 0 for i in range(1, d + 1))


def test_q153_compaction_matches_python_and_preserves_area(spark):
    """Python set recompute of the bottom-up quad compaction + the two
    invariants: exact area preservation and disjointness (no output cell
    is an ancestor of another output cell)."""
    from geowave_spark.queries import QUERIES, _Q153_RES, _Q153_ROUNDS
    from geowave_spark.table import geo

    sf_dir = "/root/testdata/sf0.01"
    got = sorted((r["res"], r["cell"])
                 for r in QUERIES["q153_cover_compaction"][0](spark, sf_dir)
                 .collect())

    ev = spark.sql(
        f"SELECT DISTINCT {geo.rowmajor_cell_sql(geo.lon_sql('event_id'), geo.lat_sql('event_id'), _Q153_RES)} AS cell "
        f"FROM parquet.`{sf_dir}/events.parquet`").toPandas()
    cover = {(_Q153_RES, int(c)) for c in ev["cell"]}
    n_base = len(cover)
    for i in range(_Q153_ROUNDS):
        r = _Q153_RES - i
        n = 1 << r
        level = {c for (res, c) in cover if res == r}
        parents = {}
        for c in level:
            p = (c // n // 2) * (n // 2) + (c % n) // 2
            parents.setdefault(p, []).append(c)
        full = {p for p, ch in parents.items() if len(ch) == 4}
        cover = {(res, c) for (res, c) in cover
                 if res != r or (c // n // 2) * (n // 2) + (c % n) // 2
                 not in full}
        cover |= {(r - 1, p) for p in full}
    want = sorted(cover)
    assert got == want and len(got) < n_base   # compaction actually shrinks
    # area preservation
    assert sum(4 ** (_Q153_RES - r) for r, _ in got) == n_base
    # disjointness: no cell's ancestor is also in the set
    cells = set(got)
    for r, c in got:
        cc, rr = c, r
        while rr > min(x for x, _ in got):
            n = 1 << rr
            cc = (cc // n // 2) * (n // 2) + (cc % n) // 2
            rr -= 1
            assert (rr, cc) not in cells


def test_q154_viewshed_matches_python_walk(spark):
    """Python ray-walk recompute of the 8-ray line-of-sight from the grid
    center over the res-6 density raster."""
    from collections import Counter

    from geowave_spark.queries import QUERIES, _Q147_DIRS, _Q153_RES
    from geowave_spark.table import geo

    sf_dir = "/root/testdata/sf0.01"
    got = sorted((r["dx"], r["dy"], r["step"], r["cell"], r["density"])
                 for r in QUERIES["q154_viewshed_rays"][0](spark, sf_dir)
                 .collect())

    ev = spark.sql(
        f"SELECT {geo.rowmajor_cell_sql(geo.lon_sql('event_id'), geo.lat_sql('event_id'), _Q153_RES)} AS cell "
        f"FROM parquet.`{sf_dir}/events.parquet`").toPandas()
    e = Counter(int(c) for c in ev["cell"])
    n = 1 << _Q153_RES
    ox = oy = n // 2
    want = []
    for dx, dy in _Q147_DIRS:
        horizon = -1
        for s in range(1, n):
            cx, cy = ox + s * dx, oy + s * dy
            if not (0 <= cx < n and 0 <= cy < n):
                break
            dens = e.get(cy * n + cx, 0)
            if dens > horizon:
                want.append((dx, dy, s, cy * n + cx, dens))
            horizon = max(horizon, dens)
    want.sort()
    assert got == want and len(got) >= 8
    # every ray has at least its first visible cell
    assert len({(dx, dy) for dx, dy, *_ in got}) == 8


def test_q155_class_separation_matches_numpy(spark):
    """numpy recompute of the inter-centroid squared distances with
    trunc-division means."""
    import numpy as np

    from geowave_spark.queries_text import TEXT_QUERIES

    sf_dir = "/root/testdata/sf0.01"
    got = {(r["label_i"], r["label_j"]): r["dist2"]
           for r in TEXT_QUERIES["q155_class_separation"][0](spark, sf_dir)
           .collect()}

    pdf = spark.read.parquet(f"{sf_dir}/embeddings.parquet").toPandas()
    m = np.floor(np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
                 * 1_000_000).astype(np.int64)
    labels = pdf["label"].to_numpy()
    cents = {}
    for lb in np.unique(labels):
        s = m[labels == lb].sum(axis=0)
        n = int((labels == lb).sum())
        cents[int(lb)] = np.sign(s) * (np.abs(s) // n)
    want = {}
    ks = sorted(cents)
    for i, a in enumerate(ks):
        for b in ks[i + 1:]:
            dd = cents[a] - cents[b]
            want[(a, b)] = int((dd * dd).sum())
    assert got == want and len(got) == 45
    assert all(v > 0 for v in got.values())   # classes genuinely separate


def test_q156_fuzzy_dedup_matches_python_levenshtein(spark):
    """Pure-python DP recompute of the blocked edit-distance pairs."""
    from geowave_spark.queries_text import TEXT_QUERIES

    sf_dir = "/root/testdata/sf0.01"
    got = sorted((r["id1"], r["id2"], r["edit_dist"])
                 for r in TEXT_QUERIES["q156_fuzzy_dedup"][0](spark, sf_dir)
                 .collect())

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    pdf = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text").toPandas()
    docs = list(zip(pdf["doc_id"], pdf["text"]))
    by_block = {}
    for did, txt in docs:
        by_block.setdefault(txt[:16], []).append((did, txt))
    want = []
    for grp in by_block.values():
        grp.sort()
        for i in range(len(grp)):
            for j in range(i + 1, len(grp)):
                d = lev(grp[i][1][:128], grp[j][1][:128])
                if d <= 12:
                    want.append((grp[i][0], grp[j][0], d))
    want.sort()
    assert got == want and len(got) > 10
    assert any(d > 0 for *_, d in got)   # real edits, not exact dups only


def test_q157_semivariogram_matches_python(spark):
    """Python recompute of the E/N semivariogram sums over occupied
    cell pairs."""
    from collections import Counter

    from geowave_spark.queries import QUERIES, _Q153_RES
    from geowave_spark.table import geo

    sf_dir = "/root/testdata/sf0.01"
    got = {(r["dir"], r["h"]): (r["sq_sum"], r["n_pairs"])
           for r in QUERIES["q157_semivariogram"][0](spark, sf_dir)
           .collect()}

    ev = spark.sql(
        f"SELECT {geo.rowmajor_cell_sql(geo.lon_sql('event_id'), geo.lat_sql('event_id'), _Q153_RES)} AS cell "
        f"FROM parquet.`{sf_dir}/events.parquet`").toPandas()
    z = Counter(int(c) for c in ev["cell"])
    n = 1 << _Q153_RES
    want = {}
    for h in range(1, 9):
        for d, dx, dy in (("E", h, 0), ("N", 0, h)):
            sq = cnt = 0
            for c, v in z.items():
                x, y = c % n, c // n
                if x + dx < n and y + dy < n:
                    o = (y + dy) * n + (x + dx)
                    if o in z:
                        sq += (v - z[o]) ** 2
                        cnt += 1
            want[(d, h)] = (sq, cnt)
    assert got == want and len(got) == 16
    assert all(c > 100 for _, c in got.values())


def test_q158_cooccurrence_lift_matches_python(spark):
    """Python basket recompute of pair supports and trunc-division lift."""
    from collections import Counter

    from geowave_spark.queries import QUERIES

    sf_dir = "/root/testdata/sf0.01"
    got = {(r["type_a"], r["type_b"]): (r["n_ab"], r["lift_micro"])
           for r in QUERIES["q158_cooccurrence_lift"][0](spark, sf_dir)
           .collect()}

    pdf = spark.sql(
        f"SELECT user_id, unix_micros(cast(ts as timestamp)) div 86400000000 AS day, "
        f"event_type FROM parquet.`{sf_dir}/events.parquet`").toPandas()
    baskets = {}
    for uid, day, t in pdf.itertuples(index=False):
        baskets.setdefault((uid, day), set()).add(t)
    nb = len(baskets)
    marg = Counter()
    pair = Counter()
    for items in baskets.values():
        for t in items:
            marg[t] += 1
        its = sorted(items)
        for i in range(len(its)):
            for j in range(i + 1, len(its)):
                pair[(its[i], its[j])] += 1
    want = {k: (v, v * nb * 1_000_000 // (marg[k[0]] * marg[k[1]]))
            for k, v in pair.items()}
    assert got == want and len(got) == 10   # C(5,2) type pairs
    assert any(l > 1_000_000 for _, l in got.values()) or \
        any(l < 1_000_000 for _, l in got.values())


def test_q159_exact_median_matches_python(spark):
    """Python recompute: lower median of integer cents, deterministic
    (cents, event_id) tie order."""
    from geowave_spark.queries import QUERIES

    sf_dir = "/root/testdata/sf0.01"
    got = {r["event_type"]: (r["n_events"], r["median_cents"])
           for r in QUERIES["q159_exact_median"][0](spark, sf_dir)
           .collect()}

    import math
    pdf = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "event_id", "value").toPandas()
    want = {}
    for t, grp in pdf.groupby("event_type"):
        vals = sorted((int(math.floor(v * 100)), int(e))
                      for e, v in zip(grp["event_id"], grp["value"]))
        want[t] = (len(vals), vals[(len(vals) + 1) // 2 - 1][0])
    assert got == want and len(got) == 5


def test_q160_decayed_counts_match_python(spark):
    """Python recompute of the binary half-life decay weights."""
    from collections import defaultdict

    from geowave_spark.queries import QUERIES, _Q153_RES
    from geowave_spark.table import geo

    sf_dir = "/root/testdata/sf0.01"
    got = {r["cell"]: (r["n_events"], r["decayed_micro"])
           for r in QUERIES["q160_decayed_counts"][0](spark, sf_dir)
           .collect()}

    pdf = spark.sql(
        f"SELECT {geo.rowmajor_cell_sql(geo.lon_sql('event_id'), geo.lat_sql('event_id'), _Q153_RES)} AS cell, "
        f"unix_micros(cast(ts as timestamp)) AS us "
        f"FROM parquet.`{sf_dir}/events.parquet`").toPandas()
    mx = int(pdf["us"].max())
    agg = defaultdict(lambda: [0, 0])
    for c, us in zip(pdf["cell"], pdf["us"]):
        k = ((mx - int(us)) // 86_400_000_000) // 4
        agg[int(c)][0] += 1
        agg[int(c)][1] += 1_000_000 // (1 << k)
    want = {c: tuple(v) for c, v in agg.items()}
    assert got == want and len(got) > 1000
    # decay is real: some cells' decayed weight is far below full
    assert any(d < n * 100_000 for n, d in got.values())


def test_q161_poisson_anomaly_matches_python(spark):
    """Python recompute of the global-rate z-scores (same sqrt/floor)."""
    import math
    from collections import Counter

    from geowave_spark.queries import QUERIES, _Q153_RES
    from geowave_spark.table import geo

    sf_dir = "/root/testdata/sf0.01"
    got = {r["cell"]: (r["x"], r["z_scaled"])
           for r in QUERIES["q161_poisson_anomaly"][0](spark, sf_dir)
           .collect()}

    ev = spark.sql(
        f"SELECT {geo.rowmajor_cell_sql(geo.lon_sql('event_id'), geo.lat_sql('event_id'), _Q153_RES)} AS cell "
        f"FROM parquet.`{sf_dir}/events.parquet`").toPandas()
    x = Counter(int(c) for c in ev["cell"])
    l_milli = sum(x.values()) * 1000 // len(x)
    want = {c: (v, math.floor((v * 1000 - l_milli) / math.sqrt(l_milli)))
            for c, v in x.items()}
    assert got == want and len(got) > 1000
    assert max(z for _, z in got.values()) > 10   # real hot cells exist


def test_q162_stationary_visits_match_python_iteration(spark):
    """Python recompute of the 4 trunc-division power-iteration rounds
    over the OD graph, plus the mass-conservation bound (trunc loses
    mass, never creates it)."""
    from collections import Counter, defaultdict

    from geowave_spark.queries import (QUERIES, _Q144_GAP_US, _Q144_RES,
                                       _Q162_ROUNDS)
    from geowave_spark.table import geo

    sf_dir = "/root/testdata/sf0.01"
    got = {r["cell"]: r["pi"]
           for r in QUERIES["q162_stationary_visits"][0](spark, sf_dir)
           .collect()}

    pdf = spark.sql(
        f"SELECT user_id, unix_micros(cast(ts as timestamp)) AS us, "
        f"{geo.rowmajor_cell_sql(geo.lon_sql('event_id'), geo.lat_sql('event_id'), _Q144_RES)} AS cell "
        f"FROM parquet.`{sf_dir}/events.parquet`").toPandas()
    trans = Counter()
    for _, grp in pdf.groupby("user_id"):
        evs = sorted(zip(grp["us"].tolist(), grp["cell"].tolist()))
        for (pu, pc), (cu, cc) in zip(evs, evs[1:]):
            if cu - pu < _Q144_GAP_US:
                trans[(pc, cc)] += 1
    row_tot = Counter()
    for (f, _), n in trans.items():
        row_tot[f] += n
    pi = {f: 1_000_000 for f in row_tot}
    total0 = sum(pi.values())
    for _ in range(_Q162_ROUNDS):
        nxt = defaultdict(int)
        for (f, g), n in trans.items():
            if f in pi:
                nxt[g] += pi[f] * n // row_tot[f]
        pi = dict(nxt)
    want = {c: v for c, v in pi.items() if v > 0}
    assert got == want and len(got) > 30
    assert sum(got.values()) <= total0          # trunc only loses mass
    # the hash-scattered OD graph is near doubly-stochastic, so the fixed
    # point is near-uniform; require a non-degenerate spread (> 5%) and
    # at least one above-uniform cell
    assert max(got.values()) > 1_000_000
    assert max(got.values()) * 100 > 105 * min(got.values())


def test_q163_triangles_match_python(spark):
    """Python set recompute of triangles and clustering coefficients on
    the undirected OD graph."""
    from itertools import combinations

    from geowave_spark.queries import QUERIES, _Q144_GAP_US, _Q144_RES
    from geowave_spark.table import geo

    sf_dir = "/root/testdata/sf0.01"
    got = {r["cell"]: (r["degree"], r["n_triangles"], r["clustering_micro"])
           for r in QUERIES["q163_triangle_clustering"][0](spark, sf_dir)
           .collect()}

    pdf = spark.sql(
        f"SELECT user_id, unix_micros(cast(ts as timestamp)) AS us, "
        f"{geo.rowmajor_cell_sql(geo.lon_sql('event_id'), geo.lat_sql('event_id'), _Q144_RES)} AS cell "
        f"FROM parquet.`{sf_dir}/events.parquet`").toPandas()
    edges = set()
    for _, grp in pdf.groupby("user_id"):
        evs = sorted(zip(grp["us"].tolist(), grp["cell"].tolist()))
        for (pu, pc), (cu, cc) in zip(evs, evs[1:]):
            if cu - pu < _Q144_GAP_US and pc != cc:
                edges.add((min(pc, cc), max(pc, cc)))
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    tri = {}
    for x, nbrs in adj.items():
        c = 0
        for a, b in combinations(sorted(nbrs), 2):
            if (min(a, b), max(a, b)) in edges:
                c += 1
        tri[x] = c
    want = {}
    for x, nbrs in adj.items():
        d = len(nbrs)
        cc = tri[x] * 2_000_000 // (d * (d - 1)) if d >= 2 else 0
        want[x] = (d, tri[x], cc)
    assert got == want and len(got) > 30
    assert sum(t for _, t, _ in got.values()) > 0   # triangles exist


def test_q164_hausdorff_matches_python(spark):
    """Python recompute of the blocked symmetric Hausdorff distances,
    plus the metric sanity H(A,B) >= directed halves >= 0.  The home
    grid is the ADAPTIVE width max(4, ceil(sqrt(users/8))) (r5 scale
    fix), recomputed here in scalar math."""
    import math

    from geowave_spark.queries import QUERIES
    from geowave_spark.table import geo

    sf_dir = "/root/testdata/sf0.01"
    got = {(r["u1"], r["u2"]): r["hausdorff_sq"]
           for r in QUERIES["q164_track_hausdorff"][0](spark, sf_dir)
           .collect()}

    pdf = spark.sql(
        f"SELECT user_id, event_id, "
        f"cast(floor(({geo.lon_sql('event_id')}) * 1000000) as bigint) AS x, "
        f"cast(floor(({geo.lat_sql('event_id')}) * 1000000) as bigint) AS y "
        f"FROM parquet.`{sf_dir}/events.parquet`").toPandas()
    first_pdf = spark.sql(
        f"SELECT user_id, {geo.lon_sql('min_eid')} AS lon0, "
        f"{geo.lat_sql('min_eid')} AS lat0 "
        f"FROM (SELECT user_id, min(event_id) AS min_eid "
        f"      FROM parquet.`{sf_dir}/events.parquet` GROUP BY 1)"
    ).toPandas()
    n_grid = max(4, math.ceil(math.sqrt(len(first_pdf) / 8.0)))
    home = {
        u: math.floor((la + 90.0) / 180.0 * n_grid) * n_grid
        + math.floor((lo + 180.0) / 360.0 * n_grid)
        for u, lo, la in zip(first_pdf["user_id"], first_pdf["lon0"],
                             first_pdf["lat0"])
    }
    pts = {}
    for uid, grp in pdf.groupby("user_id"):
        pts[uid] = list(zip(grp["x"].tolist(), grp["y"].tolist()))

    def directed(a, b):
        return max(min((ax - bx) ** 2 + (ay - by) ** 2 for bx, by in b)
                   for ax, ay in a)

    want = {}
    users = sorted(pts)
    for i, u1 in enumerate(users):
        for u2 in users[i + 1:]:
            if home[u1] == home[u2]:
                want[(u1, u2)] = max(directed(pts[u1], pts[u2]),
                                     directed(pts[u2], pts[u1]))
    assert got == want and len(got) > 100
    assert all(v > 0 for v in got.values())


def test_q165_trimmed_mean_matches_python(spark):
    """Python recompute of the deterministic 10%-trimmed means."""
    import math

    from geowave_spark.queries import QUERIES

    sf_dir = "/root/testdata/sf0.01"
    got = {r["event_type"]: (r["n_kept"], r["trimmed_mean_cents"])
           for r in QUERIES["q165_trimmed_mean"][0](spark, sf_dir)
           .collect()}

    pdf = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "event_id", "value").toPandas()
    want = {}
    for t, grp in pdf.groupby("event_type"):
        vals = sorted((int(math.floor(v * 100)), int(e))
                      for e, v in zip(grp["event_id"], grp["value"]))
        k = len(vals) // 10
        kept = [c for c, _ in vals[k:len(vals) - k]]
        want[t] = (len(kept), sum(kept) // len(kept))
    assert got == want and len(got) == 5
    # trimming is real: fewer kept than total
    assert all(n < len(pdf[pdf["event_type"] == t])
               for t, (n, _) in want.items())


def test_q167_mad_matches_python(spark):
    """Python recompute of the exact per-group MAD (both medians with
    deterministic tie order)."""
    import math

    from geowave_spark.queries import QUERIES

    sf_dir = "/root/testdata/sf0.01"
    got = {r["event_type"]: (r["median_cents"], r["mad_cents"])
           for r in QUERIES["q167_mad"][0](spark, sf_dir).collect()}

    pdf = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "event_id", "value").toPandas()
    want = {}
    for t, grp in pdf.groupby("event_type"):
        vals = sorted((int(math.floor(v * 100)), int(e))
                      for e, v in zip(grp["event_id"], grp["value"]))
        med = vals[(len(vals) + 1) // 2 - 1][0]
        devs = sorted((abs(c - med), e) for c, e in vals)
        want[t] = (med, devs[(len(devs) + 1) // 2 - 1][0])
    assert got == want and len(got) == 5
    assert all(mad > 0 for _, mad in got.values())


def test_q168_movement_rose_matches_python(spark):
    """Python recompute of the rational 8-sector direction histogram."""
    from collections import Counter

    from geowave_spark.queries import QUERIES, _Q144_GAP_US, _Q144_RES
    from geowave_spark.table import geo

    sf_dir = "/root/testdata/sf0.01"
    got = {(r["from_cell"], r["sector"]): r["n_moves"]
           for r in QUERIES["q168_movement_rose"][0](spark, sf_dir)
           .collect()}

    pdf = spark.sql(
        f"SELECT user_id, unix_micros(cast(ts as timestamp)) AS us, "
        f"cast(floor(({geo.lon_sql('event_id')}) * 1000000) as bigint) AS x, "
        f"cast(floor(({geo.lat_sql('event_id')}) * 1000000) as bigint) AS y, "
        f"{geo.rowmajor_cell_sql(geo.lon_sql('event_id'), geo.lat_sql('event_id'), _Q144_RES)} AS cell "
        f"FROM parquet.`{sf_dir}/events.parquet`").toPandas()

    def sector(dx, dy):
        if 5 * abs(dy) <= 2 * abs(dx):
            return 0 if dx > 0 else 4
        if 5 * abs(dx) <= 2 * abs(dy):
            return 2 if dy > 0 else 6
        if dx > 0 and dy > 0:
            return 1
        if dx < 0 and dy > 0:
            return 3
        if dx < 0 and dy < 0:
            return 5
        return 7

    want = Counter()
    for _, grp in pdf.groupby("user_id"):
        evs = sorted(zip(grp["us"], grp["x"], grp["y"], grp["cell"]))
        for (pu, px_, py_, pc), (cu, cx, cy, _) in zip(evs, evs[1:]):
            dx, dy = int(cx - px_), int(cy - py_)
            if cu - pu < _Q144_GAP_US and (dx or dy):
                want[(int(pc), sector(dx, dy))] += 1
    assert got == dict(want) and len(got) > 100
    assert len({s for _, s in got}) == 8    # all sectors occur


def test_q169_knox_matches_python(spark):
    """Brute-force python pair counting of the Knox statistic."""
    from geowave_spark.queries import QUERIES, _Q144_RES, _Q169_TBIN_US
    from geowave_spark.table import geo

    sf_dir = "/root/testdata/sf0.01"
    row = QUERIES["q169_knox_statistic"][0](spark, sf_dir).collect()[0]

    pdf = spark.sql(
        f"SELECT unix_micros(cast(ts as timestamp)) AS us, "
        f"{geo.rowmajor_cell_sql(geo.lon_sql('event_id'), geo.lat_sql('event_id'), _Q144_RES)} AS cell "
        f"FROM parquet.`{sf_dir}/events.parquet`").toPandas()
    us = pdf["us"].to_numpy()
    cell = pdf["cell"].to_numpy()
    n = len(us)
    import numpy as np
    n_pairs = n * (n - 1) // 2
    # space: per-cell C(k,2)
    from collections import Counter
    cc = Counter(cell.tolist())
    n_space = sum(k * (k - 1) // 2 for k in cc.values())
    # time: sort and two-pointer count of |dt| < 1h
    s = np.sort(us)
    n_time = 0
    j = 0
    for i in range(n):
        while s[i] - s[j] >= _Q169_TBIN_US:
            j += 1
        n_time += i - j
    # both: per cell, pairwise
    n_both = 0
    by_cell = {}
    for u, c in zip(us.tolist(), cell.tolist()):
        by_cell.setdefault(c, []).append(u)
    for vals in by_cell.values():
        vals.sort()
        jj = 0
        for i in range(len(vals)):
            while vals[i] - vals[jj] >= _Q169_TBIN_US:
                jj += 1
            n_both += i - jj
    assert (row["n_pairs"], row["n_space"], row["n_time"], row["n_both"]) \
        == (n_pairs, n_space, n_time, n_both)
    assert n_both > 0 and n_space > n_both and n_time > n_both


def test_q170_colocation_matches_python(spark):
    """Python recompute of the participation indices."""
    from collections import Counter

    from geowave_spark.queries import QUERIES, _Q153_RES
    from geowave_spark.table import geo

    sf_dir = "/root/testdata/sf0.01"
    got = {(r["type_a"], r["type_b"]): (r["n_part"], r["pi_micro"])
           for r in QUERIES["q170_colocation_index"][0](spark, sf_dir)
           .collect()}

    pdf = spark.sql(
        f"SELECT event_id, event_type, "
        f"{geo.rowmajor_cell_sql(geo.lon_sql('event_id'), geo.lat_sql('event_id'), _Q153_RES)} AS cell "
        f"FROM parquet.`{sf_dir}/events.parquet`").toPandas()
    types_in_cell = {}
    tot = Counter()
    for t, c in zip(pdf["event_type"], pdf["cell"]):
        types_in_cell.setdefault(int(c), set()).add(t)
        tot[t] += 1
    part = Counter()
    for t, c in zip(pdf["event_type"], pdf["cell"]):
        for other in types_in_cell[int(c)]:
            if other != t:
                part[(t, other)] += 1
    want = {k: (v, v * 1_000_000 // tot[k[0]]) for k, v in part.items()}
    assert got == want and len(got) == 20
    assert all(0 < p <= 1_000_000 for _, p in got.values())


def test_q171_mobility_profile_matches_python(spark):
    """Python recompute of rog^2, cell diversity, and top-cell share."""
    from collections import Counter

    from geowave_spark.queries import QUERIES, _Q153_RES
    from geowave_spark.table import geo

    sf_dir = "/root/testdata/sf0.01"
    got = {r["user_id"]: (r["n_points"], r["rog2_micro2"], r["n_cells"],
                          r["top_share_micro"])
           for r in QUERIES["q171_mobility_profile"][0](spark, sf_dir)
           .collect()}

    pdf = spark.sql(
        f"SELECT user_id, "
        f"cast(floor(({geo.lon_sql('event_id')}) * 1000000) as bigint) AS x, "
        f"cast(floor(({geo.lat_sql('event_id')}) * 1000000) as bigint) AS y, "
        f"{geo.rowmajor_cell_sql(geo.lon_sql('event_id'), geo.lat_sql('event_id'), _Q153_RES)} AS cell "
        f"FROM parquet.`{sf_dir}/events.parquet`").toPandas()
    want = {}
    for uid, grp in pdf.groupby("user_id"):
        xs, ys = grp["x"].tolist(), grp["y"].tolist()
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        cx = (abs(sx) // n) * (1 if sx >= 0 else -1)
        cy = (abs(sy) // n) * (1 if sy >= 0 else -1)
        rog2 = sum((x - cx) ** 2 + (y - cy) ** 2 for x, y in zip(xs, ys)) // n
        cc = Counter(grp["cell"].tolist())
        want[uid] = (n, rog2, len(cc), max(cc.values()) * 1_000_000 // n)
    assert got == want and len(got) == 150
    assert all(r > 0 for _, r, _, _ in got.values())


def test_q172_interevent_moments_match_python(spark):
    """Python recompute of gap count, trunc mean (seconds), exact M2."""
    from geowave_spark.queries import QUERIES

    sf_dir = "/root/testdata/sf0.01"
    got = {r["user_id"]: (r["n_gaps"], r["mean_dt_s"], r["m2"])
           for r in QUERIES["q172_interevent_moments"][0](spark, sf_dir)
           .collect()}

    pdf = spark.sql(
        f"SELECT user_id, unix_micros(cast(ts as timestamp)) AS us "
        f"FROM parquet.`{sf_dir}/events.parquet`").toPandas()
    want = {}
    for uid, grp in pdf.groupby("user_id"):
        ts = sorted(grp["us"].tolist())
        gaps = [(b - a) // 1_000_000 for a, b in zip(ts, ts[1:])]
        if not gaps:
            continue
        mean = sum(gaps) // len(gaps)
        want[uid] = (len(gaps), mean, sum((g - mean) ** 2 for g in gaps))
    assert got == want and len(got) == 150
    # bursty: variance is comparable to the mean squared somewhere
    assert any(m2 > n * mean * mean // 2
               for n, mean, m2 in got.values())


def test_q173_weekly_retention_matches_python(spark):
    """Python recompute of the weekly retention cohorts."""
    from geowave_spark.queries import QUERIES

    sf_dir = "/root/testdata/sf0.01"
    got = {r["week"]: (r["n_active"], r["n_retained"], r["retention_micro"])
           for r in QUERIES["q173_weekly_retention"][0](spark, sf_dir)
           .collect()}

    pdf = spark.sql(
        f"SELECT DISTINCT user_id, "
        f"unix_micros(cast(ts as timestamp)) div 604800000000 AS week "
        f"FROM parquet.`{sf_dir}/events.parquet`").toPandas()
    weeks = {}
    for uid, wk in zip(pdf["user_id"], pdf["week"]):
        weeks.setdefault(int(wk), set()).add(int(uid))
    want = {}
    for wk, users in weeks.items():
        nxt = weeks.get(wk + 1, set())
        r = len(users & nxt)
        want[wk] = (len(users), r, r * 1_000_000 // len(users))
    assert got == want and len(got) >= 4
    # the synthetic users are long-lived: mid-range weeks retain highly
    assert max(r for _, _, r in got.values()) > 900_000


def test_q176_home_work_matches_python(spark):
    """Python recompute of the band-conditional visit argmax."""
    from collections import Counter

    from geowave_spark.queries import QUERIES, _Q153_RES
    from geowave_spark.table import geo

    sf_dir = "/root/testdata/sf0.01"
    got = {(r["user_id"], r["band"]): (r["anchor_cell"], r["visits"])
           for r in QUERIES["q176_home_work_anchors"][0](spark, sf_dir)
           .collect()}

    pdf = spark.sql(
        f"SELECT user_id, "
        f"(unix_micros(cast(ts as timestamp)) div 3600000000) % 24 AS hour, "
        f"{geo.rowmajor_cell_sql(geo.lon_sql('event_id'), geo.lat_sql('event_id'), _Q153_RES)} AS cell "
        f"FROM parquet.`{sf_dir}/events.parquet`").toPandas()
    counts = Counter()
    for uid, hr, cell in zip(pdf["user_id"], pdf["hour"], pdf["cell"]):
        band = ("night" if hr >= 22 or hr < 6
                else "day" if 8 <= hr < 18 else None)
        if band:
            counts[(int(uid), band, int(cell))] += 1
    best = {}
    for (uid, band, cell), v in counts.items():
        k = (uid, band)
        cur = best.get(k)
        if cur is None or (v, -cell) > (cur[1], -cur[0]):
            best[k] = (cell, v)
    assert got == best and len(got) == 300
    # anchors differ between night and day for at least some users
    assert any(got[(u, "night")][0] != got[(u, "day")][0]
               for u, b in got if b == "night" and (u, "day") in got)


def test_q178_funnel_matches_python(spark):
    """Python recompute of the strictly ordered 3-stage funnel."""
    from geowave_spark.queries import QUERIES

    sf_dir = "/root/testdata/sf0.01"
    got = {r["stage"]: (r["n_users"], r["conv_micro"])
           for r in QUERIES["q178_conversion_funnel"][0](spark, sf_dir)
           .collect()}

    pdf = spark.sql(
        f"SELECT user_id, event_type, unix_micros(cast(ts as timestamp)) "
        f"AS us FROM parquet.`{sf_dir}/events.parquet`").toPandas()
    n1 = n2 = n3 = 0
    for _, grp in pdf.groupby("user_id"):
        views = grp[grp["event_type"] == "view"]["us"]
        if views.empty:
            continue
        n1 += 1
        t1 = views.min()
        clicks = grp[(grp["event_type"] == "click") & (grp["us"] > t1)
                     & (grp["us"] < t1 + 86_400_000_000)]["us"]
        if clicks.empty:
            continue
        n2 += 1
        t2 = clicks.min()
        buys = grp[(grp["event_type"] == "purchase") & (grp["us"] > t2)
                   & (grp["us"] < t2 + 86_400_000_000)]["us"]
        if buys.empty:
            continue
        n3 += 1
    want = {1: (n1, 1_000_000), 2: (n2, n2 * 1_000_000 // n1),
            3: (n3, n3 * 1_000_000 // n1)}
    assert got == want
    assert n1 > n3 > 0   # the funnel actually narrows


def test_q177_hourly_seasonality_matches_python(spark):
    """Python recompute of the per-type hour histogram + peak argmax."""
    from collections import Counter

    from geowave_spark.queries import QUERIES

    sf_dir = "/root/testdata/sf0.01"
    got = {(r["event_type"], r["hour"]):
           (r["n"], r["peak_hour"], r["peak_share_micro"])
           for r in QUERIES["q177_hourly_seasonality"][0](spark, sf_dir)
           .collect()}

    pdf = spark.sql(
        f"SELECT event_type, "
        f"(unix_micros(cast(ts as timestamp)) div 3600000000) % 24 AS hour "
        f"FROM parquet.`{sf_dir}/events.parquet`").toPandas()
    h = Counter(zip(pdf["event_type"], pdf["hour"]))
    want = {}
    for t in pdf["event_type"].unique():
        hours = {hr: n for (tt, hr), n in h.items() if tt == t}
        tot = sum(hours.values())
        peak = max(hours, key=lambda hr: (hours[hr], -hr))
        for hr, n in hours.items():
            want[(t, int(hr))] = (n, int(peak),
                                  hours[peak] * 1_000_000 // tot)
    assert got == want and len(got) == 120   # 5 types x 24 hours


def test_q180_nearest_facility_matches_python(spark):
    """Python recompute of the argmin assignment and catchment stats."""
    from geowave_spark.queries import QUERIES
    from geowave_spark.table import geo

    sf_dir = "/root/testdata/sf0.01"
    got = {r["fac_id"]: (r["n_assigned"], r["sum_d2_centi"],
                         r["max_d2_centi"])
           for r in QUERIES["q180_nearest_facility"][0](spark, sf_dir)
           .collect()}

    ev = spark.sql(
        f"SELECT cast(floor(({geo.lon_sql('event_id')}) * 100) as bigint) AS x, "
        f"cast(floor(({geo.lat_sql('event_id')}) * 100) as bigint) AS y "
        f"FROM parquet.`{sf_dir}/events.parquet`").toPandas()
    fac = spark.sql(
        f"SELECT s_suppkey AS fac_id, "
        f"cast(floor(({geo.lon_sql('s_suppkey')}) * 100) as bigint) AS fx, "
        f"cast(floor(({geo.lat_sql('s_suppkey')}) * 100) as bigint) AS fy "
        f"FROM parquet.`{sf_dir}/supplier.parquet` WHERE s_suppkey < 8"
    ).collect()
    sites = [(int(r["fac_id"]), int(r["fx"]), int(r["fy"])) for r in fac]
    agg = {}
    for x, y in zip(ev["x"].tolist(), ev["y"].tolist()):
        d2, fid = min(((x - fx) ** 2 + (y - fy) ** 2, i)
                      for i, fx, fy in sites)
        n, s, m = agg.get(fid, (0, 0, 0))
        agg[fid] = (n + 1, s + d2, max(m, d2))
    assert got == agg and len(got) == 8
    # the partition is non-trivial: every facility catches something
    assert min(n for n, _, _ in got.values()) > 0


def test_q181_benford_matches_python(spark):
    """Python recompute of the first-significant-digit counts."""
    import math
    from collections import Counter

    from geowave_spark.queries import QUERIES

    sf_dir = "/root/testdata/sf0.01"
    got = {(r["event_type"], r["digit"]): r["n"]
           for r in QUERIES["q181_benford_audit"][0](spark, sf_dir)
           .collect()}

    pdf = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "value").toPandas()
    want = Counter()
    for t, v in zip(pdf["event_type"], pdf["value"]):
        if v <= 0:
            continue
        c = int(math.floor(v * 100))
        want[(t, int(str(c)[0]))] += 1
    assert got == dict(want) and len(got) == 45   # 5 types x digits 1-9
    # the synthetic values span ~3 decades, so they approximate Benford:
    # digit 1 dominates digit 9 corpus-wide (1-share measured ~0.28
    # vs the log10(2) = 0.301 ideal)
    ones = sum(n for (t, d), n in got.items() if d == 1)
    nines = sum(n for (t, d), n in got.items() if d == 9)
    assert ones > 2 * nines


def test_q182_cusum_matches_python(spark):
    """Python recompute of the scaled CUSUM maxima and changepoint days."""
    from collections import Counter

    from geowave_spark.queries import QUERIES

    sf_dir = "/root/testdata/sf0.01"
    got = {r["event_type"]: (r["cp_day"], r["max_cusum_scaled"])
           for r in QUERIES["q182_cusum_changepoint"][0](spark, sf_dir)
           .collect()}

    pdf = spark.sql(
        f"SELECT event_type, unix_micros(cast(ts as timestamp)) "
        f"div 86400000000 AS day FROM parquet.`{sf_dir}/events.parquet`"
    ).toPandas()
    daily = Counter(zip(pdf["event_type"], pdf["day"]))
    want = {}
    for t in pdf["event_type"].unique():
        series = sorted((int(d), n) for (tt, d), n in daily.items()
                        if tt == t)
        dd = len(series)
        tot = sum(n for _, n in series)
        cum = 0
        best = None
        for d, x in series:
            cum += x * dd - tot
            key = (abs(cum), -d)
            if best is None or key > best[0]:
                best = (key, d, abs(cum))
        want[t] = (best[1], best[2])
    assert got == want and len(got) == 5
    assert all(m > 0 for _, m in got.values())


def test_q184_collocations_match_python(spark):
    """Python recompute of the top-50 frequent-word pair lifts."""
    from collections import Counter
    from itertools import combinations

    from geowave_spark.queries_text import TEXT_QUERIES

    sf_dir = "/root/testdata/sf0.01"
    got = [(r["w1"], r["w2"], r["n_co"], r["lift_micro"])
           for r in TEXT_QUERIES["q184_collocations"][0](spark, sf_dir)
           .collect()]

    pdf = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "text").toPandas()
    docs = [set(t.split(" ")) for t in pdf["text"]]
    df = Counter()
    for d in docs:
        for w in d:
            df[w] += 1
    freq = {w for w, c in df.items() if c >= 25}
    nd = len(docs)
    co = Counter()
    for d in docs:
        for a, b in combinations(sorted(d & freq), 2):
            co[(a, b)] += 1
    pairs = [(a, b, n, n * nd * 1_000_000 // (df[a] * df[b]))
             for (a, b), n in co.items() if n >= 15]
    pairs.sort(key=lambda p: (-p[3], p[0], p[1]))
    want = pairs[:50]
    assert got == want and len(got) == 50
    # a genuinely associated pair exists (lift > 1)
    assert got[0][3] > 1_000_000


def test_q216_hex_binning_matches_numpy(spark):
    """Numpy recompute of the axial projection + cube rounding."""
    import numpy as np

    from geowave_spark.queries import QUERIES
    from geowave_spark.table import geo

    sf_dir = "/root/testdata/sf0.01"
    got = {(r["hq"], r["hr"]): (r["n"], r["val_cents"])
           for r in QUERIES["q216_hex_binning"][0](spark, sf_dir).collect()}

    pdf = spark.sql(
        f"SELECT {geo.lon_sql('event_id')} AS lon, "
        f"{geo.lat_sql('event_id')} AS lat, value "
        f"FROM parquet.`{sf_dir}/events.parquet`").toPandas()
    lon, lat = pdf["lon"].to_numpy(), pdf["lat"].to_numpy()
    s = 5.0
    qf = (np.sqrt(3.0) / 3.0 * lon - lat / 3.0) / s
    rf = (2.0 / 3.0 * lat) / s
    sf = -qf - rf
    rq, rr, rs = (np.floor(v + 0.5) for v in (qf, rf, sf))
    dq, dr, ds = np.abs(rq - qf), np.abs(rr - rf), np.abs(rs - sf)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = ~fix_q & (dr > ds)
    hq = np.where(fix_q, -rr - rs, rq).astype(np.int64)
    hr = np.where(fix_r, -rq - rs, rr).astype(np.int64)
    cents = np.round(pdf["value"].to_numpy() * 100).astype(np.int64)
    want = {}
    for q, r, c in zip(hq, hr, cents):
        n, tot = want.get((q, r), (0, 0))
        want[(q, r)] = (n + 1, tot + int(c))
    assert got == want


def test_q217_polyline_decimation_matches_pandas(spark):
    """Pandas recompute of the perpendicular-offset keep mask per track."""
    from geowave_spark.queries import QUERIES
    from geowave_spark.table import geo

    sf_dir = "/root/testdata/sf0.01"
    got = {r["user_id"]: (r["n_pts"], r["n_kept"], r["kept_id_sum"])
           for r in QUERIES["q217_polyline_decimation"][0](spark, sf_dir)
           .collect()}

    pdf = spark.sql(
        f"SELECT user_id, event_id, {geo.lon_sql('event_id')} AS lon, "
        f"{geo.lat_sql('event_id')} AS lat "
        f"FROM parquet.`{sf_dir}/events.parquet` WHERE user_id % 20 = 0"
    ).toPandas().sort_values(["user_id", "event_id"])
    tol2 = 400.0
    want = {}
    for uid, g in pdf.groupby("user_id"):
        xs, ys, ids = (g["lon"].to_list(), g["lat"].to_list(),
                       g["event_id"].to_list())
        kept = 0
        ksum = 0
        for i in range(len(xs)):
            if i == 0 or i == len(xs) - 1:
                keep = True
            else:
                px, py, nx, ny = xs[i - 1], ys[i - 1], xs[i + 1], ys[i + 1]
                chord2 = (nx - px) ** 2 + (ny - py) ** 2
                if chord2 == 0.0:
                    keep = ((xs[i] - px) ** 2 + (ys[i] - py) ** 2) > tol2
                else:
                    cross = ((nx - px) * (ys[i] - py)
                             - (ny - py) * (xs[i] - px))
                    keep = cross * cross > tol2 * chord2
            if keep:
                kept += 1
                ksum += int(ids[i])
        want[uid] = (len(xs), kept, ksum)
    assert got == want and len(got) >= 5


def test_q218_convoy_pairs_matches_python(spark):
    """Python recompute of the co-binning join + consecutive-run scan."""
    from geowave_spark.queries import QUERIES
    from geowave_spark.table import geo

    sf_dir = "/root/testdata/sf0.01"
    got = {(r["u1"], r["u2"]): (r["n_cobins"], r["max_run"])
           for r in QUERIES["q218_convoy_pairs"][0](spark, sf_dir).collect()}

    lon = geo.lon_sql("((user_id % 7) * 1000003 + tbin * 7919)")
    lat = geo.lat_sql("((user_id % 7) * 999983 + tbin * 104729)")
    cell = geo.rowmajor_cell_sql(
        "(" + lon + " + (event_id % 997) / 1e4 - 0.0498e0)",
        "(" + lat + " + (event_id % 991) / 1e4 - 0.0495e0)", 9)
    pdf = spark.sql(
        f"SELECT user_id, tbin, min(event_id * 1048576 + {cell}) % 1048576"
        f" AS cell FROM (SELECT user_id, event_id, "
        f"unix_micros(cast(ts as timestamp)) div 86400000000 AS tbin "
        f"FROM parquet.`{sf_dir}/events.parquet`) GROUP BY user_id, tbin"
    ).toPandas()
    bucket = {}
    for u, t, c in pdf.itertuples(index=False):
        bucket.setdefault((t, c), []).append(u)
    cobins = {}
    for (t, _c), us in bucket.items():
        us = sorted(us)
        for i in range(len(us)):
            for j in range(i + 1, len(us)):
                cobins.setdefault((us[i], us[j]), set()).add(t)
    want = {}
    for pair, ts in cobins.items():
        ts = sorted(ts)
        best = run = 1
        for a, b in zip(ts, ts[1:]):
            run = run + 1 if b == a + 1 else 1
            best = max(best, run)
        if best >= 3:
            want[pair] = (len(ts), best)
    assert got == want and len(got) > 100


def test_q219_ppjoin_matches_python_and_prunes(spark):
    """Python recompute of shingle-set Jaccard >= 0.5 pairs, plus proof
    the prefix filter prunes: candidate pairs << brute-force co-shingle
    pairs on the same corpus."""
    from geowave_spark.functions import sqlgen as G
    from geowave_spark.queries import QUERIES
    from geowave_spark.table.views import register_views

    sf_dir = "/root/testdata/sf0.01"
    got = {(r["d1"], r["d2"]): (r["ninter"], r["jac_micro"])
           for r in QUERIES["q219_ppjoin_similarity"][0](spark, sf_dir)
           .collect()}

    d = G.SPARK
    register_views(spark, sf_dir)
    sh = G.shingles3_from(d, "v")
    pdf = spark.sql(
        f"SELECT doc_id, {G.wordvals(d)} AS v FROM documents"
        f" WHERE size(split(text, ' ')) >= 3").toPandas()
    import math
    sets = {}
    for _, row in pdf.iterrows():
        v = row["v"]
        sets[row["doc_id"]] = {tuple(v[i:i + 3]) for i in range(len(v) - 2)}
    ids = sorted(sets)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a]) + len(sets[b]) - inter
            if inter and 2 * inter >= union:
                want[(a, b)] = (inter, math.floor(1e6 * inter / union))
    assert got == want and len(got) >= 10

    # pruning: candidates from prefixes vs all co-shingle pairs
    head = spark.sql(f"""
WITH wv AS (SELECT doc_id, {G.wordvals(d)} AS v FROM documents),
tok AS (SELECT DISTINCT doc_id, {d.explode(sh)} AS w
        FROM wv WHERE {d.size('v')} >= 3),
sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
df AS (SELECT w, count(*) AS dfreq FROM tok GROUP BY w),
ranked AS (
  SELECT t.doc_id, t.w, s.n,
         row_number() OVER (PARTITION BY t.doc_id
                            ORDER BY f.dfreq, t.w) AS r
  FROM tok t JOIN df f ON f.w = t.w JOIN sz s ON s.doc_id = t.doc_id
),
pref AS (SELECT doc_id, w FROM ranked
         WHERE r <= n - ((n + 1) div 2) + 1)
SELECT
  (SELECT count(*) FROM (SELECT DISTINCT a.doc_id, b.doc_id
     FROM pref a JOIN pref b ON b.w = a.w AND a.doc_id < b.doc_id) c)
    AS n_cand,
  (SELECT count(*) FROM (SELECT DISTINCT a.doc_id, b.doc_id
     FROM tok a JOIN tok b ON b.w = a.w AND a.doc_id < b.doc_id) c)
    AS n_brute
""").collect()[0]
    assert head["n_cand"] < head["n_brute"] / 10
    assert head["n_cand"] >= len(want)


def test_q220_polygon_measures_matches_python(spark):
    """Shoelace area/centroid recomputed from the hex vertex table."""
    import math

    from geowave_spark.queries import QUERIES
    from geowave_spark.table import geo

    sf_dir = "/root/testdata/sf0.01"
    got = {r["aid"]: (r["area_micro"], r["cx_micro"], r["cy_micro"])
           for r in QUERIES["q220_polygon_measures"][0](spark, sf_dir)
           .collect()}

    pdf = spark.sql(geo.hex_a_sql()).toPandas()
    want = {}
    for _, row in pdf.iterrows():
        vs = [(row[f"vx{k}"], row[f"vy{k}"]) for k in range(6)]
        a2 = cxs = cys = 0.0
        for k in range(6):
            x0, y0 = vs[k]
            x1, y1 = vs[(k + 1) % 6]
            cr = x0 * y1 - x1 * y0
            a2 += cr
            cxs += (x0 + x1) * cr
            cys += (y0 + y1) * cr
        want[row["aid"]] = (math.floor(abs(a2) / 2.0 * 1e6),
                            math.floor(cxs / (3.0 * a2) * 1e6),
                            math.floor(cys / (3.0 * a2) * 1e6))
    assert got == want and len(got) == 500


def test_q222_power_iteration_matches_numpy(spark):
    """Integer power iteration recomputed from the raw embeddings."""
    import numpy as np

    from geowave_spark.queries import QUERIES

    sf_dir = "/root/testdata/sf0.01"
    got = [r["v_fix"] for r in
           QUERIES["q222_power_iteration"][0](spark, sf_dir).collect()]

    pdf = spark.sql(
        f"SELECT embedding FROM parquet.`{sf_dir}/embeddings.parquet`"
    ).toPandas()
    vals = np.floor(np.stack(
        [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
    ) * 1e6).astype(np.int64)
    mean = np.sum(vals, axis=0) // vals.shape[0]
    cent = vals - mean[None, :]
    cov = cent.T @ cent

    def tdiv(x, n):
        return np.where(x >= 0, x // n, -((-x) // n))

    c = tdiv(cov, 1_000_000)
    v = np.full(64, 1000, dtype=np.int64)
    for _ in range(4):
        w = c @ v
        ma = max(int(np.abs(w).max()), 1)
        v = tdiv(w * 1000, ma)
    assert got == v.tolist()


def test_q223_random_projection_matches_numpy(spark):
    """Integer JL sign projection recomputed from raw embeddings."""
    import numpy as np

    from geowave_spark.queries import QUERIES

    sf_dir = "/root/testdata/sf0.01"
    got = {(r["vec_id"], r["out_dim"]): r["p_micro"] for r in
           QUERIES["q223_random_projection"][0](spark, sf_dir).collect()}

    pdf = spark.sql(
        f"SELECT vec_id, embedding FROM "
        f"parquet.`{sf_dir}/embeddings.parquet`").toPandas()
    j = np.arange(1, 65, dtype=np.int64)[:, None]
    k = np.arange(1, 17, dtype=np.int64)[None, :]
    sgn = np.where((j * 2654435761 + k * 40503) % 2 == 0, 1, -1)
    want = {}
    for vid, emb in zip(pdf["vec_id"], pdf["embedding"]):
        v = np.floor(np.asarray(emb, dtype=np.float64) * 1e6
                     ).astype(np.int64)
        p = v @ sgn
        for kk in range(16):
            want[(vid, kk + 1)] = int(p[kk])
    assert got == want and len(got) == 500 * 16


def test_q224_phrase_search_matches_python(spark):
    """Python recompute: top trigram + per-doc phrase match positions."""
    from collections import Counter

    from geowave_spark.queries import QUERIES

    sf_dir = "/root/testdata/sf0.01"
    res = QUERIES["q224_phrase_search"][0](spark, sf_dir).collect()
    got = {r["doc_id"]: (r["n_matches"], r["first_pos"]) for r in res}
    phrase = (res[0]["w1"], res[0]["w2"], res[0]["w3"])

    pdf = spark.sql(
        f"SELECT doc_id, text FROM parquet.`{sf_dir}/documents.parquet`"
    ).toPandas()
    tris = Counter()
    docs = {}
    for did, txt in zip(pdf["doc_id"], pdf["text"]):
        ws = txt.split(" ")
        docs[did] = ws
        for i in range(len(ws) - 2):
            tris[(ws[i], ws[i + 1], ws[i + 2])] += 1
    # deterministic tie-break: max count, then lexicographically smallest
    top_n = max(tris.values())
    best = min(t for t, n in tris.items() if n == top_n)
    assert phrase == best
    want = {}
    for did, ws in docs.items():
        hits = [i + 1 for i in range(len(ws) - 2)
                if (ws[i], ws[i + 1], ws[i + 2]) == best]
        if hits:
            want[did] = (len(hits), hits[0])
    assert got == want


def test_q225_palette_matches_numpy(spark):
    """Whole-image numpy recompute of the quantized top-3 colors."""
    import numpy as np

    from geowave_spark.queries import QUERIES
    from geowave_spark.raster import codec
    from geowave_spark.table import images as img_tab

    sf_dir = "/root/testdata/sf0.01"
    got = {(r["image_id"], r["rnk"]): (r["qcolor"], r["cnt"]) for r in
           QUERIES["q225_palette_extraction"][0](spark, sf_dir).collect()}

    docs = spark.sql(
        f"SELECT doc_id, text FROM parquet.`{sf_dir}/documents.parquet` "
        f"WHERE doc_id % 5 = 3").toPandas()
    pdf = img_tab.gen_images_pdf(docs)
    want = {}
    for _, row in pdf.iterrows():
        rgb = codec.decode(row["bytes"], row["fmt"]).astype(np.int64)
        q = ((rgb[:, :, 0] // 64) * 16 + (rgb[:, :, 1] // 64) * 4
             + rgb[:, :, 2] // 64)
        h = np.bincount(q.ravel(), minlength=64)
        order = sorted((int(b) for b in np.flatnonzero(h)),
                       key=lambda b: (-int(h[b]), b))
        for rnk, b in enumerate(order[:3], start=1):
            want[(row["image_id"], rnk)] = (b, int(h[b]))
    assert got == want and len(got) == 300


def test_q226_shortest_paths_matches_python(spark):
    """Python Bellman-Ford (4 rounds) over the recomputed OD graph."""
    import math

    from geowave_spark.queries import QUERIES
    from geowave_spark.table import geo

    sf_dir = "/root/testdata/sf0.01"
    got = {r["node"]: r["dist_micro"] for r in
           QUERIES["q226_shortest_paths"][0](spark, sf_dir).collect()}

    cell = geo.rowmajor_cell_sql(geo.lon_sql("event_id"),
                                 geo.lat_sql("event_id"), 3)
    pdf = spark.sql(
        f"SELECT user_id, unix_micros(cast(ts as timestamp)) AS us, "
        f"{cell} AS cell FROM parquet.`{sf_dir}/events.parquet`"
    ).toPandas().sort_values(["user_id", "us"])
    edges = set()
    for _, g in pdf.groupby("user_id"):
        cs, us = g["cell"].to_list(), g["us"].to_list()
        for i in range(1, len(cs)):
            if us[i] - us[i - 1] < 86_400_000_000 and cs[i] != cs[i - 1]:
                edges.add((min(cs[i - 1], cs[i]), max(cs[i - 1], cs[i])))

    def center(node):
        gx, gy = node % 8, node // 8
        return ((gx + 0.5) / 8 * 360.0 - 180.0,
                (gy + 0.5) / 8 * 180.0 - 90.0)

    ed = {}
    for u, v in edges:
        ux, uy = center(u)
        vx, vy = center(v)
        w = math.floor(math.sqrt((ux - vx) ** 2 + (uy - vy) ** 2) * 1e6)
        ed.setdefault(u, []).append((v, w))
        ed.setdefault(v, []).append((u, w))
    src = min(u for u, _ in edges)
    dist = {src: 0}
    for _ in range(4):
        nd = dict(dist)
        for u, d in dist.items():
            for v, w in ed.get(u, []):
                if d + w < nd.get(v, float("inf")):
                    nd[v] = d + w
        dist = nd
    assert got == dist and len(got) >= 10


def test_q227_gini_matches_python(spark):
    """Python recompute of the per-cell Simpson/Gini diversity."""
    from collections import Counter

    from geowave_spark.queries import QUERIES
    from geowave_spark.table import geo

    sf_dir = "/root/testdata/sf0.01"
    got = {r["cell"]: (r["n_events"], r["n_types"], r["gini_micro"])
           for r in QUERIES["q227_gini_diversity"][0](spark, sf_dir)
           .collect()}

    cell = geo.rowmajor_cell_sql(geo.lon_sql("event_id"),
                                 geo.lat_sql("event_id"), 5)
    pdf = spark.sql(
        f"SELECT {cell} AS cell, event_type FROM "
        f"parquet.`{sf_dir}/events.parquet`").toPandas()
    cnt = Counter(zip(pdf["cell"], pdf["event_type"]))
    per_cell = {}
    for (c, t), n in cnt.items():
        per_cell.setdefault(c, {})[t] = n
    want = {}
    for c, types in per_cell.items():
        nn = sum(types.values())
        sq = sum(n * n for n in types.values())
        want[c] = (nn, len(types), (nn * nn - sq) * 1_000_000 // (nn * nn))
    assert got == want


def test_q228_keyframes_match_numpy(spark):
    """Whole-clip numpy recompute: scenes + sharpest-frame argmax."""
    import numpy as np

    from geowave_spark.multimodal import av
    from geowave_spark.queries import QUERIES
    from geowave_spark.table import images as img_tab

    sf_dir = "/root/testdata/sf0.01"
    got = {(r["media_id"], r["scene_id"]):
           (r["n_frames"], r["key_idx"], r["key_grad_sse"])
           for r in QUERIES["q228_keyframe_selection"][0](spark, sf_dir)
           .collect()}

    docs = spark.sql(
        f"SELECT doc_id FROM parquet.`{sf_dir}/documents.parquet` "
        f"WHERE doc_id % 2 = 0").toPandas()
    want = {}
    for did in docs["doc_id"]:
        vid = av.gen_video(int(did))
        mid = "med" + str(int(did)).zfill(10)
        stats = []
        for f in range(vid.shape[0]):
            g = img_tab.gray(vid[f]).astype(np.int64)
            d = np.diff(g, axis=1)
            stats.append((int(g.sum()) // (g.shape[0] * g.shape[1]),
                          int((d * d).sum())))
        scene = 0
        scenes = {}
        for f, (ml, gs) in enumerate(stats):
            if f > 0 and abs(ml - stats[f - 1][0]) >= 8:
                scene += 1
            scenes.setdefault(scene, []).append((f, gs))
        for sid, frames in scenes.items():
            kf, kg = max(frames, key=lambda t: (t[1], -t[0]))
            want[(mid, sid)] = (len(frames), kf, kg)
    assert got == want and len(got) > 300


def test_q230_integral_image_matches_numpy(spark):
    """SAT corner values recomputed from whole-image cumsums."""
    import numpy as np

    from geowave_spark.queries import QUERIES
    from geowave_spark.raster import codec
    from geowave_spark.table import images as img_tab

    sf_dir = "/root/testdata/sf0.01"
    got = {(r["image_id"], r["ty"], r["tx"]): r["sat"] for r in
           QUERIES["q230_integral_image"][0](spark, sf_dir).collect()}

    docs = spark.sql(
        f"SELECT doc_id, text FROM parquet.`{sf_dir}/documents.parquet` "
        f"WHERE doc_id % 5 = 3").toPandas()
    pdf = img_tab.gen_images_pdf(docs)
    want = {}
    for _, row in pdf.iterrows():
        g = img_tab.gray(codec.decode(row["bytes"], row["fmt"])
                         ).astype(np.int64)
        sat = g.cumsum(axis=0).cumsum(axis=1)
        h, w = g.shape
        for ty in range((h + 15) // 16):
            for tx in range((w + 15) // 16):
                y1 = min((ty + 1) * 16, h) - 1
                x1 = min((tx + 1) * 16, w) - 1
                want[(row["image_id"], ty, tx)] = int(sat[y1, x1])
    assert got == want and len(got) > 1000


def test_q231_label_propagation_matches_python(spark):
    """Python recompute of 4 synchronous label-propagation rounds."""
    from collections import Counter

    from geowave_spark.queries import QUERIES
    from geowave_spark.table import geo

    sf_dir = "/root/testdata/sf0.01"
    got = {r["community"]: (r["n_members"], r["min_node"]) for r in
           QUERIES["q231_label_propagation"][0](spark, sf_dir).collect()}

    cell = geo.rowmajor_cell_sql(geo.lon_sql("event_id"),
                                 geo.lat_sql("event_id"), 5)
    pdf = spark.sql(
        f"SELECT user_id, unix_micros(cast(ts as timestamp)) AS us, "
        f"{cell} AS cell FROM parquet.`{sf_dir}/events.parquet`"
    ).toPandas().sort_values(["user_id", "us"])
    edges = set()
    for _, g in pdf.groupby("user_id"):
        cs, us = g["cell"].to_list(), g["us"].to_list()
        for i in range(1, len(cs)):
            if us[i] - us[i - 1] < 86_400_000_000 and cs[i] != cs[i - 1]:
                edges.add((min(cs[i - 1], cs[i]), max(cs[i - 1], cs[i])))
    nbrs = {}
    for u, v in edges:
        nbrs.setdefault(u, []).append(v)
        nbrs.setdefault(v, []).append(u)
    lbl = {n: n for n in nbrs}
    for _ in range(4):
        new = {}
        for n in nbrs:
            c = Counter(lbl[m] for m in nbrs[n])
            best = max(c.items(), key=lambda kv: (kv[1], -kv[0]))
            new[n] = best[0]
        lbl = new
    agg = {}
    for n, l in lbl.items():
        cnt, mn = agg.get(l, (0, n))
        agg[l] = (cnt + 1, min(mn, n))
    assert got == agg and len(got) >= 5


def test_q232_q233_match_python(spark):
    """Python recompute of keyword geo rates and ntile boundaries."""
    from geowave_spark.queries import QUERIES
    from geowave_spark.table import geo, images as img_tab

    sf_dir = "/root/testdata/sf0.01"
    got232 = {r["cell"]: (r["n_images"], r["n_hits"], r["rate_micro"])
              for r in QUERIES["q232_keyword_geo_density"][0](spark, sf_dir)
              .collect()}
    fp = img_tab.footprint_sql()
    cell = geo.rowmajor_cell_sql(
        f"(({fp['lon0']}) + ({fp['lon1']})) / 2",
        f"(({fp['lat0']}) + ({fp['lat1']})) / 2", 4)
    pdf = spark.sql(
        f"SELECT {cell} AS cell, text FROM "
        f"parquet.`{sf_dir}/documents.parquet`").toPandas()
    want = {}
    for c, t in zip(pdf["cell"], pdf["text"]):
        n, h = want.get(c, (0, 0))
        want[c] = (n + 1, h + (1 if "stream" in t else 0))
    want = {c: (n, h, h * 1_000_000 // n) for c, (n, h) in want.items()}
    assert got232 == want
    assert any(0 < h < n for c, (n, h, _r) in
               [(k, v) for k, v in want.items()])

    got233 = {(r["event_type"], r["bucket"]):
              (r["n"], r["lo_cents"], r["hi_cents"])
              for r in QUERIES["q233_split_boundaries"][0](spark, sf_dir)
              .collect()}
    epdf = spark.sql(
        f"SELECT event_type, event_id, "
        f"cast(round(value * 100) as bigint) AS cents "
        f"FROM parquet.`{sf_dir}/events.parquet`").toPandas()
    want233 = {}
    for t, g in epdf.groupby("event_type"):
        rows = sorted(zip(g["cents"], g["event_id"]))
        n = len(rows)
        base, rem = divmod(n, 10)
        start = 0
        for b in range(1, 11):
            size = base + (1 if b <= rem else 0)
            chunk = rows[start:start + size]
            start += size
            cents = [c for c, _ in chunk]
            want233[(t, b)] = (len(chunk), min(cents), max(cents))
    assert got233 == want233 and len(got233) == 50


def test_q234_acf_matches_python(spark):
    """Python recompute of the integer lag-1 autocorrelation."""
    from collections import Counter

    from geowave_spark.queries import QUERIES
    from geowave_spark.table import geo

    sf_dir = "/root/testdata/sf0.01"
    got = {r["cell"]: (r["n_days"], r["acf1_micro"]) for r in
           QUERIES["q234_lag1_autocorrelation"][0](spark, sf_dir)
           .collect()}

    cell = geo.rowmajor_cell_sql(geo.lon_sql("event_id"),
                                 geo.lat_sql("event_id"), 4)
    pdf = spark.sql(
        f"SELECT {cell} AS cell, "
        f"unix_micros(cast(ts as timestamp)) div 86400000000 AS day "
        f"FROM parquet.`{sf_dir}/events.parquet`").toPandas()
    cnt = Counter(zip(pdf["cell"], pdf["day"]))
    series = {}
    for (c, d), n in cnt.items():
        series.setdefault(c, {})[d] = n
    want = {}
    for c, sd in series.items():
        days = sorted(sd)
        if len(days) < 10:
            continue
        xs = [sd[d] for d in days]
        m = sum(xs) * 1000 // len(xs)
        dv = [x * 1000 - m for x in xs]
        num = sum(dv[i] * dv[i + 1] for i in range(len(dv) - 1))
        den = sum(v * v for v in dv)
        if den == 0:
            continue
        r = (num * 1_000_000) // den if num >= 0 else -((-num * 1_000_000) // den)
        want[c] = (len(days), r)
    assert got == want and len(got) > 100


def test_q235_geometric_median_matches_python(spark):
    """Python recompute of 3 integer Weiszfeld rounds."""
    import math

    from geowave_spark.queries import QUERIES
    from geowave_spark.table import geo

    sf_dir = "/root/testdata/sf0.01"
    got = {r["event_type"]: (r["cx_micro"], r["cy_micro"]) for r in
           QUERIES["q235_geometric_median"][0](spark, sf_dir).collect()}

    pdf = spark.sql(
        f"SELECT event_type, "
        f"cast(floor(({geo.lon_sql('event_id')}) * 1000000) as bigint) AS xm, "
        f"cast(floor(({geo.lat_sql('event_id')}) * 1000000) as bigint) AS ym "
        f"FROM parquet.`{sf_dir}/events.parquet`").toPandas()
    want = {}
    for t, g in pdf.groupby("event_type"):
        def tdiv(a, b):
            return a // b if a >= 0 else -((-a) // b)

        xs, ys = g["xm"].to_list(), g["ym"].to_list()
        cx, cy = tdiv(sum(xs), len(xs)), tdiv(sum(ys), len(ys))
        for _ in range(3):
            sw = swx = swy = 0
            for x, y in zip(xs, ys):
                d = max(math.floor(math.sqrt(float((x - cx) ** 2
                                                   + (y - cy) ** 2))), 1)
                w = 10 ** 12 // d
                sw += w
                swx += w * x
                swy += w * y
            cx, cy = tdiv(swx, sw), tdiv(swy, sw)
        want[t] = (cx, cy)
    assert got == want and len(got) == 5


def test_q236_ks_matches_python(spark):
    """Python recompute of the exact two-sample KS statistic."""
    from geowave_spark.queries import QUERIES

    sf_dir = "/root/testdata/sf0.01"
    got = {r["event_type"]: (r["ks_micro"], r["n_first"], r["n_second"])
           for r in QUERIES["q236_ks_drift"][0](spark, sf_dir).collect()}

    pdf = spark.sql(
        f"SELECT event_type, "
        f"CASE WHEN unix_micros(cast(ts as timestamp)) div 86400000000 "
        f"< 19737 THEN 0 ELSE 1 END AS half, "
        f"cast(round(value * 100) as bigint) AS cents "
        f"FROM parquet.`{sf_dir}/events.parquet`").toPandas()
    want = {}
    for t, g in pdf.groupby("event_type"):
        a = sorted(g[g["half"] == 0]["cents"])
        b = sorted(g[g["half"] == 1]["cents"])
        ta, tb = len(a), len(b)
        vals = sorted(set(a) | set(b))
        import bisect
        best = 0
        for v in vals:
            ca = bisect.bisect_right(a, v)
            cb = bisect.bisect_right(b, v)
            best = max(best, abs(ca * tb - cb * ta) * 1_000_000 // (ta * tb))
        want[t] = (best, ta, tb)
    assert got == want and len(got) == 5


def test_q238_truncation_audit_matches_numpy(spark):
    """Numpy recompute of full-vs-16-dim cosine on the pair sample."""
    import math

    import numpy as np

    from geowave_spark.queries import QUERIES

    sf_dir = "/root/testdata/sf0.01"
    got = {(r["v1"], r["v2"]): (r["cos64_micro"], r["cos16_micro"],
                                r["gap_micro"])
           for r in QUERIES["q238_truncation_audit"][0](spark, sf_dir)
           .collect()}

    pdf = spark.sql(
        f"SELECT vec_id, embedding FROM "
        f"parquet.`{sf_dir}/embeddings.parquet`").toPandas()
    vecs = {int(v): np.asarray(e, dtype=np.float64)
            for v, e in zip(pdf["vec_id"], pdf["embedding"])}

    def cos_micro(a, b):
        # sequential fold order matches the SQL fold
        dd = na = nb = 0.0
        for x, y in zip(a, b):
            dd += x * y
        for x in a:
            na += x * x
        for y in b:
            nb += y * y
        return math.floor(1e6 * dd / (math.sqrt(na) * math.sqrt(nb)))

    want = {}
    for v in sorted(vecs):
        if v % 5 == 0 and v + 1 in vecs:
            a, b = vecs[v], vecs[v + 1]
            c64 = cos_micro(a, b)
            c16 = cos_micro(a[:16], b[:16])
            want[(v, v + 1)] = (c64, c16, abs(c64 - c16))
    assert got == want and len(got) == 100


def test_q239_block_transform_matches_numpy(spark):
    """Whole-image numpy recompute of the integer 4x4 transform bands."""
    import numpy as np

    from geowave_spark.queries import QUERIES
    from geowave_spark.queries_raster import _Q239_C
    from geowave_spark.raster import codec
    from geowave_spark.table import images as img_tab

    sf_dir = "/root/testdata/sf0.01"
    got = {r["image_id"]: (r["dc_energy"], r["low_energy"],
                           r["high_energy"], r["hf_share_micro"])
           for r in QUERIES["q239_block_transform_energy"][0](
               spark, sf_dir).collect()}

    docs = spark.sql(
        f"SELECT doc_id, text FROM parquet.`{sf_dir}/documents.parquet` "
        f"WHERE doc_id % 5 = 3").toPandas()
    pdf = img_tab.gen_images_pdf(docs)
    C = np.array(_Q239_C, dtype=np.int64)
    want = {}
    for _, row in pdf.iterrows():
        g = img_tab.gray(codec.decode(row["bytes"], row["fmt"])
                         ).astype(np.int64)
        h, w = g.shape
        bh, bw = h // 4, w // 4
        blk = g[:bh * 4, :bw * 4].reshape(bh, 4, bw, 4).transpose(0, 2, 1, 3)
        y = np.einsum("ui,abik,vk->abuv", C, blk, C)
        e = y * y
        u = np.arange(4)[:, None]
        v = np.arange(4)[None, :]
        dc = int((e * (u + v == 0)).sum())
        low = int((e * ((u + v >= 1) & (u + v <= 2))).sum())
        hi = int((e * (u + v >= 3)).sum())
        want[row["image_id"]] = (
            dc, low, hi, hi * 1_000_000 // max(low + hi, 1))
    assert got == want and len(got) == 100


def test_q241_record_linkage_quality(spark):
    """Full python recompute of blocking + scoring, plus ground-truth
    audit: zero false links, and every missed clean record must have
    BOTH blocking fields corrupted (the multi-pass recall contract)."""
    from geowave_spark.queries import QUERIES

    sf_dir = "/root/testdata/sf0.01"
    rows = QUERIES["q241_record_linkage"][0](spark, sf_dir).collect()
    links = {(r["akey"], r["bkey"]): r["score"] for r in rows}
    assert all(a == b for a, b in links)  # zero false links

    pdf = spark.sql(
        f"SELECT c_custkey AS k, c_name AS name, c_nationkey AS nat, "
        f"c_mktsegment AS seg, cast(round(c_acctbal * 100) as bigint) "
        f"AS bal FROM parquet.`{sf_dir}/customer.parquet`").toPandas()
    a = {int(r.k): (r.name, int(r.nat), r.seg, int(r.bal))
         for r in pdf.itertuples()}
    b = {}
    for k, (name, nat, seg, bal) in a.items():
        if k % 5 >= 4:
            continue
        b[k] = (name + "x" if k % 13 == 0 else name,
                (nat + 1) % 25 if k % 7 == 0 else nat,
                "CORRUPTED" if k % 11 == 0 else seg,
                bal + 1 if k % 3 == 0 else bal)
    blocks1 = {}
    blocks2 = {}
    for k, (_n, nat, seg, bal) in a.items():
        blocks1.setdefault(nat, ([], []))[0].append(k)
        blocks2.setdefault((seg, bal // 10000), ([], []))[0].append(k)
    for k, (_n, nat, seg, bal) in b.items():
        blocks1.setdefault(nat, ([], []))[1].append(k)
        blocks2.setdefault((seg, bal // 10000), ([], []))[1].append(k)
    cand = set()
    for blocks in (blocks1, blocks2):
        for aks, bks in blocks.values():
            cand.update((ak, bk) for ak in aks for bk in bks)
    want = {}
    for ak, bk in cand:
        an, anat, aseg, abal = a[ak]
        bn, bnat, bseg, bbal = b[bk]
        score = ((24 if an == bn else -8)
                 + (10 if abs(abal - bbal) <= 1 else -5)
                 + (3 if aseg == bseg else -2))
        if score >= 25:
            want[(ak, bk)] = score
    assert links == want and len(links) > len(b) * 0.85
    # every missed clean record failed BOTH blocking passes
    missed = [k for k in b if k % 13 != 0 and (k, k) not in links]
    for k in missed:
        assert a[k][1] != b[k][1]  # nation corrupted
        assert (a[k][2], a[k][3] // 10000) != (b[k][2], b[k][3] // 10000)


def test_q242_discrete_hazard_matches_python(spark):
    """Python recompute of the life-table risk sets and hazards."""
    from geowave_spark.queries import QUERIES

    sf_dir = "/root/testdata/sf0.01"
    got = {r["day"]: (r["n_risk"], r["n_events"], r["hazard_micro"])
           for r in QUERIES["q242_discrete_hazard"][0](spark, sf_dir)
           .collect()}

    pdf = spark.sql(
        f"SELECT user_id, event_type, "
        f"unix_micros(cast(ts as timestamp)) AS us "
        f"FROM parquet.`{sf_dir}/events.parquet`").toPandas()
    end = int(pdf["us"].max())
    t0 = pdf[pdf["event_type"] == "view"].groupby("user_id")["us"].min()
    durs = []
    for uid, start in t0.items():
        pu = pdf[(pdf["user_id"] == uid) & (pdf["event_type"] == "purchase")
                 & (pdf["us"] > start)]["us"]
        if len(pu):
            durs.append(((int(pu.min()) - int(start)) // 86_400_000_000, 1))
        else:
            durs.append(((end - int(start)) // 86_400_000_000, 0))
    want = {}
    for d in range(30):
        n_risk = sum(1 for dd, _c in durs if dd >= d)
        n_ev = sum(1 for dd, c in durs if dd == d and c == 1)
        if n_risk > 0:
            want[d] = (n_risk, n_ev, n_ev * 1_000_000 // n_risk)
    assert got == want and len(got) >= 10


def test_q243_tfidf_keywords_match_python(spark):
    """Python recompute of the integer TF-IDF top-3 terms per doc."""
    from collections import Counter

    from geowave_spark.queries import QUERIES

    sf_dir = "/root/testdata/sf0.01"
    got = {(r["doc_id"], r["rnk"]): (r["term"], r["score_micro"])
           for r in QUERIES["q243_tfidf_keywords"][0](spark, sf_dir)
           .collect()}

    pdf = spark.sql(
        f"SELECT doc_id, text FROM parquet.`{sf_dir}/documents.parquet`"
    ).toPandas()
    n = len(pdf)
    tfs = {}
    df = Counter()
    for did, txt in zip(pdf["doc_id"], pdf["text"]):
        tf = Counter(txt.split(" "))
        tfs[did] = tf
        df.update(tf.keys())
    want = {}
    for did, tf in tfs.items():
        scored = sorted(
            ((-(t * (2 * n - 2 * df[w] + 1) * 1_000_000 // (2 * df[w] + 1)),
              w) for w, t in tf.items()))
        for rnk, (neg, w) in enumerate(scored[:3], start=1):
            want[(did, rnk)] = (w, -neg)
    assert got == want and len(got) == 3 * n


def test_q244_active_users_match_python(spark):
    """Python recompute of DAU / rolling WAU / new / cumulative users."""
    from geowave_spark.queries import QUERIES

    sf_dir = "/root/testdata/sf0.01"
    got = {r["day"]: (r["dau"], r["wau"], r["new_users"], r["cum_users"])
           for r in QUERIES["q244_active_user_curves"][0](spark, sf_dir)
           .collect()}

    pdf = spark.sql(
        f"SELECT DISTINCT user_id, "
        f"unix_micros(cast(ts as timestamp)) div 86400000000 AS day "
        f"FROM parquet.`{sf_dir}/events.parquet`").toPandas()
    act = set(zip(pdf["user_id"], pdf["day"]))
    days = sorted({d for _u, d in act})
    first = {}
    for u, d in act:
        first[u] = min(first.get(u, d), d)
    want = {}
    cum = 0
    for d in days:
        dau = sum(1 for _u, dd in act if dd == d)
        wau = len({u for u, dd in act if d - 6 <= dd <= d})
        new = sum(1 for u, f in first.items() if f == d)
        cum += new
        want[d] = (dau, wau, new, cum)
    assert got == want and len(got) == 30


def test_q246_kcenter_matches_numpy(spark):
    """Numpy recompute of the greedy farthest-point traversal."""
    import numpy as np

    from geowave_spark.queries import QUERIES

    sf_dir = "/root/testdata/sf0.01"
    got = [(r["round"], r["vec_id"], r["radius"]) for r in
           QUERIES["q246_kcenter_coreset"][0](spark, sf_dir).collect()]

    pdf = spark.sql(
        f"SELECT vec_id, embedding FROM "
        f"parquet.`{sf_dir}/embeddings.parquet`").toPandas()
    ids = pdf["vec_id"].to_numpy()
    iv = np.floor(np.stack([np.asarray(v, dtype=np.float64)
                            for v in pdf["embedding"]]) * 1e6
                  ).astype(np.int64)
    order = np.argsort(ids)
    ids, iv = ids[order], iv[order]
    centers = [0]
    want = [(0, int(ids[0]), 0)]
    dmin = ((iv - iv[0]) ** 2).sum(axis=1)
    for k in range(1, 5):
        enc = dmin * 1024 + (1023 - ids)
        best = int(enc.max())
        vid, rad = 1023 - best % 1024, best // 1024
        want.append((k, int(vid), int(rad)))
        ci = int(np.where(ids == vid)[0][0])
        dmin = np.minimum(dmin, ((iv - iv[ci]) ** 2).sum(axis=1))
    assert got == want


def test_q247_contract_audit_matches_python(spark):
    """Pandas recompute of every expectation; the referential checks
    must count real orphans (or prove there are none)."""
    from geowave_spark.queries import QUERIES

    sf_dir = "/root/testdata/sf0.01"
    got = {r["check_name"]: (r["n_checked"], r["n_violations"]) for r in
           QUERIES["q247_data_contract_audit"][0](spark, sf_dir)
           .collect()}

    t = {n: spark.read.parquet(f"{sf_dir}/{n}.parquet").toPandas()
         for n in ("orders", "customer", "lineitem", "events", "part")}
    custs = set(t["customer"]["c_custkey"])
    okeys = set(t["orders"]["o_orderkey"])
    ev = t["events"]
    import pandas as pd
    want = {
        "ref_orders_custkey": (
            len(t["orders"]),
            int((~t["orders"]["o_custkey"].isin(custs)).sum())),
        "range_lineitem_qty": (
            len(t["lineitem"]),
            int(((t["lineitem"]["l_quantity"] < 1)
                 | (t["lineitem"]["l_quantity"] > 50)).sum())),
        "null_events_value": (len(ev), int(ev["value"].isna().sum())),
        "fresh_events_ts": (
            len(ev),
            int(((ev["ts"] < pd.Timestamp("2024-01-01"))
                 | (ev["ts"] >= pd.Timestamp("2024-02-01"))).sum())),
        "unique_part_key": (
            len(t["part"]),
            len(t["part"]) - t["part"]["p_partkey"].nunique()),
        "ref_lineitem_orderkey": (
            len(t["lineitem"]),
            int((~t["lineitem"]["l_orderkey"].isin(okeys)).sum())),
    }
    assert got == want and len(got) == 6


def test_q248_peak_burst_matches_python(spark):
    """Python recompute of the exact sliding-window peak per user."""
    from collections import Counter

    from geowave_spark.queries import QUERIES

    sf_dir = "/root/testdata/sf0.01"
    got = {r["peak_1h"]: r["n_users"] for r in
           QUERIES["q248_peak_burst"][0](spark, sf_dir).collect()}

    pdf = spark.sql(
        f"SELECT user_id, unix_micros(cast(ts as timestamp)) AS us "
        f"FROM parquet.`{sf_dir}/events.parquet`").toPandas()
    import bisect
    peaks = Counter()
    for _uid, g in pdf.groupby("user_id"):
        us = sorted(g["us"])
        peak = max(bisect.bisect_left(us, t + 3_600_000_000)
                   - i for i, t in enumerate(us))
        peaks[peak] += 1
    assert got == dict(peaks) and sum(got.values()) == 150


def test_q258_recall_monotone_and_numpy_exact(spark, sf_dir):
    """Recall must be non-decreasing in nprobe, and the nprobe=1 hit set
    recomputed with a numpy brute-force IVF mirror."""
    import duckdb
    import numpy as np

    from geowave_spark.queries_text import TEXT_QUERIES

    pdf = TEXT_QUERIES["q258_ivf_recall_curve"][0](spark, sf_dir).toPandas()
    assert list(pdf["nprobe"]) == [1, 2, 4]
    assert (pdf["recall_milli"].diff().dropna() >= 0).all()
    emb = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).df()
    v = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    vid = emb["vec_id"].to_numpy()
    nv = np.sqrt((v * v).sum(axis=1))
    sim = np.floor(1e6 * (v @ v.T) / np.outer(nv, nv)).astype(np.int64)
    cent_idx = np.argsort(vid)[:16]
    # assignment: max micro-cosine to centroid, ties to lowest cent_id
    a_enc = sim[:, cent_idx] * 16 - np.arange(16)
    assign = a_enc.argmax(axis=1)
    qmask = vid % 50 == 0
    hits = 0
    for qi in np.where(qmask)[0]:
        s = sim[qi].copy()
        s[qi] = np.iinfo(np.int64).min
        true_nn = np.argmax(s * 4096 + (4095 - vid))
        cand = (assign == assign[qi])
        cand[qi] = False
        if not cand.any():
            continue
        sc = np.where(cand, s, np.iinfo(np.int64).min)
        approx_nn = np.argmax(sc * 4096 + (4095 - vid))
        hits += int(approx_nn == true_nn)
    assert int(pdf.loc[pdf["nprobe"] == 1, "hits"].iloc[0]) == hits
