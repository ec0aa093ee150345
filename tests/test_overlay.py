"""Independent (pure-python) recomputations for the overlay/DP/shuffle
family (q277-q279) — third implementations, sharing no SQL text with
either engine."""

from __future__ import annotations

import math

import duckdb
import pytest

from geowave_spark.table import geo
from geowave_spark.queries_overlay import (
    _Q277_GROUPS,
    _Q278_HOME_RES,
    _Q278_M,
    _Q279_BATCH,
    _Q279_BITS,
    q277_rect_dissolve,
    q278_track_frechet,
    q279_epoch_shuffle,
)

SF = "/root/testdata/sf0.001"


def _lon(k: int) -> float:
    return ((k % geo.LON_MOD) * geo.LON_MULT % geo.LON_MOD) / 1e6 - 180.0


def _lat(k: int) -> float:
    return ((k % geo.LAT_MOD) * geo.LAT_MULT % geo.LAT_MOD) / 1e6 - 90.0


def _events():
    return duckdb.sql(
        f"SELECT event_id, user_id FROM '{SF}/events.parquet' ORDER BY event_id"
    ).fetchall()


def test_q277_union_area_matches_python_sweep(spark):
    rows = {r[0]: r for r in ((g,) for g in range(_Q277_GROUPS))}
    rects: dict[int, list] = {}
    for (eid, _u) in _events():
        cx = _lon(eid * 13 + (eid % 131) * (eid % 137) + 7)
        cy = _lat(eid * 17 + (eid % 127) * (eid % 139) + 3)
        w = 0.5 + (eid % 37) / 20.0
        h = 0.4 + (eid % 29) / 20.0
        rects.setdefault(eid % _Q277_GROUPS, []).append(
            (cx - w, cy - h, cx + w, cy + h)
        )
    expect = {}
    for g, rs in rects.items():
        edges = sorted({r[0] for r in rs} | {r[2] for r in rs})
        area = 0
        nseg = 0
        nslab = 0
        for xs, xe in zip(edges, edges[1:]):
            ivals = sorted((r[1], r[3]) for r in rs if r[0] <= xs and xe <= r[2])
            if not ivals:
                continue
            nslab += 1
            # merge islands (same strictly-greater rule as the SQL)
            cur_lo, cur_hi = ivals[0]
            islands = []
            for lo, hi in ivals[1:]:
                if lo > cur_hi:
                    islands.append((cur_lo, cur_hi))
                    cur_lo, cur_hi = lo, hi
                else:
                    cur_hi = max(cur_hi, hi)
            islands.append((cur_lo, cur_hi))
            nseg += len(islands)
            for lo, hi in islands:
                area += math.floor(1000000.0 * (xe - xs) * (hi - lo))
        expect[g] = (nseg, nslab, area)

    got = q277_rect_dissolve(spark, SF).collect()
    assert len(got) == len(expect)
    for row in got:
        nseg, nslab, area = expect[row.g]
        assert (row.n_segments, row.n_slabs, row.union_area_micro) == (
            nseg, nslab, area), row.g


def _resample(vals: list[int]) -> list[int]:
    n = len(vals)
    return [vals[(i * (n - 1)) // (_Q278_M - 1)] for i in range(_Q278_M)]


def test_q278_frechet_matches_python_dp(spark):
    tracks: dict[int, list] = {}
    for (eid, uid) in _events():
        x = math.floor(_lon(eid) * 1e6)
        y = math.floor(_lat(eid) * 1e6)
        tracks.setdefault(uid, []).append((x, y))
    resampled = {u: ([p[0] for p in _resample(pts)], [p[1] for p in _resample(pts)])
                 for u, pts in tracks.items()}
    n = 1 << _Q278_HOME_RES
    home = {}
    for u, pts in tracks.items():
        x0, y0 = pts[0]
        home[u] = (math.floor((y0 / 1e6 + 90) / 180 * n) * n
                   + math.floor((x0 / 1e6 + 180) / 360 * n))

    def frechet_sq(u1: int, u2: int) -> int:
        ax, ay = resampled[u1]
        bx, by = resampled[u2]
        m = _Q278_M
        dist = [[(ax[i] - bx[j]) ** 2 + (ay[i] - by[j]) ** 2
                 for j in range(m)] for i in range(m)]
        d = [[0] * m for _ in range(m)]
        for i in range(m):
            for j in range(m):
                if i == 0 and j == 0:
                    d[i][j] = dist[0][0]
                elif i == 0:
                    d[i][j] = max(dist[i][j], d[i][j - 1])
                elif j == 0:
                    d[i][j] = max(dist[i][j], d[i - 1][j])
                else:
                    d[i][j] = max(dist[i][j],
                                  min(d[i - 1][j], d[i][j - 1], d[i - 1][j - 1]))
        return d[m - 1][m - 1]

    expect = {}
    users = sorted(tracks)
    for a in users:
        for b in users:
            if a < b and home[a] == home[b]:
                expect[(a, b)] = frechet_sq(a, b)

    got = q278_track_frechet(spark, SF).collect()
    assert {(r.u1, r.u2): r.frechet_sq for r in got} == expect
    assert len(got) == len(expect) and len(expect) > 0


def test_q278_frechet_at_least_hausdorff_property(spark):
    """Discrete Frechet >= symmetric Hausdorff over the same resampled
    points (every coupling is a constrained matching covering both
    tracks), and >= the pinned endpoint distances (every coupling
    contains (0,0) and (m-1,m-1))."""
    tracks: dict[int, list] = {}
    for (eid, uid) in _events():
        x = math.floor(_lon(eid) * 1e6)
        y = math.floor(_lat(eid) * 1e6)
        tracks.setdefault(uid, []).append((x, y))
    res = {u: list(zip(*[_resample([p[0] for p in pts]),
                         _resample([p[1] for p in pts])]))
           for u, pts in tracks.items()}

    def d2(p, q):
        return (p[0] - q[0]) ** 2 + (p[1] - q[1]) ** 2

    def hausdorff_sq(a, b):
        h_ab = max(min(d2(p, q) for q in b) for p in a)
        h_ba = max(min(d2(p, q) for q in a) for p in b)
        return max(h_ab, h_ba)

    rows = q278_track_frechet(spark, SF).collect()
    assert rows
    for r in rows:
        a, b = res[r.u1], res[r.u2]
        assert r.frechet_sq >= hausdorff_sq(a, b)
        assert r.frechet_sq >= d2(a[0], b[0])
        assert r.frechet_sq >= d2(a[-1], b[-1])


def test_q279_bit_reversal_is_a_bijection():
    b = _Q279_BITS
    seen = {sum(((v >> i) & 1) << (b - 1 - i) for i in range(b))
            for v in range(1 << b)}
    assert seen == set(range(1 << b))


def test_q279_epoch_shuffle_matches_python(spark):
    docs = duckdb.sql(
        f"SELECT doc_id, source FROM '{SF}/documents.parquet'"
    ).fetchall()
    b = _Q279_BITS
    nblk = (len(docs) + (1 << b) - 1) // (1 << b)
    batches: dict[int, list] = {}
    for doc_id, source in docs:
        rev = sum((((doc_id >> i) & 1) << (b - 1 - i)) for i in range(b))
        gpos = rev * nblk + (doc_id >> b)
        batches.setdefault(gpos // _Q279_BATCH, []).append((gpos, doc_id, source))
    expect = {}
    for bid, rows in batches.items():
        rows.sort()
        srcs: dict[str, int] = {}
        for _g, _d, s in rows:
            srcs[s] = srcs.get(s, 0) + 1
        gaps = [abs(d2 - d1) for (_, d1, _s1), (_, d2, _s2) in zip(rows, rows[1:])]
        expect[bid] = (
            len(rows), len(srcs), max(srcs.values()) * 1000000 // len(rows),
            sum(gaps) // len(gaps) if gaps else None,
        )
    got = q279_epoch_shuffle(spark, SF).collect()
    assert {r.batch: (r.n, r.n_sources, r.dom_share_micro, r.mean_gap)
            for r in got} == expect
    # the shuffle must actually mix: every batch holds multiple sources
    assert all(r.n_sources > 1 for r in got)


SF01 = "/root/testdata/sf0.01"  # q280 needs the bigger supplier table for
#                                 a non-empty crossing set


def _events01():
    return duckdb.sql(
        f"SELECT event_id FROM '{SF01}/events.parquet' ORDER BY event_id"
    ).fetchall()


def _seg_a():
    out = []
    for (eid,) in _events01():
        if eid % 3:
            continue
        ax, ay = _lon(eid * 11 + 5), _lat(eid * 23 + 9)
        dx = (1.0 + (eid % 23) / 10.0) * ((eid % 2) * 2 - 1)
        dy = (0.5 + (eid % 17) / 10.0) * ((eid % 3) - 1)
        out.append((eid, math.floor(ax * 1e6), math.floor(ay * 1e6),
                    math.floor((ax + dx) * 1e6), math.floor((ay + dy) * 1e6)))
    return out


def _seg_b():
    rows = duckdb.sql(
        f"SELECT s_suppkey FROM '{SF01}/supplier.parquet'"
    ).fetchall()
    out = []
    for (k,) in rows:
        cx, cy = _lon(k * 41 + 13), _lat(k * 43 + 17)
        dx = (1.0 + (k % 25) / 10.0) * ((k % 2) * 2 - 1)
        dy = (0.5 + (k % 19) / 10.0) * ((k % 3) - 1)
        out.append((k, math.floor(cx * 1e6), math.floor(cy * 1e6),
                    math.floor((cx + dx) * 1e6), math.floor((cy + dy) * 1e6)))
    return out


def _sign(v: int) -> int:
    return (v > 0) - (v < 0)


def test_q280_crossings_match_python_brute_force(spark):
    def crosses(a, b):
        _, ax, ay, bx, by = a
        _, cx, cy, dx, dy = b
        o1 = _sign((bx - ax) * (cy - ay) - (by - ay) * (cx - ax))
        o2 = _sign((bx - ax) * (dy - ay) - (by - ay) * (dx - ax))
        o3 = _sign((dx - cx) * (ay - cy) - (dy - cy) * (ax - cx))
        o4 = _sign((dx - cx) * (by - cy) - (dy - cy) * (bx - cx))
        return o1 * o2 < 0 and o3 * o4 < 0

    expect = sorted(
        (a[0], b[0]) for a in _seg_a() for b in _seg_b() if crosses(a, b)
    )
    from geowave_spark.queries_overlay import q280_segment_crossings

    got = [(r.aid, r.bid)
           for r in q280_segment_crossings(spark, SF01).collect()]
    assert got == expect and len(expect) > 0


def test_q281_areal_interp_conserves_mass_and_matches_python(spark):
    from geowave_spark.queries_overlay import _Q281_RES, q281_areal_interp

    n = 1 << _Q281_RES
    cw, ch = 360.0 / n, 180.0 / n
    zones = duckdb.sql(
        f"SELECT s_suppkey FROM '{SF}/supplier.parquet'"
    ).fetchall()
    expect: dict[int, list] = {}
    for (k,) in zones:
        cx, cy = _lon(k * 7919 + 13), _lat(k * 104729 + 7)
        w, h = 2.0 + (k % 700) / 100.0, 1.0 + (k % 500) / 100.0
        lon0, lat0 = max(cx - w, -180.0), max(cy - h, -90.0)
        lon1, lat1 = min(cx + w, 180.0), min(cy + h, 90.0)
        pop = k % 997 + 1
        zarea = (lon1 - lon0) * (lat1 - lat0)
        gx0 = min(int((lon0 + 180.0) // cw), n - 1)
        gx1 = min(int((lon1 + 180.0) // cw), n - 1)
        gy0 = min(int((lat0 + 90.0) // ch), n - 1)
        gy1 = min(int((lat1 + 90.0) // ch), n - 1)
        for gx in range(gx0, gx1 + 1):
            for gy in range(gy0, gy1 + 1):
                cl, cb = gx * cw - 180.0, gy * ch - 90.0
                inter = ((min(lon1, cl + cw) - max(lon0, cl))
                         * (min(lat1, cb + ch) - max(lat0, cb)))
                if inter > 0:
                    expect.setdefault(gy * n + gx, []).append(
                        math.floor(1000000.0 * pop * inter / zarea))
    got = q281_areal_interp(spark, SF).collect()
    assert {r.cell: (r.n_zones, r.pop_micro) for r in got} == {
        c: (len(v), sum(v)) for c, v in expect.items()}
    # mass conservation: every zone's fractions sum to ~its value
    total = sum(sum(v) for v in expect.values())
    full = sum((k % 997 + 1) for (k,) in zones) * 1000000
    assert abs(total - full) < full * 1e-6 + len(zones) * (1 << 2 * _Q281_RES)


def test_q282_depth_histogram_consistent_with_q277(spark):
    """Sum of depth>=1 areas == q277's union area, per group (the depth
    histogram partitions exactly the dissolved footprint); segment mass
    at depth>=2 matches the overlap the dissolve merged away."""
    union = {r.g: r.union_area_micro
             for r in q277_rect_dissolve(spark, SF).collect()}
    from geowave_spark.queries_overlay import q282_coverage_depth

    rows = q282_coverage_depth(spark, SF).collect()
    per_g: dict[int, int] = {}
    for r in rows:
        per_g[r.g] = per_g.get(r.g, 0) + r.area_micro
    assert set(per_g) == set(union)
    for g, a in per_g.items():
        # same slabs, different island/floor granularity: equal up to one
        # micro-unit per floored term
        assert abs(a - union[g]) <= 4000, (g, a, union[g])
    assert any(r.depth >= 2 for r in rows)


def test_q283_exact_percentiles_match_python_sort(spark):
    """The no-sort histogram formulation must equal the definitional
    sorted-rank answer: least value whose rank >= ceil(q*n)."""
    from geowave_spark.queries_overlay import q283_exact_percentiles

    vals = sorted(
        math.floor(v * 100) for (v,) in duckdb.sql(
            f"SELECT value FROM '{SF}/events.parquet'").fetchall()
    )
    n = len(vals)

    def pct(num, den):
        rank = (n * num + den - 1) // den  # ceil
        return vals[rank - 1]

    expect = {"p50": pct(1, 2), "p90": pct(9, 10), "p99": pct(99, 100)}
    got = {r.p: r.cents for r in q283_exact_percentiles(spark, SF).collect()}
    assert got == expect


def test_q284_uncertainty_join_matches_python(spark):
    from geowave_spark.queries_overlay import q284_uncertainty_join

    pts = []
    for (eid,) in _events01():  # sf0.01: sf0.001's 10 zones match nothing
        if eid % 5:
            continue
        pts.append((eid, math.floor(_lon(eid) * 1e6),
                    math.floor(_lat(eid) * 1e6),
                    50000 + (eid % 17) * 25000))
    zones = []
    for (k,) in duckdb.sql(
            f"SELECT s_suppkey FROM '{SF01}/supplier.parquet'").fetchall():
        cx, cy = _lon(k * 7919 + 13), _lat(k * 104729 + 7)
        w, h = 2.0 + (k % 700) / 100.0, 1.0 + (k % 500) / 100.0
        zones.append((k,
                      math.floor(max(cx - w, -180.0) * 1e6),
                      math.floor(max(cy - h, -90.0) * 1e6),
                      math.floor(min(cx + w, 180.0) * 1e6),
                      math.floor(min(cy + h, 90.0) * 1e6)))
    expect: dict[int, list] = {}
    for rid, zx0, zy0, zx1, zy1 in zones:
        for pid, px, py, r in pts:
            nx = max(zx0, min(px, zx1))
            ny = max(zy0, min(py, zy1))
            if (px - nx) ** 2 + (py - ny) ** 2 <= r * r:
                expect.setdefault(rid, []).append((pid, r))
    got = q284_uncertainty_join(spark, SF01).collect()
    assert {r.rid: (r.n_points, r.min_pid, r.max_r) for r in got} == {
        rid: (len(v), min(p for p, _ in v), max(r for _, r in v))
        for rid, v in expect.items()}
    assert len(got) > 0


def test_q285_decontamination_matches_numpy(spark):
    """Full numpy recomputation of the eval x train cosine screen."""
    import numpy as np

    from geowave_spark.queries import QUERIES

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet' "
        f"ORDER BY vec_id").fetchall()
    ids = np.array([r[0] for r in rows])
    V = np.array([r[1] for r in rows], dtype=np.float64)
    nv = np.sqrt((V * V).sum(axis=1))
    ev = ids % 50 == 17
    expect = {}
    for i in np.where(ev)[0]:
        hits = []
        for j in np.where(~ev)[0]:
            s = math.floor(1e6 * float(V[i] @ V[j]) / (nv[i] * nv[j]))
            if s >= 250000:
                hits.append((ids[j], s))
        if hits:
            best = min((1000000 - s) * 10**10 + t for t, s in hits)
            expect[ids[i]] = (len(hits), max(s for _, s in hits),
                              best % 10**10)
    fn, _sql = QUERIES["q285_embedding_decontamination"]
    got = fn(spark, SF).collect()
    assert {r.eid: (r.n_contaminated, r.max_sim_micro, r.worst_tid)
            for r in got} == expect
    assert len(got) > 0


def test_q286_dwell_matches_python(spark):
    from geowave_spark.queries import QUERIES

    rows = duckdb.sql(
        f"SELECT user_id, event_id, epoch_us(ts) FROM '{SF01}/events.parquet'"
    ).fetchall()
    n = 1 << 2
    pres: dict[tuple, list] = {}
    for uid, eid, tus in rows:
        lon, lat = _lon(eid), _lat(eid)
        # the engine's ceil(c*n)-1 normalization (geo.rowmajor_cell_sql)
        x = min(max(math.ceil((lon + 180.0) / 360.0 * n) - 1, 0), n - 1)
        y = min(max(math.ceil((lat + 90.0) / 180.0 * n) - 1, 0), n - 1)
        cell = y * n + x
        day = tus // 86400000000
        key = (uid, cell, day)
        if key in pres:
            pres[key] = [min(pres[key][0], tus), max(pres[key][1], tus)]
        else:
            pres[key] = [tus, tus]
    expect: dict[tuple, list] = {}
    keys = sorted(pres)
    by_bucket: dict[tuple, list] = {}
    for (uid, cell, day), (t0, t1) in pres.items():
        by_bucket.setdefault((cell, day), []).append((uid, t0, t1))
    for bucket, users in by_bucket.items():
        users.sort()
        for i, (u1, a0, a1) in enumerate(users):
            for u2, b0, b1 in users[i + 1:]:
                ol = min(a1, b1) - max(a0, b0)
                if ol > 0:
                    k = (u1, u2)
                    c, s = expect.get(k, (0, 0))
                    expect[k] = (c + 1, s + ol)
    expect = {k: v for k, v in expect.items() if v[1] >= 3600000000}
    fn, _sql = QUERIES["q286_comovement_dwell"]
    got = fn(spark, SF01).collect()
    assert {(r.u1, r.u2): (r.n_buckets, r.dwell_us) for r in got} == expect
    assert len(got) > 0


def _feistel_rev(i: int, e: int, b: int = 10) -> int:
    h = 1 << (b // 2)
    x = i % (1 << b)
    lo, hi = x % h, x // h
    for r in range(1, 6):
        half = hi if r % 2 == 1 else lo
        f = (((half + e * 40503 + r * 69069) * 2654435761) // 64) % h
        if r % 2 == 1:
            lo = (lo + f) % h
        else:
            hi = (hi + f) % h
    x1 = hi * h + lo
    return sum(((x1 >> j) & 1) << (b - 1 - j) for j in range(b))


def test_q287_feistel_is_bijective_per_epoch():
    from geowave_spark.queries_overlay import _Q287_EPOCHS

    for e in _Q287_EPOCHS:
        assert len({_feistel_rev(i, e) for i in range(1024)}) == 1024


def test_q287_epoch_audit_matches_python(spark):
    from geowave_spark.queries import QUERIES
    from geowave_spark.queries_overlay import _Q279_BATCH, _Q287_EPOCHS

    docs = [d for (d,) in duckdb.sql(
        f"SELECT doc_id FROM '{SF}/documents.parquet'").fetchall()]
    nblk = (len(docs) + 1023) // 1024
    pair_sets = {}
    for e in _Q287_EPOCHS:
        batches: dict[int, list] = {}
        for i in docs:
            g = _feistel_rev(i, e) * nblk + (i >> 10)
            batches.setdefault(g // _Q279_BATCH, []).append(i)
        pairs = set()
        for s in batches.values():
            s.sort()
            for ai in range(len(s)):
                for bi in range(ai + 1, len(s)):
                    pairs.add((s[ai], s[bi]))
        pair_sets[e] = pairs
    expect = {}
    es = list(_Q287_EPOCHS)
    for i, a in enumerate(es):
        for b2 in es[i + 1:]:
            expect[(a, b2)] = (len(pair_sets[a]),
                               len(pair_sets[a] & pair_sets[b2]))
    fn, _sql = QUERIES["q287_epoch_pair_audit"]
    got = fn(spark, SF).collect()
    assert {(r.e1, r.e2): (r.pairs_e1, r.shared_pairs) for r in got} == expect
    # the audit's point: epochs genuinely remix (no full-batch carryover)
    for r in got:
        assert r.shared_pairs < r.pairs_e1


def test_q290_viterbi_matches_python_dp(spark):
    """Independent python Viterbi over the same observations, candidate
    gate, and switch-penalty transition — including an explicit
    full-transition-matrix DP (not the two-term min shortcut the SQL
    uses), so the shortcut's correctness is itself under test."""
    from geowave_spark.queries import QUERIES
    from geowave_spark.queries_mobility import (
        _Q290_K,
        _Q290_P,
        _Q290_R2,
        _Q290_T,
    )

    from geowave_spark.queries_mobility import _Q290_NSEG

    rows = duckdb.sql(
        f"SELECT user_id, event_id FROM '{SF01}/events.parquet' "
        f"ORDER BY user_id, event_id").fetchall()
    obs: dict[int, list] = {}
    for uid, eid in rows:
        if uid % 20 != 0 and len(obs.get(uid, [])) < _Q290_T:
            obs.setdefault(uid, []).append((_lon(eid), _lat(eid)))
    # independent python recompute of the fixed road-network fixture
    # (r4: local segments replace the old global-chord track segments)
    segs = []
    for sid in range(_Q290_NSEG):
        ax, ay = _lon(sid * 7919 + 13), _lat(sid * 104729 + 7)
        dx = ((sid * 53) % 101) / 101.0 * 0.6 - 0.3
        dy = ((sid * 71) % 89) / 89.0 * 0.6 - 0.3
        bx = min(max(ax + dx, -180.0), 180.0)
        by = min(max(ay + dy, -90.0), 90.0)
        segs.append((sid, ax, ay, bx, by))

    def emis(px, py, ax, ay, bx, by):
        len2 = (bx - ax) * (bx - ax) + (by - ay) * (by - ay)
        dot = (px - ax) * (bx - ax) + (py - ay) * (by - ay)
        t = 0.0 if len2 == 0 else min(max(dot / len2, 0.0), 1.0)
        cx, cy = ax + t * (bx - ax), ay + t * (by - ay)
        d2 = (px - cx) * (px - cx) + (py - cy) * (py - cy)
        return d2, math.floor(d2 * 1000000.0)

    expect = {}
    for uid, pts in obs.items():
        if len(pts) < _Q290_T:
            continue
        cands = []
        ok = True
        for (px, py) in pts:
            cs = []
            for (sid, ax, ay, bx, by) in segs:
                d2, e = emis(px, py, ax, ay, bx, by)
                if d2 <= _Q290_R2:
                    cs.append((e, sid))
            if not cs:
                ok = False
                break
            cs.sort()
            cands.append(cs[:_Q290_K])
        if not ok:
            continue
        # full-matrix Viterbi
        score = {sid: e for e, sid in cands[0]}
        for t in range(1, _Q290_T):
            nxt = {}
            for e, sid in cands[t]:
                best = min(ps + (0 if psid == sid else _Q290_P)
                           for psid, ps in score.items())
                nxt[sid] = e + best
            score = nxt
        enc = min(s * 68719476736 + sid for sid, s in score.items())
        expect[uid] = (enc // 68719476736, enc % 68719476736)

    fn, _sql = QUERIES["q290_viterbi_map_matching"]
    got = fn(spark, SF01).collect()
    assert {r.user_id: (r.best_score_micro, r.end_sid)
            for r in got} == expect
    assert len(got) > 0


def test_q292_skyline_matches_python_brute_force(spark):
    from geowave_spark.queries import QUERIES

    rows = duckdb.sql(
        f"SELECT p_partkey, p_retailprice, p_size FROM '{SF}/part.parquet'"
    ).fetchall()
    pts = [(pk, math.floor(pr * 100), int(sz)) for pk, pr, sz in rows]

    def dominated(r):
        return any(
            s[1] <= r[1] and s[2] <= r[2] and (s[1] < r[1] or s[2] < r[2])
            for s in pts if s[0] != r[0]
        )

    expect = sorted(
        ((p, s, pk) for pk, p, s in pts if not dominated((pk, p, s))))
    fn, _sql = QUERIES["q292_skyline"]
    got = [(r.price_c, r.size, r.pk) for r in fn(spark, SF).collect()]
    assert got == expect and len(expect) > 0
    # frontier property: sizes are non-increasing along increasing price
    # (equality only for duplicate points)
    szs = [s for _p, s, _k in expect]
    assert szs == sorted(szs, reverse=True)


def test_q293_gini_matches_python(spark):
    from geowave_spark.queries import QUERIES

    rows = duckdb.sql(
        f"SELECT event_type, event_id, cast(floor(value*100) as bigint) "
        f"FROM '{SF}/events.parquet'").fetchall()
    groups: dict[str, list] = {}
    for et, eid, c in rows:
        groups.setdefault(et, []).append((c, eid))
    expect = {}
    for et, g in groups.items():
        g.sort()
        n, s = len(g), sum(c for c, _ in g)
        s1 = sum((i + 1) * c for i, (c, _) in enumerate(g))
        gini = math.floor(1e6 * (2 * s1 - (n + 1) * s) / (n * s))
        top = sum(c for c, _ in g[n - n // 10:])
        expect[et] = (n, gini, top * 1000000 // s)
    fn, _sql = QUERIES["q293_value_concentration"]
    got = fn(spark, SF).collect()
    assert {r.event_type: (r.n, r.gini_micro, r.top_decile_share_micro)
            for r in got} == expect
    # uniform-ish synthetic values: Gini must sit near 1/2... but pin
    # only the hard invariants: 0 <= G < 1, top-decile share >= 10%
    for _n, gini, top in expect.values():
        assert 0 <= gini < 1_000_000 and top >= 100_000


def test_q294_weighted_sample_matches_python(spark):
    from geowave_spark.queries import QUERIES
    from geowave_spark.queries_overlay import _Q294_K

    rows = duckdb.sql(
        f"SELECT doc_id, source, n_chars FROM '{SF}/documents.parquet'"
    ).fetchall()
    pri = []
    for doc_id, source, n_chars in rows:
        h = (((doc_id * 2654435761) % 4294967296) * 40503 + 7919) % 4294967291
        u = (h + 1) / 4294967292.0
        wt = 1 + n_chars
        pri.append((-math.log(u) / wt, doc_id, source, wt))
    pri.sort()
    sel = pri[:_Q294_K]
    expect: dict[str, list] = {}
    for _p, doc_id, source, wt in sel:
        expect.setdefault(source, []).append((doc_id, wt))
    fn, _sql = QUERIES["q294_weighted_sample"]
    got = fn(spark, SF).collect()
    assert {r.source: (r.n_sel, r.wt_sel, r.min_doc) for r in got} == {
        s: (len(v), sum(w for _d, w in v), min(d for d, _w in v))
        for s, v in expect.items()}
    # heavier rows must be overrepresented relative to uniform: the
    # selected mean weight exceeds the corpus mean
    sel_mean = sum(w for *_x, w in sel) / len(sel)
    all_mean = sum(1 + n for _d, _s, n in rows) / len(rows)
    assert sel_mean > all_mean


def test_q297_spearman_matches_python(spark):
    from geowave_spark.queries import QUERIES

    rows = duckdb.sql(
        f"SELECT event_type, event_id, epoch_us(ts) "
        f"FROM '{SF}/events.parquet'").fetchall()
    groups: dict[str, list] = {}
    for et, eid, tus in rows:
        b = 14
        rev = sum((((eid >> i) & 1) << (b - 1 - i)) for i in range(b))
        groups.setdefault(et, []).append((eid, tus, rev, eid))
    expect = {}
    max_id1 = max(eid for _et, eid, _t in rows) + 1
    for et, g in groups.items():
        g = [(eid, tus, rev * max_id1 + eid) for eid, tus, rev, _e in g]
        n = len(g)
        by_id = sorted(g)
        by_ts = sorted(g, key=lambda r: (r[1], r[0]))
        by_replay = sorted(g, key=lambda r: r[2])
        rank_ts = {r[0]: i + 1 for i, r in enumerate(by_ts)}

        def rho(order):
            s2 = sum((i + 1 - rank_ts[r[0]]) ** 2 for i, r in enumerate(order))
            return math.floor(
                1e6 * (n * (n * n - 1) - 6 * s2) / (n * (n * n - 1)))

        expect[et] = (n, rho(by_id), rho(by_replay))
    fn, _sql = QUERIES["q297_order_correlation"]
    got = fn(spark, SF).collect()
    assert {r.event_type: (r.n, r.spearman_micro, r.spearman_replay_micro)
            for r in got} == expect
    # ordered arrival pins rho exactly 1; the shuffled replay sits far
    # below it (the calibration contrast)
    for _n, r1, r2 in expect.values():
        assert r1 == 1_000_000 and abs(r2) < 500_000


def test_q298_corridor_matches_python_brute_force(spark):
    from geowave_spark.queries import QUERIES
    from geowave_spark.queries_overlay import _Q298_R

    pts = []
    for (eid,) in _events01():
        if eid % 4:
            continue
        pts.append((eid, _lon(eid), _lat(eid)))
    segs = []
    for (k,) in duckdb.sql(
            f"SELECT s_suppkey FROM '{SF01}/supplier.parquet'").fetchall():
        ax, ay = _lon(k * 41 + 13), _lat(k * 43 + 17)
        dx = (1.0 + (k % 25) / 10.0) * ((k % 2) * 2 - 1)
        dy = (0.5 + (k % 19) / 10.0) * ((k % 3) - 1)
        segs.append((k, ax, ay, ax + dx, ay + dy))

    def d2(px, py, ax, ay, bx, by):
        len2 = (bx - ax) ** 2 + (by - ay) ** 2
        dot = (px - ax) * (bx - ax) + (py - ay) * (by - ay)
        t = 0.0 if len2 == 0 else min(max(dot / len2, 0.0), 1.0)
        cx, cy = ax + t * (bx - ax), ay + t * (by - ay)
        return (px - cx) ** 2 + (py - cy) ** 2

    expect: dict[int, list] = {}
    for sid, ax, ay, bx, by in segs:
        for _eid, px, py in pts:
            v = d2(px, py, ax, ay, bx, by)
            if v <= _Q298_R * _Q298_R:
                expect.setdefault(sid, []).append(math.floor(v * 1e6))
    fn, _sql = QUERIES["q298_corridor_join"]
    got = fn(spark, SF01).collect()
    assert {r.sid: (r.n_pts, r.min_d2_micro, r.sum_d2_micro)
            for r in got} == {
        sid: (len(v), min(v), sum(v)) for sid, v in expect.items()}
    assert len(got) > 0


def test_q300_off_network_complements_q298(spark):
    """Anti-corridor + corridor partition the point set exactly: every
    point either hits >= 1 segment (q298's pair set) or appears in
    q300's off-network rollup."""
    from geowave_spark.queries import QUERIES
    from geowave_spark.queries_overlay import _Q298_R

    pts = []
    for (eid,) in _events01():
        if eid % 4:
            continue
        pts.append((eid, _lon(eid), _lat(eid)))
    segs = []
    for (k,) in duckdb.sql(
            f"SELECT s_suppkey FROM '{SF01}/supplier.parquet'").fetchall():
        ax, ay = _lon(k * 41 + 13), _lat(k * 43 + 17)
        dx = (1.0 + (k % 25) / 10.0) * ((k % 2) * 2 - 1)
        dy = (0.5 + (k % 19) / 10.0) * ((k % 3) - 1)
        segs.append((ax, ay, ax + dx, ay + dy))

    def near_any(px, py):
        for ax, ay, bx, by in segs:
            len2 = (bx - ax) ** 2 + (by - ay) ** 2
            dot = (px - ax) * (bx - ax) + (py - ay) * (by - ay)
            t = 0.0 if len2 == 0 else min(max(dot / len2, 0.0), 1.0)
            cx, cy = ax + t * (bx - ax), ay + t * (by - ay)
            if (px - cx) ** 2 + (py - cy) ** 2 <= _Q298_R * _Q298_R:
                return True
        return False

    n = 1 << 3
    expect: dict[int, list] = {}
    for eid, lon, lat in pts:
        if not near_any(lon, lat):
            x = min(max(math.ceil((lon + 180.0) / 360.0 * n) - 1, 0), n - 1)
            y = min(max(math.ceil((lat + 90.0) / 180.0 * n) - 1, 0), n - 1)
            expect.setdefault(y * n + x, []).append(eid)
    fn, _sql = QUERIES["q300_off_network"]
    got = fn(spark, SF01).collect()
    assert {r.cell: (r.n_off, r.min_eid) for r in got} == {
        c: (len(v), min(v)) for c, v in expect.items()}
    # partition property vs q298's hit set
    n_off = sum(r.n_off for r in got)
    n_hit = len({eid for eid, lon, lat in pts if near_any(lon, lat)})
    assert n_off + n_hit == len(pts)


@pytest.mark.parametrize(
    "name", ["q277", "q278", "q279", "q280", "q281", "q282", "q283", "q284",
             "q285", "q286", "q287", "q290", "q291", "q292", "q293", "q294",
             "q295", "q297", "q298", "q300"])
def test_overlay_queries_registered(name):
    from geowave_spark.queries import QUERIES

    full = [k for k in QUERIES if k.startswith(name)]
    assert len(full) == 1 and QUERIES[full[0]][1] is not None


def test_q290_candidate_plan_is_blocked_hash_join(spark):
    """VERDICT r3 item 1: the map-matching candidate join must be the
    cell-cover blocked hash equi-join — never a BroadcastNestedLoopJoin
    or cartesian against the whole road network."""
    from geowave_spark.queries_mobility import _q290_candidates
    from geowave_spark.table.views import register_views

    register_views(spark, SF01)
    cand = _q290_candidates(spark)
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan
    assert cand.limit(1).count() == 1


# ------------------------------------------------- adaptive-knob boundaries


def _synth_sf_dir(tmp_path, n_events: int, n_users: int) -> str:
    """A temp sf-dir: every table copied from sf0.001 except events, which
    is synthesized with exactly ``n_events`` rows over ``n_users`` users —
    the only way to park the input exactly ON an adaptive-knob boundary."""
    import datetime
    import shutil

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / f"sf_ev{n_events}_u{n_users}"
    d.mkdir()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "documents", "embeddings"):
        shutil.copy(f"{SF}/{t}.parquet", d / f"{t}.parquet")
    eid = np.arange(n_events, dtype=np.int64)
    tbl = pa.table({
        "event_id": eid,
        "ts": pa.array(
            [datetime.datetime(2024, 1, 1)] * n_events, pa.timestamp("us")),
        "user_id": (eid % n_users).astype(np.int64),
        "event_type": pa.array(["click"] * n_events),
        "value": (eid % 997).astype(np.float64),
        "props": pa.array(["{}"] * n_events),
    })
    pq.write_table(tbl, d / "events.parquet")
    return str(d)


def _gate_one(spark, tmp_path, qname: str, n_events: int, n_users: int):
    """Run the engine query AND its DuckDB oracle on the synthesized
    dir; return (engine rows, oracle rows) as sorted tuple lists."""
    from geowave_spark.queries import QUERIES

    sf_dir = _synth_sf_dir(tmp_path, n_events, n_users)
    fn, sql = QUERIES[qname]
    got = sorted(map(tuple, fn(spark, sf_dir).toPandas().to_numpy().tolist()))
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    exp = sorted(map(tuple, con.sql(sql).df().to_numpy().tolist()))
    con.close()
    return got, exp


def test_q277_adaptive_groups_boundary(spark, tmp_path):
    """VERDICT r3 item 7 (knob re-tuned r5): the group-count multiplier
    flips 1 -> 2 at exactly 50_000 events (count div 25_000 — the r5
    divisor that bounds per-group COVERAGE mass, not just rect count).
    Both engines must agree ON the boundary and one past it, and the
    knob must actually switch (48 vs 96 distinct groups)."""
    got_lo, exp_lo = _gate_one(spark, tmp_path, "q277_rect_dissolve",
                               49_999, 500)
    assert got_lo == exp_lo
    got_hi, exp_hi = _gate_one(spark, tmp_path, "q277_rect_dissolve",
                               50_000, 500)
    assert got_hi == exp_hi
    assert len(got_lo) == 48 and len(got_hi) == 96


def test_q278_adaptive_grid_boundary(spark, tmp_path):
    """The home-cell blocking scale flips 1 -> 2 at 2001 distinct users.
    Both engines must agree on each side of the boundary, and the finer
    grid must prune pairs (strictly fewer or equal candidates)."""
    got_lo, exp_lo = _gate_one(spark, tmp_path, "q278_track_frechet",
                               20_000, 2_000)
    assert got_lo == exp_lo
    got_hi, exp_hi = _gate_one(spark, tmp_path, "q278_track_frechet",
                               20_010, 2_001)
    assert got_hi == exp_hi
    assert len(got_lo) > 0 and len(got_hi) <= len(got_lo)
