"""Polygon (non-rect) spatial join: tiered engine path vs brute-force crossJoin
oracle inside Spark (`GeoWaveSparkSpatialJoinIT.java:228-255` analog), plus
negative-join (subtractByKey) semantics."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geowave_spark.geom import core as geom
from geowave_spark.join import spatial
from geowave_spark.table import geo


@pytest.fixture(scope="module")
def pts(spark, sf_dir):
    from geowave_spark.queries import register_views

    register_views(spark, sf_dir)
    return spark.sql(geo.lineitem_points_sql()).cache()


@pytest.fixture(scope="module")
def polys():
    out = {}
    for i in range(12):
        cx = ((i * 7919) % 340) - 170.0
        cy = ((i * 104729) % 160) - 80.0
        # mix of convex (hexagon) and concave (star) shapes, varied sizes
        if i % 3 == 0:
            ang = 2 * np.pi * np.arange(10) / 10
            r = np.where(np.arange(10) % 2 == 0, 6.0, 2.5)
            out[i] = np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], 1).ravel()
        else:
            out[i] = geom.regular_polygon(cx, cy, 2.0 + (i % 6), 6, phase=i)
    return out


def brute_pairs(spark, pts, polys):
    rows = pts.select("pid", "lon", "lat").toPandas()
    out = []
    for pid_, poly in polys.items():
        m = geom.point_in_polygon(rows["lon"].to_numpy(), rows["lat"].to_numpy(), poly)
        for p in rows["pid"].to_numpy()[m]:
            out.append((int(p), int(pid_)))
    return sorted(out)


@pytest.mark.parametrize("refine", ["arrow", "jvm"])
@pytest.mark.parametrize("single_tier", [262_144, 0])
def test_polygon_join_matches_brute_force(spark, pts, polys, refine, single_tier):
    """Both refine engines (pandas batch kernel / JVM higher-order raycast)
    and both cover shapes (single-tier normalized / tiered fallback) must
    reproduce the brute-force pairs exactly."""
    got = spatial.point_in_polygon_join(
        spark, pts, polys, data_res=12, refine=refine,
        single_tier_cells=single_tier,
    ).toPandas()
    got_pairs = sorted(map(tuple, got[["pid", "poly_id"]].to_numpy().tolist()))
    exp_pairs = brute_pairs(spark, pts, polys)
    assert len(got_pairs) == len(exp_pairs)
    assert got_pairs == exp_pairs


def test_negative_join_complement(spark, pts, polys):
    pos = spatial.point_in_polygon_join(spark, pts, polys, data_res=12)
    neg = spatial.point_in_polygon_join(spark, pts, polys, data_res=12, negative=True)
    n_pos_pts = pos.select("pid").distinct().count()
    n_neg = neg.count()
    n_all = pts.select("pid").distinct().count()
    assert n_pos_pts + n_neg == n_all
    # disjointness
    assert pos.select("pid").distinct().join(neg, "pid").count() == 0


def test_salted_join_equals_unsalted(spark, pts):
    """The big-big salted cell join (explicit hot-cell skew split, north
    rule) must return exactly the broadcast join's pairs, and its physical
    plan must contain a real shuffle join keyed on (cell, salt)."""
    rects = pd.DataFrame({
        "rid": [1, 2, 3],
        "lon0": [-50.0, 100.0, -10.0], "lat0": [-20.0, 10.0, -45.0],
        "lon1": [0.0, 140.0, 35.0], "lat1": [30.0, 60.0, -5.0],
    })
    plain = spatial.point_in_rects_join(spark, pts, rects, res=8)
    salted = spatial.point_in_rects_join_salted(
        spark, pts, spark.createDataFrame(rects), res=8, salt_buckets=4
    )
    a = sorted(map(tuple, plain.toPandas()[["pid", "rid"]].to_numpy().tolist()))
    b = sorted(map(tuple, salted.toPandas()[["pid", "rid"]].to_numpy().tolist()))
    assert a == b and len(a) > 0
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "salt" in plan


def test_build_side_selection(spark, pts):
    """`spatial_join_rects` — the reference's JoinOptions.BuildSide knob
    (`TieredSpatialJoin.java:103,160`): explicit strategies agree, and
    "auto" counts the rect side against the broadcast threshold to pick."""
    rects = pd.DataFrame({
        "rid": [1, 2, 3],
        "lon0": [-50.0, 100.0, -10.0], "lat0": [-20.0, 10.0, -45.0],
        "lon1": [0.0, 140.0, 35.0], "lat1": [30.0, 60.0, -5.0],
    })
    rects_df = spark.createDataFrame(rects)

    def pairs(df):
        return sorted(map(tuple, df.toPandas()[["pid", "rid"]]
                          .to_numpy().tolist()))

    bc = spatial.spatial_join_rects(spark, pts, rects_df,
                                    strategy="broadcast", res=8)
    sh = spatial.spatial_join_rects(spark, pts, rects_df,
                                    strategy="shuffle", res=8)
    assert pairs(bc) == pairs(sh) and len(pairs(bc)) > 0

    # auto: 3 rects fit any real threshold -> broadcast plan
    auto_small = spatial.spatial_join_rects(spark, pts, rects_df,
                                            strategy="auto", res=8)
    plan = auto_small._jdf.queryExecution().executedPlan().toString()
    assert "salt" not in plan
    # auto with a 2-rect cap -> the 3-rect side must take the salted path
    auto_big = spatial.spatial_join_rects(
        spark, pts, rects_df, strategy="auto", res=8,
        broadcast_max_rects=2)
    plan_big = auto_big._jdf.queryExecution().executedPlan().toString()
    assert "salt" in plan_big
    assert pairs(auto_big) == pairs(bc)

    try:
        spatial.spatial_join_rects(spark, pts, rects_df, strategy="nope")
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_salted_join_splits_hot_cell(spark, pts):
    """Hot-cell skew demonstration: 30% of all points collapsed onto one
    location (a 'city' cell).  The salted join must (a) still produce the
    exact unsalted pairs and (b) spread the hot cell's candidate rows
    across all S salt buckets instead of one straggler task."""
    hot_lon, hot_lat = -25.0, 5.0
    skewed = pts.withColumn(
        "lon", F.when(F.col("pid") % 10 < 3, F.lit(hot_lon)).otherwise(F.col("lon"))
    ).withColumn(
        "lat", F.when(F.col("pid") % 10 < 3, F.lit(hot_lat)).otherwise(F.col("lat"))
    )
    rects = pd.DataFrame({
        "rid": [7],
        "lon0": [-50.0], "lat0": [-20.0], "lon1": [0.0], "lat1": [30.0],
    })
    S = 8
    plain = spatial.point_in_rects_join(spark, skewed, rects, res=8)
    salted = spatial.point_in_rects_join_salted(
        spark, skewed, rects, res=8, salt_buckets=S
    )
    a = sorted(map(tuple, plain.toPandas()[["pid", "rid"]].to_numpy().tolist()))
    b = sorted(map(tuple, salted.toPandas()[["pid", "rid"]].to_numpy().tolist()))
    assert a == b and len(a) > 0

    # every salt bucket of the hot cell carries ~1/S of its rows
    from geowave_spark.index import cover as cov
    from geowave_spark.sfc import grid
    import numpy as np

    hot_cell = int(grid.latlng_to_cell(
        np.asarray([hot_lon]), np.asarray([hot_lat]), 8)[0].astype("int64"))
    per_bucket = (
        cov.salted(cov.add_point_cells(skewed, "lon", "lat", 8), "pid", S)
        .filter(F.col("cell") == hot_cell)
        .groupBy("salt").count().toPandas()
    )
    assert len(per_bucket) == S
    assert per_bucket["count"].max() <= 1.3 * per_bucket["count"].mean()


def test_rect_join_anti_mode(spark, pts):
    rects = pd.DataFrame({
        "rid": [1, 2],
        "lon0": [-50.0, 100.0], "lat0": [-20.0, 10.0],
        "lon1": [0.0, 140.0], "lat1": [30.0, 60.0],
    })
    pos = spatial.point_in_rects_join(spark, pts, rects, res=8)
    neg = spatial.point_in_rects_join(spark, pts, rects, res=8, negative=True)
    assert pos.select("pid").distinct().count() + neg.count() == pts.count()


def test_raycast_flat_sql_bit_parity_mixed_nv(spark):
    """The codegen raycast (flat XOR chain over v0-padded vertex columns)
    must agree bit-for-bit with geom.point_in_polygon across polygons of
    MIXED vertex counts (3..17, convex/concave/star), including points on
    vertices — the padding path (true nv < max_nv) is exactly what a mixed
    polygon set exercises."""
    rng = np.random.RandomState(23)
    polys = {
        1: geom.regular_polygon(5, 5, 6.0, 3),
        2: geom.regular_polygon(-30, 10, 9.0, 17, phase=0.7),
        3: np.array([0, 0, 20, 0, 20, 20, 10, 6, 0, 20], dtype=float),  # concave
        4: np.stack([
            40 + np.where(np.arange(10) % 2 == 0, 8.0, 3.0) * np.cos(2 * np.pi * np.arange(10) / 10),
            -20 + np.where(np.arange(10) % 2 == 0, 8.0, 3.0) * np.sin(2 * np.pi * np.arange(10) / 10),
        ], 1).ravel(),  # star
    }
    max_nv = max(len(geom.poly_xy(p)[0]) for p in polys.values())
    n = 20000
    px = rng.uniform(-50, 60, n)
    py = rng.uniform(-40, 40, n)
    ids = np.array(sorted(polys))
    pid = ids[rng.randint(0, len(ids), n)]
    for k, p in polys.items():  # exact vertices hit boundary semantics
        vx, vy = geom.poly_xy(p)
        px[: len(vx)] = vx
        py[: len(vy)] = vy
        pid[: len(vx)] = k

    rows = {"lon": px, "lat": py, "poly_id": pid}
    for i in range(max_nv):
        vxc, vyc = [], []
        for p in pid:
            vx, vy = geom.poly_xy(polys[int(p)])
            vxc.append(vx[i] if i < len(vx) else vx[0])
            vyc.append(vy[i] if i < len(vy) else vy[0])
        rows[f"vx{i}"] = np.asarray(vxc)
        rows[f"vy{i}"] = np.asarray(vyc)
    df = spark.createDataFrame(pd.DataFrame(rows))
    got = (
        df.selectExpr("lon", "lat", "poly_id",
                      spatial.raycast_flat_sql("lon", "lat", max_nv) + " AS inside")
        .toPandas()
    )
    exp = np.zeros(n, dtype=bool)
    for k, p in polys.items():
        m = pid == k
        exp[m] = geom.point_in_polygon(px[m], py[m], p)
    # align on the stable (lon, lat, poly_id) triple, not row order
    key = pd.DataFrame({"lon": px, "lat": py, "poly_id": pid, "exp": exp})
    merged = got.merge(key, on=["lon", "lat", "poly_id"], how="left")
    assert len(merged) == n
    assert (merged["inside"].to_numpy() == merged["exp"].to_numpy()).all()


def test_within_distance_shuffle_equals_broadcast(spark, pts):
    """The salted shuffled-hash strategy of the within-distance join must
    return exactly the broadcast strategy's pairs (build-side selection,
    TieredSpatialJoin.java:168-172 analog)."""
    qs = pts.filter(F.col("pid") % 37 == 0).selectExpr(
        "pid AS qid", "lon", "lat")
    bc = spatial.within_distance_join(spark, pts, qs, radius=3.0, res=7)
    sh = spatial.within_distance_join(
        spark, pts, qs, radius=3.0, res=7,
        broadcast_queries=False, salt_buckets=4)
    a = sorted(map(tuple, bc.toPandas()[["pid", "qid"]].to_numpy().tolist()))
    b = sorted(map(tuple, sh.toPandas()[["pid", "qid"]].to_numpy().tolist()))
    assert a == b and len(a) > 0
    plan = sh._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan and "BroadcastHashJoin" not in plan


def test_within_distance_merge_equals_broadcast(spark, pts):
    """The third big-big tier — UNSALTED sort-merge on the cell key (the
    r5 sf10 lesson: a query cover too large for the salted SHJ's
    in-memory build must flip to a spillable SMJ + AQE skew split) —
    must also return exactly the broadcast strategy's pairs."""
    qs = pts.filter(F.col("pid") % 37 == 0).selectExpr(
        "pid AS qid", "lon", "lat")
    bc = spatial.within_distance_join(spark, pts, qs, radius=3.0, res=7)
    mg = spatial.within_distance_join(
        spark, pts, qs, radius=3.0, res=7,
        broadcast_queries=False, shuffle_strategy="merge")
    a = sorted(map(tuple, bc.toPandas()[["pid", "qid"]].to_numpy().tolist()))
    b = sorted(map(tuple, mg.toPandas()[["pid", "qid"]].to_numpy().tolist()))
    assert a == b and len(a) > 0
    plan = mg._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan and "BroadcastHashJoin" not in plan


def test_knn_shuffle_equals_broadcast(spark, pts):
    from geowave_spark.knn import knn as knn_mod

    qs = pts.filter(F.col("pid") % 101 == 0).selectExpr(
        "pid AS qid", "lon", "lat")
    bc = knn_mod.knn_join(spark, pts, qs, k=3, res=5)
    sh = knn_mod.knn_join(spark, pts, qs, k=3, res=5,
                          broadcast_queries=False, salt_buckets=4)
    cols = ["qid", "pid", "rank"]
    a = sorted(map(tuple, bc.toPandas()[cols].to_numpy().tolist()))
    b = sorted(map(tuple, sh.toPandas()[cols].to_numpy().tolist()))
    assert a == b and len(a) > 0


def test_polygon_polygon_join_matches_numpy(spark):
    """The codegen intersects predicate must agree with the full numpy
    kernel (polygons_intersect: vertex containment + proper AND improper
    crossings) on the synthesized geometry sets — validating the
    generic-position assumption of `poly_intersect_pred_sql`."""
    import numpy as np

    from geowave_spark.geom import core as geom
    from geowave_spark.queries import _flagship_polys
    from geowave_spark.table.geo import HEX_OFFSETS as _HEX_OFFSETS

    rng = np.random.default_rng(11)
    rows = []
    hexes = {}
    for i in range(120):
        cx = float(rng.uniform(-170, 170))
        cy = float(rng.uniform(-80, 80))
        s = float(1 + i % 4) * 0.7
        verts = [(cx + ox * s, cy + oy * s) for ox, oy in _HEX_OFFSETS]
        hexes[i] = np.asarray(verts).ravel()
        row = {"aid": i}
        for k, (x, y) in enumerate(verts):
            row[f"vx{k}"] = x
            row[f"vy{k}"] = y
        rows.append(row)
    a_df = spark.createDataFrame(pd.DataFrame(rows))
    polys_b = _flagship_polys()
    got = spatial.polygon_polygon_join(spark, a_df, polys_b, res=6)
    got_pairs = sorted(map(tuple, got.toPandas()[["aid", "bid"]].to_numpy().tolist()))
    exp = sorted(
        (a, b)
        for a, ha in hexes.items()
        for b, gb in polys_b.items()
        if geom.polygons_intersect(ha, gb)
    )
    assert got_pairs == exp and len(exp) > 0


def test_geodesic_join_matches_numpy_including_poles(spark, pts):
    """Geodesic within-distance join vs brute-force numpy haversine,
    with query points at extreme latitudes (lon rings must widen /
    full-wrap near the poles or pairs are lost)."""
    import numpy as np

    from geowave_spark.geom import core as geom

    qs = spark.createDataFrame(pd.DataFrame({
        "qid": [0, 1, 2, 3],
        "lon": [0.0, 120.0, -60.0, 10.0],
        "lat": [0.0, 87.5, -45.0, -88.0],
    }))
    r_km = 1500.0
    got = spatial.within_distance_join_geodesic(
        spark, pts, qs, radius_km=r_km, res=6)
    got_pairs = sorted(map(tuple, got.toPandas()[["pid", "qid"]].to_numpy().tolist()))
    p = pts.toPandas()
    q = qs.toPandas()
    exp = []
    for _, qr in q.iterrows():
        d = geom.haversine_km(p["lon"], p["lat"], qr["lon"], qr["lat"])
        exp.extend((int(pid), int(qr["qid"])) for pid in p.loc[d <= r_km, "pid"])
    assert got_pairs == sorted(exp) and len(exp) > 0


def test_query_side_auto_selection(spark, pts):
    """`resolve_query_side`: within_distance/kNN default to "auto" —
    small query sets broadcast; a floored broadcast threshold (or an
    explicit False) flips the same call to the salted shuffle path,
    results identical."""
    q = spark.createDataFrame(
        [(i, float(i * 7 % 60) - 30.0, float(i * 11 % 40) - 20.0)
         for i in range(20)],
        "qid long, lon double, lat double")

    def pairs(df):
        return sorted(map(tuple, df.toPandas()[["pid", "qid"]]
                          .to_numpy().tolist()))

    auto = spatial.within_distance_join(spark, pts, q, 2.0, res=8)
    plan = auto._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "salt" not in plan

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # 1 KB threshold: 20 queries x (2k+1)^2 disk cells never fit
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
        forced = spatial.within_distance_join(spark, pts, q, 2.0, res=8)
        plan_f = forced._jdf.queryExecution().executedPlan().toString()
        assert "salt" in plan_f
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert pairs(auto) == pairs(forced) and len(pairs(auto)) > 0


def test_polygon_polygon_bigbig_equals_broadcast(spark):
    """Both-sides-DataFrame polygon join (salted cells, id-join refine)
    returns exactly the broadcast-path pairs; the candidate join is a
    ShuffledHashJoin with no LocalTableScan on either cover."""
    import numpy as np

    rnd = np.random.default_rng(11)
    def hexagon(cx, cy, s):
        ang = np.linspace(0, 2 * np.pi, 7)[:6]
        return np.c_[cx + s * np.cos(ang), cy + s * np.sin(ang)]

    a_rows, b_rows, b_dict = [], [], {}
    for i in range(60):
        h = hexagon(rnd.uniform(-30, 30), rnd.uniform(-20, 20),
                    rnd.uniform(0.5, 3.0))
        a_rows.append([i] + [float(v) for xy in h for v in xy])
    for j in range(25):
        h = hexagon(rnd.uniform(-30, 30), rnd.uniform(-20, 20),
                    rnd.uniform(0.5, 3.0))
        b_rows.append([j] + [float(v) for xy in h for v in xy])
        b_dict[j] = h
    cols = [c for i in range(6) for c in (f"vx{i}", f"vy{i}")]
    # row layout is (id, x0, y0, x1, y1, ...) -> schema interleaves
    schema_a = "aid long, " + ", ".join(
        f"vx{i} double, vy{i} double" for i in range(6))
    schema_b = "bid long, " + ", ".join(
        f"vx{i} double, vy{i} double" for i in range(6))
    a_df = spark.createDataFrame(a_rows, schema_a)
    b_df = spark.createDataFrame(b_rows, schema_b)

    def pairs(df):
        return sorted(map(tuple, df.toPandas()[["aid", "bid"]]
                          .to_numpy().tolist()))

    bc = spatial.polygon_polygon_join(spark, a_df, b_dict, ka=6, res=6)
    bb = spatial.polygon_polygon_join_bigbig(spark, a_df, b_df,
                                             ka=6, kb=6, res=6)
    assert pairs(bc) == pairs(bb) and len(pairs(bb)) > 0

    plan = bb._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan
    assert "LocalTableScan" not in plan


def test_spatiotemporal_join_paths_match_brute_force(spark):
    """Composite (cell, tbin) key join: broadcast and shuffle paths both
    reproduce the brute-force bbox x BETWEEN pairs.  sf0.01 tables: the
    sf0.001 fixture's 1000 events have zero window hits."""
    sf01 = "/root/testdata/sf0.01"
    pts = spark.sql(geo.events_points_ts_sql(sf01, dialect="spark")).cache()
    wins = spark.sql(geo.supplier_windows_sql(sf01)).cache()

    exp = (
        pts.crossJoin(wins)
        .filter(
            "lon BETWEEN lon0 AND lon1 AND lat BETWEEN lat0 AND lat1 "
            "AND tsec BETWEEN t0 AND t1")
        .select("eid", "wid").toPandas()
    )
    exp_pairs = sorted(map(tuple, exp.to_numpy().tolist()))
    assert exp_pairs, "fixture degenerate: no spatiotemporal matches"
    for bcast in (True, False):
        got = spatial.spatiotemporal_window_join(
            spark, pts, wins, pid_col="eid", ts="tsec", wid_col="wid",
            res=7, broadcast_windows=bcast,
        ).toPandas()
        got_pairs = sorted(map(tuple, got.to_numpy().tolist()))
        assert got_pairs == exp_pairs


def test_snap_to_segments_matches_brute_force(spark, sf_dir):
    """Map matching (nearest segment within radius): both join paths equal
    the in-Spark brute-force crossJoin argmin."""
    from geowave_spark.queries import register_views

    register_views(spark, sf_dir)
    pts = spark.sql(
        f"SELECT event_id AS eid, {geo.lon_sql('event_id')} AS lon, "
        f"{geo.lat_sql('event_id')} AS lat FROM events WHERE user_id % 20 <> 0"
    ).cache()
    segs = spark.sql(geo.track_segments_sql()).cache()
    d2 = spatial.seg_dist2_sql("lon", "lat", "ax", "ay", "bx", "by")
    exp = (
        pts.crossJoin(segs)
        .filter(F.expr(f"{d2} <= 9.0"))
        .groupBy("eid")
        .agg(F.min(F.expr(
            f"cast(floor(({d2}) * 1000000e0) as bigint) * 68719476736 + sid"
        )).alias("enc"))
        .selectExpr("eid", "enc % 68719476736 AS sid",
                    "enc div 68719476736 AS d2_micro")
        .toPandas()
    )
    exp_rows = sorted(map(tuple, exp.to_numpy().tolist()))
    assert exp_rows, "fixture degenerate: no snap matches"
    for bcast in (True, False):
        got = spatial.snap_to_segments(
            spark, pts, segs, 3.0, pid_col="eid", res=6,
            broadcast_segments=bcast,
        ).toPandas()
        assert sorted(map(tuple, got.to_numpy().tolist())) == exp_rows


def test_spatiotemporal_knn_matches_brute_force(spark):
    """Bounded spatiotemporal kNN == in-Spark brute-force crossJoin rank,
    both join paths.  sf0.01 (the sf0.001 fixture is too sparse)."""
    sf01 = "/root/testdata/sf0.01"
    pts = spark.sql(
        f"SELECT eid AS pid, lon, lat, tsec FROM "
        f"({geo.events_points_ts_sql(sf01, dialect='spark')}) e").cache()
    q = spark.sql(
        f"SELECT cid, lon AS qlon, lat AS qlat, "
        f"cast(1704067200 + (cid % 28) * 86400 + (cid % 24) * 3600 as bigint)"
        f" AS qsec FROM ({geo.customer_points_sql(sf01)}) c WHERE cid % 5 = 0"
    ).cache()
    d2 = "((qlon - lon) * (qlon - lon) + (qlat - lat) * (qlat - lat))"
    exp = (
        pts.crossJoin(q)
        .filter(F.expr(f"{d2} <= 36.0 AND abs(tsec - qsec) <= 172800"))
        .withColumn("d2p", F.expr(f"cast(floor({d2} * 1e10) as bigint)"))
        .withColumn("rank", F.expr(
            "row_number() OVER (PARTITION BY cid ORDER BY d2p, pid)"))
        .filter("rank <= 3").select("cid", "rank", "pid", "d2p")
        .toPandas()
    )
    exp_rows = sorted(map(tuple, exp.to_numpy().tolist()))
    assert exp_rows, "fixture degenerate"
    for bcast in (True, False):
        got = spatial.spatiotemporal_knn(
            spark, pts,
            q.selectExpr("cid", "qlon AS lon", "qlat AS lat", "qsec"),
            k=3, radius=6.0, lag_s=172_800, qid_col="cid", res=5,
            broadcast_queries=bcast,
        ).toPandas()
        assert sorted(map(tuple, got.to_numpy().tolist())) == exp_rows
