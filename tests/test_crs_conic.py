"""Conic CRS family (Lambert Conformal Conic 2SP + Albers Equal-Area 2SP,
`sfc/conic.py`) — golden values from Snyder USGS PP 1395's worked
numerical examples, round-trip precision, the defining differential
properties (conformality / equal-area), `.prj` + EPSG sniffing, and the
end-to-end state-plane-style shapefile ingest into the engine's join
(reference parity: `CustomCRSKDERasterResizeIT.java`,
`GeometryUtils.java` transforms in /root/reference)."""

from __future__ import annotations

import math

import numpy as np

from geowave_spark.sfc import conic, utm

# Clarke 1866, the ellipsoid of Snyder's examples
_A_CLARKE = 6378206.4
_F_CLARKE = 1.0 - math.sqrt(1.0 - 0.00676866)

_LCC_SNYDER = conic.ConicParams(
    "lcc", 33.0, 45.0, 23.0, -96.0, 0.0, 0.0, _A_CLARKE, _F_CLARKE)
_ALB_SNYDER = conic.ConicParams(
    "albers", 29.5, 45.5, 23.0, -96.0, 0.0, 0.0, _A_CLARKE, _F_CLARKE)


def test_lcc_matches_snyder_worked_example():
    # Snyder PP 1395 p.296: phi=35N lam=75W -> x=1,894,410.9 y=1,564,649.5
    x, y = conic.lcc_forward(-75.0, 35.0, _LCC_SNYDER)
    assert abs(float(x) - 1894410.9) < 0.5
    assert abs(float(y) - 1564649.5) < 0.5
    lon, lat = conic.lcc_inverse(x, y, _LCC_SNYDER)
    assert abs(float(lon) + 75.0) < 1e-9 and abs(float(lat) - 35.0) < 1e-9


def test_albers_matches_snyder_worked_example():
    # Snyder PP 1395 p.292: phi=35N lam=75W -> x=1,885,472.7 y=1,535,925.0
    x, y = conic.albers_forward(-75.0, 35.0, _ALB_SNYDER)
    assert abs(float(x) - 1885472.7) < 0.5
    assert abs(float(y) - 1535925.0) < 0.5
    lon, lat = conic.albers_inverse(x, y, _ALB_SNYDER)
    assert abs(float(lon) + 75.0) < 1e-9 and abs(float(lat) - 35.0) < 1e-9


def test_roundtrip_precision_over_domains():
    rng = np.random.default_rng(11)
    for p in (conic.EPSG_CONIC[5070], conic.EPSG_CONIC[3310],
              conic.EPSG_CONIC[2154], conic.EPSG_CONIC[3034]):
        lon = rng.uniform(p.lon0 - 15.0, p.lon0 + 15.0, 3000)
        lat = rng.uniform(min(p.lat1, p.lat2) - 8.0,
                          max(p.lat1, p.lat2) + 8.0, 3000)
        x, y = conic.conic_forward(lon, lat, p)
        lon2, lat2 = conic.conic_inverse(x, y, p)
        assert np.abs(lon2 - lon).max() < 1e-9
        assert np.abs(lat2 - lat).max() < 1e-9


def _local_scales(p, lon, lat):
    """Numerical meridional (h) and parallel (k) scale factors."""
    e2 = p.f * (2.0 - p.f)
    phi = np.radians(lat)
    s2 = np.sin(phi) ** 2
    m_rad = p.a * (1 - e2) / (1 - e2 * s2) ** 1.5       # meridian radius
    n_rad = p.a / np.sqrt(1 - e2 * s2)                   # prime vertical
    d = 1e-7
    x0, y0 = conic.conic_forward(lon, lat, p)
    xl, yl = conic.conic_forward(lon + d, lat, p)
    xp, yp = conic.conic_forward(lon, lat + d, p)
    dlam = math.radians(d)
    k = np.hypot(xl - x0, yl - y0) / (n_rad * np.cos(phi) * dlam)
    h = np.hypot(xp - x0, yp - y0) / (m_rad * dlam)
    return h, k


def test_lcc_is_conformal_and_true_at_standard_parallels():
    p = conic.EPSG_CONIC[2154]  # Lambert-93
    rng = np.random.default_rng(5)
    lon = rng.uniform(-4.0, 8.0, 200)
    lat = rng.uniform(42.0, 51.0, 200)
    h, k = _local_scales(p, lon, lat)
    assert np.abs(h - k).max() < 1e-5          # conformal: h == k
    for sp in (p.lat1, p.lat2):                # k == 1 on the parallels
        _h, ks = _local_scales(p, np.array([2.0]), np.array([sp]))
        assert abs(float(ks) - 1.0) < 1e-6


def test_albers_preserves_area():
    p = conic.EPSG_CONIC[5070]  # CONUS Albers
    rng = np.random.default_rng(9)
    lon = rng.uniform(-120.0, -75.0, 200)
    lat = rng.uniform(25.0, 49.0, 200)
    h, k = _local_scales(p, lon, lat)
    assert np.abs(h * k - 1.0).max() < 1e-5    # equal-area: h*k == 1


def test_albers_sphere_limit_matches_snyder_sphere_example():
    """e == 0 (spherical SPHEROID, inverse-flattening 0) previously
    produced silent NaN via the 1/(2e) division in _q (ADVICE r4).  The
    explicit sphere-limit branch must reproduce Snyder PP 1395's
    SPHERICAL Albers worked example (p.291-292: R=1, parallels
    29.5/45.5, origin 23/-96, point 35N 75W -> x=0.2952720,
    y=0.2416774), round-trip, and be the continuous limit of the
    ellipsoidal forms as f -> 0."""
    sp = conic.ConicParams("albers", 29.5, 45.5, 23.0, -96.0,
                           0.0, 0.0, 1.0, 0.0)
    x, y = conic.albers_forward(-75.0, 35.0, sp)
    assert abs(float(x) - 0.2952720) < 5e-7
    assert abs(float(y) - 0.2416774) < 5e-7
    lon, lat = conic.albers_inverse(x, y, sp)
    assert abs(float(lon) + 75.0) < 1e-9 and abs(float(lat) - 35.0) < 1e-9
    # continuity: a vanishing-flattening ellipsoid converges to the sphere
    pe = conic.ConicParams("albers", 29.5, 45.5, 23.0, -96.0,
                           0.0, 0.0, 1.0, 1e-10)
    xe, ye = conic.albers_forward(-75.0, 35.0, pe)
    assert abs(float(xe) - float(x)) < 1e-9
    assert abs(float(ye) - float(y)) < 1e-9


def test_parse_prj_spherical_albers_no_nan():
    """A Sphere_ARC_INFO-style .prj (authalic sphere, flattening 0) must
    come back finite through parse + forward + inverse, not NaN."""
    prj = (
        'PROJCS["Sphere_Albers",GEOGCS["GCS_Sphere_ARC_INFO",'
        'DATUM["D_Sphere_ARC_INFO",'
        'SPHEROID["Sphere_ARC_INFO",6370997.0,0.0]]],'
        'PROJECTION["Albers"],'
        'PARAMETER["False_Easting",0.0],'
        'PARAMETER["False_Northing",0.0],'
        'PARAMETER["Central_Meridian",-96.0],'
        'PARAMETER["Standard_Parallel_1",29.5],'
        'PARAMETER["Standard_Parallel_2",45.5],'
        'PARAMETER["Latitude_Of_Origin",23.0],UNIT["Meter",1.0]]')
    p = conic.parse_prj_conic(prj)
    assert p is not None and p.f == 0.0 and p.e == 0.0
    lon = np.array([-120.0, -96.0, -75.0])
    lat = np.array([30.0, 40.0, 48.0])
    x, y = conic.conic_forward(lon, lat, p)
    assert np.isfinite(x).all() and np.isfinite(y).all()
    lon2, lat2 = conic.conic_inverse(x, y, p)
    assert np.abs(lon2 - lon).max() < 1e-9
    assert np.abs(lat2 - lat).max() < 1e-9


def test_parse_crs_conic_codes_and_prj():
    kind, params, _ = utm.parse_crs("EPSG:5070")
    assert kind == "conic" and params.kind == "albers"
    kind, params, _ = utm.parse_crs(2154)
    assert kind == "conic" and params.kind == "lcc" and params.fe == 700000.0
    prj = (
        'PROJCS["NAD_1983_California_Teale_Albers",'
        'GEOGCS["GCS_North_American_1983",DATUM["D_North_American_1983",'
        'SPHEROID["GRS_1980",6378137.0,298.257222101]]],'
        'PROJECTION["Albers"],'
        'PARAMETER["False_Easting",0.0],'
        'PARAMETER["False_Northing",-4000000.0],'
        'PARAMETER["Central_Meridian",-120.0],'
        'PARAMETER["Standard_Parallel_1",34.0],'
        'PARAMETER["Standard_Parallel_2",40.5],'
        'PARAMETER["Latitude_Of_Origin",0.0],UNIT["Meter",1.0]]')
    kind, params, _ = utm.parse_crs(prj)
    assert kind == "conic" and params == conic.EPSG_CONIC[3310]
    # a state-plane LCC .prj (Texas North Central style parameters)
    prj2 = (
        'PROJCS["NAD83 / Texas North Central",GEOGCS["NAD83",'
        'DATUM["North_American_Datum_1983",'
        'SPHEROID["GRS 1980",6378137,298.257222101]]],'
        'PROJECTION["Lambert_Conformal_Conic_2SP"],'
        'PARAMETER["standard_parallel_1",32.13333333333333],'
        'PARAMETER["standard_parallel_2",33.96666666666667],'
        'PARAMETER["latitude_of_origin",31.66666666666667],'
        'PARAMETER["central_meridian",-98.5],'
        'PARAMETER["false_easting",600000],'
        'PARAMETER["false_northing",2000000],UNIT["metre",1]]')
    kind, params, _ = utm.parse_crs(prj2)
    assert kind == "conic" and params.kind == "lcc"
    assert params.fe == 600000.0 and abs(params.lat0 - 31.6666666667) < 1e-6
    # round-trip through the generic reproject surface
    lon, lat = utm.reproject_xy(
        *conic.conic_forward(np.array([-97.0]), np.array([32.8]), params),
        prj2)
    assert abs(float(lon) + 97.0) < 1e-9 and abs(float(lat) - 32.8) < 1e-9


def test_conic_shapefile_ingest_joins_engine_pipeline(spark, tmp_path):
    """A state-plane-style LCC shapefile with a .prj sidecar, read with
    crs='auto', must hit the engine's point-in-polygon join identically
    to native-WGS84 geometry (the q54 pipeline contract)."""
    from pyspark.sql import functions as F

    from geowave_spark.geom.wkt import parse_polygon
    from geowave_spark.join import spatial
    from geowave_spark.table import shapefile as sf

    p = conic.EPSG_CONIC[2154]  # Lambert-93
    rng = np.random.default_rng(13)
    feats_wgs, feats_lcc = [], []
    for i in range(6):
        cx = rng.uniform(0.0, 6.0)
        cy = rng.uniform(44.0, 49.0)
        lon = np.array([cx - 0.4, cx + 0.4, cx + 0.4, cx - 0.4, cx - 0.4])
        lat = np.array([cy - 0.3, cy - 0.3, cy + 0.3, cy + 0.3, cy - 0.3])
        ring = lambda xs, ys: ("POLYGON ((" + ", ".join(  # noqa: E731
            f"{x!r} {y!r}" for x, y in zip(xs, ys)) + "))")
        feats_wgs.append((ring(lon, lat), {"pid": i}))
        x, y = conic.lcc_forward(lon, lat, p)
        feats_lcc.append((ring(x, y), {"pid": i}))

    d = tmp_path / "lcc"
    d.mkdir()
    sf.write_shapefile(str(d / "zones"), feats_lcc)
    (d / "zones.prj").write_text(
        'PROJCS["RGF93 / Lambert-93",GEOGCS["RGF93",DATUM["RGF_1993",'
        'SPHEROID["GRS 1980",6378137,298.257222101]]],'
        'PROJECTION["Lambert_Conformal_Conic_2SP"],'
        'PARAMETER["standard_parallel_1",49],'
        'PARAMETER["standard_parallel_2",44],'
        'PARAMETER["latitude_of_origin",46.5],'
        'PARAMETER["central_meridian",3],'
        'PARAMETER["false_easting",700000],'
        'PARAMETER["false_northing",6600000],UNIT["metre",1]]')

    got = sf.read_shapefile(spark, str(d), crs="auto").orderBy(
        "recno").collect()
    assert len(got) == 6
    for row, (wkt_wgs, _p2) in zip(got, feats_wgs):
        a = np.unique(parse_polygon(row.geom_wkt).round(8), axis=0)
        b = np.unique(parse_polygon(wkt_wgs).round(8), axis=0)
        assert a.shape == b.shape and np.abs(a - b).max() < 1e-8

    pts = spark.range(0, 400).select(
        (F.col("id") % 20 * 0.35 - 0.6).alias("lon"),
        (F.col("id") / 20 * 0.3 + 43.8).alias("lat"),
        F.col("id").alias("pid_pt"))
    polys_lcc = {int(r.recno): parse_polygon(r.geom_wkt).ravel()
                 for r in got}
    polys_wgs = {i + 1: parse_polygon(w).ravel()
                 for i, (w, _p2) in enumerate(feats_wgs)}
    j1 = spatial.point_in_polygon_join(spark, pts, polys_lcc,
                                       pid_col="pid_pt", data_res=6)
    j2 = spatial.point_in_polygon_join(spark, pts, polys_wgs,
                                       pid_col="pid_pt", data_res=6)
    a = sorted((r.pid_pt, r.poly_id) for r in j1.collect())
    b = sorted((r.pid_pt, r.poly_id) for r in j2.collect())
    assert a == b and len(a) > 0
