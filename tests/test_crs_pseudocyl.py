"""Sinusoidal (MODIS) + Equidistant Cylindrical CRS family:
published-constant goldens, equal-area/equidistance property tests,
`.prj`/EPSG dispatch, and a MODIS-sinusoidal shapefile riding the
ingest -> reproject -> point-in-polygon join path (reference parity:
any-GeoTools-CRS ingest via `GeometryUtils.java` in /root/reference)."""

from __future__ import annotations

import math

import numpy as np

from geowave_spark.sfc import pseudocyl as pc
from geowave_spark.sfc import utm

_WGS84 = (6378137.0, 1.0 / 298.257223563)


def test_meridian_arc_quarter_meridian_golden():
    # The WGS84 quarter meridian is a published geodetic constant:
    # 10,001,965.729 m.  Snyder 3-21 must reproduce it.
    m = float(pc.meridian_arc(math.pi / 2.0, *_WGS84))
    assert abs(m - 10001965.729) < 0.01


def test_modis_grid_extent_golden():
    # NASA's MODIS sinusoidal grid documentation publishes the grid
    # half-width 20,015,109.354 m (pi * R for R = 6,371,007.181) and
    # tile width 1,111,950.52 m (half-width / 18).
    x, _y = pc.sinusoidal_forward(179.9999999, 0.0, pc.MODIS_SINUSOIDAL)
    assert abs(float(x) - 20015109.354) < 0.01
    assert abs(float(x) / 18.0 - 1111950.52) < 0.01
    # the grid is 2 * half-width tall from -90..90: y(90) = pi/2 * R
    _x, y = pc.sinusoidal_forward(0.0, 90.0, pc.MODIS_SINUSOIDAL)
    assert abs(float(y) - 20015109.354 / 2.0) < 0.01


def test_sinusoidal_equal_area_property():
    # Sinusoidal is equal-area: the forward Jacobian determinant equals
    # R^2 cos(phi) (sphere) everywhere, checked numerically.
    p = pc.MODIS_SINUSOIDAL
    d = 1e-6
    dr = math.radians(d)
    for lon, lat in [(0.0, 0.0), (37.3, 48.2), (-120.0, -66.5),
                     (179.0, 10.0), (-179.0, 85.0)]:
        x0, y0 = (float(v) for v in pc.sinusoidal_forward(lon, lat, p))
        xl, yl = (float(v) for v in pc.sinusoidal_forward(lon + d, lat, p))
        xp, yp = (float(v) for v in pc.sinusoidal_forward(lon, lat + d, p))
        jac = abs((xl - x0) * (yp - y0) - (xp - x0) * (yl - y0)) / (dr * dr)
        want = p.a * p.a * math.cos(math.radians(lat))
        assert abs(jac / want - 1.0) < 1e-6, (lon, lat)


def test_equirect_equidistance_property():
    # Equidistant cylindrical: y is the TRUE meridian distance (all
    # meridians are standard lines), so dy/dphi equals the meridian
    # radius of curvature M(phi) = a(1-e^2)/(1-e^2 sin^2 phi)^1.5.
    p = pc.EPSG_EQC[4087]
    e2 = p.f * (2.0 - p.f)
    d = 1e-6
    for lat in (-80.0, -33.0, 0.0, 41.7, 89.0):
        _x0, y0 = pc.equirect_forward(0.0, lat, p)
        _x1, y1 = pc.equirect_forward(0.0, lat + d, p)
        dy_dphi = (float(y1) - float(y0)) / math.radians(d)
        s = math.sin(math.radians(lat))
        want = p.a * (1.0 - e2) / (1.0 - e2 * s * s) ** 1.5
        assert abs(dy_dphi / want - 1.0) < 1e-5, lat


def test_roundtrip_precision():
    rng = np.random.default_rng(23)
    lon = rng.uniform(-179.9, 179.9, 4000)
    lat = rng.uniform(-89.5, 89.5, 4000)
    cases = [
        pc.MODIS_SINUSOIDAL,
        pc.SinusoidalParams(10.0, 1000.0, -2000.0, *_WGS84),
        pc.EPSG_EQC[4087],
        pc.EquirectParams(30.0, -5.0, 500.0, 900.0, *_WGS84),
    ]
    for p in cases:
        if isinstance(p, pc.SinusoidalParams):
            x, y = pc.sinusoidal_forward(lon, lat, p)
            lo2, la2 = pc.sinusoidal_inverse(x, y, p)
        else:
            x, y = pc.equirect_forward(lon, lat, p)
            lo2, la2 = pc.equirect_inverse(x, y, p)
        dlon = (lo2 - lon + 180.0) % 360.0 - 180.0
        # the 3-26 rectifying-latitude series truncates at ~1e-8 deg;
        # the lon division amplifies it near the poles
        assert np.abs(dlon).max() < 1e-6, p
        assert np.abs(la2 - lat).max() < 1e-7, p


def test_sphere_limit_continuity():
    # the ellipsoidal forms must degrade continuously to the sphere
    rng = np.random.default_rng(7)
    lon = rng.uniform(-179.0, 179.0, 500)
    lat = rng.uniform(-89.0, 89.0, 500)
    ps = pc.MODIS_SINUSOIDAL
    pe = pc.SinusoidalParams(0.0, 0.0, 0.0, ps.a, 1e-12)
    xs, ys = pc.sinusoidal_forward(lon, lat, ps)
    xe, ye = pc.sinusoidal_forward(lon, lat, pe)
    assert np.abs(xe - xs).max() < 1e-4
    assert np.abs(ye - ys).max() < 1e-4


def test_parse_crs_codes_and_prj():
    # EPSG codes
    kind, p, _n = utm.parse_crs(4087)
    assert kind == "eqc" and p.lat_ts == 0.0 and p.a == 6378137.0
    kind, p, _n = utm.parse_crs("EPSG:32662")
    assert kind == "eqc"
    # MODIS sinusoidal .prj (sphere radius, inverse flattening 0)
    modis_prj = (
        'PROJCS["MODIS Sinusoidal",GEOGCS["Custom",DATUM["Custom",'
        'SPHEROID["Custom",6371007.181,0]]],'
        'PROJECTION["Sinusoidal"],'
        'PARAMETER["central_meridian",0],'
        'PARAMETER["false_easting",0],'
        'PARAMETER["false_northing",0],UNIT["metre",1]]')
    kind, p, _n = utm.parse_crs(modis_prj)
    assert kind == "sinu" and p.a == 6371007.181 and p.f == 0.0
    # plate-carree .prj spelling
    eqc_prj = (
        'PROJCS["World Plate Carree",GEOGCS["WGS 84",DATUM["WGS_1984",'
        'SPHEROID["WGS 84",6378137,298.257223563]]],'
        'PROJECTION["Equirectangular"],'
        'PARAMETER["standard_parallel_1",30],'
        'PARAMETER["central_meridian",-5],UNIT["metre",1]]')
    kind, p, _n = utm.parse_crs(eqc_prj)
    assert kind == "eqc" and p.lat_ts == 30.0 and p.lon0 == -5.0
    # reproject_xy round-trips through the dispatch
    x, y = pc.sinusoidal_forward(12.5, 47.25, pc.MODIS_SINUSOIDAL)
    lon, lat = utm.reproject_xy(x, y, modis_prj)
    assert abs(float(lon) - 12.5) < 1e-7 and abs(float(lat) - 47.25) < 1e-7
    x, y = pc.equirect_forward(12.5, 47.25, pc.EPSG_EQC[4087])
    lon, lat = utm.reproject_xy(x, y, 4087)
    assert abs(float(lon) - 12.5) < 1e-7 and abs(float(lat) - 47.25) < 1e-7
    # a different family is NOT claimed
    assert pc.parse_prj_pseudocyl(
        'PROJCS["x",PROJECTION["Transverse_Mercator"],'
        'PARAMETER["central_meridian",9]]') is None


def test_modis_shapefile_ingest_joins_engine_pipeline(spark, tmp_path):
    """A MODIS-sinusoidal shapefile with a .prj sidecar, read with
    crs='auto', must hit the engine's point-in-polygon join identically
    to native-WGS84 geometry — the bar every CRS family passes."""
    from pyspark.sql import functions as F  # noqa: N812

    from geowave_spark.geom.wkt import parse_polygon
    from geowave_spark.join import spatial
    from geowave_spark.table import shapefile as sf

    p = pc.MODIS_SINUSOIDAL
    rng = np.random.default_rng(41)
    feats_wgs, feats_sinu = [], []
    for i in range(6):
        cx = rng.uniform(-100.0, 100.0)
        cy = rng.uniform(-55.0, 55.0)
        lon = np.array([cx - 2.0, cx + 2.0, cx + 2.0, cx - 2.0, cx - 2.0])
        lat = np.array([cy - 0.8, cy - 0.8, cy + 0.8, cy + 0.8, cy - 0.8])
        ring = lambda xs, ys: ("POLYGON ((" + ", ".join(  # noqa: E731
            f"{x!r} {y!r}" for x, y in zip(xs, ys)) + "))")
        feats_wgs.append((ring(lon, lat), {"pid": i}))
        x, y = pc.sinusoidal_forward(lon, lat, p)
        feats_sinu.append((ring(x, y), {"pid": i}))

    d = tmp_path / "modis"
    d.mkdir()
    sf.write_shapefile(str(d / "zones"), feats_sinu)
    (d / "zones.prj").write_text(
        'PROJCS["MODIS Sinusoidal",GEOGCS["Custom",DATUM["Custom",'
        'SPHEROID["Custom",6371007.181,0]]],'
        'PROJECTION["Sinusoidal"],'
        'PARAMETER["central_meridian",0],'
        'PARAMETER["false_easting",0],'
        'PARAMETER["false_northing",0],UNIT["metre",1]]')

    got = sf.read_shapefile(spark, str(d), crs="auto").orderBy(
        "recno").collect()
    assert len(got) == 6
    for row, (wkt_wgs, _p2) in zip(got, feats_wgs):
        a = np.unique(parse_polygon(row.geom_wkt).round(7), axis=0)
        b = np.unique(parse_polygon(wkt_wgs).round(7), axis=0)
        assert a.shape == b.shape and np.abs(a - b).max() < 1e-6

    # a 3x3 probe around every polygon center: the middle probe is
    # inside its 4 x 1.6 deg box, the ring is outside
    centers = [(float(np.mean(parse_polygon(w)[:, 0])),
                float(np.mean(parse_polygon(w)[:, 1])))
               for w, _p2 in feats_wgs]
    probe = [(cx + dx, cy + dy, 9 * i + 3 * jx + jy)
             for i, (cx, cy) in enumerate(centers)
             for jx, dx in enumerate((-2.5, 0.0, 2.5))
             for jy, dy in enumerate((-1.0, 0.0, 1.0))]
    pts = spark.createDataFrame(probe, "lon double, lat double, pid_pt long")
    polys_sinu = {int(r.recno): parse_polygon(r.geom_wkt).ravel()
                  for r in got}
    polys_wgs = {i + 1: parse_polygon(w).ravel()
                 for i, (w, _p2) in enumerate(feats_wgs)}
    j1 = spatial.point_in_polygon_join(spark, pts, polys_sinu,
                                       pid_col="pid_pt", data_res=6)
    j2 = spatial.point_in_polygon_join(spark, pts, polys_wgs,
                                       pid_col="pid_pt", data_res=6)
    a = sorted((r.pid_pt, r.poly_id) for r in j1.collect())
    b = sorted((r.pid_pt, r.poly_id) for r in j2.collect())
    assert a == b and len(a) > 0
