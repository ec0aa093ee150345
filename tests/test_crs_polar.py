"""Polar Stereographic CRS family (`sfc/polar.py`) — golden values from
Snyder USGS PP 1395's south-polar worked example AND the independent
EPSG Guidance Note 7-2 Variant-B example, round-trip precision, the
defining differential properties (conformality / unit scale at the
standard parallel), `.prj` + EPSG sniffing, and the end-to-end
polar-shapefile ingest into the engine's join (reference parity:
any-GeoTools-CRS ingest via `GeometryUtils.java` in /root/reference)."""

from __future__ import annotations

import numpy as np

from geowave_spark.sfc import polar, utm

# International 1924, the ellipsoid of Snyder's example
_INTL = (6378388.0, 1.0 / 297.0)

_SNYDER_SOUTH = polar.PolarParams(
    False, -71.0, -100.0, 0.0, 0.0, 1.0, *_INTL)


def test_matches_snyder_south_worked_example():
    # Snyder PP 1395 Appendix A (polar stereographic, ellipsoid):
    # phi_c=-71, lam0=-100W, point phi=-75 lam=150 ->
    # x=-1,540,033.6  y=-560,526.4
    x, y = polar.polar_forward(150.0, -75.0, _SNYDER_SOUTH)
    assert abs(float(x) + 1540033.6) < 0.5
    assert abs(float(y) + 560526.4) < 0.5
    lon, lat = polar.polar_inverse(x, y, _SNYDER_SOUTH)
    assert abs(float(lon) - 150.0) < 1e-9 and abs(float(lat) + 75.0) < 1e-9


def test_matches_epsg_guidance_note_variant_b_example():
    # EPSG GN 7-2, Polar Stereographic Variant B worked example
    # (Australian Antarctic): WGS84, phi_c=-71, lam0=70, FE=FN=6e6,
    # point phi=-75 lam=120 -> E=7,255,380.79 N=7,053,389.56
    p = polar.PolarParams(False, -71.0, 70.0, 6000000.0, 6000000.0, 1.0,
                          6378137.0, 1.0 / 298.257223563)
    x, y = polar.polar_forward(120.0, -75.0, p)
    assert abs(float(x) - 7255380.79) < 0.02
    assert abs(float(y) - 7053389.56) < 0.02


def test_roundtrip_precision_over_polar_domains():
    rng = np.random.default_rng(17)
    for code in (3413, 3031, 3976, 5041, 5042):
        p = polar.EPSG_POLAR[code]
        lon = rng.uniform(-180.0, 180.0, 3000)
        lat = rng.uniform(55.0, 89.5, 3000) * (1.0 if p.north else -1.0)
        x, y = polar.polar_forward(lon, lat, p)
        lon2, lat2 = polar.polar_inverse(x, y, p)
        dlon = (lon2 - lon + 180.0) % 360.0 - 180.0
        assert np.abs(dlon).max() < 1e-9
        assert np.abs(lat2 - lat).max() < 1e-9


def _local_scales(p, lon, lat):
    """Numerical meridional (h) and parallel (k) scale factors."""
    e2 = p.f * (2.0 - p.f)
    phi = np.radians(lat)
    d = 1e-7
    xa, ya = polar.polar_forward(lon, lat - d / 2, p)
    xb, yb = polar.polar_forward(lon, lat + d / 2, p)
    s = np.sin(phi)
    rm = p.a * (1 - e2) / (1 - e2 * s * s) ** 1.5
    h = np.hypot(xb - xa, yb - ya) / (np.radians(d) * rm)
    xa, ya = polar.polar_forward(lon - d / 2, lat, p)
    xb, yb = polar.polar_forward(lon + d / 2, lat, p)
    rn = p.a / np.sqrt(1 - e2 * s * s) * np.cos(phi)
    k = np.hypot(xb - xa, yb - ya) / (np.radians(d) * rn)
    return h, k


def test_conformal_and_true_at_standard_parallel():
    for code in (3413, 3031):
        p = polar.EPSG_POLAR[code]
        rng = np.random.default_rng(code)
        lon = rng.uniform(-180.0, 180.0, 200)
        lat = rng.uniform(62.0, 88.0, 200) * (1.0 if p.north else -1.0)
        h, k = _local_scales(p, lon, lat)
        assert np.abs(h / k - 1.0).max() < 1e-5          # conformal
        _h, kts = _local_scales(p, lon, np.full_like(lon, p.lat_ts))
        assert np.abs(kts - 1.0).max() < 1e-6            # k == 1 at lat_ts


def test_ups_pole_scale_factor():
    # UPS: k0 = 0.994 exactly AT the pole (variant A definition).
    # Analytic k = rho / (a m(phi)) — a numerical lon-derivative this
    # close to the pole is below double-precision of the coordinates.
    p = polar.EPSG_POLAR[5041]
    lat = np.array([89.9999])
    x, y = polar.polar_forward(np.array([40.0]), lat, p)
    rho = np.hypot(x - p.fe, y - p.fn)
    from geowave_spark.sfc.conic import _m

    k = rho / (p.a * _m(np.radians(lat), p.e))
    assert abs(float(k) - 0.994) < 1e-9
    # and the pole itself maps to (FE, FN)
    x, y = polar.polar_forward(0.0, 90.0, p)
    assert abs(float(x) - 2000000.0) < 1e-6
    assert abs(float(y) - 2000000.0) < 1e-6


def test_parse_crs_polar_codes_and_prj():
    kind, params, _ = utm.parse_crs("EPSG:3413")
    assert kind == "polar" and params.north and params.lat_ts == 70.0
    kind, params, _ = utm.parse_crs(3031)
    assert kind == "polar" and not params.north and params.lon0 == 0.0
    # OGC-style .prj (NSIDC north grid)
    prj = (
        'PROJCS["WGS 84 / NSIDC Sea Ice Polar Stereographic North",'
        'GEOGCS["WGS 84",DATUM["WGS_1984",'
        'SPHEROID["WGS 84",6378137,298.257223563]]],'
        'PROJECTION["Polar_Stereographic"],'
        'PARAMETER["latitude_of_origin",70],'
        'PARAMETER["central_meridian",-45],'
        'PARAMETER["false_easting",0],'
        'PARAMETER["false_northing",0],UNIT["metre",1]]')
    kind, params, _ = utm.parse_crs(prj)
    assert kind == "polar" and params == polar.EPSG_POLAR[3413]
    # ESRI-style south-pole .prj (aspect in the projection name,
    # standard parallel spelled positively by some writers)
    prj2 = (
        'PROJCS["South_Pole_Stereographic",GEOGCS["GCS_WGS_1984",'
        'DATUM["D_WGS_1984",SPHEROID["WGS_1984",6378137,298.257223563]]],'
        'PROJECTION["Stereographic_South_Pole"],'
        'PARAMETER["Standard_Parallel_1",-71.0],'
        'PARAMETER["Central_Meridian",0.0],'
        'PARAMETER["False_Easting",0.0],'
        'PARAMETER["False_Northing",0.0],UNIT["Meter",1.0]]')
    kind, params, _ = utm.parse_crs(prj2)
    assert kind == "polar" and params == polar.EPSG_POLAR[3031]
    # an oblique stereographic is NOT claimed by the polar family
    prj3 = prj.replace('"latitude_of_origin",70', '"latitude_of_origin",52')
    try:
        kind, _p, _ = utm.parse_crs(prj3)
        claimed = kind == "polar"
    except ValueError:
        claimed = False
    assert not claimed
    # round-trip through the generic reproject surface
    p = polar.EPSG_POLAR[3031]
    lon, lat = utm.reproject_xy(
        *polar.polar_forward(np.array([120.0]), np.array([-75.0]), p),
        "EPSG:3031")
    assert abs(float(lon) - 120.0) < 1e-9 and abs(float(lat) + 75.0) < 1e-9


def test_polar_shapefile_ingest_joins_engine_pipeline(spark, tmp_path):
    """An Antarctic shapefile in EPSG:3031 meters with a .prj sidecar,
    read with crs='auto', must hit the engine's point-in-polygon join
    identically to native-WGS84 geometry (the q54 pipeline contract) —
    the same bar the LCC/Albers family passes."""
    from pyspark.sql import functions as F  # noqa: N812

    from geowave_spark.geom.wkt import parse_polygon
    from geowave_spark.join import spatial
    from geowave_spark.table import shapefile as sf

    p = polar.EPSG_POLAR[3031]
    rng = np.random.default_rng(31)
    feats_wgs, feats_ps = [], []
    for i in range(6):
        cx = rng.uniform(-60.0, 60.0)
        cy = rng.uniform(-80.0, -70.0)
        lon = np.array([cx - 2.0, cx + 2.0, cx + 2.0, cx - 2.0, cx - 2.0])
        lat = np.array([cy - 0.8, cy - 0.8, cy + 0.8, cy + 0.8, cy - 0.8])
        ring = lambda xs, ys: ("POLYGON ((" + ", ".join(  # noqa: E731
            f"{x!r} {y!r}" for x, y in zip(xs, ys)) + "))")
        feats_wgs.append((ring(lon, lat), {"pid": i}))
        x, y = polar.polar_forward(lon, lat, p)
        feats_ps.append((ring(x, y), {"pid": i}))

    d = tmp_path / "antarctic"
    d.mkdir()
    sf.write_shapefile(str(d / "zones"), feats_ps)
    (d / "zones.prj").write_text(
        'PROJCS["WGS 84 / Antarctic Polar Stereographic",'
        'GEOGCS["WGS 84",DATUM["WGS_1984",'
        'SPHEROID["WGS 84",6378137,298.257223563]]],'
        'PROJECTION["Polar_Stereographic"],'
        'PARAMETER["latitude_of_origin",-71],'
        'PARAMETER["central_meridian",0],'
        'PARAMETER["false_easting",0],'
        'PARAMETER["false_northing",0],UNIT["metre",1]]')

    got = sf.read_shapefile(spark, str(d), crs="auto").orderBy(
        "recno").collect()
    assert len(got) == 6
    for row, (wkt_wgs, _p2) in zip(got, feats_wgs):
        a = np.unique(parse_polygon(row.geom_wkt).round(8), axis=0)
        b = np.unique(parse_polygon(wkt_wgs).round(8), axis=0)
        assert a.shape == b.shape and np.abs(a - b).max() < 1e-8

    pts = spark.range(0, 400).select(
        (F.col("id") % 20 * 6.5 - 65.0).alias("lon"),
        (F.col("id") / 20 * 0.55 - 80.5).alias("lat"),
        F.col("id").alias("pid_pt"))
    polys_ps = {int(r.recno): parse_polygon(r.geom_wkt).ravel()
                for r in got}
    polys_wgs = {i + 1: parse_polygon(w).ravel()
                 for i, (w, _p2) in enumerate(feats_wgs)}
    j1 = spatial.point_in_polygon_join(spark, pts, polys_ps,
                                       pid_col="pid_pt", data_res=6)
    j2 = spatial.point_in_polygon_join(spark, pts, polys_wgs,
                                       pid_col="pid_pt", data_res=6)
    a = sorted((r.pid_pt, r.poly_id) for r in j1.collect())
    b = sorted((r.pid_pt, r.poly_id) for r in j2.collect())
    assert a == b and len(a) > 0
