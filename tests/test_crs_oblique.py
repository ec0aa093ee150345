"""Hotine Oblique Mercator CRS family (`sfc/oblique.py`) — golden from
the EPSG Guidance Note 7-2 variant-B worked example (Timbalai 1948 /
RSO Borneo), round-trip precision, conformality and
scale-k0-on-the-initial-line property tests, `.prj` + EPSG sniffing,
and the end-to-end RSO shapefile ingest into the engine's join
(reference parity: any-GeoTools-CRS ingest via `GeometryUtils.java`
in /root/reference)."""

from __future__ import annotations

import numpy as np

from geowave_spark.sfc import oblique, utm

_RSO = oblique.EPSG_HOTINE[29873]


def test_matches_epsg_guidance_note_variant_b_example():
    # EPSG GN 7-2 HOM variant B: Timbalai 1948 / RSO Borneo (m),
    # phi = 5d23'14.1129"N, lam = 115d48'19.8196"E ->
    # E = 679,245.73  N = 596,562.78
    lat = 5 + 23 / 60 + 14.1129 / 3600
    lon = 115 + 48 / 60 + 19.8196 / 3600
    x, y = oblique.hotine_forward(lon, lat, _RSO)
    assert abs(float(x) - 679245.73) < 0.02
    assert abs(float(y) - 596562.78) < 0.02
    lon2, lat2 = oblique.hotine_inverse(x, y, _RSO)
    assert abs(float(lon2) - lon) < 1e-9 and abs(float(lat2) - lat) < 1e-9


def test_roundtrip_precision_over_domain():
    rng = np.random.default_rng(41)
    lon = rng.uniform(109.0, 120.0, 3000)
    lat = rng.uniform(0.0, 8.0, 3000)
    x, y = oblique.hotine_forward(lon, lat, _RSO)
    lon2, lat2 = oblique.hotine_inverse(x, y, _RSO)
    assert np.abs(lon2 - lon).max() < 1e-9
    assert np.abs(lat2 - lat).max() < 1e-9


def _local_scales(p, lon, lat):
    e2 = p.f * (2.0 - p.f)
    phi = np.radians(lat)
    d = 1e-7
    xa, ya = oblique.hotine_forward(lon, lat - d / 2, p)
    xb, yb = oblique.hotine_forward(lon, lat + d / 2, p)
    s = np.sin(phi)
    rm = p.a * (1 - e2) / (1 - e2 * s * s) ** 1.5
    h = np.hypot(xb - xa, yb - ya) / (np.radians(d) * rm)
    xa, ya = oblique.hotine_forward(lon - d / 2, lat, p)
    xb, yb = oblique.hotine_forward(lon + d / 2, lat, p)
    rn = p.a / np.sqrt(1 - e2 * s * s) * np.cos(phi)
    k = np.hypot(xb - xa, yb - ya) / (np.radians(d) * rn)
    return h, k


def test_conformal_and_k0_at_center():
    rng = np.random.default_rng(43)
    lon = rng.uniform(110.0, 119.0, 200)
    lat = rng.uniform(0.5, 7.5, 200)
    h, k = _local_scales(_RSO, lon, lat)
    assert np.abs(h / k - 1.0).max() < 1e-5          # conformal
    # scale == k0 at the projection center (on the initial line)
    _h, kc = _local_scales(_RSO, np.array([_RSO.lon_c]),
                           np.array([_RSO.lat_c]))
    assert abs(float(kc) - _RSO.k0) < 1e-7


def test_variant_b_center_maps_to_ec_nc():
    # variant B: the projection center itself lands on (Ec, Nc)
    x, y = oblique.hotine_forward(_RSO.lon_c, _RSO.lat_c, _RSO)
    assert abs(float(x) - _RSO.fe) < 1e-5
    assert abs(float(y) - _RSO.fn) < 1e-5


def test_parse_crs_hotine_codes_and_prj():
    kind, params, _ = utm.parse_crs("EPSG:29873")
    assert kind == "hotine" and params.variant == "b"
    # ESRI-style azimuth-center .prj
    prj = (
        'PROJCS["Timbalai_1948_RSO_Borneo_Meters",'
        'GEOGCS["GCS_Timbalai_1948",DATUM["D_Timbalai_1948",'
        'SPHEROID["Everest_1830_Modified",6377298.556,300.8017]]],'
        'PROJECTION["Hotine_Oblique_Mercator_Azimuth_Center"],'
        'PARAMETER["False_Easting",590476.87],'
        'PARAMETER["False_Northing",442857.65],'
        'PARAMETER["Scale_Factor",0.99984],'
        'PARAMETER["Azimuth",53.31582047222222],'
        'PARAMETER["Rectified_Grid_Angle",53.13010236111111],'
        'PARAMETER["Longitude_Of_Center",115.0],'
        'PARAMETER["Latitude_Of_Center",4.0],UNIT["Meter",1.0]]')
    kind, params, _ = utm.parse_crs(prj)
    assert kind == "hotine"
    assert abs(params.azimuth - _RSO.azimuth) < 1e-9
    # the parsed params must agree with the EPSG-table ones numerically
    lat = 5 + 23 / 60 + 14.1129 / 3600
    lon = 115 + 48 / 60 + 19.8196 / 3600
    x, y = oblique.hotine_forward(lon, lat, params)
    assert abs(float(x) - 679245.73) < 0.02
    assert abs(float(y) - 596562.78) < 0.02
    # generic reproject surface round-trip
    lon2, lat2 = utm.reproject_xy(x, y, "EPSG:29873")
    assert abs(float(lon2) - lon) < 1e-9 and abs(float(lat2) - lat) < 1e-9


def test_rso_shapefile_ingest_joins_engine_pipeline(spark, tmp_path):
    """A Borneo shapefile in RSO meters with a .prj sidecar, read with
    crs='auto', must hit the engine's point-in-polygon join identically
    to native-WGS84 geometry — the bar the LCC/Albers and polar
    families pass."""
    from pyspark.sql import functions as F  # noqa: N812

    from geowave_spark.geom.wkt import parse_polygon
    from geowave_spark.join import spatial
    from geowave_spark.table import shapefile as sf

    rng = np.random.default_rng(47)
    feats_wgs, feats_rso = [], []
    for i in range(6):
        cx = rng.uniform(111.0, 118.0)
        cy = rng.uniform(1.0, 6.5)
        lon = np.array([cx - 0.5, cx + 0.5, cx + 0.5, cx - 0.5, cx - 0.5])
        lat = np.array([cy - 0.4, cy - 0.4, cy + 0.4, cy + 0.4, cy - 0.4])
        ring = lambda xs, ys: ("POLYGON ((" + ", ".join(  # noqa: E731
            f"{x!r} {y!r}" for x, y in zip(xs, ys)) + "))")
        feats_wgs.append((ring(lon, lat), {"pid": i}))
        x, y = oblique.hotine_forward(lon, lat, _RSO)
        feats_rso.append((ring(x, y), {"pid": i}))

    d = tmp_path / "borneo"
    d.mkdir()
    sf.write_shapefile(str(d / "zones"), feats_rso)
    (d / "zones.prj").write_text(
        'PROJCS["Timbalai_1948_RSO_Borneo_Meters",'
        'GEOGCS["GCS_Timbalai_1948",DATUM["D_Timbalai_1948",'
        'SPHEROID["Everest_1830_Modified",6377298.556,300.8017]]],'
        'PROJECTION["Hotine_Oblique_Mercator_Azimuth_Center"],'
        'PARAMETER["False_Easting",590476.87],'
        'PARAMETER["False_Northing",442857.65],'
        'PARAMETER["Scale_Factor",0.99984],'
        'PARAMETER["Azimuth",53.31582047222222],'
        'PARAMETER["Rectified_Grid_Angle",53.13010236111111],'
        'PARAMETER["Longitude_Of_Center",115.0],'
        'PARAMETER["Latitude_Of_Center",4.0],UNIT["Meter",1.0]]')

    got = sf.read_shapefile(spark, str(d), crs="auto").orderBy(
        "recno").collect()
    assert len(got) == 6
    for row, (wkt_wgs, _p2) in zip(got, feats_wgs):
        a = np.unique(parse_polygon(row.geom_wkt).round(8), axis=0)
        b = np.unique(parse_polygon(wkt_wgs).round(8), axis=0)
        assert a.shape == b.shape and np.abs(a - b).max() < 1e-8

    pts = spark.range(0, 400).select(
        (F.col("id") % 20 * 0.4 + 110.8).alias("lon"),
        (F.col("id") / 20 * 0.3 + 0.7).alias("lat"),
        F.col("id").alias("pid_pt"))
    polys_rso = {int(r.recno): parse_polygon(r.geom_wkt).ravel()
                 for r in got}
    polys_wgs = {i + 1: parse_polygon(w).ravel()
                 for i, (w, _p2) in enumerate(feats_wgs)}
    j1 = spatial.point_in_polygon_join(spark, pts, polys_rso,
                                       pid_col="pid_pt", data_res=6)
    j2 = spatial.point_in_polygon_join(spark, pts, polys_wgs,
                                       pid_col="pid_pt", data_res=6)
    a = sorted((r.pid_pt, r.poly_id) for r in j1.collect())
    b = sorted((r.pid_pt, r.poly_id) for r in j2.collect())
    assert a == b and len(a) > 0
