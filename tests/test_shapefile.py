"""Shapefile ingest: pure-struct parser round-trips + distributed read.

Reference parity: GeoTools shapefile ingest
(`extensions/formats/geotools-vector/.../GeoToolsVectorDataStoreIngestPlugin.java`
in /root/reference) — same unit of parallelism (one file = one task) and
the same feature surface (geometry + attribute table).
"""
from __future__ import annotations

import struct

import numpy as np
import pytest

from geowave_spark.table import shapefile as sf


def _roundtrip(tmp_path, name, feats):
    sf.write_shapefile(str(tmp_path / name), feats)
    shp = (tmp_path / f"{name}.shp").read_bytes()
    dbf = (tmp_path / f"{name}.dbf").read_bytes()
    return sf.parse_shapefile_pair(shp, dbf, name)


def test_points_roundtrip(tmp_path):
    feats = [(f"POINT ({float(i)!r} {float(2 * i)!r})", {"id": i, "tag": f"p{i}"})
             for i in range(7)]
    pdf = _roundtrip(tmp_path, "pts", feats)
    assert list(pdf["geom_wkt"]) == [w for w, _ in feats]
    assert list(pdf["recno"]) == list(range(1, 8))
    import json
    props = [json.loads(p) for p in pdf["properties"]]
    assert props[3] == {"id": 3, "tag": "p3"}


def test_polygon_with_hole_roundtrip(tmp_path):
    wkt = ("POLYGON ((0.0 0.0, 4.0 0.0, 4.0 4.0, 0.0 4.0, 0.0 0.0), "
           "(1.0 1.0, 1.0 2.0, 2.0 2.0, 2.0 1.0, 1.0 1.0))")
    pdf = _roundtrip(tmp_path, "holed", [(wkt, {"name": "h"})])
    out = pdf["geom_wkt"][0]
    assert out.startswith("POLYGON ")
    # two rings survive, hole reattached to its shell
    assert out.count("(") == 3
    # membership semantics identical: centre of hole excluded, ring kept
    from geowave_spark.geom import core as G
    from geowave_spark.geom.wkt import parse_polygon_rings
    rings = list(parse_polygon_rings(out))
    inside = G.point_in_rings(np.array([1.5, 3.0]), np.array([1.5, 3.0]), rings)
    assert list(inside) == [False, True]


def test_multipolygon_roundtrip(tmp_path):
    wkt = ("MULTIPOLYGON (((10.0 10.0, 12.0 10.0, 12.0 12.0, 10.0 10.0)), "
           "((20.0 20.0, 22.0 20.0, 22.0 22.0, 20.0 20.0)))")
    pdf = _roundtrip(tmp_path, "mp", [(wkt, {})])
    assert pdf["geom_type"][0] == "multipolygon"
    assert pdf["geom_wkt"][0] == wkt


def test_lines_roundtrip(tmp_path):
    feats = [("LINESTRING (0.0 0.0, 1.0 1.0, 2.0 0.5)", {"t": "a"}),
             ("MULTILINESTRING ((0.0 0.0, 1.0 0.0), "
              "(5.0 5.0, 6.0 6.0, 7.0 5.0))", {"t": "b"})]
    pdf = _roundtrip(tmp_path, "ln", feats)
    assert list(pdf["geom_wkt"]) == [w for w, _ in feats]


def test_multipoint_roundtrip(tmp_path):
    wkt = "MULTIPOINT (1.0 2.0, 3.0 4.0, 5.0 6.0)"
    pdf = _roundtrip(tmp_path, "mpt", [(wkt, {})])
    assert pdf["geom_wkt"][0] == wkt


def test_z_records_parse_xy_prefix(tmp_path):
    """PointZ (type 11) records parse their XY prefix; the Z/M tail is
    skipped via the record-header length, so the stream never desyncs."""
    sf.write_shapefile(str(tmp_path / "z"), [("POINT (3.0 4.0)", {})])
    buf = bytearray((tmp_path / "z.shp").read_bytes())
    # rewrite shape type to PointZ in header and record, append Z+M
    struct.pack_into("<i", buf, 32, 11)
    struct.pack_into("<i", buf, 108, 11)
    body_extra = struct.pack("<dd", 9.0, 9.0)  # z, m
    buf = bytes(buf[:128]) + body_extra
    buf = bytearray(buf)
    struct.pack_into(">i", buf, 104, (len(buf) - 108) // 2)  # record clen
    struct.pack_into(">i", buf, 24, len(buf) // 2)           # file length
    recs = list(sf.shp_records(bytes(buf)))
    assert recs == [(1, "point", "POINT (3.0 4.0)")]


def test_null_shape_and_deleted_dbf_rows_skipped(tmp_path):
    sf.write_shapefile(str(tmp_path / "n"),
                       [("POINT (1.0 1.0)", {"a": 1}),
                        ("POINT (2.0 2.0)", {"a": 2})])
    buf = bytearray((tmp_path / "n.shp").read_bytes())
    struct.pack_into("<i", buf, 108, 0)  # record 1 -> Null shape
    recs = list(sf.shp_records(bytes(buf)))
    assert [r[0] for r in recs] == [2]
    dbf = bytearray((tmp_path / "n.dbf").read_bytes())
    hsize = struct.unpack_from("<H", dbf, 8)[0]
    dbf[hsize] = ord("*")  # delete record 1
    rows = sf.parse_dbf(bytes(dbf))
    assert len(rows) == 1 and rows[0]["a"] == 2


def test_mixed_types_rejected(tmp_path):
    with pytest.raises(ValueError):
        sf.write_shapefile(str(tmp_path / "x"),
                           [("POINT (0.0 0.0)", {}),
                            ("LINESTRING (0.0 0.0, 1.0 1.0)", {})])


def test_read_shapefile_distributed(spark, tmp_path):
    """Directory of shapefiles -> one task per file-pair, parsed on
    executors (groupBy(stem).applyInPandas — no driver parsing)."""
    sf.write_shapefile(
        str(tmp_path / "a"),
        [(f"POINT ({float(i)!r} {float(i)!r})", {"id": i}) for i in range(5)])
    sf.write_shapefile(
        str(tmp_path / "b"),
        [("POLYGON ((0.0 0.0, 2.0 0.0, 2.0 2.0, 0.0 2.0, 0.0 0.0))",
          {"name": "sq"})])
    df = sf.read_shapefile(spark, str(tmp_path))
    pdf = df.toPandas().sort_values(["src", "recno"]).reset_index(drop=True)
    assert len(pdf) == 6
    assert set(pdf["src"]) == {"a", "b"}
    assert list(pdf["geom_type"]).count("point") == 5
    poly = pdf[pdf["src"] == "b"].iloc[0]
    assert poly["geom_wkt"].startswith("POLYGON ((")
    assert '"name": "sq"' in poly["properties"]
    # the plan is a distributed FlatMapGroupsInPandas over a binaryFile
    # scan, not a LocalTableScan (driver-side parse)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan
    assert "LocalTableScan" not in plan


def test_read_shapefile_joins_engine_pipeline(spark, tmp_path):
    """Ingested features flow straight into the spatial-join surface:
    shapefile polygons x synthetic points through point_in_polygon_join."""
    wkt = "POLYGON ((0.0 0.0, 10.0 0.0, 10.0 10.0, 0.0 10.0, 0.0 0.0))"
    sf.write_shapefile(str(tmp_path / "zone"), [(wkt, {"zone": "z1"})])
    polys_pdf = sf.read_shapefile(spark, str(tmp_path)).toPandas()
    from geowave_spark.geom.wkt import parse_polygon
    from geowave_spark.join.spatial import point_in_polygon_join
    polys = {1: parse_polygon(polys_pdf["geom_wkt"][0])}
    pts = spark.createDataFrame(
        [(i, float(i), float(i)) for i in range(-3, 14)],
        "pid long, lon double, lat double")
    got = set(point_in_polygon_join(spark, pts, polys).toPandas()["pid"])
    # interior points in, exterior out; the (0,0)/(10,10) corners follow
    # the half-open even-odd boundary rule asserted in tests/test_geom.py
    assert set(range(1, 10)) <= got <= set(range(0, 11))
