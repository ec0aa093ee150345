"""ESRI Shapefile vector ingest -> DataFrame of (geom_wkt, properties).

Reference analog (/root/reference): the GeoTools vector ingest plugin
`extensions/formats/geotools-vector/src/main/java/.../geotools/vector/
GeoToolsVectorDataStoreIngestPlugin.java` (GeoTools ShapefileDataStore
there; a pure-struct parser of the public ESRI spec here — the format is a
1998 published binary layout, no library needed).  Closes the "first real
shapefile a user loads" gap left after GeoJSONL (`table/geojson.py`).

Scale shape: one .shp file is NOT splittable (variable-length records,
no sync markers) — the unit of parallelism is the FILE, exactly as in the
reference (GeoTools opens one ShapefileDataStore per file).  A directory
of shapefiles parses fully distributed: `spark.read.format("binaryFile")`
lists every member once, `groupBy(stem).applyInPandas` re-unites each
.shp with its .dbf sidecar on an executor, and each group parses there.
Nothing touches the driver.

Geometry support matches the engine's WKT surface: Point, MultiPoint,
PolyLine (LineString / MultiLineString), Polygon with holes and multiple
outer rings (-> POLYGON / MULTIPOLYGON).  Z/M variants (PointZ=11 etc.)
parse by reading the XY prefix and skipping the Z/M tail — the record
header carries the content length, so the tail never desyncs the stream.

Ring semantics per the spec: outer rings are clockwise (negative shoelace
area in math orientation), holes counter-clockwise; each hole attaches to
the outer ring containing its first vertex (`geom/core.point_in_rings`).
"""

from __future__ import annotations

import json
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..geom import core as G

SHAPEFILE_SCHEMA = (
    "src string, recno int, geom_type string, geom_wkt string, "
    "properties string"
)

_NULL, _POINT, _POLYLINE, _POLYGON, _MULTIPOINT = 0, 1, 3, 5, 8
# Z/M variants share the base layout with appended Z/M arrays we skip
_XY_TYPE = {
    1: _POINT, 11: _POINT, 21: _POINT,
    3: _POLYLINE, 13: _POLYLINE, 23: _POLYLINE,
    5: _POLYGON, 15: _POLYGON, 25: _POLYGON,
    8: _MULTIPOINT, 18: _MULTIPOINT, 28: _MULTIPOINT,
}


def _coords(body: bytes, off: int, n: int) -> np.ndarray:
    return np.frombuffer(body, dtype="<f8", count=2 * n, offset=off).reshape(n, 2)


def _fmt(v: float) -> str:
    return repr(float(v))


def _pts_wkt(xy: np.ndarray) -> str:
    return ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in xy)


def _ring_area(xy: np.ndarray) -> float:
    """Signed shoelace area (positive = counter-clockwise)."""
    x, y = xy[:, 0], xy[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def _close_ring(xy: np.ndarray) -> np.ndarray:
    if len(xy) and not np.array_equal(xy[0], xy[-1]):
        xy = np.vstack([xy, xy[:1]])
    return xy


def _polygon_wkt(rings: list[np.ndarray]) -> tuple[str, str]:
    """Shapefile ring soup -> POLYGON/MULTIPOLYGON WKT.

    CW rings (negative area) are shells, CCW rings are holes; each hole
    joins the shell whose interior contains its first vertex.
    """
    rings = [_close_ring(r) for r in rings if len(r) >= 3]
    shells = [r for r in rings if _ring_area(r) <= 0]
    holes = [r for r in rings if _ring_area(r) > 0]
    if not shells:            # degenerate: all-CCW file, treat as shells
        shells, holes = holes, []
    parts: list[list[np.ndarray]] = [[s] for s in shells]
    for h in holes:
        placed = False
        for part in parts:
            inside = G.point_in_rings(
                np.array([h[0, 0]]), np.array([h[0, 1]]), part[0])
            if bool(inside[0]):
                part.append(h)
                placed = True
                break
        if not placed:        # orphan hole: keep as its own shell
            parts.append([h[::-1]])
    def one(p):
        return "(" + ", ".join(f"({_pts_wkt(r)})" for r in p) + ")"
    if len(parts) == 1:
        return "polygon", f"POLYGON {one(parts[0])}"
    return "multipolygon", f"MULTIPOLYGON ({', '.join(one(p) for p in parts)})"


def _parts(body: bytes) -> tuple[list[np.ndarray], int]:
    """Parse the shared PolyLine/Polygon layout: bbox, parts[], points[]."""
    nparts, npts = struct.unpack_from("<ii", body, 36)
    starts = list(struct.unpack_from(f"<{nparts}i", body, 44)) + [npts]
    xy_off = 44 + 4 * nparts
    xy = _coords(body, xy_off, npts)
    return [xy[starts[i]:starts[i + 1]] for i in range(nparts)], npts


def shp_records(buf: bytes) -> Iterator[tuple[int, str, str]]:
    """Yield (record_number, geom_type, wkt) from .shp bytes."""
    if len(buf) < 100 or struct.unpack_from(">i", buf, 0)[0] != 9994:
        raise ValueError("not a shapefile (bad magic)")
    flen = struct.unpack_from(">i", buf, 24)[0] * 2  # 16-bit words -> bytes
    pos = 100
    while pos + 8 <= min(flen, len(buf)):
        recno, clen = struct.unpack_from(">ii", buf, pos)
        body = buf[pos + 8: pos + 8 + clen * 2]
        pos += 8 + clen * 2
        stype = struct.unpack_from("<i", body, 0)[0]
        base = _XY_TYPE.get(stype)
        if stype == _NULL or base is None:
            continue
        if base == _POINT:
            x, y = struct.unpack_from("<dd", body, 4)
            yield recno, "point", f"POINT ({_fmt(x)} {_fmt(y)})"
        elif base == _MULTIPOINT:
            npts = struct.unpack_from("<i", body, 36)[0]
            xy = _coords(body, 40, npts)
            yield recno, "multipoint", f"MULTIPOINT ({_pts_wkt(xy)})"
        elif base == _POLYLINE:
            parts, _ = _parts(body)
            if len(parts) == 1:
                yield recno, "linestring", f"LINESTRING ({_pts_wkt(parts[0])})"
            else:
                body_w = ", ".join(f"({_pts_wkt(p)})" for p in parts)
                yield recno, "multilinestring", f"MULTILINESTRING ({body_w})"
        else:
            t, w = _polygon_wkt(_parts(body)[0])
            yield recno, t, w


def parse_dbf(buf: bytes) -> list[dict]:
    """dBASE III .dbf attribute table -> one dict per record (text fields
    stripped, N/F parsed numeric, L boolean, D kept as yyyymmdd string)."""
    if not buf:
        return []
    nrec, hsize, rsize = struct.unpack_from("<iHH", buf, 4)
    fields = []
    off = 32
    while off < hsize - 1 and buf[off] != 0x0D:
        name = buf[off:off + 11].split(b"\x00")[0].decode("ascii", "replace")
        ftype = chr(buf[off + 11])
        flen = buf[off + 16]
        fields.append((name, ftype, flen))
        off += 32
    out = []
    pos = hsize
    for _ in range(nrec):
        if pos + rsize > len(buf):
            break
        rec = buf[pos:pos + rsize]
        pos += rsize
        if rec[:1] == b"*":  # deleted
            continue
        row, foff = {}, 1
        for name, ftype, flen in fields:
            raw = rec[foff:foff + flen].decode("ascii", "replace").strip()
            foff += flen
            if ftype in ("N", "F"):
                row[name] = (float(raw) if ("." in raw or "e" in raw.lower())
                             else int(raw)) if raw else None
            elif ftype == "L":
                row[name] = raw.upper() in ("T", "Y") if raw else None
            else:
                row[name] = raw
        out.append(row)
    return out


def parse_shapefile_pair(shp: bytes, dbf: bytes | None,
                         src: str = "") -> pd.DataFrame:
    """One (.shp, .dbf) pair -> feature rows (SHAPEFILE_SCHEMA shape)."""
    attrs = {i + 1: r for i, r in enumerate(parse_dbf(dbf))} if dbf else {}
    recnos, types, wkts, props = [], [], [], []
    for recno, t, w in shp_records(shp):
        recnos.append(recno)
        types.append(t)
        wkts.append(w)
        props.append(json.dumps(attrs.get(recno, {}), sort_keys=True))
    return pd.DataFrame({
        "src": src, "recno": pd.array(recnos, dtype="int32"),
        "geom_type": types, "geom_wkt": wkts, "properties": props,
    })


def read_shapefile(spark: SparkSession, path: str,
                   crs: str | None = None) -> DataFrame:
    """Directory (or glob) of shapefiles -> feature DataFrame, parsed
    fully distributed: binaryFile lists .shp/.dbf/.prj members, a groupBy
    on the file stem re-unites each sidecar set on one executor, and the
    pair parses there.  One task per shapefile — the format's own
    parallelism unit (records are variable-length, the file is not
    splittable), so a 10k-file directory fans out 10k-wide.

    `crs`: source CRS of the coordinates.  None = already EPSG:4326;
    "auto" = sniff each file's .prj sidecar (identity when absent);
    anything else = a spec `sfc/utm.parse_crs` resolves (e.g.
    "EPSG:32632" or raw .prj WKT) applied to every file.  Geometries are
    reprojected to EPSG:4326 inside the same distributed parse task —
    the reference's ingest-time GeoTools transform
    (`GeometryUtils.java`; `CustomCRSKDERasterResizeIT.java`)."""
    from ..sfc import utm

    if crs not in (None, "auto"):
        utm.parse_crs(crs)  # fail fast on the driver
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.{shp,dbf,prj}")
        .load(path)
        .select(
            F.regexp_replace("path", r"\.(shp|dbf|prj)$", "").alias("stem"),
            F.element_at(F.split("path", r"\."), -1).alias("ext"),
            "content",
        )
    )

    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        by_ext = {e: c for e, c in zip(pdf["ext"], pdf["content"])}
        if "shp" not in by_ext:
            return pd.DataFrame(
                columns=["src", "recno", "geom_type", "geom_wkt",
                         "properties"])
        src = key[0].rsplit("/", 1)[-1]
        out = parse_shapefile_pair(
            bytes(by_ext["shp"]),
            bytes(by_ext["dbf"]) if "dbf" in by_ext else None, src)
        file_crs = crs
        if crs == "auto":
            file_crs = (bytes(by_ext["prj"]).decode("utf-8", "replace")
                        if "prj" in by_ext else None)
        if file_crs is not None and len(out):
            kind, _z, _n = utm.parse_crs(file_crs)
            if kind != "lonlat":
                out["geom_wkt"] = [
                    utm.reproject_wkt(w, file_crs) for w in out["geom_wkt"]]
        return out

    return files.groupBy("stem").applyInPandas(
        assemble, schema=SHAPEFILE_SCHEMA)


# ---------------------------------------------------------------- writer

_WKT_TYPE = {"point": 1, "linestring": 3, "multilinestring": 3,
             "polygon": 5, "multipolygon": 5, "multipoint": 8}


def _wkt_rings(wkt: str) -> list[np.ndarray]:
    """Every innermost coordinate list of a WKT string, in order — the
    ring/part sequence for any of the six supported geometry types."""
    import re
    out = []
    for body in re.findall(r"\(([^()]+)\)", wkt):
        pts = [p.split() for p in body.split(",")]
        out.append(np.array([[float(x), float(y)] for x, y, *_ in pts]))
    return out


def write_shapefile(stem_path: str, features: list[tuple[str, dict]]) -> None:
    """Minimal .shp/.shx/.dbf writer (tests + vector-export parity;
    reference analog: GeoTools shapefile export in the vector format
    plugin).  ``features`` is [(wkt, properties_dict), ...]; all records
    must share one shape class (point / line / polygon / multipoint)."""
    if not features:
        raise ValueError("empty shapefile")
    recs = []
    kinds = set()
    for wkt, _ in features:
        kind = wkt.split()[0].split("(")[0].strip().lower()
        kinds.add(_WKT_TYPE[kind])
        recs.append((kind, _wkt_rings(wkt)))
    if len(kinds) != 1:
        raise ValueError("mixed shape types in one shapefile")
    stype = kinds.pop()

    bodies = []
    for kind, rings in recs:
        if stype == 1:
            body = struct.pack("<i", 1) + struct.pack(
                "<dd", rings[0][0][0], rings[0][0][1])
        elif stype == 8:
            xy = np.vstack(rings)
            body = struct.pack("<i", 8) + struct.pack(
                "<4d", xy[:, 0].min(), xy[:, 1].min(),
                xy[:, 0].max(), xy[:, 1].max())
            body += struct.pack("<i", len(xy)) + xy.astype("<f8").tobytes()
        else:
            if stype == 5:  # spec orientation: shells CW, holes CCW
                fixed = []
                for i, r in enumerate(rings):
                    r = _close_ring(r)
                    cw = _ring_area(r) <= 0
                    want_cw = (i == 0) if kind == "polygon" else cw
                    fixed.append(r if cw == want_cw else r[::-1])
                rings = fixed
            xy = np.vstack(rings)
            starts, n = [], 0
            for r in rings:
                starts.append(n)
                n += len(r)
            body = struct.pack("<i", stype) + struct.pack(
                "<4d", xy[:, 0].min(), xy[:, 1].min(),
                xy[:, 0].max(), xy[:, 1].max())
            body += struct.pack("<ii", len(rings), n)
            body += struct.pack(f"<{len(starts)}i", *starts)
            body += xy.astype("<f8").tobytes()
        bodies.append(body)

    all_xy = np.vstack([np.vstack(r) for _, r in recs])
    bbox = struct.pack("<4d", all_xy[:, 0].min(), all_xy[:, 1].min(),
                       all_xy[:, 0].max(), all_xy[:, 1].max())
    shp = bytearray()
    shx = bytearray()
    pos = 100
    for i, body in enumerate(bodies):
        shx += struct.pack(">ii", pos // 2, len(body) // 2)
        shp += struct.pack(">ii", i + 1, len(body) // 2) + body
        pos += 8 + len(body)

    def header(total_bytes: int) -> bytes:
        return (struct.pack(">i", 9994) + b"\x00" * 20
                + struct.pack(">i", total_bytes // 2)
                + struct.pack("<ii", 1000, stype) + bbox + b"\x00" * 32)

    with open(stem_path + ".shp", "wb") as fh:
        fh.write(header(100 + len(shp)) + shp)
    with open(stem_path + ".shx", "wb") as fh:
        fh.write(header(100 + len(shx)) + shx)

    keys = sorted({k for _, p in features for k in p})
    flds = []
    for k in keys:
        vals = [p.get(k) for _, p in features]
        numeric = all(isinstance(v, (int, float)) or v is None for v in vals)
        if numeric:
            txt = [("" if v is None else repr(v)) for v in vals]
            flds.append((k, "N", max(1, max(len(t) for t in txt)), txt))
        else:
            txt = [("" if v is None else str(v)) for v in vals]
            flds.append((k, "C", max(1, max(len(t) for t in txt)), txt))
    rsize = 1 + sum(fl for _, _, fl, _ in flds)
    hsize = 32 + 32 * len(flds) + 1
    dbf = bytearray(struct.pack("<B3xiHH20x", 0x03, len(features),
                                hsize, rsize))
    for name, ftype, flen, _ in flds:
        dbf += struct.pack("<11sc4xBB14x", name.encode("ascii")[:11],
                           ftype.encode(), flen, 0)
    dbf += b"\x0d"
    for i in range(len(features)):
        dbf += b" "
        for _, _, flen, txt in flds:
            dbf += txt[i].encode("ascii", "replace").ljust(flen)[:flen]
    dbf += b"\x1a"
    with open(stem_path + ".dbf", "wb") as fh:
        fh.write(bytes(dbf))
