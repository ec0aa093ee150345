"""GeoJSON vector ingest -> DataFrame of (geom_wkt, properties).

Reference analog (/root/reference): the vector format plugins under
`extensions/formats/geojson/src/main/java/.../format/geojson/
GeoJsonGeometryHandler.java` (GeoTools FeatureJSON there; plain `json` +
WKT emit here).  Sibling format readers: shapefile (`table/shapefile.py`),
GPX/GDELT/T-Drive/GeoLife (`table/trackfiles.py`); `write_geojsonl` below
is the matching distributed export.

Scale shape: newline-delimited GeoJSON (one Feature per line, a.k.a.
GeoJSONL / geojsonseq) is the only variant that splits across executors —
`spark.read.text` gives per-line rows and `mapInPandas` parses each
partition's lines without any driver involvement.  A classic single-object
FeatureCollection file cannot be split (it is one JSON document), so
`read_geojson` parses it driver-side and is intended for small files; use
GeoJSONL for anything big.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

GEOJSON_SCHEMA = "geom_type string, geom_wkt string, properties string"


def _ring_wkt(ring) -> str:
    pts = list(ring)
    if pts[0] != pts[-1]:
        pts.append(pts[0])
    return "(" + ", ".join(f"{float(x)!r} {float(y)!r}" for x, y in pts) + ")"


def feature_to_wkt(geometry: dict) -> tuple[str, str]:
    """GeoJSON geometry dict -> (type, WKT).  Supports Point, LineString,
    Polygon (with holes), MultiPolygon, MultiLineString, MultiPoint."""
    t = geometry["type"]
    c = geometry["coordinates"]
    if t == "Point":
        return "point", f"POINT ({float(c[0])!r} {float(c[1])!r})"
    if t == "MultiPoint":
        body = ", ".join(f"{float(x)!r} {float(y)!r}" for x, y in c)
        return "multipoint", f"MULTIPOINT ({body})"
    if t == "LineString":
        body = ", ".join(f"{float(x)!r} {float(y)!r}" for x, y in c)
        return "linestring", f"LINESTRING ({body})"
    if t == "MultiLineString":
        parts = ", ".join(
            "(" + ", ".join(f"{float(x)!r} {float(y)!r}" for x, y in part) + ")"
            for part in c
        )
        return "multilinestring", f"MULTILINESTRING ({parts})"
    if t == "Polygon":
        return "polygon", f"POLYGON ({', '.join(_ring_wkt(r) for r in c)})"
    if t == "MultiPolygon":
        polys = ", ".join(
            "(" + ", ".join(_ring_wkt(r) for r in poly) + ")" for poly in c
        )
        return "multipolygon", f"MULTIPOLYGON ({polys})"
    raise ValueError(f"unsupported GeoJSON geometry type {t!r}")


def _features_to_pdf(features) -> pd.DataFrame:
    types, wkts, props = [], [], []
    for f in features:
        t, w = feature_to_wkt(f["geometry"])
        types.append(t)
        wkts.append(w)
        props.append(json.dumps(f.get("properties") or {}, sort_keys=True))
    return pd.DataFrame(
        {"geom_type": types, "geom_wkt": wkts, "properties": props}
    )


def read_geojsonl(spark: SparkSession, path: str) -> DataFrame:
    """Newline-delimited GeoJSON features -> DataFrame, parsed distributed
    (one mapInPandas over the text splits; no driver parsing)."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lines = [ln for ln in pdf["value"] if ln.strip()]
            if lines:
                yield _features_to_pdf(json.loads(ln) for ln in lines)

    return spark.read.text(path).mapInPandas(parse, schema=GEOJSON_SCHEMA)


def read_geojson(spark: SparkSession, path: str) -> DataFrame:
    """Single FeatureCollection document (small files only — one JSON
    object is not splittable; convert to GeoJSONL for scale)."""
    with open(path) as fh:
        doc = json.load(fh)
    feats = doc["features"] if doc.get("type") == "FeatureCollection" else [doc]
    return spark.createDataFrame(_features_to_pdf(feats))


# ------------------------------------------------------------------ export

def _parse_paren(s: str, i: int):
    """Parse a WKT parenthesis tree starting at s[i] == '(' -> (node, j).
    Leaves are coordinate lists [[x, y], ...]."""
    assert s[i] == "("
    i += 1
    children = []
    buf = ""
    while i < len(s):
        c = s[i]
        if c == "(":
            node, i = _parse_paren(s, i)
            children.append(node)
        elif c == ")":
            if not children:
                # leaf group: raw coordinate list
                return [[float(t) for t in pt.split()[:2]]
                        for pt in buf.split(",") if pt.strip()], i + 1
            return children, i + 1
        else:
            buf += c
            i += 1
    raise ValueError("unbalanced WKT parentheses")


def wkt_to_geometry(wkt: str) -> dict:
    """WKT -> GeoJSON geometry dict (inverse of `feature_to_wkt`)."""
    head, rest = wkt.split("(", 1)
    kind = head.strip().upper()
    tree, _ = _parse_paren("(" + rest, 0)
    if kind == "POINT":
        return {"type": "Point", "coordinates": tree[0]}
    if kind == "MULTIPOINT":
        # both MULTIPOINT (x y, x y) and ((x y), (x y)) forms
        coords = (tree if isinstance(tree[0][0], float)
                  else [t[0] if isinstance(t[0], list) else t for t in tree])
        if isinstance(coords[0][0], list):
            coords = [c[0] for c in coords]
        return {"type": "MultiPoint", "coordinates": coords}
    if kind == "LINESTRING":
        return {"type": "LineString", "coordinates": tree}
    if kind == "MULTILINESTRING":
        return {"type": "MultiLineString", "coordinates": tree}
    if kind == "POLYGON":
        rings = tree if isinstance(tree[0][0], list) else [tree]
        return {"type": "Polygon", "coordinates": rings}
    if kind == "MULTIPOLYGON":
        polys = []
        for poly in tree:
            polys.append(poly if isinstance(poly[0][0], list) else [poly])
        return {"type": "MultiPolygon", "coordinates": polys}
    raise ValueError(f"unsupported WKT type {kind!r}")


def write_geojsonl(df: DataFrame, path: str) -> None:
    """Distributed GeoJSONL export: one Feature per line, one output file
    per partition — the reference's per-mapper vector export shape
    (`extensions/adapters/vector/.../export/VectorMRExportJobRunner.java`
    writes per-mapper files; avro SimpleFeature there, GeoJSONL here).
    ``df`` needs (geom_wkt, properties-as-JSON-string) columns; every
    other column is folded into properties."""

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            extra = [c for c in pdf.columns
                     if c not in ("geom_wkt", "properties")]
            lines = []
            for _, row in pdf.iterrows():
                props = json.loads(row["properties"]) \
                    if "properties" in pdf.columns else {}
                for c in extra:
                    v = row[c]
                    props[c] = v.item() if hasattr(v, "item") else v
                lines.append(json.dumps({
                    "type": "Feature",
                    "geometry": wkt_to_geometry(row["geom_wkt"]),
                    "properties": props,
                }, sort_keys=True))
            yield pd.DataFrame({"value": lines})

    df.mapInPandas(emit, schema="value string").write.mode(
        "overwrite").text(path)
