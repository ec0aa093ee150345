"""GeoJSON vector ingest -> DataFrame of (geom_wkt, properties).

Reference analog (/root/reference): the vector format plugins under
`extensions/formats/geojson/src/main/java/.../format/geojson/
GeoJsonGeometryHandler.java` (GeoTools FeatureJSON there; plain `json` +
WKT emit here).  Shapefile/GDELT/GPX remain out of scope (binary sidecar
formats; the synthetic generator covers the north-rule input shape) — this
closes the "first real vector file a user loads" gap for the one
text-based, line-splittable format.

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
