"""Avro vector ingest -> DataFrame (Object Container File, pure-struct).

Reference analogs (/root/reference):
  - Format plugin: `extensions/formats/avro/src/main/java/.../format/
    avro/GeoWaveAvroIngestPlugin.java` — reads Avro container files of
    `AvroSimpleFeatureCollection` records and emits SimpleFeatures.
  - Record schema: `extensions/adapters/vector/src/main/avro/
    AvroSimpleFeature.avsc` — featureType {featureTypeName,
    attributeNames, attributeTypes, attributeDefaultClassifications},
    simpleFeatureCollection [{fid, values: array<bytes>, ...}].
  - Value codec: `extensions/adapters/vector/src/main/java/.../
    GeoWaveAvroFeatureUtils.java:100-155` serializes each attribute to
    bytes by binding (geometry via TWKB there; WKT utf-8 here — this
    engine's geometry surface is WKT, and the bytes codec is an
    adapter-private contract, not part of the container format).

No Avro library exists in this environment (and spark-avro is not on
the classpath), so the container layer is a pure-struct implementation
of the PUBLISHED Avro 1.x spec — exactly like `table/shapefile.py` and
`raster/geotiff.py`: magic `Obj\\x01`, metadata map carrying the writer
schema JSON + codec, 16-byte sync marker, blocks of
(count, byte-size, payload) with null/deflate codecs, zig-zag varint
binary encoding.  The generic datum decoder is schema-driven (records,
arrays, maps, unions, enums, fixed, all primitives), so any OCF file
parses; `read_avro_features` then maps the GeoWave feature-collection
shape to rows.

Scale shape: one .avro file splits at BLOCK boundaries in principle
(sync markers), but like the reference plugin — which iterates one
DataFileStream per URL — the unit of parallelism here is the file:
binaryFile scan + mapInPandas, one task per file, a directory of files
fans out file-wide.  Rows stream out block by block (one yield per
container block), so a many-block file never materializes whole.
"""

from __future__ import annotations

import json
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

MAGIC = b"Obj\x01"

AVRO_FEATURE_SCHEMA = (
    "src string, feature_type string, fid string, geom_wkt string, "
    "properties string"
)

# the reference's AvroSimpleFeature.avsc, verbatim shape (names matter:
# they are written into every file's metadata and checked on read)
FEATURE_COLLECTION_SCHEMA = {
    "name": "AvroSimpleFeatureCollection",
    "namespace": "org.locationtech.geowave.adapter.vector.avro",
    "type": "record",
    "fields": [
        {"name": "featureType", "type": {
            "name": "AvroFeatureDefinition", "type": "record",
            "fields": [
                {"name": "featureTypeName", "type": "string"},
                {"name": "attributeNames",
                 "type": {"type": "array", "items": "string"}},
                {"name": "attributeTypes",
                 "type": {"type": "array", "items": "string"}},
                {"name": "attributeDefaultClassifications",
                 "type": {"type": "array", "items": "string"}},
            ]}},
        {"name": "simpleFeatureCollection", "type": {
            "type": "array", "items": {
                "name": "AvroAttributeValues", "type": "record",
                "fields": [
                    {"name": "fid", "type": "string"},
                    {"name": "values",
                     "type": {"type": "array", "items": "bytes"}},
                    {"name": "classifications", "type": [
                        "null", {"type": "array", "items": "string"}]},
                    {"name": "serializationVersion", "type": "bytes"},
                ]}}},
    ],
}


# ------------------------------------------------------------- binary io

class _Reader:
    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def take(self, n: int) -> bytes:
        b = self.buf[self.pos:self.pos + n]
        if len(b) != n:
            raise ValueError("truncated avro data")
        self.pos += n
        return b

    def long(self) -> int:
        # zig-zag varint (Avro spec, "Binary Encoding / Primitive Types")
        shift, acc = 0, 0
        while True:
            byte = self.buf[self.pos]
            self.pos += 1
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def bytes_(self) -> bytes:
        return self.take(self.long())

    def string(self) -> str:
        return self.bytes_().decode("utf-8")


def _zigzag(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc_bytes(b: bytes) -> bytes:
    return _zigzag(len(b)) + b


def _enc_str(s: str) -> bytes:
    return _enc_bytes(s.encode("utf-8"))


def _enc_array(items: list[bytes]) -> bytes:
    if not items:
        return _zigzag(0)
    return _zigzag(len(items)) + b"".join(items) + _zigzag(0)


# --------------------------------------------------- schema-driven datum

def _decode_datum(r: _Reader, schema, names: dict):
    """Generic Avro binary decode for a (parsed-JSON) writer schema."""
    if isinstance(schema, str):
        if schema in names:
            return _decode_datum(r, names[schema], names)
        if schema == "null":
            return None
        if schema == "boolean":
            return r.take(1) != b"\x00"
        if schema in ("int", "long"):
            return r.long()
        if schema == "float":
            return struct.unpack("<f", r.take(4))[0]
        if schema == "double":
            return struct.unpack("<d", r.take(8))[0]
        if schema == "bytes":
            return r.bytes_()
        if schema == "string":
            return r.string()
        raise ValueError(f"unknown avro type {schema!r}")
    if isinstance(schema, list):  # union: zig-zag branch index first
        return _decode_datum(r, schema[r.long()], names)
    t = schema["type"]
    if t == "record":
        names[schema["name"]] = schema
        return {f["name"]: _decode_datum(r, f["type"], names)
                for f in schema["fields"]}
    if t in ("array", "map"):
        out = [] if t == "array" else {}
        while True:
            n = r.long()
            if n == 0:
                return out
            if n < 0:  # negative count: block byte-size follows (skip it)
                n = -n
                r.long()
            for _ in range(n):
                if t == "array":
                    out.append(_decode_datum(r, schema["items"], names))
                else:
                    k = r.string()  # key BEFORE value (RHS evals first)
                    out[k] = _decode_datum(r, schema["values"], names)
    if t == "enum":
        return schema["symbols"][r.long()]
    if t == "fixed":
        return r.take(schema["size"])
    return _decode_datum(r, t, names)  # {"type": "string"} wrapper form


def read_container(buf: bytes):
    """One Avro OCF -> (writer schema dict, iterator of decoded datums).

    Implements the published container layout: magic, file-metadata map
    (avro.schema / avro.codec), 16-byte sync, then data blocks of
    (object count, compressed byte size, payload, sync) until EOF.
    """
    r = _Reader(buf)
    if r.take(4) != MAGIC:
        raise ValueError("not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.long()
        for _ in range(n):
            k = r.string()  # key BEFORE value (RHS evals first)
            meta[k] = r.bytes_()
    sync = r.take(16)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec {codec!r}")

    def datums():
        while r.pos < len(r.buf):
            count = r.long()
            size = r.long()
            payload = r.take(size)
            if codec == "deflate":  # raw deflate, no zlib header (spec)
                payload = zlib.decompress(payload, -15)
            if r.take(16) != sync:
                raise ValueError("avro block sync mismatch")
            block = _Reader(payload)
            for _ in range(count):
                yield _decode_datum(block, schema, {})

    return schema, datums()


# ------------------------------------------------- geowave feature codec

# attributeTypes hold the binding class names the reference writes
# (GeoWaveAvroFeatureUtils.buildFeatureDefinition); the value codec per
# binding is fixed-width big-endian for numerics, utf-8 for text/WKT
_PACK = {"java.lang.Double": ">d", "java.lang.Float": ">f",
         "java.lang.Long": ">q", "java.lang.Integer": ">i",
         "java.util.Date": ">q"}
_GEOM_TYPES = {
    "org.locationtech.jts.geom.Geometry", "org.locationtech.jts.geom.Point",
    "org.locationtech.jts.geom.LineString",
    "org.locationtech.jts.geom.Polygon",
    "org.locationtech.jts.geom.MultiPolygon",
    "org.locationtech.jts.geom.MultiLineString",
    "org.locationtech.jts.geom.MultiPoint",
}


def _decode_value(type_name: str, raw: bytes):
    if raw == b"":
        return None
    if type_name in _PACK:
        v = struct.unpack(_PACK[type_name], raw)[0]
        if type_name == "java.util.Date":
            return pd.Timestamp(v, unit="ms").isoformat()
        return v
    return raw.decode("utf-8")  # String + geometry-as-WKT


def _encode_value(type_name: str, val) -> bytes:
    if val is None:
        return b""
    if type_name in _PACK:
        if type_name == "java.util.Date":
            val = int(pd.Timestamp(val).value // 1_000_000)
        return struct.pack(_PACK[type_name], val)
    return str(val).encode("utf-8")


def collection_rows(datum: dict, src: str = "") -> pd.DataFrame:
    """One AvroSimpleFeatureCollection datum -> feature rows
    (AVRO_FEATURE_SCHEMA shape; geometry attributes -> geom_wkt, the
    rest -> a sorted-key JSON properties column, like the shapefile
    reader)."""
    ft = datum["featureType"]
    names, types = ft["attributeNames"], ft["attributeTypes"]
    rows = []
    for feat in datum["simpleFeatureCollection"]:
        geom, props = None, {}
        for name, tname, raw in zip(names, types, feat["values"]):
            val = _decode_value(tname, raw)
            if tname in _GEOM_TYPES:
                geom = val
            else:
                props[name] = val
        rows.append({
            "src": src, "feature_type": ft["featureTypeName"],
            "fid": feat["fid"], "geom_wkt": geom,
            "properties": json.dumps(props, sort_keys=True),
        })
    return pd.DataFrame(
        rows, columns=["src", "feature_type", "fid", "geom_wkt",
                       "properties"])


def read_avro_features(spark: SparkSession, path: str) -> DataFrame:
    """Directory/glob of GeoWave Avro vector files -> feature DataFrame,
    parsed fully distributed (binaryFile + mapInPandas, one task per
    file; one output batch per container block so big files stream)."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p, data in zip(pdf["path"], pdf["content"]):
                src = p.rsplit("/", 1)[-1]
                _, datums = read_container(bytes(data))
                for datum in datums:
                    out = collection_rows(datum, src)
                    if len(out):
                        yield out

    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.avro").load(path)
             .select("path", "content"))
    return files.mapInPandas(parse, schema=AVRO_FEATURE_SCHEMA)


# ---------------------------------------------------------------- writer

def _enc_feature_collection(datum: dict) -> bytes:
    ft = datum["featureType"]
    out = [_enc_str(ft["featureTypeName"]),
           _enc_array([_enc_str(s) for s in ft["attributeNames"]]),
           _enc_array([_enc_str(s) for s in ft["attributeTypes"]]),
           _enc_array([_enc_str(s) for s in
                       ft["attributeDefaultClassifications"]])]
    feats = []
    for feat in datum["simpleFeatureCollection"]:
        feats.append(
            _enc_str(feat["fid"])
            + _enc_array([_enc_bytes(b) for b in feat["values"]])
            + _zigzag(0)  # classifications union -> branch 0 = null
            + _enc_bytes(b"\x00"))  # serializationVersion
    out.append(_enc_array(feats))
    return b"".join(out)


def write_avro_features(path: str, feature_type_name: str,
                        attribute_names: list[str],
                        attribute_types: list[str],
                        features: list[tuple[str, list]],
                        codec: str = "deflate",
                        block_size: int = 1000) -> None:
    """Write features as a GeoWave AvroSimpleFeatureCollection OCF —
    the inverse of `read_avro_features`, for export and fixtures (same
    role as `write_shapefile`).  `features` is [(fid, [values...])] with
    values ordered like `attribute_names`."""
    import hashlib

    datum = {
        "featureType": {
            "featureTypeName": feature_type_name,
            "attributeNames": attribute_names,
            "attributeTypes": attribute_types,
            "attributeDefaultClassifications": [""] * len(attribute_names),
        },
        "simpleFeatureCollection": [
            {"fid": fid,
             "values": [_encode_value(t, v)
                        for t, v in zip(attribute_types, vals)]}
            for fid, vals in features
        ],
    }
    schema_json = json.dumps(FEATURE_COLLECTION_SCHEMA)
    # deterministic sync marker (no RNG in the write path)
    sync = hashlib.md5(
        (path + schema_json).encode("utf-8")).digest()
    header = MAGIC + _zigzag(2) \
        + _enc_str("avro.schema") + _enc_bytes(schema_json.encode()) \
        + _enc_str("avro.codec") + _enc_bytes(codec.encode()) \
        + _zigzag(0) + sync

    blocks = []
    coll = datum["simpleFeatureCollection"]
    for i in range(0, max(len(coll), 1), block_size):
        d = {"featureType": datum["featureType"],
             "simpleFeatureCollection": coll[i:i + block_size]}
        payload = _enc_feature_collection(d)
        if codec == "deflate":
            payload = zlib.compress(payload, 6)[2:-4]  # raw deflate
        blocks.append(_zigzag(1) + _zigzag(len(payload)) + payload + sync)

    with open(path, "wb") as f:
        f.write(header + b"".join(blocks))
