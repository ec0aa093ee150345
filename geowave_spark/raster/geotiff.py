"""GeoTIFF raster ingest -> engine image rows (pure-struct TIFF parser).

Reference analog (/root/reference): the GeoTools raster ingest plugin
`extensions/formats/geotools-raster/src/main/java/.../geotools/raster/
GeoToolsRasterDataStoreIngestPlugin.java` (GridCoverage reader there;
a parser of the public TIFF 6.0 + GeoTIFF tag layout here — the sandbox
has no GDAL/PIL, and the format's baseline subset is a few dozen lines
of struct).  Output rows use the engine's image schema (`table/
images.py`), so ingested rasters flow straight into the tile pipeline
(`raster/tiles.py`), mirroring `RasterDataAdapter.java:444-550`
(coverage -> tiles per insertion id).

Supported subset (asserted by the round-trip tests):
  - both byte orders ("II"/"MM"), classic TIFF (magic 42)
  - 8-bit unsigned samples, 1 or 3+ samples/pixel, chunky planar config
  - strip OR tile organization
  - Compression: 1 (none), 8 (Adobe deflate/zlib), 32773 (PackBits)
  - GeoTIFF georeferencing: ModelPixelScale (33550) + ModelTiepoint
    (33922) -> lon/lat footprint (the north-up affine case; rotated
    ModelTransformation rasters are rejected loudly)

Scale shape: one .tif is the unit of parallelism (strips/tiles of one
IFD interleave arbitrarily in the byte stream — not block-splittable),
exactly as the reference opens one GridCoverage reader per file; a
directory fans out one task per file via binaryFile + mapInPandas.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from . import codec

GEOTIFF_ROW_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long, "
    "lon0 double, lat0 double, lon1 double, lat1 double"
)

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 12: 8}


def _read_ifd(buf: bytes, bo: str):
    off = struct.unpack_from(f"{bo}I", buf, 4)[0]
    n = struct.unpack_from(f"{bo}H", buf, off)[0]
    tags = {}
    for i in range(n):
        e = off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(f"{bo}HHI", buf, e)
        size = _TYPE_SIZE.get(typ, 1) * cnt
        voff = e + 8 if size <= 4 else struct.unpack_from(f"{bo}I", buf, e + 8)[0]
        if typ == 3:
            vals = struct.unpack_from(f"{bo}{cnt}H", buf, voff)
        elif typ == 4:
            vals = struct.unpack_from(f"{bo}{cnt}I", buf, voff)
        elif typ == 12:
            vals = struct.unpack_from(f"{bo}{cnt}d", buf, voff)
        elif typ == 1:
            vals = struct.unpack_from(f"{bo}{cnt}B", buf, voff)
        else:
            vals = (voff,)
        tags[tag] = vals
    return tags


def _unpackbits(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i:i + n + 1]
            i += n + 1
        elif n > 128:
            out += data[i:i + 1] * (257 - n)
            i += 1
    return bytes(out)


def parse_geotiff(buf: bytes) -> tuple[np.ndarray, dict]:
    """TIFF bytes -> (uint8 (h, w, ch) pixels, meta with the footprint)."""
    if buf[:2] == b"II":
        bo = "<"
    elif buf[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF (bad byte-order mark)")
    if struct.unpack_from(f"{bo}H", buf, 2)[0] != 42:
        raise ValueError("not a classic TIFF (magic != 42)")
    t = _read_ifd(buf, bo)
    w, h = t[256][0], t[257][0]
    spp = t.get(277, (1,))[0]
    bits = t.get(258, (8,) * spp)
    if any(b != 8 for b in bits):
        raise ValueError(f"only 8-bit samples supported, got {bits}")
    if t.get(284, (1,))[0] != 1:
        raise ValueError("only chunky planar configuration supported")
    comp = t.get(259, (1,))[0]
    if 34264 in t or 33920 in t:
        raise ValueError("rotated ModelTransformation rasters unsupported")

    def segments():
        if 324 in t:  # tiled
            tw, th = t[322][0], t[323][0]
            offs, cnts = t[324], t[325]
            per_row = (w + tw - 1) // tw
            for i, (o, c) in enumerate(zip(offs, cnts)):
                yield (i % per_row) * tw, (i // per_row) * th, tw, th, o, c
        else:          # strips
            rps = t.get(278, (h,))[0]
            offs, cnts = t[273], t[279]
            for i, (o, c) in enumerate(zip(offs, cnts)):
                y0 = i * rps
                yield 0, y0, w, min(rps, h - y0), o, c

    img = np.zeros((h, w, spp), dtype=np.uint8)
    for x0, y0, sw, sh, o, c in segments():
        raw = bytes(buf[o:o + c])
        need = sw * sh * spp
        if comp == 8:
            raw = zlib.decompress(raw)
        elif comp == 32773:
            raw = _unpackbits(raw, need)
        elif comp != 1:
            raise ValueError(f"unsupported compression {comp}")
        seg = np.frombuffer(raw[:need], dtype=np.uint8).reshape(sh, sw, spp)
        cw, ch_ = min(sw, w - x0), min(sh, h - y0)
        img[y0:y0 + ch_, x0:x0 + cw] = seg[:ch_, :cw]

    meta = {"w": w, "h": h, "bands": spp}
    if 33550 in t and 33922 in t:
        sx, sy = t[33550][0], t[33550][1]
        # tiepoint: raster (i, j, k) -> model (x, y, z); north-up: the
        # model Y DECREASES down the raster
        i0, j0, _, mx, my = t[33922][0], t[33922][1], t[33922][2], \
            t[33922][3], t[33922][4]
        lon0 = mx - i0 * sx
        lat1 = my + j0 * sy
        meta.update(lon0=lon0, lat1=lat1,
                    lon1=lon0 + w * sx, lat0=lat1 - h * sy)
    return img, meta


def read_geotiff(spark: SparkSession, path: str,
                 fmt: str = "raw") -> DataFrame:
    """Directory/glob of .tif(f) files -> engine image rows (one task per
    file).  Pixels re-encode with the engine codec (`fmt`: raw/png/q6),
    footprint columns come from the GeoTIFF tags, and `phash` is the
    same average-hash the synthetic table carries — so ingested rasters
    are drop-in rows for the tile/mosaic/pyramid operators AND the
    phash near-dup query (q46)."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p, data in zip(pdf["path"], pdf["content"]):
                img, meta = parse_geotiff(bytes(data))
                gray = img.mean(axis=2)
                small = gray[:: max(1, img.shape[0] // 8),
                             :: max(1, img.shape[1] // 8)][:8, :8]
                bits = (small >= small.mean()).ravel()
                ph = 0
                for b in bits[:64]:
                    ph = (ph << 1) | int(b)
                rows.append({
                    "image_id": p.rsplit("/", 1)[-1],
                    "bytes": codec.encode(img, fmt),
                    "w": meta["w"], "h": meta["h"], "fmt": fmt,
                    "caption": "", "phash": np.int64(np.uint64(ph).astype(np.int64)),
                    "lon0": meta.get("lon0"), "lat0": meta.get("lat0"),
                    "lon1": meta.get("lon1"), "lat1": meta.get("lat1"),
                })
            if rows:
                yield pd.DataFrame(rows)

    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.tif*").load(path)
             .select("path", "content"))
    return files.mapInPandas(parse, schema=GEOTIFF_ROW_SCHEMA)


# ---------------------------------------------------------------- writer

def write_geotiff(path: str, img: np.ndarray, *,
                  origin: tuple[float, float], scale: tuple[float, float],
                  compression: str = "deflate", tile_px: int = 0,
                  big_endian: bool = False) -> None:
    """Minimal GeoTIFF writer (tests + export parity): 8-bit chunky
    pixels, one strip or square tiles, none/deflate/packbits compression,
    ModelPixelScale + ModelTiepoint georeferencing.  ``origin`` is the
    model (lon, lat) of the raster's top-left corner; ``scale`` is
    (sx, sy) degrees per pixel (sy positive, decreasing southward)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, spp = img.shape
    bo = ">" if big_endian else "<"
    comp_id = {"none": 1, "deflate": 8, "packbits": 32773}[compression]

    def pack_seg(seg: np.ndarray) -> bytes:
        raw = seg.tobytes()
        if comp_id == 8:
            return zlib.compress(raw, 6)
        if comp_id == 32773:  # literal-only PackBits (valid, not minimal)
            out = bytearray()
            for i in range(0, len(raw), 128):
                chunk = raw[i:i + 128]
                out += bytes([len(chunk) - 1]) + chunk
            return bytes(out)
        return raw

    segs = []
    if tile_px:
        for ty in range(0, h, tile_px):
            for tx in range(0, w, tile_px):
                tile = np.zeros((tile_px, tile_px, spp), dtype=np.uint8)
                part = img[ty:ty + tile_px, tx:tx + tile_px]
                tile[: part.shape[0], : part.shape[1]] = part
                segs.append(pack_seg(tile))
    else:
        segs.append(pack_seg(img))

    header_end = 8
    # lay out: header, segment data, then IFD + out-of-line values
    seg_offs = []
    pos = header_end
    for s in segs:
        seg_offs.append(pos)
        pos += len(s)
    ifd_off = pos + (pos % 2)

    entries = []  # (tag, type, count, packed-or-values)
    extra = bytearray()

    def add(tag, typ, vals):
        entries.append((tag, typ, vals))

    add(256, 4, [w])
    add(257, 4, [h])
    add(258, 3, [8] * spp)
    add(259, 3, [comp_id])
    add(262, 3, [2 if spp >= 3 else 1])
    add(277, 3, [spp])
    add(284, 3, [1])
    add(339, 3, [1] * spp)
    if tile_px:
        add(322, 3, [tile_px])
        add(323, 3, [tile_px])
        add(324, 4, seg_offs)
        add(325, 4, [len(s) for s in segs])
    else:
        add(273, 4, seg_offs)
        add(278, 4, [h])
        add(279, 4, [len(s) for s in segs])
    add(33550, 12, [float(scale[0]), float(scale[1]), 0.0])
    add(33922, 12, [0.0, 0.0, 0.0, float(origin[0]), float(origin[1]), 0.0])
    entries.sort(key=lambda e: e[0])

    n = len(entries)
    ifd_size = 2 + 12 * n + 4
    extra_off = ifd_off + ifd_size
    ifd = bytearray(struct.pack(f"{bo}H", n))
    for tag, typ, vals in entries:
        cnt = len(vals)
        fmt = {3: "H", 4: "I", 12: "d"}[typ]
        payload = struct.pack(f"{bo}{cnt}{fmt}", *vals)
        if len(payload) <= 4:
            payload = payload.ljust(4, b"\x00")
            ifd += struct.pack(f"{bo}HHI", tag, typ, cnt) + payload
        else:
            ifd += struct.pack(f"{bo}HHII", tag, typ, cnt,
                               extra_off + len(extra))
            extra += payload
    ifd += struct.pack(f"{bo}I", 0)

    with open(path, "wb") as fh:
        fh.write((b"II" if bo == "<" else b"MM")
                 + struct.pack(f"{bo}H", 42) + struct.pack(f"{bo}I", ifd_off))
        for s in segs:
            fh.write(s)
        if ifd_off > pos:
            fh.write(b"\x00")
        fh.write(ifd)
        fh.write(extra)
