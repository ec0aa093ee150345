"""Deterministic image+caption table — the north-rule input relation.

BASELINE.json input_hint schema, reproduced exactly:
    (image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
     caption:string, phash:int64)
plus a geo-footprint (lon0, lat0, lon1, lat1) that drives raster<->vector
tile assignment.

Derivation: every field is a pure function of `doc_id` from the driver's
`documents.parquet` (caption = the document text verbatim — so caption
equality checks trace back to driver-owned data, and no external data is
used).  Scalar fields use the same integer-arithmetic style as
`table/geo.py`, so the DuckDB oracle can recompute w/h/fmt/footprint in
closed form; pixels and phash are recomputed independently in tests.

Pixel content is an integer-deterministic gradient+stripe field — codec
round-trips and PSNR checks don't care about content, only that it is
reproducible bit-for-bit anywhere (driver, executor, test process).

Generation is distributed: `mapInPandas` over the documents table, pixel
math vectorized per image, zlib per buffer.  No driver-side loops.
Reference analog: GeoWave ingests coverages via RasterDataAdapter
(`extensions/adapters/raster/.../RasterDataAdapter.java:444` in
/root/reference); we ingest by synthesizing coverage rows directly.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from ..raster import codec
from . import geo

IMG_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long, lon0 double, lat0 double, "
    "lon1 double, lat1 double"
)

FMTS = ("png", "raw", "q6")

# --- closed-form scalar fields (Spark SQL == DuckDB SQL == numpy below) ----


def image_id_sql(doc_id: str = "doc_id") -> str:
    # 'string' is a valid type alias in BOTH Spark SQL and DuckDB
    return f"concat('img', lpad(cast({doc_id} as string), 10, '0'))"


def w_sql(doc_id: str = "doc_id") -> str:
    return f"cast(32 + ({doc_id} * 13) % 7 * 8 as int)"


def h_sql(doc_id: str = "doc_id") -> str:
    return f"cast(32 + ({doc_id} * 17) % 6 * 8 as int)"


def fmt_sql(doc_id: str = "doc_id") -> str:
    return (
        f"case {doc_id} % 3 when 0 then 'png' when 1 then 'raw' else 'q6' end"
    )


def footprint_sql(doc_id: str = "doc_id") -> dict[str, str]:
    """Geo-footprint bbox: deterministic center + half-extent in degrees."""
    cx = geo.lon_sql(f"{doc_id} * 7919 + 3")
    cy = geo.lat_sql(f"{doc_id} * 104729 + 19")
    hw = f"(1.5e0 + ({doc_id} % 250) / 1e2)"   # half-width  1.50 .. 3.99 deg
    hh = f"(1.0e0 + ({doc_id} % 170) / 1e2)"   # half-height 1.00 .. 2.69 deg
    return {
        "lon0": f"greatest({cx} - {hw}, -180e0)",
        "lat0": f"greatest({cy} - {hh}, -90e0)",
        "lon1": f"least({cx} + {hw}, 180e0)",
        "lat1": f"least({cy} + {hh}, 90e0)",
    }


def images_base_sql(src: str = "documents") -> str:
    """Scalar projection of the image table (everything except bytes/phash)
    — shared verbatim by Spark and the DuckDB oracle."""
    fp = footprint_sql()
    return (
        f"SELECT doc_id, {image_id_sql()} AS image_id, {w_sql()} AS w, "
        f"{h_sql()} AS h, {fmt_sql()} AS fmt, text AS caption, "
        f"{fp['lon0']} AS lon0, {fp['lat0']} AS lat0, "
        f"{fp['lon1']} AS lon1, {fp['lat1']} AS lat1 FROM {src}"
    )


def luma_sql(x: str, y: str, doc_id: str = "doc_id",
             decoded: bool = False) -> str:
    """Closed-form integer luma of pixel (x, y) — the SQL twin of
    `gen_pixels` + `gray` (all operands nonnegative, so SQL % == numpy %).
    Lets DuckDB oracles recompute per-pixel statistics and phashes without
    ever decoding bytes: a fully independent check of the engine's
    decode -> numpy path.

    ``decoded=True`` models the codec round-trip instead of the original
    pixels: the q6 format (doc_id % 3 = 2) is lossy — decode reconstructs
    each channel at its 4-wide bin center, (v // 4) * 4 + 2 (raster/
    codec.py q6_decode); png and raw round-trip exactly."""
    r, g, bl = channels_sql(x, y, doc_id, decoded)
    return f"(({r} * 299 + {g} * 587 + {bl} * 114) // 1000)"


def channels_sql(x: str, y: str, doc_id: str = "doc_id",
                 decoded: bool = False) -> tuple[str, str, str]:
    """Closed-form (r, g, b) channel expressions of pixel (x, y) — see
    `luma_sql` for the decoded-vs-original contract."""
    base = f"(({x}) * (3 + ({doc_id} * 31) % 11) + ({y}) * (5 + ({doc_id} * 57) % 13) + {doc_id} * 97)"
    r = f"({base} % 256)"
    g = f"(({base} * 3 + ((({x}) + ({y})) % 17) * 40) % 256)"
    bl = f"(({base} * 7 + (({x}) % 23) * 29) % 256)"
    if decoded:
        r, g, bl = (
            f"(CASE WHEN {doc_id} % 3 = 2 THEN ({c} // 4) * 4 + 2 ELSE {c} END)"
            for c in (r, g, bl)
        )
    return r, g, bl


# --- pixel synthesis (numpy mirror of nothing — pixels are engine-only) ----


def gen_pixels(doc_id: int, w: int, h: int) -> np.ndarray:
    """Deterministic RGB field, integer math only: gradient + stripes."""
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    a = 3 + (doc_id * 31) % 11
    b = 5 + (doc_id * 57) % 13
    base = x * a + y * b + doc_id * 97
    r = base % 256
    g = (base * 3 + ((x + y) % 17) * 40) % 256
    bl = (base * 7 + (x % 23) * 29) % 256
    return np.stack([r, g, bl], axis=-1).astype(np.uint8)


def gray(img: np.ndarray) -> np.ndarray:
    """Integer luma (h, w) from (h, w, 3+) uint8."""
    im = img.astype(np.int64)
    return (im[:, :, 0] * 299 + im[:, :, 1] * 587 + im[:, :, 2] * 114) // 1000


def phash64(img: np.ndarray) -> int:
    """64-bit average hash: nearest-sample gray to 8x8, bit = px > mean.

    Integer-only so it is platform-independent.  Signed int64 for Spark's
    LongType (bit 63 may be set).
    """
    g = gray(img)
    h, w = g.shape
    yi = (2 * np.arange(8) + 1) * h // 16
    xi = (2 * np.arange(8) + 1) * w // 16
    s = g[np.ix_(yi, xi)]
    bits = (s > (s.sum() // 64)).astype(np.uint8).ravel()
    # bits[0] is the MSB — big-endian packbits is bit-identical to the
    # former (val << 1 | bit) fold, at ~half the per-image cost
    return int(np.packbits(bits).view(">u8")[0].astype(np.int64))


def hamming64(a, b) -> np.ndarray:
    """Vectorized Hamming distance between int64 phashes."""
    x = (np.asarray(a, dtype=np.int64).astype(np.uint64)
         ^ np.asarray(b, dtype=np.int64).astype(np.uint64))
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    return cnt


def gen_images_pdf(docs: pd.DataFrame) -> pd.DataFrame:
    """documents batch (doc_id, text) -> full image-row batch."""
    doc_id = docs["doc_id"].to_numpy(dtype=np.int64)
    ws = 32 + (doc_id * 13) % 7 * 8
    hs = 32 + (doc_id * 17) % 6 * 8
    fmt_idx = doc_id % 3
    # footprint — numpy mirror of footprint_sql()
    cx = ((doc_id * 7919 + 3) % geo.LON_MOD) * geo.LON_MULT % geo.LON_MOD / 1e6 - 180.0
    cy = ((doc_id * 104729 + 19) % geo.LAT_MOD) * geo.LAT_MULT % geo.LAT_MOD / 1e6 - 90.0
    hw = 1.5 + (doc_id % 250) / 1e2
    hh = 1.0 + (doc_id % 170) / 1e2
    blobs, phashes, fmts = [], [], []
    for i in range(len(doc_id)):  # per-image loop; pixel math vectorized
        img = gen_pixels(int(doc_id[i]), int(ws[i]), int(hs[i]))
        f = FMTS[int(fmt_idx[i])]
        blobs.append(codec.encode(img, f))
        phashes.append(phash64(img))
        fmts.append(f)
    return pd.DataFrame(
        {
            "image_id": ["img" + str(d).zfill(10) for d in doc_id.tolist()],
            "bytes": blobs,
            "w": ws.astype(np.int32),
            "h": hs.astype(np.int32),
            "fmt": fmts,
            "caption": docs["text"].astype(str),
            "phash": np.asarray(phashes, dtype=np.int64),
            "lon0": np.maximum(cx - hw, -180.0),
            "lat0": np.maximum(cy - hh, -90.0),
            "lon1": np.minimum(cx + hw, 180.0),
            "lat1": np.minimum(cy + hh, 90.0),
        }
    )


def _register_documents(spark, sf_dir: str) -> None:
    """Register only the documents view, skipping the footer read when
    `views.register_views` already registered this sf_dir's tables."""
    if getattr(spark, "_geowave_views_sf", None) == sf_dir:
        return
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )


def images_scalars_df(spark, sf_dir: str):
    """Scalar projection of the image table (no pixel synthesis).

    Pure Spark SQL over documents.parquet — full WholeStageCodegen, Parquet
    column pruning reaches the scan.  Use this whenever a downstream operator
    needs only footprint/shape/caption metadata (e.g. the tile-assignment
    *plan*): `mapInPandas` synthesis is an opaque boundary Catalyst cannot
    prune columns through, so going through `images_df` would pay full pixel
    generation for rows whose pixels are never read.
    """
    _register_documents(spark, sf_dir)
    return spark.sql(images_base_sql())


def images_df(spark, sf_dir: str, mult: int = 1):
    """Distributed image-table synthesis over documents.parquet.

    The source file is tiny (one scan partition), but synthesis is
    CPU-bound — repartition to the cluster's parallelism so every core
    works (on a real 100 TB table the file splits provide this for free).
    ``mult`` replicates each doc into ``mult`` distinct images
    (doc_id' = doc_id * mult + i) for scale testing.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    if mult > 1:
        from pyspark.sql import functions as F  # noqa: N812

        docs = docs.crossJoin(spark.range(mult).select(F.col("id").alias("m_"))) \
            .select((F.col("doc_id") * mult + F.col("m_")).alias("doc_id"), "text")
    docs = docs.repartition(spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield gen_images_pdf(pdf)

    return docs.mapInPandas(gen, schema=IMG_SCHEMA)


# --- duplicate-content variant (exact-dedup workloads) ---------------------

DUP_IMG_SCHEMA = "image_id string, bytes binary, w int, h int, fmt string"


def gen_dup_images_pdf(docs: pd.DataFrame, content_mod: int) -> pd.DataFrame:
    """Like `gen_images_pdf` but ALL content (dims, format, pixels) derives
    from `doc_id % content_mod`, so rows with equal seeds carry
    byte-identical payloads — exact duplicates by construction, while
    image_id stays per-doc.  Independent oracles group by the seed without
    ever touching bytes."""
    doc_id = docs["doc_id"].to_numpy(dtype=np.int64)
    seed = doc_id % content_mod
    ws = 32 + (seed * 13) % 7 * 8
    hs = 32 + (seed * 17) % 6 * 8
    fmt_idx = seed % 3
    blobs, fmts = [], []
    for i in range(len(doc_id)):
        img = gen_pixels(int(seed[i]), int(ws[i]), int(hs[i]))
        f = FMTS[int(fmt_idx[i])]
        blobs.append(codec.encode(img, f))
        fmts.append(f)
    return pd.DataFrame(
        {
            "image_id": ["img" + str(d).zfill(10) for d in doc_id.tolist()],
            "bytes": blobs,
            "w": ws.astype(np.int32),
            "h": hs.astype(np.int32),
            "fmt": fmts,
        }
    )


def dup_images_df(spark, sf_dir: str, content_mod: int = 101):
    """Distributed synthesis of the duplicate-content image table."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    docs = docs.repartition(spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield gen_dup_images_pdf(pdf, content_mod)

    return docs.mapInPandas(gen, schema=DUP_IMG_SCHEMA)


def gen_rot_dup_images_pdf(docs: pd.DataFrame,
                           content_mod: int = 101) -> pd.DataFrame:
    """Like `gen_dup_images_pdf` but each row's payload is the seed image
    ROTATED by (doc_id % 4) x 90° — rotated duplicates by construction.
    All three codecs commute with rotation (png/raw are lossless; q6
    quantizes per pixel), so decode(encode(rot90^k(img))) ==
    rot90^k(decode(encode(img))) exactly and a rotation-canonical hash
    can unify the group."""
    doc_id = docs["doc_id"].to_numpy(dtype=np.int64)
    seed = doc_id % content_mod
    ws = 32 + (seed * 13) % 7 * 8
    hs = 32 + (seed * 17) % 6 * 8
    fmt_idx = seed % 3
    rot = doc_id % 4
    blobs, fmts, out_w, out_h = [], [], [], []
    for i in range(len(doc_id)):
        img = gen_pixels(int(seed[i]), int(ws[i]), int(hs[i]))
        img = np.rot90(img, k=int(rot[i]))
        f = FMTS[int(fmt_idx[i])]
        blobs.append(codec.encode(np.ascontiguousarray(img), f))
        fmts.append(f)
        out_h.append(img.shape[0])
        out_w.append(img.shape[1])
    return pd.DataFrame(
        {
            "image_id": ["img" + str(d).zfill(10) for d in doc_id.tolist()],
            "bytes": blobs,
            "w": np.asarray(out_w, dtype=np.int32),
            "h": np.asarray(out_h, dtype=np.int32),
            "fmt": fmts,
        }
    )


def rot_dup_images_df(spark, sf_dir: str, content_mod: int = 101):
    """Distributed synthesis of the rotated-duplicate image table."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    docs = docs.repartition(spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield gen_rot_dup_images_pdf(pdf, content_mod)

    return docs.mapInPandas(gen, schema=DUP_IMG_SCHEMA)
