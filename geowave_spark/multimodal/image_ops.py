"""Image-payload operators: photometric quality statistics and box-filter
thumbnailing over encoded image bytes.

These are the image-side quality/resize steps of a multimodal
training-data pipeline, built the same way the reference builds its raster
operators — decode → numpy kernel → re-aggregate — but as Arrow-batched
`mapInPandas` stages instead of server-side iterators
(`extensions/adapters/raster/.../RasterDataAdapter.java` decode path,
`analytics/mapreduce/.../kde/` resize pipeline in /root/reference).

Scale notes: both operators are a single narrow `mapInPandas` pass — no
shuffle, no driver traffic; partitions stream Arrow batches, decode each
image once, and emit fixed-width scalar rows, so the stage parallelizes
linearly with input splits at any volume.  The kernels are pure integer
numpy, so the DuckDB oracles (closed-form pixel formula, `table/images.py
luma_sql`) can reproduce every output bit-for-bit without decoding bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..raster import codec
from ..table.images import gray

PHOTO_SCHEMA = (
    "image_id string, w int, h int, mean_luma bigint, contrast bigint"
)
THUMB_SCHEMA = "image_id string, tw int, th int, thumb_sum bigint"


def photometric_stats_df(img: DataFrame) -> DataFrame:
    """Per-image integer luma statistics from the *decoded* payload:
    `mean_luma = sum(luma) // npx`, `contrast = max - min`.

    The usual pre-training quality gates (too dark / blown out / flat)
    filter directly on these columns.
    """

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, means, contrasts = [], [], [], [], []
            for _, r in pdf.iterrows():
                g = gray(codec.decode(r["bytes"], r["fmt"]))
                h, w = g.shape
                ids.append(r["image_id"])
                ws.append(w)
                hs.append(h)
                means.append(int(g.sum()) // (w * h))
                contrasts.append(int(g.max()) - int(g.min()))
            yield pd.DataFrame({
                "image_id": ids,
                "w": np.asarray(ws, dtype=np.int32),
                "h": np.asarray(hs, dtype=np.int32),
                "mean_luma": np.asarray(means, dtype=np.int64),
                "contrast": np.asarray(contrasts, dtype=np.int64),
            })

    return img.select("image_id", "bytes", "fmt").mapInPandas(
        stats, schema=PHOTO_SCHEMA
    )


def box_thumb_sum(g: np.ndarray) -> tuple[int, int, int]:
    """2x2 integer box downsample of a luma plane; returns
    (tw, th, sum of thumbnail pixels).  Each output pixel is
    `floor(block_sum / 4)` — exact integer semantics an independent SQL
    twin can reproduce."""
    h, w = g.shape
    th, tw = h // 2, w // 2
    g = g[: th * 2, : tw * 2].astype(np.int64)
    block = g[0::2, 0::2] + g[1::2, 0::2] + g[0::2, 1::2] + g[1::2, 1::2]
    return tw, th, int((block // 4).sum())


def luma_hist_df(img: DataFrame) -> DataFrame:
    """(image_id, luma, cnt) from the DECODED payload — one narrow
    mapInPandas pass emitting <= 256 rows per image (np.bincount), the
    corpus collapse every histogram-space op downstream (equalization
    q125, histogram matching q299) operates on instead of pixels."""

    def hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, lumas, cnts = [], [], []
            for _, r in pdf.iterrows():
                g = gray(codec.decode(r["bytes"], r["fmt"]))
                c = np.bincount(g.ravel(), minlength=256)
                nz = np.nonzero(c)[0]
                ids.extend([r["image_id"]] * len(nz))
                lumas.extend(nz.tolist())
                cnts.extend(c[nz].tolist())
            yield pd.DataFrame({
                "image_id": ids,
                "luma": np.asarray(lumas, dtype=np.int64),
                "cnt": np.asarray(cnts, dtype=np.int64),
            })

    return img.select("image_id", "bytes", "fmt").mapInPandas(
        hist, schema="image_id string, luma bigint, cnt bigint"
    )


def bilinear_sum(g: np.ndarray, num: int = 3, den: int = 2
                 ) -> tuple[int, int, int]:
    """EXACT-integer bilinear resample of a luma plane to
    (w*num//den, h*num//den), align-corners: source position of output
    ox is the RATIONAL ox*(w-1)/(tw-1), carried as (x0 = numerator div
    T, fx = numerator mod T) with T = tw-1 — no floats anywhere, so a
    SQL twin reproduces every output pixel bit-for-bit (a float bilinear
    would drift in the last ulp across engines).  Output pixel =
    floor(sum of the four corner terms / (T * T2)).  Returns
    (tw, th, checksum = sum of output pixels)."""
    h, w = g.shape
    tw, th = (w * num) // den, (h * num) // den
    T, T2 = tw - 1, th - 1
    ox = np.arange(tw, dtype=np.int64)
    oy = np.arange(th, dtype=np.int64)
    sxn, syn = ox * (w - 1), oy * (h - 1)
    x0, fx = sxn // T, sxn % T
    y0, fy = syn // T2, syn % T2
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    G = g.astype(np.int64)
    p00 = G[np.ix_(y0, x0)]
    p10 = G[np.ix_(y0, x1)]
    p01 = G[np.ix_(y1, x0)]
    p11 = G[np.ix_(y1, x1)]
    wx, wy = fx[None, :], fy[:, None]
    numer = ((T - wx) * (T2 - wy) * p00 + wx * (T2 - wy) * p10
             + (T - wx) * wy * p01 + wx * wy * p11)
    return tw, th, int((numer // (T * T2)).sum())


def bilinear_sums_df(img: DataFrame, num: int = 3, den: int = 2) -> DataFrame:
    """Per-image exact-integer bilinear resize checksum via one narrow
    mapInPandas pass (pixels never shuffle; 4 scalars out per image) —
    the fractional-scale companion of `thumbnail_sums_df`'s 2x box
    filter and `raster/tiles.resize_tiles_df`'s nearest resample."""

    def rz(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, tws, ths, sums = [], [], [], []
            for _, r in pdf.iterrows():
                g = gray(codec.decode(r["bytes"], r["fmt"]))
                tw, th, s = bilinear_sum(g, num, den)
                ids.append(r["image_id"])
                tws.append(tw)
                ths.append(th)
                sums.append(s)
            yield pd.DataFrame({
                "image_id": ids,
                "tw": np.asarray(tws, dtype=np.int32),
                "th": np.asarray(ths, dtype=np.int32),
                "bil_sum": np.asarray(sums, dtype=np.int64),
            })

    return img.select("image_id", "bytes", "fmt").mapInPandas(
        rz, schema="image_id string, tw int, th int, bil_sum bigint"
    )


def thumbnail_sums_df(img: DataFrame) -> DataFrame:
    """2x box-filter thumbnail per image, summarized as a checksum
    (`thumb_sum`) plus thumbnail dims — the resize stage's verifiable
    fingerprint (full thumbnail bytes would just be re-encoded payload)."""

    def thumbs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, tws, ths, sums = [], [], [], []
            for _, r in pdf.iterrows():
                g = gray(codec.decode(r["bytes"], r["fmt"]))
                tw, th, s = box_thumb_sum(g)
                ids.append(r["image_id"])
                tws.append(tw)
                ths.append(th)
                sums.append(s)
            yield pd.DataFrame({
                "image_id": ids,
                "tw": np.asarray(tws, dtype=np.int32),
                "th": np.asarray(ths, dtype=np.int32),
                "thumb_sum": np.asarray(sums, dtype=np.int64),
            })

    return img.select("image_id", "bytes", "fmt").mapInPandas(
        thumbs, schema=THUMB_SCHEMA
    )


EQHIST_SCHEMA = ("image_id string, n_px bigint, sum_eq bigint, "
                 "min_eq bigint, max_eq bigint")


def equalize_hist(g: np.ndarray) -> np.ndarray:
    """Classic integer histogram equalization of a uint8 luma plane:
    ``eq(v) = (cdf(v) - cdf_min) * 255 // (n - cdf_min)`` with ``cdf_min``
    the CDF at the lowest occupied bin (the OpenCV/textbook formula, all
    integer → bit-exact against a SQL window-cumsum twin).  A constant
    image (n == cdf_min) maps to 0."""
    hist = np.bincount(g.ravel(), minlength=256).astype(np.int64)
    cdf = hist.cumsum()
    cdf_min = int(cdf[np.flatnonzero(hist)[0]])
    n = int(g.size)
    if n == cdf_min:
        return np.zeros_like(g, dtype=np.int64)
    lut = (cdf - cdf_min) * 255 // (n - cdf_min)
    return lut[g]


def equalized_stats_df(img: DataFrame) -> DataFrame:
    """Per-image statistics of the histogram-EQUALIZED luma — the contrast
    normalization stage of an image ingest pipeline, summarized as
    verifiable integers (sum/min/max) instead of re-encoded payload.
    One narrow mapInPandas pass; pixels never shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ns, sums, mins, maxs = [], [], [], [], []
            for _, r in pdf.iterrows():
                g = gray(codec.decode(r["bytes"], r["fmt"]))
                eq = equalize_hist(g)
                ids.append(r["image_id"])
                ns.append(eq.size)
                sums.append(int(eq.sum()))
                mins.append(int(eq.min()))
                maxs.append(int(eq.max()))
            yield pd.DataFrame({
                "image_id": ids,
                "n_px": np.asarray(ns, dtype=np.int64),
                "sum_eq": np.asarray(sums, dtype=np.int64),
                "min_eq": np.asarray(mins, dtype=np.int64),
                "max_eq": np.asarray(maxs, dtype=np.int64),
            })

    return img.select("image_id", "bytes", "fmt").mapInPandas(
        run, schema=EQHIST_SCHEMA
    )


QUAD_SCHEMA = "image_id string, quad int, qhash long"


def quadrant_hashes(g: np.ndarray) -> list[int]:
    """Four 64-bit average-hashes, one per image quadrant (quad = qy*2+qx)
    — the crop/shift-robust unit of image dedup: a duplicate that
    preserves any one quadrant still collides on that quadrant's hash.
    Same integer sampling/threshold scheme as `table.images.phash64`, so
    a SQL twin recomputes it closed-form."""
    h, w = g.shape
    h2, w2 = h // 2, w // 2
    yi = (2 * np.arange(8) + 1) * h2 // 16
    xi = (2 * np.arange(8) + 1) * w2 // 16
    out = []
    for qy in (0, 1):
        for qx in (0, 1):
            sub = g[qy * h2:qy * h2 + h2, qx * w2:qx * w2 + w2]
            s = sub[np.ix_(yi, xi)].astype(np.int64)
            bits = (s > (s.sum() // 64)).astype(np.uint8).ravel()
            out.append(int(np.packbits(bits).view(">u8")[0].astype(np.int64)))
    return out


def quadrant_hashes_df(img: DataFrame) -> DataFrame:
    """(image_id, quad, qhash) rows from the decoded payload — one narrow
    mapInPandas pass, 4 rows out per image, pixels never shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, quads, hashes = [], [], []
            for _, r in pdf.iterrows():
                g = gray(codec.decode(r["bytes"], r["fmt"]))
                for q, hv in enumerate(quadrant_hashes(g)):
                    ids.append(r["image_id"])
                    quads.append(q)
                    hashes.append(hv)
            yield pd.DataFrame({
                "image_id": ids,
                "quad": np.asarray(quads, dtype=np.int32),
                "qhash": np.asarray(hashes, dtype=np.int64),
            })

    return img.select("image_id", "bytes", "fmt").mapInPandas(
        run, schema=QUAD_SCHEMA
    )


ISODATA_SCHEMA = "image_id string, thr int, n_fg long, sum_fg long"
ISODATA_ROUNDS = 4


def isodata_threshold(g: np.ndarray, rounds: int = ISODATA_ROUNDS,
                      t0: int = 128) -> int:
    """Isodata (Ridler–Calvard) binarization threshold, integer-exact:
    t <- (floor(mean(v < t)) + floor(mean(v >= t))) // 2, a FIXED number
    of rounds (bounded compute, the q128 contract) from t0 = 128; an
    empty side contributes the current t.  All floor divisions, so a SQL
    twin (conditional sums over the 256-bin histogram, unrolled rounds)
    is bit-exact."""
    v = g.astype(np.int64).ravel()
    t = t0
    for _ in range(rounds):
        below, above = v[v < t], v[v >= t]
        mb = int(below.sum()) // below.size if below.size else t
        ma = int(above.sum()) // above.size if above.size else t
        t = (mb + ma) // 2
    return t


def isodata_stats_df(img: DataFrame) -> DataFrame:
    """Per-image isodata threshold + foreground (v >= thr) count/sum — the
    figure/ground separation pass of document-image pipelines.  Per-image
    scalar iteration runs INSIDE one narrow mapInPandas (embarrassingly
    parallel — zero shuffles; the oracle unrolls the same rounds over the
    histogram in SQL)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, thrs, nfs, sfs = [], [], [], []
            for _, r in pdf.iterrows():
                g = gray(codec.decode(r["bytes"], r["fmt"])).astype(np.int64)
                t = isodata_threshold(g)
                fg = g[g >= t]
                ids.append(r["image_id"])
                thrs.append(t)
                nfs.append(fg.size)
                sfs.append(int(fg.sum()))
            yield pd.DataFrame({
                "image_id": ids,
                "thr": np.asarray(thrs, dtype=np.int32),
                "n_fg": np.asarray(nfs, dtype=np.int64),
                "sum_fg": np.asarray(sfs, dtype=np.int64),
            })

    return img.select("image_id", "bytes", "fmt").mapInPandas(
        run, schema=ISODATA_SCHEMA
    )


MOMENTS_SCHEMA = ("image_id string, m00 long, m10 long, m01 long, "
                  "m20 long, m02 long, m11 long, cx_micro long, "
                  "cy_micro long")


def moments_stats_df(img: DataFrame) -> DataFrame:
    """Per-image raw intensity moments m_pq = sum(x^p * y^q * v) up to
    order 2, plus the integer-micro centroid (m10*1e6 // m00) — the
    shape/orientation summary image-registration pipelines compute before
    alignment.  All int64-exact (v <= 255, x,y < 256 => m20 <= 7e10;
    centroid numerators <= 6e14).  One narrow mapInPandas; zero
    shuffles."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                g = gray(codec.decode(r["bytes"], r["fmt"])).astype(np.int64)
                h, w = g.shape
                xs = np.arange(w, dtype=np.int64)[None, :]
                ys = np.arange(h, dtype=np.int64)[:, None]
                m00 = int(g.sum())
                m10 = int((xs * g).sum())
                m01 = int((ys * g).sum())
                m20 = int((xs * xs * g).sum())
                m02 = int((ys * ys * g).sum())
                m11 = int((xs * ys * g).sum())
                rows.append((r["image_id"], m00, m10, m01, m20, m02, m11,
                             m10 * 1_000_000 // m00 if m00 else 0,
                             m01 * 1_000_000 // m00 if m00 else 0))
            yield pd.DataFrame(rows, columns=[
                "image_id", "m00", "m10", "m01", "m20", "m02", "m11",
                "cx_micro", "cy_micro"])

    return img.select("image_id", "bytes", "fmt").mapInPandas(
        run, schema=MOMENTS_SCHEMA
    )


PATCH = 16
PATCH_STRIDE = 8
PATCH_SCHEMA = ("image_id string, py int, px int, n_px long, sum_v long, "
                "min_v long, max_v long")


def patch_stats_df(img: DataFrame) -> DataFrame:
    """Overlapping training-patch extraction stats: every PATCH x PATCH
    window at PATCH_STRIDE offsets fully inside the image (the ML patch
    sampling grid — stride < size, so patches OVERLAP, unlike the
    disjoint tile relation in `raster/tiles.py`).  Emits per-patch
    integer stats instead of pixel payloads so the relation is verifiable
    and cheap to hash; one narrow mapInPandas, zero shuffles, numpy
    sliding windows inside."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from numpy.lib.stride_tricks import sliding_window_view

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                g = gray(codec.decode(r["bytes"], r["fmt"])).astype(np.int64)
                h, w = g.shape
                if h < PATCH or w < PATCH:
                    continue
                win = sliding_window_view(g, (PATCH, PATCH))[
                    ::PATCH_STRIDE, ::PATCH_STRIDE]
                s = win.sum(axis=(2, 3))
                mn = win.min(axis=(2, 3))
                mx = win.max(axis=(2, 3))
                for py in range(s.shape[0]):
                    for px in range(s.shape[1]):
                        rows.append((r["image_id"], py, px,
                                     PATCH * PATCH, int(s[py, px]),
                                     int(mn[py, px]), int(mx[py, px])))
            yield pd.DataFrame(rows, columns=[
                "image_id", "py", "px", "n_px", "sum_v", "min_v", "max_v"])

    return img.select("image_id", "bytes", "fmt").mapInPandas(
        run, schema=PATCH_SCHEMA
    )


PROFILE_SCHEMA = "image_id string, n_rows long, n_lines long, max_run long"


def line_profile_stats_df(img: DataFrame) -> DataFrame:
    """Text-line detection by horizontal projection profile — the classic
    document-image segmentation primitive: a row is 'ink' when its luma
    sum falls below the image's mean row sum (floor), and each maximal
    run of consecutive ink rows is one detected line.  Integer-exact
    (threshold = total // h); one narrow mapInPandas, zero shuffles."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                g = gray(codec.decode(r["bytes"], r["fmt"])).astype(np.int64)
                h = g.shape[0]
                rs = g.sum(axis=1)
                thr = int(rs.sum()) // h
                ink = rs < thr
                prev = np.concatenate(([False], ink[:-1]))
                starts = int((ink & ~prev).sum())
                max_run = 0
                cur = 0
                for v in ink:
                    cur = cur + 1 if v else 0
                    max_run = max(max_run, cur)
                rows.append((r["image_id"], h, starts, max_run))
            yield pd.DataFrame(rows, columns=[
                "image_id", "n_rows", "n_lines", "max_run"])

    return img.select("image_id", "bytes", "fmt").mapInPandas(
        run, schema=PROFILE_SCHEMA
    )


COMPRESS_SCHEMA = ("image_id string, n_px long, n_runs long, "
                   "lsb_ones long, msb_ones long")


def compress_signature_df(img: DataFrame) -> DataFrame:
    """Compressibility signature per image — the storage-planning scan a
    petabyte image lake runs before choosing codecs: horizontal RLE run
    count (fewer runs => smoother => more compressible), plus LSB/MSB
    bit-plane population (a saturated LSB plane ~ n/2 means sensor noise;
    a structured one means synthetic/graphics content).  All integer;
    one narrow mapInPandas, zero shuffles."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                g = gray(codec.decode(r["bytes"], r["fmt"])).astype(np.int64)
                h, w = g.shape
                n_runs = h + int((g[:, 1:] != g[:, :-1]).sum())
                lsb = int((g & 1).sum())
                msb = int((g >> 7 & 1).sum())
                rows.append((r["image_id"], h * w, n_runs, lsb, msb))
            yield pd.DataFrame(rows, columns=[
                "image_id", "n_px", "n_runs", "lsb_ones", "msb_ones"])

    return img.select("image_id", "bytes", "fmt").mapInPandas(
        run, schema=COMPRESS_SCHEMA
    )


HOG_SCHEMA = ("image_id string, sector int, n_px long, sum_mag long")


def hog_lite_df(img: DataFrame) -> DataFrame:
    """Global gradient-orientation histogram per image (HOG-lite, the
    classic appearance descriptor): Sobel gradients on interior pixels,
    |gx|+|gy| magnitude, orientation quantized into 8 RATIONAL sectors
    (the q138/q168 no-atan2 rule over (gx, gy) signs and the 5|a|<=2|b|
    axis bands); zero-gradient pixels are excluded.  One narrow
    mapInPandas, zero shuffles."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                g = gray(codec.decode(r["bytes"], r["fmt"])).astype(np.int64)
                h, w = g.shape
                gx = np.zeros((h, w), dtype=np.int64)
                gy = np.zeros((h, w), dtype=np.int64)
                for (dy, dx), wt in {(-1, -1): -1, (0, -1): -2, (1, -1): -1,
                                     (-1, 1): 1, (0, 1): 2, (1, 1): 1}.items():
                    gx[1:h - 1, 1:w - 1] += \
                        wt * g[1 + dy:h - 1 + dy, 1 + dx:w - 1 + dx]
                for (dy, dx), wt in {(-1, -1): -1, (-1, 0): -2, (-1, 1): -1,
                                     (1, -1): 1, (1, 0): 2, (1, 1): 1}.items():
                    gy[1:h - 1, 1:w - 1] += \
                        wt * g[1 + dy:h - 1 + dy, 1 + dx:w - 1 + dx]
                gx = gx[1:h - 1, 1:w - 1].ravel()
                gy = gy[1:h - 1, 1:w - 1].ravel()
                ax, ay = np.abs(gx), np.abs(gy)
                mag = ax + ay
                nz = mag > 0
                gx, gy, ax, ay, mag = gx[nz], gy[nz], ax[nz], ay[nz], mag[nz]
                horiz = 5 * ay <= 2 * ax
                vert = 5 * ax <= 2 * ay
                sector = np.where(
                    horiz, np.where(gx > 0, 0, 4),
                    np.where(vert, np.where(gy > 0, 2, 6),
                             np.where((gx > 0) & (gy > 0), 1,
                                      np.where((gx < 0) & (gy > 0), 3,
                                               np.where((gx < 0) & (gy < 0),
                                                        5, 7)))))
                for s in range(8):
                    m = sector == s
                    if m.any():
                        rows.append((r["image_id"], s, int(m.sum()),
                                     int(mag[m].sum())))
            yield pd.DataFrame(rows, columns=[
                "image_id", "sector", "n_px", "sum_mag"])

    return img.select("image_id", "bytes", "fmt").mapInPandas(
        run, schema=HOG_SCHEMA
    )


VIGNETTE_SCHEMA = ("image_id string, center_mean_milli long, "
                   "corner_mean_milli long, ratio_micro long")


def vignette_stats_df(img: DataFrame) -> DataFrame:
    """Vignetting screen: mean luma of the center quarter vs the four
    corner quarters (each w/4 x h/4), as integer milli means plus their
    micro ratio — lens-shading / edge-darkening detection before
    training.  One narrow mapInPandas, zero shuffles."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                g = gray(codec.decode(r["bytes"], r["fmt"])).astype(np.int64)
                h, w = g.shape
                qh, qw = h // 4, w // 4
                cy, cx = h // 2, w // 2
                center = g[cy - qh // 2:cy - qh // 2 + qh,
                           cx - qw // 2:cx - qw // 2 + qw]
                corners = [g[:qh, :qw], g[:qh, w - qw:],
                           g[h - qh:, :qw], g[h - qh:, w - qw:]]
                csum = sum(int(c.sum()) for c in corners)
                cn = sum(c.size for c in corners)
                cm = int(center.sum()) * 1000 // center.size
                km = csum * 1000 // cn
                rows.append((r["image_id"], cm, km,
                             cm * 1_000_000 // km if km else 0))
            yield pd.DataFrame(rows, columns=[
                "image_id", "center_mean_milli", "corner_mean_milli",
                "ratio_micro"])

    return img.select("image_id", "bytes", "fmt").mapInPandas(
        run, schema=VIGNETTE_SCHEMA
    )
