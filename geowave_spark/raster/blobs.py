"""Distributed connected-component (blob) labeling over tiled rasters.

The segmentation primitive of an image pipeline (object counting, mask
cleanup, min-blob-size screens) — expressed the way it must be at 100 TB,
where a scene does not fit on one executor: each tile labels its own mask
locally (numpy payload, embarrassingly parallel), tiles exchange ONLY their
1-px boundary label strips, and the cross-tile label equivalences are
resolved by the same alternating large-star/small-star contraction that
powers the dedup-cluster operator (`agg/components.py`, Kiveris et al.
SoCC 2014).  No node ever holds a whole image's mask; the labels ARE the
table.

Reference analog: none — GeoWave's raster layer stops at tile merge/resize
(`RasterTileResizeSparkRunner.java` in /root/reference); its closest
cluster-union machinery is DBSCAN's (`analytics/mapreduce/.../dbscan/
DBScanMapReduce.java`), which this generalizes to pixel grids.

Plan shape: one mapInPandas (decode + local CC), two self-joins on the
tile key for the boundary strips (broadcast-able: strip rows are tiny
relative to pixels), the star-contraction rounds on the equivalence edge
list, and keyed rollups.  Tile payloads never shuffle — only label ids.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TILE = 16
_CROP = 32
_THRESH = 128

_SCHEMA = (
    "image_id string, docnum long, ty int, tx int, "
    "lbl_ids array<long>, lbl_sizes array<long>, "
    "left_lbl array<long>, right_lbl array<long>, "
    "top_lbl array<long>, bottom_lbl array<long>"
)


def _local_cc(mask: np.ndarray) -> tuple[np.ndarray, int]:
    """4-connected labeling of one tile's boolean mask: labels 0..n-1,
    -1 where unmasked.  Pure-python BFS over <= 256 px — the per-tile
    payload; everything cross-tile is relational."""
    h, w = mask.shape
    lab = np.full((h, w), -1, np.int64)
    nxt = 0
    for y in range(h):
        for x in range(w):
            if mask[y, x] and lab[y, x] < 0:
                stack = [(y, x)]
                lab[y, x] = nxt
                while stack:
                    cy, cx = stack.pop()
                    for ny, nx in ((cy + 1, cx), (cy - 1, cx),
                                   (cy, cx + 1), (cy, cx - 1)):
                        if (0 <= ny < h and 0 <= nx < w and mask[ny, nx]
                                and lab[ny, nx] < 0):
                            lab[ny, nx] = nxt
                            stack.append((ny, nx))
                nxt += 1
    return lab, nxt


def tile_label_rows(images: DataFrame) -> DataFrame:
    """images(image_id, bytes, fmt) -> one row per crop tile with local
    labels mapped to globally-unique ids and the four boundary strips.

    Global id = (docnum * n_tiles + tile_index) * 512 + local_label —
    unique because a 16x16 4-connected mask has < 512 components."""
    from ..table.images import gray
    from . import codec

    nty = ntx = _CROP // _TILE

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                image_id = pdf["image_id"].iloc[i]
                docnum = int(image_id[3:])
                px = codec.decode(bytes(pdf["bytes"].iloc[i]),
                                  pdf["fmt"].iloc[i])
                mask = gray(px)[:_CROP, :_CROP] >= _THRESH
                for ty in range(nty):
                    for tx in range(ntx):
                        sub = mask[ty * _TILE:(ty + 1) * _TILE,
                                   tx * _TILE:(tx + 1) * _TILE]
                        lab, n = _local_cc(sub)
                        base = (docnum * nty * ntx + ty * ntx + tx) * 512
                        glab = np.where(lab >= 0, lab + base, -1)
                        sizes = [int((lab == k).sum()) for k in range(n)]
                        rows.append((
                            image_id, docnum, ty, tx,
                            [base + k for k in range(n)], sizes,
                            glab[:, 0].tolist(), glab[:, -1].tolist(),
                            glab[0, :].tolist(), glab[-1, :].tolist(),
                        ))
            if rows:
                yield pd.DataFrame(rows, columns=[
                    "image_id", "docnum", "ty", "tx", "lbl_ids",
                    "lbl_sizes", "left_lbl", "right_lbl", "top_lbl",
                    "bottom_lbl"])

    return images.mapInPandas(gen, schema=_SCHEMA)


def blob_stats(images: DataFrame) -> DataFrame:
    """Per-image blob census over the 32x32 crop: blob count, largest
    blob size, masked-pixel total — after resolving cross-tile label
    equivalences globally."""
    from ..agg.components import connected_components

    tiles = tile_label_rows(images).persist()
    tiles.count()  # materialize once: three consumers below

    v = tiles.select("image_id", "ty", "tx",
                     F.col("bottom_lbl").alias("s1"))
    v2 = tiles.select("image_id", (F.col("ty") - 1).alias("ty"), "tx",
                      F.col("top_lbl").alias("s2"))
    h = tiles.select("image_id", "ty", "tx",
                     F.col("right_lbl").alias("s1"))
    h2 = tiles.select("image_id", "ty", (F.col("tx") - 1).alias("tx"),
                      F.col("left_lbl").alias("s2"))

    def zip_edges(x, y):
        p = x.join(y, ["image_id", "ty", "tx"])
        z = p.select(F.explode(F.arrays_zip("s1", "s2")).alias("z"))
        return z.select(F.col("z.s1").alias("a"), F.col("z.s2").alias("b")) \
            .filter((F.col("a") >= 0) & (F.col("b") >= 0))

    edges = zip_edges(h, h2).unionByName(zip_edges(v, v2))
    comp = connected_components(edges, "a", "b")

    nodes = tiles.select(
        "image_id",
        F.explode(F.arrays_zip(F.col("lbl_ids").alias("gid"),
                               F.col("lbl_sizes").alias("sz"))).alias("n"),
    ).select("image_id", F.col("n.gid").alias("gid"),
             F.col("n.sz").alias("sz"))

    lab = nodes.join(comp, nodes.gid == comp.node, "left") \
        .select("image_id", F.coalesce("component", "gid").alias("comp"),
                "sz")
    per_comp = lab.groupBy("image_id", "comp") \
        .agg(F.sum("sz").alias("blob_px"))
    out = per_comp.groupBy("image_id").agg(
        F.count("*").cast("bigint").alias("n_blobs"),
        F.max("blob_px").cast("bigint").alias("max_blob"),
        F.sum("blob_px").cast("bigint").alias("n_masked"),
    )
    tiles.unpersist()
    return out
