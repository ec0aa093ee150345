"""GeoTIFF ingest: pure-struct parser/writer round-trips + distributed
read into the engine's tile pipeline.

Reference parity: GeoTools raster ingest (`extensions/formats/
geotools-raster/.../GeoToolsRasterDataStoreIngestPlugin.java` in
/root/reference) feeding `RasterDataAdapter.java:444-550` tiling.
"""
from __future__ import annotations

import numpy as np
import pytest

from geowave_spark.raster import codec
from geowave_spark.raster import geotiff as gt


@pytest.mark.parametrize("shape,kw", [
    ((33, 47), {"compression": "none"}),
    ((64, 50, 3), {"compression": "deflate"}),
    ((70, 90, 3), {"compression": "packbits", "tile_px": 32}),
    ((16, 16), {"big_endian": True}),
])
def test_geotiff_roundtrip(tmp_path, shape, kw):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    p = tmp_path / "x.tif"
    gt.write_geotiff(str(p), img, origin=(-10.0, 50.0),
                     scale=(0.01, 0.02), **kw)
    out, meta = gt.parse_geotiff(p.read_bytes())
    want = img[:, :, None] if img.ndim == 2 else img
    assert np.array_equal(out, want)
    h, w = shape[0], shape[1]
    assert (meta["w"], meta["h"]) == (w, h)
    assert meta["lon0"] == -10.0 and meta["lat1"] == 50.0
    assert abs(meta["lon1"] - (-10.0 + 0.01 * w)) < 1e-9
    assert abs(meta["lat0"] - (50.0 - 0.02 * h)) < 1e-9


def test_geotiff_rejects_unsupported(tmp_path):
    with pytest.raises(ValueError):
        gt.parse_geotiff(b"XX\x00\x00garbage")
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    p = tmp_path / "t.tif"
    gt.write_geotiff(str(p), img, origin=(0, 0), scale=(1, 1))
    buf = bytearray(p.read_bytes())
    # flip the magic
    buf[2] = 43
    with pytest.raises(ValueError):
        gt.parse_geotiff(bytes(buf))


def test_read_geotiff_distributed_into_tiles(spark, tmp_path):
    """Ingested GeoTIFFs are drop-in rows for the tile-assignment plan:
    decode(bytes, fmt) reproduces the pixels and the footprint drives the
    cover — the RasterDataAdapter coverage->tiles path end-to-end."""
    rng = np.random.default_rng(9)
    imgs = {}
    for i in range(4):
        img = rng.integers(0, 256, (40 + 8 * i, 52, 3), dtype=np.uint8)
        name = f"cov{i}.tif"
        gt.write_geotiff(str(tmp_path / name), img,
                         origin=(-10.0 + 3 * i, 48.0),
                         scale=(0.01, 0.01),
                         compression="deflate" if i % 2 else "none",
                         tile_px=32 if i == 3 else 0)
        imgs[name] = img
    df = gt.read_geotiff(spark, str(tmp_path))
    pdf = df.toPandas().sort_values("image_id").reset_index(drop=True)
    assert len(pdf) == 4
    for _, r in pdf.iterrows():
        dec = codec.decode(r["bytes"], r["fmt"])
        assert np.array_equal(dec, imgs[r["image_id"]])
        assert r["lon1"] > r["lon0"] and r["lat1"] > r["lat0"]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan and "LocalTableScan" not in plan

    # feed the rows into the engine's tile-assignment plan
    from geowave_spark.raster.tiles import assign_plan_df
    tiles = assign_plan_df(df.selectExpr(
        "image_id", "w", "h", "lon0", "lat0", "lon1", "lat1"))
    tpdf = tiles.toPandas()
    assert len(tpdf) >= 4
    assert set(tpdf["image_id"]) == set(imgs)
