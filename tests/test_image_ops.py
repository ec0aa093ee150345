"""Image payload operators (multimodal/image_ops.py, dup-content table)."""

import numpy as np

from geowave_spark.multimodal.image_ops import (
    box_thumb_sum,
    photometric_stats_df,
    thumbnail_sums_df,
)
from geowave_spark.raster import codec
from geowave_spark.table import images as img_tab


def test_dup_images_identical_bytes_share_seed(spark, sf_dir):
    rows = img_tab.dup_images_df(spark, sf_dir, content_mod=7).collect()
    by_seed = {}
    for r in rows:
        seed = int(r["image_id"][3:]) % 7
        by_seed.setdefault(seed, set()).add(bytes(r["bytes"]))
    for seed, blobs in by_seed.items():
        assert len(blobs) == 1, f"seed {seed} produced {len(blobs)} variants"
    # distinct seeds give distinct payloads
    all_blobs = [next(iter(b)) for b in by_seed.values()]
    assert len(set(all_blobs)) == len(all_blobs)


def test_photometric_stats_match_local_numpy(spark, sf_dir):
    img = img_tab.images_df(spark, sf_dir)
    got = {
        r["image_id"]: r
        for r in photometric_stats_df(img).collect()
    }
    for r in img.limit(8).collect():
        g = img_tab.gray(codec.decode(bytes(r["bytes"]), r["fmt"]))
        h, w = g.shape
        e = got[r["image_id"]]
        assert (e["w"], e["h"]) == (w, h)
        assert e["mean_luma"] == int(g.sum()) // (w * h)
        assert e["contrast"] == int(g.max()) - int(g.min())


def test_thumbnail_matches_local_numpy(spark, sf_dir):
    img = img_tab.images_df(spark, sf_dir)
    got = {r["image_id"]: r for r in thumbnail_sums_df(img).collect()}
    for r in img.limit(8).collect():
        g = img_tab.gray(codec.decode(bytes(r["bytes"]), r["fmt"]))
        tw, th, s = box_thumb_sum(g)
        e = got[r["image_id"]]
        assert (e["tw"], e["th"], e["thumb_sum"]) == (tw, th, s)


def test_box_thumb_sum_exact_semantics():
    g = np.arange(16, dtype=np.int64).reshape(4, 4)
    tw, th, s = box_thumb_sum(g)
    assert (tw, th) == (2, 2)
    # blocks: [0,1,4,5]=10//4=2, [2,3,6,7]=18//4=4, [8,9,12,13]=42//4=10,
    # [10,11,14,15]=50//4=12
    assert s == 2 + 4 + 10 + 12
