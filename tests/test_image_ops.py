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


def test_equalize_hist_matches_per_pixel_python():
    """LUT equalization == per-pixel python recompute; full-range output
    on non-constant inputs; constant plane maps to zero."""
    import numpy as np

    from geowave_spark.multimodal.image_ops import equalize_hist

    rng = np.random.default_rng(7)
    g = rng.integers(30, 200, size=(41, 57), dtype=np.uint8)
    got = equalize_hist(g)

    hist = [0] * 256
    for v in g.ravel().tolist():
        hist[v] += 1
    cdf, run = [], 0
    for c in hist:
        run += c
        cdf.append(run)
    cdf_min = next(cdf[v] for v in range(256) if hist[v])
    n = g.size
    for y in range(g.shape[0]):
        for x in range(g.shape[1]):
            v = int(g[y, x])
            assert got[y, x] == (cdf[v] - cdf_min) * 255 // (n - cdf_min)
    assert got.max() == 255 and got.min() == 0

    flat = np.full((8, 8), 99, dtype=np.uint8)
    assert equalize_hist(flat).max() == 0


def test_quadrant_hashes_crop_collision_and_python_parity():
    """A derived image preserving one quadrant collides on exactly that
    quadrant's hash (the crop-robust property the full-image phash lacks);
    values match a per-pixel python recompute."""
    import numpy as np

    from geowave_spark.multimodal.image_ops import quadrant_hashes
    from geowave_spark.table.images import phash64

    rng = np.random.default_rng(11)
    a = rng.integers(0, 256, size=(64, 64), dtype=np.uint8)
    b = rng.integers(0, 256, size=(64, 64), dtype=np.uint8)
    b[:32, :32] = a[:32, :32]         # quadrant-aligned partial duplicate

    qa, qb = quadrant_hashes(a), quadrant_hashes(b)
    assert qa[0] == qb[0]             # preserved quadrant collides
    assert any(qa[i] != qb[i] for i in (1, 2, 3))
    assert phash64(np.stack([a] * 3, -1)) != phash64(np.stack([b] * 3, -1))

    # python recompute of quadrant 3 (bottom-right)
    sub = a[32:, 32:]
    samples = [int(sub[(2 * (i // 8) + 1) * 32 // 16,
                       (2 * (i % 8) + 1) * 32 // 16]) for i in range(64)]
    mean = sum(samples) // 64
    val = 0
    for s in samples:
        val = (val << 1) | (1 if s > mean else 0)
    if val >= 1 << 63:
        val -= 1 << 64
    assert qa[3] == val


def test_isodata_threshold_histogram_recompute(spark, sf_dir):
    """Independent derivation: run the isodata rounds over the 256-bin
    HISTOGRAM (the oracle's formulation) instead of the pixel array, and
    check the engine's per-image (thr, n_fg, sum_fg) triple; also the
    threshold must genuinely separate the class means."""
    from geowave_spark.multimodal.image_ops import (
        ISODATA_ROUNDS, isodata_stats_df)

    img = img_tab.images_df(spark, sf_dir)
    got = {r["image_id"]: (r["thr"], r["n_fg"], r["sum_fg"])
           for r in isodata_stats_df(img).collect()}
    assert len(got) > 50

    checked = 0
    for r in img.limit(12).collect():
        g = img_tab.gray(codec.decode(bytes(r["bytes"]), r["fmt"]))
        hist = np.bincount(g.ravel(), minlength=256).astype(np.int64)
        vals = np.arange(256, dtype=np.int64)
        t = 128
        for _ in range(ISODATA_ROUNDS):
            nb, sb = int(hist[:t].sum()), int((vals[:t] * hist[:t]).sum())
            na, sa = int(hist[t:].sum()), int((vals[t:] * hist[t:]).sum())
            mb = sb // nb if nb else t
            ma = sa // na if na else t
            t = (mb + ma) // 2
        n_fg = int(hist[t:].sum())
        sum_fg = int((vals[t:] * hist[t:]).sum())
        assert got[r["image_id"]] == (t, n_fg, sum_fg)
        # separation property: below-mean < t <= above-mean when both exist
        if hist[:t].sum() and hist[t:].sum():
            assert (vals[:t] * hist[:t]).sum() // hist[:t].sum() < t
            assert (vals[t:] * hist[t:]).sum() // hist[t:].sum() >= t
        checked += 1
    assert checked == 12


def test_image_moments_per_pixel_python_recompute(spark, sf_dir):
    """Pure-python per-pixel recompute (no numpy broadcasting) of the
    order-2 raw moments and the micro centroid for a handful of images."""
    from geowave_spark.multimodal.image_ops import moments_stats_df

    img = img_tab.images_df(spark, sf_dir)
    got = {r["image_id"]: r for r in moments_stats_df(img).collect()}
    assert len(got) > 50

    for r in img.limit(6).collect():
        g = img_tab.gray(codec.decode(bytes(r["bytes"]), r["fmt"]))
        m = {k: 0 for k in ("m00", "m10", "m01", "m20", "m02", "m11")}
        for y in range(g.shape[0]):
            for x in range(g.shape[1]):
                v = int(g[y, x])
                m["m00"] += v
                m["m10"] += x * v
                m["m01"] += y * v
                m["m20"] += x * x * v
                m["m02"] += y * y * v
                m["m11"] += x * y * v
        e = got[r["image_id"]]
        for k, v in m.items():
            assert e[k] == v
        assert e["cx_micro"] == m["m10"] * 1_000_000 // m["m00"]
        assert e["cy_micro"] == m["m01"] * 1_000_000 // m["m00"]
        # centroid lies inside the image
        assert 0 <= e["cx_micro"] < g.shape[1] * 1_000_000
        assert 0 <= e["cy_micro"] < g.shape[0] * 1_000_000


def test_line_profiles_python_recompute(spark, sf_dir):
    """Pure-python run-decomposition recompute of the projection-profile
    line stats for a handful of images."""
    from geowave_spark.multimodal.image_ops import line_profile_stats_df

    img = img_tab.images_df(spark, sf_dir)
    got = {r["image_id"]: (r["n_rows"], r["n_lines"], r["max_run"])
           for r in line_profile_stats_df(img).collect()}
    assert len(got) > 50
    lines_seen = 0
    for r in img.limit(10).collect():
        g = img_tab.gray(codec.decode(bytes(r["bytes"]), r["fmt"]))
        rs = [sum(int(v) for v in row) for row in g]
        thr = sum(rs) // len(rs)
        ink = [x < thr for x in rs]
        n_lines = max_run = cur = 0
        prev = False
        for v in ink:
            if v and not prev:
                n_lines += 1
            cur = cur + 1 if v else 0
            max_run = max(max_run, cur)
            prev = v
        assert got[r["image_id"]] == (len(rs), n_lines, max_run)
        lines_seen += n_lines
    assert lines_seen > 0


def test_rotation_canonical_hash_invariance_and_clusters(spark, sf_dir):
    """(a) min-over-rot90 phash is invariant under any rotation of the
    pixel array; (b) the q151 clusters unify rotated duplicates: every
    content seed lands in ONE cluster with all its rotations."""
    import numpy as np

    from geowave_spark.queries_multimodal import q151_rotation_canonical_dedup
    from geowave_spark.table.images import gen_pixels, phash64

    for seed in (3, 17, 42):
        img = gen_pixels(seed, 48, 64)
        canon = [min(phash64(np.ascontiguousarray(np.rot90(r, k)))
                     for k in range(4))
                 for r in (img, np.rot90(img, 1), np.rot90(img, 2),
                           np.rot90(img, 3))]
        assert len(set(canon)) == 1

    rows = q151_rotation_canonical_dedup(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == 101                      # one cluster per content
    assert sum(r["n_copies"] for r in rows) == n_docs
    assert max(r["n_copies"] for r in rows) > 1  # rotations actually merge


def test_compress_signature_python_recompute(spark, sf_dir):
    """Pure-python recompute of runs and bit-plane counts for a few
    images."""
    from geowave_spark.multimodal.image_ops import compress_signature_df

    img = img_tab.images_df(spark, sf_dir)
    got = {r["image_id"]: (r["n_px"], r["n_runs"], r["lsb_ones"],
                           r["msb_ones"])
           for r in compress_signature_df(img).collect()}
    assert len(got) > 50

    for r in img.limit(8).collect():
        g = img_tab.gray(codec.decode(bytes(r["bytes"]), r["fmt"]))
        runs = lsb = msb = 0
        for row in g:
            runs += 1
            for a, b in zip(row, row[1:]):
                if a != b:
                    runs += 1
            lsb += sum(int(v) & 1 for v in row)
            msb += sum(int(v) >> 7 & 1 for v in row)
        assert got[r["image_id"]] == (g.size, runs, lsb, msb)
        assert runs <= g.size
    # the synthetic luma field is hash-noise, and the signature detects
    # it: LSB population sits near 50% of pixels on every image (the
    # sensor-noise verdict), and the raw counts still vary per image
    assert all(abs(2 * lsb - n_px) < n_px // 4
               for n_px, _, lsb, _ in got.values())
    assert len({lsb for *_, lsb, _ in got.values()}) > 10


def test_vignette_stats_python_recompute(spark, sf_dir):
    """Pure-python region-sum recompute of the vignetting screen."""
    from geowave_spark.multimodal.image_ops import vignette_stats_df

    img = img_tab.images_df(spark, sf_dir)
    got = {r["image_id"]: (r["center_mean_milli"], r["corner_mean_milli"],
                           r["ratio_micro"])
           for r in vignette_stats_df(img).collect()}
    assert len(got) > 50

    for r in img.limit(8).collect():
        g = img_tab.gray(codec.decode(bytes(r["bytes"]), r["fmt"]))
        h, w = g.shape
        qh, qw = h // 4, w // 4
        cy0, cx0 = h // 2 - qh // 2, w // 2 - qw // 2
        center = g[cy0:cy0 + qh, cx0:cx0 + qw]
        corners = [g[:qh, :qw], g[:qh, w - qw:],
                   g[h - qh:, :qw], g[h - qh:, w - qw:]]
        cm = int(center.sum()) * 1000 // center.size
        km = sum(int(c.sum()) for c in corners) * 1000 \
            // sum(c.size for c in corners)
        assert got[r["image_id"]] == (cm, km, cm * 1_000_000 // km)
    # the luma field is globally stationary: ratios cluster near 1e6
    assert sum(abs(v[2] - 1_000_000) < 300_000
               for v in got.values()) > len(got) // 2


def test_bilinear_sum_pure_python_recompute():
    """Exact-integer bilinear vs a per-pixel pure-python fold (no numpy
    vectorization shared with the implementation)."""
    from geowave_spark.multimodal.image_ops import bilinear_sum

    rng = np.arange(7 * 10, dtype=np.int64) * 37 % 256
    g = rng.reshape(7, 10)
    tw, th, s = bilinear_sum(g, 3, 2)
    assert (tw, th) == (15, 10)
    T, T2 = tw - 1, th - 1
    h, w = g.shape
    acc = 0
    for oy in range(th):
        for ox in range(tw):
            sxn, syn = ox * (w - 1), oy * (h - 1)
            x0, fx = sxn // T, sxn % T
            y0, fy = syn // T2, syn % T2
            x1, y1 = min(x0 + 1, w - 1), min(y0 + 1, h - 1)
            num = ((T - fx) * (T2 - fy) * int(g[y0][x0])
                   + fx * (T2 - fy) * int(g[y0][x1])
                   + (T - fx) * fy * int(g[y1][x0])
                   + fx * fy * int(g[y1][x1]))
            acc += num // (T * T2)
    assert s == acc


def test_bilinear_identity_on_constant_plane():
    """A constant plane must resample to the same constant everywhere
    (weights always sum to T*T2)."""
    from geowave_spark.multimodal.image_ops import bilinear_sum

    g = np.full((8, 12), 77, dtype=np.int64)
    tw, th, s = bilinear_sum(g, 3, 2)
    assert s == 77 * tw * th


def test_bilinear_df_matches_local_numpy(spark, sf_dir):
    from geowave_spark.multimodal.image_ops import (
        bilinear_sum,
        bilinear_sums_df,
    )

    img = img_tab.images_df(spark, sf_dir)
    got = {r["image_id"]: r for r in bilinear_sums_df(img).collect()}
    for r in img.limit(6).collect():
        g = img_tab.gray(codec.decode(bytes(r["bytes"]), r["fmt"]))
        tw, th, s = bilinear_sum(g)
        e = got[r["image_id"]]
        assert (e["tw"], e["th"], e["bil_sum"]) == (tw, th, s)


def test_q299_histogram_matching_python_recompute(spark, sf_dir):
    """Third implementation: decode every image in python, build the
    corpus CDF, apply the rational first-crossing LUT per image, and
    compare the per-image rollups with the q299 query."""
    from geowave_spark.queries import QUERIES

    imgs = img_tab.images_df(spark, sf_dir).collect()
    hists = {}
    for r in imgs:
        g = img_tab.gray(codec.decode(bytes(r["bytes"]), r["fmt"]))
        hists[r["image_id"]] = np.bincount(g.ravel(), minlength=256)
    corpus = np.sum(list(hists.values()), axis=0)
    cdft = np.cumsum(corpus)
    nt = int(cdft[-1])

    expect = {}
    for iid, h in hists.items():
        n = int(h.sum())
        cdf = np.cumsum(h)
        sum_m = n_px = 0
        mins, maxs = 255, 0
        for v in np.nonzero(h)[0]:
            # least t with cdft[t] * n >= cdf[v] * nt (integer compare)
            t = int(np.searchsorted(cdft * n, int(cdf[v]) * nt, side="left"))
            sum_m += t * int(h[v])
            n_px += int(h[v])
            mins, maxs = min(mins, t), max(maxs, t)
        expect[iid] = (n_px, sum_m, mins, maxs)

    fn, _sql = QUERIES["q299_histogram_matching"]
    got = fn(spark, sf_dir).collect()
    assert {r["image_id"]: (r["n_px"], r["sum_matched"], r["min_matched"],
                            r["max_matched"]) for r in got} == expect
