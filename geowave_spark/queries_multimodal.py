"""Multimodal query registry: video frame sampling + audio feature
extraction over the mixed-modality media table (`multimodal/av.py`).

The engine decodes real payload bytes in mapInPandas; the oracle recomputes
the expected rows from the closed-form synthesis parameters in pure SQL —
two fully independent computations (engine touches pixels/samples, oracle
never does), the indexed-vs-independent equivalence pattern of the
reference (`test/.../spark/GeoWaveSparkSpatialJoinIT.java:98-176` in
/root/reference).  Pixel/sample *values* are checked in
tests/test_multimodal.py against local numpy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .multimodal import av
from .table import images as img_tab


def q44_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-2nd-frame sample of each video: (media_id, frame_idx, w, h)."""
    return (
        av.frame_sample_df(av.media_df(spark, sf_dir), every=2)
        .select("media_id", "frame_idx", "w", "h")
        .orderBy("media_id", "frame_idx")
    )


_MEDIA_ID = "concat('med', lpad(cast(doc_id as string), 10, '0'))"

Q44_SQL = f"""
WITH v AS (
  SELECT doc_id, 4 + doc_id % 5 AS nf,
         cast(16 + doc_id * 7 % 3 * 8 as int) AS w,
         cast(16 + doc_id * 11 % 3 * 8 as int) AS h
  FROM documents WHERE doc_id % 2 = 0
)
SELECT {_MEDIA_ID} AS media_id, cast(fi.g as int) AS frame_idx, w, h
FROM v, LATERAL (SELECT unnest(generate_series(0, nf - 1, 2)) AS g) fi
ORDER BY media_id, frame_idx
"""


def q45_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Waveform features per audio row — engine decodes PCM bytes; oracle
    recomputes peak/energy/RMS from the closed-form sample formula."""
    return av.audio_features_df(av.media_df(spark, sf_dir)).orderBy("media_id")


Q45_SQL = f"""
WITH a AS (
  SELECT doc_id, cast(1000 + doc_id % 500 as int) AS n FROM documents
  WHERE doc_id % 2 = 1
),
s AS (
  SELECT doc_id, n, ((doc_id * 7 + i.g * 13) % 256) - 128 AS v
  FROM a, LATERAL (SELECT unnest(generate_series(0, n - 1)) AS g) i
)
SELECT {_MEDIA_ID} AS media_id, n AS n_samples,
       cast(max(abs(v)) as int) AS peak,
       cast(sum(v * v) as bigint) AS sum_sq,
       cast(floor(1000.0 * sqrt(sum(v * v) / n)) as bigint) AS rms_milli
FROM s GROUP BY doc_id, n ORDER BY media_id
"""


def q46_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-payload near-dup pairs by perceptual hash: 8 bands x 8 bits
    over the 64-bit phash, Hamming<=1 multi-probe on one side, exact
    Hamming refine (<= 14).

    Recall proof: a pair with <= 14 differing bits spread over 8 bands has
    (pigeonhole) some band with <= 1 differing bit; the probe side emits
    its exact band value plus the 8 single-bit flips, so that band's
    equi-join key matches exactly — 100% recall for any threshold <= 15.
    The oracle is therefore the TRUE brute-force all-pairs scan over the
    closed-form phash (independent of the engine's pixel decode path).

    Scale path (the round-1 version used 4-bit bands = 16 join keys, which
    degenerates toward n^2/16 per band): 8-bit band values give 256 spread
    keys per band, and the x9 probe fan-out rides the SMALL side of the
    shuffle.  Worst-case candidates are n^2/256 per band on adversarially
    identical images; real phash distributions spread across the full key
    space.  tests/test_multimodal.py asserts candidate growth stays
    ~O(n * dup_rate), not O(n^2), when the table doubles.
    """
    from pyspark.sql import functions as F  # noqa: N812

    # materialize the (image_id, phash) projection before the band/probe
    # self-join — otherwise both join sides re-run the pixel-synthesis
    # mapInPandas (the q252 double-decode lesson); 2 int64-ish columns per
    # image, so the checkpoint is free
    img = (img_tab.images_df(spark, sf_dir).select("image_id", "phash")
           .localCheckpoint(eager=True))
    bands = img.select(
        "image_id", "phash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("band"),
                    F.expr(f"shiftright(phash, {8 * j}) & 255").alias("bh"),
                )
                for j in range(8)
            ])
        ).alias("b"),
    ).select("image_id", "phash", "b.band", "b.bh")
    # probe side: the exact band value + its 8 Hamming-1 neighbors
    probes = bands.select(
        "image_id", "phash", "band",
        F.explode(F.array(
            F.col("bh"), *[F.expr(f"bh ^ {1 << i}") for i in range(8)]
        )).alias("bh"),
    )
    a, b = probes.alias("a"), bands.alias("b")
    # Hamming-refine BEFORE the pair dedup: the band join's candidate
    # mass is structurally n^2/256 per band (the exact-recall pigeonhole
    # pins 8-bit bands for threshold 14), so at sf1 the old
    # dedup-then-filter order pushed ~350M candidate rows through the
    # dropDuplicates exchange; bit_count is whole-stage codegen, so
    # filtering first lets the joint enumerate-and-refine stream inside
    # one codegen stage and only the tiny survivor set is shuffled
    # (r5 full-registry sweep: 253 s -> ~30 s at sf1, identical rows)
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bh") == F.col("b.bh"))
               & (F.col("a.image_id") < F.col("b.image_id")))
        .select(
            F.col("a.image_id").alias("id1"),
            F.col("b.image_id").alias("id2"),
            F.expr("cast(bit_count(a.phash ^ b.phash) as int)")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= 14)
        .dropDuplicates(["id1", "id2"])
    )
    return cand.select("id1", "id2", "hamming").orderBy("id1", "id2")


def _q46_sql() -> str:
    """Brute-force oracle: phash bits recomputed closed-form (sample grid ->
    luma -> bit = sample > mean), pair Hamming = count of differing bits."""
    luma = img_tab.luma_sql("x", "y")
    return f"""
WITH dims AS (
  SELECT doc_id, {img_tab.image_id_sql()} AS image_id,
         {img_tab.w_sql()} AS w, {img_tab.h_sql()} AS h
  FROM documents
),
samp AS (
  SELECT doc_id, image_id, i.g AS idx,
         ((2 * (i.g % 8) + 1) * w) // 16 AS x,
         ((2 * (i.g // 8) + 1) * h) // 16 AS y
  FROM dims, LATERAL (SELECT unnest(generate_series(0, 63)) AS g) i
),
lum AS (SELECT doc_id, image_id, idx, {luma} AS s FROM samp),
bits AS (
  SELECT image_id, idx,
         (CASE WHEN s > (sum(s) OVER (PARTITION BY doc_id)) // 64
               THEN 1 ELSE 0 END) AS bit
  FROM lum
),
pairs AS (
  SELECT a.image_id AS id1, b.image_id AS id2,
         cast(sum(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) as int) AS hamming
  FROM bits a JOIN bits b ON a.idx = b.idx AND a.image_id < b.image_id
  GROUP BY a.image_id, b.image_id
)
SELECT id1, id2, hamming FROM pairs WHERE hamming <= 14 ORDER BY id1, id2
"""


def q78_image_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact image dedup by md5 over the *encoded payload bytes* — the
    first pass of any image-corpus dedup stack (before phash near-dup,
    q46).  Engine hashes real blobs (duplicate-content table,
    `table/images.dup_images_df`); the oracle groups by the content seed
    without touching bytes — two independent definitions of 'identical'.

    Scale: groupBy on md5 is one keyed shuffle of 16-byte keys; the blob
    column is reduced map-side (partial min/count), so shuffle volume is
    O(rows), not O(bytes)."""
    from pyspark.sql import functions as F  # noqa: N812

    img = img_tab.dup_images_df(spark, sf_dir)
    return (
        img.groupBy(F.md5("bytes").alias("content_md5"))
        .agg(
            F.min("image_id").alias("canonical_id"),
            F.count("*").alias("n_copies"),
        )
        .select("canonical_id", "n_copies")
        .orderBy("canonical_id")
    )


Q78_SQL = f"""
SELECT min({img_tab.image_id_sql()}) AS canonical_id,
       cast(count(*) as bigint) AS n_copies
FROM documents GROUP BY doc_id % 101 ORDER BY canonical_id
"""


def _photometric_base_sql() -> str:
    """Shared oracle CTE: per-pixel decoded luma over the closed-form
    image field (models the q6 lossy round-trip exactly)."""
    luma = img_tab.luma_sql("xs.g", "ys.g", decoded=True)
    return f"""
base AS (
  SELECT doc_id, {img_tab.image_id_sql()} AS image_id,
         {img_tab.w_sql()} AS w, {img_tab.h_sql()} AS h
  FROM documents
),
px AS MATERIALIZED (
  SELECT doc_id, image_id, w, h, xs.g AS x, ys.g AS y, {luma} AS luma
  FROM base,
       LATERAL (SELECT unnest(generate_series(0, w - 1)) AS g) xs,
       LATERAL (SELECT unnest(generate_series(0, h - 1)) AS g) ys
)"""


def q79_image_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Photometric quality gate: per-image mean luma + contrast from the
    DECODED payload, keeping only 'trainable' images (not too dark/bright,
    not flat) — the image twin of the q63 text-quality score.  Thresholds
    are calibrated to the synthetic field's spread so the gate actually
    rejects ~40% of rows (a pass-everything filter tests nothing)."""
    from pyspark.sql import functions as F  # noqa: N812

    from .multimodal import image_ops

    stats = image_ops.photometric_stats_df(img_tab.images_df(spark, sf_dir))
    return (
        stats.where(
            (F.col("mean_luma").between(126, 129)) & (F.col("contrast") >= 240)
        )
        .select("image_id", "w", "h", "mean_luma", "contrast")
        .orderBy("image_id")
    )


Q79_SQL = f"""
WITH {_photometric_base_sql()},
st AS (
  SELECT image_id, w, h,
         cast(sum(luma) // (w * h) as bigint) AS mean_luma,
         cast(max(luma) - min(luma) as bigint) AS contrast
  FROM px GROUP BY image_id, w, h
)
SELECT image_id, w, h, mean_luma, contrast
FROM st
WHERE mean_luma BETWEEN 126 AND 129 AND contrast >= 240
ORDER BY image_id
"""


def q80_thumbnail_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2x box-filter thumbnail (the resize stage of an image ingest
    pipeline): per-image thumbnail dims + integer checksum, verified
    against a blockwise SQL twin that never decodes bytes."""
    from .multimodal import image_ops

    return image_ops.thumbnail_sums_df(
        img_tab.images_df(spark, sf_dir)
    ).orderBy("image_id")


Q80_SQL = f"""
WITH {_photometric_base_sql()},
blk AS (
  SELECT image_id, w, h, x // 2 AS bx, y // 2 AS by,
         cast(sum(luma) as bigint) AS bsum
  FROM px GROUP BY image_id, w, h, x // 2, y // 2
)
SELECT image_id, cast(w // 2 as int) AS tw, cast(h // 2 as int) AS th,
       cast(sum(bsum // 4) as bigint) AS thumb_sum
FROM blk GROUP BY image_id, w, h ORDER BY image_id
"""


def q289_bilinear_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fractional-scale (3/2) bilinear resize with EXACT integer
    arithmetic — the fourth rung of the resize ladder (nearest q49,
    2x box q80, pyramid q14): align-corners source positions carried as
    rationals (numerator div/mod), so every output pixel is bit-exact
    against the closed-form SQL twin with no float interpolation to
    drift between engines.  One narrow mapInPandas; reference analog:
    `RasterTileResizeSparkRunner.java` (nearest only — GeoWave has no
    interpolating resample)."""
    from .multimodal import image_ops

    return image_ops.bilinear_sums_df(
        img_tab.images_df(spark, sf_dir)
    ).orderBy("image_id")


def _q289_sql() -> str:
    l00 = img_tab.luma_sql("x0", "y0", decoded=True)
    l10 = img_tab.luma_sql("x1", "y0", decoded=True)
    l01 = img_tab.luma_sql("x0", "y1", decoded=True)
    l11 = img_tab.luma_sql("x1", "y1", decoded=True)
    val = (f"(((tw - 1) - fx) * ((th - 1) - fy) * {l00}"
           f" + fx * ((th - 1) - fy) * {l10}"
           f" + ((tw - 1) - fx) * fy * {l01}"
           f" + fx * fy * {l11}) // ((tw - 1) * (th - 1))")
    return f"""
WITH base AS (
  SELECT doc_id, {img_tab.image_id_sql()} AS image_id,
         {img_tab.w_sql()} AS w, {img_tab.h_sql()} AS h
  FROM documents
),
dims AS (
  SELECT doc_id, image_id, w, h,
         (w * 3) // 2 AS tw, (h * 3) // 2 AS th
  FROM base
),
op AS MATERIALIZED (
  SELECT doc_id, image_id, w, h, tw, th,
         (xs.g * (w - 1)) // (tw - 1) AS x0,
         (xs.g * (w - 1)) % (tw - 1) AS fx,
         (ys.g * (h - 1)) // (th - 1) AS y0,
         (ys.g * (h - 1)) % (th - 1) AS fy
  FROM dims,
       LATERAL (SELECT unnest(generate_series(0, tw - 1)) AS g) xs,
       LATERAL (SELECT unnest(generate_series(0, th - 1)) AS g) ys
),
corner AS (
  SELECT doc_id, image_id, tw, th, fx, fy, x0, y0,
         least(x0 + 1, w - 1) AS x1, least(y0 + 1, h - 1) AS y1,
         w, h
  FROM op
)
SELECT image_id, cast(max(tw) as int) AS tw, cast(max(th) as int) AS th,
       cast(sum({val}) as bigint) AS bil_sum
FROM corner GROUP BY image_id ORDER BY image_id
"""


def _q299_tail_sql(lh: str) -> str:
    """Shared relational tail over an (image_id, luma, cnt) histogram
    relation: per-image CDF + corpus CDF, the match LUT as a rational
    first-crossing join (cross-multiplied int64 CDFs — no float
    quantiles), and the per-image rollup of the matched luma."""
    return f"""
n_img AS (SELECT image_id, sum(cnt) AS n FROM {lh} GROUP BY image_id),
cdf_i AS (
  SELECT image_id, luma, cnt,
         sum(cnt) OVER (PARTITION BY image_id ORDER BY luma) AS cdf
  FROM {lh}
),
g AS (SELECT luma, sum(cnt) AS cnt FROM {lh} GROUP BY luma),
ng AS (SELECT sum(cnt) AS nt FROM g),
cdf_t AS (SELECT luma AS t, sum(cnt) OVER (ORDER BY luma) AS cdft FROM g),
lut AS (
  SELECT c.image_id, c.luma, c.cnt, min(ct.t) AS matched
  FROM cdf_i c
  JOIN n_img ni ON ni.image_id = c.image_id
  CROSS JOIN ng
  JOIN cdf_t ct ON ct.cdft * ni.n >= c.cdf * ng.nt
  GROUP BY c.image_id, c.luma, c.cnt
)
SELECT image_id, cast(sum(cnt) as bigint) AS n_px,
       cast(sum(matched * cnt) as bigint) AS sum_matched,
       cast(min(matched) as bigint) AS min_matched,
       cast(max(matched) as bigint) AS max_matched
FROM lut GROUP BY image_id ORDER BY image_id
"""


def q299_histogram_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram matching to the CORPUS reference distribution
    (radiometric normalization: every image's luma distribution is
    remapped onto the pooled corpus distribution, so scenes from
    different sensors/illumination train consistently — the pairwise
    generalization of q125's per-image equalization, which is matching
    against the uniform distribution).

    Spark plan: ONE decode pass collapses pixels to <= 256 histogram
    rows per image (`image_ops.luma_hist_df`); everything after —
    per-image CDFs, the corpus CDF, the rational first-crossing LUT
    join (bounded 256-row broadcast side), the rollup — runs on the
    histogram relation, so pixels never shuffle and the post-decode
    cost is independent of image size.  The LUT inequality
    cross-multiplies int64 CDFs: no float quantile anywhere, so the
    DuckDB twin (closed-form luma, never decodes) is bit-exact."""
    from .multimodal import image_ops

    image_ops.luma_hist_df(
        img_tab.images_df(spark, sf_dir)
    ).createOrReplaceTempView("q299_lh")
    return spark.sql(f"WITH {_q299_tail_sql('q299_lh')}")


Q299_SQL = f"""
WITH {_photometric_base_sql()},
lh AS (
  SELECT image_id, luma, cast(count(*) as bigint) AS cnt
  FROM px GROUP BY image_id, luma
),
{_q299_tail_sql('lh')}
"""


def q125_histogram_equalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram equalization (contrast normalization before training):
    per-image sum/min/max of the EQUALIZED luma — the textbook integer
    LUT `(cdf - cdf_min) * 255 // (n - cdf_min)`, so the window-cumsum
    DuckDB twin is bit-exact.  One narrow mapInPandas; pixels never
    shuffle (`image_ops.equalized_stats_df`)."""
    from .multimodal import image_ops

    return image_ops.equalized_stats_df(
        img_tab.images_df(spark, sf_dir)
    ).orderBy("image_id")


Q125_SQL = f"""
WITH {_photometric_base_sql()},
hist AS (
  SELECT image_id, w, h, luma, cast(count(*) as bigint) AS c
  FROM px GROUP BY image_id, w, h, luma
),
cdf AS (
  SELECT image_id, w, h, luma, c,
         sum(c) OVER (PARTITION BY image_id ORDER BY luma) AS cdf
  FROM hist
),
mn AS (SELECT image_id, min(cdf) AS cdf_min FROM cdf GROUP BY image_id),
eq AS (
  SELECT c.image_id, c.c,
         CASE WHEN c.w * c.h = m.cdf_min THEN 0
              ELSE (c.cdf - m.cdf_min) * 255 // (c.w * c.h - m.cdf_min)
         END AS ev
  FROM cdf c JOIN mn m USING (image_id)
)
SELECT image_id, cast(sum(c) as bigint) AS n_px,
       cast(sum(ev * c) as bigint) AS sum_eq,
       cast(min(ev) as bigint) AS min_eq, cast(max(ev) as bigint) AS max_eq
FROM eq GROUP BY image_id ORDER BY image_id
"""


def q141_isodata_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image isodata (Ridler–Calvard) binarization threshold plus
    foreground stats — the classic figure/ground separation pass (the
    reference's raster layer has no auto-threshold op; nearest analog is
    the per-tile no-data classification in `RasterTileMergeStrategy`).
    Per-image scalar iteration inside ONE mapInPandas — zero shuffles;
    the oracle unrolls the identical integer rounds over the 256-bin
    histogram (`image_ops.isodata_stats_df`)."""
    from .multimodal import image_ops

    return image_ops.isodata_stats_df(
        img_tab.images_df(spark, sf_dir)
    ).orderBy("image_id")


def _q141_sql() -> str:
    from .multimodal.image_ops import ISODATA_ROUNDS

    parts = [_photometric_base_sql(), """
hist AS (
  SELECT image_id, luma AS v, cast(count(*) as bigint) AS c
  FROM px GROUP BY 1, 2
),
t0 AS (SELECT image_id, cast(128 as bigint) AS t FROM hist GROUP BY 1)"""]
    for i in range(1, ISODATA_ROUNDS + 1):
        parts.append(f"""
t{i} AS (
  SELECT h.image_id,
         (coalesce(sum(CASE WHEN h.v < t.t THEN h.v * h.c END)
                   // sum(CASE WHEN h.v < t.t THEN h.c END), t.t)
          + coalesce(sum(CASE WHEN h.v >= t.t THEN h.v * h.c END)
                     // sum(CASE WHEN h.v >= t.t THEN h.c END), t.t)) // 2 AS t
  FROM hist h JOIN t{i - 1} t USING (image_id)
  GROUP BY h.image_id, t.t
)""")
    return (
        "WITH " + ",".join(parts) + f"""
SELECT h.image_id, cast(t.t as int) AS thr,
       cast(coalesce(sum(CASE WHEN h.v >= t.t THEN h.c END), 0) as bigint) AS n_fg,
       cast(coalesce(sum(CASE WHEN h.v >= t.t THEN h.v * h.c END), 0) as bigint) AS sum_fg
FROM hist h JOIN t{ISODATA_ROUNDS} t USING (image_id)
GROUP BY h.image_id, t.t
ORDER BY h.image_id
""")


def q143_image_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image raw intensity moments (order <= 2) + integer-micro
    centroid — the shape/orientation summary registration pipelines
    compute before alignment (the reference's raster layer keeps only
    per-tile histogram/overview statistics, `RasterHistogramStatistic`).
    Zero shuffles (`image_ops.moments_stats_df`); the oracle recomputes
    every moment as a conditional pixel sum."""
    from .multimodal import image_ops

    return image_ops.moments_stats_df(
        img_tab.images_df(spark, sf_dir)
    ).orderBy("image_id")


def _q143_sql() -> str:
    return f"""
WITH {_photometric_base_sql()},
m AS (
  SELECT image_id,
         cast(sum(luma) as bigint) AS m00,
         cast(sum(x * luma) as bigint) AS m10,
         cast(sum(y * luma) as bigint) AS m01,
         cast(sum(x * x * luma) as bigint) AS m20,
         cast(sum(y * y * luma) as bigint) AS m02,
         cast(sum(x * y * luma) as bigint) AS m11
  FROM px GROUP BY image_id
)
SELECT image_id, m00, m10, m01, m20, m02, m11,
       CASE WHEN m00 = 0 THEN 0 ELSE m10 * 1000000 // m00 END AS cx_micro,
       CASE WHEN m00 = 0 THEN 0 ELSE m01 * 1000000 // m00 END AS cy_micro
FROM m ORDER BY image_id
"""


def q150_line_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-line detection by horizontal projection profile (document-
    image segmentation; no reference analog — its raster layer has no
    content ops).  Zero shuffles (`image_ops.line_profile_stats_df`);
    the oracle rebuilds row sums + the run decomposition with window
    functions."""
    from .multimodal import image_ops

    return image_ops.line_profile_stats_df(
        img_tab.images_df(spark, sf_dir)
    ).orderBy("image_id")


def _q150_sql() -> str:
    return f"""
WITH {_photometric_base_sql()},
rows_ AS (
  SELECT image_id, h, y, cast(sum(luma) as bigint) AS rs
  FROM px GROUP BY image_id, h, y
),
flag AS (
  SELECT image_id, h, y,
         CASE WHEN rs < sum(rs) OVER (PARTITION BY image_id) // h
              THEN 1 ELSE 0 END AS ink
  FROM rows_
),
runs AS (
  SELECT image_id, h, y, ink,
         CASE WHEN ink = 1 AND coalesce(lag(ink) OVER w, 0) = 0
              THEN 1 ELSE 0 END AS start
  FROM flag WINDOW w AS (PARTITION BY image_id ORDER BY y)
),
rid AS (
  SELECT image_id, h, ink,
         sum(start) OVER (PARTITION BY image_id ORDER BY y
                          ROWS UNBOUNDED PRECEDING) AS run_id
  FROM runs
),
rlen AS (
  SELECT image_id, h, run_id, cast(count(*) as bigint) AS len
  FROM rid WHERE ink = 1 GROUP BY image_id, h, run_id
)
SELECT f.image_id, cast(min(f.h) as bigint) AS n_rows,
       cast(coalesce(count(r.run_id), 0) as bigint) AS n_lines,
       cast(coalesce(max(r.len), 0) as bigint) AS max_run
FROM (SELECT DISTINCT image_id, h FROM flag) f
LEFT JOIN rlen r USING (image_id)
GROUP BY f.image_id
ORDER BY f.image_id
"""


def q151_rotation_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rotation-robust image dedup — the next rung of the dedup ladder
    (exact q78 → phash near-dup q46 → crop-robust q131 → ROTATION-robust):
    canonical hash = min over the 4 rot90 orientations of the 64-bit
    average hash of the re-decoded, re-rotated pixels, so a duplicate
    stored rotated still collides.  Input is the rotated-duplicate table
    (`table/images.rot_dup_images_df`: payload = seed image rotated by
    doc_id % 4 x 90°); clusters group on the canonical hash.  The oracle
    groups by the content seed WITHOUT touching bytes — engine and
    oracle only agree if the canonical hash is genuinely rotation-
    invariant AND collision-free across the 101 contents.  Zero shuffles
    before the tiny keyed aggregate."""
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: N812

    from .raster import codec
    from .table.images import phash64

    img = img_tab.rot_dup_images_df(spark, sf_dir)

    def canon(batches):
        import numpy as np

        for pdf in batches:
            ids, hs = [], []
            for _, r in pdf.iterrows():
                px = codec.decode(bytes(r["bytes"]), r["fmt"])
                h = min(phash64(np.ascontiguousarray(np.rot90(px, k=k)))
                        for k in range(4))
                ids.append(r["image_id"])
                hs.append(h)
            yield pd.DataFrame({"image_id": ids,
                                "canon": pd.array(hs, dtype="int64")})

    return (
        img.mapInPandas(canon, schema="image_id string, canon long")
        .groupBy("canon")
        .agg(F.min("image_id").alias("canonical_id"),
             F.count("*").alias("n_copies"))
        .select("canonical_id", "n_copies")
        .orderBy("canonical_id")
    )


Q151_SQL = f"""
SELECT min({img_tab.image_id_sql()}) AS canonical_id,
       cast(count(*) as bigint) AS n_copies
FROM documents GROUP BY doc_id % 101 ORDER BY canonical_id
"""


def q166_compress_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressibility signature (horizontal RLE runs + LSB/MSB bit-plane
    population) — the codec-planning scan of an image lake; see
    `image_ops.compress_signature_df`.  Zero shuffles; the oracle
    rebuilds runs with a per-row lag window and the bit planes with
    integer masks."""
    from .multimodal import image_ops

    return image_ops.compress_signature_df(
        img_tab.images_df(spark, sf_dir)
    ).orderBy("image_id")


def _q166_sql() -> str:
    return f"""
WITH {_photometric_base_sql()},
f AS (
  SELECT doc_id, image_id, luma,
         lag(luma) OVER (PARTITION BY doc_id, y ORDER BY x) AS pl
  FROM px
)
SELECT image_id, cast(count(*) as bigint) AS n_px,
       cast(sum(CASE WHEN pl IS NULL OR luma <> pl THEN 1 ELSE 0 END)
            as bigint) AS n_runs,
       cast(sum(luma % 2) as bigint) AS lsb_ones,
       cast(sum(luma // 128) as bigint) AS msb_ones
FROM f GROUP BY image_id ORDER BY image_id
"""


def q179_vignette_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vignetting / lens-shading screen: center-quarter vs corner-quarter
    mean luma (milli) + micro ratio; see
    `image_ops.vignette_stats_df`.  Zero shuffles; the oracle sums the
    same regions with integer bounds."""
    from .multimodal import image_ops

    return image_ops.vignette_stats_df(
        img_tab.images_df(spark, sf_dir)
    ).orderBy("image_id")


def _q179_sql() -> str:
    return f"""
WITH {_photometric_base_sql()},
b AS (
  SELECT doc_id, image_id, w, h, x, y, luma,
         h // 4 AS qh, w // 4 AS qw,
         h // 2 - (h // 4) // 2 AS cy0, w // 2 - (w // 4) // 2 AS cx0
  FROM px
),
c AS (
  SELECT image_id,
         sum(CASE WHEN y >= cy0 AND y < cy0 + qh
                   AND x >= cx0 AND x < cx0 + qw THEN luma END) AS cs,
         sum(CASE WHEN y >= cy0 AND y < cy0 + qh
                   AND x >= cx0 AND x < cx0 + qw THEN 1 END) AS cn,
         sum(CASE WHEN (y < qh OR y >= h - qh)
                   AND (x < qw OR x >= w - qw) THEN luma END) AS ks,
         sum(CASE WHEN (y < qh OR y >= h - qh)
                   AND (x < qw OR x >= w - qw) THEN 1 END) AS kn
  FROM b GROUP BY image_id
)
SELECT image_id,
       cast(cs * 1000 // cn as bigint) AS center_mean_milli,
       cast(ks * 1000 // kn as bigint) AS corner_mean_milli,
       cast((cs * 1000 // cn) * 1000000 // (ks * 1000 // kn) as bigint)
         AS ratio_micro
FROM c ORDER BY image_id
"""


def q131_quadrant_hash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crop-robust image near-dup candidates: pairs sharing ANY quadrant's
    64-bit average-hash (`image_ops.quadrant_hashes_df`) over the
    duplicate-content table, with the per-pair matched-quadrant count.
    The quadrant is the spatial band of the LSH family (q46 bands bit
    ranges; this bands image REGIONS), so a duplicate that survives a
    crop/shift preserving one quadrant still collides — candidate
    generation is an equi-join on (quad, qhash), never all-pairs.
    Oracle: closed-form quadrant bits over the seed-derived luma (never
    decodes bytes), pairs by 64-of-64 bit equality."""
    from pyspark.sql import functions as F  # noqa: N812

    from .multimodal import image_ops

    # materialized before the self-join (q252 double-decode lesson):
    # 4 small rows per image vs re-running decode+hash on both sides
    qh = image_ops.quadrant_hashes_df(
        img_tab.dup_images_df(spark, sf_dir)).localCheckpoint(eager=True)
    qh = qh.alias("a")
    b = qh.alias("b")
    return (
        qh.join(b, F.expr("a.quad = b.quad AND a.qhash = b.qhash "
                          "AND a.image_id < b.image_id"))
        .groupBy(F.col("a.image_id").alias("id1"),
                 F.col("b.image_id").alias("id2"))
        .agg(F.countDistinct("a.quad").alias("n_quads"))
        .orderBy("id1", "id2")
    )


def _q131_sql() -> str:
    seed = "(doc_id % 101)"
    luma = img_tab.luma_sql("x", "y", doc_id=seed, decoded=True)
    w = img_tab.w_sql(seed)
    h = "cast(32 + (" + seed + " * 17) % 6 * 8 as int)"
    return f"""
WITH dims AS (
  SELECT doc_id, {img_tab.image_id_sql()} AS image_id,
         ({w}) // 2 AS w2, ({h}) // 2 AS h2
  FROM documents
),
samp AS (
  SELECT doc_id, image_id, q.g AS quad, i.g AS idx,
         (q.g % 2) * w2 + ((2 * (i.g % 8) + 1) * w2) // 16 AS x,
         (q.g // 2) * h2 + ((2 * (i.g // 8) + 1) * h2) // 16 AS y
  FROM dims,
       LATERAL (SELECT unnest(generate_series(0, 3)) AS g) q,
       LATERAL (SELECT unnest(generate_series(0, 63)) AS g) i
),
lum AS (SELECT doc_id, image_id, quad, idx, {luma} AS s FROM samp),
bits AS (
  SELECT image_id, quad, idx,
         (CASE WHEN s > (sum(s) OVER (PARTITION BY doc_id, quad)) // 64
               THEN 1 ELSE 0 END) AS bit
  FROM lum
),
qpairs AS (
  SELECT a.image_id AS id1, b.image_id AS id2, a.quad
  FROM bits a JOIN bits b
    ON a.quad = b.quad AND a.idx = b.idx AND a.image_id < b.image_id
  GROUP BY 1, 2, 3
  HAVING sum(CASE WHEN a.bit = b.bit THEN 1 ELSE 0 END) = 64
)
SELECT id1, id2, cast(count(*) as bigint) AS n_quads
FROM qpairs GROUP BY 1, 2 ORDER BY id1, id2
"""


def q85_dup_canonical_by_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted canonical selection: among content-identical images
    (same payload md5), keep the row with the BEST caption (longest; ties
    break to the lowest doc id) instead of q78's min-id policy — the
    representative-selection step of image-corpus dedup, where dropping
    the richer caption loses training signal.

    The argmax is an ENCODED hash aggregate, not a window:
    `min((100000 - n_chars) * 10^10 + doc_id)` packs (quality, tiebreak)
    into one int64, so the whole operator is a single map-side-combining
    groupBy on the 16-byte md5 — no sort, no per-group row ranking (the
    measured round-2 lesson: encoded hash-agg argmin beats row_number).

    Engine hashes REAL payload bytes and reads caption length from the
    joined documents row; the oracle groups by the synthesis seed and
    recomputes lengths from driver-owned n_chars — independent
    definitions of both 'identical' and 'best'.
    """
    from pyspark.sql import functions as F  # noqa: N812

    img = img_tab.dup_images_df(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    j = img.withColumn(
        "doc_id", F.expr("cast(substr(image_id, 4) as bigint)")
    ).join(docs, "doc_id")
    enc = F.expr("min((100000 - n_chars) * 10000000000 + doc_id)")
    return (
        j.groupBy(F.md5("bytes").alias("content_md5"))
        .agg(enc.alias("enc"), F.count("*").alias("n_copies"))
        .select(
            F.expr("enc % 10000000000").alias("canonical_id"),
            F.expr("100000 - enc div 10000000000").alias("best_caption_chars"),
            "n_copies",
        )
        .orderBy("canonical_id")
    )


Q85_SQL = """
SELECT canonical_id, best_caption_chars, n_copies FROM (
  SELECT min((100000 - n_chars) * 10000000000 + doc_id) AS enc,
         cast(count(*) as bigint) AS n_copies
  FROM documents GROUP BY doc_id % 101
) g, LATERAL (SELECT enc % 10000000000 AS canonical_id,
                     100000 - enc // 10000000000 AS best_caption_chars)
ORDER BY canonical_id
"""


def q208_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary (scene-cut) detection — the video-pipeline pass that
    runs BEFORE frame sampling (q44): segment each clip where the
    inter-frame mean-luma jump exceeds a threshold, so one keyframe per
    shot is kept instead of one per fixed stride.  Engine: the same
    zero-shuffle `mapInPandas` decode as q44 at stride 1 (per-frame luma
    sums are the payload), then a per-video window lag — state never
    leaves the video's partition.  Oracle: per-frame mean luma recomputed
    in closed form from the synthesis formula (`av.gen_video` ->
    `table/images.gen_pixels`), no bytes decoded.

    Scale shape: decode is embarrassingly parallel over clips; the lag
    window shuffles once on media_id (at 100 TB, frames of one clip are
    already co-located by the decode), and the final rollup is a keyed
    aggregate.  Reference analog: none (no video surface in GeoWave);
    threshold 8 luma levels ~ the classic fixed-threshold cut detector
    (Boreczky & Rowe 1996)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    frames = av.frame_sample_df(av.media_df(spark, sf_dir), every=1)
    w = Window.partitionBy("media_id").orderBy("frame_idx")
    m = frames.withColumn("mean_luma", F.expr("luma_sum div (w * h)"))
    d = m.withColumn(
        "delta", F.abs(F.col("mean_luma") - F.lag("mean_luma").over(w)))
    return (
        d.groupBy("media_id")
        .agg(
            F.count("*").cast("bigint").alias("n_frames"),
            F.sum(F.when(F.col("delta") >= 8, 1).otherwise(0))
             .cast("bigint").alias("n_cuts"),
            F.sum(F.coalesce(F.col("delta"), F.lit(0)))
             .cast("bigint").alias("sum_delta"),
            F.max(F.coalesce(F.col("delta"), F.lit(0)))
             .cast("bigint").alias("max_delta"),
        )
        .orderBy("media_id")
    )


def _q208_sql() -> str:
    luma = img_tab.luma_sql("xs.g", "ys.g", "(v.doc_id * 1000 + fi.g)")
    return f"""
WITH v AS (
  SELECT doc_id, cast(4 + doc_id % 5 as int) AS nf,
         cast(16 + doc_id * 7 % 3 * 8 as int) AS w,
         cast(16 + doc_id * 11 % 3 * 8 as int) AS h
  FROM documents WHERE doc_id % 2 = 0
),
fm AS (
  SELECT v.doc_id, fi.g AS fidx, sum({luma}) // (v.w * v.h) AS mean_luma
  FROM v,
       LATERAL (SELECT unnest(generate_series(0, nf - 1)) AS g) fi,
       LATERAL (SELECT unnest(generate_series(0, w - 1)) AS g) xs,
       LATERAL (SELECT unnest(generate_series(0, h - 1)) AS g) ys
  GROUP BY v.doc_id, fi.g, v.w, v.h
),
d AS (
  SELECT doc_id, fidx,
         abs(mean_luma - lag(mean_luma)
             OVER (PARTITION BY doc_id ORDER BY fidx)) AS delta
  FROM fm
)
SELECT {_MEDIA_ID} AS media_id,
       cast(count(*) as bigint) AS n_frames,
       cast(sum(CASE WHEN delta >= 8 THEN 1 ELSE 0 END) as bigint) AS n_cuts,
       cast(sum(coalesce(delta, 0)) as bigint) AS sum_delta,
       cast(max(coalesce(delta, 0)) as bigint) AS max_delta
FROM d GROUP BY doc_id ORDER BY media_id
"""




def q228_keyframe_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyframe selection per detected scene — the composition step after
    q208: segment each clip at mean-luma jumps >= 8, then within each
    scene keep the SHARPEST frame (horizontal-gradient energy, the
    join-free sharpness proxy of q202's variance-of-Laplacian), encoded
    argmax so ties break to the earliest frame without a sort.

    Scale shape: one mapInPandas decode pass emits per-frame scalars
    (mean luma + gradient SSE — frames never shuffle raw), one window
    per clip builds the running scene id (cumsum of cut flags), one
    keyed aggregate picks the keyframe.  This is the training-data
    pipeline's "one frame per shot" sampler (PySceneDetect's
    detect-then-select, expressed relationally)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import functions as F

    media = av.media_df(spark, sf_dir)

    def stats(batches):
        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                if pdf["kind"].iloc[i] != "video":
                    continue
                fr = av._decode_video(
                    bytes(pdf["bytes"].iloc[i]), pdf["fmt"].iloc[i])
                for f in range(fr.shape[0]):
                    g = img_tab.gray(fr[f]).astype(np.int64)
                    d = np.diff(g, axis=1)
                    rows.append((pdf["media_id"].iloc[i], f,
                                 int(g.sum()) // (g.shape[0] * g.shape[1]),
                                 int((d * d).sum())))
            if rows:
                yield pd.DataFrame(rows, columns=[
                    "media_id", "frame_idx", "mean_luma", "grad_sse"])

    media.mapInPandas(
        stats, schema=("media_id string, frame_idx int, mean_luma long, "
                       "grad_sse long")
    ).createOrReplaceTempView("q228_frames")
    return spark.sql("WITH fs AS (SELECT * FROM q228_frames),\n"
                     + _q228_tail_sql())


def _q228_tail_sql() -> str:
    return """
cuts AS (
  SELECT media_id, frame_idx, grad_sse,
         CASE WHEN abs(mean_luma - lag(mean_luma)
                       OVER (PARTITION BY media_id ORDER BY frame_idx))
                   >= 8 THEN 1 ELSE 0 END AS is_cut
  FROM fs
),
scened AS (
  SELECT media_id, frame_idx, grad_sse,
         sum(is_cut) OVER (PARTITION BY media_id ORDER BY frame_idx
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS scene_id
  FROM cuts
)
SELECT media_id, cast(scene_id as int) AS scene_id,
       cast(count(*) as bigint) AS n_frames,
       cast(63 - max(grad_sse * 64 + (63 - frame_idx)) % 64 as int)
         AS key_idx,
       cast(max(grad_sse * 64 + (63 - frame_idx)) div 64 as bigint)
         AS key_grad_sse
FROM scened GROUP BY media_id, scene_id ORDER BY media_id, scene_id
"""


def _q228_sql() -> str:
    luma = img_tab.luma_sql("xs.g", "ys.g", "(v.doc_id * 1000 + fi.g)")
    luma_l = img_tab.luma_sql("(xs.g - 1)", "ys.g", "(v.doc_id * 1000 + fi.g)")
    return f"""
WITH v AS (
  SELECT doc_id, cast(4 + doc_id % 5 as int) AS nf,
         cast(16 + doc_id * 7 % 3 * 8 as int) AS w,
         cast(16 + doc_id * 11 % 3 * 8 as int) AS h
  FROM documents WHERE doc_id % 2 = 0
),
fs AS (
  SELECT {_MEDIA_ID} AS media_id, fi.g AS frame_idx,
         sum({luma}) // (v.w * v.h) AS mean_luma,
         sum(CASE WHEN xs.g >= 1
                  THEN ({luma} - {luma_l}) * ({luma} - {luma_l})
                  ELSE 0 END) AS grad_sse
  FROM v,
       LATERAL (SELECT unnest(generate_series(0, nf - 1)) AS g) fi,
       LATERAL (SELECT unnest(generate_series(0, w - 1)) AS g) xs,
       LATERAL (SELECT unnest(generate_series(0, h - 1)) AS g) ys
  GROUP BY media_id, fi.g, v.w, v.h
),
{_q228_tail_sql().replace(' div 64', ' // 64')}
"""




def q237_audio_onsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio onset detection per clip — the audio twin of q208's video
    scene cuts: 100-sample window energies, an onset wherever the
    energy jump E_k - E_(k-1) >= 5000 (full windows only; the tail
    partial window is dropped on both sides).  Feeds audio
    segmentation / voice-activity-style gating in a media pipeline.

    Scale shape: one mapInPandas decode pass emits per-WINDOW energies
    (samples never shuffle), one lag window per clip, one keyed
    roll-up.  Oracle: window energies recomputed in closed form from
    the synthesis formula (`av.gen_audio`), no bytes decoded."""
    import numpy as np
    import pandas as pd

    media = av.media_df(spark, sf_dir)

    def wins(batches):
        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                if pdf["kind"].iloc[i] != "audio":
                    continue
                sm = av._decode_audio(
                    bytes(pdf["bytes"].iloc[i]), pdf["fmt"].iloc[i]
                ).astype(np.int64)
                nw = len(sm) // 100
                for k in range(nw):
                    w = sm[k * 100:(k + 1) * 100]
                    rows.append((pdf["media_id"].iloc[i], k,
                                 int((w * w).sum())))
            if rows:
                yield pd.DataFrame(rows, columns=["media_id", "k", "e"])

    media.mapInPandas(
        wins, schema="media_id string, k int, e long"
    ).createOrReplaceTempView("q237_wins")
    return spark.sql("WITH w AS (SELECT * FROM q237_wins),\n"
                     + _q237_tail_sql())


def _q237_tail_sql() -> str:
    return """
d AS (
  SELECT media_id, k, e,
         e - lag(e) OVER (PARTITION BY media_id ORDER BY k) AS delta
  FROM w
)
SELECT media_id, cast(count(*) as bigint) AS n_windows,
       cast(sum(CASE WHEN delta >= 5000 THEN 1 ELSE 0 END) as bigint)
         AS n_onsets,
       cast(max(coalesce(delta, -100000000)) as bigint) AS max_delta,
       cast(sum(e) as bigint) AS sum_energy
FROM d GROUP BY media_id ORDER BY media_id
"""


def _q237_sql() -> str:
    v = "(((a.doc_id * 7 + s.g * 13) % 256) - 128)"
    return f"""
WITH a AS (
  SELECT doc_id, cast(1000 + doc_id % 500 as int) AS n
  FROM documents WHERE doc_id % 2 = 1
),
w AS (
  SELECT {_MEDIA_ID} AS media_id, s.g // 100 AS k,
         sum({v} * {v}) AS e
  FROM a,
       LATERAL (SELECT unnest(generate_series(0, (n // 100) * 100 - 1))
                AS g) s
  GROUP BY media_id, s.g // 100
),
{_q237_tail_sql()}
"""




def q240_block_motion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block motion estimation between consecutive video frames — the
    video-codec / optical-flow primitive: per interior 4x4 block, the
    SAD-minimizing displacement in a +-1 search window (9 candidates,
    encoded argmin, tie -> smallest (dy+1)*3+(dx+1) code).  Motion
    statistics separate static clips from moving ones — the
    training-data "camera motion" screen, and the registry's first
    inter-frame operator (q208/q228 use only per-frame scalars).

    Scale shape: one mapInPandas decode pass per clip does the whole
    search vectorized (frames never shuffle); the roll-up is one keyed
    aggregate of 4 scalars per clip."""
    import numpy as np
    import pandas as pd

    media = av.media_df(spark, sf_dir)

    def motion(batches):
        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                if pdf["kind"].iloc[i] != "video":
                    continue
                fr = av._decode_video(
                    bytes(pdf["bytes"].iloc[i]), pdf["fmt"].iloc[i])
                nf, h, w = fr.shape[0], fr.shape[1], fr.shape[2]
                grays = [img_tab.gray(fr[f]).astype(np.int64)
                         for f in range(nf)]
                nb = mnz = ml1 = ssad = 0
                for f in range(1, nf):
                    cur, prv = grays[f], grays[f - 1]
                    for by in range(1, h // 4 - 1):
                        for bx in range(1, w // 4 - 1):
                            y0, x0 = by * 4, bx * 4
                            cb = cur[y0:y0 + 4, x0:x0 + 4]
                            best = None
                            for dy in (-1, 0, 1):
                                for dx in (-1, 0, 1):
                                    pb = prv[y0 + dy:y0 + dy + 4,
                                             x0 + dx:x0 + dx + 4]
                                    sad = int(np.abs(cb - pb).sum())
                                    code = (dy + 1) * 3 + (dx + 1)
                                    enc = sad * 16 + code
                                    if best is None or enc < best:
                                        best = enc
                            sad, code = best // 16, best % 16
                            dy, dx = code // 3 - 1, code % 3 - 1
                            nb += 1
                            mnz += 1 if (dx, dy) != (0, 0) else 0
                            ml1 += abs(dx) + abs(dy)
                            ssad += sad
                rows.append((pdf["media_id"].iloc[i], nb, mnz, ml1, ssad))
            if rows:
                yield pd.DataFrame(rows, columns=[
                    "media_id", "n_blocks", "mv_nonzero", "mv_l1_sum",
                    "sad_sum"])

    out = media.mapInPandas(
        motion, schema=("media_id string, n_blocks long, mv_nonzero long, "
                        "mv_l1_sum long, sad_sum long"))
    out.createOrReplaceTempView("q240_rows")
    return spark.sql("SELECT * FROM q240_rows ORDER BY media_id")


def _q240_sql() -> str:
    cur = img_tab.luma_sql("(bxs.g * 4 + j.g)", "(bys.g * 4 + i.g)",
                           "(v.doc_id * 1000 + fi.g)")
    prv = img_tab.luma_sql("(bxs.g * 4 + j.g + cd.dx)",
                           "(bys.g * 4 + i.g + cd.dy)",
                           "(v.doc_id * 1000 + fi.g - 1)")
    cands = ", ".join(f"({dx}, {dy})" for dy in (-1, 0, 1)
                      for dx in (-1, 0, 1))
    return f"""
WITH v AS (
  SELECT doc_id, cast(4 + doc_id % 5 as int) AS nf,
         cast(16 + doc_id * 7 % 3 * 8 as int) AS w,
         cast(16 + doc_id * 11 % 3 * 8 as int) AS h
  FROM documents WHERE doc_id % 2 = 0
),
cd(dx, dy) AS (VALUES {cands}),
sad AS (
  SELECT v.doc_id, fi.g AS fidx, bxs.g AS bx, bys.g AS by,
         cd.dx, cd.dy,
         sum(abs(({cur}) - ({prv}))) AS sad
  FROM v,
       LATERAL (SELECT unnest(generate_series(1, nf - 1)) AS g) fi,
       LATERAL (SELECT unnest(generate_series(1, w // 4 - 2)) AS g) bxs,
       LATERAL (SELECT unnest(generate_series(1, h // 4 - 2)) AS g) bys,
       LATERAL (SELECT unnest(generate_series(0, 3)) AS g) i,
       LATERAL (SELECT unnest(generate_series(0, 3)) AS g) j,
       cd
  GROUP BY v.doc_id, fi.g, bxs.g, bys.g, cd.dx, cd.dy
),
best AS (
  SELECT doc_id, fidx, bx, by,
         min(sad * 16 + (dy + 1) * 3 + (dx + 1)) AS enc
  FROM sad GROUP BY doc_id, fidx, bx, by
),
mv AS (
  SELECT doc_id, enc // 16 AS sad,
         (enc % 16) // 3 - 1 AS dy, (enc % 16) % 3 - 1 AS dx
  FROM best
)
SELECT {_MEDIA_ID} AS media_id,
       cast(count(*) as bigint) AS n_blocks,
       cast(sum(CASE WHEN dx <> 0 OR dy <> 0 THEN 1 ELSE 0 END) as bigint)
         AS mv_nonzero,
       cast(sum(abs(dx) + abs(dy)) as bigint) AS mv_l1_sum,
       cast(sum(sad) as bigint) AS sad_sum
FROM mv GROUP BY doc_id ORDER BY media_id
"""


def q256_cross_modal_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal duplication matrix over the image+caption table: every
    pair that is an exact duplicate in EITHER modality, flagged per
    modality — (img_dup, cap_dup) = (1,0) is the alt-text-spam pattern
    (same image re-posted under different captions), (0,1) is caption
    laundering (same caption on different images), (1,1) is a true row
    duplicate.  A 10^12-row curation run keys its keep/drop policy on
    exactly this matrix: image-only dups keep the best caption (q85),
    caption-only dups are usually fine, full dups are dropped.

    Engine: content key = md5 over REAL encoded payload bytes
    (`table/images.dup_images_df`), caption key = md5(text); two keyed
    self-joins (shuffle on 16-byte hashes, group sizes bounded by the dup
    rate so no skew) + one full-outer merge of the two pair sets.  The
    oracle never touches bytes: it derives both flags from the synthesis
    seed (`doc_id % 101`) and the raw text — independent definitions of
    "identical" in both modalities.
    """
    from pyspark.sql import functions as F  # noqa: N812

    img = img_tab.dup_images_df(spark, sf_dir).select(
        F.expr("cast(substring(image_id, 4) as bigint)").alias("doc_id"),
        "image_id",
        F.md5("bytes").alias("ck"),
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.md5("text").alias("tk")
    )
    # materialized: `pairs` references this relation twice per call and
    # is called twice — without the checkpoint the payload-hashing
    # mapInPandas would execute 4x (q252 double-decode lesson)
    keyed = (img.join(docs, "doc_id").select("image_id", "ck", "tk")
             .localCheckpoint(eager=True))

    def pairs(key: str) -> DataFrame:
        a, b = keyed.alias("a"), keyed.alias("b")
        return a.join(
            b,
            (F.col(f"a.{key}") == F.col(f"b.{key}"))
            & (F.col("a.image_id") < F.col("b.image_id")),
        ).select(
            F.col("a.image_id").alias("id1"),
            F.col("b.image_id").alias("id2"),
        )

    ip = pairs("ck").withColumn("img_dup", F.lit(1))
    tp = pairs("tk").withColumn("cap_dup", F.lit(1))
    return (
        ip.join(tp, ["id1", "id2"], "full_outer")
        .select(
            "id1", "id2",
            F.coalesce("img_dup", F.lit(0)).alias("img_dup"),
            F.coalesce("cap_dup", F.lit(0)).alias("cap_dup"),
        )
        .orderBy("id1", "id2")
    )


def q252_video_set_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-level near-duplicate pairs over a corpus with exact AND
    head-trimmed copies: one decode pass per clip -> per-frame phashes ->
    per-video (key1, key2, phash set) signature (`av.video_signatures_df`)
    -> equi-join on the exploded keys -> exact frame-set Jaccard refine
    (>= 0.5) on the JVM (`array_intersect`/`array_union` over the small
    per-video arrays).

    Scale shape: pixels never shuffle (signatures are ~10 int64s per
    clip); the candidate join is a keyed equi-join on 64-bit keys whose
    group sizes are bounded by the duplicate rate; refine cost is
    |candidates| x O(nf).  The key2 drop-head probe gives exact recall
    for exact and first-frame-trimmed duplicates — the dominant re-post
    patterns — while arbitrary-offset clips would extend the same probe
    scheme to k keys (documented, not needed for the planted corpus).

    The oracle never decodes: seed arithmetic alone determines which
    pairs duplicate and their exact Jaccard ((nf-1)/nf when exactly one
    side is trimmed, 1.0 otherwise — trimmed copies all drop the SAME
    frame, so trimmed-trimmed pairs are identical sets).
    """
    from pyspark.sql import functions as F  # noqa: N812

    # materialize signatures BEFORE the self-join: both join sides
    # reference this relation, and without the checkpoint Spark executes
    # the decode+phash mapInPandas twice (measured: 4 MapInPandas nodes
    # in the physical plan vs 0 after; the signature relation is ~10
    # int64s per clip, so the checkpoint is free while the decode is the
    # entire cost)
    sig = av.video_signatures_df(av.dup_media_df(spark, sf_dir))
    sig = sig.localCheckpoint(eager=True)
    keyed = sig.select(
        "media_id", "phashes",
        F.explode(F.array("key1", "key2")).alias("k"),
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = (
        a.join(b, (F.col("a.k") == F.col("b.k"))
               & (F.col("a.media_id") < F.col("b.media_id")))
        .select(
            F.col("a.media_id").alias("id1"),
            F.col("b.media_id").alias("id2"),
            F.col("a.phashes").alias("p1"),
            F.col("b.phashes").alias("p2"),
        )
        .dropDuplicates(["id1", "id2"])
    )
    return (
        cand.withColumn(
            "jac_micro",
            F.expr(
                "cast(floor(1000000.0 * size(array_intersect(p1, p2)) / "
                "(size(p1) + size(p2) - size(array_intersect(p1, p2)))) "
                "as bigint)"
            ),
        )
        .filter("jac_micro >= 500000")
        .select("id1", "id2", "jac_micro")
        .orderBy("id1", "id2")
    )


Q252_SQL = """
WITH v AS (
  SELECT doc_id,
         doc_id % 61 AS seed,
         4 + (doc_id % 61) % 5 AS nf,
         CASE WHEN (doc_id // 61) % 3 = 0 THEN 1 ELSE 0 END AS trim
  FROM documents WHERE doc_id % 2 = 0
)
SELECT concat('med', lpad(cast(a.doc_id as string), 10, '0')) AS id1,
       concat('med', lpad(cast(b.doc_id as string), 10, '0')) AS id2,
       cast(CASE WHEN a.trim = b.trim THEN 1000000
                 ELSE floor(1000000.0 * (a.nf - 1) / a.nf) END as bigint)
         AS jac_micro
FROM v a JOIN v b ON a.seed = b.seed AND a.doc_id < b.doc_id
ORDER BY id1, id2
"""


Q256_SQL = f"""
SELECT {img_tab.image_id_sql('a.doc_id')} AS id1,
       {img_tab.image_id_sql('b.doc_id')} AS id2,
       cast(CASE WHEN a.doc_id % 101 = b.doc_id % 101 THEN 1 ELSE 0 END as int)
         AS img_dup,
       cast(CASE WHEN a.text = b.text THEN 1 ELSE 0 END as int) AS cap_dup
FROM documents a JOIN documents b ON a.doc_id < b.doc_id
WHERE a.doc_id % 101 = b.doc_id % 101 OR a.text = b.text
ORDER BY id1, id2
"""


def q276_phash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash distance calibration: the Hamming-distance
    histogram over DISTINCT-content image pairs (blocked: doc_id within
    20), in 8-bit buckets — the curve that justifies q46's Hamming<=14
    near-dup threshold.  Non-duplicate pairs should mass around 32
    (independent 64-bit hashes); the histogram's low-bucket tail IS the
    false-positive mass the threshold would admit, measured on the real
    corpus instead of assumed.  Run it before changing the threshold or
    the hash (a phash revision that shifts this distribution silently
    changes dedup recall/precision fleet-wide).

    Engine: real decode -> phash, materialized 2-column projection
    (double-decode lesson), delta-blocked self-join (bounded fan-out per
    image, never all-pairs), codegen bit_count.  Oracle: closed-form
    phash bits from the synthesis field — never decodes.
    """
    from pyspark.sql import functions as F  # noqa: N812

    img = (img_tab.images_df(spark, sf_dir)
           .select(F.expr("cast(substring(image_id, 4) as bigint)")
                   .alias("d"), "phash")
           .localCheckpoint(eager=True))
    a, b = img.alias("a"), img.alias("b")
    pairs = a.join(
        b, (F.col("b.d") > F.col("a.d"))
        & (F.col("b.d") - F.col("a.d") <= 20))
    return (
        pairs.select(
            F.expr("cast(bit_count(a.phash ^ b.phash) as int)").alias("ham"))
        .groupBy(F.expr("cast(ham div 8 as int)").alias("bucket"))
        .agg(F.count("*").alias("n_pairs"),
             F.min("ham").alias("min_ham"),
             F.max("ham").alias("max_ham"))
        .orderBy("bucket")
    )


def _q276_sql() -> str:
    luma = img_tab.luma_sql("x", "y")
    return f"""
WITH dims AS (
  SELECT doc_id, {img_tab.w_sql()} AS w, {img_tab.h_sql()} AS h
  FROM documents
),
samp AS (
  SELECT doc_id, i.g AS idx,
         ((2 * (i.g % 8) + 1) * w) // 16 AS x,
         ((2 * (i.g // 8) + 1) * h) // 16 AS y
  FROM dims, LATERAL (SELECT unnest(generate_series(0, 63)) AS g) i
),
lum AS (SELECT doc_id, idx, {luma} AS s FROM samp),
bits AS (
  SELECT doc_id, idx,
         (CASE WHEN s > (sum(s) OVER (PARTITION BY doc_id)) // 64
               THEN 1 ELSE 0 END) AS bit
  FROM lum
),
hams AS (
  SELECT a.doc_id AS da, b.doc_id AS db,
         cast(sum(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) as int) AS ham
  FROM bits a JOIN bits b
    ON a.idx = b.idx AND b.doc_id > a.doc_id AND b.doc_id - a.doc_id <= 20
  GROUP BY a.doc_id, b.doc_id
)
SELECT cast(ham // 8 as int) AS bucket,
       cast(count(*) as bigint) AS n_pairs,
       cast(min(ham) as int) AS min_ham,
       cast(max(ham) as int) AS max_ham
FROM hams
GROUP BY bucket
ORDER BY bucket
"""


MULTIMODAL_QUERIES = {
    "q276_phash_calibration": (q276_phash_calibration, _q276_sql()),
    "q252_video_set_neardup": (q252_video_set_neardup, Q252_SQL),
    "q256_cross_modal_dup_matrix": (q256_cross_modal_dup_matrix, Q256_SQL),
    "q240_block_motion": (q240_block_motion, _q240_sql()),
    "q237_audio_onsets": (q237_audio_onsets, _q237_sql()),
    "q228_keyframe_selection": (q228_keyframe_selection, _q228_sql()),
    "q44_frame_sample": (q44_frame_sample, Q44_SQL),
    "q45_audio_features": (q45_audio_features, Q45_SQL),
    "q46_phash_neardup": (q46_phash_neardup, _q46_sql()),
    "q78_image_exact_dedup": (q78_image_exact_dedup, Q78_SQL),
    "q79_image_quality_stats": (q79_image_quality_stats, Q79_SQL),
    "q80_thumbnail_checksum": (q80_thumbnail_checksum, Q80_SQL),
    "q289_bilinear_resize": (q289_bilinear_resize, _q289_sql()),
    "q299_histogram_matching": (q299_histogram_matching, Q299_SQL),
    "q85_dup_canonical_by_quality": (q85_dup_canonical_by_quality, Q85_SQL),
    "q125_histogram_equalization": (q125_histogram_equalization, Q125_SQL),
    "q141_isodata_threshold": (q141_isodata_threshold, _q141_sql()),
    "q143_image_moments": (q143_image_moments, _q143_sql()),
    "q150_line_profiles": (q150_line_profiles, _q150_sql()),
    "q151_rotation_canonical_dedup": (q151_rotation_canonical_dedup,
                                      Q151_SQL),
    "q166_compress_signature": (q166_compress_signature, _q166_sql()),
    "q179_vignette_screen": (q179_vignette_screen, _q179_sql()),
    "q131_quadrant_hash_dedup": (q131_quadrant_hash_dedup, _q131_sql()),
    "q208_scene_cuts": (q208_scene_cuts, _q208_sql()),
}
