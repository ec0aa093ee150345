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
    """Image-payload near-dup pairs by perceptual hash: banded join on the
    64-bit phash (16 bands x 4 bits) + exact Hamming refine (<= 14).

    Pigeonhole: 14 differing bits touch at most 14 of the 16 bands, so at
    least 2 bands match exactly — the banded equi-join has 100% recall at
    any threshold <= 15, like q39.  phash is computed from decoded pixels by
    the engine (mapInPandas), so no independent SQL oracle exists
    (rows-only check); pytest validates phash values against local numpy
    (tests/test_raster.py) and this pairing against a brute-force scan
    (tests/test_multimodal.py).

    Scale path: the band join shuffles on well-spread (band, 4-bit) keys;
    candidates ~ n^2/2^4 per band at worst, pruned to near-dups by the
    bit_count refine — never an all-pairs scan.
    """
    from pyspark.sql import functions as F  # noqa: N812

    img = img_tab.images_df(spark, sf_dir).select("image_id", "phash")
    bands = img.select(
        "image_id", "phash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("band"),
                    F.expr(f"shiftright(phash, {4 * j}) & 15").alias("bh"),
                )
                for j in range(16)
            ])
        ).alias("b"),
    ).select("image_id", "phash", "b.band", "b.bh")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bh") == F.col("b.bh"))
               & (F.col("a.image_id") < F.col("b.image_id")))
        .select(
            F.col("a.image_id").alias("id1"),
            F.col("b.image_id").alias("id2"),
            F.col("a.phash").alias("p1"),
            F.col("b.phash").alias("p2"),
        )
        .dropDuplicates(["id1", "id2"])
    )
    return (
        cand.withColumn("hamming", F.expr("cast(bit_count(p1 ^ p2) as int)"))
        .filter(F.col("hamming") <= 14)
        .select("id1", "id2", "hamming")
        .orderBy("id1", "id2")
    )


MULTIMODAL_QUERIES = {
    "q44_frame_sample": (q44_frame_sample, Q44_SQL),
    "q45_audio_features": (q45_audio_features, Q45_SQL),
    "q46_phash_neardup": (q46_phash_neardup, None),
}
