"""Multimodal (audio/video) pipeline tests: fake-codec round-trips, frame
sampling vs local numpy, audio features vs local recomputation, and the
real-container stub contract.

Reference analog: the pixel-equivalence gate of
`test/.../mapreduce/CustomCRSKDERasterResizeIT.java:395-452` extended to
the video/audio payload axes.
"""

import numpy as np
import pytest

from geowave_spark.multimodal import av
from geowave_spark.table import images as img_tab


def test_rawvid_roundtrip_exact():
    fr = av.gen_video(42)
    assert fr.ndim == 4 and fr.shape[3] == 3
    out = av._decode_video(av.encode_rawvid(fr), "rawvid")
    assert np.array_equal(out, fr)


def test_rawpcm_roundtrip_exact():
    s = av.gen_audio(43)
    out = av._decode_audio(av.encode_rawpcm(s), "rawpcm")
    assert np.array_equal(out, s)


def test_real_container_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        av._decode_video(b"\x00" * 16, "mp4")
    with pytest.raises(NotImplementedError):
        av._decode_audio(b"\x00" * 16, "wav")
    with pytest.raises(ValueError):
        av._decode_video(b"\x00" * 16, "gif87")


def test_media_table_schema_and_kinds(spark, sf_dir):
    df = av.media_df(spark, sf_dir)
    pdf = df.toPandas()
    assert set(pdf.columns) == {
        "media_id", "kind", "bytes", "fmt", "n_frames", "w", "h",
        "n_samples", "caption",
    }
    assert set(pdf["kind"]) == {"video", "audio"}
    vids = pdf[pdf["kind"] == "video"]
    auds = pdf[pdf["kind"] == "audio"]
    assert (vids["fmt"] == "rawvid").all() and (auds["fmt"] == "rawpcm").all()
    assert vids["n_frames"].notna().all() and auds["n_samples"].notna().all()


def test_frame_sample_luma_matches_local(spark, sf_dir):
    frames = (
        av.frame_sample_df(av.media_df(spark, sf_dir), every=2)
        .orderBy("media_id", "frame_idx")
        .toPandas()
    )
    assert len(frames) > 0
    # spot-check first three media: recompute luma locally from synthesis
    for mid in frames["media_id"].unique()[:3]:
        d = int(mid[3:])
        fr = av.gen_video(d)
        sub = frames[frames["media_id"] == mid]
        assert list(sub["frame_idx"]) == list(range(0, fr.shape[0], 2))
        for _, row in sub.iterrows():
            expect = int(img_tab.gray(fr[int(row.frame_idx)]).sum())
            assert int(row.luma_sum) == expect


def test_phash_neardup_matches_brute_force(spark, sf_dir):
    """q46's banded phash join must return exactly the brute-force all-pairs
    Hamming<=14 set (pigeonhole recall proof, `GeoWaveSparkSpatialJoinIT`
    indexed-vs-brute pattern)."""
    from geowave_spark.queries_multimodal import q46_phash_neardup
    from geowave_spark.table import images as it

    got = q46_phash_neardup(spark, sf_dir).toPandas()
    got_pairs = set(zip(got["id1"], got["id2"]))

    img = it.images_df(spark, sf_dir).select("image_id", "phash").toPandas()
    ph = img.sort_values("image_id").reset_index(drop=True)
    ids = ph["image_id"].to_numpy()
    vals = ph["phash"].to_numpy()
    expect = set()
    for i in range(len(ids)):
        h = it.hamming64(vals[i], vals[i + 1:])
        for j in np.flatnonzero(h <= 14):
            expect.add((ids[i], ids[i + 1 + j]))
    assert got_pairs == expect


def test_audio_features_match_local(spark, sf_dir):
    feats = av.audio_features_df(av.media_df(spark, sf_dir)).toPandas()
    assert len(feats) > 0
    for _, row in feats.head(5).iterrows():
        d = int(row.media_id[3:])
        s = av.gen_audio(d).astype(np.int64)
        assert int(row.n_samples) == len(s)
        assert int(row.peak) == int(np.abs(s).max())
        assert int(row.sum_sq) == int((s * s).sum())


def test_q237_audio_onsets_match_numpy(spark):
    """Whole-clip numpy recompute of window energies + onset count."""
    import numpy as np

    from geowave_spark.multimodal import av
    from geowave_spark.queries import QUERIES

    sf_dir = "/root/testdata/sf0.01"
    got = {r["media_id"]: (r["n_windows"], r["n_onsets"], r["max_delta"],
                           r["sum_energy"])
           for r in QUERIES["q237_audio_onsets"][0](spark, sf_dir)
           .collect()}

    docs = spark.sql(
        f"SELECT doc_id FROM parquet.`{sf_dir}/documents.parquet` "
        f"WHERE doc_id % 2 = 1").toPandas()
    want = {}
    for did in docs["doc_id"]:
        s = av.gen_audio(int(did)).astype(np.int64)
        nw = len(s) // 100
        e = [int((s[k * 100:(k + 1) * 100] ** 2).sum()) for k in range(nw)]
        d = [e[k] - e[k - 1] for k in range(1, nw)]
        want["med" + str(int(did)).zfill(10)] = (
            nw, sum(1 for x in d if x >= 5000),
            max(d) if d else -100000000, sum(e))
    assert got == want and len(got) == 250
    assert any(v[1] > 0 for v in want.values())


def test_q240_block_motion_matches_numpy(spark):
    """Whole-clip numpy recompute of the 4x4 +-1 SAD search."""
    import numpy as np

    from geowave_spark.multimodal import av
    from geowave_spark.queries import QUERIES
    from geowave_spark.table import images as img_tab

    sf_dir = "/root/testdata/sf0.01"
    got = {r["media_id"]: (r["n_blocks"], r["mv_nonzero"], r["mv_l1_sum"],
                           r["sad_sum"])
           for r in QUERIES["q240_block_motion"][0](spark, sf_dir)
           .collect()}

    docs = spark.sql(
        f"SELECT doc_id FROM parquet.`{sf_dir}/documents.parquet` "
        f"WHERE doc_id % 2 = 0").toPandas()
    want = {}
    for did in docs["doc_id"]:
        vid = av.gen_video(int(did))
        grays = [img_tab.gray(vid[f]).astype(np.int64)
                 for f in range(vid.shape[0])]
        h, w = grays[0].shape
        nb = mnz = ml1 = ssad = 0
        for f in range(1, len(grays)):
            cur, prv = grays[f], grays[f - 1]
            for by in range(1, h // 4 - 1):
                for bx in range(1, w // 4 - 1):
                    y0, x0 = by * 4, bx * 4
                    cb = cur[y0:y0 + 4, x0:x0 + 4]
                    best = min(
                        (int(np.abs(cb - prv[y0 + dy:y0 + dy + 4,
                                             x0 + dx:x0 + dx + 4]).sum())
                         * 16 + (dy + 1) * 3 + (dx + 1))
                        for dy in (-1, 0, 1) for dx in (-1, 0, 1))
                    sad, code = best // 16, best % 16
                    dy, dx = code // 3 - 1, code % 3 - 1
                    nb += 1
                    mnz += 1 if (dx, dy) != (0, 0) else 0
                    ml1 += abs(dx) + abs(dy)
                    ssad += sad
        want["med" + str(int(did)).zfill(10)] = (nb, mnz, ml1, ssad)
    assert got == want and len(got) == 250


def test_q252_drop_head_probe_recall(spark, sf_dir):
    """Every same-seed pair must be recovered (exact + trimmed), and no
    cross-seed pair may appear; trimmed-vs-untrimmed pairs carry Jaccard
    (nf-1)/nf < 1, same-trim pairs exactly 1.0."""
    from geowave_spark.queries_multimodal import MULTIMODAL_QUERIES

    pdf = (MULTIMODAL_QUERIES["q252_video_set_neardup"][0](spark, sf_dir)
           .toPandas())
    d1 = pdf["id1"].str[3:].astype(int)
    d2 = pdf["id2"].str[3:].astype(int)
    assert ((d1 % 61) == (d2 % 61)).all()
    trim1 = (d1 // 61) % 3 == 0
    trim2 = (d2 // 61) % 3 == 0
    same = trim1 == trim2
    assert (pdf.loc[same, "jac_micro"] == 1_000_000).all()
    assert (pdf.loc[~same, "jac_micro"] < 1_000_000).all()
    # completeness: n*(n-1)/2 pairs per seed class
    import duckdb
    n_pairs = duckdb.sql(
        f"SELECT sum(n * (n - 1) // 2) FROM (SELECT count(*) AS n FROM "
        f"'{sf_dir}/documents.parquet' WHERE doc_id % 2 = 0 "
        f"GROUP BY doc_id % 61)"
    ).fetchone()[0]
    assert len(pdf) == n_pairs


def test_q276_distances_mass_at_center(spark, sf_dir):
    """Distinct-content pairs must mass in the middle buckets (~32 bits)
    with only a small tail below q46's 14-bit threshold."""
    from geowave_spark.queries_multimodal import MULTIMODAL_QUERIES

    pdf = (MULTIMODAL_QUERIES["q276_phash_calibration"][0](spark, sf_dir)
           .toPandas())
    total = pdf["n_pairs"].sum()
    low = pdf[pdf["bucket"] <= 1]["n_pairs"].sum()  # ham < 16
    mid = pdf[pdf["bucket"].isin([3, 4])]["n_pairs"].sum()
    assert mid > total * 0.5
    assert low < total * 0.05
