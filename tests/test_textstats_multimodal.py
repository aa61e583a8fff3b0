"""Unit goldens for text-analysis and multimodal plumbing."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from gcp_serverless_mapreduce_spark.operators import multimodal, textstats


def test_language_scores_pick_marker_language(spark):
    docs = spark.createDataFrame(
        [(1, "der hund ist nicht da und der ball"),
         (2, "the cat is in the hat and it"),
         (3, "zzz qqq www")],
        ["doc_id", "text"])
    scores = textstats.language_scores(docs).collect()
    best = {}
    for r in scores:
        cur = best.get(r["doc_id"])
        if cur is None or (-r["n_hits"], r["cand_lang"]) < cur[0]:
            best[r["doc_id"]] = ((-r["n_hits"], r["cand_lang"]), r["cand_lang"])
    assert best[1][1] == "de"
    assert best[2][1] == "en"
    assert best[3][0][0] == 0  # no hits anywhere -> caller maps to 'und'


def test_poly_fingerprint_golden(spark):
    # fold over 'hi': ((7*31+104)*31+105) % 1e9+7 = 10056
    df = spark.range(1).select(textstats.poly_fingerprint(F.lit("hi")).alias("fp"))
    assert df.collect()[0]["fp"] == 10056


def test_bpe_token_count(spark):
    df = spark.range(1).select(
        textstats.bpe_token_count(F.lit("Key-1 row!")).alias("n"))
    assert df.collect()[0]["n"] == 5  # key | - | 1 | row | !


def _media(spark):
    docs = spark.createDataFrame(
        [(0, "abcd" * 20), (1, "efgh" * 20), (2, "ij" * 40)],
        ["doc_id", "text"])
    return multimodal.media_table(docs)


def test_media_table_types_and_payload(spark):
    rows = {r["media_id"]: r for r in _media(spark).collect()}
    assert [rows[i]["media_type"] for i in (0, 1, 2)] == \
        ["image", "audio", "video"]
    assert bytes(rows[0]["payload"]) == b"abcd" * 20


def test_decode_media_byte_stats(spark):
    decoded = {r["media_id"]: r for r in
               multimodal.decode_media(_media(spark)).collect()}
    r = decoded[0]  # 'abcd'*20: bytes 97,98,99,100
    assert r["n_bytes"] == 80
    assert r["min_byte"] == 97 and r["max_byte"] == 100
    assert abs(r["mean_byte"] - 98.5) < 1e-12


def test_sample_frames_stride_and_md5(spark):
    frames = multimodal.sample_frames(_media(spark)).collect()
    # only doc 2 is video: 80 bytes -> 3 frames of 32/32/16, keep idx 0
    assert [(r["frame_idx"], r["frame_len"]) for r in frames] == [(0, 32)]
    assert frames[0]["frame_md5"] == hashlib.md5(b"ij" * 16).hexdigest()


def test_resize_geometry_integer_exact(spark):
    rows = multimodal.resize_images(_media(spark)).collect()
    assert len(rows) == 1  # only doc 0 is an image
    r = rows[0]
    assert (r["orig_w"], r["orig_h"]) == (320, 180)
    assert (r["new_w"], r["new_h"]) == (224, 180 * 224 // 320)
    assert r["scale_ppm"] == 224 * 1_000_000 // 320


# --- real BMP/PPM codecs -------------------------------------------------

def test_bmp_roundtrip_exact_with_row_padding():
    import numpy as np
    # w=5 -> 15-byte rows padded to 16: exercises the 4-byte padding path
    arr = multimodal.synth_pixel_array(7, 5, 3)
    out = multimodal.decode_bmp(multimodal.encode_bmp(arr))
    assert out.shape == (3, 5, 3)
    assert np.array_equal(out, arr)


def test_ppm_roundtrip_exact():
    import numpy as np
    arr = multimodal.synth_pixel_array(11, 4, 5)
    out = multimodal.decode_ppm(multimodal.encode_ppm(arr))
    assert out.shape == (5, 4, 3)
    assert np.array_equal(out, arr)


def test_decoders_reject_text_bytes():
    import pytest
    for payload in (b"BM is a band", b"P6 is a chord", b"plain text"):
        with pytest.raises(ValueError):
            multimodal.decode_bmp(payload)
        with pytest.raises(ValueError):
            multimodal.decode_ppm(payload)


def test_decode_bytes_uses_real_decoder_for_images():
    import numpy as np
    arr = multimodal.synth_pixel_array(3, 4, 3)
    feats = multimodal._decode_bytes(multimodal.encode_bmp(arr))
    # stats over decoded PIXELS (36 values), not over the 110-byte file
    assert feats["n_bytes"] == arr.size
    assert feats["mean_byte"] == float(arr.reshape(-1).mean())
    # text payloads still take the byte-stats fallback
    fallback = multimodal._decode_bytes(b"abcd")
    assert fallback["n_bytes"] == 4 and fallback["min_byte"] == 97


def test_wav_roundtrip_exact_and_strict():
    import numpy as np
    import pytest
    s = multimodal.synth_audio_samples(5, 512)
    rate, out = multimodal.decode_wav(multimodal.encode_wav(s, 12000))
    assert rate == 12000
    assert out.dtype == np.int16 and np.array_equal(out, s)
    for bad in (b"RIFFxxxx", b"RIFF0000WAVE", b"plain text"):
        with pytest.raises(ValueError):
            multimodal.decode_wav(bad)


def test_audio_fp_fixture_plants_loudness_neardups(spark):
    import numpy as np
    from gcp_serverless_mapreduce_spark.operators import multimodal as mm
    # The fp fixture's planted-near-dup contract: media ids sharing
    # id % AUDIO_FP_BASES are the same base waveform at integer
    # amplitude scales 1-3 (int16-safe), and the fingerprint is
    # loudness-invariant, so the pair lands in the same dedup group.
    b = mm.AUDIO_FP_BASES
    s1, s2 = mm.synth_audio_fp_samples(7), mm.synth_audio_fp_samples(7 + b)
    assert np.array_equal(s2, 2 * s1)          # scale 2 of the same base
    assert int(np.abs(s2).max()) <= 3 * 8192   # never overflows int16
    clips = spark.createDataFrame(
        [(7, mm.encode_wav(s1, 8000)), (7 + b, mm.encode_wav(s2, 8000)),
         (8, mm.encode_wav(mm.synth_audio_fp_samples(8), 8000))],
        "media_id long, payload binary")
    fp = {r.media_id: r.afp for r in mm.audio_fingerprint(clips).collect()}
    assert fp[7] == fp[7 + b] != fp[8]


def test_video_keyframes_detect_planted_cuts(spark):
    from gcp_serverless_mapreduce_spark.operators import multimodal as mm
    # media_id=10: w=5, h=4, nf=6, sl=2 -> cuts at frames 2 and 4; the
    # detector sees only the encoded bytes, so this pins decode + the
    # threshold rule end-to-end on a clip with known shot boundaries.
    mid, w, h, nf, sl = 10, 5, 4, 6, 2
    clip = mm.encode_y4m(mm.synth_video_shot_frames(mid, w, h, nf, sl))
    video = spark.createDataFrame([(mid, clip)],
                                  "media_id long, payload binary")
    rows = {r.frame_idx: r for r in mm.video_keyframes(video).collect()}
    assert sorted(rows) == list(range(nf))
    keys = sorted(f for f, r in rows.items() if r.is_keyframe)
    assert keys == [0, 2, 4]
    n = 3 * w * h
    for f, r in rows.items():
        assert r.n_vals == n
        if f == 0:
            assert r.diff_sum == 0
        elif f % sl == 0:         # cut frame: mean >= 60 per value
            assert r.diff_sum >= 60 * n
        else:                     # within-shot: far below threshold
            assert r.diff_sum <= (n - 1) + 255


def test_image_phash_brightness_invariant(spark):
    import numpy as np
    from gcp_serverless_mapreduce_spark.operators import multimodal as mm
    # Structured image and a +40-brightness copy -> identical aHash;
    # its vertical flip -> different hash (structure moved).
    base = np.zeros((6, 8, 3), dtype=np.uint8)
    base[:3, :, :] = 200   # bright top half
    base[3:, :, :] = 20    # dark bottom half
    brighter = np.clip(base.astype(int) + 40, 0, 255).astype(np.uint8)
    flipped = base[::-1, :, :].copy()
    imgs = spark.createDataFrame(
        [(1, mm.encode_bmp(base)), (2, mm.encode_ppm(brighter)),
         (3, mm.encode_bmp(flipped))],
        "media_id long, payload binary")
    got = {r.media_id: r.phash for r in mm.image_phash(imgs).collect()}
    assert got[1] == got[2] != got[3]
    assert got[1] == 0b00001111  # top row of blocks above the mean


def test_crossmodal_gates_all_bind(spark):
    # Every curation gate must actually DROP something at fixture scale
    # — a gate that never binds is untested dead configuration.
    import __spark_entry__ as e
    from pyspark.sql import functions as F
    df = e.queries()["crossmodal_pair_curation"](
        spark, "/root/testdata/sf0.01")
    tot = df.agg(*[F.sum(c).alias(c) for c in
                   ("n_pairs", "n_kept", "n_drop_caption_len",
                    "n_drop_caption_ttr", "n_drop_resolution",
                    "n_drop_aspect")]).collect()[0]
    assert tot["n_pairs"] == 500
    assert 0 < tot["n_kept"] < tot["n_pairs"]
    for gate in ("n_drop_caption_len", "n_drop_caption_ttr",
                 "n_drop_resolution", "n_drop_aspect"):
        assert tot[gate] > 0, gate
