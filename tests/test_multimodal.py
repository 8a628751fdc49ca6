"""Multimodal plumbing tests: Arrow batch shape, stubbed decode, feature
extraction determinism."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from schema_matching_spark.functions.multimodal import (
    assets_from_documents,
    decode_image,
    extract_features,
)
from tests.conftest import SF_DIR


def test_decode_stub_raises_for_real_kinds():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...", "image/png")


def test_decode_fake_codec_deterministic():
    a = decode_image(b"payload", "fake/deterministic")
    b = decode_image(b"payload", "fake/deterministic")
    assert a.shape == (16, 8, 3)
    assert np.array_equal(a, b)
    c = decode_image(b"other", "fake/deterministic")
    assert not np.array_equal(a, c)


def test_extract_features_matches_local_hash(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(10)
    feats = extract_features(assets_from_documents(docs)).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert len(feats) == 10
    for r in feats:
        raw = texts[r["asset_id"]].encode()
        assert r["n_bytes"] == len(raw)
        assert r["sha256"] == hashlib.sha256(raw).hexdigest()
        assert 0.0 <= r["byte_entropy"] <= 8.0


def test_payloads_stay_off_driver(spark):
    """The feature frame must not carry the payload column."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    feats = extract_features(assets_from_documents(docs))
    assert "payload" not in feats.columns
    n = feats.count()
    assert n == docs.count()


def test_frame_sampling_math(spark):
    """Known payload → exact frame count, stride, and per-frame means."""
    import numpy as np
    from pyspark.sql.types import (
        BinaryType, LongType, StructField, StructType,
    )
    from schema_matching_spark.functions.multimodal import sample_frames

    payload = bytes(range(256)) * 2  # 512 bytes = 8 frames of 64
    df = spark.createDataFrame(
        [(1, bytearray(payload))],
        StructType([
            StructField("asset_id", LongType(), False),
            StructField("payload", BinaryType(), True),
        ]),
    )
    rows = sample_frames(df, frame_bytes=64, stride=4).collect()
    # frames 0 and 4 survive the stride
    assert sorted(r["frame_idx"] for r in rows) == [0, 4]
    for r in rows:
        lo = r["frame_idx"] * 64
        expect = float(np.frombuffer(payload[lo:lo + 64], dtype=np.uint8).mean())
        assert abs(r["mean_byte"] - expect) < 1e-9
        assert r["n_bytes"] == 64


# ------------------------------------------------ rawimg real pipeline

def test_rawimg_roundtrip_exact():
    import numpy as np

    from schema_matching_spark.functions.multimodal import (
        decode_rawimg,
        encode_rawimg,
    )

    arr = (np.arange(24 * 32 * 3, dtype=np.int64) % 256).astype("uint8").reshape(
        24, 32, 3
    )
    out = decode_rawimg(encode_rawimg(arr))
    assert out.shape == (24, 32, 3)
    assert (out == arr).all()


def test_resize_and_grayscale_known_values():
    import numpy as np

    from schema_matching_spark.functions.multimodal import (
        grayscale,
        resize_nearest,
    )

    arr = np.zeros((4, 4, 3), dtype=np.uint8)
    arr[2:, 2:] = 255
    small = resize_nearest(arr, 2, 2)
    assert (small[0, 0] == 0).all() and (small[1, 1] == 255).all()
    g = grayscale(arr)
    assert g[0, 0] == 0 and g[3, 3] in (254, 255)  # luma weights sum to 1.0


def test_dhash_resize_invariant_and_discriminative():
    import numpy as np

    from schema_matching_spark.functions.multimodal import (
        dhash64,
        resize_nearest,
    )

    rng_free = (np.mgrid[0:24, 0:32][1] * 7 % 256).astype(np.uint8)
    img = np.stack([rng_free, rng_free // 2, rng_free // 3], axis=-1)
    up = resize_nearest(img, 48, 64)
    assert dhash64(img) == dhash64(up), "dHash must survive 2x upscale"
    other = np.stack([rng_free.T[:24, :32] if rng_free.T.shape[0] >= 24
                      else rng_free] * 3, axis=-1)
    # a different image yields a different hash (overwhelmingly)
    shifted = np.roll(img, 5, axis=1)
    assert dhash64(img) != dhash64(shifted)


def test_image_dedup_finds_planted_upscaled_copies(spark):
    from schema_matching_spark.queries.multimodal_q import q_image_dedup

    r = q_image_dedup(spark, SF_DIR).collect()[0]
    assert r["n_planted_total"] == 50  # 250 base, every 5th planted
    # dHash must match the upscaled copy to its original for nearly all
    assert r["n_planted_matched"] >= 45, r
    assert r["n_dup_groups"] >= 45


# ------------------------------------------------ rawpcm real audio DSP

def test_rawpcm_roundtrip_and_analytic_features():
    import numpy as np

    from schema_matching_spark.functions.multimodal import (
        decode_rawpcm,
        encode_rawpcm,
    )

    rate, f, amp = 8000, 400, 8000
    t = np.arange(rate) / rate  # 1 second
    s = (amp * np.sin(2 * np.pi * f * t)).astype(np.int16)
    back, r2 = decode_rawpcm(encode_rawpcm(s, rate))
    assert r2 == rate and (back == s).all()
    # analytic identities: RMS = amp/sqrt(2), ZCR = 2f/rate
    x = back.astype(np.float64)
    rms = np.sqrt((x * x).mean())
    zcr = (np.signbit(x[1:]) != np.signbit(x[:-1])).mean()
    assert abs(rms - amp / np.sqrt(2)) / (amp / np.sqrt(2)) < 0.01
    assert abs(zcr - 2 * f / rate) / (2 * f / rate) < 0.02


def test_audio_features_query(spark):
    from schema_matching_spark.queries.multimodal_q import q_audio_features

    rows = q_audio_features(spark, SF_DIR).collect()
    assert sum(r["n"] for r in rows) == 200
    # ZCR bands span the 100..1050 Hz sine range (2f/rate in 0.025..0.2625)
    assert len(rows) >= 3
    assert all(r["max_peak"] <= 12000 for r in rows)


# ------------------------------------------------ rawvid scene cuts

def test_rawvid_roundtrip():
    import numpy as np

    from schema_matching_spark.functions.multimodal import (
        decode_rawvid,
        encode_rawvid,
    )

    f1 = np.zeros((6, 8, 3), dtype=np.uint8)
    f2 = np.full((6, 8, 3), 200, dtype=np.uint8)
    frames = decode_rawvid(encode_rawvid([f1, f2, f1]))
    assert len(frames) == 3
    assert (frames[0] == f1).all() and (frames[1] == f2).all()


def test_scene_cut_detection_exact(spark):
    from schema_matching_spark.queries.multimodal_q import q_scene_cuts

    r = q_scene_cuts(spark, SF_DIR).collect()[0]
    assert r["n_videos"] == 120
    # every video has EXACTLY the one planted cut
    assert r["videos_with_exactly_one_cut"] == 120, r
    assert r["total_cuts"] == 120
    # cut positions vary with the id (3 + id%5 -> 5 distinct positions)
    assert r["distinct_cut_positions"] == 5
