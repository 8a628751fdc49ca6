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
