"""Multimodal column plumbing (driver brief: image/audio/video as opaque
binary + typed metadata; decode/feature-extract as Pandas UDFs over
mapInPandas).

The image/audio decode libraries are not in this container, so the
decode step is STUBBED (`decode_image` raises NotImplementedError unless
given the deterministic fake codec), but the Spark-side plumbing —
schema, Arrow batch shape, partitioning, UDF signature — is real and
tested (tests/test_multimodal.py).

Design for 100 TB: binary payloads stay in executor memory only for the
life of one Arrow batch (`mapInPandas` streams batches; nothing is
collected); `spark.sql.execution.arrow.maxRecordsPerBatch` bounds batch
memory; feature extraction emits small fixed-width rows so the shuffle
after extraction carries features, never payloads.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: canonical multimodal asset schema: opaque payload + typed metadata
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("kind", StringType(), False),  # e.g. image/png, audio/wav
        StructField("payload", BinaryType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("width", IntegerType(), True),  # NULL for non-images
        StructField("height", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),  # NULL for non-audio
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("sha256", StringType(), False),
        StructField("byte_entropy", DoubleType(), False),
        StructField("mean_byte", DoubleType(), False),
    ]
)


def decode_image(payload: bytes, kind: str) -> np.ndarray:
    """Decode an image payload to an HxWxC array.

    STUB: real codecs (PIL/opencv) are not installed in this container.
    `fake/deterministic` payloads decode to a seeded array derived from
    the payload bytes so the downstream plumbing is testable; any real
    image kind raises until a codec is available.
    """
    if kind == "fake/deterministic":
        h = np.frombuffer(hashlib.sha256(payload).digest(), dtype=np.uint8)
        return np.tile(h, 12).reshape(16, 8, 3)[:, :, :3]
    raise NotImplementedError(
        f"no codec for {kind!r} in this environment — install PIL/cv2 and "
        "extend decode_image"
    )


def _extract_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    out = []
    for asset_id, kind, payload in zip(
        pdf["asset_id"], pdf["kind"], pdf["payload"]
    ):
        b = bytes(payload) if payload is not None else b""
        arr = np.frombuffer(b, dtype=np.uint8)
        if len(arr):
            counts = np.bincount(arr, minlength=256).astype(np.float64)
            p = counts[counts > 0] / len(arr)
            entropy = float(-(p * np.log2(p)).sum())
            mean_byte = float(arr.mean())
        else:
            entropy, mean_byte = 0.0, 0.0
        out.append(
            (
                asset_id,
                kind,
                len(b),
                hashlib.sha256(b).hexdigest(),
                round(entropy, 6),
                round(mean_byte, 6),
            )
        )
    return pd.DataFrame(
        out, columns=[f.name for f in FEATURE_SCHEMA.fields]
    )


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over opaque payloads.

    mapInPandas: payloads never leave the executor; output rows are
    fixed-width features safe to shuffle/aggregate."""
    cols = assets.select("asset_id", "kind", "payload")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _extract_batch(pdf)

    return cols.mapInPandas(gen, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("n_bytes", IntegerType(), False),
        StructField("mean_byte", DoubleType(), False),
    ]
)


def sample_frames(
    assets: DataFrame, frame_bytes: int = 64, stride: int = 4
) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: treat the opaque
    payload as a sequence of fixed-size frames, keep every ``stride``-th
    frame, emit per-frame features.

    The chunk/stride/feature math is vectorized numpy inside one
    ``mapInPandas`` pass (a real decoder slots into ``_frame_features``
    once a codec is installed); the output is fixed-width rows, so
    everything downstream shuffles features, never payloads.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                n_frames = len(b) // frame_bytes
                for fi in range(0, n_frames, stride):
                    frame = np.frombuffer(
                        b, dtype=np.uint8, count=frame_bytes, offset=fi * frame_bytes
                    )
                    rows.append(
                        (int(asset_id), fi, frame_bytes, float(frame.mean()))
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SCHEMA.fields]
            )

    return assets.select("asset_id", "payload").mapInPandas(
        gen, schema=FRAME_SCHEMA
    )


def assets_from_documents(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text's UTF-8 bytes as an opaque payload —
    the stand-in corpus for binary assets in this container."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("text/utf-8").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("sample_rate"),
    )
