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


#: self-describing raw image format — REAL decode with zero codec deps:
#: 8-byte header (magic b"RI01", uint16 width, uint16 height, little
#: endian) + height*width*3 uint8 RGB samples.  This is the wire format
#: a multimodal ingest normalizes exotic codecs INTO; everything past
#: decode (resize, grayscale, dHash, channel stats) is real numpy here.
_RAWIMG_MAGIC = b"RI01"
RAWIMG_KIND = "image/rawimg-v1"


def encode_rawimg(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 → rawimg/v1 bytes."""
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8, (arr.shape, arr.dtype)
    header = _RAWIMG_MAGIC + int(w).to_bytes(2, "little") + int(h).to_bytes(
        2, "little"
    )
    return header + arr.tobytes()


def decode_rawimg(payload: bytes) -> np.ndarray:
    """rawimg/v1 bytes → HxWx3 uint8 (validated header/length)."""
    if payload[:4] != _RAWIMG_MAGIC:
        raise ValueError("not a rawimg/v1 payload")
    w = int.from_bytes(payload[4:6], "little")
    h = int.from_bytes(payload[6:8], "little")
    body = np.frombuffer(payload, dtype=np.uint8, offset=8)
    if len(body) != h * w * 3:
        raise ValueError(f"rawimg length mismatch: {len(body)} != {h}x{w}x3")
    return body.reshape(h, w, 3)


def decode_image(payload: bytes, kind: str) -> np.ndarray:
    """Decode an image payload to an HxWxC uint8 array.

    ``image/rawimg-v1`` decodes for REAL (self-describing header + raw
    RGB — see encode_rawimg); ``fake/deterministic`` yields a seeded
    array for plumbing tests.  Compressed codecs (png/jpeg) need
    PIL/cv2, which this container does not ship — they raise with the
    actionable gate the brief mandates.
    """
    if kind == RAWIMG_KIND:
        return decode_rawimg(payload)
    if kind == "fake/deterministic":
        h = np.frombuffer(hashlib.sha256(payload).digest(), dtype=np.uint8)
        return np.tile(h, 12).reshape(16, 8, 3)[:, :, :3]
    raise NotImplementedError(
        f"no codec for {kind!r} in this environment — install PIL/cv2 and "
        "extend decode_image (rawimg/v1 and the numpy pipeline behind it "
        "run as-is)"
    )


def resize_nearest(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy (index-map gather)."""
    h, w = arr.shape[:2]
    rows = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    cols = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return arr[rows][:, cols]


def grayscale(arr: np.ndarray) -> np.ndarray:
    """ITU-R 601 luma, uint8."""
    return (
        0.299 * arr[..., 0] + 0.587 * arr[..., 1] + 0.114 * arr[..., 2]
    ).astype(np.uint8)


def dhash64(arr: np.ndarray) -> int:
    """64-bit difference hash: grayscale → 9x8 nearest resize →
    horizontal gradient sign bits — the standard perceptual fingerprint
    for image near-dup detection (robust to brightness shifts and
    resizes, unlike byte hashes)."""
    g = resize_nearest(grayscale(arr), 8, 9).astype(np.int16)
    bits = (g[:, 1:] > g[:, :-1]).flatten()
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    # keep it in signed-64 range for a Spark LongType column
    return out - (1 << 63) if out >= (1 << 63) else out


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


IMAGE_FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("mean_r", DoubleType(), False),
        StructField("mean_g", DoubleType(), False),
        StructField("mean_b", DoubleType(), False),
        StructField("dhash", LongType(), False),
    ]
)


def image_features(assets: DataFrame) -> DataFrame:
    """Decode rawimg payloads and emit real image features (dimensions,
    per-channel means, 64-bit dHash) — Arrow-batched, payloads never
    leave the executor, output is fixed-width rows safe to shuffle.
    Near-dup image search is then a relational groupBy on ``dhash`` (or
    banded Hamming join for fuzzy matches, exactly like SimHash text
    dedup)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                arr = decode_rawimg(bytes(payload))
                rows.append(
                    (
                        int(asset_id),
                        arr.shape[1],
                        arr.shape[0],
                        round(float(arr[..., 0].mean()), 4),
                        round(float(arr[..., 1].mean()), 4),
                        round(float(arr[..., 2].mean()), 4),
                        dhash64(arr),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_FEATURE_SCHEMA.fields]
            )

    return assets.select("asset_id", "payload").mapInPandas(
        gen, schema=IMAGE_FEATURE_SCHEMA
    )


def synthetic_images(spark, n: int, height: int = 24, width: int = 32) -> DataFrame:
    """Deterministic rawimg corpus: per id, a seeded gradient+pattern
    image (pure function of asset_id — same on any executor count).
    Built with mapInPandas so payload bytes are produced executor-side
    in Arrow batches, never on the driver."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yy, xx = np.mgrid[0:height, 0:width]
        for pdf in batches:
            rows = []
            for asset_id in pdf["id"]:
                seed = int(asset_id)
                r = ((xx * (3 + seed % 7) + seed) % 256).astype(np.uint8)
                g = ((yy * (5 + seed % 11) + 2 * seed) % 256).astype(np.uint8)
                b = (((xx + yy) * (2 + seed % 5) + 3 * seed) % 256).astype(
                    np.uint8
                )
                arr = np.stack([r, g, b], axis=-1)
                payload = encode_rawimg(arr)
                rows.append(
                    (
                        seed,
                        RAWIMG_KIND,
                        payload,
                        len(payload),
                        width,
                        height,
                        None,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in ASSET_SCHEMA.fields]
            )

    return (
        spark.range(n).repartition(8).mapInPandas(gen, schema=ASSET_SCHEMA)
    )


# ------------------------------------------------------- raw audio
#: rawpcm/v1: 8-byte header (magic b"RA01", uint32 sample_rate little
#: endian) + int16 little-endian mono samples.  Real DSP features
#: (RMS energy, zero-crossing rate, peak) in numpy — no codec libs.
_RAWPCM_MAGIC = b"RA01"
RAWPCM_KIND = "audio/rawpcm-v1"

AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("sample_rate", IntegerType(), False),
        StructField("n_samples", LongType(), False),
        StructField("duration_s", DoubleType(), False),
        StructField("rms", DoubleType(), False),
        StructField("zcr", DoubleType(), False),
        StructField("peak", IntegerType(), False),
    ]
)


def encode_rawpcm(samples: np.ndarray, sample_rate: int) -> bytes:
    assert samples.dtype == np.int16
    return (
        _RAWPCM_MAGIC
        + int(sample_rate).to_bytes(4, "little")
        + samples.tobytes()
    )


def decode_rawpcm(payload: bytes) -> tuple[np.ndarray, int]:
    if payload[:4] != _RAWPCM_MAGIC:
        raise ValueError("not a rawpcm/v1 payload")
    rate = int.from_bytes(payload[4:8], "little")
    return np.frombuffer(payload, dtype="<i2", offset=8), rate


def audio_features(assets: DataFrame) -> DataFrame:
    """Real audio feature extraction (RMS energy, zero-crossing rate,
    peak amplitude, duration) over rawpcm payloads — one Arrow pass,
    payloads never leave the executor."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                s, rate = decode_rawpcm(bytes(payload))
                x = s.astype(np.float64)
                rms = float(np.sqrt((x * x).mean())) if len(x) else 0.0
                zcr = (
                    float((np.signbit(x[1:]) != np.signbit(x[:-1])).mean())
                    if len(x) > 1
                    else 0.0
                )
                rows.append(
                    (
                        int(asset_id),
                        rate,
                        len(s),
                        round(len(s) / rate, 6),
                        round(rms, 4),
                        round(zcr, 6),
                        int(np.abs(x).max()) if len(x) else 0,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FEATURE_SCHEMA.fields]
            )

    return assets.select("asset_id", "payload").mapInPandas(
        gen, schema=AUDIO_FEATURE_SCHEMA
    )


def synthetic_audio(spark, n: int, rate: int = 8000, seconds: float = 0.25) -> DataFrame:
    """Deterministic rawpcm corpus: per id, a pure sine at an
    id-derived frequency + id-derived amplitude — features are then
    analytically predictable (RMS ≈ amp/√2, ZCR ≈ 2f/rate), which the
    tests exploit."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t = np.arange(int(rate * seconds)) / rate
        for pdf in batches:
            rows = []
            for asset_id in pdf["id"]:
                seed = int(asset_id)
                freq = 100 + (seed % 20) * 50  # 100..1050 Hz
                amp = 4000 + (seed % 5) * 2000
                samples = (amp * np.sin(2 * np.pi * freq * t)).astype(np.int16)
                payload = encode_rawpcm(samples, rate)
                rows.append(
                    (seed, RAWPCM_KIND, payload, len(payload), None, None, rate)
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in ASSET_SCHEMA.fields]
            )

    return spark.range(n).repartition(4).mapInPandas(gen, schema=ASSET_SCHEMA)


# ------------------------------------------------------- raw video
#: rawvid/v1: 4-byte magic b"RV01" + uint16 frame count + concatenated
#: rawimg/v1 frames (each self-describing).  Real scene-cut detection:
#: per-frame dHash, cut where consecutive hashes differ in > threshold
#: bits — the exact sampling shape a video training-data pipeline uses
#: to pick representative frames.
_RAWVID_MAGIC = b"RV01"
RAWVID_KIND = "video/rawvid-v1"

SCENE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("n_frames", IntegerType(), False),
        StructField("n_cuts", IntegerType(), False),
        StructField("first_cut_frame", IntegerType(), True),
    ]
)


def encode_rawvid(frames: list[np.ndarray]) -> bytes:
    out = [_RAWVID_MAGIC + len(frames).to_bytes(2, "little")]
    out.extend(encode_rawimg(f) for f in frames)
    return b"".join(out)


def decode_rawvid(payload: bytes) -> list[np.ndarray]:
    if payload[:4] != _RAWVID_MAGIC:
        raise ValueError("not a rawvid/v1 payload")
    n = int.from_bytes(payload[4:6], "little")
    frames, off = [], 6
    for _ in range(n):
        w = int.from_bytes(payload[off + 4:off + 6], "little")
        h = int.from_bytes(payload[off + 6:off + 8], "little")
        end = off + 8 + h * w * 3
        frames.append(decode_rawimg(payload[off:end]))
        off = end
    return frames


def scene_cuts(assets: DataFrame, hamming_threshold: int = 16) -> DataFrame:
    """Per-video scene-cut detection: dHash every frame, mark a cut
    where consecutive hashes differ in more than ``hamming_threshold``
    of 64 bits.  One Arrow pass; output is one small row per video."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                frames = decode_rawvid(bytes(payload))
                hashes = [dhash64(f) for f in frames]
                cuts = []
                for i in range(1, len(hashes)):
                    d = bin((hashes[i] ^ hashes[i - 1]) & ((1 << 64) - 1)).count("1")
                    if d > hamming_threshold:
                        cuts.append(i)
                rows.append(
                    (
                        int(asset_id),
                        len(frames),
                        len(cuts),
                        cuts[0] if cuts else None,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in SCENE_SCHEMA.fields]
            )

    return assets.select("asset_id", "payload").mapInPandas(
        gen, schema=SCENE_SCHEMA
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
