"""Multimodal plumbing exposed as an oracle-checkable query."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.multimodal import assets_from_documents, extract_features


def q_multimodal_features(spark, sf_dir):
    """Binary-asset feature extraction (mapInPandas over opaque
    payloads): per-kind byte totals + distinct content hashes.  The
    sha256/entropy math is deterministic, so DuckDB can mirror it on
    the text bytes."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assets = assets_from_documents(docs)
    feats = extract_features(assets)
    return (
        feats.groupBy("kind")
        .agg(
            F.count("*").alias("n_assets"),
            F.sum("n_bytes").alias("total_bytes"),
            F.countDistinct("sha256").alias("n_distinct_sha"),
            F.round(F.avg("mean_byte"), 4).alias("avg_mean_byte"),
        )
        .orderBy("kind")
    )


SQL_MULTIMODAL = """
SELECT 'text/utf-8' AS kind,
       count(*) AS n_assets,
       CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
       count(DISTINCT sha256(text)) AS n_distinct_sha,
       round(avg(mean_byte), 4) AS avg_mean_byte
FROM (
  SELECT text,
         list_aggregate([unicode(x) for x in split(text, '')], 'avg') AS mean_byte
  FROM documents
)
GROUP BY 1
ORDER BY kind
"""


def q_frame_sample(spark, sf_dir):
    """Video-style frame sampling over opaque payloads: chunk each
    payload into 64-byte frames, keep every 4th, per-kind frame stats.
    Rows-only (byte-chunking of UTF-8 payloads is not portably
    expressible in the oracle dialect); the frame math itself is
    unit-tested in tests/test_multimodal.py."""
    from ..functions.multimodal import assets_from_documents, sample_frames

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assets = assets_from_documents(docs)
    frames = sample_frames(assets, frame_bytes=64, stride=4)
    return frames.agg(
        F.count("*").alias("n_frames"),
        F.countDistinct("asset_id").alias("n_assets_with_frames"),
        F.round(F.avg("mean_byte"), 4).alias("avg_frame_mean_byte"),
        F.max("frame_idx").alias("max_frame_idx"),
    )


def q_schema_evolution_mapping(spark, sf_dir):
    """The engine's distinguishing feature as a query: a renamed drifted
    re-emission of the change schema is aligned back to the target by
    value-distribution similarity (collector features + Hungarian
    assignment — the reference's matcher pipeline re-architected on
    Arrow).  Deterministic; rows-only (the matcher itself is the
    engine-internal being demonstrated).  Accuracy oracles live in
    tests/test_evolve.py."""
    from ..operators.evolve import decide_mapping
    from ..sources.generator import changes, expected_state

    base = changes(spark, 4000, n_conv=30, turns_per_conv=15)
    drifted = base.select(
        "lsn", "op", "ts",
        F.col("conv_id").alias("session_id"),
        F.col("turn_idx").alias("seq_no"),
        F.col("role").alias("speaker"),
        F.col("text").alias("content"),
        F.col("tool").alias("tool_name"),
    )
    mapping = decide_mapping(drifted, expected_state(base))
    rows = [(src, tgt) for src, tgt in sorted(mapping.items())]
    return spark.createDataFrame(rows, ["incoming_col", "mapped_to"])


def q_image_dedup(spark, sf_dir):
    """REAL image near-dup pipeline, zero codec deps: deterministic
    rawimg/v1 corpus (self-describing header + raw RGB) → decode →
    grayscale → 9x8 nearest resize → 64-bit dHash (all real numpy in
    one Arrow pass) → relational groupBy on the perceptual hash finds
    2x-upscaled copies that byte hashes cannot match.  Rows-only (the
    corpus is engine-generated); planted-recall asserted in
    tests/test_multimodal.py."""
    from collections.abc import Iterator as _It

    import pandas as _pd

    from ..functions.multimodal import (
        ASSET_SCHEMA,
        decode_rawimg,
        encode_rawimg,
        image_features,
        resize_nearest,
        synthetic_images,
    )

    base = synthetic_images(spark, 250)

    def upscale(batches: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, kind, payload in zip(
                pdf["asset_id"], pdf["kind"], pdf["payload"]
            ):
                arr = decode_rawimg(bytes(payload))
                up = resize_nearest(arr, arr.shape[0] * 2, arr.shape[1] * 2)
                p2 = encode_rawimg(up)
                rows.append(
                    (int(aid) + 10000, kind, p2, len(p2),
                     up.shape[1], up.shape[0], None)
                )
            yield _pd.DataFrame(
                rows, columns=[f.name for f in ASSET_SCHEMA.fields]
            )

    planted = base.where(F.pmod("asset_id", F.lit(5)) == 0).mapInPandas(
        upscale, schema=ASSET_SCHEMA
    )
    feats = image_features(base.unionByName(planted))
    groups = feats.groupBy("dhash").agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("asset_id") >= 10000, 1).otherwise(0)).alias(
            "n_planted"
        ),
        F.min("asset_id").alias("canonical"),
    )
    return groups.agg(
        F.count("*").alias("n_hash_groups"),
        F.sum(F.when(F.col("n") > 1, 1).otherwise(0)).alias("n_dup_groups"),
        F.sum("n_planted").alias("n_planted_total"),
        F.sum(
            F.when((F.col("n") > 1) & (F.col("n_planted") > 0), F.col("n_planted"))
            .otherwise(0)
        ).alias("n_planted_matched"),
    )


def q_audio_features(spark, sf_dir):
    """Real audio DSP over rawpcm payloads (RMS energy, zero-crossing
    rate, peak, duration — pure numpy, no codec libs): deterministic
    sine corpus with analytically-known features, aggregated per
    frequency band.  Rows-only (engine-generated corpus); the
    RMS≈amp/√2 and ZCR≈2f/rate identities are asserted in
    tests/test_multimodal.py."""
    from ..functions.multimodal import audio_features, synthetic_audio

    assets = synthetic_audio(spark, 200)
    feats = audio_features(assets)
    return (
        feats.withColumn("zcr_band", F.floor(F.col("zcr") * 20).cast("int"))
        .groupBy("zcr_band")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("rms"), 2).alias("avg_rms"),
            F.max("peak").alias("max_peak"),
        )
        .orderBy("zcr_band")
    )


def q_scene_cuts(spark, sf_dir):
    """Real video scene-cut detection: rawvid payloads (self-describing
    frame sequences) → per-frame dHash → cut where consecutive hashes
    differ in >16/64 bits.  The synthetic corpus plants exactly one
    hard cut per video at an id-derived frame, so the detector's output
    is fully checkable.  Rows-only; exactness asserted in
    tests/test_multimodal.py."""
    from collections.abc import Iterator as _It

    import numpy as _np
    import pandas as _pd

    from ..functions.multimodal import (
        ASSET_SCHEMA,
        RAWVID_KIND,
        encode_rawvid,
        scene_cuts,
    )

    def gen(batches: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        yy, xx = _np.mgrid[0:16, 0:20]
        for pdf in batches:
            rows = []
            for asset_id in pdf["id"]:
                seed = int(asset_id)
                cut_at = 3 + seed % 5  # frames [0,cut) scene A, rest scene B
                # scene B reverses the gradient direction so the dHash
                # gradient-sign bits flip wholesale — a hard cut; two
                # same-direction gradients would look alike to dHash by
                # design (that robustness is the point of the hash)
                def scene(s, sign):
                    r = ((sign * xx * (3 + s % 7) + s) % 256).astype(_np.uint8)
                    g = ((sign * yy * (5 + s % 11) + 2 * s) % 256).astype(
                        _np.uint8
                    )
                    b = (((xx + yy) * (2 + s % 5)) % 256).astype(_np.uint8)
                    return _np.stack([r, g, b], axis=-1)
                a, b = scene(seed, 1), scene(seed + 9999, -1)
                frames = [a] * cut_at + [b] * (8 - cut_at)
                payload = encode_rawvid(frames)
                rows.append(
                    (seed, RAWVID_KIND, payload, len(payload),
                     20, 16, None)
                )
            yield _pd.DataFrame(
                rows, columns=[f.name for f in ASSET_SCHEMA.fields]
            )

    vids = spark.range(120).repartition(4).mapInPandas(gen, schema=ASSET_SCHEMA)
    cuts = scene_cuts(vids)
    return cuts.agg(
        F.count("*").alias("n_videos"),
        F.sum("n_cuts").alias("total_cuts"),
        F.sum(F.when(F.col("n_cuts") == 1, 1).otherwise(0)).alias(
            "videos_with_exactly_one_cut"
        ),
        F.countDistinct("first_cut_frame").alias("distinct_cut_positions"),
    )


QUERIES = {
    "multimodal_features": q_multimodal_features,
    "frame_sample": q_frame_sample,
    "schema_evolution_mapping": q_schema_evolution_mapping,
    "image_dedup": q_image_dedup,
    "audio_features": q_audio_features,
    "scene_cuts": q_scene_cuts,
}
ORACLE = {"multimodal_features": SQL_MULTIMODAL}
