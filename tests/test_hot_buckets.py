"""Hot-band-bucket guard (VERDICT r3 "What's wrong" #1).

A degenerate LSH band bucket — thousands of boilerplate/empty documents
sharing a signature band — makes a bucket-local candidate join quadratic
in that bucket's size, on ONE reducer.  textops.cap_hot_buckets bounds
per-(band, bucket) membership to ``cap`` deterministic representatives;
these tests plant a 10^4-doc hot cluster and pin that

* the candidate count is bounded (cap^2-ish, never cluster^2-ish),
* real near-dup pairs OUTSIDE the hot cluster are still found,
* buckets under the cap pass through untouched, and
* the dedup-index probe path (streaming/dedup_index.near_dup_candidates)
  carries the same guard.
"""

from pyspark.sql import functions as F

from schema_matching_spark.functions import textops as T

BOILER = "click here to accept cookies and continue to the site content"


def _hot_corpus(spark, n_hot: int):
    """``n_hot`` identical docs (every band collides) + one genuine
    near-dup pair + a handful of distinct docs."""
    hot = spark.range(n_hot).select(
        F.col("id").alias("doc_id"), F.lit(BOILER).alias("text")
    )
    extras = spark.createDataFrame(
        [
            (1_000_000, "the quick brown fox jumps over the lazy dog tonight"),
            # near-dup of the above: first word dropped
            (1_000_001, "quick brown fox jumps over the lazy dog tonight"),
            (1_000_002, "sphinx of black quartz judge my vow in daylight"),
            (1_000_003, "pack my box with five dozen liquor jugs right now"),
        ],
        "doc_id long, text string",
    )
    return hot.unionByName(extras)


def test_planted_hot_bucket_candidates_bounded(spark):
    n_hot, cap = 10_000, 32
    corpus = _hot_corpus(spark, n_hot)
    sigs = T.minhash_signatures_text(corpus, "doc_id", "text", k=5, n_hashes=32)
    pairs = T.lsh_band_pairs(
        sigs, "doc_id", "sig", n_bands=8, rows_per_band=4, bucket_cap=cap
    )
    rows = pairs.collect()
    hot_pairs = [r for r in rows if r["id_a"] < n_hot and r["id_b"] < n_hot]
    # unguarded, the hot cluster alone yields n_hot*(n_hot-1)/2 ≈ 50M
    # pairs; the guard bounds it by n_bands * cap^2 / 2 (in practice
    # cap^2/2, since the per-band survivor sets coincide for identical
    # docs — the rank key is the doc id, not the band)
    assert len(hot_pairs) <= 8 * cap * (cap - 1) // 2
    assert len(hot_pairs) > 0  # representatives still pair with each other
    # the genuine near-dup OUTSIDE the hot cluster is unaffected
    assert any(
        (r["id_a"], r["id_b"]) == (1_000_000, 1_000_001) for r in rows
    )


def test_small_buckets_pass_through_unchanged(spark):
    corpus = _hot_corpus(spark, 0)  # only the 4 distinct docs
    sigs = T.minhash_signatures_text(corpus, "doc_id", "text", k=5, n_hashes=32)
    capped = T.lsh_band_pairs(sigs, "doc_id", "sig", bucket_cap=512)
    uncapped = T.lsh_band_pairs(sigs, "doc_id", "sig", bucket_cap=None)
    assert sorted(map(tuple, capped.collect())) == sorted(
        map(tuple, uncapped.collect())
    )


def test_cap_hot_buckets_is_deterministic(spark):
    buckets = spark.range(5000).select(
        F.col("id").alias("doc_id"),
        F.lit(0).alias("band"),
        F.lit(42).alias("bucket"),
    )
    a = sorted(r["doc_id"] for r in T.cap_hot_buckets(buckets, 64).collect())
    b = sorted(r["doc_id"] for r in T.cap_hot_buckets(buckets, 64).collect())
    assert len(a) == 64
    assert a == b  # xxhash64 rank ⇒ same survivors every run


def test_dedup_index_probe_hot_bucket_bounded(spark, tmp_path):
    from schema_matching_spark.operators.apply import apply_batch
    from schema_matching_spark.plans.table import SnapshotTable
    from schema_matching_spark.streaming.dedup_index import (
        near_dup_candidates,
        signature_events,
    )

    bronze = SnapshotTable(spark, str(tmp_path / "bronze"), n_buckets=4)
    index = SnapshotTable(spark, str(tmp_path / "index"), n_buckets=4)
    n_hot, cap = 3_000, 16

    events = spark.range(n_hot).select(
        F.col("id").alias("lsn"),
        F.lit("I").alias("op"),
        F.concat(F.lit("conv-"), F.col("id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.lit(BOILER).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("ts"),
    )
    apply_batch(bronze, events, "b1")
    index.merge_apply(signature_events(bronze.changes_between(0)), "i1")

    probes = spark.createDataFrame(
        [("probe", 0, BOILER)], "conv_id string, turn_idx int, text string"
    )
    cand = near_dup_candidates(index, probes, bucket_cap=cap).collect()
    # every indexed doc shares EVERY band with the probe; unguarded the
    # probe would return all n_hot of them — the guard bounds it to at
    # most n_bands * cap distinct index docs
    assert 0 < len(cand) <= 8 * cap
