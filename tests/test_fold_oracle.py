"""Chunked golden oracle: folding LWW winners across lsn-range chunks
must equal the single-pass expected_state (SURVEY.md §5.2.3).

This is the correctness basis of scripts/bench_sustained.py, where the
10^9-event legs delete each WAL chunk after folding it (the full log +
its own verify shuffle don't fit this box's RAM together).
"""

from pyspark.sql import functions as F

from schema_matching_spark.operators.verify import content_hash
from schema_matching_spark.sources.generator import (
    changes,
    expected_state,
    fold_winners,
    winners_state,
)


def _fold_chunks(log, n_chunks, chunk_sz):
    winners = None
    for i in range(n_chunks):
        chunk = log.where(
            (F.col("lsn") >= i * chunk_sz) & (F.col("lsn") < (i + 1) * chunk_sz)
        )
        winners = fold_winners(winners, chunk)
    return winners


def test_folded_winners_equal_single_pass(spark):
    n = 40_000
    log = changes(spark, n, n_conv=80, turns_per_conv=50, partitions=8)
    winners = _fold_chunks(log, 4, n // 4)
    assert content_hash(winners_state(winners)) == content_hash(expected_state(log))


def test_fold_keeps_tombstones_until_the_end(spark):
    # key killed in chunk 0, untouched later -> absent; key killed in
    # chunk 0 but re-inserted in chunk 1 -> resurrected with the new text
    rows = [
        (0, "I", "c-a", 0, "user", "first", None),
        (1, "D", "c-a", 0, None, None, None),
        (2, "I", "c-b", 0, "user", "other", None),
        (3, "I", "c-a", 0, "user", "back again", None),
    ]
    df = spark.createDataFrame(
        rows, "lsn long, op string, conv_id string, turn_idx int, "
        "role string, text string, tool string"
    ).withColumn("ts", F.to_timestamp(F.lit("2026-01-01 00:00:00")))
    chunk0 = df.where("lsn < 3")
    chunk1 = df.where("lsn >= 3")

    w0 = fold_winners(None, chunk0)
    # tombstone must persist in the fold state itself
    assert w0.where("op = 'D'").count() == 1
    assert winners_state(w0).where("conv_id = 'c-a'").count() == 0

    w1 = fold_winners(w0, chunk1)
    final = winners_state(w1)
    got = {r["conv_id"]: r["text"] for r in final.collect()}
    assert got == {"c-a": "back again", "c-b": "other"}
