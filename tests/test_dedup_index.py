"""Incremental near-dup index maintenance (streaming/dedup_index.py).

Invariant, mirroring the medallion hop contract: after every catch-up,

    index.read() == batch-computed signatures of bronze's LIVE rows

across initial sync, incremental updates, deletes, checkpoint resume,
and no-op runs; plus candidate probing finds a planted duplicate.
"""

import json

from pyspark.sql import functions as F

from schema_matching_spark.operators.apply import apply_batch
from schema_matching_spark.plans.table import SnapshotTable
from schema_matching_spark.sources.generator import changes
from schema_matching_spark.streaming.dedup_index import (
    confirmed_near_dups,
    document_band_buckets,
    near_dup_candidates,
    start_dedup_index_stream,
)
from schema_matching_spark.streaming.pipeline import drain_catchup


def _index_rows(index):
    return sorted(
        (r["conv_id"], r["turn_idx"], r["role"], tuple(json.loads(r["text"])))
        for r in index.read().collect()
    )


def _expected_rows(bronze):
    live = bronze.read().select("conv_id", "turn_idx", "text")
    return sorted(
        (r["conv_id"], r["turn_idx"], "sig", tuple(r["buckets"]))
        for r in document_band_buckets(live).collect()
    )


def _catch_up(spark, bronze, index, cp):
    drain_catchup(
        lambda: start_dedup_index_stream(spark, bronze.root, index, cp),
        timeout=120,
    )


def test_index_tracks_bronze_through_commits_and_resume(spark, tmp_path):
    bronze = SnapshotTable(spark, str(tmp_path / "bronze"), n_buckets=8)
    index = SnapshotTable(spark, str(tmp_path / "index"), n_buckets=4)
    cp = str(tmp_path / "cp")

    apply_batch(
        bronze, changes(spark, 2500, n_conv=20, turns_per_conv=10, partitions=4),
        "b1",
    )
    _catch_up(spark, bronze, index, cp)
    assert _index_rows(index) == _expected_rows(bronze)
    assert index.read().count() > 0

    # incremental: updates rewrite signatures, deletes drop index rows
    # (generator op mix includes D), resume processes only the new span
    apply_batch(
        bronze,
        changes(spark, 1200, n_conv=20, turns_per_conv=10, lsn_start=2500,
                partitions=4),
        "b2",
    )
    v = index.current_version()
    _catch_up(spark, bronze, index, cp)
    assert index.current_version() > v
    assert _index_rows(index) == _expected_rows(bronze)

    # no new upstream commits -> no-op catch-up
    v = index.current_version()
    _catch_up(spark, bronze, index, cp)
    assert index.current_version() == v
    assert _index_rows(index) == _expected_rows(bronze)


def test_update_changes_signature_delete_removes_row(spark, tmp_path):
    bronze = SnapshotTable(spark, str(tmp_path / "bronze"), n_buckets=4)
    index = SnapshotTable(spark, str(tmp_path / "index"), n_buckets=4)
    cp = str(tmp_path / "cp")

    def ev(lsn, op, conv, turn, text):
        return (lsn, op, conv, turn, "user", text, None)

    rows = [
        ev(0, "I", "c-1", 0, "the quick brown fox jumps over the lazy dog"),
        ev(1, "I", "c-1", 1, "pack my box with five dozen liquor jugs"),
        ev(2, "I", "c-2", 0, "sphinx of black quartz judge my vow"),
    ]
    schema = "lsn long, op string, conv_id string, turn_idx int, role string, text string, tool string"
    df = spark.createDataFrame(rows, schema).withColumn(
        "ts", F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    )
    apply_batch(bronze, df, "b1")
    _catch_up(spark, bronze, index, cp)
    before = dict(
        ((r[0], r[1]), r[3]) for r in _index_rows(index)
    )
    assert set(before) == {("c-1", 0), ("c-1", 1), ("c-2", 0)}

    rows2 = [
        ev(10, "U", "c-1", 0, "an entirely different text body now"),
        ev(11, "D", "c-1", 1, None),
    ]
    df2 = spark.createDataFrame(rows2, schema).withColumn(
        "ts", F.to_timestamp(F.lit("2024-01-01 01:00:00"))
    )
    apply_batch(bronze, df2, "b2")
    _catch_up(spark, bronze, index, cp)
    after = dict(((r[0], r[1]), r[3]) for r in _index_rows(index))
    assert set(after) == {("c-1", 0), ("c-2", 0)}       # deleted key gone
    assert after[("c-1", 0)] != before[("c-1", 0)]      # update re-signed
    assert after[("c-2", 0)] == before[("c-2", 0)]      # untouched intact
    assert _index_rows(index) == _expected_rows(bronze)


def test_probe_finds_planted_duplicate(spark, tmp_path):
    bronze = SnapshotTable(spark, str(tmp_path / "bronze"), n_buckets=8)
    index = SnapshotTable(spark, str(tmp_path / "index"), n_buckets=4)
    cp = str(tmp_path / "cp")

    apply_batch(
        bronze, changes(spark, 1500, n_conv=15, turns_per_conv=8, partitions=4),
        "b1",
    )
    _catch_up(spark, bronze, index, cp)

    # plant: probe docs = two exact copies of indexed rows + one novel
    victims = (
        bronze.read()
        .orderBy("conv_id", "turn_idx")
        .limit(2)
        .select("conv_id", "turn_idx", "text")
        .collect()
    )
    probes = spark.createDataFrame(
        [
            ("probe", 0, victims[0]["text"]),
            ("probe", 1, victims[1]["text"]),
            ("probe", 2, "yttrium zirconium niobium molybdenum technetium"),
        ],
        "conv_id string, turn_idx int, text string",
    )
    cand = near_dup_candidates(index, probes).collect()
    found = {
        (r["probe_turn_idx"], r["index_conv_id"], r["index_turn_idx"])
        for r in cand
    }
    # an exact copy shares EVERY band -> guaranteed candidate
    assert (0, victims[0]["conv_id"], victims[0]["turn_idx"]) in found
    assert (1, victims[1]["conv_id"], victims[1]["turn_idx"]) in found
    # the novel probe has no exact-copy guarantee; it may only hit
    # random collisions — assert it did not match EVERY indexed doc
    n_indexed = index.read().count()
    novel_hits = sum(1 for r in cand if r["probe_turn_idx"] == 2)
    assert novel_hits < n_indexed

    # full gate path: exact-Jaccard confirm on candidates only —
    # exact copies confirm at jac = 1.0 and survive any threshold
    confirmed = confirmed_near_dups(index, bronze, probes, threshold=0.9)
    got = {
        (r["probe_turn_idx"], r["index_conv_id"], r["index_turn_idx"], r["jac"])
        for r in confirmed.collect()
    }
    assert (0, victims[0]["conv_id"], victims[0]["turn_idx"], 1.0) in got
    assert (1, victims[1]["conv_id"], victims[1]["turn_idx"], 1.0) in got
    assert all(r[3] >= 0.9 for r in got)
