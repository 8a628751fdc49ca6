"""GDPR/CCPA purge (plans/table.py SnapshotTable.purge): erasure
through the merge path — exactly-once, LWW-guarded, changelog-visible,
physically removed from the current snapshot."""

import pytest
from pyspark.sql import functions as F

from schema_matching_spark.operators.apply import apply_batch
from schema_matching_spark.operators.verify import states_equal
from schema_matching_spark.plans.table import SnapshotTable
from schema_matching_spark.sources.generator import changes, expected_state

TS = "2024-06-01 00:00:00"


def _build(spark, tmp_path, mode="cow"):
    table = SnapshotTable(
        spark, str(tmp_path / f"tbl_{mode}"), n_buckets=4, mode=mode
    )
    log = changes(spark, 6000, n_conv=50, turns_per_conv=10, partitions=4)
    apply_batch(table, log, "b1")
    return table, log


def _some_convs(log, n=3):
    return [
        r["conv_id"]
        for r in log.select("conv_id").distinct().orderBy("conv_id").limit(n).collect()
    ]


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_purge_removes_only_target_convs(spark, tmp_path, mode):
    table, log = _build(spark, tmp_path, mode)
    victims = _some_convs(log)
    v = table.purge(victims, "purge-1", ts=TS)
    assert v == table.current_version()
    assert table.read().where(F.col("conv_id").isin(victims)).count() == 0
    survivors = expected_state(log).where(~F.col("conv_id").isin(victims))
    assert states_equal(table.read(), survivors)


def test_purge_is_exactly_once(spark, tmp_path):
    table, log = _build(spark, tmp_path)
    victims = _some_convs(log)
    v1 = table.purge(victims, "purge-1", ts=TS)
    v2 = table.purge(victims, "purge-1", ts=TS)  # replayed batch id
    assert v1 == v2 == table.current_version()


def test_purge_wins_against_stale_redelivery(spark, tmp_path):
    table, log = _build(spark, tmp_path)
    victims = _some_convs(log, 2)
    table.purge(victims, "purge-1", ts=TS)
    # redeliver the victims' ORIGINAL events (stale lsns) in a later batch
    stale = log.where(F.col("conv_id").isin(victims))
    apply_batch(table, stale, "redelivery")
    assert table.read().where(F.col("conv_id").isin(victims)).count() == 0


def test_new_upstream_event_resurrects_key(spark, tmp_path):
    table, log = _build(spark, tmp_path)
    victims = _some_convs(log, 1)
    table.purge(victims, "purge-1", ts=TS)
    hi = log.agg(F.max("lsn")).collect()[0][0]
    fresh = spark.createDataFrame(
        [(int(hi) + 1000, "I", None, victims[0], 0, "user", "new text", None)],
        "lsn long, op string, ts timestamp, conv_id string, turn_idx int,"
        " role string, text string, tool string",
    )
    apply_batch(table, fresh, "fresh")
    rows = table.read().where(F.col("conv_id") == victims[0]).collect()
    assert len(rows) == 1 and rows[0]["text"] == "new text"


def test_purge_emits_changelog_deletes_with_preimage(spark, tmp_path):
    table, log = _build(spark, tmp_path)
    victims = _some_convs(log, 2)
    v0 = table.current_version()
    live_before = table.read().where(F.col("conv_id").isin(victims)).count()
    table.purge(victims, "purge-1", ts=TS)
    feed = table.changes_between(v0, table.current_version(), images=True)
    dels = feed.where(F.col("change_type") == "delete")
    assert dels.count() == live_before
    assert dels.where(F.col("conv_id").isin(victims)).count() == live_before
    # pre-image carries the erased payload so downstream hops can retract
    assert dels.where(F.col("text").isNull()).count() == 0


def test_no_payload_survives_in_current_snapshot_files(spark, tmp_path):
    table, log = _build(spark, tmp_path)
    victims = _some_convs(log, 2)
    table.purge(victims, "purge-1", ts=TS)
    m = table.manifest()
    raw = table._read_files([f["path"] for f in m["files"]])
    leftovers = raw.where(
        F.col("conv_id").isin(victims) & F.col("text").isNotNull()
    )
    assert leftovers.count() == 0  # tombstones are (key, lsn, op) only


def test_purge_unknown_conv_is_noop_commit(spark, tmp_path):
    table, log = _build(spark, tmp_path)
    before = expected_state(log)
    table.purge(["conv-nonexistent"], "purge-1", ts=TS)
    assert states_equal(table.read(), before)
    # and the ledger still records it (idempotence for free)
    assert "purge-1" in table.applied_batches()


def test_mor_physical_erasure_needs_compact(spark, tmp_path):
    """MOR keeps base+delta files in the current snapshot until compact,
    so right-to-erasure on a MOR table is purge → compact → expire:
    after compact the folded files hold only (key, lsn, op) tombstones
    for the victims, and expire reclaims the superseded delta/base
    files that still carried payload bytes."""
    import os

    table, log = _build(spark, tmp_path, mode="mor")
    victims = _some_convs(log, 2)
    table.purge(victims, "purge-1", ts=TS)

    def leftover():
        raw = table._read_files([f["path"] for f in table.manifest()["files"]])
        return raw.where(
            F.col("conv_id").isin(victims) & F.col("text").isNotNull()
        ).count()

    assert leftover() > 0  # pre-compact: old files still referenced
    table.compact()
    assert leftover() == 0  # folded: tombstones only
    # LWW guard survives compaction: stale redelivery still loses
    apply_batch(table, log.where(F.col("conv_id").isin(victims)), "redeliver")
    assert table.read().where(F.col("conv_id").isin(victims)).count() == 0
    pre = {f["path"] for f in table.manifest(1)["files"]}
    gc = table.expire_snapshots(keep_n=1)
    assert gc["files_deleted"] > 0
    assert not any(os.path.exists(p) for p in pre - {
        f["path"] for f in table.manifest()["files"]
    })


def test_purge_propagates_to_silver_through_change_feed(spark, tmp_path):
    """End-to-end right-to-erasure: purge bronze, then the NORMAL
    medallion catch-up (no purge-awareness anywhere downstream) must
    remove the victims' rows — payloads included — from the silver
    view, because the purge flows through changes_between like any
    other commit."""
    from schema_matching_spark.streaming.derived import start_derived_stream
    from schema_matching_spark.streaming.pipeline import drain_catchup

    bronze, log = _build(spark, tmp_path)
    silver = SnapshotTable(spark, str(tmp_path / "silver"), n_buckets=4)
    cp = str(tmp_path / "cp")

    def sync():
        drain_catchup(
            lambda: start_derived_stream(spark, bronze.root, silver, cp),
            timeout=120,
        )

    sync()
    victims = _some_convs(log)
    assert silver.read().where(F.col("conv_id").isin(victims)).count() > 0

    bronze.purge(victims, "purge-1", ts=TS)
    sync()
    assert silver.read().where(F.col("conv_id").isin(victims)).count() == 0
    survivors = expected_state(log).where(~F.col("conv_id").isin(victims))
    assert states_equal(silver.read(), survivors)
    # silver's current files hold no victim payload either
    raw = silver._read_files([f["path"] for f in silver.manifest()["files"]])
    assert raw.where(
        F.col("conv_id").isin(victims) & F.col("text").isNotNull()
    ).count() == 0


def test_expire_reclaims_superseded_payload_bytes(spark, tmp_path):
    import glob
    import os

    table, log = _build(spark, tmp_path)
    victims = _some_convs(log, 2)
    pre_files = {f["path"] for f in table.manifest()["files"]}
    table.purge(victims, "purge-1", ts=TS)
    gc = table.expire_snapshots(keep_n=1)
    assert gc["files_deleted"] > 0
    # the pre-purge bucket files holding victim payloads are gone
    survivors = {f["path"] for f in table.manifest()["files"]}
    for p in pre_files - survivors:
        assert not os.path.exists(p)
