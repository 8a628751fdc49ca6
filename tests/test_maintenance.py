"""Snapshot maintenance: expire_snapshots + orphan GC, and bounded
manifest growth over a long stream (VERDICT r1 items 2-3).

The manifest-bounding checks drive the pure commit protocol directly
(300 fake commits — no Spark jobs needed to prove O(1) manifest bytes);
the expiry checks run real merges so the reclaimed files are real."""

import json
import os

import pytest
from pyspark.sql import functions as F

from schema_matching_spark.operators.apply import apply_batch
from schema_matching_spark.operators.verify import content_hash, states_equal
from schema_matching_spark.plans.table import (
    APPLIED_KEEP,
    LINEAGE_KEEP,
    SnapshotTable,
    _batch_applied,
)
from schema_matching_spark.sources.generator import changes, expected_state


def _manifest_bytes(table):
    return os.path.getsize(table._manifest_path(table.current_version()))


def test_manifest_growth_is_bounded_over_300_commits(spark, tmp_path):
    """300 commits through the real commit protocol (empty file lists —
    the ledger/lineage logic is identical for real merges): manifest
    size must plateau, not grow linearly."""
    table = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=4)
    sizes = []
    for i in range(300):
        cur = table.manifest()
        table._commit_merge(cur, [], [], batch_id=i, affected=set(),
                            extra_lineage=None)
        sizes.append(_manifest_bytes(table))
    m = table.manifest()
    assert len(m["lineage"]) == LINEAGE_KEEP
    assert m["lineage_truncated"] == 300 - LINEAGE_KEEP
    assert len(m["applied_batches"]) == APPLIED_KEEP
    # once both windows are full, size stops growing (±keys of different
    # integer widths)
    assert sizes[-1] <= sizes[APPLIED_KEEP + 10] * 1.05
    # a naive O(commits) manifest at 300 commits would be ~5x the window
    assert sizes[-1] < sizes[50] * 3


def test_evicted_numeric_batch_ids_stay_applied(spark, tmp_path):
    table = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=4)
    for i in range(APPLIED_KEEP + 40):
        cur = table.manifest()
        table._commit_merge(cur, [], [], batch_id=i, affected=set(),
                            extra_lineage=None)
    m = table.manifest()
    # batch 0..39 were evicted from the window yet must read as applied
    assert "0" not in m["applied_batches"]
    for evicted in (0, 17, 39):
        assert _batch_applied(m, evicted)
    assert _batch_applied(m, APPLIED_KEEP + 39)  # newest, in-window
    assert not _batch_applied(m, APPLIED_KEEP + 40)  # never applied
    # non-numeric ids inside the window still dedup exactly
    cur = table.manifest()
    table._commit_merge(cur, [], [], batch_id="restart-marker",
                        affected=set(), extra_lineage=None)
    assert _batch_applied(table.manifest(), "restart-marker")
    assert not _batch_applied(table.manifest(), "never-seen")


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_expire_snapshots_reclaims_disk_and_keeps_state(spark, tmp_path, mode):
    log = changes(spark, 1200, n_conv=30, turns_per_conv=10, partitions=2).cache()
    expected = expected_state(log).cache()
    table = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=4, mode=mode)
    step = 100
    for i in range(12):
        batch = log.where(
            (F.col("lsn") >= i * step) & (F.col("lsn") < (i + 1) * step)
        )
        apply_batch(table, batch, batch_id=i)
    assert table.current_version() == 12
    h_before = content_hash(table.read())

    def disk_bytes():
        total = 0
        for dirpath, _d, files in os.walk(str(tmp_path / "t" / "data")):
            total += sum(os.path.getsize(os.path.join(dirpath, f)) for f in files)
        return total

    before = disk_bytes()
    stats = table.expire_snapshots(keep_n=3)
    assert stats["manifests_deleted"] == 9  # v1..v9 gone, v10-12 retained
    if mode == "cow":
        # COW rewrites affected buckets every merge → old versions own
        # real bytes that must be reclaimed
        assert stats["files_deleted"] > 0
        assert disk_bytes() < before
    # current state untouched, bit-for-bit
    assert content_hash(table.read()) == h_before
    assert states_equal(table.read(), expected)
    # retained time travel still works; expired versions are gone
    assert table.time_travel(10).count() >= 0
    with pytest.raises(FileNotFoundError):
        table.manifest(3)
    # idempotent re-run
    stats2 = table.expire_snapshots(keep_n=3)
    assert stats2["manifests_deleted"] == 0
    assert stats2["files_deleted"] == 0


def test_expire_after_compact_gc_folds_everything(spark, tmp_path):
    """compact() then expire(keep_n=1): only the compacted snapshot's
    files remain on disk."""
    log = changes(spark, 800, n_conv=20, turns_per_conv=8, partitions=2)
    table = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=4, mode="mor")
    for i in range(4):
        batch = log.where(
            (F.col("lsn") >= i * 200) & (F.col("lsn") < (i + 1) * 200)
        )
        apply_batch(table, batch, batch_id=i)
    h = content_hash(table.read())
    table.compact()
    table.expire_snapshots(keep_n=1)
    live = {f["path"] for f in table.manifest()["files"]}
    on_disk = set()
    for dirpath, _d, files in os.walk(str(tmp_path / "t" / "data")):
        on_disk.update(
            os.path.join(dirpath, f) for f in files if f.endswith(".parquet")
        )
    assert on_disk == live
    assert content_hash(table.read()) == h


def test_stream_with_inline_maintenance_bounds_storage(spark, tmp_path):
    """The 10^10-scale storage story end-to-end: a stream that compacts
    + expires every N batches keeps the manifest at O(bucket-count)
    files and the data dir at O(live-set) bytes, while the final state
    stays bit-identical to the maintenance-free replay."""
    from schema_matching_spark.sources.wal import write_segments
    from schema_matching_spark.streaming.pipeline import run_stream_to_completion

    log = changes(spark, 2000, n_conv=30, turns_per_conv=8, partitions=2).cache()
    exp = expected_state(log).cache()
    wal = str(tmp_path / "wal")
    write_segments(log, wal, n_segments=8)

    table = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=4, mode="mor")
    run_stream_to_completion(
        spark, wal, table, str(tmp_path / "ckpt"),
        maintenance_every=3, keep_snapshots=2,
    )
    assert states_equal(table.read(), exp)
    assert content_hash(table.read()) == content_hash(exp)
    # compact folded the MOR deltas: live file count is O(n_buckets),
    # not O(batches x buckets)
    m = table.manifest()
    assert len(m["files"]) <= 3 * table.n_buckets, len(m["files"])
    # expiry kept the snapshot dir bounded
    snaps = os.listdir(str(tmp_path / "t" / "snapshots"))
    assert len(snaps) <= 2 + 3  # keep_n + commits since last maintenance
    # on-disk parquet ~= live set (no unbounded garbage)
    live = {f["path"] for f in m["files"]}
    on_disk = []
    for dirpath, _d, files in os.walk(str(tmp_path / "t" / "data")):
        on_disk.extend(
            os.path.join(dirpath, f) for f in files if f.endswith(".parquet")
        )
    orphans = [p for p in on_disk if p not in live]
    # only files younger than the last expiry can be non-live
    assert len(orphans) <= 3 * table.n_buckets, len(orphans)


def test_metadata_views(spark, tmp_path):
    """Iceberg-parity metadata relations: history / snapshots / files."""
    log = changes(spark, 600, n_conv=10, turns_per_conv=6, partitions=2)
    table = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=4)
    for i in range(3):
        batch = log.where(
            (F.col("lsn") >= i * 200) & (F.col("lsn") < (i + 1) * 200)
        )
        apply_batch(table, batch, batch_id=i)

    hist = table.history().collect()
    assert [r["version"] for r in hist] == [1, 2, 3]
    assert all(r["op"] == "merge" for r in hist)
    assert {r["batch_id"] for r in hist} == {"0", "1", "2"}

    snaps = {r["version"]: r for r in table.snapshots().collect()}
    assert set(snaps) == {1, 2, 3}
    assert snaps[3]["is_current"] and not snaps[1]["is_current"]
    assert snaps[3]["parent"] == 2

    files = table.files().collect()
    assert len(files) == len(table.manifest()["files"])
    assert all(r["size_bytes"] and r["size_bytes"] > 0 for r in files)
    assert {r["bucket"] for r in files} <= set(range(4))
    # per-file footer stats surfaced (B14) and consistent
    assert all(r["n_rows"] and r["lsn_min"] <= r["lsn_max"] for r in files)

    parts = table.partitions().collect()
    assert sum(r["n_files"] for r in parts) == len(files)
    assert sum(r["n_rows"] for r in parts) == sum(r["n_rows"] for r in files)
    assert sum(r["n_rows"] for r in parts) >= table.read().count()  # + tombstones
    assert max(r["lsn_max"] for r in parts) == max(r["lsn_max"] for r in files)
    # files() of an expired snapshot version raises like Iceberg's
    # time-travel-past-expiry
    table.expire_snapshots(keep_n=1)
    with pytest.raises(FileNotFoundError):
        table.files(1)


def test_bucket_range_compaction(spark, tmp_path):
    """Rolling compaction over bucket subsets (the 100 TB schedule
    shape): two half-range compacts equal one full compact, untouched
    buckets carry forward unchanged, state stays bit-identical."""
    log = changes(spark, 800, n_conv=20, turns_per_conv=8, partitions=2)
    table = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=4, mode="mor")
    for i in range(4):
        batch = log.where(
            (F.col("lsn") >= i * 200) & (F.col("lsn") < (i + 1) * 200)
        )
        apply_batch(table, batch, batch_id=i)
    h = content_hash(table.read())
    files_before = {f["path"] for f in table.manifest()["files"]}

    table.compact(buckets=[0, 1])
    m = table.manifest()
    # buckets 2,3 files untouched (carried forward), 0,1 rewritten
    carried = {f["path"] for f in m["files"] if f["bucket"] in (2, 3)}
    rewritten = {f["path"] for f in m["files"] if f["bucket"] in (0, 1)}
    assert carried <= files_before
    assert rewritten.isdisjoint(files_before)
    assert content_hash(table.read()) == h

    table.compact(buckets=[2, 3])
    m2 = table.manifest()
    # after both halves: one file set per bucket, all deltas folded
    assert len(m2["files"]) <= 2 * table.n_buckets
    assert content_hash(table.read()) == h
    hist = table.history().collect()
    assert [r["op"] for r in hist[-2:]] == ["compact", "compact"]


def test_point_lookup_prunes_to_one_bucket(spark, tmp_path):
    """lookup(conv_id): manifest-level bucket pruning + correct turns
    in order, on both COW and MOR tables."""
    from schema_matching_spark.sources.generator import expected_state

    log = changes(spark, 1500, n_conv=25, turns_per_conv=8, partitions=2).cache()
    exp = expected_state(log).cache()
    some_conv = exp.select("conv_id").first()["conv_id"]
    expected_rows = [
        (r["turn_idx"], r["text"])
        for r in exp.where(F.col("conv_id") == some_conv)
        .orderBy("turn_idx")
        .collect()
    ]
    for mode in ("cow", "mor"):
        table = SnapshotTable(
            spark, str(tmp_path / mode), n_buckets=8, mode=mode
        )
        for i in range(3):
            batch = log.where(
                (F.col("lsn") >= i * 500) & (F.col("lsn") < (i + 1) * 500)
            )
            apply_batch(table, batch, batch_id=i)
        got = [
            (r["turn_idx"], r["text"]) for r in table.lookup(some_conv).collect()
        ]
        assert got == expected_rows, mode
        # a conversation that doesn't exist returns empty, not an error
        assert table.lookup("conv-nope").isEmpty()
