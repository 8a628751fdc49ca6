"""Snapshot export / bootstrap-from-export round trip
(plans/table.py export_snapshot + bootstrap_from_export) and
timestamp-as-of time travel (version_as_of / read_as_of).

Export is the DR/replication primitive: a table exports its state at a
fenced WAL position; a NEW pipeline bootstraps from the package and
tails the same WAL from at-or-before the fence — O(table) + O(tail)
instead of O(history)."""

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from schema_matching_spark.operators.apply import apply_batch
from schema_matching_spark.operators.verify import content_hash, states_equal
from schema_matching_spark.plans.table import SnapshotTable
from schema_matching_spark.sources.generator import changes, expected_state

N = 3000
CUT = 2000  # events applied before the export


@pytest.fixture(scope="module")
def log(spark):
    df = changes(spark, N, n_conv=30, turns_per_conv=15, partitions=4).cache()
    df.count()
    return df


@pytest.mark.parametrize("src_mode,dst_mode", [("cow", "cow"), ("mor", "cow"), ("mor", "mor")])
def test_export_bootstrap_tail_equals_full_replay(
    spark, tmp_path, log, src_mode, dst_mode
):
    """Source table at CUT events → export → new table (possibly a
    DIFFERENT write mode — DR targets choose their own) → overlapping
    tail → same state as replaying everything."""
    src = SnapshotTable(
        spark, str(tmp_path / f"src_{src_mode}"), n_buckets=4, mode=src_mode
    )
    apply_batch(src, log.where(F.col("lsn") < CUT), "b0")
    exp_dir = str(tmp_path / f"exp_{src_mode}")
    meta = src.export_snapshot(exp_dir)
    assert meta["fence_lsn"] == CUT - 1  # max stored lsn incl. tombstones

    dst = SnapshotTable(
        spark, str(tmp_path / f"dst_{src_mode}_{dst_mode}"), n_buckets=8,
        mode=dst_mode,
    )
    dst.bootstrap_from_export(exp_dir)
    # generous overlap: re-read from 500 before the fence
    apply_batch(dst, log.where(F.col("lsn") > CUT - 500), "tail")
    full = expected_state(log)
    assert states_equal(dst.read(), full)
    assert content_hash(dst.read()) == content_hash(full)


def test_export_fence_covers_trailing_delete(spark, tmp_path, log):
    """If the globally newest event is a DELETE, the export fence must
    still cover it (tombstone lsn rides the file stats): redelivering
    that delete's insert precursor into the restored table must not
    resurrect the key."""
    import datetime as dt

    from schema_matching_spark.schemas import CHANGE_SCHEMA

    ts = dt.datetime(2026, 1, 1)
    tiny = spark.createDataFrame(
        [
            (1, "I", ts, "ghost", 0, "user", "hello", None),
            (2, "I", ts, "live", 0, "user", "hi", None),
            (9, "D", ts, "ghost", 0, "user", None, None),
        ],
        CHANGE_SCHEMA,
    )
    src = SnapshotTable(spark, str(tmp_path / "src"), n_buckets=2)
    apply_batch(src, tiny, "b0")
    exp_dir = str(tmp_path / "exp")
    meta = src.export_snapshot(exp_dir)
    assert meta["fence_lsn"] == 9  # the delete's lsn, not the max live row

    dst = SnapshotTable(spark, str(tmp_path / "dst"), n_buckets=2)
    dst.bootstrap_from_export(exp_dir)
    apply_batch(
        dst, tiny.where(F.col("lsn") == 1), "redeliver"
    )  # pre-fence insert of the deleted key
    assert dst.read().where(F.col("conv_id") == "ghost").isEmpty()


def test_export_preserves_per_row_lsn(spark, tmp_path, log):
    src = SnapshotTable(spark, str(tmp_path / "src"), n_buckets=4)
    apply_batch(src, log.where(F.col("lsn") < CUT), "b0")
    exp_dir = str(tmp_path / "exp")
    src.export_snapshot(exp_dir)
    state = spark.read.parquet(os.path.join(exp_dir, "state"))
    assert "lsn" in state.columns
    # per-row lsns span the history, they are not all the fence value
    lo, hi = state.agg(F.min("lsn"), F.max("lsn")).first()
    assert lo < hi < CUT


def test_export_is_time_travelable(spark, tmp_path, log):
    """Exporting an OLD version packages that version's state."""
    src = SnapshotTable(spark, str(tmp_path / "src"), n_buckets=4)
    apply_batch(src, log.where(F.col("lsn") < CUT), "b0")
    v0 = src.current_version()
    apply_batch(src, log.where(F.col("lsn") >= CUT), "b1")
    exp_dir = str(tmp_path / "exp")
    meta = src.export_snapshot(exp_dir, version=v0)
    assert meta["source_version"] == v0
    assert meta["fence_lsn"] == CUT - 1
    state = spark.read.parquet(os.path.join(exp_dir, "state")).drop("lsn")
    assert states_equal(state, expected_state(log.where(F.col("lsn") < CUT)))


def test_export_empty_table_rejected(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=2)
    with pytest.raises(ValueError, match="empty"):
        t.export_snapshot(str(tmp_path / "exp"))


def test_version_as_of_maps_wall_time_to_versions(spark, tmp_path, log):
    t = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=4)
    before_any = time.time()
    apply_batch(t, log.where(F.col("lsn") < 1000), "b0")
    v1 = t.current_version()
    between = time.time()
    time.sleep(0.05)
    apply_batch(t, log.where(F.col("lsn") >= 1000), "b1")
    v2 = t.current_version()

    assert t.version_as_of(between) == v1
    assert t.version_as_of(time.time()) == v2
    assert states_equal(
        t.read_as_of(between), expected_state(log.where(F.col("lsn") < 1000))
    )
    with pytest.raises(ValueError, match="no retained snapshot"):
        t.version_as_of(before_any)


def test_committed_wall_ts_on_every_manifest(spark, tmp_path, log):
    """Every commit path stamps committed_wall_ts (the anchor
    version_as_of resolves against), monotonic along the parent chain."""
    t = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=4, mode="mor")
    apply_batch(t, log.where(F.col("lsn") < 1000), "b0")
    apply_batch(t, log.where(F.col("lsn") >= 1000), "b1")
    t.compact()
    stamps = []
    v = t.current_version()
    while v > 0:
        m = t.manifest(v)
        stamps.append(m["committed_wall_ts"])
        v = int(m.get("parent", 0))
    assert len(stamps) == 3 and stamps == sorted(stamps, reverse=True)
