"""Bootstrap snapshot + LSN-fence switchover (plans/table.py
bootstrap_load; north rule "binlog/WAL tail → lake upsert").

The real-world CDC start sequence: snapshot the source at position F,
bulk-load it, then tail the WAL from at-or-before F.  The overlap must
be idempotent — including the one case plain LWW cannot cover (a key
deleted before F has no snapshot row and no tombstone, so a redelivered
pre-fence insert must be fenced out, not resurrected)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from schema_matching_spark.operators.apply import apply_batch
from schema_matching_spark.operators.verify import content_hash, states_equal
from schema_matching_spark.plans.table import SnapshotTable
from schema_matching_spark.schemas import CHANGE_SCHEMA
from schema_matching_spark.sources.generator import changes, expected_state

N = 3000
FENCE = 1800


@pytest.fixture(scope="module")
def log(spark):
    df = changes(spark, N, n_conv=30, turns_per_conv=15, partitions=4).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def full_expected(log):
    df = expected_state(log).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def snapshot(log):
    """Source state at the fence — what a snapshot job would export."""
    df = expected_state(log.where(F.col("lsn") <= FENCE)).cache()
    df.count()
    return df


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_bootstrap_plus_overlapping_tail_equals_full_replay(
    spark, tmp_path, log, full_expected, snapshot, mode
):
    """bootstrap(state≤F, F) + replay of the ENTIRE log (maximal
    overlap) == pure replay of the log."""
    table = SnapshotTable(spark, str(tmp_path / mode), n_buckets=8, mode=mode)
    table.bootstrap_load(snapshot, FENCE)
    step = N // 3
    for i in range(3):
        batch = log.where(
            (F.col("lsn") >= i * step) & (F.col("lsn") < (i + 1) * step + step)
        )  # deliberately overlapping slices
        apply_batch(table, batch, batch_id=i)
    actual = table.read()
    assert states_equal(actual, full_expected)
    assert content_hash(actual) == content_hash(full_expected)


def _tiny_log(spark, rows):
    ts = dt.datetime(2026, 1, 1)
    return spark.createDataFrame(
        [
            (lsn, op, ts, conv, 0, "user", text, None)
            for (lsn, op, conv, text) in rows
        ],
        CHANGE_SCHEMA,
    )


def test_deleted_key_not_resurrected_by_prefence_redelivery(spark, tmp_path):
    """Key inserted at lsn 1, deleted at lsn 5, fence at 10: the
    snapshot has no row for it; redelivering the lsn-1 insert must NOT
    bring it back.  A genuinely new post-fence insert must."""
    log = _tiny_log(
        spark,
        [(1, "I", "ghost", "hello"), (5, "D", "ghost", None), (3, "I", "live", "hi")],
    )
    snap = expected_state(log)  # only 'live' survives
    table = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=4)
    table.bootstrap_load(snap, 10)

    redelivered = _tiny_log(spark, [(1, "I", "ghost", "hello")])
    apply_batch(table, redelivered, batch_id="catchup-0")
    assert table.read().where(F.col("conv_id") == "ghost").isEmpty()

    fresh = _tiny_log(spark, [(11, "I", "ghost", "reborn")])
    apply_batch(table, fresh, batch_id="catchup-1")
    got = table.read().where(F.col("conv_id") == "ghost").collect()
    assert [r["text"] for r in got] == ["reborn"]


def test_bootstrap_is_ledgered_and_idempotent(spark, tmp_path, snapshot):
    table = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=4)
    v1 = table.bootstrap_load(snapshot, FENCE)
    assert table.bootstrap_load(snapshot, FENCE) == v1  # replay = no-op
    assert table.current_version() == v1


def test_bootstrap_requires_empty_table(spark, tmp_path, snapshot):
    table = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=4)
    table.bootstrap_load(snapshot, FENCE)
    with pytest.raises(ValueError, match="empty table"):
        table.bootstrap_load(snapshot, FENCE, batch_id="second")


def test_fence_persists_across_reopen_and_compact(spark, tmp_path, log):
    root = str(tmp_path / "t")
    log_pre = log.where(F.col("lsn") <= FENCE)
    table = SnapshotTable(spark, root, n_buckets=4, mode="mor")
    table.bootstrap_load(expected_state(log_pre), FENCE)
    before = content_hash(table.read())

    # a post-fence event, then compaction, then a reopened handle
    apply_batch(
        table, log.where(F.col("lsn") == FENCE + 1), batch_id="tail-0"
    )
    table.compact()
    reopened = SnapshotTable(spark, root)
    assert reopened.manifest()["fence_lsn"] == FENCE
    after_tail = content_hash(reopened.read())

    # pre-fence redelivery through the REOPENED handle: state unchanged
    apply_batch(
        reopened, log.where(F.col("lsn") <= FENCE), batch_id="redeliver"
    )
    assert content_hash(reopened.read()) == after_tail
    assert after_tail != before or log.where(F.col("lsn") == FENCE + 1).isEmpty()


def test_snapshot_with_per_row_lsn_is_honoured(spark, tmp_path):
    """Sources that export last-modified positions per row keep them:
    stored lsn reflects the row's true position, not the fence."""
    ts = dt.datetime(2026, 1, 1)
    snap = spark.createDataFrame(
        [("a", 0, "user", "x", None, ts, 7)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp, lsn long",
    )
    table = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=4)
    table.bootstrap_load(snap, 10)
    files = [f["path"] for f in table.manifest()["files"]]
    stored = spark.read.parquet(*files).select("lsn").collect()
    assert [r["lsn"] for r in stored] == [7]
