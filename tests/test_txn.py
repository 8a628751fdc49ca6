"""Transaction-boundary atomic apply (streaming/txn.py).

The invariant under test: NO committed snapshot ever contains a partial
source transaction, no matter where segment rotation / micro-batch
boundaries fall — and the gate still converges to the full state
(count-carrying tails complete themselves; count-less final tails via
an explicit flush)."""

import pytest
from pyspark.sql import functions as F

from schema_matching_spark.operators.verify import states_equal
from schema_matching_spark.plans.table import SnapshotTable
from schema_matching_spark.sources import debezium
from schema_matching_spark.streaming.pipeline import drain_catchup
from schema_matching_spark.streaming.txn import (
    apply_txn_batch,
    flush_pending,
    split_ready,
    start_txn_cdc_stream,
)

PER = 5  # events per source transaction


def txn_log(spark, n_txns, with_count=True):
    """Insert-only change log, one distinct key per event, PER events
    per transaction, transactions contiguous in lsn — the WAL shape."""
    ts = F.lit("2026-01-01 00:00:00").cast("timestamp")
    cnt = F.lit(PER).cast("long") if with_count else F.lit(None).cast("long")
    return spark.range(n_txns * PER).select(
        F.col("id").alias("lsn"),
        F.lit("I").alias("op"),
        ts.alias("ts"),
        F.concat(F.lit("c"), (F.col("id") / PER).cast("long")).alias("conv_id"),
        (F.col("id") % PER).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.concat(F.lit("txt-"), F.col("id")).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.concat(F.lit("t"), (F.col("id") / PER).cast("long")).alias("_txn_id"),
        cnt.alias("_txn_count"),
    )


def assert_no_torn_txn_in_any_version(table):
    """Walk every retained snapshot: each transaction present must be
    fully present (keys are distinct per event, so state == applied set)."""
    v = table.current_version()
    while v > 0:
        m = table.manifest(v)
        partial = (
            table.time_travel(v)
            .groupBy("conv_id")
            .count()
            .where(F.col("count") != PER)
            .count()
        )
        assert partial == 0, f"version {v} contains a torn transaction"
        v = int(m.get("parent", 0))


def test_split_ready_rules(spark):
    log = txn_log(spark, 3, with_count=False)  # t0 t1 complete, then:
    events = (
        log.where(F.col("lsn") <= 11)  # t2 partial (2 of 5) — the tail
        .unionByName(
            txn_log(spark, 1).select(  # autocommit rows: txn id NULL
                (F.col("lsn") + 100).alias("lsn"),
                "op", "ts",
                F.concat(F.lit("auto"), F.col("conv_id")).alias("conv_id"),
                "turn_idx", "role", "text", "tool",
                F.lit(None).cast("string").alias("_txn_id"),
                F.lit(None).cast("long").alias("_txn_count"),
            )
        )
    )
    ready, pending = split_ready(events)
    # autocommit rows ready even though they carry the max lsns
    assert ready.where(F.col("_txn_id").isNull()).count() == PER
    # t0/t1 ready by contiguity (t2's events have higher lsns)...
    assert sorted(
        r["_txn_id"]
        for r in ready.where(F.col("_txn_id").isNotNull())
        .select("_txn_id").distinct().collect()
    ) == ["t0", "t1"]
    # ...t2 held: it is the tail and carries no count
    assert pending.select("_txn_id").distinct().collect()[0]["_txn_id"] == "t2"
    assert pending.count() == 2

    # the SAME tail txn with a satisfied count is ready
    counted = events.where(F.col("_txn_id").isNotNull()).withColumn(
        "_txn_count",
        F.when(F.col("_txn_id") == "t2", F.lit(2)).otherwise(F.lit(PER)),
    )
    ready2, pending2 = split_ready(counted)
    assert pending2.count() == 0
    assert ready2.count() == counted.count()


@pytest.fixture(scope="module")
def countless_drained(spark, tmp_path_factory):
    """Count-less txn WAL, segments split mid-transaction, drained."""
    base = tmp_path_factory.mktemp("txn")
    log = txn_log(spark, 400, with_count=False).cache()
    log.count()
    wal = str(base / "wal")
    # 3 segments over 2000 lsns -> boundaries at 667/1334: mid-txn
    debezium.write_segments(
        log, wal, n_segments=3, txn_id_col="_txn_id", txn_count_col="_txn_count"
    )
    table = SnapshotTable(spark, str(base / "tbl"), n_buckets=4)
    pend = str(base / "pending")
    drain_catchup(
        lambda: start_txn_cdc_stream(
            spark, wal, table,
            checkpoint_dir=str(base / "ckpt"),
            pending_dir=pend,
            max_files_per_trigger=1,
        ),
        timeout=180,
    )
    return log, table, pend


def test_stream_never_commits_torn_txn(spark, countless_drained):
    log, table, _ = countless_drained
    assert_no_torn_txn_in_any_version(table)
    # the count-less trailing transaction is HELD, not applied
    assert table.read().where(F.col("conv_id") == "c399").isEmpty()
    assert table.read().count() == (400 - 1) * PER


def test_flush_applies_held_tail_exactly_once(spark, countless_drained):
    from schema_matching_spark.schemas import TRANSCRIPT_COLS

    log, table, pend = countless_drained
    assert flush_pending(table, pend) == PER
    assert states_equal(table.read(), log.select(*TRANSCRIPT_COLS))
    v = table.current_version()
    flush_pending(table, pend)  # ledgered replay: no-op
    assert table.current_version() == v


def test_counted_tail_completes_itself(spark, tmp_path):
    """With event_count on the envelopes, the final transaction applies
    without any flush — the gate sees it is whole."""
    log = txn_log(spark, 100, with_count=True)
    wal = str(tmp_path / "wal")
    debezium.write_segments(
        log, wal, n_segments=3, txn_id_col="_txn_id", txn_count_col="_txn_count"
    )
    table = SnapshotTable(spark, str(tmp_path / "tbl"), n_buckets=4)
    drain_catchup(
        lambda: start_txn_cdc_stream(
            spark, wal, table,
            checkpoint_dir=str(tmp_path / "ckpt"),
            pending_dir=str(tmp_path / "pending"),
            max_files_per_trigger=1,
        ),
        timeout=180,
    )
    assert table.read().count() == 100 * PER
    assert_no_torn_txn_in_any_version(table)


def test_crash_replay_of_a_gated_batch_is_exactly_once(spark, tmp_path):
    """Replaying the same (batch_id, events) after any crash window
    recomputes the same split and no-ops the merge."""
    log = txn_log(spark, 10, with_count=False).cache()
    table = SnapshotTable(spark, str(tmp_path / "tbl"), n_buckets=4)
    pend = str(tmp_path / "pending")

    b1 = log.where(F.col("lsn") < 23)  # t0-t3 complete, t4 partial
    r = apply_txn_batch(table, b1, 0, pend)
    assert r == {"ready": 20, "held": 3}
    v1 = table.current_version()
    # crash-replay batch 0: same pending pointer target, merge no-op
    assert apply_txn_batch(table, b1, 0, pend) == {"ready": 20, "held": 3}
    assert table.current_version() == v1
    assert_no_torn_txn_in_any_version(table)

    # next batch completes t4 and everything else; tail t9 held
    b2 = log.where(F.col("lsn") >= 23)
    r2 = apply_txn_batch(table, b2, 1, pend)
    assert r2["held"] == PER  # t9, count-less tail
    assert table.read().count() == 9 * PER
    assert_no_torn_txn_in_any_version(table)
    assert flush_pending(table, pend) == PER
    assert table.read().count() == 10 * PER


def test_envelope_transaction_block_roundtrip(spark):
    log = txn_log(spark, 4, with_count=True)
    env = debezium.to_envelope(log, txn_id_col="_txn_id", txn_count_col="_txn_count")
    tagged = debezium.parse_envelope_tagged(env)
    assert tagged.where(F.col("dlq_reason").isNotNull()).count() == 0
    got = tagged.select("lsn", "_txn_id", "_txn_count")
    exp = log.select("lsn", "_txn_id", "_txn_count")
    assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0
    # envelopes WITHOUT a transaction block parse with NULL txn columns
    plain = debezium.to_envelope(log.limit(3))
    t2 = debezium.parse_envelope_tagged(plain)
    assert t2.where(F.col("_txn_id").isNotNull()).count() == 0
    assert t2.where(F.col("dlq_reason").isNotNull()).count() == 0


def test_freshness_lag_from_stream_lineage(spark, tmp_path):
    """start_cdc_stream stamps event_ts_hi_ms + commit_lag_sec per
    merge; freshness_lag() reads the newest one metadata-only."""
    from schema_matching_spark.sources.generator import changes
    from schema_matching_spark.sources.wal import write_segments
    from schema_matching_spark.streaming.metrics import freshness_lag
    from schema_matching_spark.streaming.pipeline import start_cdc_stream

    log = changes(spark, 1000, n_conv=20, turns_per_conv=10, partitions=2)
    wal = str(tmp_path / "wal")
    write_segments(log, wal, 2)
    table = SnapshotTable(spark, str(tmp_path / "tbl"), n_buckets=4)
    drain_catchup(
        lambda: start_cdc_stream(
            spark, wal, table,
            checkpoint_dir=str(tmp_path / "ckpt"),
            max_files_per_trigger=1,
        ),
        timeout=180,
    )
    f = freshness_lag(table)
    assert f is not None
    # generator event times are in the past: lag positive and sane,
    # staleness >= lag-at-commit (wall clock only moves forward)
    assert f["commit_lag_sec"] > 0
    assert f["staleness_sec"] >= f["commit_lag_sec"]
    expected_hi = log.agg(
        F.max(F.unix_millis(F.col("ts").cast("timestamp")))
    ).first()[0]
    assert f["event_ts_hi_ms"] == expected_hi
    # an empty trailing micro-batch may commit a version with no event
    # time — freshness reports the newest version that HAS one
    assert 1 <= f["version"] <= table.current_version()

    # batch-only tables have no event-time lineage: None, not a crash
    t2 = SnapshotTable(spark, str(tmp_path / "t2"), n_buckets=2)
    from schema_matching_spark.operators.apply import apply_batch

    apply_batch(t2, log, "b0")
    assert freshness_lag(t2) is None


def test_crash_between_merge_and_pointer_flip(spark, tmp_path, monkeypatch):
    """The one remaining crash window after the merge-first reorder:
    ready set durably committed, pointer still at the previous pending
    generation.  Replay must be a ledger no-op and no carried-then-ready
    event may be lost.  (Under the old pointer-first ordering, a crash
    in the mirror window lost the carried t4 events permanently — in
    neither the replayed batch nor the new pending set.)"""
    import schema_matching_spark.streaming.txn as txn_mod

    log = txn_log(spark, 10, with_count=False).cache()
    table = SnapshotTable(spark, str(tmp_path / "tbl"), n_buckets=4)
    pend = str(tmp_path / "pending")

    b1 = log.where(F.col("lsn") < 23)  # t0-t3 ready, t4 partial (3) held
    assert apply_txn_batch(table, b1, 0, pend) == {"ready": 20, "held": 3}

    # batch 1 completes t4 (carried pending becomes ready) + starts t5
    b2 = log.where((F.col("lsn") >= 23) & (F.col("lsn") < 26))
    real_write = txn_mod._write_pending

    def boom(*a, **k):
        raise RuntimeError("crash before pointer flip")

    monkeypatch.setattr(txn_mod, "_write_pending", boom)
    with pytest.raises(RuntimeError):
        apply_txn_batch(table, b2, 1, pend)
    # merge committed; pointer still targets batch 0's generation
    assert table.read().count() == 5 * PER
    v = table.current_version()
    monkeypatch.setattr(txn_mod, "_write_pending", real_write)

    # crash-replay of batch 1: carried = OLD pending (t4 partial),
    # split recomputes identically, merge no-ops via the ledger
    assert apply_txn_batch(table, b2, 1, pend) == {"ready": 5, "held": 1}
    assert table.current_version() == v
    assert table.read().count() == 5 * PER
    assert_no_torn_txn_in_any_version(table)
    # t4 fully present exactly once (the would-be-lost carried events)
    assert table.read().where(F.col("conv_id") == "c4").count() == PER
