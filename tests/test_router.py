"""Multi-table fan-out router (streaming/router.py): one Debezium WAL
carrying two tables' changes, split by source.table, exactly-once per
table — including the crash window where table A committed a batch and
table B did not."""

import os

import pytest
from pyspark.sql import functions as F

from schema_matching_spark.operators.verify import states_equal
from schema_matching_spark.plans.table import SnapshotTable
from schema_matching_spark.schemas import CHANGE_COLS
from schema_matching_spark.sources import debezium
from schema_matching_spark.sources.generator import changes, expected_state
from schema_matching_spark.streaming.router import route_batch, start_router_stream


def _two_table_log(spark, n=5000):
    log = changes(spark, n, n_conv=60, turns_per_conv=10, partitions=4)
    return log.withColumn(
        "_table",
        F.when(F.pmod(F.xxhash64("lsn", F.lit("route")), 2) == 0, "alpha").otherwise(
            "beta"
        ),
    )


@pytest.fixture(scope="module")
def routed_log(spark):
    df = _two_table_log(spark).cache()
    df.count()
    return df


def _expected_pair(routed_log):
    a = expected_state(routed_log.where(F.col("_table") == "alpha"))
    b = expected_state(routed_log.where(F.col("_table") == "beta"))
    return a, b


def test_route_batch_splits_and_counts(spark, tmp_path, routed_log):
    tables = {
        "alpha": SnapshotTable(spark, str(tmp_path / "a"), n_buckets=4),
        "beta": SnapshotTable(spark, str(tmp_path / "b"), n_buckets=4),
    }
    routed = route_batch(tables, routed_log, batch_id=0)
    assert set(routed) == {"alpha", "beta"}
    assert routed["alpha"] + routed["beta"] == routed_log.count()
    ea, eb = _expected_pair(routed_log)
    assert states_equal(tables["alpha"].read(), ea)
    assert states_equal(tables["beta"].read(), eb)


def test_partial_failure_replay_is_exactly_once(spark, tmp_path, routed_log):
    """Simulate the crash window: table alpha already committed batch 7
    (a prior attempt died before beta applied).  Replaying the batch
    must no-op alpha and apply beta."""
    tables = {
        "alpha": SnapshotTable(spark, str(tmp_path / "a"), n_buckets=4),
        "beta": SnapshotTable(spark, str(tmp_path / "b"), n_buckets=4),
    }
    tables["alpha"].merge_apply(
        routed_log.where(F.col("_table") == "alpha").select(*CHANGE_COLS), 7
    )
    v_alpha = tables["alpha"].current_version()

    route_batch(tables, routed_log, batch_id=7)
    assert tables["alpha"].current_version() == v_alpha  # ledger no-op
    ea, eb = _expected_pair(routed_log)
    assert states_equal(tables["alpha"].read(), ea)
    assert states_equal(tables["beta"].read(), eb)

    # full replay of the whole batch: no version moves anywhere
    vs = {k: t.current_version() for k, t in tables.items()}
    route_batch(tables, routed_log, batch_id=7)
    assert vs == {k: t.current_version() for k, t in tables.items()}


def test_unknown_table_quarantined_with_count(spark, tmp_path, routed_log):
    tables = {"alpha": SnapshotTable(spark, str(tmp_path / "a"), n_buckets=4)}
    unknown_dir = str(tmp_path / "unknown")
    routed = route_batch(tables, routed_log, batch_id=0, unknown_dir=unknown_dir)
    n_beta = routed_log.where(F.col("_table") == "beta").count()
    assert routed["_unknown"] == n_beta
    q = spark.read.parquet(unknown_dir)
    assert q.count() == n_beta
    assert q.select(F.collect_set("_table")).first()[0] == ["beta"]


def test_router_stream_end_to_end(spark, tmp_path, routed_log):
    """Envelope segments with source.table → streamed fan-out → both
    tables match their per-table LWW oracles."""
    from schema_matching_spark.streaming.pipeline import drain_catchup

    wal = str(tmp_path / "wal")
    debezium.write_segments(routed_log, wal, n_segments=3, table_col="_table")
    tables = {
        "alpha": SnapshotTable(spark, str(tmp_path / "a"), n_buckets=4),
        "beta": SnapshotTable(spark, str(tmp_path / "b"), n_buckets=4),
    }
    drain_catchup(
        lambda: start_router_stream(
            spark,
            wal,
            tables,
            checkpoint_dir=str(tmp_path / "ckpt"),
            max_files_per_trigger=1,
        ),
        timeout=180,
    )
    ea, eb = _expected_pair(routed_log)
    assert states_equal(tables["alpha"].read(), ea)
    assert states_equal(tables["beta"].read(), eb)
    # ledgers carry the SAME stream batch ids, one per table
    assert set(tables["alpha"].applied_batches()) == set(
        tables["beta"].applied_batches()
    )


def test_envelope_roundtrip_keeps_table(spark, routed_log):
    env = debezium.to_envelope(routed_log.limit(500), table_col="_table")
    tagged = debezium.parse_envelope_tagged(env)
    assert tagged.where(F.col("_table").isNull()).count() == 0
    assert set(
        r["_table"] for r in tagged.select("_table").distinct().collect()
    ) == {"alpha", "beta"}
    # envelopes WITHOUT source.table still parse (single-table WALs)
    plain = debezium.to_envelope(routed_log.limit(10))
    t2 = debezium.parse_envelope_tagged(plain)
    assert t2.where(F.col("_table").isNotNull()).count() == 0
    assert t2.where(F.col("dlq_reason").isNotNull()).count() == 0


def test_null_table_quarantined_not_dropped(spark, tmp_path, routed_log):
    """NULL _table (envelope without source.table) must land in the
    quarantine parquet, not just the counter: ~isin() alone evaluates
    NULL for NULL and silently drops the row from the sink."""
    tables = {"alpha": SnapshotTable(spark, str(tmp_path / "a"), n_buckets=4)}
    nulled = routed_log.limit(200).withColumn(
        "_table",
        F.when(F.col("_table") == "beta", F.lit(None).cast("string")).otherwise(
            F.col("_table")
        ),
    ).cache()
    n_null = nulled.where(F.col("_table").isNull()).count()
    assert n_null > 0
    unknown_dir = str(tmp_path / "unknown")
    routed = route_batch(tables, nulled, batch_id=0, unknown_dir=unknown_dir)
    assert routed["_unknown"] == n_null
    q = spark.read.parquet(unknown_dir)
    assert q.count() == n_null  # counter and parquet agree
    assert q.where(F.col("_table").isNull()).count() == n_null
    nulled.unpersist()
