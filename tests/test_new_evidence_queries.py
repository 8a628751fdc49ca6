"""Value tests for the CDC evidence queries (queries/cdc.py).

bootstrap_fence / multi_table_router / dlq_audit / txn_atomic_apply
gained exact DuckDB oracles in r5 (the driver hash-checks them), but
these tests still pin the VALUES at the test SF so a regression is
caught locally long before a driver round; table_maintenance is
rows-only (wall-clock/file-layout internals) and this file is its
named evidence (tests/test_registry_evidence.py allowlist)."""

from schema_matching_spark.queries.cdc import (
    q_bootstrap_fence,
    q_dlq_audit,
    q_multi_table_router,
    q_table_maintenance,
)
from tests.conftest import SF_DIR

# sf0.001: events has 1000 rows, event_id 0..999
N_EVENTS = 1000


def test_bootstrap_fence_invariants(spark):
    r = q_bootstrap_fence(spark, SF_DIR).collect()[0]
    assert r["state_mismatches"] == 0
    assert r["bootstrap_replay_noop"] == 1
    fence = N_EVENTS // 2 - 1
    assert r["manifest_fence_lsn"] == r["fence_lsn"] == fence
    # tail = lsn > fence - 1000 (all of them at this SF); overlap =
    # the pre-fence half the fence must no-op
    assert r["tail_events"] == N_EVENTS
    assert r["overlap_events"] == fence + 1
    assert r["snapshot_rows"] > 0 and r["final_rows"] > 0


def test_multi_table_router_invariants(spark):
    r = q_multi_table_router(spark, SF_DIR).collect()[0]
    assert r["mismatch_a"] == 0 and r["mismatch_b"] == 0
    assert r["replay_noop"] == 1
    assert r["unknown_events"] == r["unknown_quarantined"] > 0
    # event_id % 10 assignment: 5/10 -> a, 4/10 -> b, 1/10 unknown
    assert r["routed_a"] == N_EVENTS // 2
    assert r["routed_b"] == N_EVENTS * 4 // 10
    assert (
        r["routed_a"] + r["routed_b"] + r["unknown_events"] == N_EVENTS
    )  # every event routed or quarantined, never dropped


def test_txn_atomic_apply_invariants(spark):
    from schema_matching_spark.queries.cdc import q_txn_atomic_apply

    r = q_txn_atomic_apply(spark, SF_DIR).collect()[0]
    assert r["torn_txn_versions"] == 0
    assert r["replay_noop"] == 1
    assert (r["b0_ready"], r["b0_held"]) == (55, 2)  # t11 split at lsn 57
    assert r["b1_held"] == 5  # the count-less tail transaction t39
    assert r["b0_ready"] + r["b1_ready"] == r["rows_before_flush"] == 195
    assert r["flushed"] == 5 and r["rows_after_flush"] == 200


def test_dlq_audit_taxonomy_counts(spark):
    got = {r["reason"]: r["n"] for r in q_dlq_audit(spark, SF_DIR).collect()}
    assert got == {
        "ok": N_EVENTS,
        "unparseable_json": 2,
        "missing_op": 1,
        "unknown_op": 1,
        "missing_lsn": 1,
        "missing_key": 1,
        "tombstone": 1,
    }


def test_table_maintenance_invariants(spark):
    r = q_table_maintenance(spark, SF_DIR).collect()[0]
    # MOR delta depth after 6 commits flags every bucket (>2 files);
    # the bounded tick compacts exactly the 2 worst.
    assert r["plan_compact_buckets"] == 4
    assert r["tick_compacted_buckets"] == 2
    # 6 pre-tick manifests, keep 1 -> planner flags 5; after the
    # compact commit (v7) expiry deletes v1..v6.
    assert r["plan_expire_candidates"] == 5
    assert r["manifests_deleted"] == 6
    assert r["files_deleted_positive"] == 1
    assert r["bytes_reclaimed_positive"] == 1
    # maintenance is content-neutral: state == pure LWW oracle
    assert r["state_mismatches_after_tick"] == 0
    # timestamp time travel lands on the retained mid-history commit
    # and reads exactly the 5-batch prefix state
    assert r["asof_version_is_mid"] == 1
    assert r["asof_state_mismatches"] == 0
    # export fence = max ingested lsn (incl. tombstones); restore is
    # bit-identical
    assert r["export_fence_lsn"] == 6 * 800 - 1
    assert r["restore_mismatches"] == 0
    assert r["restored_rows"] > 0
