"""Value tests for the round-4 rows-only evidence queries
(bootstrap_fence / multi_table_router / dlq_audit, queries/cdc.py).

The driver's CORRECTNESS gate only checks rows+schema for rows-only
queries; these tests pin the VALUES the counters must take, so a driver
row plus this file together give full evidence (the pattern
tests/test_rows_only_oracles.py established)."""

from schema_matching_spark.queries.cdc import (
    q_bootstrap_fence,
    q_dlq_audit,
    q_multi_table_router,
)
from tests.conftest import SF_DIR


def test_bootstrap_fence_invariants(spark):
    r = q_bootstrap_fence(spark, SF_DIR).collect()[0]
    assert r["state_mismatches"] == 0
    assert r["bootstrap_replay_noop"] == 1
    assert r["manifest_fence_lsn"] == r["fence_lsn"] == 2999
    assert r["overlap_events"] == 1000  # the fence dropped exactly these
    assert r["tail_events"] == 6000 - 2000
    assert r["snapshot_rows"] > 0 and r["final_rows"] > 0


def test_multi_table_router_invariants(spark):
    r = q_multi_table_router(spark, SF_DIR).collect()[0]
    assert r["mismatch_a"] == 0 and r["mismatch_b"] == 0
    assert r["replay_noop"] == 1
    assert r["unknown_events"] == r["unknown_quarantined"] > 0
    assert (
        r["routed_a"] + r["routed_b"] + r["unknown_events"] == 6000
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
        "ok": 3000,
        "unparseable_json": 2,
        "missing_op": 1,
        "unknown_op": 1,
        "missing_lsn": 1,
        "missing_key": 1,
        "tombstone": 1,
    }
