"""Iceberg sink adapter gating (plans/iceberg_sink.py): no Iceberg jar
in this sandbox, so availability must report False and the merge must
fail actionably — while the mergeInto API surface it targets exists."""

import pytest

from schema_matching_spark.plans.iceberg_sink import (
    IcebergUnavailableError,
    iceberg_available,
    merge_into_iceberg,
)
from schema_matching_spark.sources.generator import changes


def test_unavailable_without_catalog(spark):
    assert iceberg_available(spark) is False


def test_merge_raises_actionable_error(spark):
    log = changes(spark, 100, n_conv=5, turns_per_conv=5, partitions=1)
    with pytest.raises(IcebergUnavailableError, match="iceberg-spark-runtime"):
        merge_into_iceberg(spark, "db.transcripts", log)


def test_mergeinto_api_present(spark):
    """The swap target (DataFrame.mergeInto) exists in this PySpark."""
    log = changes(spark, 10, n_conv=2, turns_per_conv=2, partitions=1)
    assert hasattr(log, "mergeInto")


# ---------------------------------------------------------------------
# Clause-semantics mirror: no Iceberg runtime here, so pin the MERGE
# clause logic (matched & lsn> → updateAll, incl. tombstones; not
# matched → insertAll, incl. tombstones; readers filter op != 'D')
# against the scenarios ADVICE r1 flagged.  The simulator applies
# exactly the conditions merge_into_iceberg builds.


def _simulate_merge(target: dict, batch: list[dict]) -> dict:
    """target: key -> row(dict with lsn/op/text). Applies the
    mergeInto clauses of merge_into_iceberg to a collapsed batch."""
    for row in batch:
        key = (row["conv_id"], row["turn_idx"])
        if key in target:
            if row["lsn"] > target[key]["lsn"]:  # whenMatched(lsn>) updateAll
                target[key] = row
        else:  # whenNotMatched() insertAll
            target[key] = row
    return target


def _visible(target: dict) -> dict:
    return {k: v for k, v in target.items() if v["op"] != "D"}


def _row(conv, turn, lsn, op, text=""):
    return {"conv_id": conv, "turn_idx": turn, "lsn": lsn, "op": op, "text": text}


def test_stale_predelete_event_cannot_resurrect_deleted_key():
    """Insert(lsn=1) → delete(lsn=5) applied; then the lsn=1 insert is
    redelivered in a LATER batch (beyond the dedup watermark).  With
    tombstones persisted it matches the stored op='D' row and loses on
    lsn; the round-1 physical-delete formulation would have re-inserted
    it."""
    t = _simulate_merge({}, [_row("c1", 0, 1, "I", "hello")])
    t = _simulate_merge(t, [_row("c1", 0, 5, "D")])
    assert _visible(t) == {}
    t = _simulate_merge(t, [_row("c1", 0, 1, "I", "hello")])  # stale redelivery
    assert _visible(t) == {}, "tombstone must keep guarding the key"


def test_delete_arriving_before_insert_wins():
    """Out-of-order across batches: delete(lsn=5) lands first (parks a
    tombstone via whenNotMatched insertAll), then the older insert
    (lsn=1) arrives and must lose.  Round 1 dropped the early delete
    entirely."""
    t = _simulate_merge({}, [_row("c2", 3, 5, "D")])
    assert _visible(t) == {}
    t = _simulate_merge(t, [_row("c2", 3, 1, "I", "late insert")])
    assert _visible(t) == {}


def test_newer_insert_after_delete_recreates_key():
    t = _simulate_merge({}, [_row("c3", 1, 2, "I", "v1"), _row("c3", 1, 4, "D")])
    t = _simulate_merge(t, [_row("c3", 1, 9, "I", "v2")])
    vis = _visible(t)
    assert vis[("c3", 1)]["text"] == "v2"


def test_simulator_matches_snapshot_table_on_fixture(spark, tmp_path):
    """The same event sequence through the simulator and through
    SnapshotTable.merge_apply must agree on the visible state."""
    from schema_matching_spark.plans.table import SnapshotTable

    log = changes(spark, 600, n_conv=12, turns_per_conv=6, partitions=2)
    rows = [r.asDict() for r in log.collect()]
    sim = _simulate_merge({}, sorted(rows, key=lambda r: r["lsn"]))
    table = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=4)
    table.merge_apply(log, batch_id=0)
    actual = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in table.read().select("conv_id", "turn_idx", "text").collect()
    }
    expected = {k: v["text"] for k, v in _visible(sim).items()}
    assert actual == expected
