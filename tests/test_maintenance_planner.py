"""Metadata-only maintenance advisor + rolling tick
(plans/table.py plan_maintenance / run_maintenance)."""

import pytest
from pyspark.sql import functions as F

from schema_matching_spark.operators.apply import apply_batch
from schema_matching_spark.operators.verify import content_hash
from schema_matching_spark.plans.table import SnapshotTable
from schema_matching_spark.sources.generator import changes


def _bucket_counts(table):
    counts: dict = {}
    for f in table.manifest()["files"]:
        counts[f["bucket"]] = counts.get(f["bucket"], 0) + 1
    return counts


@pytest.fixture()
def deep_table(spark, tmp_path):
    """MOR table after 6 micro-batches: every bucket carries delta
    depth (> 4 files)."""
    table = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=4, mode="mor")
    for i in range(6):
        apply_batch(
            table,
            changes(
                spark, 500, n_conv=40, turns_per_conv=10,
                lsn_start=i * 500, partitions=2,
            ),
            batch_id=i,
        )
    return table


def test_plan_flags_delta_depth_worst_first(spark, deep_table):
    plan = deep_table.plan_maintenance(max_files_per_bucket=4)
    counts = _bucket_counts(deep_table)
    assert plan["compact_buckets"], counts
    assert set(plan["compact_buckets"]) == {
        b for b, n in counts.items() if n > 4
    }
    flagged = [counts[b] for b in plan["compact_buckets"]]
    assert flagged == sorted(flagged, reverse=True)  # worst first
    assert plan["totals"]["files"] == sum(counts.values())
    assert plan["totals"]["rows"] == sum(
        f["rows"] for f in deep_table.manifest()["files"]
    )
    assert plan["totals"]["bytes"] > 0


def test_rolling_tick_is_bounded_and_state_preserving(spark, deep_table):
    before = content_hash(deep_table.read())
    plan = deep_table.plan_maintenance(max_files_per_bucket=4)
    actions = deep_table.run_maintenance(
        max_compact_buckets=2, keep_snapshots=3, max_files_per_bucket=4
    )
    assert actions["compacted_buckets"] == plan["compact_buckets"][:2]
    counts = _bucket_counts(deep_table)
    for b in actions["compacted_buckets"]:
        assert counts[b] == 1  # folded to one file
    assert content_hash(deep_table.read()) == before

    # keep ticking: the schedule converges to a clean table
    for _ in range(4):
        deep_table.run_maintenance(
            max_compact_buckets=2, keep_snapshots=3, max_files_per_bucket=4
        )
    assert (
        deep_table.plan_maintenance(max_files_per_bucket=4)["compact_buckets"]
        == []
    )
    assert content_hash(deep_table.read()) == before


def test_expire_candidates_counts_manifests_beyond_keep(spark, deep_table):
    import os

    n = len(
        [
            fn
            for fn in os.listdir(os.path.join(deep_table.root, "snapshots"))
            if fn.endswith(".json")
        ]
    )
    plan = deep_table.plan_maintenance(keep_snapshots=3)
    assert plan["expire_candidates"] == max(0, n - 3)
    deep_table.run_maintenance(max_compact_buckets=0, keep_snapshots=3)
    assert deep_table.plan_maintenance(keep_snapshots=3)["expire_candidates"] <= 1


def test_rebucket_suggestions(spark, tmp_path):
    grow = SnapshotTable(spark, str(tmp_path / "g"), n_buckets=4)
    apply_batch(grow, changes(spark, 2000, n_conv=50, partitions=2), 0)
    # tiny target: every bucket is "too big" -> power-of-two grow hint
    plan = grow.plan_maintenance(target_file_bytes=1024)
    assert plan["rebucket_to"] is not None
    assert plan["rebucket_to"] & (plan["rebucket_to"] - 1) == 0
    assert plan["rebucket_to"] > 4

    shrink = SnapshotTable(spark, str(tmp_path / "s"), n_buckets=16)
    apply_batch(shrink, changes(spark, 500, n_conv=20, partitions=2), 0)
    # huge target: buckets are dust -> halve, floor 8
    plan = shrink.plan_maintenance(target_file_bytes=1 << 40)
    assert plan["rebucket_to"] == 8

    # healthy sizing: no suggestion
    sized = grow.plan_maintenance(target_file_bytes=max(
        1, grow.plan_maintenance()["totals"]["bytes"] // 4
    ))
    assert sized["rebucket_to"] is None
