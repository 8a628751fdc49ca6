"""Bucket evolution (SnapshotTable.rebucket): state preservation, spec
persistence, post-evolution merges/lookup/time-travel/changelog."""

import pytest
from pyspark.sql import functions as F

from schema_matching_spark.operators.apply import apply_batch
from schema_matching_spark.operators.verify import states_equal
from schema_matching_spark.plans.table import SnapshotTable
from schema_matching_spark.sources.generator import changes, expected_state


@pytest.mark.parametrize("mode,n_to", [("cow", 32), ("cow", 4), ("mor", 32)])
def test_rebucket_preserves_state(spark, tmp_path, mode, n_to):
    log = changes(spark, 5000, n_conv=40, turns_per_conv=12, partitions=4)
    table = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=8, mode=mode)
    apply_batch(table, log, "b1")
    before = table.read().collect()
    table.rebucket(n_to)
    assert states_equal(table.read(), expected_state(log))
    assert table.manifest()["n_buckets"] == n_to
    assert {f["bucket"] for f in table.manifest()["files"]} <= set(range(n_to))
    # reopening picks up the evolved spec from the manifest
    reopened = SnapshotTable(spark, str(tmp_path / "t"))
    assert reopened.n_buckets == n_to
    assert sorted(map(tuple, reopened.read().collect())) == sorted(
        map(tuple, before)
    )


def test_merge_lookup_timetravel_after_rebucket(spark, tmp_path):
    log1 = changes(spark, 4000, n_conv=30, turns_per_conv=10, partitions=4)
    log2 = changes(
        spark, 1500, n_conv=30, turns_per_conv=10, lsn_start=4000, partitions=4
    )
    table = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=8)
    apply_batch(table, log1, "b1")
    v1 = table.current_version()
    table.rebucket(32)
    v2 = table.current_version()
    apply_batch(table, log2, "b2")

    # merges after evolution land on the new spec and stay correct
    full = log1.unionByName(log2)
    assert states_equal(table.read(), expected_state(full))
    # time-travel lookup under the OLD spec still prunes correctly
    conv = table.read(v1).select("conv_id").orderBy("conv_id").first()["conv_id"]
    got = table.lookup(conv, version=v1).collect()
    exp = [
        r
        for r in expected_state(log1).collect()
        if r["conv_id"] == conv
    ]
    assert sorted((r["turn_idx"], r["text"]) for r in got) == sorted(
        (r["turn_idx"], r["text"]) for r in exp
    )
    # changelog across the spec boundary: the rebucket itself is a
    # no-op feed (nothing progressed), so v1 -> current equals the
    # net effect of log2 alone
    feed = table.changes_between(v1)
    rebucket_only = table.changes_between(v1, v2)
    assert rebucket_only.count() == 0
    assert feed.count() > 0
    assert feed.where(F.col("lsn") < 4000).count() == 0
