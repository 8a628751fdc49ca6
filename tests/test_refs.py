"""Branch/tag refs + write-audit-publish (SnapshotTable WAP workflow):
staged commits are invisible to main, publishing is an atomic
fast-forward, dropped branches are GC-able, tags pin snapshots
against retention.  SURVEY.md §2.B B13."""

import os

import pytest

from schema_matching_spark.operators.apply import apply_batch
from schema_matching_spark.operators.verify import states_equal
from schema_matching_spark.plans.table import SnapshotTable
from schema_matching_spark.sources.generator import changes, expected_state


def _logs(spark):
    log1 = changes(spark, 3000, n_conv=25, turns_per_conv=10, partitions=4)
    log2 = changes(
        spark, 1200, n_conv=25, turns_per_conv=10, lsn_start=3000, partitions=4
    )
    return log1, log2


def test_wap_stage_audit_publish(spark, tmp_path):
    log1, log2 = _logs(spark)
    main = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=8)
    apply_batch(main, log1, "b1")
    v_main = main.current_version()

    main.create_branch("audit")
    audit = main.branch("audit")
    apply_batch(audit, log2, "b2")

    # staged commit: visible on the branch, invisible on main
    assert states_equal(audit.read(), expected_state(log1.unionByName(log2)))
    assert states_equal(main.read(), expected_state(log1))
    assert main.current_version() == v_main

    # audit passed -> publish is one atomic pointer move
    published = main.fast_forward("audit")
    assert published == audit.current_version()
    assert states_equal(main.read(), expected_state(log1.unionByName(log2)))
    # the branch ledger came along: replaying b2 on main is a no-op
    assert apply_batch(main, log2, "b2") == published


def test_fast_forward_refuses_divergence(spark, tmp_path):
    log1, log2 = _logs(spark)
    main = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=8)
    apply_batch(main, log1, "b1")
    main.create_branch("side")
    side = main.branch("side")
    apply_batch(side, log2, "b2")
    # main moves past the branch point -> histories diverge
    apply_batch(main, log2, "b3")  # same data, different batch id
    with pytest.raises(ValueError, match="not a fast-forward"):
        main.fast_forward("side")
    # explicit rollback/replace is available
    main.fast_forward("side", force=True)
    assert main.current_version() == side.current_version()


def test_branch_commits_never_collide_with_main(spark, tmp_path):
    log1, log2 = _logs(spark)
    main = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=8)
    apply_batch(main, log1, "b1")
    main.create_branch("stage")
    stage = main.branch("stage")
    apply_batch(main, log2, "b-main")  # main advances first
    v_branch = apply_batch(stage, log2, "b-stage")  # then the branch commits
    # global manifest sequence: the branch got a fresh version number
    assert v_branch != main.current_version()
    assert states_equal(main.read(), expected_state(log1.unionByName(log2)))
    assert states_equal(stage.read(), expected_state(log1.unionByName(log2)))


def test_drop_branch_then_gc_reclaims_staged_files(spark, tmp_path):
    log1, log2 = _logs(spark)
    main = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=8)
    apply_batch(main, log1, "b1")
    main.create_branch("bad")
    bad = main.branch("bad")
    apply_batch(bad, log2, "b2")
    staged_files = [
        f["path"]
        for f in bad.manifest()["files"]
        if f["path"] not in {g["path"] for g in main.manifest()["files"]}
    ]
    assert staged_files
    # audit failed: drop the branch; expiry reclaims the staged commit
    main.drop_branch("bad")
    stats = main.expire_snapshots(keep_n=1)
    assert stats["manifests_deleted"] >= 1
    assert all(not os.path.exists(p) for p in staged_files)
    assert states_equal(main.read(), expected_state(log1))


def test_tag_pins_snapshot_against_expiry(spark, tmp_path):
    log1, log2 = _logs(spark)
    main = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=8)
    apply_batch(main, log1, "b1")
    main.create_tag("train-run-1")
    tagged_v = main.tag_version("train-run-1")
    apply_batch(main, log2, "b2")
    main.compact()
    main.expire_snapshots(keep_n=1)
    # the tagged manifest and its files survived retention
    assert states_equal(main.time_travel(tagged_v), expected_state(log1))
    with pytest.raises(ValueError):
        main.create_tag("train-run-1")  # tags are immutable


def test_wap_streaming_stage_then_publish(spark, tmp_path):
    """The full WAP loop on the streaming path: the CDC stream applies
    micro-batches into a BRANCH handle (start_cdc_stream takes any
    table handle — branch isolation is free), main's readers see
    nothing until the audited fast-forward."""
    from schema_matching_spark.sources.wal import write_segments
    from schema_matching_spark.streaming.pipeline import start_cdc_stream

    log1, log2 = _logs(spark)
    main = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=8, mode="mor")
    apply_batch(main, log1, "b0")
    v_before = main.current_version()

    main.create_branch("staging")
    staging = main.branch("staging")
    seg_dir = str(tmp_path / "wal")
    write_segments(log2, seg_dir, n_segments=3)
    q = start_cdc_stream(
        spark, seg_dir, staging,
        checkpoint_dir=str(tmp_path / "cp"), max_files_per_trigger=1,
    )
    q.awaitTermination(120)

    assert main.current_version() == v_before  # nothing published yet
    assert states_equal(main.read(), expected_state(log1))
    # audit the staged state, then publish
    assert states_equal(staging.read(), expected_state(log1.unionByName(log2)))
    main.fast_forward("staging")
    assert states_equal(main.read(), expected_state(log1.unionByName(log2)))


def test_rollback_to_ancestor(spark, tmp_path):
    log1, log2 = _logs(spark)
    main = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=8)
    apply_batch(main, log1, "b1")
    v1 = main.current_version()
    apply_batch(main, log2, "b2")
    main.rollback(v1)
    assert states_equal(main.read(), expected_state(log1))
    with pytest.raises(ValueError, match="not an ancestor"):
        main.rollback(v1 + 10)
    # post-rollback commits proceed cleanly (may reuse orphan numbers)
    apply_batch(main, log2, "b2-redo")
    assert states_equal(main.read(), expected_state(log1.unionByName(log2)))


def test_interleaved_branch_torture(spark, tmp_path):
    """Gnarly interleaving of commits, divergence, rollback, publish,
    and post-publish commits across two branches — pins the interaction
    of ancestry checks, global version allocation, and per-ref ledgers."""
    def batch(lo, hi):
        return changes(
            spark, hi - lo, n_conv=20, turns_per_conv=8,
            lsn_start=lo, partitions=2,
        )

    b1, b2, b3, b4 = batch(0, 800), batch(800, 1600), batch(1600, 2400), \
        batch(2400, 3200)
    main = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=8)
    apply_batch(main, b1, "b1")
    v1 = main.current_version()
    main.create_branch("x")
    x = main.branch("x")
    apply_batch(main, b2, "b2")          # main diverges
    apply_batch(x, b3, "b3")             # branch diverges too
    x.create_branch("x2")                # branch-of-branch (same head)
    x2 = main.branch("x2")

    assert states_equal(main.read(), expected_state(b1.unionByName(b2)))
    assert states_equal(x.read(), expected_state(b1.unionByName(b3)))
    with pytest.raises(ValueError, match="not a fast-forward"):
        main.fast_forward("x")           # diverged: refused
    main.rollback(v1)                    # undo b2
    assert states_equal(main.read(), expected_state(b1))
    main.fast_forward("x")               # now a true fast-forward
    assert states_equal(main.read(), expected_state(b1.unionByName(b3)))
    # replaying the branch's batch on published main is a ledger no-op
    assert apply_batch(main, b3, "b3") == main.current_version()

    apply_batch(main, b4, "b4")          # post-publish commit on main
    full = b1.unionByName(b3).unionByName(b4)
    assert states_equal(main.read(), expected_state(full))
    # the other refs were never moved
    assert states_equal(x.read(), expected_state(b1.unionByName(b3)))
    assert states_equal(x2.read(), expected_state(b1.unionByName(b3)))
    # retention keeps every ref head readable
    main.expire_snapshots(keep_n=1)
    assert states_equal(x2.read(), expected_state(b1.unionByName(b3)))
    assert states_equal(main.read(), expected_state(full))


def test_refs_view_and_missing_branch(spark, tmp_path):
    log1, _ = _logs(spark)
    main = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=8)
    apply_batch(main, log1, "b1")
    main.create_branch("dev")
    main.create_tag("v1")
    refs = {r["name"]: (r["kind"], r["version"]) for r in main.refs().collect()}
    assert refs["main"] == ("branch", main.current_version())
    assert refs["dev"] == ("branch", main.current_version())
    assert refs["v1"] == ("tag", main.current_version())
    with pytest.raises(ValueError, match="does not exist"):
        SnapshotTable(spark, str(tmp_path / "t"), ref="ghost")
    with pytest.raises(ValueError, match="already exists"):
        main.create_branch("dev")
