"""CDC-out connector (sources/table_changes.py): batch and streaming
reads of the table's own change feed, pinned against
SnapshotTable.changes_between and across checkpoint restarts."""

import pytest
from pyspark.sql import functions as F

from schema_matching_spark.operators.apply import apply_batch
from schema_matching_spark.plans.table import SnapshotTable
from schema_matching_spark.sources.generator import changes
from schema_matching_spark.sources.table_changes import TableChangesDataSource


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(TableChangesDataSource)
    return spark


def _feed_dict(rows):
    return {
        (r["conv_id"], r["turn_idx"]): (r["change_type"], r["lsn"])
        for r in rows
    }


def _build(spark, root, batches, mode="cow", n_buckets=8):
    table = SnapshotTable(spark, root, n_buckets=n_buckets, mode=mode)
    versions = [0]
    lsn = 0
    for i, n in enumerate(batches):
        log = changes(
            spark, n, n_conv=30, turns_per_conv=10, lsn_start=lsn, partitions=4
        )
        apply_batch(table, log, f"b{i}")
        versions.append(table.current_version())
        lsn += n
    return table, versions


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_batch_read_matches_changes_between(registered, tmp_path, mode):
    spark = registered
    table, vs = _build(spark, str(tmp_path / mode), [3000, 1000, 800], mode=mode)
    for v_from in (vs[1], vs[2]):
        src = (
            spark.read.format("table_changes")
            .option("path", table.root)
            .option("from_version", v_from)
            .load()
        )
        expected = _feed_dict(table.changes_between(v_from).collect())
        actual = _feed_dict(src.collect())
        assert actual == expected
        assert len(actual) > 0


def test_batch_read_from_genesis_is_all_inserts(registered, tmp_path):
    spark = registered
    table, _ = _build(spark, str(tmp_path / "g"), [2500])
    src = (
        spark.read.format("table_changes").option("path", table.root).load()
    )
    rows = src.collect()
    state = table.read().collect()
    assert len(rows) == len(state)
    assert {r["change_type"] for r in rows} == {"insert"}


def test_stream_drains_and_resumes_across_commits(registered, tmp_path):
    spark = registered
    root = str(tmp_path / "t")
    table, vs = _build(spark, root, [3000, 1000])
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        from schema_matching_spark.streaming.pipeline import drain_catchup

        drain_catchup(
            lambda: (
                spark.readStream.format("table_changes")
                .option("path", root)
                .load()
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
        )

    drain()
    first = _feed_dict(spark.read.parquet(out).collect())
    assert first == _feed_dict(table.changes_between(0, vs[2]).collect())

    # new commits arrive; a restarted stream picks up ONLY the delta
    log3 = changes(
        spark, 900, n_conv=30, turns_per_conv=10, lsn_start=4000, partitions=4
    )
    apply_batch(table, log3, "b2")
    drain()
    cumulative = spark.read.parquet(out)
    delta = _feed_dict(
        cumulative.where(F.col("lsn") >= 4000).collect()
    )
    expected_delta = _feed_dict(table.changes_between(vs[2]).collect())
    assert delta == expected_delta
    # nothing from the already-consumed span was re-emitted
    assert cumulative.count() == len(first) + len(
        _feed_dict(table.changes_between(vs[2]).collect())
    )


def test_stream_spans_rebucket_boundary(registered, tmp_path):
    spark = registered
    root = str(tmp_path / "t")
    table, vs = _build(spark, root, [2500])
    table.rebucket(16)
    log2 = changes(
        spark, 700, n_conv=30, turns_per_conv=10, lsn_start=2500, partitions=4
    )
    apply_batch(table, log2, "b1")
    src = (
        spark.read.format("table_changes")
        .option("path", root)
        .option("from_version", vs[1])
        .load()
    )
    assert _feed_dict(src.collect()) == _feed_dict(
        table.changes_between(vs[1]).collect()
    )


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_batch_images_match_changes_between_images(registered, tmp_path, mode):
    """images=true parity: full-row (payload-level) equality with
    changes_between(images=True) — unique-lsn logs, so even the
    tie-break paths agree."""
    spark = registered
    table, vs = _build(
        spark, str(tmp_path / f"img_{mode}"), [3000, 1200], mode=mode
    )
    src = (
        spark.read.format("table_changes")
        .option("path", table.root)
        .option("from_version", vs[1])
        .option("images", "true")
        .load()
    )
    key = lambda r: (r["change_type"], r["conv_id"], r["turn_idx"], r["role"],
                     r["text"], r["tool"], r["ts"], r["lsn"])
    expected = sorted(map(key, table.changes_between(vs[1], images=True).collect()))
    actual = sorted(map(key, src.collect()))
    assert actual == expected
    types = {r[0] for r in actual}
    assert {"update_preimage", "update_postimage", "delete"} <= types
