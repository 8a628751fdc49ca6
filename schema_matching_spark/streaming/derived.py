"""Derived-table maintenance: bronze → silver medallion pipeline.

The CDC-out connector (sources/table_changes.py) makes the snapshot
table a streaming source of its own change feed; this module closes the
loop by applying that feed into a DOWNSTREAM SnapshotTable, maintaining
a filtered/transformed VIEW of the upstream table incrementally —
the Delta/Iceberg "silver table" shape.  Each hop is exactly-once on
its own (source offsets = snapshot versions in the checkpoint; sink =
the applied-batch ledger), so the pipeline composes end-to-end without
a distributed transaction.

Incremental view maintenance for a filter+project view of a KEYED
table is exact with one rule: an upstream change whose row LEAVES the
view predicate (or is an upstream delete) becomes a DELETE downstream.
A tombstone is emitted even if the silver table never held the key —
cheap, and it guards the key against later out-of-order redelivery,
exactly like the upstream merge's own tombstones.

Invariant (pinned in tests/test_medallion.py):

    silver.read() == transform(bronze.read().where(predicate))

after every catch-up run, including resume-from-checkpoint and replays.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..plans.table import SnapshotTable
from ..schemas import TRANSCRIPT_COLS


def derived_events(
    feed: DataFrame,
    predicate: Column | None = None,
    transform=None,
) -> DataFrame:
    """Map a changelog feed (change_type, transcript cols, lsn) to the
    change events that maintain the derived view.

    ``predicate``: Column over the UPSTREAM row (evaluated before
    ``transform``) selecting which rows belong to the view.
    ``transform``: callable(DataFrame) -> DataFrame rewriting payload
    columns (role/text/tool); it must preserve conv_id, turn_idx, lsn,
    ts and the ``_op`` marker column."""
    leaves = F.col("change_type") == "delete"
    if predicate is not None:
        leaves = leaves | ~predicate
    op = F.when(leaves, F.lit("D")).otherwise(
        F.when(F.col("change_type") == "update", F.lit("U")).otherwise(F.lit("I"))
    )
    rows = feed.withColumn("_op", op)
    if transform is not None:
        rows = transform(rows)
    return rows.select(F.col("_op").alias("op"), "lsn", *TRANSCRIPT_COLS)


def start_derived_stream(
    spark: SparkSession,
    bronze_root: str,
    silver: SnapshotTable,
    checkpoint_dir: str,
    predicate: Column | None = None,
    transform=None,
    available_now: bool = True,
) -> StreamingQuery:
    """Tail ``bronze_root``'s change feed and maintain ``silver`` as the
    filtered/transformed view.  ``available_now=True`` is the bounded
    catch-up run (process every committed snapshot span, then stop) —
    schedule it per orchestration tick, or pass False to tail
    continuously."""
    from ..sources.table_changes import register

    register(spark)
    feed = (
        spark.readStream.format("table_changes")
        .option("path", bronze_root)
        .load()
    )

    def apply_fn(batch_df: DataFrame, batch_id: int) -> None:
        silver.merge_apply(
            derived_events(batch_df, predicate=predicate, transform=transform),
            batch_id,
        )

    writer = (
        feed.writeStream.foreachBatch(apply_fn)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
