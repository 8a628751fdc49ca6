"""File-based WAL/binlog segment source (SURVEY.md §2.B B1).

The sandbox has no Kafka jar, so the change stream is modeled the way
Debezium-style pipelines land in a lake anyway: LSN-ordered, append-only
parquet segment files in a directory.  Structured Streaming's file
source tails the directory with per-file offsets tracked in the
checkpoint, giving resumable, exactly-once-per-file semantics; combined
with the table's batch-id ledger the end-to-end pipe is exactly-once.

``write_segments`` materializes a generated log into N segment files so
tests can kill the stream between segments and resume (FIXTURES.md §2
"resume" variant).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..schemas import CHANGE_SCHEMA


def write_segments(log: DataFrame, wal_dir: str, n_segments: int) -> list[str]:
    """Split a bounded log into LSN-range segment files under wal_dir.

    Ranges are computed from lsn so the split is deterministic.  Returns
    the segment paths in LSN order.
    """
    os.makedirs(wal_dir, exist_ok=True)
    bounds = log.selectExpr("min(lsn) lo", "max(lsn) hi").collect()[0]
    lo, hi = bounds["lo"], bounds["hi"]
    span = (hi - lo + 1 + n_segments - 1) // n_segments
    paths = []
    for i in range(n_segments):
        seg_lo, seg_hi = lo + i * span, lo + (i + 1) * span
        seg = log.where((log.lsn >= seg_lo) & (log.lsn < seg_hi))
        path = os.path.join(wal_dir, f"segment-{i:06d}")
        seg.coalesce(1).write.parquet(path)
        paths.append(path)
    return paths


def read_stream(
    spark: SparkSession, wal_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Tail the WAL directory as an unbounded stream (B1)."""
    return (
        spark.readStream.schema(CHANGE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("recursiveFileLookup", "true")
        .parquet(wal_dir)
    )


def read_batch(spark: SparkSession, wal_dir: str) -> DataFrame:
    """Read the whole WAL as a bounded DataFrame (replay/verify path)."""
    return (
        spark.read.schema(CHANGE_SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(wal_dir)
    )
