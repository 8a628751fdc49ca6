#!/usr/bin/env python
"""spark-submit entry point: one table-maintenance tick
(plans/table.py ``SnapshotTable.run_maintenance``).

Usage (cluster)::

    scripts/package_pyfiles.sh
    spark-submit --py-files dist/schema_matching_spark.zip \\
        jobs/maintenance_job.py --table /path/to/table \\
        [--max-compact-buckets 256] [--keep-snapshots 5] \\
        [--max-files-per-bucket 4] [--target-file-mb 128] \\
        [--tombstone-horizon-lsn N] [--plan-only]

The tick is the scheduler-friendly unit: plan from the manifest
(metadata-only), compact the worst ``--max-compact-buckets`` buckets,
expire snapshots beyond ``--keep-snapshots``.  Every step is idempotent
and snapshot-isolated, so the orchestrator fires it blindly on a timer
against a live ingest — a crashed tick leaves work for the next one,
never a broken table.  ``--max-compact-buckets`` is how a 100 TB table
rolls: e.g. 256 of 8192 buckets per tick keeps each maintenance job's
I/O bounded while the schedule covers the table.

``--plan-only`` prints the advisor output and exits without touching
the table (what a capacity dashboard polls).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True)
    ap.add_argument("--max-compact-buckets", type=int, default=None)
    ap.add_argument("--keep-snapshots", type=int, default=5)
    ap.add_argument("--max-files-per-bucket", type=int, default=4)
    ap.add_argument("--target-file-mb", type=int, default=128)
    ap.add_argument("--tombstone-horizon-lsn", type=int, default=None)
    ap.add_argument("--plan-only", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("transcript-cdc-maintenance").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from schema_matching_spark.plans.table import SnapshotTable

    table = SnapshotTable(spark, args.table)
    plan_kwargs = dict(
        target_file_bytes=args.target_file_mb << 20,
        max_files_per_bucket=args.max_files_per_bucket,
    )
    if args.plan_only:
        out = table.plan_maintenance(
            keep_snapshots=args.keep_snapshots, **plan_kwargs
        )
    else:
        out = table.run_maintenance(
            max_compact_buckets=args.max_compact_buckets,
            keep_snapshots=args.keep_snapshots,
            tombstone_horizon_lsn=args.tombstone_horizon_lsn,
            **plan_kwargs,
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
