#!/usr/bin/env python
"""spark-submit entry point: snapshot export / restore
(plans/table.py export_snapshot + bootstrap_from_export).

Usage (cluster)::

    scripts/package_pyfiles.sh
    # export the current (or a time-travel) snapshot as a bootstrap package
    spark-submit --py-files dist/schema_matching_spark.zip \\
        jobs/export_job.py export --table /path/to/table \\
        --out /path/to/package [--version N] [--as-of-ts EPOCH_SECONDS]

    # seed a NEW table from a package (then tail the WAL from <= fence)
    spark-submit --py-files dist/schema_matching_spark.zip \\
        jobs/export_job.py restore --table /path/to/new_table \\
        --package /path/to/package [--n-buckets 32] [--mode cow|mor] \\
        [--batch-id bootstrap]

The export is one bucketed read + parquet write of TABLE size; the
restore is a ledgered bootstrap_load (idempotent by --batch-id), after
which `jobs/` CDC streams pointed at the original WAL converge to the
source table's state — DR, region replication, dev seeding.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    ex = sub.add_parser("export")
    ex.add_argument("--table", required=True)
    ex.add_argument("--out", required=True)
    ex.add_argument("--version", type=int, default=None)
    ex.add_argument("--as-of-ts", type=float, default=None)
    rs = sub.add_parser("restore")
    rs.add_argument("--table", required=True)
    rs.add_argument("--package", required=True)
    rs.add_argument("--n-buckets", type=int, default=32)
    rs.add_argument("--mode", choices=["cow", "mor"], default="cow")
    rs.add_argument("--batch-id", default="bootstrap")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("transcript-cdc-export").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from schema_matching_spark.plans.table import SnapshotTable

    if args.cmd == "export":
        table = SnapshotTable(spark, args.table)
        version = args.version
        if args.as_of_ts is not None:
            version = table.version_as_of(args.as_of_ts)
        out = table.export_snapshot(args.out, version=version)
    else:
        table = SnapshotTable(
            spark, args.table, n_buckets=args.n_buckets, mode=args.mode
        )
        out = {
            "version": table.bootstrap_from_export(
                args.package, batch_id=args.batch_id
            ),
            "fence_lsn": table.manifest()["fence_lsn"],
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
