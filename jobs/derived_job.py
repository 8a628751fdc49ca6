#!/usr/bin/env python
"""spark-submit entry point: one catch-up tick of a bronze → silver
medallion hop (streaming/derived.py).

Usage (cluster)::

    scripts/package_pyfiles.sh
    spark-submit --py-files dist/schema_matching_spark.zip \\
        jobs/derived_job.py --bronze /path/to/bronze \\
        --silver /path/to/silver --checkpoint /path/to/cp \\
        [--roles user,assistant] [--n-buckets 1024] [--mode mor]

Each run processes every bronze snapshot span committed since the last
checkpointed offset (availableNow), merges the derived changes into the
silver table exactly-once, and exits — the shape an orchestrator
schedules per tick.  ``--roles`` keeps only those roles in the view
(changes leaving the predicate become silver deletes).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bronze", required=True)
    ap.add_argument("--silver", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--roles", default=None,
                    help="comma-separated role allowlist for the view")
    ap.add_argument("--n-buckets", type=int, default=32)
    ap.add_argument("--mode", default="cow", choices=["cow", "mor"])
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("transcript-cdc-derived").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from schema_matching_spark.plans.table import SnapshotTable
    from schema_matching_spark.streaming.derived import start_derived_stream

    silver = SnapshotTable(
        spark, args.silver, n_buckets=args.n_buckets, mode=args.mode
    )
    predicate = (
        F.col("role").isin(*args.roles.split(",")) if args.roles else None
    )
    v0 = silver.current_version()
    t0 = time.time()
    from schema_matching_spark.streaming.pipeline import drain_catchup

    drain_catchup(
        lambda: start_derived_stream(
            spark, args.bronze, silver, args.checkpoint, predicate=predicate
        )
    )
    print(
        json.dumps(
            {
                "silver_version_before": v0,
                "silver_version_after": silver.current_version(),
                "silver_rows": silver.read().count(),
                "tick_sec": round(time.time() - t0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
