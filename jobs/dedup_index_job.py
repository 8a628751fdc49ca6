#!/usr/bin/env python
"""spark-submit entry point: one catch-up tick of the near-dup
signature-index hop (streaming/dedup_index.py).

Usage (cluster)::

    scripts/package_pyfiles.sh
    spark-submit --py-files dist/schema_matching_spark.zip \\
        jobs/dedup_index_job.py --bronze /path/to/bronze \\
        --index /path/to/index --checkpoint /path/to/cp \\
        [--n-buckets N] [--mode mor]

``--n-buckets`` defaults to 32 (single-box scale); size it to the
cluster for production — e.g. 1024 buckets for a corpus-scale index, so
bucket-local probes and compaction parallelize across executors.

Each run re-signs every document changed since the last checkpointed
offset (availableNow) and merges the signatures into the index table
exactly-once, then exits — schedule per orchestration tick.  A probe
service joins arriving documents against the maintained index with
``near_dup_candidates`` instead of re-running MinHash over the corpus.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bronze", required=True)
    ap.add_argument("--index", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--n-buckets", type=int, default=32)
    ap.add_argument("--mode", default="cow", choices=["cow", "mor"])
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("transcript-dedup-index").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from schema_matching_spark.plans.table import SnapshotTable
    from schema_matching_spark.streaming.dedup_index import (
        start_dedup_index_stream,
    )
    from schema_matching_spark.streaming.pipeline import drain_catchup

    index = SnapshotTable(
        spark, args.index, n_buckets=args.n_buckets, mode=args.mode
    )
    v0 = index.current_version()
    t0 = time.time()
    drain_catchup(
        lambda: start_dedup_index_stream(
            spark, args.bronze, index, args.checkpoint
        )
    )
    print(
        json.dumps(
            {
                "index_version_before": v0,
                "index_version_after": index.current_version(),
                "index_rows": index.read().count(),
                "tick_sec": round(time.time() - t0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
