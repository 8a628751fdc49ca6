#!/usr/bin/env python
"""spark-submit entry point: right-to-erasure tick (plans/table.py
``SnapshotTable.purge``).

Usage (cluster)::

    scripts/package_pyfiles.sh
    spark-submit --py-files dist/schema_matching_spark.zip \\
        jobs/purge_job.py --table /path/to/table \\
        --conv-ids conv-1,conv-2 --batch-id erasure-2026-08-18 \\
        [--conv-ids-parquet /path/to/requests.parquet] \\
        [--expire-keep 5]

``--batch-id`` is the idempotence token: re-running the same erasure
request is a no-op (the applied-batch ledger), so an orchestrator can
retry freely.  ``--conv-ids-parquet`` reads the victim list from a
parquet file with a ``conv_id`` column (the usual erasure-request queue
shape) instead of/in addition to the inline list.

The purge itself only rewrites the touched buckets; pass
``--expire-keep N`` to also run ``expire_snapshots(keep_n=N)`` in the
same tick, physically reclaiming superseded time-travel bytes — size N
to your deletion SLA (smaller N = faster physical erasure, shorter
time-travel window).  Downstream silver/gold/dedup-index hops pick the
deletions up from the change feed on their own next tick; no
purge-awareness is needed anywhere downstream (tests/test_purge.py).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True)
    ap.add_argument("--batch-id", required=True)
    ap.add_argument("--conv-ids", default=None,
                    help="comma-separated conversation ids to erase")
    ap.add_argument("--conv-ids-parquet", default=None,
                    help="parquet file with a conv_id column")
    ap.add_argument("--expire-keep", type=int, default=None,
                    help="also expire_snapshots(keep_n=N) after the purge")
    ap.add_argument("--n-buckets", type=int, default=32)
    ap.add_argument("--mode", default="cow", choices=["cow", "mor"])
    args = ap.parse_args()
    if not args.conv_ids and not args.conv_ids_parquet:
        ap.error("need --conv-ids and/or --conv-ids-parquet")

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("transcript-cdc-purge").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from schema_matching_spark.plans.table import SnapshotTable

    table = SnapshotTable(
        spark, args.table, n_buckets=args.n_buckets, mode=args.mode
    )
    victims = None
    if args.conv_ids_parquet:
        victims = spark.read.parquet(args.conv_ids_parquet).select("conv_id")
    if args.conv_ids:
        inline = spark.createDataFrame(
            [(c,) for c in args.conv_ids.split(",")], "conv_id string"
        )
        victims = inline if victims is None else victims.unionAll(inline)

    v0 = table.current_version()
    t0 = time.time()
    v1 = table.purge(victims, args.batch_id)
    out = {
        "version_before": v0,
        "version_after": v1,
        "was_replay": v1 == v0 and args.batch_id in table.applied_batches(),
        "purge_sec": round(time.time() - t0, 3),
    }
    if args.expire_keep is not None:
        out["gc"] = table.expire_snapshots(keep_n=args.expire_keep)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
