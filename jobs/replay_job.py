#!/usr/bin/env python
"""spark-submit entry point: replay a WAL into a snapshot table and
verify the final state (north rule: "run via spark-submit --py-files
on a multi-executor cluster").

Usage (cluster)::

    scripts/package_pyfiles.sh
    spark-submit --py-files dist/schema_matching_spark.zip \\
        jobs/replay_job.py --wal /path/to/wal --table /path/to/table \\
        [--mode cow|mor] [--n-buckets 8192] [--generate N]

No ``master`` is set here — spark-submit owns cluster topology.  Pass
``--generate N`` to synthesize a deterministic N-event WAL first (the
sandbox path; on a real deployment the WAL comes from the CDC source).
Prints one JSON line with replay seconds, events/sec and the
final-state equality verdict.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--wal", required=True)
    ap.add_argument("--table", required=True)
    ap.add_argument("--mode", default="cow", choices=["cow", "mor"])
    ap.add_argument("--n-buckets", type=int, default=32)
    ap.add_argument("--generate", type=int, default=0)
    ap.add_argument("--skip-verify", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("transcript-cdc-replay").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from schema_matching_spark.operators.apply import replay
    from schema_matching_spark.operators.verify import states_equal
    from schema_matching_spark.plans.table import SnapshotTable
    from schema_matching_spark.sources.generator import changes, expected_state
    from schema_matching_spark.sources.wal import read_batch

    if args.generate:
        changes(
            spark, args.generate, n_conv=max(args.generate // 200, 100),
            turns_per_conv=50,
        ).write.mode("overwrite").parquet(args.wal)

    log = read_batch(spark, args.wal)
    n = log.count()
    table = SnapshotTable(spark, args.table, n_buckets=args.n_buckets,
                          mode=args.mode)
    t0 = time.time()
    version = replay(table, log)
    replay_sec = time.time() - t0
    out = {
        "events": n,
        "version": version,
        "mode": table.mode,
        "replay_sec": round(replay_sec, 3),
        "events_per_sec": round(n / replay_sec, 1),
    }
    if not args.skip_verify:
        out["verified"] = bool(states_equal(table.read(), expected_state(log)))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
