#!/usr/bin/env python
"""spark-submit entry point: tail a WAL as a Structured Streaming CDC
apply into a snapshot table — the continuous-ingest twin of
jobs/replay_job.py.

Usage (cluster)::

    scripts/package_pyfiles.sh
    spark-submit --py-files dist/schema_matching_spark.zip \\
        jobs/stream_job.py --wal /path/to/wal --table /path/to/table \\
        --checkpoint /path/to/ckpt \\
        [--source-format parquet|debezium] [--dlq-dir DIR] \\
        [--drift-ledger PATH] [--mode cow|mor] [--n-buckets 8192] \\
        [--maintenance-every N] [--continuous]

Defaults to a bounded availableNow catch-up (drain everything in the
WAL, then exit, printing one JSON line of counters) — the idempotent
shape a scheduler re-runs; pass ``--continuous`` for an unbounded
tail.  ``--dlq-dir`` (debezium format) quarantines malformed envelope
lines with the per-reason taxonomy in commit lineage;
``--drift-ledger`` additionally routes the missing_key slice through
the schema-evolution value matcher (operators/evolve.py) so upstream
column renames inside the envelope heal mid-stream with the decision
ledgered at PATH for deterministic replay.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--wal", required=True)
    ap.add_argument("--table", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--source-format", default="parquet",
                    choices=["parquet", "debezium"])
    ap.add_argument("--dlq-dir", default=None)
    ap.add_argument("--drift-ledger", default=None)
    ap.add_argument("--mode", default="cow", choices=["cow", "mor"])
    ap.add_argument("--n-buckets", type=int, default=32)
    ap.add_argument("--max-files-per-trigger", type=int, default=1)
    ap.add_argument("--maintenance-every", type=int, default=None)
    ap.add_argument("--continuous", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("transcript-cdc-stream").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from schema_matching_spark.plans.table import SnapshotTable
    from schema_matching_spark.streaming.pipeline import (
        drain_catchup,
        start_cdc_stream,
    )

    table = SnapshotTable(
        spark, args.table, n_buckets=args.n_buckets, mode=args.mode
    )
    aligner = None
    if args.drift_ledger:
        from schema_matching_spark.operators.evolve import EvolutionAligner

        aligner = EvolutionAligner(table, args.drift_ledger)

    def start():
        return start_cdc_stream(
            spark,
            args.wal,
            table,
            checkpoint_dir=args.checkpoint,
            max_files_per_trigger=args.max_files_per_trigger,
            available_now=not args.continuous,
            source_format=args.source_format,
            dlq_dir=args.dlq_dir,
            drift_aligner=aligner,
            maintenance_every=args.maintenance_every,
        )

    if args.continuous:
        start().awaitTermination()
        return

    drain_catchup(start)
    m = table.manifest()
    dlq: dict[str, int] = {}
    for entry in m.get("lineage", []):
        for k, v in entry.get("dlq_reasons", {}).items():
            dlq[k] = dlq.get(k, 0) + v
    print(json.dumps({
        "version": m["version"],
        "applied_batches": len(m.get("applied_batches", [])),
        "rows": table.read().count(),
        "dlq_reasons": dlq,
    }))


if __name__ == "__main__":
    main()
