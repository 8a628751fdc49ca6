#!/usr/bin/env python
"""Sustained chunked CDC ingest leg — the 10^9+-event weak-scaling
datapoint toward the 10^10 north metric.

Why chunked: a single-pass replay at 10^9 events needs the 66.5 GB WAL
(measured 66.5 B/event zstd parquet) AND its ~60 GB full-width collapse
shuffle resident at once — more than this box's 126 GB RAM, and the
r5_1g single-pass attempt died after writing 46 GB of shuffle
(BENCH/hunt_r5.jsonl).  A real pipeline never holds 10^10 events in
flight either: it TAILS the log.  This harness replays the log the way
production would — K lsn-range chunks applied through the engine's real
incremental path (``apply_batch`` → MOR ``merge_apply``), periodic
``compact()`` + ``expire_snapshots()`` maintenance (timed: it is part
of sustained ingest cost) — and verifies the final state against the
chunk-folded engine-independent oracle
(sources/generator.fold_winners; associativity pinned by
tests/test_fold_oracle.py), deleting each WAL chunk once folded so
peak storage stays bounded.

Timed: merge_apply + compaction/expiry.  Untimed: generation, oracle
folding, page re-warms, the final verify.  Sustained ev/s =
events / (apply_sec + maintenance_sec).

Appends one line to BENCH/headline_runs.jsonl and prints it last.
Full stderr goes to the terminal — run via the watcher with
HUNT_CMD pointing here and stderr teed to a file for post-mortems.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SHM = "/dev/shm"


def _shm_used_gb() -> float:
    st = os.statvfs(SHM)
    return round((st.f_blocks - st.f_bfree) * st.f_frsize / 2**30, 1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=1_000_000_000)
    ap.add_argument("--chunks", type=int, default=10)
    ap.add_argument("--cpus", default="32")
    # 256 buckets => ~26 MB zstd delta files per chunk at 1e8-event
    # chunks and ~70 MB base files at the 250M-key final table
    ap.add_argument("--buckets", type=int, default=256)
    ap.add_argument("--shuffle", type=int, default=256)
    ap.add_argument("--gen-partitions", type=int, default=1024)
    ap.add_argument("--compact-every", type=int, default=2)
    ap.add_argument(
        "--policy",
        choices=["every", "planner"],
        default="every",
        help="'every': full compact each --compact-every chunks; "
        "'planner': B25 run_maintenance tick each chunk — compacts at "
        "most --max-compact-buckets buckets whose delta depth exceeds "
        "--max-delta-files (bounded rolling maintenance)",
    )
    ap.add_argument("--max-compact-buckets", type=int, default=64)
    ap.add_argument("--max-delta-files", type=int, default=4)
    ap.add_argument("--tag", default="r5_1g_sustained")
    ap.add_argument("--keep-wal", action="store_true")
    # tmpfs is RAM: the first 1e9 attempt died to a kernel global OOM
    # with 106 GB on /dev/shm (two oracle-winners generations = 31 GB
    # of it) + the 16g pre-touched heap.  The fold/verify is UNTIMED,
    # so the oracle state can live on disk — only the WAL (timed scan)
    # and the table (timed merge) need tmpfs speed.
    ap.add_argument(
        "--oracle-dir",
        default=None,
        help="where the folded-oracle winners parquet lives (default: "
        "under the tmpfs scratch root; pass a disk path, e.g. "
        "/tmp/sustained_oracle, to keep ~2x winners size off RAM)",
    )
    # Both 1e9 one-pass attempts died to GCLocker allocation retries
    # (BENCH/hunt_r5.jsonl r5_1g_sustained fires 1-2): 32 zstd-JNI
    # critical sections starve a ~68 MB humongous allocation in the
    # default 8 GB heap while 66 GB of WAL sits on tmpfs.  Fix is
    # two-sided: a bigger pre-touched heap with more GCLocker retries,
    # and (default) per-chunk WAL generation so tmpfs never holds more
    # than one chunk — changes() is lsn-deterministic, so generating
    # chunk i with lsn_start=i*chunk_sz is bit-identical to slicing a
    # one-pass log (pinned by tests/test_fold_oracle.py).
    ap.add_argument("--driver-mem", default=os.environ.get("SPARK_DRIVER_MEM", "16g"))
    ap.add_argument(
        "--onepass-wal",
        action="store_true",
        help="materialize the full WAL up front (original protocol; "
        "needs events*66B of tmpfs headroom)",
    )
    args = ap.parse_args()

    os.environ["SPARK_DRIVER_MEM"] = args.driver_mem
    os.environ.setdefault(
        "SPARK_GRAFT_JAVA_OPTS",
        f"-Xms{args.driver_mem} -XX:+AlwaysPreTouch"
        " -XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=64",
    )

    import bench
    from schema_matching_spark import REPLAY_ENGINE
    from schema_matching_spark.functions.hostprobe import host_probes
    from schema_matching_spark.operators.apply import apply_batch
    from schema_matching_spark.operators.verify import content_hash
    from schema_matching_spark.plans.table import SnapshotTable
    from schema_matching_spark.session import get_spark
    from schema_matching_spark.sources.generator import (
        changes,
        fold_winners,
        winners_state,
    )
    from pyspark.sql import functions as F

    pre = host_probes()
    print("pre-probes:", json.dumps(pre), flush=True)

    root = os.path.join(SHM, f"sustained_{os.getpid()}")
    os.makedirs(root, exist_ok=True)
    oracle_root = args.oracle_dir or root
    os.makedirs(oracle_root, exist_ok=True)
    spark = get_spark(
        "bench_sustained",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.shuffle,
        extra_conf={
            # tmpfs shuffle + explicit per-chunk driver GC below so the
            # ContextCleaner drops finished chunks' shuffle files —
            # lingering shuffle on tmpfs is RAM
            "spark.local.dir": os.path.join(root, "spark_local"),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    chunk_sz = args.events // args.chunks
    wal_root = os.path.join(root, "wal")
    tbl_dir = os.path.join(root, "tbl")
    ledger: list[dict] = []
    try:
        # untimed warm-up: JIT the codegen'd merge stages on a throwaway
        warm = SnapshotTable(
            spark, os.path.join(root, "warm"), n_buckets=32, mode="mor"
        )
        apply_batch(
            warm,
            changes(spark, 200_000, n_conv=1000, turns_per_conv=50, partitions=32),
            "warm",
        )
        shutil.rmtree(os.path.join(root, "warm"), ignore_errors=True)

        n_conv = max(args.events // 200, 100)
        gen_sec = 0.0
        if args.onepass_wal:
            # one-pass WAL materialization, partitioned into lsn-range
            # chunk dirs (untimed — the metric starts at the parquet scan)
            t0 = time.time()
            changes(
                spark,
                args.events,
                n_conv=n_conv,
                turns_per_conv=50,
                partitions=args.gen_partitions,
            ).withColumn(
                "_chunk", (F.col("lsn") / F.lit(chunk_sz)).cast("int")
            ).write.partitionBy("_chunk").parquet(wal_root)
            gen_sec = time.time() - t0
            print(
                f"wal materialized: {gen_sec:.1f}s, shm used {_shm_used_gb()} GB",
                flush=True,
            )

        def _chunk_dir(i: int) -> str:
            return os.path.join(wal_root, f"_chunk={i}")

        def _materialize_chunk(i: int) -> float:
            """Per-chunk WAL gen (untimed): lsn-range slice, bit-identical
            to the one-pass log because every column derives from lsn."""
            if args.onepass_wal:
                return 0.0
            t0 = time.time()
            changes(
                spark,
                chunk_sz,
                n_conv=n_conv,
                turns_per_conv=50,
                lsn_start=i * chunk_sz,
                partitions=max(args.gen_partitions // args.chunks, 32),
            ).write.parquet(_chunk_dir(i))
            return time.time() - t0

        table = SnapshotTable(spark, tbl_dir, n_buckets=args.buckets, mode="mor")
        winners_cur: str | None = None
        apply_sec = 0.0
        maint_sec = 0.0
        for i in range(args.chunks):
            gen_sec += _materialize_chunk(i)
            bench.maybe_rewarm(f"sustained_chunk{i}")
            chunk_dir = _chunk_dir(i)
            chunk = spark.read.parquet(chunk_dir)

            t0 = time.time()
            apply_batch(table, chunk, f"chunk-{i}")
            dt_apply = time.time() - t0
            apply_sec += dt_apply

            dt_maint = 0.0
            gc_stats = None
            ticked: list[int] | None = None
            if args.policy == "planner":
                # B25 rolling tick: compact only buckets whose delta
                # depth crossed max_files_per_bucket, at most
                # --max-compact-buckets per tick — maintenance cost per
                # chunk is bounded by the tick, not by table size (the
                # r5 100M-leg lesson: counter-driven full compacts made
                # maintenance the majority cost and grew with the table)
                t0 = time.time()
                actions = table.run_maintenance(
                    max_compact_buckets=args.max_compact_buckets,
                    keep_snapshots=1,
                    max_files_per_bucket=args.max_delta_files,
                )
                dt_maint = time.time() - t0
                maint_sec += dt_maint
                gc_stats = actions.get("expired")
                ticked = actions.get("compacted_buckets", [])
            elif (i + 1) % args.compact_every == 0 or i == args.chunks - 1:
                t0 = time.time()
                table.compact()
                gc_stats = table.expire_snapshots(keep_n=1)
                dt_maint = time.time() - t0
                maint_sec += dt_maint

            # untimed: fold the engine-independent oracle, then drop the
            # consumed chunk so peak tmpfs stays bounded
            t0 = time.time()
            winners_next = os.path.join(oracle_root, f"winners_{i}")
            prev = (
                spark.read.parquet(winners_cur) if winners_cur is not None else None
            )
            fold_winners(prev, chunk).write.parquet(winners_next)
            if winners_cur is not None:
                shutil.rmtree(winners_cur, ignore_errors=True)
            winners_cur = winners_next
            if not args.keep_wal:
                shutil.rmtree(chunk_dir, ignore_errors=True)
            dt_fold = time.time() - t0
            # nudge the ContextCleaner: finished chunks' shuffle files
            # live on tmpfs until their dependencies are GC'd
            spark.sparkContext._jvm.System.gc()

            ev = {
                "chunk": i,
                "apply_sec": round(dt_apply, 2),
                "maint_sec": round(dt_maint, 2),
                "fold_sec": round(dt_fold, 2),
                "shm_gb": _shm_used_gb(),
            }
            if gc_stats:
                ev["expired_bytes_gb"] = round(
                    gc_stats["bytes_reclaimed"] / 2**30, 2
                )
            if ticked is not None:
                ev["ticked_buckets"] = len(ticked)
            ledger.append(ev)
            print("chunk:", json.dumps(ev), flush=True)

        # untimed final verify: engine state vs folded oracle
        t0 = time.time()
        expected = winners_state(spark.read.parquet(winners_cur))
        verified = content_hash(table.read()) == content_hash(expected)
        verify_sec = time.time() - t0

        total_sec = apply_sec + maint_sec
        post = host_probes()
        entry = {
            "run": args.tag,
            "engine": REPLAY_ENGINE,
            "protocol": "sustained_chunked_mor",
            "events": args.events,
            "chunks": args.chunks,
            "compact_every": args.compact_every,
            "maintenance_policy": args.policy,
            "n_buckets": args.buckets,
            "shuffle_partitions": args.shuffle,
            "apply_sec": round(apply_sec, 2),
            "maintenance_sec": round(maint_sec, 2),
            "sustained_sec": round(total_sec, 2),
            "sustained_ev_s": round(args.events / total_sec, 1),
            "apply_only_ev_s": round(args.events / apply_sec, 1),
            "verify_sec": round(verify_sec, 2),
            "verified": bool(verified),
            "wal_mode": "onepass" if args.onepass_wal else "per_chunk",
            "driver_mem": args.driver_mem,
            "gen_sec": round(gen_sec, 1),
            "chunk_ledger": ledger,
            "regime": {
                "pre_first_touch_gbs": pre["first_touch_gbs"],
                "post_first_touch_gbs": post["first_touch_gbs"],
            },
            "rewarm_events": bench.REWARM_EVENTS,
        }
        with open(os.path.join(HERE, "BENCH", "headline_runs.jsonl"), "a") as f:
            f.write(json.dumps(entry) + "\n")
        print(json.dumps(entry), flush=True)
    finally:
        spark.stop()
        shutil.rmtree(root, ignore_errors=True)
        if args.oracle_dir:
            shutil.rmtree(args.oracle_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
