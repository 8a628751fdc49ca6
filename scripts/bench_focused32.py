#!/usr/bin/env python
"""Focused local[32]-only replay leg for the cross-run debiased
scaling block (BENCH/BASELINE.md).

Why this exists: bench_scaling.py runs the local[8] leg FIRST, so by
the time the local[32] leg starts, the hypervisor has usually
re-reclaimed the page pool (r4/r5 captures show prewarm throughput
collapsing 1.7 -> 0.5 GB/s between sections) and the 32-leg — which
faults fresh pages 4x as fast — eats the worst of the wall.  This
script spends a probe-healthy window ENTIRELY on the 32-leg: prewarm,
one untimed warm-up replay, then reps with a re-warm before each.

Appends a 32-only entry to BENCH/runs.jsonl; _debiased() in
bench_scaling.py already tolerates partial entries (min per config
across all runs), so the next full bench_scaling.py run folds the leg
into the headline block.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

EVENTS = int(os.environ.get("SPARK_GRAFT_SCALE_EVENTS", "10000000"))
REPS = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "3"))
# Focused legs default to the 32-thread config, but the honest
# min-per-config estimator needs BOTH configs sampled in healthy
# windows — otherwise the 8-leg minimum comes only from full
# bench_scaling runs (whose window is usually cooling by the time
# any leg finishes) and the ratio is biased UP.
THREADS = int(os.environ.get("SPARK_GRAFT_SCALE_THREADS", "32"))
# Shuffle partitions must scale with input (64 is right for the 10M
# headline; a 10^8 leg at 64 puts ~1.5M full-width rows in one task).
SHUFFLE = int(os.environ.get("SPARK_GRAFT_SCALE_SHUFFLE", "64"))


def main() -> None:
    from schema_matching_spark.functions.hostprobe import (
        first_touch_gbs,
        prewarm_pages,
    )
    from schema_matching_spark.operators.apply import replay
    from schema_matching_spark.plans.table import SnapshotTable
    from schema_matching_spark.session import get_spark
    from schema_matching_spark.sources.generator import changes

    rewarms: list[dict] = []

    def rewarm(tag: str, gib: float) -> None:
        ft = first_touch_gbs(mib=128, budget_sec=1.0)
        ev: dict = {"tag": tag, "first_touch_gbs": round(ft, 2)}
        if ft < 2.0:
            ev["prewarm"] = prewarm_pages(gib=gib, budget_sec=120.0)
        rewarms.append(ev)
        print(f"[rewarm {tag}] {json.dumps(ev)}", file=sys.stderr, flush=True)

    rewarm("session_start", 16.0)

    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    scratch = tempfile.mkdtemp(prefix="focused32_", dir=base)
    try:
        spark = get_spark(
            "focused32", master=f"local[{THREADS}]", shuffle_partitions=SHUFFLE,
            extra_conf={"spark.local.dir": os.path.join(scratch, "slocal")},
        )
        spark.sparkContext.setLogLevel("ERROR")
        # The WAL is deterministic generator output, so it can persist
        # ACROSS invocations (SPARK_GRAFT_WAL_KEEP=/dev/shm/...): the
        # build otherwise burns the freshest slice of a healthy window
        # before the first timed rep, and its page-cache stays warm for
        # later attempts.  The build is not part of the measured replay.
        keep = os.environ.get("SPARK_GRAFT_WAL_KEEP")
        wal = keep or os.path.join(scratch, "wal")
        if not (keep and os.path.exists(os.path.join(wal, "_SUCCESS"))):
            changes(
                spark, EVENTS, n_conv=max(EVENTS // 200, 100),
                turns_per_conv=50, partitions=64,
            ).write.mode("overwrite").parquet(wal)
        log = spark.read.parquet(wal)
        # Warm-up replay sized to JIT-compile every codegen stage of the
        # REAL job shape (rep0 historically pays 3-4 s of warm-up that
        # a 200k run doesn't trigger); untimed, so larger is free.
        warm_events = int(os.environ.get("SPARK_GRAFT_WARM_EVENTS", "2000000"))
        warm = SnapshotTable(
            spark, os.path.join(scratch, "warm"), n_buckets=128
        )
        replay(warm, changes(
            spark, warm_events, n_conv=max(warm_events // 200, 100),
            turns_per_conv=50, partitions=64,
        ))
        times = []
        for rep in range(REPS):
            rewarm(f"rep{rep}", 16.0)
            tdir = os.path.join(scratch, f"tbl{rep}")
            tbl = SnapshotTable(spark, tdir, n_buckets=128)
            t0 = time.time()
            replay(tbl, log)
            times.append(time.time() - t0)
            shutil.rmtree(tdir, ignore_errors=True)
            print(
                f"[rep{rep}] {times[-1]:.2f}s = "
                f"{EVENTS / times[-1]:,.0f} ev/s",
                file=sys.stderr, flush=True,
            )
        spark.stop()
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

    from schema_matching_spark import REPLAY_ENGINE

    entry = {
        "wall_ts": time.time(),
        "engine": REPLAY_ENGINE,
        "events": EVENTS,
        "replay_sec": {str(THREADS): round(min(times), 3)},
        "replay_reps_sec": [round(t, 3) for t in times],
        "note": f"focused {THREADS}-thread leg (whole healthy window on one config)",
        "rewarm_events": rewarms,
    }
    with open(os.path.join(HERE, "BENCH", "runs.jsonl"), "a") as f:
        f.write(json.dumps(entry) + "\n")
    print(json.dumps(entry), flush=True)


if __name__ == "__main__":
    main()
