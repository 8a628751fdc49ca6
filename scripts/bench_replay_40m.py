#!/usr/bin/env python
"""4x10^7-event replay leg (VERDICT r4 item 8) — the largest
weak-scaling datapoint toward the 10^10-event north metric.

Same protocol as bench.py's cdc_replay section (untimed warm-up,
untimed WAL materialization, probe-gated page re-warm, best-of-N timed
replays, final-state equality verify) at 4x the headline event count.
The r4 attempt died to a JVM GCLocker allocation failure in the
degraded host regime; run this ONLY inside a probe-healthy window
(first-touch >= 2 GB/s after prewarm — see CLAUDE.md).

Appends one line to BENCH/headline_runs.jsonl (run tag from --tag) and
prints it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=40_000_000)
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--tag", default="r5_40m")
    # default: scale the parallel-unit COUNT with the data so per-task
    # shuffle blocks stay headline-sized (10M leg = 128 buckets / 64
    # partitions; 0 = derive from --events)
    ap.add_argument("--buckets", type=int, default=0)
    ap.add_argument("--partitions", type=int, default=0)
    # shuffle width must also scale with input: the ledgered 10^8 legs
    # showed 64 partitions puts ~1.5M full-width rows in one task
    # (106.6 s) while 256 right-sizes it (46.7 s).  0 = cpus*2, the
    # right width for the 10M headline.
    ap.add_argument("--shuffle", type=int, default=0)
    args = ap.parse_args()
    # the ledgered r5_40m leg ran 256 buckets / 128 partitions at 4e7 —
    # keep that density (64 buckets + 32 partitions per 1e7 events)
    n_buckets = args.buckets or max(64 * args.events // 10_000_000, 128)
    partitions = args.partitions or max(32 * args.events // 10_000_000, 64)

    import bench
    from schema_matching_spark import REPLAY_ENGINE
    from schema_matching_spark.functions.hostprobe import host_probes
    from schema_matching_spark.session import get_spark

    pre = host_probes()
    print("pre-probes:", json.dumps(pre), flush=True)

    spark = get_spark(
        "bench40m",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.shuffle or int(args.cpus) * 2,
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.environ["SPARK_GRAFT_BENCH_REPS"] = str(args.reps)
    # 40M events need more buckets/partitions than the 10M headline so
    # per-task shuffle blocks stay the same size (weak-scaling shape:
    # grow the parallel unit count with the data, not the unit size)
    res = bench.bench_cdc(
        spark,
        args.events,
        n_buckets=n_buckets,
        partitions=partitions,
        reps=args.reps,
    )
    post = host_probes()
    entry = {
        "run": args.tag,
        "engine": REPLAY_ENGINE,
        "events": args.events,
        "shuffle_partitions": args.shuffle or int(args.cpus) * 2,
        "replay_reps_sec": res["replay_reps_sec"],
        "replay_sec": res["replay_sec"],
        "replay_ev_s": res["events_per_sec"],
        "verified": res["verified"],
        "regime": {
            "pre_first_touch_gbs": pre["first_touch_gbs"],
            "post_first_touch_gbs": post["first_touch_gbs"],
        },
        "rewarm_events": bench.REWARM_EVENTS,
    }
    with open(os.path.join(HERE, "BENCH", "headline_runs.jsonl"), "a") as f:
        f.write(json.dumps(entry) + "\n")
    print(json.dumps(entry), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
