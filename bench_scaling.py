#!/usr/bin/env python
"""Scaling-efficiency evidence (BASELINE.md sandbox proxy).

The north rule's two-cluster-size criterion (≥0.8 throughput scaling
efficiency from N to 4N executors) cannot use a real cluster in this
sandbox; per the driver instruction we evidence it by running the SAME
deterministic CDC replay at two parallelism levels — local[8] and
local[32] — in separate fresh JVMs, and reporting throughput at both
plus efficiency = (thr_32 / thr_8) / 4.

Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def run_one(cpus: int, events: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "bench.py"),
         "--cdc-only", "--cpus", str(cpus), "--events", str(events)],
        capture_output=True, text=True, timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    events = int(os.environ.get("SPARK_GRAFT_SCALE_EVENTS", "10000000"))
    r8 = run_one(8, events)
    r32 = run_one(32, events)
    thr8 = r8["cdc"]["events_per_sec"]
    thr32 = r32["cdc"]["events_per_sec"]
    eff = (thr32 / thr8) / 4.0
    result = {
        "metric": "cdc_replay_scaling_efficiency_local8_to_local32",
        "value": round(eff, 4),
        "unit": "ratio",
        "events": events,
        "thr_local8_events_per_sec": thr8,
        "thr_local32_events_per_sec": thr32,
        "verified_local8": r8["cdc"]["verified"],
        "verified_local32": r32["cdc"]["verified"],
    }
    os.makedirs(os.path.join(HERE, "BENCH"), exist_ok=True)
    with open(os.path.join(HERE, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            "# BENCH/BASELINE — measured scaling evidence\n\n"
            "North rule criterion: throughput scaling efficiency >= 0.8 from N\n"
            "to 4N executors at 10^10-event scale. Sandbox proxy (driver\n"
            "instruction): same deterministic input, local[8] vs local[32],\n"
            "each in a fresh JVM; efficiency = (thr_32 / thr_8) / 4.\n"
            "The 10^10 figure is the target cluster's scale; locally we replay\n"
            f"{events:,} events (>= 10^7 per SURVEY.md §7.1 step 8).\n\n"
            "| config | events | replay sec | events/sec | state verified |\n"
            "|---|---|---|---|---|\n"
            f"| local[8]  | {events:,} | {r8['cdc']['replay_sec']} | "
            f"{thr8:,.0f} | {r8['cdc']['verified']} |\n"
            f"| local[32] | {events:,} | {r32['cdc']['replay_sec']} | "
            f"{thr32:,.0f} | {r32['cdc']['verified']} |\n\n"
            f"**Scaling efficiency (8→32 threads): {eff:.3f}** "
            f"(target ≥ 0.8)\n\n"
            "Caveats: single-box threads share memory bandwidth, page cache\n"
            "and a single JVM heap per run — a conservative proxy for\n"
            "multi-executor scaling, where shuffle goes over the network but\n"
            "each executor owns its cores. The engine's scale posture\n"
            "(bucket-pruned merges, salted two-level collapse, map-side\n"
            "partial aggregation, broadcast-able change sets, AQE) is\n"
            "documented in SURVEY.md §4.2 and plans/table.py.\n"
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
