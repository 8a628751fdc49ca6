"""Custom stateful streaming operator (SURVEY.md §2.C "Stateful custom
ops"): a per-conversation progress tracker over the CDC stream, built on
``GroupedData.applyInPandasWithState`` (the Arrow-batched grouped-map
state API — per input_hint, no per-row Python).

Semantics: for each ``conv_id``, maintain running totals across
micro-batches — events seen, highest lsn, deletes seen, latest event
time — and emit the updated row whenever the conversation receives
events in a batch.  Idle conversations are evicted after
``idle_timeout_ms`` of processing time (bounded state, the same reason
B2's dedup state is watermarked: at 10^10 events unbounded per-key
state is a memory leak).

Scale posture: state lives in the state store partitioned by conv_id —
the same key the rest of the pipeline shuffles on; one Arrow batch per
(partition, trigger) group crosses the JVM↔Python boundary, never raw
per-row traffic.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PROGRESS_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("n_events", LongType(), False),
        StructField("n_deletes", LongType(), False),
        StructField("max_lsn", LongType(), False),
        StructField("n_turns_touched", IntegerType(), False),
        StructField("turns_saturated", BooleanType(), False),
        StructField("last_ts", TimestampType(), True),
    ]
)

#: state buffer: counters + a capped distinct-turn list.
#: ``n_turns_touched`` is EXACT while a conversation has fewer than
#: _MAX_TRACKED_TURNS distinct turns; beyond that the set stops growing
#: and the emitted ``turns_saturated`` flag flips true — the consumer
#: sees the switch from exact count to lower bound explicitly instead
#: of a silent undercount (ADVICE r1).  Transcript conversations sit
#: far below the cap (input_hint: turn_idx int32 per conv).
STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType(), False),
        StructField("n_deletes", LongType(), False),
        StructField("max_lsn", LongType(), False),
        StructField("turns_csv", StringType(), True),
        StructField("last_ts_us", LongType(), True),
    ]
)

_MAX_TRACKED_TURNS = 4096


def _make_tracker(idle_timeout_ms: int | None):
    def _track(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            n_events, n_deletes, max_lsn, turns_csv, last_ts_us = state.get
            turns = set(int(t) for t in turns_csv.split(",")) if turns_csv else set()
        else:
            n_events, n_deletes, max_lsn, turns, last_ts_us = 0, 0, -1, set(), None

        for pdf in pdfs:
            n_events += len(pdf)
            n_deletes += int((pdf["op"] == "D").sum())
            max_lsn = max(max_lsn, int(pdf["lsn"].max()))
            if len(turns) < _MAX_TRACKED_TURNS:
                turns.update(int(t) for t in pdf["turn_idx"].dropna().unique())
            ts_max = pdf["ts"].max()
            if pd.notna(ts_max):
                us = int(ts_max.value // 1000)
                last_ts_us = us if last_ts_us is None else max(last_ts_us, us)

        state.update((n_events, n_deletes, max_lsn,
                      ",".join(str(t) for t in sorted(turns)), last_ts_us))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "conv_id": [conv_id],
                "n_events": [n_events],
                "n_deletes": [n_deletes],
                "max_lsn": [max_lsn],
                "n_turns_touched": [len(turns)],
                "turns_saturated": [len(turns) >= _MAX_TRACKED_TURNS],
                "last_ts": [
                    pd.Timestamp(last_ts_us * 1000) if last_ts_us else pd.NaT
                ],
            }
        )

    return _track


def conversation_progress(
    stream: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Attach the stateful tracker to a (streaming) change DataFrame.

    ``idle_timeout_ms`` enables processing-time state eviction for
    continuously-tailing queries (bounded state at 10^10 events).
    Leave it ``None`` for bounded ``availableNow`` catch-up runs: with
    a processing-time timeout registered, Spark keeps scheduling
    no-data "state cleanup" micro-batches until every key times out,
    so an availableNow trigger that should drain and stop instead
    spins for the full idle window (observed: 50+ empty batches).
    """
    timeout = (
        GroupStateTimeout.NoTimeout
        if idle_timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return (
        stream.groupBy("conv_id")
        .applyInPandasWithState(
            _make_tracker(idle_timeout_ms),
            outputStructType=PROGRESS_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )
