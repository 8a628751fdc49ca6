"""Conversation-progress tracker on the ``transformWithStateInPandas``
API (SURVEY.md §2.C names both stateful surfaces; round 1 exercised only
``applyInPandasWithState`` — this is the newer processor-object API with
first-class event-time timers and typed state handles).

Semantics: per ``conv_id``, maintain running counters (events, deletes,
max lsn, max event time) in a ``ValueState``; every input batch emits
the updated row with ``finalized=false``.  An **event-time timer** is
(re)registered at ``max_event_ts + session_gap`` on every batch; when
the watermark passes it, the conversation is emitted once more with
``finalized=true`` and its state + timer are cleared — the streaming
"conversation closed" signal, exactly the pattern a transcript pipeline
uses to hand a finished conversation to downstream training-data jobs.

Requires the RocksDB state store provider (transformWithState is built
on its column-family support); ``progress_tws`` sets it on the session.

Environment gate: the transformWithState Python driver worker speaks a
protobuf-based state protocol — ``google.protobuf`` is not installed in
this sandbox (and installs are off-limits), so ``progress_tws`` raises
``TwsUnavailableError`` with the actionable cause when the package is
missing.  The processor logic itself is pure pandas and is fully
exercised through a fake handle in tests/test_tws.py; on any cluster
with protobuf present the streaming path runs as-is (the gated
streaming test in test_tws.py activates automatically).

Scale posture: identical to streaming/stateful.py — state partitioned
by conv_id (the pipeline's shuffle key), Arrow batches across the
JVM↔Python boundary, no per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

TWS_OUTPUT_SCHEMA = (
    "conv_id string, n_events bigint, n_deletes bigint, "
    "max_lsn bigint, finalized boolean"
)
_STATE_SCHEMA = "n_events bigint, n_deletes bigint, max_lsn bigint, max_ts_ms bigint"

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class TwsUnavailableError(RuntimeError):
    pass


def tws_available() -> bool:
    """True iff the transformWithState Python runner can start here
    (its state-server protocol needs google.protobuf)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class ConversationProgressProcessor(StatefulProcessor):
    """Typed-state + event-time-timer port of streaming/stateful.py's
    tracker."""

    def __init__(self, session_gap_ms: int = 30_000):
        self._gap_ms = session_gap_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._state = handle.getValueState("progress", _STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if self._state.exists():
            n_events, n_deletes, max_lsn, max_ts_ms = self._state.get()
        else:
            n_events, n_deletes, max_lsn, max_ts_ms = 0, 0, -1, 0
        for pdf in rows:
            n_events += len(pdf)
            n_deletes += int((pdf["op"] == "D").sum())
            max_lsn = max(max_lsn, int(pdf["lsn"].max()))
            ts_max = pdf["ts"].max()
            if pd.notna(ts_max):
                max_ts_ms = max(max_ts_ms, int(ts_max.value // 1_000_000))
        self._state.update((n_events, n_deletes, max_lsn, max_ts_ms))
        # one live event-time timer per conversation: re-arm at the
        # newest event time + gap (delete the stale timer first — Spark
        # keeps every registered timestamp otherwise)
        for old in self._handle.listTimers():
            self._handle.deleteTimer(old)
        self._handle.registerTimer(max_ts_ms + self._gap_ms)
        yield pd.DataFrame(
            {
                "conv_id": [conv_id],
                "n_events": [n_events],
                "n_deletes": [n_deletes],
                "max_lsn": [max_lsn],
                "finalized": [False],
            }
        )

    def handleExpiredTimer(
        self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if not self._state.exists():
            return
        n_events, n_deletes, max_lsn, _max_ts_ms = self._state.get()
        self._state.clear()
        yield pd.DataFrame(
            {
                "conv_id": [conv_id],
                "n_events": [n_events],
                "n_deletes": [n_deletes],
                "max_lsn": [max_lsn],
                "finalized": [True],
            }
        )

    def close(self) -> None:
        pass


def progress_tws(
    stream: DataFrame,
    watermark: str = "10 seconds",
    session_gap_ms: int = 30_000,
) -> DataFrame:
    """Attach the processor to a streaming change DataFrame.  The
    watermark drives both late-event admission and timer expiry
    (timeMode=EventTime)."""
    if not tws_available():
        raise TwsUnavailableError(
            "transformWithStateInPandas needs the google.protobuf package "
            "for its state-server protocol and this environment does not "
            "ship it — install protobuf on the cluster, or use "
            "streaming.stateful.conversation_progress "
            "(applyInPandasWithState), which provides the same tracker"
        )
    spark = stream.sparkSession
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .transformWithStateInPandas(
            statefulProcessor=ConversationProgressProcessor(session_gap_ms),
            outputStructType=TWS_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="EventTime",
        )
    )
