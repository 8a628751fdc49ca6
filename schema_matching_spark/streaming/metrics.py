"""Streaming observability (SURVEY.md §2.B B8 counters).

``JsonProgressListener`` exports every micro-batch's progress — rows
per second, batch duration, stateful-operator memory, watermark — as
one JSON line per trigger to a local ledger file.  On a cluster the
same listener would push to the metrics system; the engine-side
contract is identical (Spark invokes listeners on the driver).

This complements the per-commit lineage the SnapshotTable manifest
already records (batch id → snapshot version, input rows, lsn range):
the manifest answers "what was applied", the progress ledger answers
"how fast and with how much state".
"""

from __future__ import annotations

import json
import os
import threading

from pyspark.sql.streaming import StreamingQueryListener


class JsonProgressListener(StreamingQueryListener):
    """Append-only JSON-lines ledger of streaming query progress."""

    def __init__(self, path: str):
        self.path = path
        self._lock = threading.Lock()
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def _write(self, obj: dict) -> None:
        with self._lock, open(self.path, "a") as f:
            f.write(json.dumps(obj) + "\n")

    def onQueryStarted(self, event) -> None:
        self._write({"event": "started", "id": str(event.id),
                     "runId": str(event.runId), "name": event.name})

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self._write(
            {
                "event": "progress",
                "id": str(p.id),
                "batchId": p.batchId,
                "numInputRows": p.numInputRows,
                "inputRowsPerSecond": p.inputRowsPerSecond,
                "processedRowsPerSecond": p.processedRowsPerSecond,
                "durationMs": dict(p.durationMs) if p.durationMs else {},
                "stateOperators": [
                    {
                        "numRowsTotal": so.numRowsTotal,
                        "numRowsUpdated": so.numRowsUpdated,
                        "memoryUsedBytes": so.memoryUsedBytes,
                    }
                    for so in (p.stateOperators or [])
                ],
                "watermark": (p.eventTime or {}).get("watermark"),
            }
        )

    def onQueryTerminated(self, event) -> None:
        self._write({"event": "terminated", "id": str(event.id),
                     "exception": event.exception})

    def onQueryIdle(self, event) -> None:  # pragma: no cover - timing
        pass


def freshness_lag(table) -> dict | None:
    """End-to-end freshness of a CDC-maintained table: how far behind
    the SOURCE the lake copy is, from the newest lineage entry carrying
    event-time observations (start_cdc_stream stamps ``event_ts_hi_ms``
    + ``commit_lag_sec`` per merge).  Returns::

        {"event_ts_hi_ms": ..,     # newest event time ever applied
         "commit_lag_sec": ..,     # lag AT that commit (wall - event)
         "staleness_sec": ..,      # lag NOW (wall now - event time)
         "version": ..}

    or None when no lineage entry carries event-time (tables fed by
    batch apply_batch only).  Metadata-only — one manifest read; the
    dashboard poll a 100 TB deployment alerts on."""
    import time as _time

    m = table.manifest()
    for entry in reversed(m.get("lineage", [])):
        if entry.get("event_ts_hi_ms") is not None:
            return {
                "event_ts_hi_ms": int(entry["event_ts_hi_ms"]),
                "commit_lag_sec": float(entry.get("commit_lag_sec", 0.0)),
                "staleness_sec": round(
                    max(0.0, _time.time() - entry["event_ts_hi_ms"] / 1000.0), 3
                ),
                "version": int(entry.get("version", m.get("version", 0))),
            }
    return None
