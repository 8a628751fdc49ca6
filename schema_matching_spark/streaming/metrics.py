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
