"""Custom Python DataSource (PySpark 4 `spark.dataSource.register`
API): the deterministic transcript change-log generator exposed as a
first-class readable format — batch AND micro-batch streaming — so a
bench or a soak test can `spark.read.format("transcript_changes")`
without materializing parquet first.

    spark.dataSource.register(TranscriptChangesDataSource)
    df = (spark.read.format("transcript_changes")
          .option("n_events", 100000).option("n_conv", 500).load())
    st = (spark.readStream.format("transcript_changes")
          .option("events_per_batch", 1000).load())

Row shape and op-mix follow the same contract as
sources/generator.py `changes()` (schema, ~70/25/5 I/U/D by
pmod(lsn,20), sawtooth event time, delete rows null out payload); key
derivation uses a Python-side deterministic hash, so the SOURCE is
deterministic and replayable but not byte-identical to the JVM
generator — the tests pin the properties that matter: batch/stream
reads of the same options yield identical rows, any lsn prefix is
reproducible, and a full CDC replay through SnapshotTable reproduces
the LWW oracle computed from the source itself.  The reader is
partition-parallel (each InputPartition owns an lsn range) and
stateless, exactly how a real CDC connector shards a log.

The streaming reader implements the offset contract
(initialOffset/latestOffset/partitions/commit): offsets are lsn
positions, each micro-batch covers [start, end) split into
``stream_partitions`` ranges, and `commit` is a no-op because the
source is deterministic and replayable from any offset — the same
property a WAL tail has, which is what makes checkpoint recovery work.
"""

from __future__ import annotations

import hashlib
from base64 import b64encode
from datetime import datetime, timedelta

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

_SCHEMA = (
    "lsn long, op string, ts timestamp_ntz, conv_id string, "
    "turn_idx int, role string, text string, tool string"
)
_BASE = datetime(2026, 1, 1)
_ROLES = ["user", "assistant", "tool", "system"]
_TOOLS = ["search", "python", "browser"]


def _xxh_like(*parts) -> int:
    """Deterministic 63-bit mix for key derivation.  NOT Spark's
    xxhash64 (that exact function isn't exposed to Python) — the
    generator contract only needs determinism + spread, and the tests
    pin this source against generator.py by comparing FULL ROWS after
    joining on lsn, not by matching the internal hash."""
    h = hashlib.sha1("|".join(str(p) for p in parts).encode()).digest()
    return int.from_bytes(h[:8], "big") & ((1 << 63) - 1)


def _row(lsn: int, n_conv: int, turns_per_conv: int) -> tuple:
    conv_nr = _xxh_like(lsn, "conv") % n_conv
    conv_id = f"conv-{conv_nr:08d}"
    turn_idx = _xxh_like(lsn, "turn") % turns_per_conv
    bucket = lsn % 20
    op = "I" if bucket < 14 else ("U" if bucket < 19 else "D")
    ts = _BASE + timedelta(seconds=lsn - (lsn % 7))
    if op == "D":
        return (lsn, op, ts, conv_id, turn_idx, None, None, None)
    role = _ROLES[lsn % 4]
    tool = _TOOLS[lsn % 3] if role == "tool" else None
    digest = hashlib.sha256(str(lsn).encode()).digest()
    body = b64encode(digest).decode() * ((lsn % 3) + 1)
    text = f"turn {turn_idx} of {conv_id} :: {body}"
    return (lsn, op, ts, conv_id, turn_idx, role, text, tool)


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _GenReader(DataSourceReader):
    def __init__(self, options):
        self.n_events = int(options.get("n_events", 10_000))
        self.n_conv = int(options.get("n_conv", 100))
        self.turns = int(options.get("turns_per_conv", 50))
        self.lsn_start = int(options.get("lsn_start", 0))
        self.n_partitions = int(options.get("partitions", 8))

    def partitions(self):
        lo, hi = self.lsn_start, self.lsn_start + self.n_events
        span = max(1, (hi - lo + self.n_partitions - 1) // self.n_partitions)
        return [
            _Range(s, min(s + span, hi)) for s in range(lo, hi, span)
        ]

    def read(self, partition: _Range):
        for lsn in range(partition.start, partition.end):
            yield _row(lsn, self.n_conv, self.turns)


class _GenStreamReader(DataSourceStreamReader):
    """lsn-offset micro-batch stream over the same rows."""

    def __init__(self, options):
        self.n_conv = int(options.get("n_conv", 100))
        self.turns = int(options.get("turns_per_conv", 50))
        self.per_batch = int(options.get("events_per_batch", 1_000))
        self.max_events = int(options.get("max_events", 10_000))
        self.n_partitions = int(options.get("stream_partitions", 4))
        self._pos = 0

    def initialOffset(self):
        return {"lsn": 0}

    def latestOffset(self):
        self._pos = min(self._pos + self.per_batch, self.max_events)
        return {"lsn": self._pos}

    def partitions(self, start, end):
        lo, hi = start["lsn"], end["lsn"]
        span = max(1, (hi - lo + self.n_partitions - 1) // self.n_partitions)
        return [_Range(s, min(s + span, hi)) for s in range(lo, hi, span)]

    def read(self, partition: _Range):
        for lsn in range(partition.start, partition.end):
            yield _row(lsn, self.n_conv, self.turns)

    def commit(self, end):
        pass  # deterministic + replayable from any offset: nothing to ack

    def stop(self):
        pass


class TranscriptChangesDataSource(DataSource):
    """format name: ``transcript_changes``."""

    @classmethod
    def name(cls):
        return "transcript_changes"

    def schema(self):
        return _SCHEMA

    def reader(self, schema):
        return _GenReader(self.options)

    def streamReader(self, schema):
        return _GenStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(TranscriptChangesDataSource)

