"""transformWithStateInPandas progress tracker (streaming/tws.py).

The Python runner for this API needs google.protobuf, which this
sandbox does not ship — so the coverage here is layered:

* the processor's semantics (cross-batch accumulation, timer re-arm,
  event-time finalization, state cleanup) run for real against a fake
  handle — the processor is pure pandas and doesn't know the difference;
* the environment gate is asserted actionable;
* the full streaming drive is written and auto-activates wherever
  protobuf exists (any real cluster).
"""

import os
import uuid

import pandas as pd
import pytest

from schema_matching_spark.streaming.tws import (
    ConversationProgressProcessor,
    TwsUnavailableError,
    progress_tws,
    tws_available,
)


class FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def clear(self):
        self._v = None


class FakeHandle:
    def __init__(self):
        self.state = FakeValueState()
        self.timers: list[int] = []

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.state

    def registerTimer(self, ts_ms):
        self.timers.append(ts_ms)

    def deleteTimer(self, ts_ms):
        self.timers.remove(ts_ms)

    def listTimers(self):
        return list(self.timers)


def _batch(rows):
    pdf = pd.DataFrame(rows, columns=["op", "lsn", "ts"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    return pdf


def test_processor_accumulates_across_batches_and_rearms_timer():
    proc = ConversationProgressProcessor(session_gap_ms=30_000)
    handle = FakeHandle()
    proc.init(handle)

    out1 = list(
        proc.handleInputRows(
            ("c1",),
            iter([_batch([("I", 1, "2026-01-01 00:00:00"),
                          ("U", 5, "2026-01-01 00:00:10")])]),
            None,
        )
    )
    r1 = out1[0].iloc[0]
    assert (r1["n_events"], r1["n_deletes"], r1["max_lsn"], r1["finalized"]) == (
        2, 0, 5, False,
    )
    # timer armed at max_ts + gap
    t0 = pd.Timestamp("2026-01-01 00:00:10").value // 1_000_000 + 30_000
    assert handle.timers == [t0]

    out2 = list(
        proc.handleInputRows(
            ("c1",),
            iter([_batch([("D", 9, "2026-01-01 00:01:00")])]),
            None,
        )
    )
    r2 = out2[0].iloc[0]
    assert (r2["n_events"], r2["n_deletes"], r2["max_lsn"]) == (3, 1, 9)
    # old timer deleted, new one armed — exactly one live timer
    t1 = pd.Timestamp("2026-01-01 00:01:00").value // 1_000_000 + 30_000
    assert handle.timers == [t1]


def test_processor_finalizes_and_clears_state_on_timer():
    proc = ConversationProgressProcessor(session_gap_ms=30_000)
    handle = FakeHandle()
    proc.init(handle)
    list(proc.handleInputRows(
        ("c9",), iter([_batch([("I", 3, "2026-01-01 00:00:00")])]), None,
    ))
    out = list(proc.handleExpiredTimer(("c9",), None, None))
    r = out[0].iloc[0]
    assert (r["conv_id"], r["n_events"], r["max_lsn"], r["finalized"]) == (
        "c9", 1, 3, True,
    )
    assert not handle.state.exists(), "state must be cleared on finalize"
    # a second expiry for the same key emits nothing (state gone)
    assert list(proc.handleExpiredTimer(("c9",), None, None)) == []


@pytest.mark.skipif(tws_available(), reason="protobuf present: gate inactive")
def test_gate_raises_actionable_error(spark):
    from schema_matching_spark.sources.generator import changes

    log = changes(spark, 10, n_conv=2, turns_per_conv=2, partitions=1)
    with pytest.raises(TwsUnavailableError, match="protobuf"):
        progress_tws(log)


def test_transform_with_state_api_present(spark):
    """The swap target exists in this PySpark build."""
    from schema_matching_spark.sources.generator import changes

    log = changes(spark, 10, n_conv=2, turns_per_conv=2, partitions=1)
    assert hasattr(log.groupBy("conv_id"), "transformWithStateInPandas")


@pytest.mark.skipif(not tws_available(), reason="google.protobuf not installed")
def test_tws_streaming_end_to_end(spark, tmp_path):
    """Full streaming drive — auto-activates where protobuf exists."""
    from pyspark.sql import functions as F

    from schema_matching_spark.sources.generator import changes
    from schema_matching_spark.sources.wal import read_stream, write_segments

    log = changes(spark, 600, n_conv=12, turns_per_conv=6, partitions=2).cache()
    truth = {
        r["conv_id"]: r
        for r in log.groupBy("conv_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum((F.col("op") == "D").cast("long")).alias("n_deletes"),
            F.max("lsn").alias("max_lsn"),
        )
        .collect()
    }
    wal, ckpt = str(tmp_path / "wal"), str(tmp_path / "ckpt")
    write_segments(log, wal, n_segments=3)

    def drain():
        sink = f"tws_sink_{uuid.uuid4().hex[:8]}"
        q = (
            progress_tws(read_stream(spark, wal, 1),
                         watermark="5 seconds", session_gap_ms=30_000)
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.table(sink).collect()

    rows = drain()
    live = {}
    for r in rows:
        if not r["finalized"]:
            if (r["conv_id"] not in live
                    or r["n_events"] > live[r["conv_id"]]["n_events"]):
                live[r["conv_id"]] = r
    assert set(live) == set(truth)
    for cid, r in live.items():
        t = truth[cid]
        assert (r["n_events"], r["n_deletes"], r["max_lsn"]) == (
            t["n_events"], t["n_deletes"], t["max_lsn"]), cid

    def sentinel(seg, lsn):
        spark.createDataFrame(
            [(lsn, "I", "sentinel", 0, "user", "s", None)],
            "lsn long, op string, conv_id string, turn_idx int, "
            "role string, text string, tool string",
        ).withColumn(
            "ts", F.to_timestamp(F.lit("2026-03-01 00:00:00"))
        ).select(
            "lsn", "op", "ts", "conv_id", "turn_idx", "role", "text", "tool"
        ).write.parquet(os.path.join(wal, f"seg_zz{seg}"))

    sentinel(1, 10_000)
    rows2 = drain()
    sentinel(2, 10_001)
    rows3 = drain()
    finalized = {r["conv_id"]: r for r in rows2 + rows3 if r["finalized"]}
    assert set(truth) - set(finalized) == set()
