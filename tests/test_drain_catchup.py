"""drain_catchup retry semantics (streaming/pipeline.py) — pure-Python
fakes, no SparkSession.  The helper is the engine's answer to
driver-side Python-worker spawn failures (JVM-hardcoded 10 s accept
window vs a demand-paging-stalled box): bounded catch-up runs restart
on the transient signature, which exactly-once sinks make invisible.
"""

import pytest

from schema_matching_spark.streaming.pipeline import (
    drain_catchup,
    is_transient_worker_error,
)


class FakeQuery:
    def __init__(self, fail_with=None, false_waits=0):
        self.fail_with = fail_with
        self.false_waits = false_waits
        self.wait_calls = 0
        self.stopped = False

    def awaitTermination(self, timeout=None):
        self.wait_calls += 1
        if self.fail_with is not None:
            raise self.fail_with
        if timeout is not None and self.false_waits > 0:
            self.false_waits -= 1
            return False
        return True

    def stop(self):
        self.stopped = True


TRANSIENT = RuntimeError(
    "Query terminated with exception: Python worker failed to connect back"
)


def test_transient_error_is_matched():
    assert is_transient_worker_error(TRANSIENT)
    assert is_transient_worker_error(
        RuntimeError("Timed out while waiting for the Python worker to connect back")
    )
    assert not is_transient_worker_error(RuntimeError("AnalysisException: boom"))


def test_retries_transient_then_succeeds():
    calls = []

    def start():
        q = FakeQuery(fail_with=TRANSIENT if len(calls) < 2 else None)
        calls.append(q)
        return q

    q = drain_catchup(start, attempts=4, backoff_sec=0)
    assert len(calls) == 3  # two failed spawns, one clean run
    assert q is calls[-1]


def test_non_transient_raises_immediately():
    calls = []

    def start():
        q = FakeQuery(fail_with=ValueError("real logic bug"))
        calls.append(q)
        return q

    with pytest.raises(ValueError):
        drain_catchup(start, attempts=4, backoff_sec=0)
    assert len(calls) == 1  # no retry on non-transient failures


def test_exhausted_attempts_raise():
    def start():
        return FakeQuery(fail_with=TRANSIENT)

    with pytest.raises(RuntimeError):
        drain_catchup(start, attempts=2, backoff_sec=0)


def test_slow_but_alive_query_gets_extended_wait():
    q = FakeQuery(false_waits=2)  # alive-and-slow for two windows
    out = drain_catchup(lambda: q, timeout=60)
    assert out is q
    assert q.wait_calls == 3  # extended past the first window, not killed


def test_hung_query_is_stopped_and_raises():
    """A query still active past 3x the deadline must NOT be returned
    as success: drain_catchup stops it and raises TimeoutError, so a
    hang can never read as a completed drain (ADVICE r3)."""
    q = FakeQuery(false_waits=10**12)  # effectively never terminates
    with pytest.raises(TimeoutError):
        drain_catchup(lambda: q, timeout=0.01)
    assert q.stopped


def test_spawn_failure_inside_start_fn_is_retried():
    calls = []

    def start():
        calls.append(1)
        if len(calls) == 1:
            raise TRANSIENT  # schema inference spawn, before .start()
        return FakeQuery()

    drain_catchup(start, attempts=3, backoff_sec=0)
    assert len(calls) == 2
