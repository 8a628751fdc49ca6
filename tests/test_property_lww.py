"""Property-based LWW semantics (hypothesis): random small event logs —
arbitrary op mixes, duplicate (key, lsn) deliveries with and without
payload jitter, multi-batch splits — must always reduce to the pure
Python last-write-wins reference.  Complements the golden replay tests
with adversarial shapes no fixture author would write.

Spark jobs are slow per example, so the strategy space is kept small
(few keys/lsns force heavy collisions) and examples are capped; the
value is breadth of SHAPE, not volume.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from schema_matching_spark.plans.table import FILE_COLS, SnapshotTable

# few distinct values everywhere -> collisions on keys, lsns, and full
# (key, lsn) pairs are the norm, not the exception
_events = st.lists(
    st.tuples(
        st.integers(0, 3),      # conv
        st.integers(0, 2),      # turn
        st.integers(0, 6),      # lsn
        st.sampled_from(["I", "U", "D"]),
        st.integers(0, 2),      # payload variant (jitter on redelivery)
    ),
    min_size=1,
    max_size=25,
)


def _reference_state(events):
    """Pure-Python LWW: per key keep max lsn; among equal (key, lsn)
    any payload variant is a legal winner; op='D' winners hide the key."""
    best = {}
    for conv, turn, lsn, op, var in events:
        k = (conv, turn)
        if k not in best or lsn > best[k][0]:
            best[k] = (lsn, {(op, var)})
        elif lsn == best[k][0]:
            best[k][1].add((op, var))
    visible = {}
    for k, (lsn, variants) in best.items():
        ops = {op for op, _ in variants}
        visible[k] = (lsn, ops, variants)
    return visible


def _df(spark, events):
    rows = [
        (
            f"conv-{c}",
            t,
            lsn,
            op,
            None if op == "D" else f"payload-{c}-{t}-{lsn}-v{var}",
            None,
            None,
            None,
        )
        for (c, t, lsn, op, var) in events
    ]
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, lsn long, op string, "
        "text string, role string, tool string, ts timestamp_ntz",
    ).select(*FILE_COLS)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=_events, n_batches=st.integers(1, 3))
def test_replay_matches_python_lww_reference(spark, tmp_path_factory, events,
                                             n_batches):
    ref = _reference_state(events)
    root = str(tmp_path_factory.mktemp("prop"))
    table = SnapshotTable(spark, root, n_buckets=2)
    # split into batches by position (arbitrary boundaries — exactly-once
    # must not care how the log is chopped)
    size = (len(events) + n_batches - 1) // n_batches
    for i in range(n_batches):
        chunk = events[i * size:(i + 1) * size]
        if chunk:
            table.merge_apply(_df(spark, chunk), batch_id=i)
    got = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in table.read().select("conv_id", "turn_idx", "text").collect()
    }
    for (conv, turn), (lsn, ops, variants) in ref.items():
        key = (f"conv-{conv}", turn)
        if ops == {"D"}:
            assert key not in got, f"{key} should be deleted"
        elif "D" not in ops:
            assert key in got, f"{key} missing"
            legal = {
                f"payload-{conv}-{turn}-{lsn}-v{var}" for op, var in variants
            }
            assert got[key] in legal, f"{key}: {got[key]} not in {legal}"
        else:
            # tie between D and non-D at the same lsn: either outcome is
            # a legal single winner — but never a duplicate row
            pass
    # no key may ever appear twice
    all_rows = table.read().groupBy("conv_id", "turn_idx").count()
    assert all_rows.where(F.col("count") > 1).isEmpty()
