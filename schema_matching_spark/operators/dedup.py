"""Delivery dedup (SURVEY.md §2.B B2) and batch latest-wins collapse (B4).

The CDC contract: at-least-once delivery from the WAL tail, so the same
(lsn, conv_id, turn_idx) event can arrive more than once.  Streaming
path uses the built-in watermarked stateful dedup; batch path uses a
plain ``dropDuplicates`` (whole input visible, no state needed).

Latest-wins collapse keeps only the final image per key within a batch.
It is a single ``max_by`` hash aggregation — one shuffle with map-side
partial aggregation — NOT a window function: a window would sort every
key group and materialize row_numbers, which at 10^10 events is a
needless per-partition sort.  ``max_by`` keeps whole-stage codegen and
partial-agg combining (SURVEY.md §4.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..schemas import KEY_COLS

DEDUP_KEYS = ["lsn", *KEY_COLS]


def dedup_batch(log: DataFrame) -> DataFrame:
    """Exact delivery-dedup for bounded (batch/replay) inputs."""
    return log.dropDuplicates(DEDUP_KEYS)


def dedup_stream(log: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Watermarked stateful delivery-dedup for unbounded inputs.

    State is bounded by the watermark: duplicates arriving within
    ``watermark`` of the max seen event time are dropped; state for
    older keys is evicted.  Duplicates straggling in *beyond* the
    watermark are still harmless downstream: the table stores each
    key's applied lsn and MERGE is last-write-wins by lsn, so
    re-applying a stale lsn — in any later batch — is a per-key no-op
    (plans/table.merge_apply).
    """
    return log.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        DEDUP_KEYS
    )


# NOTE: the latest-wins collapse (B4) lives in operators/salting.py
# (collapse_latest_salted) and plans/table.py (lww_reduce) — the
# payload-free HashAggregate + join-back formulation.  A naive
# max_by(struct) version was removed: it plans as ObjectHashAggregate
# and sort-falls-back past 128 groups per partition (SURVEY.md §8.1).
