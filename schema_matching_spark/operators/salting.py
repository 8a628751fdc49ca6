"""Hot-key salting (SURVEY.md §2.B B3).

One hot conversation can dominate a hash partition in the collapse /
merge shuffles (north rule: skew handled *explicitly*).  The fix is a
two-level aggregation: first aggregate on (key, salt) — spreading a hot
key over ``n_salts`` reducers — then re-aggregate the (tiny) per-salt
winners on the unsalted key.  For last-write-wins this decomposition is
exact because ``max_by(lsn)`` is associative/commutative.

The salt must be deterministic per *event* (not per key!) so identical
inputs shard identically at any parallelism: we salt by
``pmod(xxhash64(lsn), n_salts)``.

AQE skew-join splitting stays enabled as defense-in-depth for the join
stages (session.py), but the aggregation path is ours.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import KEY_COLS


def collapse_latest_salted(log: DataFrame, n_salts: int = 16) -> DataFrame:
    """Skew-proof B4: two-level latest-wins collapse.

    Level 1 shuffles on (conv_id, turn_idx, salt) — a hot conversation's
    events spread over ``n_salts`` partitions and are reduced there
    (map-side partial agg already shrinks each partition to ≤ one row
    per (key, salt)).  Level 2 reduces the ≤ ``n_salts`` survivors per
    key; its shuffle moves at most n_salts rows per key, so the hot key
    is defused.
    """
    payload = F.struct("op", "role", "text", "tool", "ts")
    level1 = (
        log.withColumn("_salt", F.pmod(F.xxhash64("lsn"), F.lit(n_salts)))
        .groupBy(*KEY_COLS, "_salt")
        .agg(F.max_by(payload, F.col("lsn")).alias("_w"), F.max("lsn").alias("lsn"))
    )
    return (
        level1.groupBy(*KEY_COLS)
        .agg(F.max_by(F.col("_w"), F.col("lsn")).alias("_w"), F.max("lsn").alias("lsn"))
        .select(
            *KEY_COLS,
            "lsn",
            F.col("_w.op").alias("op"),
            F.col("_w.role").alias("role"),
            F.col("_w.text").alias("text"),
            F.col("_w.tool").alias("tool"),
            F.col("_w.ts").alias("ts"),
        )
    )
