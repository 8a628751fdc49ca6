"""Binding data shapes (SURVEY.md §1.2, BASELINE.json input_hint).

The target table ``transcripts`` and the change-event (binlog/WAL
record) schema.  The reference engine is schema-free (everything is a
string until inferred — SURVEY.md §1.1); here the lake table is strongly
typed and the schema-free posture survives only inside the evolution
matcher, which treats incoming columns as value distributions.
"""

from __future__ import annotations

from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: Primary key of the target table.
KEY_COLS = ["conv_id", "turn_idx"]

#: Columns carried by a transcript row (payload = all minus key).
TRANSCRIPT_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
PAYLOAD_COLS = ["role", "text", "tool", "ts"]

TRANSCRIPT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), True),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), True),
    ]
)

#: Change event: op ∈ {'I','U','D'}; dedup key = (lsn, conv_id, turn_idx).
CHANGE_COLS = ["lsn", "op", "ts", "conv_id", "turn_idx", "role", "text", "tool"]

CHANGE_SCHEMA = StructType(
    [
        StructField("lsn", LongType(), False),
        StructField("op", StringType(), False),
        StructField("ts", TimestampType(), True),
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), True),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
    ]
)
