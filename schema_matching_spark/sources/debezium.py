"""Debezium change-event envelope adapter (SURVEY.md §2.B B1 source
family; north rule "binlog/WAL tail").

Real CDC pipelines rarely hand Spark a clean typed change log: the
de-facto wire format is the Debezium envelope — one JSON document per
event with ``before``/``after`` row images, a ``source`` block carrying
the log position (LSN), and a one-letter ``op`` code::

    {"before": null,
     "after":  {"conv_id": "c7", "turn_idx": 3, "role": "user",
                "text": "...", "tool": null},
     "source": {"lsn": 12345, "ts_ms": 1700000000000},
     "op": "c",                 # c=create u=update d=delete r=snapshot-read
     "ts_ms": 1700000000001}

This module maps that envelope to the engine's canonical CHANGE_SCHEMA
entirely with JVM-side expressions (``from_json`` + ``coalesce`` —
no Python UDF in the parse path, per the input_hint's no-per-row-Python
rule):

* op codes  c/r -> I, u -> U, d -> D;
* key + payload come from ``after`` (from ``before`` for deletes —
  Debezium deletes carry the pre-image, matching the engine's
  delete-carries-payload changelog convention, plans/table.py
  ``changes_between(images=True)``);
* ``lsn`` comes from ``source.lsn`` (the total order the collapse
  relies on), event time from ``ts_ms``;
* Kafka-compaction tombstones (null/empty value after a delete) and
  unparseable lines are dropped, counted by the caller's Observation
  if needed.

``to_envelope`` is the exact inverse for the engine's own change rows;
``parse_envelope(to_envelope(log)) == log`` is pinned by
tests/test_debezium.py, which makes the adapter's field mapping a
round-trip invariant rather than a convention.

At 100 TB this path stays scan-shaped: JSON lines stream through
``from_json`` inside WholeStageCodegen, no shuffle is introduced before
the one collapse exchange, and the streaming reader keeps per-file
offsets in the checkpoint exactly like the parquet WAL tail.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from ..schemas import CHANGE_COLS, TRANSCRIPT_SCHEMA

#: Row image carried in before/after: the transcript payload minus the
#: event-time column (Debezium sources ship commit time in the
#: envelope, not inside the row image).
_IMAGE_FIELDS = [f for f in TRANSCRIPT_SCHEMA.fields if f.name != "ts"]
IMAGE_SCHEMA = StructType(_IMAGE_FIELDS)

ENVELOPE_SCHEMA = StructType(
    [
        StructField("before", IMAGE_SCHEMA, True),
        StructField("after", IMAGE_SCHEMA, True),
        StructField(
            "source",
            StructType(
                [
                    StructField("lsn", LongType(), True),
                    StructField("ts_ms", LongType(), True),
                    # Debezium's source block names the origin table —
                    # what the multi-table fan-out router keys on
                    # (streaming/router.py).  Optional: envelopes
                    # without it parse with table=NULL.
                    StructField("table", StringType(), True),
                ]
            ),
            True,
        ),
        StructField("op", StringType(), True),
        StructField("ts_ms", LongType(), True),
        # Debezium's optional per-event transaction block (emitted when
        # the connector runs with transaction metadata enabled): id ties
        # the event to its source transaction, total_order is the
        # event's 1-based index within it, event_count the transaction's
        # total size (Debezium publishes it on the END marker; connectors
        # that embed it per-event let a sink gate on completeness
        # without the metadata topic — streaming/txn.py consumes it).
        StructField(
            "transaction",
            StructType(
                [
                    StructField("id", StringType(), True),
                    StructField("total_order", LongType(), True),
                    StructField("event_count", LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

#: Debezium op byte -> engine op.  'r' (snapshot read) lands as an
#: insert: replaying a snapshot phase + log tail through latest-wins
#: is how Debezium bootstraps a table.
_OP_MAP = {"c": "I", "r": "I", "u": "U", "d": "D"}


def _op_col(env: Column) -> Column:
    out = F.lit(None).cast("string")
    for dbz, ours in _OP_MAP.items():
        out = F.when(env["op"] == dbz, F.lit(ours)).otherwise(out)
    return out


#: DLQ reason taxonomy, first match wins.  "tombstone" is expected
#: protocol noise (Kafka log-compaction markers), counted but not a
#: defect; everything else is a malformed event a real pipeline must
#: quarantine, not silently drop.
DLQ_REASONS = (
    "tombstone",
    "unparseable_json",
    "missing_op",
    "unknown_op",
    "missing_lsn",
    "missing_key",
)

#: ENVELOPE_SCHEMA plus a corrupt-record capture column: Spark's
#: PERMISSIVE from_json yields a struct of NULL fields (not a NULL
#: struct) for malformed JSON, so "didn't parse" is only detectable by
#: asking the parser to record it — columnNameOfCorruptRecord puts the
#: offending text in this field, and the taxonomy below keys on it.
_TAGGED_SCHEMA = StructType(
    ENVELOPE_SCHEMA.fields + [StructField("_corrupt", StringType(), True)]
)


def parse_envelope_tagged(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Envelope JSON strings -> CHANGE_SCHEMA columns plus a
    ``dlq_reason`` verdict and the original ``raw_value``.

    ``dlq_reason`` is NULL for a well-formed event and one of
    :data:`DLQ_REASONS` otherwise — the single parse both the happy
    path (:func:`parse_envelope` filters on it) and the dead-letter
    path (streaming/pipeline.py quarantines on it) share, so the two
    can never disagree about what "malformed" means.  Pure column
    expressions (one ``from_json`` inside WholeStageCodegen, no Python
    in the parse), batch and streaming alike.
    """
    env = F.from_json(
        F.col(value_col),
        _TAGGED_SCHEMA,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
    )
    image = F.when(env["op"] == "d", env["before"]).otherwise(env["after"])
    raw = F.col(value_col)
    reason = (
        F.when(raw.isNull() | (raw == ""), F.lit("tombstone"))
        .when(env.isNull() | env["_corrupt"].isNotNull(), F.lit("unparseable_json"))
        .when(env["op"].isNull(), F.lit("missing_op"))
        .when(_op_col(env).isNull(), F.lit("unknown_op"))
        .when(env["source"]["lsn"].isNull(), F.lit("missing_lsn"))
        .when(
            image["conv_id"].isNull() | image["turn_idx"].isNull(),
            F.lit("missing_key"),
        )
    )
    return df.select(
        env["source"]["lsn"].alias("lsn"),
        _op_col(env).alias("op"),
        F.timestamp_millis(
            F.coalesce(env["ts_ms"], env["source"]["ts_ms"])
        ).alias("ts"),
        image["conv_id"].alias("conv_id"),
        image["turn_idx"].alias("turn_idx"),
        image["role"].alias("role"),
        image["text"].alias("text"),
        image["tool"].alias("tool"),
        env["source"]["table"].alias("_table"),
        env["transaction"]["id"].alias("_txn_id"),
        env["transaction"]["event_count"].alias("_txn_count"),
        reason.alias("dlq_reason"),
        raw.alias("raw_value"),
    )


#: Loose envelope decode for drift recovery: row images as
#: map<string,string> so an upstream column RENAME (which the fixed
#: _TAGGED_SCHEMA turns into silent NULL fields -> missing_key DLQ)
#: stays addressable by its new name.
_LOOSE_SCHEMA = StructType(
    [
        StructField(
            "before", MapType(StringType(), StringType()), True
        ),
        StructField("after", MapType(StringType(), StringType()), True),
        StructField(
            "source",
            StructType(
                [
                    StructField("lsn", LongType(), True),
                    StructField("ts_ms", LongType(), True),
                    StructField("table", StringType(), True),
                ]
            ),
            True,
        ),
        StructField("op", StringType(), True),
        StructField("ts_ms", LongType(), True),
    ]
)


def recover_drifted(
    tagged: DataFrame, aligner
) -> tuple[DataFrame, DataFrame]:
    """Compose envelope drift with the B7 schema-evolution matcher
    (VERDICT r4 item 4; operators/evolve.EvolutionAligner).

    An upstream column rename INSIDE the envelope (``conv_id`` →
    ``conversation``) decodes to NULL key fields under the fixed
    :data:`_TAGGED_SCHEMA`, so the taxonomy lands it in ``missing_key``
    — indistinguishable from a genuinely keyless event.  This helper
    re-examines exactly that DLQ class: the raw line is re-decoded with
    row images as ``map<string,string>``, rows whose image actually
    carries data are pivoted to columns over the UNION of observed
    image keys (missing keys read as NULL) and routed through
    ``aligner`` (exact-name matches stick; the rest match by value
    distribution against the live table state, and the decision is
    ledgered for deterministic replay).  One union pivot — not one per
    key-set fingerprint — because JSON encoders omit null fields, so a
    single upstream schema splinters into 2^k key-sets and a
    per-key-set slice sees degenerate value distributions (a slice
    where ``tool`` is always present has ``speaker`` constantly
    ``'tool'``, which no distribution matcher should be asked to map).

    Returns ``(recovered, residual)``: recovered rows in canonical
    CHANGE_COLS ready for the merge path, and the residual tagged rows
    (image null/empty — genuinely keyless) that must stay quarantined.

    Scale shape: the loose re-decode touches ONLY the missing_key
    slice (one extra ``from_json`` over quarantine-bound rows, not the
    hot path); the key-set collect is bounded by distinct drifted
    schemas in the batch, not rows.
    """
    from ..operators.evolve import apply_mapping

    suspects = tagged.where(F.col("dlq_reason") == "missing_key")
    loose = F.from_json(F.col("raw_value"), _LOOSE_SCHEMA)
    img = F.when(loose["op"] == "d", loose["before"]).otherwise(
        loose["after"]
    )
    op = F.lit(None).cast("string")
    for dbz, ours in _OP_MAP.items():
        op = F.when(loose["op"] == dbz, F.lit(ours)).otherwise(op)
    cand = suspects.select(
        loose["source"]["lsn"].alias("lsn"),
        op.alias("op"),
        F.timestamp_millis(
            F.coalesce(loose["ts_ms"], loose["source"]["ts_ms"])
        ).alias("ts"),
        img.alias("_img"),
        "raw_value",
    )
    drifted = cand.where(
        F.col("_img").isNotNull() & (F.size("_img") > 0)
    )
    # union of observed image keys: schema metadata, not data — one
    # bounded collect per batch, never per-row work.  lsn/op/ts are
    # envelope-authoritative, so image keys shadowing them are skipped.
    keys = sorted(
        r["k"]
        for r in drifted.select(
            F.explode(F.map_keys("_img")).alias("k")
        )
        .distinct()
        .collect()
        if r["k"] not in ("lsn", "op", "ts", "raw_value")
    )
    if keys:
        part = drifted.select(
            "lsn",
            "op",
            "ts",
            *[F.col("_img").getItem(k).alias(k) for k in keys],
            "raw_value",
        )
        mapping = aligner.mapping_for(part.drop("raw_value"))
        recovered = apply_mapping(part, mapping, keep=("raw_value",))
    else:
        empty = tagged.select(*CHANGE_COLS, "raw_value").schema
        recovered = tagged.sparkSession.createDataFrame([], empty)
    # Alignment must not invent keys: rows whose decided mapping still
    # yields a NULL key (the image had data, none of it key-shaped)
    # return to the quarantine with everything else un-recovered —
    # never silently dropped, never merged.
    good = recovered.where(
        F.col("conv_id").isNotNull()
        & F.col("turn_idx").isNotNull()
        & F.col("lsn").isNotNull()
        & F.col("op").isNotNull()
    )
    residual = tagged.where(F.col("dlq_reason").isNotNull()).join(
        good.select("raw_value"), "raw_value", "left_anti"
    )
    return good.select(*CHANGE_COLS), residual


def parse_envelope(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Envelope JSON strings -> canonical CHANGE_SCHEMA rows.

    Works identically on batch and streaming DataFrames (pure column
    expressions).  Tombstones (null/blank value) and rows whose JSON
    does not parse (from_json -> null struct) are dropped; an unknown
    op code is also dropped rather than guessed.  Implemented as the
    filter view of :func:`parse_envelope_tagged` so the drop rule and
    the DLQ rule are one definition.
    """
    tagged = parse_envelope_tagged(df, value_col)
    return tagged.where(F.col("dlq_reason").isNull()).select(*CHANGE_COLS)


def to_envelope(
    log: DataFrame,
    table_col: str | None = None,
    txn_id_col: str | None = None,
    txn_count_col: str | None = None,
) -> DataFrame:
    """Engine change rows -> one-column ``value`` envelope JSON strings.

    The inverse of :func:`parse_envelope` (round-trip pinned by tests).
    Inserts/updates carry ``after`` only; deletes carry ``before`` only,
    as Debezium emits them.  ``table_col`` names a column to emit as
    ``source.table`` (multi-table WALs for the fan-out router); when
    None the source block stays the two-field shape.  ``txn_id_col`` /
    ``txn_count_col`` emit a per-event ``transaction`` block (id +
    event_count) for transaction-atomic sinks (streaming/txn.py).
    """
    image = F.struct(
        F.col("conv_id"),
        F.col("turn_idx"),
        F.col("role"),
        F.col("text"),
        F.col("tool"),
    )
    null_image = F.lit(None).cast(IMAGE_SCHEMA)
    # NTZ-tolerant: sources that store naive event time (parquet
    # TIMESTAMP_NTZ) cast epoch-preserving under the engine's pinned
    # UTC session zone (session.py).
    ts_ms = F.unix_millis(F.col("ts").cast("timestamp"))
    source_fields = [F.col("lsn").alias("lsn"), ts_ms.alias("ts_ms")]
    if table_col is not None:
        source_fields.append(F.col(table_col).alias("table"))
    envelope_fields = [
        F.when(F.col("op") == "D", image).otherwise(null_image).alias("before"),
        F.when(F.col("op") != "D", image).otherwise(null_image).alias("after"),
        F.struct(*source_fields).alias("source"),
        F.when(F.col("op") == "I", F.lit("c"))
        .when(F.col("op") == "U", F.lit("u"))
        .otherwise(F.lit("d"))
        .alias("op"),
        ts_ms.alias("ts_ms"),
    ]
    if txn_id_col is not None:
        txn_fields = [F.col(txn_id_col).cast("string").alias("id")]
        if txn_count_col is not None:
            txn_fields.append(
                F.col(txn_count_col).cast("long").alias("event_count")
            )
        envelope_fields.append(F.struct(*txn_fields).alias("transaction"))
    envelope = F.struct(*envelope_fields)
    return log.select(F.to_json(envelope).alias("value"))


def write_segments(
    log: DataFrame,
    wal_dir: str,
    n_segments: int,
    table_col: str | None = None,
    txn_id_col: str | None = None,
    txn_count_col: str | None = None,
) -> list[str]:
    """Materialize a bounded change log as LSN-ranged JSONL envelope
    segment directories (the Debezium-format twin of wal.write_segments).
    ``table_col`` emits per-event ``source.table`` for multi-table WALs;
    ``txn_id_col``/``txn_count_col`` emit the transaction block.  The
    LSN-ranged split deliberately ignores transaction boundaries —
    exactly like real WAL segment rotation, which is what makes the
    torn-transaction case streaming/txn.py handles reproducible here."""
    import os

    os.makedirs(wal_dir, exist_ok=True)
    bounds = log.selectExpr("min(lsn) lo", "max(lsn) hi").collect()[0]
    lo, hi = bounds["lo"], bounds["hi"]
    span = (hi - lo + 1 + n_segments - 1) // n_segments
    paths = []
    for i in range(n_segments):
        seg = log.where(
            (log.lsn >= lo + i * span) & (log.lsn < lo + (i + 1) * span)
        )
        path = os.path.join(wal_dir, f"segment-{i:06d}")
        to_envelope(
            seg,
            table_col=table_col,
            txn_id_col=txn_id_col,
            txn_count_col=txn_count_col,
        ).coalesce(1).write.text(path)
        paths.append(path)
    return paths


def read_raw_stream(
    spark: SparkSession, wal_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Tail envelope JSONL files as raw lines (one ``value`` column) —
    the shape the DLQ-enabled pipeline needs (it parses per micro-batch
    so malformed lines stay addressable for quarantine)."""
    return (
        spark.readStream.option("maxFilesPerTrigger", max_files_per_trigger)
        .option("recursiveFileLookup", "true")
        .text(wal_dir)
    )


def read_stream(
    spark: SparkSession, wal_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Tail a directory of envelope JSONL files as canonical change rows.

    Same per-file checkpointed offsets as the parquet WAL tail; the
    parse is fused into the scan stage (no extra exchange)."""
    return parse_envelope(read_raw_stream(spark, wal_dir, max_files_per_trigger))


def read_batch(spark: SparkSession, wal_dir: str) -> DataFrame:
    raw = spark.read.option("recursiveFileLookup", "true").text(wal_dir)
    return parse_envelope(raw)
