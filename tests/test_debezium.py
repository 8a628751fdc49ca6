"""Debezium envelope adapter (sources/debezium.py): round-trip
identity, delete pre-images, junk handling, and an end-to-end
kill/resume CDC stream over JSONL envelope segments."""

import os

import pytest
from pyspark.sql import functions as F

from schema_matching_spark.sources import debezium
from schema_matching_spark.sources.generator import changes, expected_state


def _roundtrip_diff(spark, log):
    back = debezium.parse_envelope(debezium.to_envelope(log))
    # ts is ms-truncated by the envelope (Debezium ships ts_ms);
    # compare on the truncated value, everything else exact.
    norm = lambda df: df.select(
        "lsn", "op", "conv_id", "turn_idx", "role", "text", "tool",
        F.unix_millis("ts").alias("ts_ms"),
    )
    a, b = norm(log), norm(back)
    return a.exceptAll(b).count() + b.exceptAll(a).count()


def test_roundtrip_identity(spark):
    log = changes(spark, 5000, n_conv=80, turns_per_conv=10, partitions=4)
    assert _roundtrip_diff(spark, log) == 0


def test_delete_carries_before_image(spark):
    log = changes(spark, 2000, n_conv=30, turns_per_conv=8, partitions=2)
    env = debezium.to_envelope(log)
    dels = env.where(F.get_json_object("value", "$.op") == "d")
    assert dels.count() > 0
    # every delete has a before image and no after image
    assert dels.where(
        F.get_json_object("value", "$.before.conv_id").isNull()
    ).count() == 0
    assert dels.where(
        F.get_json_object("value", "$.after").isNotNull()
    ).count() == 0
    # and parses back keyed from the before image
    parsed = debezium.parse_envelope(dels)
    assert parsed.where(
        F.col("conv_id").isNull() | F.col("turn_idx").isNull()
    ).count() == 0
    assert parsed.select(F.collect_set("op")).first()[0] == ["D"]

    # a source that ships full pre-images on delete (Debezium with
    # REPLICA IDENTITY FULL) must round-trip the payload too
    full = log.withColumn(
        "text",
        F.when(F.col("op") == "D", F.lit("pre-image")).otherwise(F.col("text")),
    )
    back = debezium.parse_envelope(debezium.to_envelope(full))
    assert back.where(
        (F.col("op") == "D") & (F.col("text") != "pre-image")
    ).count() == 0
    assert back.where(F.col("op") == "D").count() > 0


def test_junk_lines_dropped(spark):
    junk = spark.createDataFrame(
        [
            (None,),
            ("",),
            ('{"op":',),  # broken JSON
            ('{"op":"x","after":{"conv_id":"c1","turn_idx":1}}',),  # bad op
            ('{"op":"c","after":null,"source":{"lsn":1}}',),  # no image
            ('{"op":"c","after":{"conv_id":"c1","turn_idx":1},'
             '"source":{"ts_ms":5}}',),  # no lsn
        ],
        "value string",
    )
    assert debezium.parse_envelope(junk).count() == 0


def test_json_escaping_survives(spark):
    log = changes(spark, 200, n_conv=5, turns_per_conv=8, partitions=1)
    tricky = log.withColumn(
        "text",
        F.concat(F.lit('quote:" slash:\\ nl:\n tab:\t u:\u00e9 '), F.col("text")),
    )
    assert _roundtrip_diff(spark, tricky) == 0


def test_parse_plan_has_no_python_eval(spark):
    log = changes(spark, 100, n_conv=5, turns_per_conv=5, partitions=1)
    plan = (
        debezium.parse_envelope(debezium.to_envelope(log))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cdc_stream_over_envelope_segments(spark, tmp_path):
    """Full pipe on the Debezium wire format: envelope JSONL segments →
    streamed parse → watermarked dedup → merge_apply, killed after the
    first batches and resumed from the same checkpoint; final state
    must equal the pure-Python LWW oracle."""
    from schema_matching_spark.operators.verify import states_equal
    from schema_matching_spark.plans.table import SnapshotTable
    from schema_matching_spark.streaming.pipeline import (
        drain_catchup,
        start_cdc_stream,
    )

    log = changes(spark, 12000, n_conv=150, turns_per_conv=10, partitions=4)
    wal = str(tmp_path / "dbz_wal")
    debezium.write_segments(log, wal, n_segments=4)
    table = SnapshotTable(spark, str(tmp_path / "tbl"), n_buckets=4)
    ckpt = str(tmp_path / "ckpt")

    q = start_cdc_stream(
        spark, wal, table, checkpoint_dir=ckpt,
        max_files_per_trigger=1, source_format="debezium",
    )
    # let at least one micro-batch commit, then kill mid-stream
    import time

    deadline = time.time() + 120
    while time.time() < deadline and not table.manifest().get("applied_batches"):
        time.sleep(0.5)
    q.stop()

    drain_catchup(
        lambda: start_cdc_stream(
            spark, wal, table, checkpoint_dir=ckpt,
            max_files_per_trigger=1, source_format="debezium",
        )
    )
    assert len(table.manifest()["applied_batches"]) >= 4
    assert states_equal(table.read(), expected_state(log))


def _drifted_envelopes(log):
    """Envelope lines for ``log`` with EVERY image column renamed
    upstream (conv_id→conversation, turn_idx→seq_no, role→speaker,
    text→content, tool→tool_name) — built by hand because the engine's
    own to_envelope can't emit a drifted image by design."""
    img = F.struct(
        F.col("conv_id").alias("conversation"),
        F.col("turn_idx").alias("seq_no"),
        F.col("role").alias("speaker"),
        F.col("text").alias("content"),
        F.col("tool").alias("tool_name"),
    )
    null_img = F.lit(None).cast(
        "struct<conversation:string,seq_no:int,speaker:string,"
        "content:string,tool_name:string>"
    )
    return log.select(
        F.to_json(
            F.struct(
                F.when(F.col("op") == "D", img).otherwise(null_img).alias(
                    "before"
                ),
                F.when(F.col("op") != "D", img).otherwise(null_img).alias(
                    "after"
                ),
                F.struct(
                    F.col("lsn").alias("lsn"),
                    F.unix_millis(F.col("ts").cast("timestamp")).alias(
                        "ts_ms"
                    ),
                ).alias("source"),
                F.when(F.col("op") == "I", F.lit("c"))
                .when(F.col("op") == "U", F.lit("u"))
                .otherwise(F.lit("d"))
                .alias("op"),
            )
        ).alias("value")
    )


#: Genuinely keyless junk: an empty image and a value-bearing image
#: with nothing key-shaped — neither may be "recovered".
KEYLESS_LINES = [
    ('{"op":"c","after":{},"source":{"lsn":1}}',),
    ('{"op":"c","after":{"speaker":"user"},"source":{"lsn":2}}',),
]


def test_envelope_drift_routes_through_aligner(spark, tmp_path):
    """VERDICT r4 item 4: an upstream column rename INSIDE the envelope
    (fixed _TAGGED_SCHEMA decodes it to NULL image fields ->
    missing_key DLQ) must recover through the B7 value matcher, while
    genuinely keyless events still quarantine."""
    from schema_matching_spark.operators.apply import apply_batch, replay
    from schema_matching_spark.operators.evolve import EvolutionAligner
    from schema_matching_spark.operators.verify import states_equal
    from schema_matching_spark.plans.table import SnapshotTable

    base = changes(spark, 3000, n_conv=40, turns_per_conv=10, partitions=2)
    table = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=4)
    replay(table, base, batch_id="boot")

    nxt = changes(
        spark, 800, n_conv=40, turns_per_conv=10, lsn_start=3000,
        partitions=2,
    )
    env = _drifted_envelopes(nxt)
    keyless = spark.createDataFrame(KEYLESS_LINES, "value string")
    tagged = debezium.parse_envelope_tagged(env.unionAll(keyless))
    # the fixed schema sees every drifted line as missing_key
    assert (
        tagged.where(F.col("dlq_reason") == "missing_key").count() == 802
    )

    aligner = EvolutionAligner(table, str(tmp_path / "ledger.json"))
    recovered, residual = debezium.recover_drifted(tagged, aligner)

    apply_batch(table, recovered, batch_id="b1")
    assert states_equal(
        table.read(), expected_state(base.unionByName(nxt))
    )
    # the decided mapping is ledgered for deterministic replay — ONE
    # entry for the union of observed image keys (JSON null-omission
    # splinters the key-sets; the union pivot re-fuses them so the
    # matcher sees full value distributions)
    ledger = aligner._load_ledger()
    assert len(ledger) == 1
    full_fp = next(iter(ledger.values()))
    assert full_fp["mapping"]["conversation"] == "conv_id"
    assert full_fp["mapping"]["seq_no"] == "turn_idx"
    assert full_fp["mapping"]["content"] == "text"
    assert full_fp["mapping"]["speaker"] == "role"
    assert full_fp["mapping"]["tool_name"] == "tool"
    # genuinely keyless: the empty-image line never reaches the
    # aligner; the speaker-only line does but alignment cannot invent
    # a key, so BOTH stay quarantined as missing_key residual rows.
    res = residual.where(F.col("dlq_reason") == "missing_key")
    assert res.count() == 2
    assert res.where(
        F.col("raw_value").contains('"after":{}')
    ).count() == 1


def test_cdc_stream_heals_drifted_envelopes(spark, tmp_path):
    """The composition as a first-class pipeline feature:
    start_cdc_stream(dlq_dir=..., drift_aligner=...) over a WAL whose
    LAST segment drifted (upstream renamed every image column) plus
    keyless junk — drifted events heal mid-stream through the ledgered
    mapping, junk quarantines, lineage records recovered_drift."""
    from schema_matching_spark.operators.evolve import EvolutionAligner
    from schema_matching_spark.operators.verify import states_equal
    from schema_matching_spark.plans.table import SnapshotTable
    from schema_matching_spark.streaming.pipeline import (
        drain_catchup,
        start_cdc_stream,
    )

    base = changes(spark, 4000, n_conv=60, turns_per_conv=10, partitions=2)
    nxt = changes(
        spark, 1000, n_conv=60, turns_per_conv=10, lsn_start=4000,
        partitions=2,
    )
    wal = str(tmp_path / "wal")
    debezium.write_segments(base, wal, n_segments=2)
    drifted = _drifted_envelopes(nxt).unionAll(
        spark.createDataFrame(KEYLESS_LINES, "value string")
    )
    drifted.coalesce(1).write.text(os.path.join(wal, "segment-000002"))

    table = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=4)
    aligner = EvolutionAligner(table, str(tmp_path / "ledger.json"))
    drain_catchup(
        lambda: start_cdc_stream(
            spark, wal, table, checkpoint_dir=str(tmp_path / "ckpt"),
            max_files_per_trigger=1, source_format="debezium",
            dlq_dir=str(tmp_path / "dlq"), drift_aligner=aligner,
        )
    )
    assert states_equal(
        table.read(), expected_state(base.unionByName(nxt))
    )
    # lineage: some batch recovered exactly the 1000 drifted events and
    # quarantined exactly the 2 keyless lines
    dlq_entries = [
        e["dlq_reasons"]
        for e in table.manifest()["lineage"]
        if "dlq_reasons" in e
    ]
    assert sum(d.get("recovered_drift", 0) for d in dlq_entries) == 1000
    assert sum(d.get("missing_key", 0) for d in dlq_entries) == 2
    quarantined = spark.read.option("recursiveFileLookup", "true").parquet(
        str(tmp_path / "dlq")
    )
    assert quarantined.count() == 2
    assert set(
        r["dlq_reason"] for r in quarantined.collect()
    ) == {"missing_key"}
