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
