"""Dead-letter queue for malformed Debezium envelopes
(sources/debezium.parse_envelope_tagged + streaming/pipeline dlq_dir).

A real CDC pipeline must quarantine junk with a reason, not silently
drop it: the DLQ is how an operator discovers a producer bug without
diffing table states.  Tombstones (Kafka compaction markers) are
expected protocol noise — counted, never quarantined."""

import os

import pytest
from pyspark.sql import functions as F

from schema_matching_spark.sources import debezium
from schema_matching_spark.sources.generator import changes, expected_state

GOOD = '{"op":"c","after":{"conv_id":"cX","turn_idx":1,"role":"user","text":"ok","tool":null},"source":{"lsn":900001,"ts_ms":5},"ts_ms":5}'
JUNK = [
    ('{"op":', "unparseable_json"),
    ("not json at all", "unparseable_json"),
    ('{"after":{"conv_id":"c1","turn_idx":1},"source":{"lsn":1}}', "missing_op"),
    ('{"op":"x","after":{"conv_id":"c1","turn_idx":1},"source":{"lsn":1}}', "unknown_op"),
    ('{"op":"c","after":{"conv_id":"c1","turn_idx":1},"source":{"ts_ms":5}}', "missing_lsn"),
    ('{"op":"c","after":{"role":"user"},"source":{"lsn":1}}', "missing_key"),
]


def test_tagged_taxonomy_exact(spark):
    rows = [(None,), ("",)] + [(line,) for line, _ in JUNK] + [(GOOD,)]
    df = spark.createDataFrame(rows, "value string")
    got = {
        r["raw_value"]: r["dlq_reason"]
        for r in debezium.parse_envelope_tagged(df).collect()
    }
    for line, reason in JUNK:
        assert got[line] == reason, line
    assert got[GOOD] is None
    assert got[""] == "tombstone" and got[None] == "tombstone"


def test_good_plus_bad_partition_the_input(spark):
    """Every line gets exactly one verdict: reason-null rows are
    exactly parse_envelope's output, and counts reconcile."""
    log = changes(spark, 2000, n_conv=30, turns_per_conv=8, partitions=2)
    env = debezium.to_envelope(log).unionAll(
        spark.createDataFrame([(line,) for line, _ in JUNK], "value string")
    )
    tagged = debezium.parse_envelope_tagged(env)
    n_good = tagged.where(F.col("dlq_reason").isNull()).count()
    n_bad = tagged.where(F.col("dlq_reason").isNotNull()).count()
    assert n_good == debezium.parse_envelope(env).count() == 2000
    assert n_bad == len(JUNK)
    assert n_good + n_bad == env.count()


@pytest.fixture(scope="module")
def dlq_setup(spark, tmp_path_factory):
    """Envelope segments + one junk file, drained with dlq_dir set."""
    from schema_matching_spark.plans.table import SnapshotTable
    from schema_matching_spark.streaming.pipeline import (
        drain_catchup,
        start_cdc_stream,
    )

    base = tmp_path_factory.mktemp("dlq")
    log = changes(spark, 6000, n_conv=80, turns_per_conv=10, partitions=4)
    wal = str(base / "wal")
    debezium.write_segments(log, wal, n_segments=3)
    junk_dir = os.path.join(wal, "segment-junk")
    os.makedirs(junk_dir)
    with open(os.path.join(junk_dir, "junk.txt"), "w") as f:
        for line, _ in JUNK:
            f.write(line + "\n")
        f.write("\n")  # tombstone: counted, never quarantined

    table = SnapshotTable(spark, str(base / "tbl"), n_buckets=4)
    dlq_dir = str(base / "dlq")
    drain_catchup(
        lambda: start_cdc_stream(
            spark,
            wal,
            table,
            checkpoint_dir=str(base / "ckpt"),
            max_files_per_trigger=1,
            source_format="debezium",
            dlq_dir=dlq_dir,
        ),
        timeout=180,
    )
    return log, table, dlq_dir, str(base)


def test_dlq_quarantines_exactly_the_junk(spark, dlq_setup):
    _, _, dlq_dir, _ = dlq_setup
    got = {
        (r["raw_value"], r["dlq_reason"])
        for r in spark.read.parquet(dlq_dir).collect()
    }
    assert got == set(JUNK)  # tombstone line absent


def test_dlq_final_state_unaffected(spark, dlq_setup):
    from schema_matching_spark.operators.verify import states_equal

    log, table, _, _ = dlq_setup
    assert states_equal(table.read(), expected_state(log))


def test_dlq_counts_in_lineage(spark, dlq_setup):
    _, table, _, _ = dlq_setup
    reasons: dict = {}
    for entry in table.manifest()["lineage"]:
        for k, v in entry.get("dlq_reasons", {}).items():
            reasons[k] = reasons.get(k, 0) + v
    assert reasons.get("tombstone") == 1
    assert sum(v for k, v in reasons.items() if k != "tombstone") == len(JUNK)


def test_dlq_replay_overwrites_not_duplicates(spark, dlq_setup):
    """A re-run from a fresh checkpoint re-emits the same batch ids;
    the per-batch-directory overwrite keeps the DLQ exactly-once."""
    from schema_matching_spark.plans.table import SnapshotTable
    from schema_matching_spark.streaming.pipeline import (
        drain_catchup,
        start_cdc_stream,
    )

    log, _, dlq_dir, base = dlq_setup
    before = spark.read.parquet(dlq_dir).count()
    table2 = SnapshotTable(spark, os.path.join(base, "tbl2"), n_buckets=4)
    drain_catchup(
        lambda: start_cdc_stream(
            spark,
            os.path.join(base, "wal"),
            table2,
            checkpoint_dir=os.path.join(base, "ckpt2"),
            max_files_per_trigger=1,
            source_format="debezium",
            dlq_dir=dlq_dir,
        ),
        timeout=180,
    )
    assert spark.read.parquet(dlq_dir).count() == before


def test_dlq_requires_debezium_format(spark, tmp_path):
    from schema_matching_spark.plans.table import SnapshotTable
    from schema_matching_spark.streaming.pipeline import start_cdc_stream

    table = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=4)
    with pytest.raises(ValueError, match="debezium"):
        start_cdc_stream(
            spark,
            str(tmp_path / "wal"),
            table,
            checkpoint_dir=str(tmp_path / "ckpt"),
            dlq_dir=str(tmp_path / "dlq"),
        )
