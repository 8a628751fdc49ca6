"""jobs/stream_job.py CLI glue: bounded catch-up over a Debezium WAL
with DLQ + drift healing, exercised in-process (SparkSession.getOrCreate
reuses the test session, exactly what spark-submit would provide)."""

import json
import os
import sys

from pyspark.sql import functions as F

from schema_matching_spark.operators.verify import states_equal
from schema_matching_spark.sources import debezium
from schema_matching_spark.sources.generator import changes, expected_state
from tests.test_debezium import KEYLESS_LINES, _drifted_envelopes

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))


def test_stream_job_catchup_with_drift(spark, tmp_path, monkeypatch, capsys):
    import stream_job

    base = changes(spark, 2000, n_conv=30, turns_per_conv=10, partitions=2)
    nxt = changes(
        spark, 500, n_conv=30, turns_per_conv=10, lsn_start=2000,
        partitions=2,
    )
    wal = str(tmp_path / "wal")
    debezium.write_segments(base, wal, n_segments=2)
    _drifted_envelopes(nxt).unionAll(
        spark.createDataFrame(KEYLESS_LINES, "value string")
    ).coalesce(1).write.text(os.path.join(wal, "segment-000002"))

    monkeypatch.setattr(sys, "argv", [
        "stream_job.py",
        "--wal", wal,
        "--table", str(tmp_path / "t"),
        "--checkpoint", str(tmp_path / "ckpt"),
        "--source-format", "debezium",
        "--dlq-dir", str(tmp_path / "dlq"),
        "--drift-ledger", str(tmp_path / "ledger.json"),
        "--n-buckets", "4",
    ])
    stream_job.main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["applied_batches"] >= 3
    assert out["dlq_reasons"].get("recovered_drift") == 500
    assert out["dlq_reasons"].get("missing_key") == 2

    from schema_matching_spark.plans.table import SnapshotTable

    table = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=4)
    assert states_equal(
        table.read(), expected_state(base.unionByName(nxt))
    )
    assert out["rows"] == table.read().count()
