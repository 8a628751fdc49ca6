"""Custom Python DataSource (sources/pysource.py): batch read,
micro-batch stream read, prefix determinism, and a CDC replay through
the snapshot table verified against the LWW oracle computed from the
source itself."""

import uuid

from pyspark.sql import functions as F

from schema_matching_spark.sources.pysource import register


def _batch(spark, **opts):
    r = spark.read.format("transcript_changes")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_read_shape_and_determinism(spark):
    register(spark)
    df = _batch(spark, n_events=2000, n_conv=40, turns_per_conv=10, partitions=4)
    assert df.count() == 2000
    assert df.schema.simpleString().startswith("struct<lsn:bigint,op:string")
    ops = {r["op"]: r["n"] for r in df.groupBy("op").agg(F.count("*").alias("n")).collect()}
    assert set(ops) == {"I", "U", "D"} and ops["I"] > ops["U"] > ops["D"]
    # deletes carry no payload
    assert df.where((F.col("op") == "D") & F.col("text").isNotNull()).isEmpty()
    # two reads with identical options are identical (order-insensitive)
    again = _batch(spark, n_events=2000, n_conv=40, turns_per_conv=10, partitions=8)
    assert df.exceptAll(again).isEmpty() and again.exceptAll(df).isEmpty()
    # prefix reproducibility: first 500 lsns of a longer read == a 500 read
    prefix = _batch(spark, n_events=500, n_conv=40, turns_per_conv=10)
    assert df.where(F.col("lsn") < 500).exceptAll(prefix).isEmpty()


def test_stream_equals_batch(spark):
    """Micro-batch pacing: the source advances its lsn offset by
    events_per_batch per trigger, so a continuously-triggered query
    drains max_events across ~5 micro-batches; the union of appended
    batches must equal the batch read."""
    import time

    register(spark)
    sink = f"pysource_stream_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("transcript_changes")
        .option("events_per_batch", 300)
        .option("max_events", 1500)
        .option("n_conv", 40)
        .option("turns_per_conv", 10)
        .load()
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline and spark.table(sink).count() < 1500:
            time.sleep(2)
    finally:
        q.stop()
        q.awaitTermination()
    streamed = spark.table(sink)
    batch = _batch(spark, n_events=1500, n_conv=40, turns_per_conv=10)
    assert streamed.count() == 1500
    assert streamed.exceptAll(batch).isEmpty()
    assert batch.exceptAll(streamed).isEmpty()


def test_cdc_replay_from_pysource_matches_lww_oracle(spark, tmp_path):
    from schema_matching_spark.operators.apply import replay
    from schema_matching_spark.operators.verify import states_equal
    from schema_matching_spark.plans.table import SnapshotTable
    from schema_matching_spark.sources.generator import expected_state

    register(spark)
    log = _batch(spark, n_events=3000, n_conv=30, turns_per_conv=8).cache()
    table = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=4)
    replay(table, log)
    assert states_equal(table.read(), expected_state(log))
