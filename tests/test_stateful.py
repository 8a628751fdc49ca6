"""Custom stateful streaming operator tests (streaming/stateful.py).

State must accumulate ACROSS micro-batches (maxFilesPerTrigger=1 over
several WAL segments) and the final emitted totals must equal the
batch-computed ground truth per conversation.
"""

import os

from pyspark.sql import functions as F

from schema_matching_spark.sources.generator import changes
from schema_matching_spark.sources.wal import read_stream, write_segments
from schema_matching_spark.streaming.stateful import conversation_progress

N = 6000


def test_stateful_progress_accumulates_across_batches(spark, tmp_path):
    log = changes(spark, N, n_conv=25, turns_per_conv=12, partitions=4)
    wal = str(tmp_path / "wal")
    write_segments(log, wal, n_segments=4)

    stream = read_stream(spark, wal, max_files_per_trigger=1)
    q = (
        conversation_progress(stream)
        .writeStream.format("memory")
        .queryName("conv_progress")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # update-mode memory sink appends each batch's emissions; the final
    # row per conv (highest n_events) is the accumulated state
    emitted = spark.table("conv_progress")
    final = (
        emitted.groupBy("conv_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("n_deletes").alias("n_deletes"),
            F.max("max_lsn").alias("max_lsn"),
            F.max("n_turns_touched").alias("n_turns_touched"),
        )
    )
    truth = log.groupBy("conv_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("n_deletes"),
        F.max("lsn").alias("max_lsn"),
        F.countDistinct("turn_idx").cast("int").alias("n_turns_touched"),
    )
    diff = final.exceptAll(truth)
    assert diff.count() == 0, diff.limit(5).collect()
    assert truth.exceptAll(final).count() == 0

    # multiple batches actually happened (state crossed batch boundaries)
    multi = emitted.groupBy("conv_id").count().where(F.col("count") > 1).count()
    assert multi > 0, "expected conversations emitted in more than one micro-batch"
