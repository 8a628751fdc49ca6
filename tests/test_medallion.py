"""Bronze → silver medallion pipeline (streaming/derived.py): the
snapshot table's own change feed (table_changes source) maintains a
downstream filtered/transformed SnapshotTable incrementally, with
exactly-once on both hops.  Invariant after every catch-up:

    silver.read() == transform(bronze.read().where(predicate))
"""

import os

from pyspark.sql import functions as F

from schema_matching_spark.operators.apply import apply_batch
from schema_matching_spark.plans.table import SnapshotTable
from schema_matching_spark.sources.generator import changes
from schema_matching_spark.streaming.pipeline import drain_catchup
from schema_matching_spark.streaming.derived import start_derived_stream

def _pred():
    return F.col("role") != "tool"  # the view: non-tool turns only


def _transform(rows):
    # payload rewrite: uppercase text, drop tool linkage
    return rows.withColumn("text", F.upper("text")).withColumn(
        "tool", F.lit(None).cast("string")
    )


def _expected(bronze):
    return _transform(bronze.read().where(_pred())).select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_bronze_to_silver_incremental(spark, tmp_path):
    bronze = SnapshotTable(spark, str(tmp_path / "bronze"), n_buckets=8)
    silver = SnapshotTable(spark, str(tmp_path / "silver"), n_buckets=4)
    cp = str(tmp_path / "cp")

    apply_batch(
        bronze, changes(spark, 3000, n_conv=25, turns_per_conv=10, partitions=4),
        "b1",
    )
    drain_catchup(lambda: start_derived_stream(
        spark, bronze.root, silver, cp, predicate=_pred(), transform=_transform
    ), timeout=120)
    assert _rows(silver.read()) == _rows(_expected(bronze))
    assert silver.read().count() > 0

    # more upstream commits (updates flip roles in/out of the view,
    # deletes remove keys) -> resume from checkpoint, process only the
    # new snapshot span, invariant holds again
    apply_batch(
        bronze,
        changes(spark, 1500, n_conv=25, turns_per_conv=10, lsn_start=3000,
                partitions=4),
        "b2",
    )
    apply_batch(
        bronze,
        changes(spark, 800, n_conv=25, turns_per_conv=10, lsn_start=4500,
                partitions=2),
        "b3",
    )
    v_silver = silver.current_version()
    drain_catchup(lambda: start_derived_stream(
        spark, bronze.root, silver, cp, predicate=_pred(), transform=_transform
    ), timeout=120)
    assert silver.current_version() > v_silver
    assert _rows(silver.read()) == _rows(_expected(bronze))

    # no new upstream commits -> catch-up run is a no-op on both hops
    v_silver = silver.current_version()
    drain_catchup(lambda: start_derived_stream(
        spark, bronze.root, silver, cp, predicate=_pred(), transform=_transform
    ), timeout=120)
    assert silver.current_version() == v_silver
    assert _rows(silver.read()) == _rows(_expected(bronze))


def test_silver_without_predicate_or_transform(spark, tmp_path):
    """Identity view: silver replicates bronze exactly (cross-table
    replication via the change feed)."""
    bronze = SnapshotTable(spark, str(tmp_path / "bronze"), n_buckets=8)
    silver = SnapshotTable(
        spark, str(tmp_path / "silver"), n_buckets=8, mode="mor"
    )
    apply_batch(
        bronze, changes(spark, 2000, n_conv=20, turns_per_conv=10, partitions=4),
        "b1",
    )
    drain_catchup(lambda: start_derived_stream(
        spark, bronze.root, silver, str(tmp_path / "cp")
    ), timeout=120)
    assert _rows(silver.read()) == _rows(
        bronze.read().select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    )
