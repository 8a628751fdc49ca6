"""Gold-layer aggregate maintenance (streaming/derived.py rollup hop):
the bronze change feed maintains a per-conversation AGGREGATE view by
group-recompute — every touched conversation is recomputed from its own
hash bucket, never the whole table.  Invariant after every catch-up
(incl. resume and full-conversation deletes):

    gold.read() == expected_rollup(bronze)
"""

import json

from pyspark.sql import functions as F

from schema_matching_spark.operators.apply import apply_batch
from schema_matching_spark.plans.table import SnapshotTable
from schema_matching_spark.sources.generator import changes
from schema_matching_spark.streaming.pipeline import drain_catchup
from schema_matching_spark.streaming.derived import (
    expected_rollup,
    start_derived_stream,
    start_rollup_stream,
)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _catch_up(spark, bronze_root, gold, cp):
    drain_catchup(lambda: start_rollup_stream(spark, bronze_root, gold, cp), timeout=120)


def test_rollup_initial_and_incremental(spark, tmp_path):
    bronze = SnapshotTable(spark, str(tmp_path / "bronze"), n_buckets=8)
    gold = SnapshotTable(spark, str(tmp_path / "gold"), n_buckets=4)
    cp = str(tmp_path / "cp")

    apply_batch(
        bronze, changes(spark, 3000, n_conv=25, turns_per_conv=10, partitions=4),
        "b1",
    )
    _catch_up(spark, bronze.root, gold, cp)
    assert _rows(gold.read()) == _rows(expected_rollup(bronze))
    n = gold.read().count()
    assert 0 < n <= 25

    # stats payload is real JSON with the declared fields
    row = gold.read().limit(1).collect()[0]
    stats = json.loads(row["text"])
    assert set(stats) == {"n_turns", "n_user", "n_assistant", "n_tool",
                          "total_chars"}
    # system turns exist too, so the three counted roles bound n_turns
    assert stats["n_turns"] >= (
        stats["n_user"] + stats["n_assistant"] + stats["n_tool"]
    )
    assert stats["n_turns"] > 0 and stats["total_chars"] > 0

    # incremental: updates + deletes upstream, resume from checkpoint
    apply_batch(
        bronze,
        changes(spark, 1500, n_conv=25, turns_per_conv=10, lsn_start=3000,
                partitions=4),
        "b2",
    )
    _catch_up(spark, bronze.root, gold, cp)
    assert _rows(gold.read()) == _rows(expected_rollup(bronze))

    # no-op catch-up: nothing new upstream -> invariant still holds
    _catch_up(spark, bronze.root, gold, cp)
    assert _rows(gold.read()) == _rows(expected_rollup(bronze))


def test_rollup_full_conversation_delete(spark, tmp_path):
    bronze = SnapshotTable(spark, str(tmp_path / "bronze"), n_buckets=4)
    gold = SnapshotTable(spark, str(tmp_path / "gold"), n_buckets=2)
    cp = str(tmp_path / "cp")
    apply_batch(
        bronze, changes(spark, 2000, n_conv=10, turns_per_conv=8, partitions=4),
        "b1",
    )
    _catch_up(spark, bronze.root, gold, cp)
    victim = "conv-00000004"
    assert gold.lookup(victim).count() == 1

    # delete EVERY live turn of the victim upstream
    dels = (
        bronze.read()
        .where(F.col("conv_id") == victim)
        .select(
            (F.lit(10_000_000) + F.col("turn_idx").cast("long")).alias("lsn"),
            F.lit("D").alias("op"),
            "ts", "conv_id", "turn_idx", "role", "text", "tool",
        )
    )
    apply_batch(bronze, dels, "kill")
    _catch_up(spark, bronze.root, gold, cp)
    assert gold.lookup(victim).count() == 0
    assert _rows(gold.read()) == _rows(expected_rollup(bronze))
    # the tombstone guards the key (a gold row existed, now D)
    assert gold.read().where(F.col("conv_id") == victim).count() == 0


def test_three_hop_bronze_silver_gold(spark, tmp_path):
    """Medallion chain: bronze -> silver (filtered view) -> gold
    (rollup of silver), each hop exactly-once on its own."""
    bronze = SnapshotTable(spark, str(tmp_path / "bronze"), n_buckets=4)
    silver = SnapshotTable(spark, str(tmp_path / "silver"), n_buckets=4)
    gold = SnapshotTable(spark, str(tmp_path / "gold"), n_buckets=2)
    cp_s, cp_g = str(tmp_path / "cps"), str(tmp_path / "cpg")
    pred = F.col("role") != "tool"

    for i, n in enumerate([2000, 1000]):
        apply_batch(
            bronze,
            changes(spark, n, n_conv=15, turns_per_conv=8,
                    lsn_start=3000 * i, partitions=4),
            f"b{i}",
        )
        drain_catchup(lambda: start_derived_stream(spark, bronze.root, silver, cp_s, predicate=pred), timeout=120)
        drain_catchup(lambda: start_rollup_stream(spark, silver.root, gold, cp_g), timeout=120)
        assert _rows(gold.read()) == _rows(expected_rollup(silver))
    # silver holds no tool turns, so gold's n_tool is 0 everywhere
    stats = [json.loads(r["text"]) for r in gold.read().collect()]
    assert stats and all(s["n_tool"] == 0 for s in stats)


def test_read_keys_matches_filtered_read(spark, tmp_path):
    for mode in ("cow", "mor"):
        t = SnapshotTable(
            spark, str(tmp_path / f"t_{mode}"), n_buckets=8, mode=mode
        )
        apply_batch(t, changes(spark, 2000, n_conv=20, partitions=4), "b1")
        apply_batch(
            t, changes(spark, 800, n_conv=20, lsn_start=5000, partitions=2),
            "b2",
        )
        want_keys = ["conv-00000003", "conv-00000011", "conv-00000017"]
        keys = spark.createDataFrame([(k,) for k in want_keys], "conv_id string")
        got = t.read_keys(keys)
        assert "lsn" in got.columns
        want = t.read().where(F.col("conv_id").isin(want_keys))
        assert _rows(got.drop("lsn")) == _rows(want)


def _stats_rows(df):
    """(conv_id, parsed stats) — the retract strategy's exactness
    surface (ts is a high-watermark there, not an exact max)."""
    return sorted(
        (r["conv_id"], tuple(sorted(json.loads(r["text"]).items())))
        for r in df.collect()
    )


def test_rollup_retract_strategy_exact_stats(spark, tmp_path):
    bronze = SnapshotTable(spark, str(tmp_path / "bronze"), n_buckets=8)
    gold = SnapshotTable(spark, str(tmp_path / "gold"), n_buckets=4)
    cp = str(tmp_path / "cp")

    def catch_up():
        drain_catchup(lambda: start_rollup_stream(
            spark, bronze.root, gold, cp, strategy="retract"
        ), timeout=120)
        assert _stats_rows(gold.read()) == _stats_rows(expected_rollup(bronze))

    apply_batch(
        bronze, changes(spark, 3000, n_conv=25, turns_per_conv=10, partitions=4),
        "b1",
    )
    catch_up()
    assert gold.read().count() > 0

    # increments with updates + deletes, applied across TWO upstream
    # commits then one catch-up (multi-span batch), then another round
    for i, lsn0 in enumerate([3000, 4500]):
        apply_batch(
            bronze,
            changes(spark, 1200, n_conv=25, turns_per_conv=10,
                    lsn_start=lsn0, partitions=4),
            f"inc{i}",
        )
    catch_up()

    # full-conversation delete: subtractive path must tombstone the row
    victim = "conv-00000006"
    dels = (
        bronze.read()
        .where(F.col("conv_id") == victim)
        .select(
            (F.lit(20_000_000) + F.col("turn_idx").cast("long")).alias("lsn"),
            F.lit("D").alias("op"),
            "ts", "conv_id", "turn_idx", "role", "text", "tool",
        )
    )
    apply_batch(bronze, dels, "kill")
    catch_up()
    assert gold.lookup(victim).count() == 0

    # no-op catch-up after quiescence: increments must not re-apply
    before = _stats_rows(gold.read())
    catch_up()
    assert _stats_rows(gold.read()) == before
