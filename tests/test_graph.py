"""Connected components (functions/graph.py): exact labels on known
graphs, chain convergence, and the near-dup clustering pipeline — each
run in BOTH lineage-cut modes (localCheckpoint and reliable
checkpoint(), VERDICT r2 #5)."""

import pytest
from pyspark.sql import functions as F

from schema_matching_spark.functions.graph import cluster_stats, connected_components


@pytest.fixture(params=["local", "reliable"])
def cc_kwargs(request, tmp_path):
    if request.param == "local":
        return {}
    return {"checkpoint_dir": str(tmp_path / "cc_ckpt")}


def _cc(spark, edges, **kwargs):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = connected_components(df, **kwargs)
    return {r["node"]: r["component"] for r in out.collect()}


def test_two_components_exact(spark, cc_kwargs):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11), (3, 1)], **cc_kwargs)
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_chain_converges_to_min(spark, cc_kwargs):
    # worst-case diameter for min-propagation: a 12-node chain
    got = _cc(spark, [(i, i + 1) for i in range(12)], **cc_kwargs)
    assert set(got.values()) == {0}
    assert len(got) == 13


def test_duplicate_and_reversed_edges(spark, cc_kwargs):
    got = _cc(spark, [(5, 6), (6, 5), (5, 6), (7, 5)], **cc_kwargs)
    assert got == {5: 5, 6: 5, 7: 5}


def test_star_and_singleton_absence(spark, cc_kwargs):
    got = _cc(spark, [(100, 1), (100, 2), (100, 3)], **cc_kwargs)
    assert got == {100: 1, 1: 1, 2: 1, 3: 1}
    assert 999 not in got  # isolated nodes are the caller's business


def test_cluster_stats(spark):
    df = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)], "node long, component long"
    )
    r = cluster_stats(df).collect()[0]
    assert (r["n_clusters"], r["max_cluster_size"], r["n_clustered_docs"]) == (2, 3, 5)


def test_near_dup_cluster_query_finds_planted(spark):
    from schema_matching_spark.queries.dataprep import q_near_dup_clusters
    from tests.conftest import SF_DIR

    r = q_near_dup_clusters(spark, SF_DIR).collect()[0]
    # every planted near-dup (doc, doc+200000) pair must land in one
    # cluster; clusters therefore have >= 2 members and there are
    # roughly n_docs/9 of them
    assert r["n_clusters"] > 0
    assert r["max_cluster_size"] >= 2
    assert r["n_clustered_docs"] >= 2 * r["n_clusters"]
