"""Connected components (functions/graph.py): exact labels on known
graphs, chain convergence, and the near-dup clustering pipeline."""

from pyspark.sql import functions as F

from schema_matching_spark.functions.graph import cluster_stats, connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = connected_components(df)
    return {r["node"]: r["component"] for r in out.collect()}


def test_two_components_exact(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11), (3, 1)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_chain_converges_to_min(spark):
    # worst-case diameter for min-propagation: a 12-node chain
    got = _cc(spark, [(i, i + 1) for i in range(12)])
    assert set(got.values()) == {0}
    assert len(got) == 13


def test_duplicate_and_reversed_edges(spark):
    got = _cc(spark, [(5, 6), (6, 5), (5, 6), (7, 5)])
    assert got == {5: 5, 6: 5, 7: 5}


def test_star_and_singleton_absence(spark):
    got = _cc(spark, [(100, 1), (100, 2), (100, 3)])
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
