"""Connected-components label propagation on hand-built graphs."""

from __future__ import annotations

from fiveg_spark.operators.graph import connected_components, dedup_clusters
from tests.conftest import SF_DIR


def test_components_on_known_graph(spark):
    # components: {1,2,3,4} (chain), {10,11}, {20} is absent (no edges)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "src long, dst long"
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_components_long_chain_converges(spark):
    n = 40  # diameter >> 1 exercises multi-round convergence
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "src long, dst long"
    )
    got = connected_components(edges, max_iter=20).collect()
    assert {r["component"] for r in got} == {0}
    assert len(got) == n + 1


def test_dedup_clusters_surface(spark):
    rows = dedup_clusters(spark, SF_DIR).collect()
    # every cluster has >= 2 docs (only docs appearing in pairs enter)
    assert all(r["n_docs"] >= 2 for r in rows)
    assert all(r["cluster_root"] >= 0 for r in rows)
