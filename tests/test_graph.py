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


def test_khop_bfs_properties(spark):
    from fiveg_spark.operators.ts_advanced import QUERIES as TSQ
    import tests.conftest as c

    q = {x.name: x for x in TSQ}["khop_distances"]
    rows = q.run(spark, c.SF_DIR).collect()
    nodes = [r["node"] for r in rows]
    assert len(nodes) == len(set(nodes))  # min-dist dedup held
    by_node = {r["node"]: r["hops"] for r in rows}
    src = min(
        r["n_name"]
        for r in spark.read.parquet(f"{c.SF_DIR}/nation.parquet").collect()
    )
    assert by_node[src] == 0
    assert all(0 <= h <= 4 for h in by_node.values())
    # BFS level sets are contiguous: if a node sits at hop k>0, some
    # node exists at hop k-1
    hops = set(by_node.values())
    assert hops == set(range(max(hops) + 1))


def test_iterative_graph_edges_materialize_once(spark):
    """Regression (ADVICE r4): khop/label-propagation used a lazy
    .cache() unpersisted before any action, so the final plan re-ran
    the 5-table edge join once per reference.  With the eager
    localCheckpoint the returned plan must read the materialized RDD —
    no parquet re-scan of the edge-building tables survives."""
    import tests.conftest as c

    from fiveg_spark.operators.ts_advanced import QUERIES as TSQ

    for name in ("khop_distances", "label_propagation"):
        q = {x.name: x for x in TSQ}[name]
        df = q.run(spark, c.SF_DIR)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "lineitem" not in plan, f"{name}: edge join re-inlined\n{plan[:500]}"
        assert "ExistingRDD" in plan or "LogicalRDD" in plan, name
