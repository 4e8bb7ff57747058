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
    stats = {}
    got = connected_components(edges, max_iter=20, stats=stats).collect()
    assert {r["component"] for r in got} == {0}
    assert len(got) == n + 1
    # convergence early-exit (r12 verdict task): pointer doubling
    # collapses a 41-node chain in O(log diameter) rounds — nowhere
    # near the 20-round cap the fixed loop used to burn.
    assert stats["rounds"] <= 8


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


def test_dedup_representatives_keeps_best_quality(spark):
    # Two near-dup docs in one (lang, source) block: doc 0 is SHORT
    # (8 tokens -> quality factor 0.5), doc 1 repeats the same 8-token
    # base up to 20 tokens (factor 1.0) so its distinct-shingle set is
    # the base set plus the two wrap shingles: Jaccard = 6/8 = 0.75.
    # The keeper must be doc 1 — the HIGHER quality member, not the
    # min id — plus an untouched singleton.
    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, base, "en", "s1", 0),
        (1, " ".join([base, base, "alpha beta gamma delta"]), "en", "s1", 0),
        (2, "totally unrelated words nothing shared here at all", "en", "s1", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    df.createOrReplaceTempView("documents")
    import hashlib

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from fiveg_spark.operators.dedup import _ngram_jaccard_sql
    from fiveg_spark.operators.graph import _doc_quality_sql, connected_components

    # the operator pipeline is driven on the synthetic VIEW directly
    # (the registered query's run() would re-point the view at parquet)
    pairs = spark.sql(_ngram_jaccard_sql("spark")).select("doc_a", "doc_b")
    got = {r["doc_a"]: r["doc_b"] for r in pairs.collect()}
    assert got == {0: 1}  # the planted pair is a candidate

    q = {r["doc_id"]: r["q"] for r in spark.sql(_doc_quality_sql("spark")).collect()}
    assert q[1] > q[0]  # the 20-token doc outscores the short one

    comps = connected_components(pairs, "doc_a", "doc_b")
    docs = spark.sql(_doc_quality_sql("spark"))
    labeled = docs.join(comps, docs["doc_id"] == comps["node"], "left").select(
        "doc_id",
        "source",
        "q",
        F.coalesce(F.col("component"), F.col("doc_id")).alias("cluster_id"),
    )
    w = Window.partitionBy("cluster_id").orderBy(F.desc("q"), F.asc("doc_id"))
    ranked = labeled.withColumn("rk", F.row_number().over(w))
    kept = [r["doc_id"] for r in ranked.filter("rk = 1").collect()]
    assert sorted(kept) == [1, 2]  # doc 1 kept over doc 0; singleton kept

    agg = (
        ranked.groupBy("source")
        .agg(
            F.sum(F.when(F.col("rk") > 1, 1).otherwise(0)).alias("n_dropped"),
            F.expr(
                "md5(concat_ws(\',\', transform(sort_array("
                "collect_list(CASE WHEN rk = 1 THEN doc_id END)), "
                "x -> cast(x AS string))))"
            ).alias("kept_ids_hash"),
        )
        .collect()
    )
    assert agg[0]["n_dropped"] == 1
    assert agg[0]["kept_ids_hash"] == hashlib.md5(b"1,2").hexdigest()
