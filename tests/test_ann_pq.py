"""PQ-ANN: encoding must equal numpy argmin per sub-space, ADC recall
must beat chance by a wide margin, and re-ranked scores are exact."""

from __future__ import annotations

import numpy as np

from tests.conftest import SF_DIR
from fiveg_spark.operators.ann_pq import (
    M_SUBSPACES,
    _normalize,
    ann_pq,
    encode,
    fit_codebooks,
)
from fiveg_spark.sources.tables import load_table


def test_encoding_matches_numpy_argmin(spark):
    emb = load_table(spark, "embeddings", SF_DIR)
    rows = emb.select("vec_id", "embedding").limit(200).collect()
    sample = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    CB = fit_codebooks(sample)
    cb_bc = spark.sparkContext.broadcast(CB)
    got = {
        r["vec_id"]: list(r["codes"])
        for r in encode(emb.limit(200), cb_bc).collect()
    }
    X = _normalize(sample)
    subs = np.array_split(X, M_SUBSPACES, axis=1)
    for i, r in enumerate(rows):
        expect = [
            int(((subs[m][i][None, :] - CB[m]) ** 2).sum(axis=1).argmin())
            for m in range(M_SUBSPACES)
        ]
        assert got[r["vec_id"]] == expect


def test_pq_recall_and_exact_rerank_scores(spark):
    from fiveg_spark.operators.similarity import QUERIES as SIM_QUERIES

    brute = next(q for q in SIM_QUERIES if q.name == "knn_bruteforce")
    brute_rows = brute.run(spark, SF_DIR).collect()
    exact = {r["vec_id"] for r in brute_rows}
    brute_scores = {r["vec_id"]: r["cosine"] for r in brute_rows}

    approx_df = ann_pq(spark, SF_DIR, query_vec_id=0, k=10)
    approx_rows = approx_df.collect()
    approx = {r["vec_id"] for r in approx_rows}
    assert len(approx) == 10
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"PQ recall {recall} too low"
    for r in approx_rows:
        if r["vec_id"] in brute_scores:
            assert abs(r["cosine"] - brute_scores[r["vec_id"]]) < 1e-9


def test_ann_recall_matrix_all_methods_pass(spark):
    """E45: the certified recall matrix — every method returns k rows
    and clears the recall floor on the test corpus."""
    from tests import conftest as c

    from fiveg_spark.operators.ann_recall import K, ann_recall_matrix

    rows = {r["method"]: r for r in ann_recall_matrix(spark, c.SF_DIR).collect()}
    assert set(rows) == {"ivf", "lsh", "mllib_brp", "pq"}
    for m, r in rows.items():
        assert r["k"] == K and r["n_returned"] == K, (m, dict(r.asDict()))
        assert r["recall_ok"], m


def test_ivf_centroids_round_trip_bit_exact(spark, tmp_path):
    """D23-style persistence for the IVF index: save/load centroids and
    prove the reloaded index assigns every vector to the same list."""
    import numpy as np

    from fiveg_spark.operators.ann_ivf import (
        assign_lists,
        fit_centroids,
        load_centroids,
        save_centroids,
    )
    from fiveg_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    emb = load_table(spark, "embeddings", SF_DIR)
    cents = fit_centroids(spark, emb)
    path = str(tmp_path / "ivf_centroids")
    save_centroids(spark, cents, path)
    back = load_centroids(spark, path)
    assert back.shape == cents.shape
    assert np.array_equal(back, cents)  # bit-exact round trip

    bc1 = spark.sparkContext.broadcast(cents)
    bc2 = spark.sparkContext.broadcast(back)
    a1 = {r["vec_id"]: r["list_id"] for r in assign_lists(emb, bc1).collect()}
    a2 = {r["vec_id"]: r["list_id"] for r in assign_lists(emb, bc2).collect()}
    assert a1 == a2


def test_cross_table_retrieval_per_query_recall(spark):
    # The pooled contract row hides per-query variance; here every
    # planted query must return exactly k ranked rows and the per-query
    # recall distribution must clear the floor on average by a margin.
    from pyspark.sql import functions as F

    from fiveg_spark.operators.ann_retrieval import (
        K,
        QUERY_N,
        _exact_retrieve,
        ivf_retrieve,
        pq_retrieve,
    )

    emb = load_table(spark, "embeddings", SF_DIR)
    queries = emb.filter(F.col("vec_id") < QUERY_N).localCheckpoint()
    corpus = emb.filter(F.col("vec_id") >= QUERY_N).localCheckpoint()
    exact = _exact_retrieve(queries, corpus, K).select("query_id", "vec_id")

    for fn in (ivf_retrieve, pq_retrieve):
        approx = fn(spark, queries, corpus, K)
        per_q = {
            r["query_id"]: r["n"]
            for r in approx.groupBy("query_id")
            .agg(F.count("*").alias("n"), F.max("rank").alias("max_rank"))
            .collect()
        }
        assert len(per_q) == QUERY_N and all(v == K for v in per_q.values())
        hits = approx.join(exact, ["query_id", "vec_id"]).count()
        assert hits / (QUERY_N * K) >= 0.6, fn.__name__


def test_retrieval_rank_quality_mean_ndcg_above_floor(spark):
    # raw nDCG values (the cert row only carries the boolean): both
    # methods should order the exact set well, not just recover it
    import math

    from pyspark.sql import functions as F

    from fiveg_spark.operators.ann_retrieval import (
        K,
        QUERY_N,
        _exact_retrieve,
        ivf_retrieve,
        pq_retrieve,
    )

    emb = load_table(spark, "embeddings", SF_DIR)
    queries = emb.filter(F.col("vec_id") < QUERY_N).localCheckpoint()
    corpus = emb.filter(F.col("vec_id") >= QUERY_N).localCheckpoint()
    exact = _exact_retrieve(queries, corpus, K).select(
        "query_id", "vec_id", F.lit(1.0).alias("rel")
    )
    idcg = sum(1.0 / math.log2(r + 1) for r in range(1, K + 1))
    for fn in (ivf_retrieve, pq_retrieve):
        ndcgs = (
            fn(spark, queries, corpus, K)
            .join(exact, ["query_id", "vec_id"], "left")
            .withColumn(
                "g",
                F.coalesce(F.col("rel"), F.lit(0.0))
                / (F.log(F.col("rank") + 1.0) / math.log(2.0)),
            )
            .groupBy("query_id")
            .agg((F.sum("g") / F.lit(idcg)).alias("ndcg"))
            .collect()
        )
        vals = [r["ndcg"] for r in ndcgs]
        assert len(vals) == QUERY_N
        assert sum(vals) / len(vals) >= 0.55, fn.__name__
        assert all(0.0 <= v <= 1.0 + 1e-9 for v in vals)


def test_probe_ladder_raw_recalls_monotone_and_final_floor(spark):
    """E98 raw evidence behind the ann_ivf_probe_ladder cert booleans:
    hits never decrease as nprobe grows (nested candidate sets) and the
    full-probe rung recovers at least the E20-certified floor."""
    from fiveg_spark.operators.ann_recall import (
        K,
        PROBE_LADDER,
        RECALL_FLOOR,
        probe_ladder_hits,
    )

    hits = probe_ladder_hits(spark, "/root/testdata/sf0.001")
    assert [p for p, _h in hits] == list(PROBE_LADDER)
    values = [h for _p, h in hits]
    assert values == sorted(values), f"recall not monotone: {values}"
    assert values[-1] / K >= RECALL_FLOOR, f"full-probe recall {values[-1]}/{K}"
    # the ladder must actually be a LADDER on this corpus: the first
    # rung misses something the last rung finds (otherwise the knob
    # measures nothing)
    assert values[0] < values[-1]
