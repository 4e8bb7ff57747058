"""MLlib-native counterparts of the hand-built operators.

Where Spark MLlib ships a distributed implementation of something this
engine needs, we expose it alongside the from-scratch version:

- ``linear_baseline``: Pipeline(VectorAssembler → StandardScaler →
  LinearRegression) forecasting next-hour throughput from VAR lag
  features — the classic MLlib-pipeline shape (fit = distributed WLS
  normal equations, exactly the layout ml/var.py hand-rolls).
- ``mllib_minhash_pairs``: HashingTF token sets → MinHashLSH
  ``approxSimilarityJoin`` — MLlib's own banded MinHash, complementing
  the md5-based oracle-checked implementation in operators/dedup.py.
- ``mllib_ann_topk``: BucketedRandomProjectionLSH
  ``approxNearestNeighbors`` — MLlib's Euclidean-LSH ANN, complementing
  operators/ann_lsh.py's cosine hyperplanes.

All rows-only in the contract (MLlib's hash seeds/solvers are not
reproducible in DuckDB); pytests pin behavior against the from-scratch
implementations and closed-form solutions.
"""

from __future__ import annotations

from pyspark.ml import Pipeline
from pyspark.ml.feature import (
    BucketedRandomProjectionLSH,
    HashingTF,
    MinHashLSH,
    NGram,
    RegexTokenizer,
    StandardScaler,
    VectorAssembler,
)
from pyspark.ml.functions import array_to_vector
from pyspark.ml.regression import LinearRegression
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fiveg_spark.plans.registry import Query, ensure_views
from fiveg_spark.sources.tables import load_table


def linear_baseline(spark: SparkSession, sf_dir: str, p: int = 3) -> DataFrame:
    """Per-slice next-hour throughput AR(p) baseline as an MLlib Pipeline.

    Returns one row per slice with train RMSE/R² and coefficient count —
    a compact, deterministic surface (LinearRegression with the 'normal'
    solver is exact least squares, no SGD nondeterminism).
    """
    from fiveg_spark.operators.timeseries import _var_lag_sql

    ensure_views(spark, ("events",), sf_dir)
    lagged = spark.sql(_var_lag_sql("spark"))

    pipeline = Pipeline(
        stages=[
            VectorAssembler(inputCols=["y_l1", "y_l2", "y_l3"][:p], outputCol="raw"),
            StandardScaler(inputCol="raw", outputCol="features"),
            LinearRegression(
                featuresCol="features", labelCol="y", solver="normal", regParam=0.0
            ),
        ]
    )
    rows = []
    for slice_name in ("eMBB", "URLLC", "mMTC"):
        part = lagged.filter(F.col("slice") == slice_name)
        model = pipeline.fit(part)
        lr = model.stages[-1]
        rows.append(
            (
                slice_name,
                int(lr.numFeatures),
                round(float(lr.summary.rootMeanSquaredError), 4),
                round(float(lr.summary.r2), 4),
            )
        )
    return spark.createDataFrame(
        rows, "slice string, n_features int, train_rmse double, train_r2 double"
    )


def _doc_features(spark: SparkSession, sf_dir: str, num_features: int = 1 << 18):
    """tokens → 3-gram shingles → binary hashed set vectors: the same
    shingle granularity as operators/dedup.py, so set-Jaccard measures
    near-duplication rather than shared vocabulary."""
    docs = load_table(spark, "documents", sf_dir)
    tokenizer = RegexTokenizer(
        inputCol="text", outputCol="tokens", pattern=" +", toLowercase=True
    )
    ngram = NGram(n=3, inputCol="tokens", outputCol="shingles")
    tf = HashingTF(
        inputCol="shingles", outputCol="features", numFeatures=num_features, binary=True
    )
    return tf.transform(ngram.transform(tokenizer.transform(docs)))


def mllib_minhash_pairs(
    spark: SparkSession, sf_dir: str, threshold: float = 0.5
) -> DataFrame:
    """MinHashLSH approxSimilarityJoin over binary shingle-set vectors
    (``threshold`` is Jaccard DISTANCE: 0.5 → similarity ≥ 0.5)."""
    feats = _doc_features(spark, sf_dir).filter(
        F.expr("size(shingles)") > 0
    )
    mh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=42)
    model = mh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, threshold, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round(1.0 - F.col("jaccard_dist"), 4).alias("jaccard"),
        )
    )


def mllib_minhash_certified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract surface for D12's MinHashLSH: a tolerance-boolean summary
    against the EXACT shingle-Jaccard pair SQL (ngram_jaccard_pairs).

    MLlib's pair set is a superset of the exact one: HashingTF folds
    shingles into 2^18 buckets, so collisions can only RAISE a pair's
    measured Jaccard (binary-vector sets shrink), never lower it —
    which makes "every exact pair found" the invariant the hashed
    pipeline actually guarantees, and the extras expected behavior, not
    noise.  The row carries the exact pair count as the hash-compared
    anchor plus that recall boolean; the raw pair list stays available
    via mllib_minhash_pairs for tests."""
    from fiveg_spark.operators.dedup import _ngram_jaccard_sql
    from fiveg_spark.plans.registry import ensure_views

    ensure_views(spark, ("documents",), sf_dir)
    exact = spark.sql(_ngram_jaccard_sql("spark")).select("doc_a", "doc_b")
    mllib = mllib_minhash_pairs(spark, sf_dir).select("doc_a", "doc_b")
    found = exact.join(mllib, ["doc_a", "doc_b"])
    return (
        exact.agg(F.count("*").alias("n_exact_pairs"))
        .crossJoin(found.agg(F.count("*").alias("n_found")))
        .select(
            "n_exact_pairs",
            (F.col("n_found") == F.col("n_exact_pairs")).alias("exact_recall_ok"),
        )
    )


def _mllib_minhash_oracle() -> str:
    from fiveg_spark.operators.dedup import _ngram_jaccard_sql

    return f"""
    WITH exact AS ({_ngram_jaccard_sql("duckdb")})
    SELECT CAST(count(*) AS BIGINT) AS n_exact_pairs,
           TRUE AS exact_recall_ok
    FROM exact
    """


def mllib_ann_topk(
    spark: SparkSession, sf_dir: str, query_vec_id: int = 0, k: int = 10
) -> DataFrame:
    """BucketedRandomProjectionLSH approximate nearest neighbours."""
    emb = load_table(spark, "embeddings", sf_dir).withColumn(
        "features", array_to_vector(F.col("embedding").cast("array<double>"))
    )
    brp = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        numHashTables=8,
        bucketLength=2.0,
        seed=42,
    )
    model = brp.fit(emb)
    query = emb.filter(F.col("vec_id") == query_vec_id).first()["features"]
    neighbours = model.approxNearestNeighbors(
        emb.filter(F.col("vec_id") != query_vec_id), query, k, distCol="dist"
    )
    return neighbours.select(
        "vec_id", "label", F.round("dist", 4).alias("euclidean_dist")
    )


def pca_explained_variance(spark: SparkSession, sf_dir: str, k: int = 4) -> DataFrame:
    """MLlib PCA over the embeddings: top-k explained-variance ratios.

    The dimensionality-reduction step before ANN at scale (project to
    k ≪ d, prune with cheap low-d distances, re-rank exactly).  The fit
    is a distributed Gramian eigendecomposition; only the k scalar
    ratios come back to the driver.  Deterministic (no seed), pinned
    against numpy's eigendecomposition in pytest.
    """
    from pyspark.ml.feature import PCA

    emb = load_table(spark, "embeddings", sf_dir).withColumn(
        "features", array_to_vector(F.col("embedding").cast("array<double>"))
    )
    model = PCA(k=k, inputCol="features", outputCol="pc").fit(emb)
    rows = [
        (i, round(float(v), 6)) for i, v in enumerate(model.explainedVariance)
    ]
    return spark.createDataFrame(rows, "component int, explained_variance double")


def _isotonic_fit(spark: SparkSession, sf_dir: str):
    """Fit the monotone calibration map (shared by the rows surface and
    ml/certify.isotonic_cert).  Returns (model, scored) where scored
    carries (fc, actual, prediction)."""
    from pyspark.ml.regression import IsotonicRegression

    from fiveg_spark.operators.timeseries import _hourly_cte

    ensure_views(spark, ("events",), sf_dir)
    pairs = spark.sql(
        f"""
        {_hourly_cte("spark")}
        SELECT
          lag(throughput_bps, 24) OVER (PARTITION BY slice ORDER BY h) AS fc,
          throughput_bps AS actual
        FROM hourly
        """
    ).filter(F.col("fc").isNotNull())
    vec = pairs.withColumn("features", array_to_vector(F.array(F.col("fc"))))
    model = IsotonicRegression(
        featuresCol="features", labelCol="actual", isotonic=True
    ).fit(vec)
    return model, model.transform(vec)


def isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D19 — monotone calibration of the 24 h seasonal-naive forecast:
    MLlib IsotonicRegression (distributed pool-adjacent-violators) maps
    raw forecast → calibrated forecast, the post-hoc correction layer a
    quantile forecaster ships with (systematic over/under-forecast by
    level is exactly what a monotone map repairs).  Returns the fitted
    step function (one row per boundary) + before/after MAE so the
    contract row shows whether calibration helped."""
    model, scored = _isotonic_fit(spark, sf_dir)
    mae = scored.agg(
        F.round(F.avg(F.abs(F.col("actual") - F.col("fc"))), 4).alias("mae_raw"),
        F.round(F.avg(F.abs(F.col("actual") - F.col("prediction"))), 4).alias(
            "mae_calibrated"
        ),
    ).head()
    bounds = [float(b) for b in model.boundaries]
    preds = [float(p) for p in model.predictions]
    rows = [
        (i, round(b, 4), round(p, 4), mae["mae_raw"], mae["mae_calibrated"])
        for i, (b, p) in enumerate(zip(bounds, preds))
    ]
    return spark.createDataFrame(
        rows,
        "knot int, fc_boundary double, calibrated double, mae_raw double, mae_calibrated double",
    )


QUERIES = [
    # mllib_linear_baseline / isotonic_calibration /
    # pca_explained_variance contract surfaces moved to ml/certify.py
    # (linear_baseline_cert / isotonic_cert / pca_cert): the driver
    # certifies invariant rows; the raw functions remain pytest-pinned.
    #
    # tolerance-boolean oracle: exact-pair anchor from the shared Jaccard
    # SQL + the recall invariant the hashed pipeline guarantees (see
    # mllib_minhash_certified); raw pair list stays pytest-pinned.
    Query("mllib_minhash_pairs", mllib_minhash_certified, _mllib_minhash_oracle()),
    # BRP ANN contract surface moved to ann_recall.py (mllib_ann_recall):
    # the driver certifies the recall row; the raw top-k stays
    # pytest-pinned (tests/test_mllib.py).
]
