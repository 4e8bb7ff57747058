"""Salted join: result identity with the plain join + salt spread."""

from __future__ import annotations

from pyspark.sql import functions as F

from fiveg_spark.plans.skew import salted_join


def _skewed_frames(spark):
    # 90% of big rows share key 'hot'
    big = spark.createDataFrame(
        [(i, "hot" if i % 10 else f"k{i}", i * 1.0) for i in range(1000)],
        "row_id BIGINT, k STRING, v DOUBLE",
    )
    small = spark.createDataFrame(
        [("hot", 1), ("k10", 2), ("k20", 3), ("absent", 4)], "k STRING, dim INT"
    )
    return big, small


def test_salted_join_matches_plain_inner(spark):
    big, small = _skewed_frames(spark)
    plain = big.join(small, "k").select("row_id", "k", "v", "dim")
    salted = salted_join(big, small, on="k", salt_from="row_id").select(
        "row_id", "k", "v", "dim"
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_left_preserves_unmatched(spark):
    big, small = _skewed_frames(spark)
    plain = big.join(small, "k", "left").select("row_id", "dim")
    salted = salted_join(big, small, on="k", salt_from="row_id", how="left").select(
        "row_id", "dim"
    )
    assert sorted(map(tuple, salted.collect()), key=repr) == sorted(
        map(tuple, plain.collect()), key=repr
    )


def test_salt_actually_spreads_hot_key(spark):
    big, small = _skewed_frames(spark)
    salted = big.withColumn("_salt", F.pmod(F.hash(F.col("row_id")), F.lit(8)))
    spread = (
        salted.filter(F.col("k") == "hot").groupBy("_salt").count().collect()
    )
    assert len(spread) == 8  # hot key present in every salt bucket
    counts = [r["count"] for r in spread]
    assert max(counts) < 2 * min(counts)  # roughly even
