"""Bloom-filter semi-join reduction tests (operators/bloom.py)."""

from pyspark.sql import functions as F

from project_orbit_spark.operators.bloom import (
    bloom_might_contain,
    bloom_pruned_join,
    build_key_bloom,
)


def test_no_false_negatives(spark):
    small = spark.range(0, 5000, 7).withColumnRenamed("id", "k")
    bloom = build_key_bloom(small, "k")
    hits = (
        small.join(F.broadcast(bloom))
        .filter(bloom_might_contain(F.col("k"), F.col("bitset")))
        .count()
    )
    assert hits == small.count(), "every build-side key must pass its own filter"


def test_prunes_most_non_members(spark):
    small = spark.range(0, 1000).withColumnRenamed("id", "k")
    big = spark.range(0, 100000).withColumnRenamed("id", "k")
    bloom = build_key_bloom(small, "k")
    passed = (
        big.join(F.broadcast(bloom))
        .filter(bloom_might_contain(F.col("k"), F.col("bitset")))
        .count()
    )
    # 1000 true members; FP rate at m=2^16, n=1000, j=2 is well under 1%
    assert passed >= 1000
    assert passed < 1000 + 0.02 * 99000, f"filter barely pruned: {passed}"


def test_join_result_is_exact(spark):
    small = (
        spark.range(0, 200, 3)
        .withColumnRenamed("id", "k")
        .withColumn("tag", F.concat(F.lit("t"), F.col("k")))
    )
    big = spark.range(0, 5000).withColumnRenamed("id", "k")
    got = sorted(r["k"] for r in bloom_pruned_join(big, small, "k").collect())
    want = sorted(r["k"] for r in big.join(small, "k").collect())
    assert got == want
