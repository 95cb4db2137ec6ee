"""Bucketed co-located join: both sides bucketed on the join key →
sort-merge join with ZERO exchanges (the write-once-shuffle-never
pattern for repeated fact-fact joins at scale)."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_orbit_spark.catalog import load
from project_orbit_spark.plans.audit import formatted_plan
from project_orbit_spark.sources.bucketing import bucketed_join, write_bucketed
from tests.conftest import SF_DIR


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    orders = load(spark, SF_DIR, "orders")
    lineitem = load(spark, SF_DIR, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey")

    write_bucketed(orders, "orders_b", "o_orderkey", n_buckets=8, path=str(tmp_path / "ob"))
    write_bucketed(
        lineitem, "lineitem_b", "o_orderkey", n_buckets=8, path=str(tmp_path / "lb")
    )

    joined = bucketed_join(spark, "orders_b", "lineitem_b", "o_orderkey")
    plan = formatted_plan(joined)
    assert "Exchange" not in plan, "bucketed join must not shuffle either side"
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan

    # and it still computes the right thing
    n = joined.count()
    expected = (
        load(spark, SF_DIR, "lineitem")
        .join(load(spark, SF_DIR, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    assert n == expected

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
