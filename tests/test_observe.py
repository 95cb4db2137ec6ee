"""Observable-metrics tests (plans/audit.py::observed) — pipeline
counters collected as a side effect of the main action, not a second
scan."""

from pyspark.sql import functions as F

from project_orbit_spark.plans.audit import observed


def test_observed_counters_ride_the_main_action(spark):
    df = spark.range(1000).withColumn("v", F.col("id") % 10)
    out, obs = observed(
        df.filter(F.col("v") > 4),
        "stage_metrics",
        F.count(F.lit(1)).alias("rows_out"),
        F.sum("v").alias("v_sum"),
    )
    n = out.count()  # the one action; metrics piggyback on it
    got = obs.get
    assert got["rows_out"] == n == 500
    assert got["v_sum"] == sum(i % 10 for i in range(1000) if i % 10 > 4)
