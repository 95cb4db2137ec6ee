"""Sketch-based approximate aggregation — the 100 TB tier where exact
distinct counts and percentiles stop being affordable.

These are the two operators whose results are *legitimately*
non-deterministic across engines (HLL++ and KLL/GK sketches), so they
are registered WITHOUT DuckDB oracles — the driver records the weaker
rows-only check, and tests/test_sketches.py bounds the error against
the exact answer instead (3×rsd relative for every HLL++ column; 2%
relative value error for approx_percentile at accuracy 10k).

Scale notes: both are single-pass, mergeable, fixed-memory aggregates
— partial sketches merge at the reducer, so they shuffle O(sketch)
bytes per group instead of O(distinct values).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_orbit_spark.catalog import load
from project_orbit_spark.registry import register


@register(
    "approx_distinct_sketch",
    tags=("agg", "sketch", "approx"),
    doc="HLL++ approximate distinct counts per event_type (users, "
    "days, prop values) — rows-only check by design; every column's "
    "error bounded vs exact (3×rsd) in tests/test_sketches.py.",
)
def approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.approx_count_distinct(F.date_format("ts", "yyyy-MM-dd")).alias("approx_days"),
            F.approx_count_distinct(F.get_json_object("props", "$.k")).alias(
                "approx_prop_values"
            ),
        )
        .orderBy("event_type")
    )


@register(
    "approx_percentile_sketch",
    tags=("agg", "sketch", "approx"),
    doc="Sketch-based percentiles over order values per status — the "
    "scale path of order_value_percentiles (exact twin has the "
    "oracle); rows-only check, error bounded vs exact in tests.",
)
def approx_percentile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.percentile_approx("o_totalprice", [0.5, 0.9, 0.99], 10000).alias("pcts")
        )
        .select(
            "o_orderstatus",
            F.round(F.element_at("pcts", 1), 2).alias("ap50"),
            F.round(F.element_at("pcts", 2), 2).alias("ap90"),
            F.round(F.element_at("pcts", 3), 2).alias("ap99"),
        )
        .orderBy("o_orderstatus")
    )
