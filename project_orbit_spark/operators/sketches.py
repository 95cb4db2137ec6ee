"""Sketch-based approximate aggregation — the 100 TB tier where exact
distinct counts and percentiles stop being affordable.

HLL++ and KLL/GK results are *legitimately* engine-specific, so the
raw sketch queries can never hash-match a DuckDB oracle.  Rather than
leave rows-only records on the driver's official record, each raw
sketch query has a driver-visible *audit twin* (``*_audit``) whose
OUTPUT is hash-stable: per-group booleans asserting the sketch value
is within its documented error bound of the exact answer, oracled by
``SELECT group, true`` over the same grouping.  If a sketch drifts
out of bound the boolean flips and the driver records a hash FAIL —
so the audit twins are a *strictly stronger* driver check than the
old rows-only records, on the same code path (they call the raw
query functions directly).  The raw queries stay registered with
``driver=False`` for bench + the local parity suite, and
tests/test_sketches.py keeps the quantitative error-bound tests
(3×rsd relative for every HLL++ column; 2% relative value error for
approx_percentile at accuracy 10k).  ``heavy_hitters_two_pass`` is
the third sketch and carries a FULL oracle: the exact second pass
makes the Misra-Gries candidate stage semantically invisible (see
its docstring).

Scale notes: the HLL++/percentile sketches are single-pass, mergeable,
fixed-memory aggregates — partial sketches merge at the reducer, so
they shuffle O(sketch) bytes per group instead of O(distinct values).
Heavy hitters is two data scans (MG candidates, exact confirm) plus a
column-pruned count(*) for the denominator (footer-metadata cheap on
parquet); folding per-partition row counts into the MG summary would
drop the count scan but make the summary a two-consumer plan that
recomputes pass 1 — the wrong trade.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_orbit_spark.catalog import load
from project_orbit_spark.registry import register


@register(
    "approx_distinct_sketch",
    # bench rotation r14 (VERDICT r13 ask #6): sub-second entry dropped
    # from the headline set in favor of the heavy r13 operators
    driver=False,  # raw HLL values are engine-specific; approx_distinct_audit is the driver face
    tags=("agg", "sketch", "approx"),
    doc="HLL++ approximate distinct counts per event_type (users, "
    "days, prop values) — driver-checked via approx_distinct_audit; "
    "every column's error bounded vs exact (3×rsd) in "
    "tests/test_sketches.py.",
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
    # bench rotation r14 (VERDICT r13 ask #6): dropped from headline set
    driver=False,  # raw KLL/GK values are engine-specific; approx_percentile_audit is the driver face
    tags=("agg", "sketch", "approx"),
    doc="Sketch-based percentiles over order values per status — the "
    "scale path of order_value_percentiles (exact twin has the "
    "oracle); driver-checked via approx_percentile_audit, error "
    "bounded vs exact in tests.",
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


# ---------------------------------------------------------------------------
# Hash-checkable audit twins for the raw sketch queries: per-group
# error-bound booleans.  The Spark side computes BOTH the sketch and
# the exact aggregate and emits "within bound"; the DuckDB oracle
# emits literal TRUE per group — so any sketch column drifting out of
# its documented bound flips a boolean and fails the driver's hash
# compare.  Scale note: each twin is two aggregations over one scan
# joined on the (tiny) group key — the exact side is the AUDIT cost,
# paid only when auditing; the production path is the raw sketch
# query, whose whole point is to avoid the exact shuffle.
# ---------------------------------------------------------------------------

# Bounds mirror tests/test_sketches.py exactly: HLL++ runs at the
# default rsd=0.05, asserted at 3×rsd with an absolute floor of 2 for
# tiny per-group cardinalities; percentile_approx at accuracy 10000,
# asserted at 2% relative (the approx returns a real data value near
# the rank, the exact interpolates).
_HLL_RSD = 0.05
_PCT_REL_ERR = 0.02


def _within(approx_col: str, exact_col, rel: float, floor: float = 0.0):
    tol = F.greatest(F.lit(float(floor)), F.lit(rel) * F.abs(exact_col))
    return F.abs(F.col(approx_col) - exact_col) <= tol


@register(
    "approx_distinct_audit",
    tags=("agg", "sketch", "approx", "audit"),
    doc="Driver-visible audit of approx_distinct_sketch: joins the "
    "HLL++ output against exact countDistinct per event_type and "
    "emits within-bound booleans (|approx-exact| <= max(2, "
    "3*rsd*exact), rsd=0.05). Oracle emits TRUE per group, so an "
    "out-of-bound sketch is a driver hash FAIL, not a rows-only row.",
    oracle="""
        SELECT event_type,
               true AS users_ok, true AS days_ok, true AS props_ok
        FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def approx_distinct_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    approx = approx_distinct_sketch(spark, sf_dir)
    exact = (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.countDistinct(F.date_format("ts", "yyyy-MM-dd")).alias("exact_days"),
            F.countDistinct(F.get_json_object("props", "$.k")).alias("exact_props"),
        )
    )
    bound = 3 * _HLL_RSD
    return (
        approx.join(exact, "event_type")
        .select(
            "event_type",
            _within("approx_users", F.col("exact_users"), bound, 2).alias("users_ok"),
            _within("approx_days", F.col("exact_days"), bound, 2).alias("days_ok"),
            _within("approx_prop_values", F.col("exact_props"), bound, 2).alias(
                "props_ok"
            ),
        )
        .orderBy("event_type")
    )


@register(
    "approx_percentile_audit",
    tags=("agg", "sketch", "approx", "audit"),
    doc="Driver-visible audit of approx_percentile_sketch: joins the "
    "sketch percentiles against exact percentile_cont per order "
    "status and emits within-2%-relative booleans. Oracle emits TRUE "
    "per group, so sketch drift is a driver hash FAIL.",
    oracle="""
        SELECT o_orderstatus,
               true AS p50_ok, true AS p90_ok, true AS p99_ok
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def approx_percentile_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    approx = approx_percentile_sketch(spark, sf_dir)
    exact = (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.percentile("o_totalprice", F.lit(0.5)).alias("p50"),
            F.percentile("o_totalprice", F.lit(0.9)).alias("p90"),
            F.percentile("o_totalprice", F.lit(0.99)).alias("p99"),
        )
    )
    return (
        approx.join(exact, "o_orderstatus")
        .select(
            "o_orderstatus",
            _within("ap50", F.col("p50"), _PCT_REL_ERR, 1e-6).alias("p50_ok"),
            _within("ap90", F.col("p90"), _PCT_REL_ERR, 1e-6).alias("p90_ok"),
            _within("ap99", F.col("p99"), _PCT_REL_ERR, 1e-6).alias("p99_ok"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# Two-pass heavy hitters: Misra-Gries candidates, exact confirmation.
# ---------------------------------------------------------------------------

_MG_CAP = 1024  # summary capacity per partition; must be >= _HH_K
_HH_K = 500  # report items with count > n/K (share > 0.2%)


def make_mg_candidates(cap: int = _MG_CAP):
    """Per-partition Misra-Gries summary over the ``item`` column,
    vectorized batch-wise: exact value_counts per Arrow batch merged
    into the running summary, then the standard mergeable-summaries
    compression (subtract the (cap+1)-th largest weight, drop <=0).
    Any item with partition count > n_p/(cap+1) survives — the
    guarantee the second pass relies on. Returned as a *closure* so
    cloudpickle serializes it by value (workers can't import this
    package; same discipline as multimodal/binary_ops.py)."""
    import pandas as pd  # noqa: PLC0415 — runs on the worker

    def mg_candidates(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = None
        for pdf in batches:
            counts = pdf["item"].value_counts()
            acc = counts if acc is None else acc.add(counts, fill_value=0)
            if len(acc) > cap:
                kth = acc.nlargest(cap + 1).iloc[-1]
                acc = acc - kth
                acc = acc[acc > 0]
        if acc is not None and len(acc):
            yield pd.DataFrame({"item": acc.index.astype(str)})

    return mg_candidates


@register(
    "heavy_hitters_two_pass",
    bench=True,
    tags=("agg", "sketch", "skew"),
    doc="Frequent-item detection without a full-cardinality shuffle — "
    "the classic two-pass heavy hitters. Pass 1 (map-only, zero "
    "shuffle): per-partition Misra-Gries summaries (capacity 1024) "
    "over a derived hot/cold SKU item (the salted_skew_join skew "
    "recipe: every 20th part collapses onto 7 hot ids, the rest stay "
    "unique — so the ~1.9k cold items genuinely overflow the summary "
    "and get pruned). Pass 2: exact counts of the <=cap*P candidate "
    "union only, filtered to count*K > n (K=500). MG guarantees "
    "every item above n/(cap+1) survives some partition summary, and "
    "cap >= K, so the exact pass sees every true heavy hitter and "
    "discards every sketch false positive: the output is IDENTICAL "
    "to the naive GROUP BY ... HAVING — which is exactly what the "
    "oracle runs. At 100 TB the naive plan shuffles one row per "
    "distinct item (trillions); this plan shuffles only candidate "
    "partials, O(cap x partitions).",
    oracle=f"""
        WITH items AS (
          SELECT CASE WHEN l_partkey % 20 = 0
                      THEN 'hot_' || CAST(l_partkey % 7 AS VARCHAR)
                      ELSE 'cold_' || CAST(l_partkey AS VARCHAR) END AS item
          FROM lineitem
        ),
        tot AS (SELECT count(*) AS n FROM items)
        SELECT item, count(*) AS cnt,
               round(1.0 * count(*) / (SELECT n FROM tot), 6) AS share
        FROM items
        GROUP BY item
        HAVING count(*) * {_HH_K} > (SELECT n FROM tot)
        ORDER BY cnt DESC, item
    """,
)
def heavy_hitters_two_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    items = li.select(
        F.when(
            F.col("l_partkey") % 20 == 0,
            F.concat(F.lit("hot_"), (F.col("l_partkey") % 7).cast("string")),
        )
        .otherwise(F.concat(F.lit("cold_"), F.col("l_partkey").cast("string")))
        .alias("item")
    )
    candidates = items.mapInPandas(make_mg_candidates(), "item string").distinct()
    total = items.agg(F.count("*").alias("n"))
    return (
        items.join(F.broadcast(candidates), "item", "left_semi")
        .groupBy("item")
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * _HH_K > F.col("n"))
        .select(
            "item",
            "cnt",
            F.round(F.col("cnt") / F.col("n"), 6).alias("share"),
        )
        .orderBy(F.desc("cnt"), "item")
    )
