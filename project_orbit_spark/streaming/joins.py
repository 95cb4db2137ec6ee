"""Stream-stream interval join — SURVEY.md §2.9 extension.

The reference correlates "what happened just before X" with batch
rescans (30-day recompute loops, src/structured_extraction_v2.py:
3172-3194). Structured Streaming's native answer is the watermarked
stream-stream join with a time-bound condition: each side buffers
only the watermark horizon of state, and the time bounds let Spark
evict rows that can no longer match — the exact semantics, bounded
state, no rescans.

Two faces of one join condition (clicks ⋈ views within the preceding
10 minutes per user):

- batch: DataFrame over ``events`` — DuckDB-oracle-checked
  (``interval_join_click_view``);
- streaming: both sides ``readStream`` + watermark, verified by a
  Trigger.AvailableNow parity test against the batch inner join.

Scale: the join shuffles on user_id (the equi key); the range
condition is a post-filter within each key group, never a cartesian.
Stream state per side ≈ watermark horizon × per-user event rate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_orbit_spark.catalog import load, read_events_stream
from project_orbit_spark.registry import register


def _click_view_sides(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("cts"),
    )
    views = events.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("vts"),
    )
    return clicks, views


_JOIN_COND = (
    "c_user = v_user AND vts >= cts - INTERVAL 10 MINUTES AND vts < cts"
)


@register(
    "interval_join_click_view",
    tags=("streaming", "join", "interval"),
    doc="Interval join, batch face: every click joined to the same "
    "user's views in the preceding 10 minutes — per-click prior-view "
    "count and max prior view id (left join, so view-less clicks "
    "keep a 0 row). Equi key user_id carries the shuffle; the time "
    "bounds are a within-group filter. The streaming face "
    "(stream_click_view_join) is the same condition with watermarks.",
    oracle="""
        WITH clicks AS (
          SELECT event_id AS click_id, user_id, ts AS cts
          FROM events WHERE event_type = 'click'
        ),
        views AS (
          SELECT event_id AS view_id, user_id, ts AS vts
          FROM events WHERE event_type = 'view'
        )
        SELECT c.click_id, c.user_id,
               CAST(count(v.view_id) AS BIGINT) AS n_prior_views,
               max(v.view_id) AS max_view_id
        FROM clicks c
        LEFT JOIN views v
          ON v.user_id = c.user_id
         AND v.vts >= c.cts - INTERVAL 10 MINUTE
         AND v.vts < c.cts
        GROUP BY c.click_id, c.user_id
        ORDER BY click_id
    """,
)
def interval_join_click_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    clicks, views = _click_view_sides(load(spark, sf_dir, "events"))
    # shuffle_hash pin (r15, VERDICT r14 ask #6 follow-through): the
    # r14 100x probe left this ratio unexplained; reading the plan
    # showed the static planner BROADCAST-building the views side —
    # an EVENTS-derived, fact-scale frame (the ngram_jaccard_pairs
    # OOM class; it only fit because the fixture's view slice is
    # small). The hint pins the register-site contract the docstring
    # already claimed: user_id carries a shuffle join, time bounds
    # filter within each key group.
    joined = clicks.join(views.hint("shuffle_hash"), F.expr(_JOIN_COND), "left")
    return (
        joined.groupBy("click_id", F.col("c_user").alias("user_id"))
        .agg(
            F.count("view_id").cast("long").alias("n_prior_views"),
            F.max("view_id").alias("max_view_id"),
        )
        .orderBy("click_id")
    )


def stream_click_view_join(
    spark: SparkSession, sf_dir: str, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming face: watermarked stream-stream INNER interval join
    (inner, because stream-stream outer joins emit null matches only
    after watermark expiry — availableNow's single batch would
    under-report them; the batch face owns the outer semantics)."""
    stream = read_events_stream(spark, sf_dir)
    clicks, views = _click_view_sides(stream)
    return clicks.withWatermark("cts", watermark).join(
        views.withWatermark("vts", watermark), F.expr(_JOIN_COND)
    )


# ---------------------------------------------------------------------------
# Stream-static enrichment join

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def enrich_with_segment(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Shared plan: event rows enriched with the customer's market
    segment (stream-static join — the static side is re-broadcast per
    micro-batch, no state, no watermark; the streaming counterpart of
    a dim join)."""
    dim = customer.select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("mktsegment")
    )
    # customer SCALES with the star (unlike region/nation), so the
    # static side is size-GATED, not force-broadcast (round-13
    # broadcast audit — same policy as q10/q18/q22's gated customer
    # builds). The probe counts the BATCH-side dim once at stream
    # definition (the static side is a batch DataFrame even under a
    # streaming `events`); past the bound the stream-static join runs
    # as a per-micro-batch shuffle, the correct plan for a dim that
    # big.
    from project_orbit_spark.catalog import maybe_broadcast

    return events.join(maybe_broadcast(dim, 1_000_000), "user_id").select(
        "event_id",
        F.date_format("ts", TS_FMT).alias("ts_s"),
        "user_id",
        "event_type",
        "mktsegment",
    )


def stream_enrich_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming face: readStream events ⋈ static customer dim."""
    stream = read_events_stream(spark, sf_dir)
    return enrich_with_segment(stream, load(spark, sf_dir, "customer"))


@register(
    "stream_enrich_events",
    tags=("streaming", "join"),
    doc="Stream-static enrichment join: events ⋈ customer dim on "
    "user_id, carrying the market segment onto each event. Batch "
    "face oracle-checked; stream face (stream_enrich_events fn) is "
    "stateless per micro-batch — the dim is broadcast, no watermark "
    "needed — AvailableNow parity test in tests/test_streaming.py.",
    oracle="""
        SELECT e.event_id,
               strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
               e.user_id, e.event_type,
               c.c_mktsegment AS mktsegment
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        ORDER BY e.event_id
    """,
)
def stream_enrich_events_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return enrich_with_segment(ev, load(spark, sf_dir, "customer")).orderBy("event_id")
