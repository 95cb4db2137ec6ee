"""Behavioral analytics over the events stream: ordered funnels and
cohort retention — the OLAP workloads an events table exists to answer.

The reference aggregates event counts per type/day
(src/structured_extraction_v2.py:3172-3194); these operators add the
ORDER-sensitive layer: a funnel step only counts if it happens after
the previous step (min-after-min chaining), and retention buckets
users by their first-seen day.

Scale notes: every stage shuffles on user_id only (bucketing the
events table by user_id makes all of them exchange-free); the funnel
is three chained per-user aggregates, never a self-join of events
against events; retention is two aggregates (first-seen + activity)
joined on the user spine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_orbit_spark.catalog import load
from project_orbit_spark.registry import register

TS_FMT = "yyyy-MM-dd HH:mm:ss"


@register(
    "event_funnel_conversion",
    bench=True,
    tags=("events", "funnel", "behavior"),
    doc="Ordered 3-step funnel view → click → purchase per user: each "
    "step's timestamp is the FIRST qualifying event strictly after "
    "the previous step (min-after-min chaining, not independent "
    "minima — a click before the first view does not count). Emits "
    "per-user step timestamps, the furthest stage reached, and "
    "view→purchase seconds for full conversions. Three chained "
    "aggregates on user_id; no event-vs-event self-join.",
    oracle="""
        WITH s1 AS (
          SELECT user_id, min(ts) AS t_view
          FROM events WHERE event_type = 'view' GROUP BY user_id
        ),
        s2 AS (
          SELECT e.user_id, min(e.ts) AS t_click
          FROM events e JOIN s1 USING (user_id)
          WHERE e.event_type = 'click' AND e.ts > s1.t_view
          GROUP BY e.user_id
        ),
        s3 AS (
          SELECT e.user_id, min(e.ts) AS t_purchase
          FROM events e JOIN s2 USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > s2.t_click
          GROUP BY e.user_id
        )
        SELECT u.user_id,
               strftime(s1.t_view, '%Y-%m-%d %H:%M:%S') AS t_view,
               strftime(s2.t_click, '%Y-%m-%d %H:%M:%S') AS t_click,
               strftime(s3.t_purchase, '%Y-%m-%d %H:%M:%S') AS t_purchase,
               CAST(CASE WHEN s3.user_id IS NOT NULL THEN 3
                         WHEN s2.user_id IS NOT NULL THEN 2
                         WHEN s1.user_id IS NOT NULL THEN 1
                         ELSE 0 END AS BIGINT) AS stage_reached,
               CAST(CASE WHEN s3.user_id IS NOT NULL
                    THEN floor(epoch(s3.t_purchase)) - floor(epoch(s1.t_view))
                    END AS BIGINT)
                 AS convert_secs
        FROM (SELECT DISTINCT user_id FROM events) u
        LEFT JOIN s1 USING (user_id)
        LEFT JOIN s2 USING (user_id)
        LEFT JOIN s3 USING (user_id)
        ORDER BY u.user_id
    """,
)
def event_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    users = ev.select("user_id").distinct()
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    stage = (
        F.when(F.col("t_purchase").isNotNull(), 3)
        .when(F.col("t_click").isNotNull(), 2)
        .when(F.col("t_view").isNotNull(), 1)
        .otherwise(0)
    )
    return (
        users.join(s1, "user_id", "left")
        .join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select(
            "user_id",
            F.date_format("t_view", TS_FMT).alias("t_view"),
            F.date_format("t_click", TS_FMT).alias("t_click"),
            F.date_format("t_purchase", TS_FMT).alias("t_purchase"),
            stage.cast("long").alias("stage_reached"),
            F.when(
                F.col("t_purchase").isNotNull(),
                F.unix_timestamp("t_purchase") - F.unix_timestamp("t_view"),
            )
            .cast("long")
            .alias("convert_secs"),
        )
        .orderBy("user_id")
    )


@register(
    "user_retention_cohorts",
    tags=("events", "cohort", "behavior"),
    doc="Cohort retention matrix: users bucketed by first-seen day "
    "(their cohort), counted as retained in every later day-offset "
    "they were active. Two aggregates joined on user_id — first-seen "
    "spine broadcast back over activity — then one groupBy on "
    "(cohort_day, day_offset). The denominator (cohort size) rides "
    "along so retention rate is auditable from the same row.",
    oracle="""
        WITH first_seen AS (
          SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
          FROM events GROUP BY user_id
        ),
        activity AS (
          SELECT DISTINCT e.user_id, f.cohort_day,
                 datediff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset
          FROM events e JOIN first_seen f USING (user_id)
        ),
        sizes AS (
          SELECT cohort_day, count(*) AS cohort_size
          FROM first_seen GROUP BY cohort_day
        )
        SELECT strftime(a.cohort_day, '%Y-%m-%d') AS cohort_day,
               CAST(a.day_offset AS BIGINT) AS day_offset,
               count(*) AS n_active,
               s.cohort_size,
               round(count(*) / CAST(s.cohort_size AS DOUBLE), 4) AS retention
        FROM activity a JOIN sizes s USING (cohort_day)
        GROUP BY a.cohort_day, a.day_offset, s.cohort_size
        ORDER BY cohort_day, day_offset
    """,
)
def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("day")
    )
    first_seen = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    sizes = first_seen.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    activity = (
        ev.join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff("day", F.col("cohort_day")).alias("day_offset"),
        )
        .distinct()
    )
    return (
        activity.join(sizes, "cohort_day")
        .groupBy("cohort_day", "day_offset", "cohort_size")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.col("day_offset").cast("long").alias("day_offset"),
            "n_active",
            "cohort_size",
            F.round(F.col("n_active") / F.col("cohort_size"), 4).alias("retention"),
        )
        .orderBy("cohort_day", "day_offset")
    )
