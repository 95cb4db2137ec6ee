"""Join family: broadcast theta (substring) joins, as-of/latest-by-key,
anti-join merge, semi-join validation.

Reproduces SURVEY.md §2.3 — the reference does all of these as Python
loops (e.g. seed↔company substring match at
src/structured_extraction_v2.py:1010-1016); here they are declarative
joins Catalyst can plan. The substring theta join MUST broadcast its
small side (risk register §7.1): a non-equi condition otherwise
degenerates to a full cartesian shuffle at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from project_orbit_spark.catalog import load
from project_orbit_spark.registry import register


def seed_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """50-row seed dimension derived from customer (FIXTURES.md):
    company_id slug + synthetic website, mirroring the reference's
    Forbes-AI-50 seed (data/forbes_ai50_seed.json; id derivation at
    src/scraper_v2.py:4133-4145)."""
    c = load(spark, sf_dir, "customer")
    slug = F.lower(F.regexp_replace("c_name", "[^a-zA-Z0-9]", ""))
    return (
        c.filter(F.col("c_custkey") % 30 == 0)
        .select(
            F.col("c_custkey").alias("seed_key"),
            slug.alias("company_id"),
            F.concat(F.lit("https://www."), slug, F.lit(".example.com")).alias("website"),
        )
    )


@register(
    "substring_theta_join",
    tags=("join", "theta", "broadcast"),
    doc="J1 seed↔company non-equi substring join (ref "
    "src/structured_extraction_v2.py:1010-1016): seed matches a "
    "customer when the customer's name-slug appears in the seed "
    "website. Broadcast-nested-loop with the 50-row side broadcast.",
    oracle="""
        WITH seed AS (
          SELECT
            c_custkey AS seed_key,
            lower(regexp_replace(c_name, '[^a-zA-Z0-9]', '', 'g')) AS company_id,
            'https://www.' || lower(regexp_replace(c_name, '[^a-zA-Z0-9]', '', 'g'))
              || '.example.com' AS website
          FROM customer WHERE c_custkey % 30 = 0
        )
        SELECT
          s.seed_key,
          s.company_id,
          c.c_custkey,
          c.c_name
        FROM seed s
        JOIN customer c
          ON contains(s.website, lower(regexp_replace(c.c_name, '[^a-zA-Z0-9]', '', 'g')))
        ORDER BY s.seed_key, c.c_custkey
    """,
)
def substring_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    seed = seed_dim(spark, sf_dir)
    c = load(spark, sf_dir, "customer").withColumn(
        "_slug", F.lower(F.regexp_replace("c_name", "[^a-zA-Z0-9]", ""))
    )
    return (
        F.broadcast(seed)
        .join(c, F.col("website").contains(F.col("_slug")))
        .select("seed_key", "company_id", "c_custkey", "c_name")
        .orderBy("seed_key", "c_custkey")
    )


@register(
    "asof_latest_order",
    tags=("join", "asof", "window"),
    doc="J10/W2 as-of latest-by-key (ref src/agents/tools.py:105-153, "
    "dags/orbit_daily_update_dag.py:139-166): most recent order per "
    "customer, deterministic tie-break on orderkey. row_number over "
    "(custkey, orderdate desc) — a shuffle on custkey, no join.",
    oracle="""
        SELECT c_custkey, c_name, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               round(o_totalprice, 2) AS totalprice
        FROM (
          SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
                 row_number() OVER (
                   PARTITION BY c.c_custkey
                   ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
          FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        ) t
        WHERE rn = 1
        ORDER BY c_custkey
    """,
)
def asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("c_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
        )
        .orderBy("c_custkey")
    )


@register(
    "anti_join_no_orders",
    tags=("join", "anti"),
    doc="J5 preloaded⟂extracted anti-join merge semantics (ref "
    "src/scraper_v2.py:3791-3805): customers with no 2001+ orders. "
    "left_anti — at scale a broadcast/shuffled hash anti join.",
    oracle="""
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer c
        WHERE NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
        ORDER BY c_custkey
    """,
)
def anti_join_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01 00:00:00").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


@register(
    "semi_join_returned_orders",
    tags=("join", "semi"),
    doc="J7 events↔timeline semi-join validation semantics (ref "
    "src/structured_extraction_v2.py:2890-2977): orders having at "
    "least one returned lineitem. left_semi hash join.",
    oracle="""
        SELECT o.o_orderkey, o.o_orderstatus, round(o.o_totalprice, 2) AS totalprice
        FROM orders o
        WHERE EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
        ORDER BY o.o_orderkey
    """,
)
def semi_join_returned_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.round("o_totalprice", 2).alias("totalprice"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "payload_order_counts",
    tags=("join", "agg"),
    doc="J8 payload-assembly shape (ref "
    "src/structured_extraction_v2.py:3484-3494): company left-joined "
    "to aggregated children; scalar projection of the nested arrays "
    "(sizes + extrema) for a hash-stable oracle.",
    oracle="""
        SELECT
          c.c_custkey,
          c.c_name,
          count(o.o_orderkey)                       AS n_orders,
          coalesce(round(sum(o.o_totalprice), 2), 0.0) AS lifetime_value,
          min(o.o_orderkey)                         AS first_orderkey,
          max(o.o_orderkey)                         AS last_orderkey
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_name
        ORDER BY c.c_custkey
    """,
)
def payload_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.round(F.sum("o_totalprice"), 2), F.lit(0.0)).alias(
                "lifetime_value"
            ),
            F.min("o_orderkey").alias("first_orderkey"),
            F.max("o_orderkey").alias("last_orderkey"),
        )
        .orderBy("c_custkey")
    )


@register(
    "name_lookup_first_match",
    tags=("join", "lookup"),
    doc="J2 name→id lookup (ref src/api.py:242-274): case-insensitive "
    "equality on company name, FIRST match wins (deterministic via "
    "lowest custkey). Query names derived by upper-casing a sample.",
    oracle="""
        WITH lookups AS (
          SELECT upper(c_name) AS query_name FROM customer WHERE c_custkey % 25 = 0
        )
        SELECT query_name, c_custkey AS resolved_id, c_name AS resolved_name
        FROM (
          SELECT l.query_name, c.c_custkey, c.c_name,
                 row_number() OVER (
                   PARTITION BY l.query_name ORDER BY c.c_custkey) AS rn
          FROM lookups l
          JOIN customer c ON lower(c.c_name) = lower(l.query_name)
        ) t
        WHERE rn = 1
        ORDER BY query_name
    """,
)
def name_lookup_first_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    lookups = c.filter(F.col("c_custkey") % 25 == 0).select(
        F.upper("c_name").alias("query_name")
    )
    joined = F.broadcast(lookups).join(
        c, F.lower(c.c_name) == F.lower(F.col("query_name"))
    )
    w = Window.partitionBy("query_name").orderBy("c_custkey")
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "query_name",
            F.col("c_custkey").alias("resolved_id"),
            F.col("c_name").alias("resolved_name"),
        )
        .orderBy("query_name")
    )


@register(
    "funding_summary_max_by",
    tags=("agg", "maxby"),
    doc="A1 funding summary (ref src/structured_extraction_v2.py:"
    "1984-2001): total raised (NULL when zero orders) plus latest "
    "round's attribute via max_by over a composite (epoch*1e6+key) "
    "ordering key — the exact latest-round-carrying primitive.",
    oracle="""
        SELECT c.c_custkey,
               round(sum(o.o_totalprice), 2) AS total_raised,
               arg_max(o.o_orderpriority,
                       datediff('day', DATE '1970-01-01', o.o_orderdate) * 1000000
                         + o.o_orderkey) AS latest_priority,
               arg_max(o.o_orderkey,
                       datediff('day', DATE '1970-01-01', o.o_orderdate) * 1000000
                         + o.o_orderkey) AS latest_orderkey
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
        ORDER BY c.c_custkey
    """,
)
def funding_summary_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    # timezone-free composite ordering key: days-since-epoch ×1e6 + key
    # (orderkey < 1e6 at fixture scales; ties on date break by key)
    order_rank = (
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        * 1000000
        + F.col("o_orderkey")
    )
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_raised"),
            F.max_by("o_orderpriority", order_rank).alias("latest_priority"),
            F.max_by("o_orderkey", order_rank).alias("latest_orderkey"),
        )
        .orderBy("c_custkey")
    )


@register(
    "fuzzy_translate_join",
    tags=("join", "theta"),
    doc="J3 fuzzy blog-post↔metadata join (ref src/structured_"
    "extraction_v2.py:966-975): post slug with '-' separators matched "
    "into page URLs with '_' separators via translate-then-contains — "
    "a broadcast-nested-loop theta join on normalized keys.",
    oracle="""
        WITH posts AS (
          SELECT c_custkey AS post_key,
                 'post-' || CAST(c_custkey AS VARCHAR) || '-launch' AS post_id
          FROM customer WHERE c_custkey % 40 = 0
        ),
        pages AS (
          SELECT c_custkey AS page_key,
                 'https://x.com/blog/post_' || CAST(c_custkey AS VARCHAR)
                 || '_launch?ref=rss' AS page_url
          FROM customer WHERE c_custkey % 20 = 0
        )
        SELECT p.post_key, p.post_id, g.page_key, g.page_url
        FROM posts p
        JOIN pages g
          ON contains(replace(g.page_url, '-', '_'), replace(p.post_id, '-', '_'))
        ORDER BY p.post_key, g.page_key
    """,
)
def fuzzy_translate_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    posts = c.filter(F.col("c_custkey") % 40 == 0).select(
        F.col("c_custkey").alias("post_key"),
        F.concat(
            F.lit("post-"), F.col("c_custkey").cast("string"), F.lit("-launch")
        ).alias("post_id"),
    )
    pages = c.filter(F.col("c_custkey") % 20 == 0).select(
        F.col("c_custkey").alias("page_key"),
        F.concat(
            F.lit("https://x.com/blog/post_"),
            F.col("c_custkey").cast("string"),
            F.lit("_launch?ref=rss"),
        ).alias("page_url"),
    )
    return (
        F.broadcast(posts)
        .join(
            pages,
            F.translate("page_url", "-", "_").contains(
                F.translate("post_id", "-", "_")
            ),
        )
        .select("post_key", "post_id", "page_key", "page_url")
        .orderBy("post_key", "page_key")
    )


@register(
    "asof_event_join",
    tags=("join", "asof", "timeseries"),
    doc="True time-series ASOF join (generalizes J10 beyond latest-by-"
    "key): for every purchase event, the user's most recent signup at "
    "or before it. Spark face = the distributed ASOF pattern (tagged "
    "union + last-ignorenulls carry-forward window — one shuffle on "
    "user, no join node at all); oracle = DuckDB's native ASOF JOIN. "
    "The right side is deduped per (user, ts) first so tie handling "
    "is pinned in both engines.",
    oracle="""
        WITH purchases AS (
          SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
        ),
        signups AS (
          SELECT user_id, ts, max(event_id) AS event_id
          FROM events WHERE event_type = 'signup'
          GROUP BY user_id, ts
        )
        SELECT p.event_id AS purchase_id,
               p.user_id,
               strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
               s.event_id AS signup_id,
               CAST(floor(epoch(p.ts)) - floor(epoch(s.ts)) AS BIGINT) AS gap_seconds
        FROM purchases p
        ASOF LEFT JOIN signups s ON p.user_id = s.user_id AND p.ts >= s.ts
        ORDER BY purchase_id
    """,
)
def asof_event_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from project_orbit_spark.catalog import load as _load

    ev = _load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("event_id"))
    )
    # tagged union: signup rows sort BEFORE purchase rows at equal ts
    # (is_signup desc), so "at or before" includes same-instant signups
    tagged = purchases.select(
        "user_id",
        "ts",
        F.col("event_id").alias("purchase_id"),
        F.lit(None).cast("long").alias("signup_id"),
        F.lit(0).alias("is_signup"),
    ).unionByName(
        signups.select(
            "user_id",
            "ts",
            F.lit(None).cast("long").alias("purchase_id"),
            F.col("event_id").alias("signup_id"),
            F.lit(1).alias("is_signup"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.desc("is_signup"), F.asc("signup_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.withColumn(
        "last_signup_id", F.last("signup_id", ignorenulls=True).over(w)
    ).withColumn(
        "last_signup_ts",
        F.last(F.when(F.col("is_signup") == 1, F.col("ts")), ignorenulls=True).over(w),
    )
    return (
        carried.filter(F.col("purchase_id").isNotNull())
        .select(
            "purchase_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
            F.col("last_signup_id").alias("signup_id"),
            (
                F.unix_timestamp("ts") - F.unix_timestamp("last_signup_ts")
            ).alias("gap_seconds"),
        )
        .orderBy("purchase_id")
    )
