"""Window-function family: per-group top-k, running char budget,
latest-by-key, lead/lag pairing.

Reproduces SURVEY.md §2.5 — the reference's top-k retrieval slice
(W1, src/services/embeddings.py:204-235), running snippet budget
(W4, src/structured_extraction_v2.py:1281-1323), and head slices
(W3). All are single-shuffle window plans; the rank filter pushes
the per-group LIMIT into the window operator at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from project_orbit_spark.catalog import load
from project_orbit_spark.registry import register


def topk_per_group(df: DataFrame, part_cols: list, order_cols: list, k: int) -> DataFrame:
    """Generic W1 primitive: row_number ≤ k per group with a fully
    deterministic ordering (caller supplies the tie-break)."""
    w = Window.partitionBy(*part_cols).orderBy(*order_cols)
    return df.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= k
    )


@register(
    "topk_orders_per_priority",
    tags=("window", "topk"),
    doc="W1/W3 per-group top-k (ref src/rag_pipeline.py:45-75 top_k "
    "slice): top-3 orders by totalprice within each orderpriority, "
    "tie-break on orderkey.",
    oracle="""
        SELECT o_orderpriority, rank, o_orderkey, round(o_totalprice, 2) AS totalprice
        FROM (
          SELECT o_orderpriority, o_orderkey, o_totalprice,
                 row_number() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey) AS rank
          FROM orders
        ) t
        WHERE rank <= 3
        ORDER BY o_orderpriority, rank
    """,
)
def topk_orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        topk_per_group(
            o, ["o_orderpriority"], [F.desc("o_totalprice"), F.asc("o_orderkey")], 3
        )
        .select(
            "o_orderpriority",
            "rank",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
        )
        .orderBy("o_orderpriority", "rank")
    )


@register(
    "running_char_budget",
    tags=("window", "frame"),
    doc="W4 running char budget (ref "
    "src/structured_extraction_v2.py:1281-1323): accumulate document "
    "chars per (lang, source) in doc_id order, keep rows while the "
    "running total stays ≤ 1500 — rows-unbounded-preceding frame.",
    oracle="""
        SELECT lang, source, doc_id, n_chars, running_chars
        FROM (
          SELECT lang, source, doc_id, n_chars,
                 CAST(sum(n_chars) OVER (
                   PARTITION BY lang, source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS running_chars
          FROM documents
        ) t
        WHERE running_chars <= 1500
        ORDER BY lang, source, doc_id
    """,
)
def running_char_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("lang", "source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.withColumn("running_chars", F.sum("n_chars").over(w))
        .filter(F.col("running_chars") <= 1500)
        .select("lang", "source", "doc_id", "n_chars", "running_chars")
        .orderBy("lang", "source", "doc_id")
    )


@register(
    "order_gap_leadlag",
    tags=("window", "leadlag"),
    doc="C11 line-pairing semantics via lead/lag (ref press-release "
    "parser src/structured_extraction_v2.py:1220-1255): per customer, "
    "days between consecutive orders.",
    oracle="""
        SELECT o_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               datediff('day', prev_date, o_orderdate) AS gap_days
        FROM (
          SELECT o_custkey, o_orderkey, o_orderdate,
                 lag(o_orderdate) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey) AS prev_date
          FROM orders
        ) t
        WHERE prev_date IS NOT NULL
        ORDER BY o_custkey, o_orderkey
    """,
)
def order_gap_leadlag(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("prev_date", F.lag("o_orderdate").over(w))
        .filter(F.col("prev_date").isNotNull())
        .select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.datediff(
                F.col("o_orderdate").cast("date"), F.col("prev_date").cast("date")
            )
            .cast("long")
            .alias("gap_days"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "rolling_30d_revenue",
    tags=("window", "range-frame"),
    doc="Rolling 30-day revenue per customer — RANGE BETWEEN INTERVAL "
    "frame (time-based, not row-based: the frame holds every order in "
    "the trailing 30 days regardless of count). Complements the "
    "ROWS-frame queries; sampled to 1-in-5 customers.",
    oracle="""
        SELECT o_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               round(sum(o_totalprice) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW), 2)
                 AS rolling_30d,
               CAST(count(*) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS n_in_window
        FROM orders
        WHERE o_custkey % 5 = 0
        ORDER BY o_custkey, o_orderkey
    """,
)
def rolling_30d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") % 5 == 0)
    # RANGE frame over seconds-since-epoch: 30 days = 2,592,000 s.
    # (Spark's rangeBetween needs a numeric ordering key; DuckDB takes
    # the INTERVAL form directly — same frame semantics.)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-30 * 24 * 3600, 0)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round(F.sum("o_totalprice").over(w), 2).alias("rolling_30d"),
            F.count(F.lit(1)).over(w).cast("long").alias("n_in_window"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "rank_family_quartiles",
    tags=("window", "rank"),
    doc="Rank-function family completeness: ntile quartiles, "
    "percent_rank and cume_dist over customer balances per segment "
    "(deterministic tie-break on custkey baked into the ordering).",
    oracle="""
        SELECT c_mktsegment, c_custkey,
               CAST(ntile(4) OVER w AS BIGINT) AS quartile,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cume
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        ORDER BY c_mktsegment, c_custkey
    """,
)
def rank_family_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_mktsegment",
        "c_custkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    ).orderBy("c_mktsegment", "c_custkey")
