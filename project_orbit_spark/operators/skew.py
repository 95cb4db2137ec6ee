"""Skew mitigation: salted joins — SURVEY.md §4 physical-execution
notes ("skewed keys hurt; salting or AQE skew-join").

AQE splits skewed *shuffle* partitions automatically, but a join
where one key dominates still funnels that key through one task pair.
Salting rewrites `fact ⋈ dim ON k` as
`fact(+salt) ⋈ dim(×salts) ON (k, salt)` — the hot key fans out over
n_salts tasks. Results are identical to the unsalted join, which is
exactly what the oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_orbit_spark.catalog import load
from project_orbit_spark.registry import register


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join with the fact side salted deterministically (hash of the
    whole fact row's key + a row-stable column is unnecessary — any
    per-row spread works; xxhash64 of all columns keeps it
    deterministic) and the dim side replicated n_salts times."""
    fact_s = fact.withColumn("_salt", F.pmod(F.xxhash64(*fact.columns), F.lit(n_salts)))
    dim_s = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>"))
    )
    out = fact_s.join(dim_s, [key, "_salt"], how)
    return out.drop("_salt")


@register(
    "salted_skew_join",
    bench=True,
    tags=("join", "skew"),
    doc="Salted join over an artificially skewed key (half of all "
    "orders funneled onto one hot key): fact side salted by xxhash64, "
    "dim side replicated ×8, join on (key, salt). The oracle is the "
    "PLAIN join — salting must be semantically invisible.",
    oracle="""
        WITH skewed AS (
          SELECT o_orderkey,
                 CASE WHEN o_custkey % 10 < 5 THEN 0 ELSE o_custkey END AS skew_key,
                 o_totalprice
          FROM orders
        ),
        dim AS (
          SELECT c_custkey AS skew_key, c_mktsegment FROM customer
        )
        SELECT d.c_mktsegment AS mktsegment,
               count(*) AS n_rows,
               round(sum(s.o_totalprice), 2) AS total_price
        FROM skewed s JOIN dim d USING (skew_key)
        GROUP BY d.c_mktsegment
        ORDER BY mktsegment
    """,
)
def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_custkey") % 10 < 5, 0).otherwise(F.col("o_custkey")).alias("skew_key"),
        "o_totalprice",
    )
    dim = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("skew_key"), "c_mktsegment"
    )
    joined = salted_join(o, dim, "skew_key", n_salts=8)
    return (
        joined.groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("mktsegment")
    )


@register(
    "key_skew_profile",
    tags=("profiling", "skew", "aggregate"),
    doc="Join-key skew diagnostic: per-key row share and a hot-key "
    "flag (share > 4x the uniform share) for lineitem's suppkey — "
    "the pre-flight that decides between a plain shuffle join, AQE "
    "skew splitting, and salting (salted_skew_join is the "
    "mitigation this detects the need for). Two map-side-partial "
    "aggregates, no wide state.",
    oracle="""
        WITH per_key AS (
          SELECT l_suppkey AS key, count(*) AS n
          FROM lineitem GROUP BY l_suppkey
        ),
        tot AS (SELECT sum(n) AS total, count(*) AS n_keys FROM per_key)
        SELECT p.key, p.n,
               round(p.n * 100.0 / t.total, 4) AS pct_of_rows,
               CAST(p.n * t.n_keys > 4 * t.total AS BOOLEAN) AS hot
        FROM per_key p CROSS JOIN tot t
        ORDER BY p.n DESC, p.key
        LIMIT 25
    """,
)
def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(F.col("l_suppkey").alias("key"))
    per_key = li.groupBy("key").agg(F.count(F.lit(1)).alias("n"))
    tot = per_key.agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("n_keys")
    )
    return (
        per_key.join(F.broadcast(tot))
        .select(
            "key",
            "n",
            F.round(F.col("n") * 100.0 / F.col("total"), 4).alias("pct_of_rows"),
            (F.col("n") * F.col("n_keys") > 4 * F.col("total")).alias("hot"),
        )
        .orderBy(F.desc("n"), "key")
        .limit(25)
    )
