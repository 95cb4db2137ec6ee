"""Parquet catalog over the testdata star schema + corpus tables.

Tables (see /root/repo/TESTDATA.md): region nation customer supplier
part orders lineitem events documents embeddings. At 100 TB these
would be partitioned/bucketed lake tables; the loaders keep the scan
declarative so Catalyst retains predicate pushdown + column pruning.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Dimension tables small enough to always broadcast in joins, even at
# 100 TB fact scale (mirrors the reference's 50-row seed dimension,
# reference: data/forbes_ai50_seed.json, src/scraper_v2.py:4133-4145).
BROADCAST_DIMS = frozenset({"region", "nation", "supplier", "part"})


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame (lazy parquet scan).

    ``events.ts`` is physically TIMESTAMP(NANOS), which Spark's
    parquet reader rejects; read it as raw nanos (legacy conf) and
    convert to a microsecond TIMESTAMP column — semantics preserved,
    sub-microsecond precision documented as truncated.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # timestamp_micros yields an LTZ timestamp rendered through the
        # session timezone; pin it to UTC so window/date strings match
        # the (timezone-naive) parquet values in any driver session
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(path)
        return df.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        )
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every table; handy for registering temp views."""
    return {name: load(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views for spark.sql usage."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
