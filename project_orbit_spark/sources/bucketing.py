"""Bucketed tables: shuffle-free co-located joins — the SURVEY §7
'pre-partitioning/bucketing for co-located joins' scale pattern.

At 100 TB the orders⋈lineitem join dominates shuffle volume; writing
both bucketed (+sorted) on the join key lets Spark plan a sort-merge
join with NO Exchange on either side — the shuffle happens once at
write time and is amortized over every subsequent join. Verified by
plan assertion in tests/test_bucketing.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 16,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) table; pass
    ``path`` for an external table (warehouse.dir is a static conf
    and can't be redirected on a live session)."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, key: str) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — Catalyst
    recognizes the matching hash-distribution and elides both
    exchanges. MERGE-hinted so small test fixtures don't fall back to
    broadcast (which would mask the property being demonstrated; at
    fact-fact scale SMJ is what the planner picks anyway)."""
    return (
        spark.table(left_table).hint("merge").join(spark.table(right_table), key)
    )
