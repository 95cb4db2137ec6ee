"""Driver-contract smoke tests for __spark_entry__.py."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_queries_and_oracles_align(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert qs, "no queries registered"
    assert set(oracles) <= set(qs), "oracle without a query"


def test_library_primitives(spark):
    """Unit checks on library-level primitives (chunker, money, slug)."""
    from pyspark.sql import functions as F

    from project_orbit_spark.functions.textbank import chunk_text, parse_money, slugify

    df = spark.createDataFrame(
        [("abcdefghij" * 25,)], ["text"]
    )  # 250 chars -> 3 chunks of 100
    chunks = df.select(F.explode(chunk_text(F.col("text"), 100)).alias("c")).collect()
    assert len(chunks) == 3
    assert chunks[0]["c"]["chunk_text"] == "abcdefghij" * 10
    assert len(chunks[2]["c"]["chunk_text"]) == 50

    m = spark.createDataFrame(
        [("$5.5B",), ("$10M",), ("$100K",), ("$42",)], ["s"]
    ).select(parse_money(F.col("s")).alias("v")).collect()
    assert [r["v"] for r in m] == [5.5e9, 1e7, 1e5, 42.0]

    s = spark.createDataFrame([("Hello, World! 2024 Launch",)], ["s"]).select(
        slugify(F.col("s")).alias("v")
    ).collect()
    assert s[0]["v"] == "hello_world_2024_launch"
