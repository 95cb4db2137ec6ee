"""The lake-format MERGE gate (streaming/incremental.py::merge_upsert)
must upsert correctly on whichever path the substrate supports, and
must REPORT which path ran — the gate is a documented contract, not a
silent fallback."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_orbit_spark.streaming.incremental import merge_upsert


def test_merge_upsert_roundtrip(spark, tmp_path):
    target = str(tmp_path / "state")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, v string"
    )
    path = merge_upsert(spark, target, base, "k")
    assert path in ("delta_merge", "parquet_rewrite")

    batch = spark.createDataFrame([(2, "B2"), (4, "d")], "k int, v string")
    path2 = merge_upsert(spark, target, batch, "k")
    assert path2 == path  # gate decision is stable within a session

    fmt = "delta" if path == "delta_merge" else "parquet"
    got = sorted(
        (r["k"], r["v"]) for r in spark.read.format(fmt).load(target).collect()
    )
    assert got == [(1, "a"), (2, "B2"), (3, "c"), (4, "d")]


def test_merge_upsert_idempotent_reapply(spark, tmp_path):
    target = str(tmp_path / "state2")
    batch = spark.createDataFrame([(1, "x"), (2, "y")], "k int, v string")
    merge_upsert(spark, target, batch, "k")
    merge_upsert(spark, target, batch, "k")  # same batch twice
    fmt = (
        "delta"
        if merge_upsert(spark, target, batch.limit(0), "k") == "delta_merge"
        else "parquet"
    )
    df = spark.read.format(fmt).load(target)
    assert df.count() == 2
    assert df.filter(F.col("v").isin("x", "y")).count() == 2
