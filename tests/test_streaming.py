"""Structured Streaming smoke: the streaming face of the windowed
aggregations runs end-to-end with Trigger.AvailableNow over the
events parquet (ST3 batch-incremental execution), and its result
matches the batch face on the same data."""

from __future__ import annotations

import pytest

from project_orbit_spark.catalog import load
from project_orbit_spark.streaming.windows import stream_tumbling_counts, tumbling_counts
from tests.conftest import SF_DIR


@pytest.mark.timeout(180)
def test_stream_tumbling_matches_batch(spark, tmp_path):
    stream_df = stream_tumbling_counts(spark, SF_DIR)
    assert stream_df.isStreaming
    q = (
        stream_df.writeStream.format("memory")
        .queryName("tumbling_smoke")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.sql("select * from tumbling_smoke").collect()
    }
    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in tumbling_counts(load(spark, SF_DIR, "events")).collect()
    }
    assert got == batch
    assert len(got) > 0


@pytest.mark.timeout(240)
def test_stateful_running_totals_stream_matches_batch(spark):
    from project_orbit_spark.streaming.stateful import (
        stateful_running_user_totals,
        stream_running_user_totals,
    )

    stream_df = stream_running_user_totals(spark, SF_DIR)
    assert stream_df.isStreaming
    q = (
        stream_df.writeStream.format("memory")
        .queryName("stateful_smoke")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # update mode may emit several snapshots per user; the LAST one is
    # the final state — with availableNow over one batch there's one.
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.sql("select * from stateful_smoke").collect()
    }
    batch = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in stateful_running_user_totals(spark, SF_DIR).collect()
    }
    assert got == batch
