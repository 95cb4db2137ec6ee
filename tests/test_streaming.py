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
