"""The events table has shipped in two physical parquet vintages:
TIMESTAMP(NANOS) (readable by Spark only as raw longs under the legacy
nanosAsLong conf) and plain timestamp[us] (read natively as
TIMESTAMP_NTZ). catalog.load / catalog.read_events_stream must
normalize BOTH to the same microsecond TIMESTAMP column — these tests
synthesize each vintage with pyarrow and pin that contract."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from project_orbit_spark.catalog import load, read_events_stream

_ROWS = {
    "event_id": [0, 1, 2],
    "ts": [
        datetime.datetime(2024, 1, 1, 0, 0, 7, 179575),
        datetime.datetime(2024, 1, 1, 0, 3, 52, 824425),
        datetime.datetime(2024, 1, 2, 13, 6, 29, 165275),
    ],
    "user_id": [8, 46, 7],
    "event_type": ["error", "click", "view"],
    "value": [6.55, 12.31, 1.63],
    "props": ['{"k": 69}', '{"k": 89}', '{"k": 29}'],
}


def _write_vintage(dirpath, unit: str) -> str:
    table = pa.table(
        {
            "event_id": pa.array(_ROWS["event_id"], pa.int64()),
            "ts": pa.array(_ROWS["ts"], pa.timestamp(unit)),
            "user_id": pa.array(_ROWS["user_id"], pa.int64()),
            "event_type": pa.array(_ROWS["event_type"], pa.string()),
            "value": pa.array(_ROWS["value"], pa.float64()),
            "props": pa.array(_ROWS["props"], pa.string()),
        }
    )
    out = dirpath / "events.parquet"
    out.mkdir()
    pq.write_table(table, str(out / "part-0.parquet"), store_schema=False)
    return str(dirpath)


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_load_normalizes_both_ts_vintages(spark, tmp_path, unit):
    sf_dir = _write_vintage(tmp_path, unit)
    df = load(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    got = sorted(
        (r["event_id"], r["ts"].strftime("%Y-%m-%d %H:%M:%S.%f"))
        for r in df.select("event_id", "ts").collect()
    )
    want = sorted(
        (i, t.strftime("%Y-%m-%d %H:%M:%S.%f"))
        for i, t in zip(_ROWS["event_id"], _ROWS["ts"])
    )
    assert got == want


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_read_events_stream_schema_both_vintages(spark, tmp_path, unit):
    sf_dir = _write_vintage(tmp_path, unit)
    stream = read_events_stream(spark, sf_dir)
    assert stream.isStreaming
    assert isinstance(stream.schema["ts"].dataType, T.TimestampType)
    assert [f.name for f in stream.schema.fields] == [
        "event_id",
        "ts",
        "user_id",
        "event_type",
        "value",
        "props",
    ]
    # actually START the stream: the fixture's events.parquet is a
    # DIRECTORY of part files, the layout where a basename
    # pathGlobFilter over sf_dir used to list zero files silently
    q = (
        stream.writeStream.format("memory")
        .queryName(f"vintage_{unit}")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(60)
    finally:
        q.stop()
    got = sorted(
        (r["event_id"], r["ts"].strftime("%Y-%m-%d %H:%M:%S.%f"))
        for r in spark.table(f"vintage_{unit}").select("event_id", "ts").collect()
    )
    want = sorted(
        (i, t.strftime("%Y-%m-%d %H:%M:%S.%f"))
        for i, t in zip(_ROWS["event_id"], _ROWS["ts"])
    )
    assert got == want
