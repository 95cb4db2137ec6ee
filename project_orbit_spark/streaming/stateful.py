"""Custom stateful streaming — SURVEY.md §2.9 engine addition:
applyInPandasWithState for operators Spark's built-in windows can't
express (the brief's 'custom stateful operators' tier).

Operator: per-user running totals with visit numbering — every batch
updates (n_events, total_value) state per user and emits the updated
snapshot. The batch face (cumulative window) is oracle-checked as
``stateful_running_user_totals``; the streaming face shares the
semantic and is smoke-tested with Trigger.AvailableNow in
tests/test_streaming.py.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from project_orbit_spark.catalog import load, read_events_stream
from project_orbit_spark.registry import register

STATE_SCHEMA = "n_events long, total_value double"
OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"


def make_running_total_fn():
    """Closure for applyInPandasWithState (pickled by value)."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, round(total, 2)))
        yield _pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return update


def stream_running_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming face: stateful per-user totals over the events stream."""
    stream = read_events_stream(spark, sf_dir)
    return stream.groupBy("user_id").applyInPandasWithState(
        make_running_total_fn(),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


@register(
    "stateful_running_user_totals",
    tags=("streaming", "stateful"),
    doc="Custom stateful operator, batch face (streaming face = "
    "applyInPandasWithState in stream_running_user_totals, smoke-"
    "tested separately): final per-user state after the whole event "
    "stream — count + running value total.",
    oracle="""
        SELECT user_id,
               count(*) AS n_events,
               round(sum(value), 2) AS total_value
        FROM events
        GROUP BY user_id
        ORDER BY user_id
    """,
)
def stateful_running_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("user_id")
    )
