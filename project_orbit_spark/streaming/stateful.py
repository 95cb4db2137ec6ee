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
from pyspark.sql import DataFrame, SparkSession, Window
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


# ---------------------------------------------------------------------------
# High-water-mark emitter: emit an event iff it exceeds every prior
# value for its user (prefix-maximum filter). A windowed agg can't
# express the streaming form (output is a filtered subset, not a
# per-window aggregate) — it needs per-key state.

HWM_STATE_SCHEMA = "mx double"
HWM_OUTPUT_SCHEMA = "user_id long, event_id long, value double"


def make_highwater_fn():
    """Closure for applyInPandasWithState (pickled by value): state is
    the per-user running max; each batch emits the rows that raise it,
    in (ts, event_id) order so replays are deterministic."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        mx = state.get[0] if state.exists else None
        keep: list[tuple[int, int, float]] = []
        for pdf in pdfs:
            for r in pdf.sort_values(["ts", "event_id"]).itertuples():
                if mx is None or r.value > mx:
                    mx = float(r.value)
                    keep.append((int(key[0]), int(r.event_id), float(r.value)))
        if mx is not None:
            state.update((mx,))
        if keep:
            yield _pd.DataFrame(keep, columns=["user_id", "event_id", "value"])

    return update


def stream_user_highwater(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming face of ``user_highwater_events``.

    Uses applyInPandasWithState. Spark 4's transformWithStateInPandas
    expresses the same processor with typed ValueState handles
    (getValueState("mx", "mx double")) but requires the protobuf
    wheel for its state-server wire format, which this substrate does
    not ship — the processor translates 1:1 when it does.
    """
    stream = read_events_stream(spark, sf_dir)
    return stream.groupBy("user_id").applyInPandasWithState(
        make_highwater_fn(),
        outputStructType=HWM_OUTPUT_SCHEMA,
        stateStructType=HWM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


@register(
    "user_highwater_events",
    tags=("streaming", "stateful", "window"),
    doc="Per-user high-water-mark filter: emit an event iff its value "
    "exceeds every earlier value for that user ((ts, event_id) "
    "order). Batch face = prefix-max window; streaming face = "
    "per-key running-max state (stream_user_highwater, AvailableNow "
    "parity test in tests/test_streaming.py). State is O(1) per key "
    "— the streaming form survives unbounded streams where a window "
    "over full history cannot.",
    oracle="""
        SELECT user_id, event_id, value
        FROM (
          SELECT user_id, event_id, value,
                 max(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
          FROM events
        ) t
        WHERE prev_max IS NULL OR value > prev_max
        ORDER BY user_id, event_id
    """,
)
def user_highwater_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        ev.withColumn("prev_max", F.max("value").over(w))
        .filter(F.col("prev_max").isNull() | (F.col("value") > F.col("prev_max")))
        .select("user_id", "event_id", "value")
        .orderBy("user_id", "event_id")
    )
