"""Custom stateful streaming operator: user sessionization.

No reference counterpart (extension surface per SURVEY section 2.8
closing note).  Demonstrates the engine's sanctioned pattern for
operators Spark lacks natively: ``applyInPandasWithState`` — per-key
state (GroupState) + Arrow-batched pandas logic.

A session = consecutive events of one user with gaps < ``gap_seconds``;
a session closes when the watermark passes its last event + gap.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events int, total_value double"
)
STATE_SCHEMA = "start bigint, end bigint, n int, total double"


def _sessionize_fn(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        start, end, n, total = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start, unit="us")],
                "session_end": [pd.Timestamp(end, unit="us")],
                "n_events": [n],
                "total_value": [total],
            }
        )
        return

    rows = pd.concat(list(pdfs))
    ts_us = (rows["ts"].astype("int64") // 1000).sort_values()  # ns -> us
    values = rows["value"].sum()
    n_new = len(rows)
    if state.exists:
        start, end, n, total = state.get
        end = max(end, int(ts_us.iloc[-1]))
        start = min(start, int(ts_us.iloc[0]))
        state.update((start, end, n + n_new, total + float(values)))
    else:
        state.update(
            (int(ts_us.iloc[0]), int(ts_us.iloc[-1]), n_new, float(values))
        )
    # close the session once no event arrives for the gap duration
    state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 30_000)
    yield pd.DataFrame(
        columns=["user_id", "session_start", "session_end", "n_events", "total_value"]
    )


def sessionize(events: DataFrame, gap_seconds: int = 30) -> DataFrame:
    """Streaming sessionization with event-time timeout.

    Input needs columns (user_id, ts, value).  Emits one row per CLOSED
    session.  State is one fixed-width tuple per active user — bounded
    memory at any corpus size; the shuffle is keyed on user_id.
    """
    events = events.withColumn("ts", F.col("ts").cast("timestamp_ltz"))
    return (
        events.withWatermark("ts", f"{gap_seconds} seconds")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_batch(events: DataFrame, gap_seconds: int = 30) -> DataFrame:
    """Batch-mode sessionization (same semantics, pure Spark SQL):
    session boundaries via lag() gaps + a running session counter.
    This is the form the DuckDB oracle can check; the streaming form
    above is for unbounded inputs."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # NTZ has no direct bigint cast; microseconds via a UTC LTZ view
    ts_us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    gap = ts_us - F.lag(ts_us).over(w)
    with_break = F.when(
        gap.isNull() | (gap >= gap_seconds * 1_000_000), 1
    ).otherwise(0)
    sessions = (
        events.withColumn("_brk", with_break)
        .withColumn(
            "_session",
            F.sum("_brk").over(
                Window.partitionBy("user_id")
                .orderBy("ts", "event_id")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("user_id", "_session")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").cast("int").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .drop("_session")
    )
    return sessions.select(
        "user_id", "session_start", "session_end", "n_events", "total_value"
    )
