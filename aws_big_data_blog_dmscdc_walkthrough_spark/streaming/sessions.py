"""Custom stateful streaming operator: gap-based sessionization.

The batch twin (`plans/analytics.py:q_events_sessionize`) is a window
function; streaming has no retroactive window, so this is the canonical
``applyInPandasWithState`` shape: per-user state carries the OPEN
session; a new event either extends it or closes it (gap > threshold);
closed sessions are emitted; the watermark's event-time timeout flushes
sessions whose user went quiet.

State size is O(active users), independent of stream length — the
property that lets this run forever. Arrow moves each user's batch rows
in one exchange; the per-group Python work is a linear fold.

Spark ships a native ``session_window`` aggregation; this operator
exists for the semantics it can't express (custom close conditions,
per-session derived payloads, emit-on-close side outputs) and as the
template for any bespoke stateful operator.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_GAP_SECONDS = 1800

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", IntegerType()),
        StructField("sum_value", DoubleType()),
    ]
)

# open session carried between micro-batches (epoch micros for Arrow)
STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n_events", IntegerType()),
        StructField("sum_value", DoubleType()),
    ]
)

_US = 1_000_000


def _fold_sessions(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState):
    (user_id,) = key
    gap_us = SESSION_GAP_SECONDS * _US

    if state.hasTimedOut:
        # user went quiet past the watermark: flush the open session
        start_us, end_us, n, sv = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(end_us, unit="us")],
                "n_events": [n],
                "sum_value": [sv],
            }
        )
        return

    cur = state.get if state.exists else None
    closed: list[tuple[int, int, int, float]] = []
    # ONE global sort over the whole micro-batch group: pdf_iter yields
    # Arrow-sized chunks (maxRecordsPerBatch) whose boundaries are
    # shuffle order, not time order — sorting each chunk separately
    # would fold events out of order and silently mis-split sessions
    chunks = [pdf for pdf in pdf_iter if len(pdf)]
    if chunks:
        batch = pd.concat(chunks, ignore_index=True).sort_values("ts")
        for ts, value in zip(batch["ts"], batch["value"]):
            ts_us = int(pd.Timestamp(ts).value // 1000)
            if cur is None:
                cur = (ts_us, ts_us, 1, float(value))
            elif ts_us - cur[1] > gap_us:
                closed.append(cur)
                cur = (ts_us, ts_us, 1, float(value))
            else:
                # a late-but-in-watermark event may precede the open
                # session's bounds: extend with min/max, never regress
                cur = (
                    min(cur[0], ts_us),
                    max(cur[1], ts_us),
                    cur[2] + 1,
                    cur[3] + float(value),
                )

    if cur is not None:
        state.update(cur)
        # flush when the watermark passes the session's close deadline
        state.setTimeoutTimestamp(cur[1] // 1000 + SESSION_GAP_SECONDS * 1000)
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(c[0], unit="us") for c in closed],
                "session_end": [pd.Timestamp(c[1], unit="us") for c in closed],
                "n_events": [c[2] for c in closed],
                "sum_value": [c[3] for c in closed],
            }
        )


def sessionize_stream(
    events: DataFrame,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Emit closed sessions from an event stream (append semantics)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            _fold_sessions,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
