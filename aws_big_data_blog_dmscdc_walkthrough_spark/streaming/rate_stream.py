"""Custom stateful streaming operator: per-user burst-rate screen (#186's
streaming twin).

The batch query (plans/analytics.q_events_bot_burst) finds users whose
densest trailing window reached a threshold — AFTER the fact. A live
ingest pipeline wants the flag AS the burst happens, without replaying
the table: this operator keeps one bounded counter table per user and
emits a ``flag`` row the moment the user's trailing-window event count
first reaches the threshold, then a ``summary`` row (peak burst, total
events) when the user goes quiet and state is reclaimed.

Bounded state by construction: events fold into COARSE TIME BUCKETS
(``bucket_seconds``), and only the buckets inside one trailing window
are retained — state per user is ≤ window/bucket counters (plus two
scalars) no matter how hot the user is, the same O(active-keys) shape
as the TTL dedup (#166). The bucketing is the documented trade: the
trailing window is evaluated at bucket granularity (a window of W
buckets ending at the event's bucket), so a burst split exactly across
a bucket boundary can read one bucket-width narrower than the batch
operator's exact microsecond RANGE frame. The batch query stays the
exact auditor; this is the low-latency screen.

Late data inside the watermark folds into its own bucket when that
bucket is still retained; an event older than the retained window
counts toward the lifetime total but cannot resurrect a pruned bucket
(the bounded-state contract — same policy as the dedup stream's TTL).

Flag semantics: at most ONE flag per incarnation (first crossing);
the summary always reports the true peak observed. A key that goes
quiet for a full window forgets and can flag again — re-offending
bots re-surface instead of hiding behind an old flag.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

BURST_WINDOW_SECONDS = 86_400
BURST_BUCKET_SECONDS = 3_600
BURST_THRESHOLD = 5

OUTPUT_SCHEMA = StructType(
    [
        StructField("user", StringType()),
        StructField("row_type", StringType()),  # 'flag' | 'summary'
        StructField("ts", TimestampType()),
        StructField("burst", LongType()),
        StructField("n_events", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("buckets", ArrayType(LongType())),
        StructField("counts", ArrayType(LongType())),
        StructField("peak", LongType()),
        StructField("n_events", LongType()),
        StructField("flagged", BooleanType()),
        StructField("last_us", LongType()),
    ]
)

_US = 1_000_000


def _make_fold(window_s: int, bucket_s: int, threshold: int):
    w_buckets = max(1, window_s // bucket_s)

    def fold(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState):
        (user,) = key

        if state.hasTimedOut:
            _b, _c, peak, n_events, _f, last_us = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user": [user],
                    "row_type": ["summary"],
                    "ts": [pd.Timestamp(last_us, unit="us")],
                    "burst": [peak],
                    "n_events": [n_events],
                }
            )
            return

        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if not chunks:
            return
        batch = pd.concat(chunks, ignore_index=True).sort_values("ts")
        ts_us = [int(pd.Timestamp(t).value // 1000) for t in batch["ts"]]

        if state.exists:
            bks, cts, peak, n_events, flagged, last_us = state.get
            counts = dict(zip(bks, cts))
        else:
            counts, peak, n_events, flagged, last_us = {}, 0, 0, False, 0

        out = []
        for t in ts_us:
            b = t // (bucket_s * _US)
            n_events += 1
            last_us = max(last_us, t)
            hi = max(counts.keys(), default=b)
            if b <= hi - w_buckets:
                continue  # older than the retained window: total only
            counts[b] = counts.get(b, 0) + 1
            hi = max(hi, b)
            # prune to the trailing window of the NEWEST bucket seen
            for old in [k for k in counts if k <= hi - w_buckets]:
                del counts[old]
            burst = sum(
                c for k, c in counts.items() if b - w_buckets < k <= b
            )
            if burst > peak:
                peak = burst
            if burst >= threshold and not flagged:
                flagged = True
                out.append((t, burst))

        deadline_ms = last_us // 1000 + window_s * 1000
        if deadline_ms <= state.getCurrentWatermarkMs():
            # quiet incarnation already past its window while rows were
            # in flight: close it now (timeouts can't fire for keys
            # with same-batch data — the dedup-stream rule)
            if state.exists:
                state.remove()
            out_rows = [("flag", t, bu) for t, bu in out] + [
                ("summary", last_us, peak)
            ]
            yield pd.DataFrame(
                {
                    "user": [user] * len(out_rows),
                    "row_type": [r[0] for r in out_rows],
                    "ts": [pd.Timestamp(r[1], unit="us") for r in out_rows],
                    "burst": [r[2] for r in out_rows],
                    "n_events": [
                        0 if r[0] == "flag" else n_events for r in out_rows
                    ],
                }
            )
            return

        items = sorted(counts.items())
        state.update(
            (
                [k for k, _ in items],
                [c for _, c in items],
                peak,
                n_events,
                flagged,
                last_us,
            )
        )
        state.setTimeoutTimestamp(deadline_ms)
        if out:
            yield pd.DataFrame(
                {
                    "user": [user] * len(out),
                    "row_type": ["flag"] * len(out),
                    "ts": [pd.Timestamp(t, unit="us") for t, _ in out],
                    "burst": [b for _, b in out],
                    "n_events": [0] * len(out),
                }
            )

    return fold


def burst_screen(
    rows: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_seconds: int = BURST_WINDOW_SECONDS,
    bucket_seconds: int = BURST_BUCKET_SECONDS,
    threshold: int = BURST_THRESHOLD,
    watermark: str = "2 hours",
) -> DataFrame:
    """Flag + summary rows for trailing-window burst offenders
    (append semantics; see the module docstring for the contract)."""
    from pyspark.sql import functions as F

    keyed = rows.select(
        F.col(user_col).cast("string").alias("user"), F.col(ts_col).alias("ts")
    )
    return (
        keyed.withWatermark("ts", watermark)
        .groupBy("user")
        .applyInPandasWithState(
            _make_fold(window_seconds, bucket_seconds, threshold),
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
