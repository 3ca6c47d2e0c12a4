"""Watermarked stream-stream joins (event-time interval bounded).

The remaining Structured Streaming join shape the engine's batch twins
don't cover: joining two UNBOUNDED inputs (e.g. click stream × purchase
stream) where neither side can be broadcast and state must be evictable.
Spark buffers both sides in state; the watermarks plus the event-time
interval bound are what make the state finite — rows older than
(watermark − interval slack) are provably unjoinable and get evicted.
Without the time bound the state grows with the stream and the query is
rejected for append mode; this module always requires one.

Scale: state per key is bounded by rows inside the interval window;
the join itself shuffles both streams on the equi-key exactly once —
the same hash-partitioned exchange a batch join would plan, kept across
micro-batches by the state store.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .windows import _watermarkable


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "0 seconds",
    upper: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on equi-keys within an event-time interval.

    A right row joins a left row when ``right_ts`` lies in
    ``[left_ts - lower, left_ts + upper]`` and the ``on`` keys match.
    Both sides are watermarked with ``watermark``; right-side columns
    are suffixed ``_r`` where names collide (the ts columns always, so
    the output carries both event times).
    """
    lhs = _watermarkable(left, left_ts).withWatermark(left_ts, watermark)
    renames = {
        c: f"{c}_r"
        for c in right.columns
        if c in set(left.columns) and c not in on
    }
    rhs = _watermarkable(right, right_ts)
    for old, new in renames.items():
        rhs = rhs.withColumnRenamed(old, new)
    r_ts = renames.get(right_ts, right_ts)
    rhs = rhs.withWatermark(r_ts, watermark)
    conds = [lhs[k] == rhs[k] for k in on]
    conds.append(rhs[r_ts] >= F.col(left_ts) - F.expr(f"INTERVAL {lower}"))
    conds.append(rhs[r_ts] <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    joined = lhs.join(rhs, reduce(lambda a, b: a & b, conds), how)
    # collapse the duplicated equi-key columns. For OUTER joins the
    # left copy is NULL on unmatched right rows — coalesce both copies
    # so the only populated key survives instead of being discarded.
    for k in on:
        if how != "inner":
            joined = (
                joined.withColumn(f"_{k}_key", F.coalesce(lhs[k], rhs[k]))
                .drop(lhs[k])
                .drop(rhs[k])
                .withColumnRenamed(f"_{k}_key", k)
            )
        else:
            joined = joined.drop(rhs[k])
    return joined
