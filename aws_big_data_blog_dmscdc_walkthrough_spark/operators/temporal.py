"""Temporal joins Spark lacks as primitives: as-of (point-in-time) join.

``asof_join`` answers "for each left row, the most recent right row for
the same key at-or-before the left row's time" — the join every
point-in-time feature lookup, slowly-changing-dimension read, and
tick-data enrichment needs. Spark has no ASOF JOIN operator (DuckDB/
Pandas do); the naive inequality-join formulation becomes a range join
(O(n·m) per key worst case, with an expensive dedup on top).

Spark-first shape — union + ordered window, one shuffle, linear:

  1. tag both inputs and union them on (key, time);
  2. ``last(value, ignorenulls=True)`` over
     (partition by key order by time, right-before-left) carries the
     latest right payload forward;
  3. keep left rows: each now holds the as-of right values.

Cost = one shuffle on the key (same as any join) + one sort within
partitions — no range explosion, no dedup, skew handled by AQE like any
window. Right rows must be unique per (key, time); pre-aggregate if not
(enforced by assertion-on-request, cheap to check in tests).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join without the nested-loop explosion.

    Spark plans ``p >= start AND p < end`` (no equi-key) as a broadcast
    nested loop — O(points × intervals). Bucketizing turns it into an
    equi-join: each point maps to ONE bucket (``floor(p / width)``), each
    interval explodes to every bucket it covers, the join key is the
    bucket, and the exact containment predicate filters inside the join.
    Each qualifying pair meets in exactly one bucket — no dedup needed.

    ``bucket_width`` (same units as the columns, e.g. seconds for epoch
    timestamps) trades replication for selectivity: ~interval span /
    width copies per interval, points never replicate. Pick it near the
    typical interval length.

    ``how`` is ``inner`` or ``left`` (left = every point, NULL interval
    columns when uncovered). Right/full are rejected: the exploded
    interval side would emit one row per covered bucket for unmatched
    intervals, which is not a meaningful outer-join result.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"range_join supports how='inner'|'left', got {how!r}")
    b_pt = F.floor(F.col(point_col) / bucket_width)
    b_lo = F.floor(F.col(start_col) / bucket_width)
    # end is exclusive: the end-boundary bucket is only needed when the
    # interval actually extends into it
    b_hi = F.floor((F.col(end_col) - 1) / bucket_width)

    p = points.withColumn("_bkt_p", b_pt)
    # empty/inverted intervals (end <= start) contain no points by
    # definition; dropping them BEFORE the explode matters because
    # F.sequence(lo, hi) with hi < lo generates a DESCENDING list —
    # one corrupt interval would explode into |lo-hi| spurious bucket
    # rows (or overflow sequence's element limit and fail the job)
    iv = intervals.where(F.col(end_col) > F.col(start_col)).withColumn(
        "_bkt_i", F.explode(F.sequence(b_lo.cast("long"), b_hi.cast("long")))
    )
    # containment lives IN the join condition (not a post-join filter)
    # so outer semantics hold: a point in a bucket with non-covering
    # intervals still emits its NULL-padded left row.
    cond = (
        (F.col("_bkt_p") == F.col("_bkt_i"))
        & (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) < F.col(end_col))
    )
    return p.join(iv, cond, how).drop("_bkt_p", "_bkt_i")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    value_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Left as-of join: latest right values with right_time <= left_time.

    Output: every left row + ``value_cols`` from the matched right row
    (NULL when no right row precedes it). Equal timestamps match (the
    right row sorts before the left row at the same instant).

    The matched right row is carried as ONE struct, so (a) a right row
    whose latest value is a genuine NULL is honored — a per-column
    ``last(ignorenulls)`` would skip it and resurrect a stale older
    value, and could even stitch fields from DIFFERENT right rows —
    and (b) every output row's values come from a single real right
    row. NULL join keys never match (right rows with a NULL key are
    excluded, mirroring SQL equi-join semantics); a value column that
    collides with a left column name raises instead of emitting an
    ambiguous duplicate.
    """
    from pyspark.sql import types as T

    keys = list(on)
    vals = list(value_cols) if value_cols is not None else [
        c for c in right.columns if c not in keys and c != right_time
    ]
    left_cols = [c for c in left.columns]
    clash = [v for v in vals if v in left_cols]
    if clash:
        raise ValueError(
            f"asof_join value columns {clash} collide with left columns; "
            "rename or pass explicit value_cols"
        )
    for reserved in ("_t", "_side", "_r"):
        if reserved in left_cols or reserved in vals:
            raise ValueError(f"asof_join reserves column name {reserved!r}")

    r_struct = T.StructType([right.schema[v] for v in vals])
    l_tagged = left.select(
        *[F.col(c) for c in left_cols],
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_struct).alias("_r"),
    )
    r_clean = right
    for k in keys:  # NULL keys never equi-match
        r_clean = r_clean.where(F.col(k).isNotNull())
    r_tagged = r_clean.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c not in keys],
        *[F.col(k) for k in keys],
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(v) for v in vals]).alias("_r"),
    ).select(*l_tagged.columns)  # align column order for the union

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_t"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        *l_tagged.columns[: len(left_cols) + 2],  # left cols + _t + _side
        F.last(F.col("_r"), ignorenulls=True).over(w).alias("_r"),
    )
    return (
        carried.where(F.col("_side") == 1)
        .select(
            *left_cols,
            *[F.col(f"_r.{v}").alias(v) for v in vals],
        )
    )
