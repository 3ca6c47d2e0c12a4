"""Bucketed tables: shuffle-free co-located joins for recurring keys.

A CDC lake serves the same key joins every hour (fact ⋈ fact on order
key, target ⋈ changes on PK). Hash-bucketing both sides by that key at
WRITE time moves the exchange out of every query and into the (single)
write: Spark records bucket metadata in the catalog, and a join of two
tables bucketed identically on the join key plans with NO Exchange on
either side — at 100 TB that's the difference between re-shuffling two
fact tables per query and a purely local merge join.

The reference can't express this (Athena/Glue-catalog parquet without
bucketing); it is the standard Spark answer to "this join is the
workload", complementing `operators/skew.py` (one-off skew) and
broadcast dims (small sides).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_keys: Sequence[str],
    n_buckets: int = 64,
    sort_keys: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog table.

    ``sortBy`` within buckets lets the join skip its Sort too (files are
    read pre-sorted per bucket). ``n_buckets`` should match across the
    tables that will join: equal bucketing on both sides is what removes
    the exchange.
    """
    keys = list(bucket_keys)
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, keys[0], *keys[1:])
    )
    if sort_keys:
        sk = list(sort_keys)
        writer = writer.sortBy(sk[0], *sk[1:])
    writer.saveAsTable(table_name)


def cobucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket keys.

    With matching bucket specs this plans as a SortMergeJoin whose both
    children read bucketed files directly — zero Exchange. (Verified by
    the plan-regression test; if someone rewrites one table without
    bucketing, the test fails before the cluster bill does.)
    """
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.hint("merge").join(right, list(on), how)
