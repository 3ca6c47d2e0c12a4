"""Lake writes: initial overwrite, incremental merge, copy-on-write.

Reference behavior being re-expressed:
  * initial load overwrites, optionally partitioned, after counting
    distinct partitions just to pick a repartition factor
    (DMSCDC_LoadInitial.py:33-37) — here AQE sizes output instead;
  * incremental merge rewrites ONLY the data-lake files containing
    changed keys, then deletes them with boto3 and appends replacements
    with coalesce(1) (DMSCDC_LoadIncremental.py:68-87).

Scale-correct replacements:
  * partitioned tables: impacted-PARTITION copy-on-write via dynamic
    partition overwrite — merged output only contains partitions the
    change batch touches, and ``partitionOverwriteMode=dynamic`` swaps
    exactly those directories. No driver-side file list, no manual
    deletes, untouched partitions never read or written.
  * unpartitioned tables: full rewrite through a staging directory with
    an atomic-ish rename swap (at 100 TB an unpartitioned mutable table
    is a design error — the controller logs this loudly).
"""

from __future__ import annotations

import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import cdc


def target_exists(spark: SparkSession, path: str) -> bool:
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.exists(p)


def write_initial(
    df: DataFrame, out_path: str, partition_keys: Sequence[str] = ()
) -> None:
    """Full-load overwrite with op stamp (DMSCDC_LoadInitial.py:31-37)."""
    stamped = cdc.stamp_initial(df)
    writer = stamped.write.mode("overwrite")
    if partition_keys:
        writer = writer.partitionBy(*partition_keys)
    writer.parquet(out_path)


def merge_incremental(
    spark: SparkSession,
    changes: DataFrame,
    out_path: str,
    primary_keys: Sequence[str],
    partition_keys: Sequence[str] = (),
    seq_col: str = "_seq",
    op_col: str = cdc.OP_COL,
) -> None:
    """Apply a change batch to the lake table at ``out_path``.

    No primary keys, or no existing target → insert-only append
    (DMSCDC_LoadIncremental.py:56-58). Otherwise latest-wins merge with
    copy-on-write at partition granularity.
    """
    if not primary_keys:
        out = cdc.insert_only(changes, op_col).drop(op_col, seq_col)
        writer = out.write.mode("append")
        if partition_keys:
            writer = writer.partitionBy(*partition_keys)
        writer.parquet(out_path)
        return

    if not target_exists(spark, out_path):
        # deliberate improvement over the reference's first-load shortcut
        # (DMSCDC_LoadIncremental.py:56-58 keeps only Op='I', silently
        # dropping a later update of a key inserted in the same batch):
        # merge against an empty target — latest op per key, minus deletes
        collapsed = cdc.latest_changes(changes, primary_keys, seq_col)
        out = collapsed.where(F.col(op_col) != cdc.OP_DELETE).drop(op_col, seq_col)
        writer = out.write.mode("append")
        if partition_keys:
            writer = writer.partitionBy(*partition_keys)
        writer.parquet(out_path)
        return

    # mergeSchema: after additive evolution, partitions written before the
    # evolution lack the new columns; merged-footer read reconciles them.
    # (A catalog — Delta/Iceberg/metastore — replaces this at real scale;
    # the parquet-only lake mirrors the reference's Athena-crawler model.)
    target = spark.read.option("mergeSchema", "true").parquet(out_path)
    data_cols = [c for c in target.columns if c not in (op_col, seq_col)]
    target = target.select(*data_cols)
    # additive schema evolution: a batch may carry columns the lake table
    # doesn't have yet (source ALTER TABLE); widen both sides with typed
    # NULLs. Type changes raise (see cdc.align_schemas).
    target, changes = cdc.align_schemas(target, changes, extra_cols=(op_col, seq_col))

    if partition_keys:
        # prune the target scan to partitions the batch touches: the
        # IsIn filter on partition columns prunes directories at planning
        parts = [
            tuple(r)
            for r in changes.select(*partition_keys).distinct().collect()
        ]
        cond = None
        for col in partition_keys:
            vals = list({p[partition_keys.index(col)] for p in parts})
            c = F.col(col).isin(vals)
            cond = c if cond is None else cond & c
        impacted_target = target.where(cond)
        merged = cdc.apply_changes(
            impacted_target, changes, primary_keys, seq_col, op_col
        )
        # dynamic overwrite: only partitions present in `merged` swap
        merged.write.mode("overwrite").partitionBy(*partition_keys).parquet(out_path)
    else:
        merged = cdc.apply_changes(target, changes, primary_keys, seq_col, op_col)
        _swap_rewrite(spark, merged, out_path)


def compact_table(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_keys: Sequence[str] = (),
) -> int:
    """Bin-pack a table's small files toward ``target_file_bytes``.

    Continuous CDC merges accrete small files (every micro-batch appends
    or swaps a few); scan cost then degrades to file-open overhead. The
    reference never compacts (its ``coalesce(1)`` per merge IS its
    compaction, at the cost of single-writer merges). Here compaction is
    an explicit maintenance pass, like Delta/Iceberg OPTIMIZE:

      * total bytes come from the filesystem listing (no data job);
      * the rewrite repartitions to ceil(bytes / target) output files —
        per PARTITION when partitioned (dynamic overwrite swaps each);
      * unpartitioned tables swap through staging, same as merges.

    Returns the number of output files requested.
    """
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    summary = fs.getContentSummary(p)
    n_files = max(1, int(-(-summary.getLength() // target_file_bytes)))

    df = spark.read.option("mergeSchema", "true").parquet(path)
    if partition_keys:
        # cluster rows of one partition into few tasks; dynamic overwrite
        # then swaps every partition directory with its compacted files
        out = df.repartition(n_files, *[F.col(k) for k in partition_keys])
        out.write.mode("overwrite").partitionBy(*partition_keys).parquet(path)
    else:
        _swap_rewrite(spark, df.repartition(n_files), path)
    return n_files


def _swap_rewrite(spark: SparkSession, df: DataFrame, out_path: str) -> None:
    """Full rewrite through staging + rename (unpartitioned tables)."""
    jvm = spark._jvm
    staging = out_path.rstrip("/") + f"__staging_{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(staging)
    p_out = jvm.org.apache.hadoop.fs.Path(out_path)
    p_stage = jvm.org.apache.hadoop.fs.Path(staging)
    fs = p_out.getFileSystem(spark._jsc.hadoopConfiguration())
    trash = jvm.org.apache.hadoop.fs.Path(out_path.rstrip("/") + "__old")
    if fs.exists(trash):
        fs.delete(trash, True)
    fs.rename(p_out, trash)
    fs.rename(p_stage, p_out)
    fs.delete(trash, True)
