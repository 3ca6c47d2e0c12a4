"""Structured-Streaming CDC: the reference's scheduled Glue trigger loop
re-expressed as ``readStream`` over the landing folder + ``foreachBatch``
merge.

The reference polls hourly (README: Glue Trigger) and replays files after
a stored high-water mark; Structured Streaming's file source does exactly
that natively — checkpointed file tracking, exactly-once per batch — so
the state table's LastIncrementalFile column disappears into the
checkpoint. Each micro-batch applies the same latest-wins merge as the
batch path (operators/cdc.apply_changes), so batch and streaming share
one merge implementation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from ..pipeline.controller import prepare_dms_batch
from ..sources import lake_writer


def start_cdc_stream(
    spark: SparkSession,
    source_dir: str,
    out_path: str,
    primary_keys: Sequence[str],
    schema,
    checkpoint_dir: str,
    partition_keys: Sequence[str] = (),
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    merge_on_read: bool = False,
    compact_every: int | None = None,
    history_mode: bool = False,
    history_buckets: int | None = None,
):
    """Stream landing-folder parquet into a merged lake table.

    ``available_now=True`` drains the backlog and stops (the scheduled-
    batch analogue, restart-safe via checkpoint); ``False`` runs
    continuously. ``max_files_per_trigger`` bounds per-batch work so one
    giant backlog replay cannot produce an unboundedly large merge.

    ``history_mode=True`` maintains an SCD TYPE 2 HISTORY table instead
    of a latest-state table: each micro-batch folds through
    ``lake_writer.scd2_merge_on_read`` — the impacted keys' open
    versions are superseded by a position-delete file and their closed
    replacements + the batch's new versions APPEND, one manifest commit
    per batch (read via ``manifest.read_table``). Per-batch write volume
    is bounded by the batch, never by the ever-growing history (a
    history table's closed versions are immutable, so nothing else can
    need rewriting). ``history_buckets=N`` hash-partitions the history
    by primary key so the replay-guard and open-version scans prune to
    the batch's buckets; ``compact_every`` schedules the DV
    materialization pass, same as MOR mode. Replay-safe via the per-key
    seq high-water mark: the version sequence is the (file, row) order
    flattened to one lexically-ordered string, so — unlike the
    latest-state modes, where only within-batch order matters — landing
    file names MUST be lexically monotonic across batches (the DMS S3
    contract the reference's incremental discovery already depends on:
    files named after their timestamp, each sorting after the last
    processed one). A non-monotonic name would make a later change sort
    below the recorded high-water mark and be dropped as
    already-applied.

    ``merge_on_read=True`` applies each micro-batch through
    ``lake_writer.merge_on_read_incremental`` — position deletes + an
    append + one manifest commit, no data-file rewrite — the cheap path
    for high-frequency micro-batches on an update-heavy stream
    (partitioned or not; read via ``manifest.read_table``).
    ``compact_every`` then schedules the deferred rewrite: every N
    micro-batches a manifest-gated compaction materializes the
    accumulated deletion vectors so read amplification stays bounded.
    Replay stays idempotent in both modes (a retried batch supersedes
    the copy its first attempt appended).
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    # materialize the hidden _metadata column ON the source frame: the
    # foreachBatch frame is derived, and prepare_dms_batch needs
    # _metadata.file_path/row_index for deterministic within-file order
    stream = reader.parquet(source_dir).select("*", "_metadata")
    if history_mode and (merge_on_read or partition_keys):
        raise ValueError(
            "history mode is merge-on-read already and partitions by PK "
            "bucket (history_buckets), not by data columns"
        )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if history_mode:
            # NOT prepare_dms_batch's _seq: its rownum is a per-key
            # counter over however many files this delivery grouped
            # together, so the same change row gets a DIFFERENT seq when
            # a replay re-batches the files — and history seqs persist.
            # (file_path, row_index) is file-physical: delivery-invariant.
            sess = batch_df.sparkSession
            flat = (
                batch_df.withColumn(
                    "_hseq",
                    F.concat_ws(
                        "#",
                        F.col("_metadata.file_path"),
                        F.lpad(
                            F.col("_metadata.row_index").cast("string"), 12, "0"
                        ),
                    ),
                )
                .withColumnRenamed("Op", "op")
                .drop("_metadata")
            )
            lake_writer.scd2_merge_on_read(
                sess, flat, out_path, primary_keys,
                seq_col="_hseq", op_col="op",
                bucket_partitions=history_buckets,
                # the lexical-monotonicity contract documented above
                # (landing names sort after all processed ones) makes
                # every batch's seqs strictly later than every committed
                # fold's — the global-hwm replay guard applies, and the
                # per-fold history guard scan disappears
                seq_monotonic=True,
            )
            if compact_every and (batch_id + 1) % compact_every == 0:
                lake_writer.compact_table(
                    sess, out_path, use_manifest=True,
                    partition_keys=(
                        (lake_writer.PK_BUCKET_COL,) if history_buckets else ()
                    ),
                )
            return
        changes = prepare_dms_batch(batch_df, primary_keys)
        if merge_on_read:
            lake_writer.merge_on_read_incremental(
                batch_df.sparkSession, changes, out_path, primary_keys,
                seq_col="_seq", op_col="op",
                partition_keys=partition_keys,
            )
            if compact_every and (batch_id + 1) % compact_every == 0:
                lake_writer.compact_table(
                    batch_df.sparkSession, out_path, use_manifest=True
                )
            return
        lake_writer.merge_incremental(
            batch_df.sparkSession,
            changes,
            out_path,
            primary_keys,
            partition_keys,
            seq_col="_seq",
            op_col="op",
        )

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
