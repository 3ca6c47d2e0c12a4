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
):
    """Stream landing-folder parquet into a merged lake table.

    ``available_now=True`` drains the backlog and stops (the scheduled-
    batch analogue, restart-safe via checkpoint); ``False`` runs
    continuously. ``max_files_per_trigger`` bounds per-batch work so one
    giant backlog replay cannot produce an unboundedly large merge.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    # materialize the hidden _metadata column ON the source frame: the
    # foreachBatch frame is derived, and prepare_dms_batch needs
    # _metadata.file_path/row_index for deterministic within-file order
    stream = reader.parquet(source_dir).select("*", "_metadata")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        changes = prepare_dms_batch(batch_df, primary_keys)
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
