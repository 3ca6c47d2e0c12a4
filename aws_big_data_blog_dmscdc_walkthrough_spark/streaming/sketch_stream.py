"""Streaming corpus-statistics maintenance: a landing-folder text stream
folds into the persisted count-min sketch (operators/text.fold_count_min,
SURVEY §2 #125) one micro-batch at a time.

The always-on twin of the batch fold, the same way cdc_stream.py is the
always-on twin of the scheduled merges: ``readStream`` over the landing
folder + ``foreachBatch``. Replay safety comes from the fold itself —
the foreachBatch ``batch_id`` rides the sketch's manifest commit as
``cms_folded_through``, so a micro-batch retried after a crash (same id,
Structured Streaming's contract) is a committed no-op; cell sums would
otherwise double-count, unlike the CDC merges' key-level replay guards.

At 100 TB of backlog: ``maxFilesPerTrigger`` bounds each fold to a
batch-sized tokenize + a d·w-bounded shuffle, and the sketch read in
each fold is ≤ d·w rows regardless of how much text has ever streamed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.text import fold_count_min


def start_sketch_stream(
    spark: SparkSession,
    source_dir: str,
    out_path: str,
    text_col: str,
    schema,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Stream landing-folder parquet into the persisted count-min sketch.

    ``available_now=True`` drains the backlog and stops (restart-safe via
    checkpoint); ``False`` runs continuously.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        fold_count_min(
            batch_df.sparkSession, batch_df, text_col, out_path,
            batch_id=batch_id,
        )

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_heavy_hitter_stream(
    spark: SparkSession,
    source_dir: str,
    out_path: str,
    text_col: str,
    schema,
    checkpoint_dir: str,
    k: int | None = None,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Stream landing-folder parquet into the persisted Misra-Gries
    heavy-hitter state (#175) — same contract as
    :func:`start_sketch_stream`: ``foreachBatch`` + the fold's
    ``mg_folded_through`` replay guard make retried micro-batches
    committed no-ops; per batch the cost is one batch-sized tokenize +
    a ≤ k·P-row driver merge, and the stored state stays ≤ k+1 rows
    however much text has ever streamed."""
    from ..operators.text import MG_STATE_K, fold_heavy_hitters

    kk = k or MG_STATE_K
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        fold_heavy_hitters(
            batch_df.sparkSession, batch_df, text_col, out_path,
            k=kk, batch_id=batch_id,
        )

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
