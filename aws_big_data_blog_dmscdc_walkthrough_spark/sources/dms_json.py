"""DMS streaming-target envelopes: the JSON records DMS writes to
Kinesis/Kafka endpoints, normalized to the same (columns, op, _seq)
shape the file-landing path produces — so one merge implementation
(operators/cdc.apply_changes) serves S3 files AND stream targets.

The reference ingests only the S3 file target
(/root/reference/DMSCDC_LoadIncremental.py:47); DMS's other target
family is a stream of per-row JSON envelopes (public AWS DMS docs,
"Using object mapping" for Kinesis/Kafka targets):

    {"data":     {<row columns>},
     "metadata": {"timestamp": "2024-01-01T00:00:00.000000Z",
                  "record-type": "data" | "control",
                  "operation": "load"|"insert"|"update"|"delete",
                  "schema-name": "...", "table-name": "...",
                  "transaction-id": 123}}

``parse_envelopes`` is a pure column transform (from_json + projection,
whole-stage codegen, no UDF) and works identically on batch and
streaming DataFrames — apply it after ``spark.readStream`` from any
string source (Kinesis connector, Kafka ``value``, or a text-file feed
standing in for a shard, as the tests do).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from . import lake_writer

# metadata is stable across DMS versions; data's schema is the table's
_METADATA_DDL = (
    "`timestamp` STRING, `record-type` STRING, `operation` STRING, "
    "`partition-key-type` STRING, `schema-name` STRING, "
    "`table-name` STRING, `transaction-id` LONG"
)

# DMS operation → the reference's one-letter Op domain
# (load rows are full-load replays — inserts, LoadInitial.py:28's stamp)
_OP_MAP = {"load": "I", "insert": "I", "update": "U", "delete": "D"}


def envelope_schema(data_ddl: str) -> StructType:
    """Spark schema for one envelope given the table's column DDL."""
    return StructType.fromDDL(
        f"data STRUCT<{data_ddl}>, metadata STRUCT<{_METADATA_DDL}>"
    )


def parse_envelopes(df: DataFrame, data_ddl: str, value_col: str = "value") -> DataFrame:
    """Decode a string column of DMS envelopes into merge-ready rows.

    Output: the table's columns + ``op`` (I/U/D) + ``_seq``
    (struct(timestamp, transaction-id) — commit order; ISO-8601 UTC
    strings compare lexically) + ``_schema``/``_table`` for routing a
    multi-table stream. Control records (DDL events) and unparseable
    lines are dropped — corrupt input must not poison the merge.
    """
    env = F.from_json(F.col(value_col).cast("string"), envelope_schema(data_ddl))
    meta = env.getField("metadata")
    op = F.element_at(
        F.create_map(*[F.lit(x) for kv in _OP_MAP.items() for x in kv]),
        meta.getField("operation"),
    )
    return (
        df.select(
            env.getField("data").alias("_data"),
            meta.getField("record-type").alias("_rt"),
            op.alias("op"),
            F.struct(
                meta.getField("timestamp").alias("ts"),
                meta.getField("transaction-id").alias("txn"),
            ).alias("_seq"),
            meta.getField("schema-name").alias("_schema"),
            meta.getField("table-name").alias("_table"),
        )
        .where((F.col("_rt") == "data") & F.col("op").isNotNull())
        .select("_data.*", "op", "_seq", "_schema", "_table")
    )


def deduped_envelopes(
    stream: DataFrame,
    data_ddl: str,
    primary_keys: Sequence[str],
    delay: str = "1 hour",
    value_col: str = "value",
) -> DataFrame:
    """Parse a streaming envelope feed and drop at-least-once
    redeliveries with BOUNDED state.

    Kinesis/Kafka delivery (and DMS retries) can repeat an envelope; the
    record identity is (primary key, commit seq). The watermark ages
    dedup state out after ``delay`` of event time, so state size tracks
    the redelivery window, not the stream's lifetime — the scale
    requirement for a continuous CDC feed. Late duplicates beyond the
    watermark fall back to the merge's latest-wins ranking (same seq →
    same survivor), so correctness never depends on the dedup.
    ``value_col`` names the envelope column (Kafka ships ``value``,
    Kinesis connectors ``data``).
    """
    parsed = parse_envelopes(stream, data_ddl, value_col).withColumn(
        "_event_ts", F.to_timestamp(F.col("_seq.ts"))
    )
    return (
        parsed.withWatermark("_event_ts", delay)
        .dropDuplicatesWithinWatermark([*primary_keys, "_seq"])
        .drop("_event_ts")
    )


def kafka_envelopes(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    data_ddl: str,
    primary_keys: Sequence[str] = (),
    dedup_within: str | None = None,
    starting_offsets: str = "earliest",
    fail_on_data_loss: bool = False,
    options: dict[str, str] | None = None,
    source: DataFrame | None = None,
) -> DataFrame:
    """DMS envelopes from a Kafka topic, parsed to merge-ready rows.

    ``readStream.format("kafka")`` (requires the
    ``spark-sql-kafka-0-10`` connector jar on the classpath — absent
    here, so this raises a clear missing-data-source error locally) →
    ``parse_envelopes`` on the ``value`` column (binary → string cast is
    inside the parser) → optionally ``deduped_envelopes`` when
    ``dedup_within`` names a redelivery window.

    ``options`` passes through any extra Kafka source options verbatim
    (``kafka.security.protocol``, ``maxOffsetsPerTrigger``, ...).

    ``source`` injects a pre-built DataFrame in Kafka's wire schema
    (``key``/``value`` binary, ``topic``/``partition``/``offset``...)
    in place of the connector — the parse wiring is testable without a
    broker, and a Kinesis connector frame with a ``value`` column works
    identically.

    Feed the result to ``writeStream.foreachBatch`` with the same merge
    ``start_envelope_stream`` uses — the downstream is source-agnostic.
    """
    if source is not None:
        raw = source
    else:
        reader = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
            .option("failOnDataLoss", str(fail_on_data_loss).lower())
        )
        for k, v in (options or {}).items():
            reader = reader.option(k, v)
        raw = reader.load()
    if dedup_within is not None:
        return deduped_envelopes(raw, data_ddl, list(primary_keys), dedup_within)
    return parse_envelopes(raw, data_ddl)


def kinesis_envelopes(
    spark: SparkSession,
    stream_name: str,
    region: str,
    data_ddl: str,
    primary_keys: Sequence[str] = (),
    dedup_within: str | None = None,
    starting_position: str = "TRIM_HORIZON",
    endpoint_url: str | None = None,
    options: dict[str, str] | None = None,
    source: DataFrame | None = None,
) -> DataFrame:
    """DMS envelopes from a Kinesis stream, parsed to merge-ready rows —
    the Kinesis twin of :func:`kafka_envelopes` (#75).

    ``readStream.format("kinesis")`` with the de-facto option names the
    public structured-streaming Kinesis connectors share (``streamName``
    / ``region`` / ``startingPosition``; Databricks and the
    qubole/awslabs connectors alike — no connector ships with OSS Spark,
    so without one this raises a clear missing-data-source error). The
    connector's wire schema carries the record payload in a binary
    ``data`` column (beside ``partitionKey``/``sequenceNumber``/...),
    which is what ``parse_envelopes`` consumes.

    ``source`` injects a pre-built frame in that wire schema in place of
    the connector, so the parse + dedup wiring is testable without AWS;
    ``options`` passes extra connector options through verbatim.

    Feed the result to ``writeStream.foreachBatch`` with the same merge
    ``start_envelope_stream`` uses — the downstream is source-agnostic.
    """
    if source is not None:
        raw = source
    else:
        reader = (
            spark.readStream.format("kinesis")
            .option("streamName", stream_name)
            .option("region", region)
            .option("startingPosition", starting_position)
        )
        if endpoint_url:
            reader = reader.option("endpointUrl", endpoint_url)
        for k, v in (options or {}).items():
            reader = reader.option(k, v)
        raw = reader.load()
    if dedup_within is not None:
        return deduped_envelopes(
            raw, data_ddl, list(primary_keys), dedup_within, value_col="data"
        )
    return parse_envelopes(raw, data_ddl, value_col="data")


def start_envelope_stream(
    spark: SparkSession,
    source_dir: str,
    out_path: str,
    primary_keys: Sequence[str],
    data_ddl: str,
    checkpoint_dir: str,
    partition_keys: Sequence[str] = (),
    available_now: bool = True,
    dedup_within: str | None = None,
):
    """Stream DMS envelopes (text files standing in for a Kinesis shard;
    swap the reader for the Kinesis/Kafka connector in production — the
    parse + merge below is source-agnostic) into a merged lake table.

    Envelopes already carry a total commit order (timestamp, txn), so
    unlike the file path there is no per-batch row_number() sequencing —
    latest-wins ranks directly on ``_seq`` inside apply_changes.
    ``dedup_within`` (e.g. ``"1 hour"``) inserts a watermarked
    exactly-once dedup of redelivered envelopes before the merge.
    """
    stream = spark.readStream.text(source_dir)

    if dedup_within is not None:
        # stateful dedup must run on the STREAMING frame (its state lives
        # in the checkpoint); foreachBatch then sees parsed, deduped rows
        stream = deduped_envelopes(stream, data_ddl, primary_keys, dedup_within)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if dedup_within is None:
            batch_df = parse_envelopes(batch_df, data_ddl)
        changes = batch_df.drop("_schema", "_table")
        if changes.isEmpty():
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
