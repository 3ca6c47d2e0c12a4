"""DMS Kinesis/Kafka JSON envelope source: parse + streamed merge."""

import pytest
import json
import os

from aws_big_data_blog_dmscdc_walkthrough_spark.sources import dms_json

DDL = "id LONG, name STRING"


def _env(op, row, ts, txn=1, rt="data"):
    return json.dumps(
        {
            "data": row,
            "metadata": {
                "timestamp": ts,
                "record-type": rt,
                "operation": op,
                "partition-key-type": "schema-table",
                "schema-name": "sampledb",
                "table-name": "product",
                "transaction-id": txn,
            },
        }
    )


def test_parse_envelopes_batch(spark):
    lines = [
        _env("load", {"id": 1, "name": "a"}, "2024-01-01T00:00:00Z"),
        _env("update", {"id": 1, "name": "a2"}, "2024-01-01T00:00:01Z"),
        _env("delete", {"id": 2, "name": None}, "2024-01-01T00:00:02Z"),
        _env("create-table", {}, "2024-01-01T00:00:03Z", rt="control"),
        "not json at all",
    ]
    df = spark.createDataFrame([(l,) for l in lines], "value string")
    out = dms_json.parse_envelopes(df, DDL)
    rows = sorted(out.collect(), key=lambda r: r._seq.ts)
    # control + corrupt rows dropped; ops mapped to the reference domain
    assert [(r.id, r.op) for r in rows] == [(1, "I"), (1, "U"), (2, "D")]
    assert rows[0]._schema == "sampledb" and rows[0]._table == "product"


def test_parse_envelopes_stays_codegen(spark):
    """No Python UDF in the parse path — it must plan as a projection."""
    df = spark.createDataFrame([(_env("insert", {"id": 1, "name": "x"}, "t"),)],
                               "value string")
    plan = dms_json.parse_envelopes(df, DDL)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


@pytest.mark.slow
def test_envelope_stream_merges(spark, tmp_path):
    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ck")
    os.makedirs(src)
    with open(f"{src}/shard-000.json", "w") as fh:
        fh.write(_env("load", {"id": 1, "name": "a"}, "2024-01-01T00:00:00Z") + "\n")
        fh.write(_env("load", {"id": 2, "name": "b"}, "2024-01-01T00:00:00Z") + "\n")

    def run():
        q = dms_json.start_envelope_stream(
            spark, src, out, ["id"], DDL, ckpt, available_now=True
        )
        q.awaitTermination(120)

    run()
    assert {r.id: r.name for r in spark.read.parquet(out).collect()} == {1: "a", 2: "b"}

    # later shard file: same-key update+update (commit order wins),
    # delete, insert
    with open(f"{src}/shard-001.json", "w") as fh:
        fh.write(_env("update", {"id": 1, "name": "mid"}, "2024-01-02T00:00:00Z", txn=5) + "\n")
        fh.write(_env("update", {"id": 1, "name": "a2"}, "2024-01-02T00:00:01Z", txn=6) + "\n")
        fh.write(_env("delete", {"id": 2, "name": None}, "2024-01-02T00:00:02Z", txn=7) + "\n")
        fh.write(_env("insert", {"id": 3, "name": "c"}, "2024-01-02T00:00:03Z", txn=8) + "\n")
    run()
    got = {r.id: r.name for r in spark.read.parquet(out).collect()}
    assert got == {1: "a2", 3: "c"}

    # replay with same checkpoint: no-op (exactly-once per file)
    run()
    assert {r.id: r.name for r in spark.read.parquet(out).collect()} == got


@pytest.mark.slow
def test_envelope_stream_dedups_redeliveries(spark, tmp_path):
    """At-least-once redelivery: the same envelope appears in two shard
    files; watermarked dedup state drops the replay before the merge."""
    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ck")
    os.makedirs(src)
    first = _env("load", {"id": 1, "name": "a"}, "2024-01-01T00:00:00Z", txn=1)
    with open(f"{src}/shard-000.json", "w") as fh:
        fh.write(first + "\n")

    def run():
        q = dms_json.start_envelope_stream(
            spark, src, out, ["id"], DDL, ckpt,
            available_now=True, dedup_within="1 hour",
        )
        q.awaitTermination(120)

    run()
    # redelivered copy of the SAME record + one genuine update
    with open(f"{src}/shard-001.json", "w") as fh:
        fh.write(first + "\n")
        fh.write(_env("update", {"id": 1, "name": "a2"}, "2024-01-01T00:10:00Z", txn=2) + "\n")
    run()
    rows = spark.read.parquet(out).collect()
    assert {(r.id, r.name) for r in rows} == {(1, "a2")}


def test_kafka_envelopes_wire_schema_without_broker(spark):
    """kafka_envelopes' parse wiring, fed a frame in Kafka's wire shape
    (binary key/value + topic/partition/offset) instead of the
    connector — no broker needed; the binary→string cast and envelope
    decode must produce merge-ready rows."""
    rows = [
        (None, _env("insert", {"id": 1, "name": "x"}, "2024-01-01T00:00:00Z").encode(),
         "t1", 0, 0),
        (None, _env("delete", {"id": 2, "name": None}, "2024-01-01T00:00:01Z").encode(),
         "t1", 0, 1),
        (None, b"not json at all", "t1", 0, 2),  # dropped, not poison
    ]
    kafka_frame = spark.createDataFrame(
        rows, "key binary, value binary, topic string, partition int, offset long"
    )
    out = dms_json.kafka_envelopes(
        spark, "unused:9092", "t1", "id LONG, name STRING", source=kafka_frame
    )
    got = {(r.id, r.op) for r in out.collect()}
    assert got == {(1, "I"), (2, "D")}
    assert {"id", "name", "op", "_seq", "_schema", "_table"} <= set(out.columns)


def test_kafka_envelopes_missing_connector_raises_clearly(spark):
    """Without the spark-sql-kafka jar the constructor must fail with
    the standard missing-data-source error (option plumbing reaches
    load()), not something cryptic from our code."""
    import pytest

    with pytest.raises(Exception) as ei:
        dms_json.kafka_envelopes(
            spark, "localhost:9092", "t1", "id LONG", dedup_within="1 hour",
            primary_keys=["id"], options={"maxOffsetsPerTrigger": "500"},
        )
    assert "kafka" in str(ei.value).lower()


def test_kinesis_envelopes_wire_schema_without_aws(spark):
    """kinesis_envelopes' parse wiring, fed a frame in the Kinesis
    connector's wire shape (binary data + partitionKey/sequenceNumber)
    instead of the connector — no AWS needed."""
    rows = [
        (_env("insert", {"id": 1, "name": "x"}, "2024-01-01T00:00:00Z").encode(),
         "pk-1", "49590331", None),
        (_env("update", {"id": 1, "name": "x2"}, "2024-01-01T00:00:01Z", txn=2).encode(),
         "pk-1", "49590332", None),
        (b"corrupt", "pk-1", "49590333", None),  # dropped, not poison
    ]
    kin_frame = spark.createDataFrame(
        rows,
        "data binary, partitionKey string, sequenceNumber string, "
        "approximateArrivalTimestamp timestamp",
    )
    out = dms_json.kinesis_envelopes(
        spark, "unused-stream", "us-east-1", "id LONG, name STRING",
        source=kin_frame,
    )
    got = {(r.id, r.name, r.op) for r in out.collect()}
    assert got == {(1, "x", "I"), (1, "x2", "U")}
    assert {"id", "name", "op", "_seq", "_schema", "_table"} <= set(out.columns)


def test_kinesis_envelopes_missing_connector_raises_clearly(spark):
    """Without a Kinesis connector jar the constructor must fail with the
    standard missing-data-source error (option plumbing reaches load())."""
    import pytest

    with pytest.raises(Exception) as ei:
        dms_json.kinesis_envelopes(
            spark, "orders-stream", "us-east-1", "id LONG",
            endpoint_url="https://kinesis.us-east-1.amazonaws.com",
            options={"maxFetchRate": "2"},
        )
    assert "kinesis" in str(ei.value).lower()
