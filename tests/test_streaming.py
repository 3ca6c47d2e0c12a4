"""Streaming CDC: file-source backlog drain + checkpointed idempotency."""

import glob
import os
import shutil

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from aws_big_data_blog_dmscdc_walkthrough_spark.streaming import cdc_stream

SCHEMA = StructType(
    [
        StructField("Op", StringType()),
        StructField("id", LongType()),
        StructField("name", StringType()),
    ]
)


def _drop_file(spark, rows, src_dir, name):
    df = spark.createDataFrame(rows, SCHEMA)
    tmp = f"{src_dir}/_tmp"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(f"{tmp}/part-*.parquet")[0]
    os.makedirs(src_dir, exist_ok=True)
    os.rename(part, f"{src_dir}/{name}")
    shutil.rmtree(tmp)


def _run_stream(spark, src, out, ckpt):
    q = cdc_stream.start_cdc_stream(
        spark, src, out, ["id"], SCHEMA, ckpt, available_now=True
    )
    q.awaitTermination(120)


def test_stream_merges_batches(spark, tmp_path):
    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ck")
    _drop_file(spark, [("I", 1, "a"), ("I", 2, "b")], src, "20240101-01.parquet")
    _run_stream(spark, src, out, ckpt)
    assert {r.id: r.name for r in spark.read.parquet(out).collect()} == {1: "a", 2: "b"}

    # second batch: update 1, delete 2, insert 3
    _drop_file(spark, [("U", 1, "a2"), ("D", 2, None), ("I", 3, "c")], src, "20240102-01.parquet")
    _run_stream(spark, src, out, ckpt)
    assert {r.id: r.name for r in spark.read.parquet(out).collect()} == {1: "a2", 3: "c"}


def test_stream_restart_is_idempotent(spark, tmp_path):
    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ck")
    _drop_file(spark, [("I", 1, "a")], src, "20240101-01.parquet")
    _run_stream(spark, src, out, ckpt)
    # restart with no new files: checkpoint already covers the file
    _run_stream(spark, src, out, ckpt)
    assert spark.read.parquet(out).count() == 1


def test_stream_multi_op_within_batch(spark, tmp_path):
    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ck")
    _drop_file(spark, [("I", 1, "a")], src, "20240101-01.parquet")
    # same key twice across two files in ONE backlog drain: later file wins
    _drop_file(spark, [("U", 1, "later")], src, "20240102-01.parquet")
    _run_stream(spark, src, out, ckpt)
    assert {r.id: r.name for r in spark.read.parquet(out).collect()} == {1: "later"}


def test_streaming_tumbling_equals_batch_on_events_table(spark, tmp_path):
    """The watermarked streaming aggregation must produce exactly the
    batch answer once the stream is drained (availableNow, complete
    mode): same windows, same counts, same sums — on the real events
    table, not a fixture."""
    import shutil

    from pyspark.sql import functions as F

    from aws_big_data_blog_dmscdc_walkthrough_spark.session import (
        load_table,
        normalize_event_ts,
    )
    from aws_big_data_blog_dmscdc_walkthrough_spark.streaming import windows as sw
    from tests.conftest import SF_SMOKE

    src = str(tmp_path / "stream_src")
    os.makedirs(src)
    shutil.copy(f"{SF_SMOKE}/events.parquet", f"{src}/events.parquet")

    # normalize ts exactly like the batch reader does (no-op on the
    # current MICROS-typed file, ns→µs conversion on the legacy layout)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(f"{src}/events.parquet").schema
    stream = normalize_event_ts(sw.stream_events(spark, src, raw_schema))
    q = sw.run_to_sink(
        sw.tumbling_counts(stream),
        str(tmp_path / "ckpt"),
        "stream_tumbling_eq",
        output_mode="complete",
    )
    q.awaitTermination(120)

    got = {
        (r.w_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM stream_tumbling_eq").collect()
    }
    events = load_table(spark, SF_SMOKE, "events")
    want = {
        (r.w_start, r.event_type): (r.n_events, r.sum_value)
        for r in events.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n_events", "sum_value")
        .collect()
    }
    assert set(got) == set(want)
    for k, (n, s) in want.items():
        gn, gs = got[k]
        assert gn == n
        assert abs(gs - s) <= 1e-9 * max(abs(s), 1.0)  # double sum order
