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
