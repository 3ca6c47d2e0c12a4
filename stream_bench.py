"""Streaming micro-benchmark: CDC merge + windowed-agg throughput.

Batch `bench.py` times the query surface; this times the STREAMING
path end-to-end — the always-on form of the reference's hourly Glue
trigger — and records rows/sec so streaming regressions are visible
between rounds:

  1. ``cdc_stream``: the orders table replayed as ``n_batches``
     incremental parquet batches through ``readStream`` →
     ``foreachBatch`` → ``lake_writer.merge_incremental`` (real merge
     per micro-batch, real lake directory, availableNow drain).
  2. ``windowed_agg``: the events table streamed file-by-file through
     the watermarked tumbling-window aggregation to a memory sink.

Prints ONE JSON line and writes BENCH_STREAMING.json.

Usage: python stream_bench.py   (env: SPARK_GRAFT_SF_DIR, default sf0.1)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from aws_big_data_blog_dmscdc_walkthrough_spark.session import get_spark, load_table
from aws_big_data_blog_dmscdc_walkthrough_spark.streaming import cdc_stream, windows


def bench_cdc_stream(spark, sf_dir: str, work: str, n_batches: int = 8) -> dict:
    orders = load_table(spark, sf_dir, "orders")
    src = f"{work}/landing"
    lake = f"{work}/lake"
    ckpt = f"{work}/ckpt"
    # replay orders as insert batches; batch k carries keys ≡ k (mod n)
    staged = orders.select(
        F.lit("I").alias("op"),
        F.col("o_orderkey").alias("_seq"),
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        (F.col("o_orderkey") % n_batches).alias("_b"),
    )
    for b in range(n_batches):
        staged.where(F.col("_b") == b).drop("_b").coalesce(1).write.mode(
            "append"
        ).parquet(src)
    n_rows = orders.count()
    schema = spark.read.parquet(src).schema

    t0 = time.perf_counter()
    q = cdc_stream.start_cdc_stream(
        spark, src, lake, ["o_orderkey"], schema, ckpt,
        available_now=True, max_files_per_trigger=1,
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0
    merged = spark.read.parquet(lake).count()
    assert merged == n_rows, (merged, n_rows)
    return {"rows": n_rows, "batches": n_batches, "sec": round(wall, 2),
            "rows_per_sec": round(n_rows / wall)}


def bench_windowed_agg(spark, sf_dir: str, work: str) -> dict:
    events = load_table(spark, sf_dir, "events")
    src = f"{work}/events"
    # several files so the file stream has multiple triggers available
    events.repartition(8).write.mode("overwrite").parquet(src)
    n_rows = events.count()
    schema = spark.read.parquet(src).schema
    stream = windows.stream_events(spark, src, schema, max_files_per_trigger=2)
    agg = windows.tumbling_counts(stream)
    t0 = time.perf_counter()
    q = (
        agg.writeStream.format("memory")
        .queryName("sb_windows")
        .outputMode("complete")
        .option("checkpointLocation", f"{work}/wckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0
    out = spark.sql("SELECT sum(n_events) AS n FROM sb_windows").collect()[0]["n"]
    assert out == n_rows, (out, n_rows)
    return {"rows": n_rows, "sec": round(wall, 2),
            "rows_per_sec": round(n_rows / wall)}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dmscdc-stream-bench")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="stream_bench_")
    try:
        cdc = bench_cdc_stream(spark, sf_dir, work)
        win = bench_windowed_agg(spark, sf_dir, work)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "streaming_rows_per_sec",
        "value": cdc["rows_per_sec"],
        "unit": "rows/sec",
        "streams": {"cdc_merge": cdc, "windowed_agg": win},
        "sf": sf,
    }
    # per-sf sidecar so a smoke run at another scale can't clobber the
    # sf0.1 record (same convention as bench.py's BENCH_LOCAL_sf*.json)
    name = f"BENCH_STREAMING_sf{sf}.json"
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), name), "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
