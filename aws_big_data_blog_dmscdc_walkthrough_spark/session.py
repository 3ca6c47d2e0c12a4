"""SparkSession factory with scale-oriented defaults.

Single place to tune the session so tests, bench, and the driver contract
all run with the same configuration: AQE (runtime coalescing + skew-join
splitting), Arrow for any pandas exchange, dynamic partition overwrite for
the CDC copy-on-write path, and UTC so timestamp semantics match the DuckDB
oracle exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "dmscdc-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]"))
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # runtime row-level filtering: build a Bloom filter from the small
        # side of a shuffle join and push it into the big side's scan —
        # prunes target rows in merges/semi-joins beyond what partition
        # pruning catches (key-level, not file-level)
        # (do NOT also set runtimeFilter.semiJoinReduction here — setting
        # it at session build hangs JVM startup on this Spark build)
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # the driver's events table carries parquet TIMESTAMP(NANOS), which
        # vanilla Spark rejects; read as long and convert in load_table
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # catalog tables (bucketed writes) land here, not in cwd
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/dmscdc_warehouse"),
        )
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()


def load_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one driver-provided parquet table from a scale-factor dir.

    Parquet nano-precision timestamps arrive as long (see nanosAsLong
    above); the data carries no sub-microsecond precision, so converting
    ``ns // 1000`` to a microsecond timestamp is lossless and matches what
    DuckDB reads for the same file.

    Side effect: sets ``spark.sql.legacy.parquet.nanosAsLong`` on the
    CALLER'S session for the rest of its lifetime (no per-read option
    exists for this conf). Other nano-timestamp parquet reads in the same
    session will then yield LongType instead of raising — callers who
    need the strict error back can restore the conf afterwards.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    # Self-sufficiency: callers may hand us a vanilla SparkSession (an
    # external harness, a notebook) that never went through get_spark().
    # nanosAsLong is a runtime-settable SQLConf, so set it here rather
    # than relying on the session factory having done it at build time —
    # without it the events.parquet read dies with PARQUET_TYPE_ILLEGAL
    # before the LongType branch below is ever reached.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # integer division: exact on int64 and floors like DuckDB's ns→µs read
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
