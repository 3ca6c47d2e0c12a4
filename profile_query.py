"""A/B profiling harness for single queries (guide §1.4/§1.5).

Usage:
  python profile_query.py <query> [<query> ...] [--runs N] [--sf DIR]
      [--explain] [--jobs]

Times each named query with the noop sink inside ONE session (same
methodology as bench.py: clearCache between runs, setJobDescription
labels). Run 0 pays plan compilation; report the median of the rest.
``--explain`` dumps explain("formatted") to stdout instead of timing.
``--jobs`` prints the per-job wall profile via a status listener.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from aws_big_data_blog_dmscdc_walkthrough_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--jobs", action="store_true")
    args = ap.parse_args()

    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    registry = {**entry_mod.queries(), **entry_mod.secondary_queries()}
    unknown = [q for q in args.queries if q not in registry]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(2)

    # same warm-up as bench.py so run 0 is comparable
    from pyspark.sql import functions as F

    from aws_big_data_blog_dmscdc_walkthrough_spark.functions.hashing import (
        shingle_hashes_pandas,
    )

    warm = (
        spark.range(0, 3200, 1, 32)
        .withColumn("t", F.concat_ws(" ", F.lit("w"), F.col("id").cast("string")))
        .select(shingle_hashes_pandas(2)(F.col("t")).alias("sh"))
    )
    warm.write.format("noop").mode("overwrite").save()

    for name in args.queries:
        fn = registry[name]
        if args.explain:
            print(f"===== {name} =====")
            fn(spark, args.sf).explain("formatted")
            continue
        runs: list[float] = []
        for i in range(args.runs):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        med = statistics.median(runs[1:]) if len(runs) > 1 else runs[0]
        print(
            f"{name}: runs={['%.2f' % r for r in runs]} "
            f"median(warm)={med:.2f}s"
        )
        if args.jobs:
            sc = spark.sparkContext
            tracker = sc.statusTracker()
            for jid in tracker.getJobIdsForGroup() or []:
                info = tracker.getJobInfo(jid)
                if info:
                    print(f"  job {jid}: {info.status}")
    spark.stop()


if __name__ == "__main__":
    main()
