"""CLI: one controller pass over a DMS landing zone.

The reference's deploy is CloudFormation + a Glue trigger running the
controller hourly (/root/reference/README.md); the equivalent here is a
cron/Airflow/k8s schedule of:

    python -m aws_big_data_blog_dmscdc_walkthrough_spark \
        --landing s3a://bucket/dms/ --lake s3a://bucket/lake/ \
        --state /var/lib/dmscdc/state.json

New tables register inactive; set primary/partition keys in the state
file and flip ``active`` to true (the reference's DynamoDB editing step,
DMSCDC_Controller.py:69-82), then the next pass loads them.
"""

from __future__ import annotations

import argparse
import json
import sys

from .pipeline import controller
from .session import get_spark
from .state.store import JsonStateStore


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="dmscdc-spark")
    ap.add_argument("--landing", required=True, help="landing-zone root (schema/table folders)")
    ap.add_argument("--lake", required=True, help="lake output root")
    ap.add_argument("--state", required=True, help="state-store JSON path")
    ap.add_argument("--max-parallel-tables", type=int, default=4)
    args = ap.parse_args(argv)

    spark = get_spark("dmscdc-controller")
    report = controller.run_once(
        spark,
        args.landing,
        args.lake,
        JsonStateStore(args.state),
        max_parallel_tables=args.max_parallel_tables,
    )
    out = [
        {
            "path": t.path,
            "skipped": t.skipped,
            "initial": t.did_initial,
            "incremental_files": t.incremental_files,
            "error": t.error,
        }
        for t in report.tables
    ]
    json.dump({"tables": out}, sys.stdout, indent=1)
    print()
    return 1 if any(t.error for t in report.tables) else 0


if __name__ == "__main__":
    raise SystemExit(main())
