"""spark-submit entrypoint:

    spark-submit --py-files adfs.zip -m anomaly_detector_faironchain_spark.cli \\
        validate --input /data/source_files --out /out/run1 \\
        --ref repos=/data/repos [--partition-col bucket] [--resume]

Runs the north-rule constraint suite with checkpoint/resume; on a cluster
the same code executes unchanged — parallelism comes from the input's
file splits and spark.sql.shuffle.partitions set by the submitter.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession

from anomaly_detector_faironchain_spark.plans.checkpoint import run_with_checkpoint
from anomaly_detector_faironchain_spark.sources import load_table
from anomaly_detector_faironchain_spark.specs import north_rule_spec


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="adfs")
    sub = p.add_subparsers(dest="cmd", required=True)
    v = sub.add_parser("validate", help="run the constraint suite")
    v.add_argument("--input", required=True, help="path of source_files table")
    v.add_argument("--out", required=True, help="output/checkpoint dir")
    v.add_argument("--ref", action="append", default=[],
                   metavar="NAME=PATH", help="referenced dim tables")
    v.add_argument("--partition-col", default="bucket")
    v.add_argument("--format", default="parquet",
                   choices=["parquet", "csv", "iceberg", "table"],
                   help="default input format; per-ref `fmt:loc` prefixes "
                        "override (iceberg:/table: read catalog tables)")
    v.add_argument("--violation-limit", type=int, default=1000,
                   help="max materialized violation rows per (partition, check)")
    args = p.parse_args(argv)

    spark = SparkSession.builder.appName("adfs-validate").getOrCreate()

    df = load_table(spark, args.input, args.format)
    refs = {}
    for spec_str in args.ref:
        name, path = spec_str.split("=", 1)
        refs[name] = load_table(spark, path, args.format)
    spec = north_rule_spec(partition_col=args.partition_col)
    result = run_with_checkpoint(df, spec, args.out, refs=refs,
                                 input_path=args.input,
                                 violation_limit_per_check=args.violation_limit)
    if result is None:
        print(json.dumps({"status": "already_complete", "out": args.out}))
        return 0
    summary = {
        "status": "complete",
        "out": args.out,
        "passed": result.passed(),
        "partitions": result.profile.count(),
    }
    print(json.dumps(summary))
    return 0 if summary["passed"] else 2


if __name__ == "__main__":
    sys.exit(main())
