#!/usr/bin/env python
"""Cluster entry point: full validation suite with per-partition
checkpoint/resume (north rule: spark-submit --py-files, resumable runs).

    spark-submit --py-files dist/peri_spark.zip jobs/validate_job.py \
        --input <parquet/iceberg path> --output <dir> --ledger <dir> \
        --partition-col repo [--mode permissive] [--resume]

Per partition: validate rows → write violations + verdict → record ledger
entry. A rerun with --resume anti-joins the partition inventory against
completed ledger entries and touches only pending partitions. Partition
granularity = distinct values of --partition-col (repo-bucket at 10^12-file
scale; use Iceberg partition values there).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--ledger", required=True)
    ap.add_argument("--partition-col", default="repo")
    ap.add_argument("--mode", default="permissive")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--schema-json", default=None,
                    help="JSON Schema file; defaults to the flagship schema")
    args = ap.parse_args()

    from peri_spark.skew import recommended_conf

    builder = SparkSession.builder.appName("peri-spark-validate")
    for k, v in recommended_conf().items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()

    from peri_spark.engine import validate
    from peri_spark.constraints import partition_verdicts
    from peri_spark.runledger import RunLedger, schema_fingerprint

    if args.schema_json:
        from peri_spark.json_schema import from_json_schema
        schema = from_json_schema(json.load(open(args.schema_json)))
    else:
        from peri_spark.generator import FLAGSHIP_SCHEMA as schema

    df = spark.read.parquet(args.input)
    pc = args.partition_col
    ledger = RunLedger(spark, args.ledger,
                       schema_fp=schema_fingerprint(schema),
                       input_snapshot=args.input)

    inventory = df.select(F.col(pc).cast("string").alias("partition_id")) \
                  .dropDuplicates()
    todo = ledger.pending(inventory) if args.resume else inventory
    partitions = [r.partition_id for r in todo.collect()]
    print(f"partitions: {inventory.count()} total, {len(partitions)} pending")

    for pid in partitions:
        t0 = time.perf_counter()
        try:
            part = df.where(F.col(pc).cast("string") == pid)
            res = validate(part, schema, mode=args.mode)
            viols = res.violations(pc)
            (viols.write.mode("overwrite")
             .parquet(f"{args.output}/violations/{pc}={pid}"))
            verdict = partition_verdicts(res.annotated, pc).collect()[0]
            ledger.record(pid, "completed", verdict.n_rows,
                          verdict.n_violations, time.perf_counter() - t0,
                          {"passed": bool(verdict.passed)})
        except Exception as e:  # record failure; keep going
            ledger.record(pid, "failed", 0, 0, time.perf_counter() - t0,
                          {"error": str(e)[:500]})
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
