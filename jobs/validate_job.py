#!/usr/bin/env python
"""Cluster entry point: full validation suite with per-partition
checkpoint/resume (north rule: spark-submit --py-files, resumable runs).

    spark-submit --py-files dist/peri_spark.zip jobs/validate_job.py \
        --input <parquet/iceberg path> --output <dir> --ledger <dir> \
        --partition-col repo [--mode permissive] [--resume]

ONE Spark job validates ALL pending partitions (the pending inventory is a
broadcast semi-join filter on the scan); violations land in one
``partitionBy(partition_col)`` write with dynamic partition overwrite, the
per-partition verdicts come out of one aggregate, and the ledger append is
one batched distributed write. Job count is CONSTANT in the number of
partitions — a rerun with --resume anti-joins the inventory against
completed ledger entries and the same single job touches only pending
partitions. (The previous design looped partitions on the driver: 10^6
repos = 10^6 serial jobs + 10^6 tiny ledger files. Never do that.)

Failure semantics: transient executor failures are retried by Spark inside
the job; if the job itself dies, no ledger entries are appended for the
affected run and --resume recomputes exactly the pending set.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_PID = "__pid"


def run_pending(spark: SparkSession, df: DataFrame, schema, pc: str,
                mode: str, ledger, output: str | None,
                resume: bool = False) -> dict:
    """Validate every pending partition in ONE job; returns summary dict.

    Importable entry for tests: the test suite asserts the Spark job count
    does not grow with the partition count.
    """
    from peri_spark.engine import validate
    from peri_spark.constraints import partition_verdicts

    t0 = time.perf_counter()
    # null partition values coalesce to a sentinel id so fresh and
    # resumed runs see the SAME row set: a left_semi join on a null key
    # never matches, which would make --resume silently skip rows a
    # fresh run validates (and the ledger can't key a checkpoint on null)
    pid_expr = F.coalesce(F.col(pc).cast("string"),
                          F.lit("__NULL_PARTITION__"))
    fact = df.withColumn(_PID, pid_expr)
    if resume:
        # broadcast semi-join: the pending inventory (partition ids only)
        # is tiny next to the fact table; the scan is filtered
        # executor-side, no driver loop, no per-partition re-scan. The
        # inventory scan only exists on resume — a fresh run validates
        # everything and needs no todo set.
        inventory = (df.select(pid_expr.alias("partition_id"))
                     .dropDuplicates())
        todo = ledger.pending(inventory)
        fact = fact.join(
            F.broadcast(todo.withColumnRenamed("partition_id", _PID)),
            _PID, "left_semi")

    # NOTE on `mode`: this job emits violations + per-partition verdicts,
    # which are identical across validation modes (mode only changes the
    # VALID-rows projection, which this job does not write) — the
    # parameter is accepted for CLI/API symmetry with validate/3.
    # Internally permissive is required: strict would project the
    # partition column out of the annotated frame.
    res = validate(fact, schema, mode="permissive")
    if output:
        viols = res.violations(_PID)
        (viols.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy(_PID)
         .parquet(f"{output}/violations"))

    # corpus pass 2 (pass 1 was the violations write): ONE aggregate →
    # per-partition verdicts, materialized small (one row per partition)
    # via localCheckpoint so the ledger append and the summary read the
    # tiny checkpointed frame instead of re-validating the corpus.
    # NOT persist(): on resume the verdicts lineage READS the ledger
    # path, and record_batch's append to that path would trigger
    # recacheByPath — recomputing the "cached" frame against its own
    # freshly-appended completions (= empty pending). localCheckpoint
    # cuts the lineage, so the append cannot invalidate the result.
    verdicts = (partition_verdicts(res.annotated, _PID)
                .withColumnRenamed(_PID, "partition_id")
                .localCheckpoint(eager=True))
    wall = time.perf_counter() - t0
    ledger.record_batch(verdicts, wall_seconds=wall)
    summary = (verdicts.agg(F.count(F.lit(1)).alias("n_partitions"),
                            F.sum("n_rows").alias("n_rows"),
                            F.sum("n_violations").alias("n_violations"))
               .collect()[0])
    return {"n_partitions": summary["n_partitions"] or 0,
            "n_rows": summary["n_rows"] or 0,
            "n_violations": summary["n_violations"] or 0,
            "wall_seconds": round(time.perf_counter() - t0, 3)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--ledger", required=True)
    ap.add_argument("--partition-col", default="repo")
    ap.add_argument("--mode", default="permissive")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--snapshot-id", type=int, default=None,
                    help="pin an Iceberg snapshot (VERSION AS OF); with "
                         "--resume, defaults to the snapshot the ledger "
                         "recorded so the rerun sees the same table state")
    ap.add_argument("--schema-json", default=None,
                    help="JSON Schema file; defaults to the flagship schema")
    ap.add_argument("--expectations-json", default=None,
                    help="evaluate_expectations rules file "
                         '(e.g. {"n_violations": ["ratio_lte", 0.01]}); '
                         "a failing gate exits 1 so the orchestrator "
                         "blocks the batch")
    args = ap.parse_args()

    from peri_spark.skew import recommended_conf

    builder = SparkSession.builder.appName("peri-spark-validate")
    for k, v in recommended_conf().items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()

    from peri_spark.runledger import RunLedger, schema_fingerprint

    if args.schema_json:
        from peri_spark.json_schema import from_json_schema
        schema = from_json_schema(json.load(open(args.schema_json)))
    else:
        from peri_spark.generator import FLAGSHIP_SCHEMA as schema

    from peri_spark.sources import current_snapshot_id, load_table

    # Iceberg/catalog identifiers and parquet paths both resolve here;
    # when the table is Iceberg, the run pins a snapshot so verdicts and
    # a later --resume describe ONE table state, not a moving target.
    # Pin priority: explicit --snapshot-id > (on --resume) the snapshot
    # the ledger recorded for this schema+input > the table's current
    # snapshot — so a resumed run revalidates the interrupted run's
    # table state even if the table has moved on.
    snap = args.snapshot_id
    if snap is None and args.resume:
        snap = RunLedger.last_recorded_snapshot(
            spark, args.ledger, schema_fingerprint(schema), args.input)
    if snap is None:
        snap = current_snapshot_id(spark, args.input)
    df = load_table(spark, args.input, snapshot_id=snap)
    ledger = RunLedger(spark, args.ledger,
                       schema_fp=schema_fingerprint(schema),
                       input_snapshot=(f"{args.input}@{snap}"
                                       if snap is not None else args.input))
    summary = run_pending(spark, df, schema, args.partition_col, args.mode,
                          ledger, args.output, resume=args.resume)
    rc = 0
    if args.expectations_json:
        from peri_spark.suite import SuiteResult, evaluate_expectations
        rules = {k: tuple(v) for k, v in
                 json.load(open(args.expectations_json)).items()}
        if args.resume and summary["n_partitions"] == 0:
            # an idempotent rerun validated NOTHING new: n_rows=0 would
            # fail every floor/ratio gate and block a batch that
            # already passed — skip the gate, the prior run judged it
            summary["expectations"] = {
                "skipped": "resume with no pending partitions"}
        else:
            # the job's counters ARE the gate inputs: n_violations is
            # the TOTAL violation count (a row can carry several), a
            # different metric than the suite's n_bad_rows — rules for
            # this job reference n_rows / n_violations / n_partitions
            gate = evaluate_expectations(
                SuiteResult(validation=None, counters=dict(summary)),
                rules)
            summary["expectations"] = gate
            # exit 1 on a failed gate AFTER the ledger recorded the
            # run — the work is checkpointed either way; only the
            # ship/block verdict changes
            rc = 0 if gate["passed"] else 1
    print(json.dumps(summary))
    spark.stop()
    return rc


if __name__ == "__main__":
    sys.exit(main())
