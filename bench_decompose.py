#!/usr/bin/env python
"""Per-kernel scaling decomposition for the full constraint suite.

Isolates each kernel of the suite and a pure-decode probe, measures each
at local[1] and local[4] in separate JVMs (fresh plans per run, best of
BENCH_RUNS), and reports per-kernel core-seconds + 1->4 efficiency.

Purpose (BASELINE.md / north rule): on this single-VM sandbox all
"executors" share one memory system, so allocation/decode-bound kernels
inflate their core-seconds at 4 threads in a way cluster executors (with
per-node bandwidth) do not. This tool quantifies exactly which share of
the suite is bandwidth-bound (non-scaling here, scaling on a cluster)
and which is CPU-bound (scales here too), making the efficiency-at-scale
claim quantitative instead of argued.

Kernels:
  decode_content   sum(length(content))             pure big-column decode
  decode_meta      sums over repo/path/commit/lang  small-column decode
  validate_agg     the fused lean-validate + (part,bucket) counter agg
  uniqueness       salted duplicate-key count
  stats            pruned-scan column stats
  suite            run_fused (everything, overlapped)

Prints ONE JSON line; meant to be committed into BASELINE.md's evidence.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("BENCH_RUNS", "2"))
INPUT = os.environ.get(
    "SPARK_GRAFT_BENCH_INPUT",
    os.path.join(REPO, ".bench_cache", "code_files_sf0.1_x1200.parquet"))


def _kernels(spark, df, dim):
    from pyspark.sql import functions as F

    sys.path.insert(0, REPO)
    from peri_spark.constraints import column_stats, uniqueness_violations
    from peri_spark.engine import VIOLATIONS_COLUMN, validate
    from peri_spark.generator import FLAGSHIP_SCHEMA
    from peri_spark.suite import ValidationSuite

    def decode_content():
        df.agg(F.sum(F.length("content"))).collect()

    def decode_meta():
        df.agg(F.sum(F.length("repo")), F.sum(F.length("path")),
               F.sum(F.length("commit")),
               F.sum(F.col("lang").isNull().cast("long"))).collect()

    def validate_agg():
        ann = validate(df, FLAGSHIP_SCHEMA, mode="permissive",
                       lean=True).annotated
        nviol = F.size(F.col(VIOLATIONS_COLUMN))
        (ann.select(F.col("repo").alias("__part"),
                    nviol.alias("__nv"),
                    F.floor(F.length("content") / 256).alias("__bk"))
         .groupBy("__part", "__bk")
         .agg(F.count(F.lit(1)), F.sum((F.col("__nv") > 0).cast("long")),
              F.sum("__nv"))
         .limit(100_001).collect())

    def uniqueness():
        uniqueness_violations(df, ["repo", "path", "commit"]).count()

    def stats():
        column_stats(df, ["repo", "path", "commit", "lang"]).count()

    def suite():
        s = (ValidationSuite(FLAGSHIP_SCHEMA, mode="permissive")
             .with_stats(["repo", "path", "commit", "lang"])
             .with_uniqueness(["repo", "path", "commit"])
             .with_referential("lang", dim, "lang", broadcast=True)
             .with_drift("length(content)", "repo", lo=0.0, hi=4096.0,
                         buckets=16)
             .with_partitioning("repo"))
        s.run_fused(df)

    return [("decode_content", decode_content), ("decode_meta", decode_meta),
            ("validate_agg", validate_agg), ("uniqueness", uniqueness),
            ("stats", stats), ("suite", suite)]


def child(workers: int) -> None:
    from pyspark.sql import SparkSession

    sys.path.insert(0, REPO)
    from peri_spark.generator import LANG_ENUM

    spark = (SparkSession.builder.master(f"local[{workers}]")
             .appName(f"decompose-{workers}")
             .config("spark.sql.shuffle.partitions", str(max(workers * 2, 4)))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "24g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    df = spark.read.parquet(INPUT)
    df.count()  # warm FS cache/JVM
    dim = spark.createDataFrame([(l,) for l in LANG_ENUM], "lang string")
    from bench import _tree_cpu_seconds
    out = {}
    for name, fn in _kernels(spark, df, dim):
        best, best_cpu = None, None
        for _ in range(RUNS):
            c0 = _tree_cpu_seconds()
            t0 = time.perf_counter()
            fn()
            w = time.perf_counter() - t0
            c = _tree_cpu_seconds() - c0
            best = w if best is None or w < best else best
            best_cpu = c if best_cpu is None or c < best_cpu else best_cpu
        out[name] = round(best, 3)
        out[name + "_cpu"] = round(best_cpu, 3)
    print("CHILD_JSON:" + json.dumps(out))
    spark.stop()


def main() -> None:
    res = {}
    for workers in (4, 1):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child",
             str(workers)],
            capture_output=True, text=True, cwd=REPO, timeout=3600)
        for line in p.stdout.splitlines():
            if line.startswith("CHILD_JSON:"):
                res[workers] = json.loads(line[len("CHILD_JSON:"):])
                break
        else:
            sys.stderr.write(p.stdout[-2000:] + p.stderr[-4000:])
            raise RuntimeError(f"decompose child workers={workers} failed")
    report = {}
    for k in res[1]:
        if k.endswith("_cpu"):
            continue
        t1, t4 = res[1][k], res[4][k]
        c1, c4 = res[1].get(k + "_cpu"), res[4].get(k + "_cpu")
        report[k] = {"local1_sec": t1, "local4_sec": t4,
                     "core_sec_1": t1, "core_sec_4": round(4 * t4, 2),
                     "work_inflation_4": round(4 * t4 / t1, 3),
                     "efficiency_1_to_4": round(t1 / (4 * t4), 3)}
        if c1 and c4:
            # CPU seconds (utime+stime of the process tree) exclude
            # hypervisor steal — the load-robust work measure; see bench.py
            report[k]["cpu_sec_1"] = c1
            report[k]["cpu_sec_4"] = c4
            report[k]["work_inflation_cpu_4"] = round(c4 / c1, 3)
    print(json.dumps(report))


if __name__ == "__main__":
    if "--child" in sys.argv:
        child(int(sys.argv[sys.argv.index("--child") + 1]))
    else:
        main()
