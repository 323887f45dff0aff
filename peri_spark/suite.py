"""ValidationSuite — the full constraint pipeline the benchmark measures.

Composes: row-level schema validation (one codegen'd projection) +
column stats + uniqueness + referential + drift + per-partition verdicts,
optionally checkpointed per partition through a RunLedger.

Execution strategy (chosen for 100 TB, verified by .explain on every stage):

- **No whole-frame persist.** Caching the wide annotated frame (content
  strings + violation arrays) costs more than it saves; at cluster scale
  you cannot cache the input anyway. Instead every stage runs straight
  off the columnar scan and Catalyst prunes it to the stage's columns:
  uniqueness reads 3 key columns, referential 1, drift 2 — not the whole
  table.

- **Row-level validation and verdicts fuse into ONE job**: scan →
  project(violation arrays) → partial-aggregated groupBy(partition).
  The violations array never shuffles — only per-partition counters do.

- stats / uniqueness / referential / drift are independent jobs over
  pruned scans; at scale they run concurrently (scheduler pools) or
  sequentially over OS-cached hot columns.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .engine import VIOLATIONS_COLUMN, ValidationResult, validate
from .constraints import (chi_square_drift, column_stats, partition_verdicts,
                          referential_violations, uniqueness_violations)

__all__ = ["ValidationSuite", "SuiteResult"]


@dataclass
class SuiteResult:
    validation: ValidationResult
    stats: DataFrame | None = None
    duplicate_keys: DataFrame | None = None
    referential: dict[str, DataFrame] = field(default_factory=dict)
    drift: DataFrame | None = None
    verdicts: DataFrame | None = None
    timings: dict[str, float] = field(default_factory=dict)
    counters: dict[str, int] = field(default_factory=dict)

    def unpersist(self):  # kept for API compat; nothing is persisted
        return self


class ValidationSuite:
    """Declarative full-suite config; ``run(df)`` executes every stage.

    >>> suite = (ValidationSuite(schema)
    ...          .with_uniqueness(["repo", "path", "commit"])
    ...          .with_referential("lang", langs_dim, "lang")
    ...          .with_drift("length(content)", "repo", lo=0, hi=50000)
    ...          .with_partitioning("repo"))
    >>> result = suite.run(df)
    """

    def __init__(self, schema, mode: str = "strict"):
        self.schema = schema
        self.mode = mode
        self._uniq: list[list[str]] = []
        self._refs: list[tuple] = []
        self._drift: tuple | None = None
        self._partition: list[str] | None = None
        self._stats = True
        self._salt_buckets: int | None = None
        self._max_bad_ratio = 0.0

    def with_uniqueness(self, keys: list[str], salt_buckets: int | None = None):
        self._uniq.append(list(keys))
        self._salt_buckets = salt_buckets
        return self

    def with_referential(self, fk, dim: DataFrame, pk=None, broadcast=True):
        self._refs.append((fk, dim, pk, broadcast))
        return self

    def with_drift(self, value_expr: str, group_col: str, lo: float, hi: float,
                   buckets: int = 10, baseline: DataFrame | None = None):
        self._drift = (value_expr, group_col, lo, hi, buckets, baseline)
        return self

    def with_partitioning(self, *cols: str, max_bad_ratio: float = 0.0):
        self._partition = list(cols)
        self._max_bad_ratio = max_bad_ratio
        return self

    def without_stats(self):
        self._stats = False
        return self

    def run(self, df: DataFrame, eager: bool = True, persist: bool = False
            ) -> SuiteResult:
        timings: dict[str, float] = {}
        counters: dict[str, int] = {}

        # row-level validation; if partitioning is configured, the verdict
        # aggregate is the action that drives the validation scan (fused)
        t0 = time.perf_counter()
        res = validate(df, self.schema, mode=self.mode)
        out = SuiteResult(validation=res, timings=timings, counters=counters)
        if self._partition:
            out.verdicts = partition_verdicts(
                res.annotated, self._partition,
                max_bad_ratio=self._max_bad_ratio)
            if eager:
                agg = (out.verdicts
                       .agg(F.sum("n_rows"), F.sum("n_bad_rows"),
                            F.count(F.lit(1))).collect()[0])
                counters["n_rows"] = agg[0]
                counters["n_bad_rows"] = agg[1]
                counters["n_partitions"] = agg[2]
            timings["validate+verdicts"] = time.perf_counter() - t0
        elif eager:
            counters["n_bad_rows"] = res.invalid.count()
            timings["validate"] = time.perf_counter() - t0

        if self._stats:
            t = time.perf_counter()
            out.stats = column_stats(df)
            if eager:
                counters["n_stat_cols"] = out.stats.count()
            timings["stats"] = time.perf_counter() - t

        for keys in self._uniq:
            t = time.perf_counter()
            out.duplicate_keys = uniqueness_violations(
                df, keys, salt_buckets=self._salt_buckets)
            if eager:
                counters["n_duplicate_keys"] = out.duplicate_keys.count()
            timings["uniqueness"] = time.perf_counter() - t

        for fk, dim, pk, bc in self._refs:
            t = time.perf_counter()
            name = fk if isinstance(fk, str) else ",".join(fk)
            out.referential[name] = referential_violations(
                df, fk, dim, pk, broadcast=bc)
            if eager:
                counters[f"n_ref_violations:{name}"] = \
                    out.referential[name].count()
            timings[f"referential:{name}"] = time.perf_counter() - t

        if self._drift:
            t = time.perf_counter()
            vexpr, group, lo, hi, buckets, baseline = self._drift
            dff = df.select(F.expr(vexpr).alias("__v"),
                            F.col(group).alias("__g"))
            out.drift = chi_square_drift(dff, "__v", "__g", lo, hi,
                                         buckets, baseline)
            if eager:
                counters["n_drift_groups"] = out.drift.count()
            timings["drift"] = time.perf_counter() - t

        return out
