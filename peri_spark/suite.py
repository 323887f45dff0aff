"""ValidationSuite — the full constraint pipeline the benchmark measures.

Composes: row-level schema validation (one codegen'd projection) +
column stats + uniqueness + referential + drift + per-partition verdicts,
optionally checkpointed per partition through a RunLedger.

Physical plan shape at scale (SURVEY.md §4): partition-pruned scan →
project (rewrites + violation arrays) → [stats agg | uniqueness agg |
referential broadcast anti-join | drift agg] over the SAME persisted
annotated frame → one verdict aggregate. The annotated frame is persisted
so the scan+validate work is paid once across all stages.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

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

    def unpersist(self):
        self.validation.annotated.unpersist()


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

    def run(self, df: DataFrame, persist: bool = True,
            eager: bool = True) -> SuiteResult:
        timings: dict[str, float] = {}

        t0 = time.perf_counter()
        res = validate(df, self.schema, mode=self.mode)
        if persist:
            res.annotated.persist(StorageLevel.MEMORY_AND_DISK)
        if eager:
            res.annotated.count()  # materialize once; all stages reuse it
        timings["validate"] = time.perf_counter() - t0

        out = SuiteResult(validation=res, timings=timings)
        ann = res.annotated

        if self._stats:
            t = time.perf_counter()
            out.stats = column_stats(ann.drop(VIOLATIONS_COLUMN))
            if eager:
                out.stats = out.stats.cache()
                out.stats.count()
            timings["stats"] = time.perf_counter() - t

        for keys in self._uniq:
            t = time.perf_counter()
            out.duplicate_keys = uniqueness_violations(
                ann, keys, salt_buckets=self._salt_buckets)
            if eager:
                out.duplicate_keys = out.duplicate_keys.cache()
                out.duplicate_keys.count()
            timings["uniqueness"] = time.perf_counter() - t

        for fk, dim, pk, bc in self._refs:
            t = time.perf_counter()
            name = fk if isinstance(fk, str) else ",".join(fk)
            out.referential[name] = referential_violations(
                ann, fk, dim, pk, broadcast=bc)
            if eager:
                out.referential[name] = out.referential[name].cache()
                out.referential[name].count()
            timings[f"referential:{name}"] = time.perf_counter() - t

        if self._drift:
            t = time.perf_counter()
            vexpr, group, lo, hi, buckets, baseline = self._drift
            dff = ann.select(F.expr(vexpr).alias("__v"),
                             F.col(group).alias("__g"))
            out.drift = chi_square_drift(dff, "__v", "__g", lo, hi,
                                         buckets, baseline)
            if eager:
                out.drift = out.drift.cache()
                out.drift.count()
            timings["drift"] = time.perf_counter() - t

        if self._partition:
            t = time.perf_counter()
            out.verdicts = partition_verdicts(
                ann, self._partition,
                max_bad_ratio=getattr(self, "_max_bad_ratio", 0.0))
            if eager:
                out.verdicts = out.verdicts.cache()
                out.verdicts.count()
            timings["verdicts"] = time.perf_counter() - t

        return out
