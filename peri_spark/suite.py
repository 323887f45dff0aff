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

import threading
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .engine import VIOLATIONS_COLUMN, ValidationResult, validate
from .constraints import (benford_drift, chi_square_drift, column_stats,
                          corr_matrix, fd_violations, ks_drift,
                          partition_completeness,
                          robust_outliers, top_values,
                          value_distribution_stats,
                          partition_verdicts, referential_violations,
                          uniqueness_violations)

__all__ = ["ValidationSuite", "SuiteResult", "evaluate_expectations",
           "suggest_expectations"]


class _LazyValidation:
    """Defers the FULL validation compile (the ~10× larger non-lean
    expression tree) until a caller actually touches ``.validation`` —
    run_fused derives everything from the lean plan, so eagerly building
    the full tree would be ~1 s of serial driver time inside the hot
    suite wall for a result most callers never read.

    Thread-safe: the thunk runs exactly once under a lock (concurrent
    first-touch from two stage threads must not compile the plan twice).
    For a typed handle (isinstance checks, dunder access) call
    ``SuiteResult.validation_result()``, which resolves the proxy and
    swaps the real ValidationResult into the field."""

    def __init__(self, thunk):
        self._thunk = thunk
        self._v = None
        self._lock = threading.Lock()

    def _resolve(self):
        if self._v is None:
            with self._lock:
                if self._v is None:
                    self._v = self._thunk()
        return self._v

    def __getattr__(self, name):
        return getattr(self._resolve(), name)


@dataclass
class SuiteResult:
    validation: ValidationResult
    stats: DataFrame | None = None
    top_values: DataFrame | None = None
    duplicate_keys: DataFrame | None = None  # last keyset (compat alias)
    duplicates: dict[str, DataFrame] = field(default_factory=dict)
    referential: dict[str, DataFrame] = field(default_factory=dict)
    drift: DataFrame | None = None
    outliers: dict[str, DataFrame] = field(default_factory=dict)
    benford: dict[str, DataFrame] = field(default_factory=dict)
    correlations: DataFrame | None = None
    fd: dict[str, DataFrame] = field(default_factory=dict)
    value_dist: DataFrame | None = None
    completeness: DataFrame | None = None
    verdicts: DataFrame | None = None
    timings: dict[str, float] = field(default_factory=dict)
    counters: dict[str, int] = field(default_factory=dict)
    # frames run_fused left persisted for the lazy derived stages
    # (distributed derivation path only); released by unpersist()
    persisted_frames: list = field(default_factory=list)

    def validation_result(self) -> ValidationResult:
        """The full ValidationResult, resolving run_fused's lazy proxy
        (and caching the real object into ``.validation`` so isinstance
        checks and dunder access hold from then on)."""
        v = self.validation
        if isinstance(v, _LazyValidation):
            v = v._resolve()
            self.validation = v
        return v

    def unpersist(self):
        """Release frames the fused run left cached for the lazy derived
        stages (above derive_collect_threshold the grouped frame stays
        persisted executor-side — in exact-distinct mode it holds one row
        per distinct stat value, so long-lived sessions running many
        suites should release it once done with verdicts/drift)."""
        for f in self.persisted_frames:
            try:
                f.unpersist()
            except Exception:
                pass
        self.persisted_frames = []
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
        self._uniq: list[tuple[list[str], int | None, bool]] = []
        self._refs: list[tuple] = []
        self._drift: tuple | None = None
        self._partition: list[str] | None = None
        self._top_values: tuple[list[str], int] | None = None
        self._outliers: list[tuple] = []
        self._benford: list[tuple] = []
        self._corr: list[str] | None = None
        self._fd: list[tuple] = []
        self._value_dist: list[str] | None = None
        self._completeness: tuple | None = None
        self._stats = True
        self._max_bad_ratio = 0.0
        # above this many (partition × bucket) groups the fused derivation
        # stays distributed instead of round-tripping through the driver
        self.derive_collect_threshold = 100_000

    def with_uniqueness(self, keys: list[str], salt_buckets: int | None = None,
                        hash_prefilter: bool = False):
        """Each call adds an independent uniqueness check; results are keyed
        by the joined key names (``result.duplicates['repo,path']``) so two
        key sets don't clobber each other. ``hash_prefilter=True`` selects
        the wide-key scale plan (shuffle 8-byte key hashes, exact-confirm
        hot hashes on a second pruned scan — see uniqueness_violations)."""
        self._uniq.append((list(keys), salt_buckets, hash_prefilter))
        return self

    def with_referential(self, fk, dim: DataFrame, pk=None, broadcast=True):
        self._refs.append((fk, dim, pk, broadcast))
        return self

    def with_drift(self, value_expr: str, group_col: str, lo: float, hi: float,
                   buckets: int = 10, baseline: DataFrame | None = None,
                   method: str = "chi2"):
        """``method="chi2"`` (Pearson vs the baseline histogram) or
        ``"ks"`` (two-sample KS on bucketed CDFs). Both derive from the
        SAME (partition, bucket) counter frame in ``run_fused`` — the
        histogram is the sufficient statistic either way, so switching
        the test never adds a corpus scan."""
        assert method in ("chi2", "ks"), method
        self._drift = (value_expr, group_col, lo, hi, buckets, baseline,
                       method)
        return self

    def with_partitioning(self, *cols: str, max_bad_ratio: float = 0.0):
        self._partition = list(cols)
        self._max_bad_ratio = max_bad_ratio
        return self

    def with_stats(self, columns: list[str] | None = None,
                   fused: bool = False, exact_distinct: bool = False):
        """Restrict the stats stage to ``columns``. At corpus scale you
        track length/null stats for document-text columns, not min/max of
        the full values (string min/max shuffles and compares whole
        documents).

        ``fused=True`` merges the stats into run_fused's grouped
        aggregate as per-group partials (nulls/min/max/sums + DataSketches
        HLL sketches), eliminating the second scan entirely. Trade-off,
        measured: the sketch is a TypedImperativeAggregate, so the whole
        hot aggregate drops out of whole-stage codegen
        (ObjectHashAggregate) — net-negative when the corpus is hot in
        cache (local bench: 3× slower scan), net-positive only when the
        scan itself dominates (cold remote storage). Default keeps the
        separate scan, pruned to ``columns`` and OVERLAPPED with the
        fused job so it costs no wall-clock at N>1 slots.

        ``exact_distinct=True`` (with ``fused=True``) replaces the HLL
        sketch with EXACT n_distinct while keeping the single scan +
        single shuffle: the fused aggregate groups by GROUPING SETS
        ((partition, bucket), (col0), (col1), ...) — the same Expand
        shape Catalyst itself rewrites multi-countDistinct into. Counter
        groups and map-side-deduped distinct values share one exchange;
        n_distinct(col i) = count of that column's value-groups. Cost:
        Expand feeds the partial aggregate 1+k copies of each row and
        the shuffle carries the distinct values themselves — the
        irreducible price of exactness any engine pays; HLL stays the
        default for sketch-sized shuffles. Stat columns must be atomic
        (groupable) types in this mode."""
        self._stats = True
        self._stats_columns = columns
        self._stats_fused = fused
        self._stats_exact_distinct = exact_distinct
        return self

    def without_stats(self):
        self._stats = False
        return self

    def with_top_values(self, columns: list[str], k: int = 10):
        """Track the exact top-``k`` most frequent values of low-
        cardinality ``columns`` (enum-ish fields: lang, source, repo
        org). One extra scan + one distinct-value-bounded shuffle; see
        :func:`peri_spark.constraints.stats.top_values` for why the
        skewed (heavy-hitter) case is the cheap case."""
        if not columns:
            raise ValueError("with_top_values needs at least one column")
        self._top_values = (list(columns), k)
        return self

    def with_outliers(self, value_col: str, group_col: str | None = None,
                      threshold: float = 3.5, exact: bool = False):
        """Median/MAD robust-outlier stage on a numeric column
        (:func:`peri_spark.constraints.robust_outliers`). Default
        ``exact=False`` uses the mergeable approx-percentile sketch —
        the 100 TB path; ``exact=True`` is for oracle-grade parity.
        Results land in ``result.outliers[value_col]``."""
        self._outliers.append((value_col, group_col, threshold, exact))
        return self

    def with_benford(self, value_col: str, group_col: str,
                     alpha: float = 0.01, min_n: int = 100):
        """Benford leading-digit drift on an INTEGRAL column
        (:func:`peri_spark.constraints.benford_drift`). Results land in
        ``result.benford[value_col]``."""
        self._benford.append((value_col, group_col, alpha, min_n))
        return self

    def with_correlations(self, cols: list[str]):
        """Pairwise Pearson correlation matrix over numeric ``cols`` in
        one aggregate (:func:`peri_spark.constraints.corr_matrix`).
        Result lands in ``result.correlations``."""
        if len(cols) < 2:
            raise ValueError("with_correlations needs at least 2 columns")
        self._corr = list(cols)
        return self

    def with_fd(self, determinant: list[str], dependent: str):
        """Functional-dependency stage: ``determinant -> dependent``
        must be single-valued
        (:func:`peri_spark.constraints.fd_violations`). Results land in
        ``result.fd['det,cols->dep']``."""
        self._fd.append((list(determinant), dependent))
        return self

    def with_value_distribution(self, columns: list[str]):
        """Distribution-shape stage (entropy / distinctness /
        uniqueness) over low-cardinality ``columns``
        (:func:`peri_spark.constraints.value_distribution_stats`).
        One stacked-explode scan, shuffles bounded by distinct values.
        Result lands in ``result.value_dist``."""
        if not columns:
            raise ValueError("with_value_distribution needs >=1 column")
        self._value_dist = list(columns)
        return self

    def with_completeness(self, date_col: str, start=None, end=None,
                          max_buckets: int = 100_000):
        """Partition-completeness stage over a date column
        (:func:`peri_spark.constraints.partition_completeness`): the
        dense calendar spine exposes days with zero rows — the failure
        mode every row-level check is blind to. Result lands in
        ``result.completeness``; counter ``n_missing_partitions``."""
        self._completeness = (date_col, start, end, max_buckets)
        return self

    def _numstats_thunks(self, df: DataFrame, out: "SuiteResult"):
        """(name, action) per configured numeric-distribution stage.
        Separate pruned scans by design: percentile state and the corr
        co-moments aggregate on different keys than the fused
        (partition, bucket) frame, so they cannot share its exchange."""
        thunks = []
        counters = out.counters
        for vc, gc, th, exact in self._outliers:
            def ol(vc=vc, gc=gc, th=th, exact=exact):
                o = robust_outliers(df, vc, gc, threshold=th, exact=exact)
                out.outliers[vc] = o
                counters[f"n_outliers:{vc}"] = o.count()
            thunks.append((f"outliers:{vc}", ol))
        for vc, gc, alpha, min_n in self._benford:
            def bf(vc=vc, gc=gc, alpha=alpha, min_n=min_n):
                b = benford_drift(df, vc, gc, alpha=alpha, min_n=min_n)
                out.benford[vc] = b
                counters[f"n_benford_drifted:{vc}"] = (
                    b.where(F.col("drifted")).count())
            thunks.append((f"benford:{vc}", bf))
        if self._corr:
            def cm():
                out.correlations = corr_matrix(df, self._corr)
                counters["n_corr_pairs"] = out.correlations.count()
            thunks.append(("correlations", cm))
        for det, dep in self._fd:
            name = ",".join(det) + "->" + dep

            def fd(det=det, dep=dep, name=name):
                v = fd_violations(df, det, dep)
                out.fd[name] = v
                counters[f"n_fd_violations:{name}"] = v.count()
            thunks.append((f"fd:{name}", fd))
        if self._value_dist:
            def vd():
                out.value_dist = value_distribution_stats(
                    df, self._value_dist)
                counters["n_value_dist_cols"] = out.value_dist.count()
            thunks.append(("value_dist", vd))
        if self._completeness:
            dc, st, en, mb = self._completeness

            def cp():
                out.completeness = partition_completeness(
                    df, dc, start=st, end=en, max_buckets=mb)
                counters["n_missing_partitions"] = (
                    out.completeness.where(~F.col("present")).count())
            thunks.append(("completeness", cp))
        return thunks

    def run(self, df: DataFrame, eager: bool = True, persist: bool = False,
            concurrent: bool = True) -> SuiteResult:
        """Execute all configured stages.

        ``concurrent=True`` submits each stage's action from its own
        thread (Spark sessions are thread-safe; jobs share the scheduler).
        Driver-side planning and job-submission latency overlap with
        executor compute instead of serializing the suite — on a cluster
        you'd add FAIR scheduler pools, same idea. Per-stage timings then
        measure wall under concurrency; the suite wall is what matters.
        """
        if eager and concurrent:
            return self._run_concurrent(df)
        return self._run_sequential(df, eager)

    def _stage_thunks(self, df: DataFrame, out: "SuiteResult"):
        """(name, build_and_count callable) per configured stage."""
        thunks = []
        counters = out.counters

        if self._partition:
            def vv():
                out.verdicts = partition_verdicts(
                    out.validation.annotated, self._partition,
                    max_bad_ratio=self._max_bad_ratio)
                agg = (out.verdicts
                       .agg(F.sum("n_rows"), F.sum("n_bad_rows"),
                            F.count(F.lit(1))).collect()[0])
                counters["n_rows"] = agg[0]
                counters["n_bad_rows"] = agg[1]
                counters["n_partitions"] = agg[2]
            thunks.append(("validate+verdicts", vv))
        else:
            def v():
                # n_rows + n_bad_rows off ONE aggregate over the
                # annotated frame (ratio_lte expectations and
                # suggest_expectations' row-count floor need n_rows on
                # every run path, not just the partitioned one)
                agg = out.validation.annotated.agg(
                    F.count(F.lit(1)),
                    F.sum((F.size(VIOLATIONS_COLUMN) > 0).cast("long"))
                ).collect()[0]
                counters["n_rows"] = agg[0]
                counters["n_bad_rows"] = agg[1] or 0
            thunks.append(("validate", v))

        if self._stats:
            def st():
                out.stats = column_stats(
                    df, getattr(self, "_stats_columns", None),
                    exact_distinct=getattr(self, "_stats_exact_distinct",
                                           False))
                counters["n_stat_cols"] = out.stats.count()
            thunks.append(("stats", st))

        if self._top_values:
            def tv():
                cols, k = self._top_values
                out.top_values = top_values(df, cols, k)
                counters["n_top_values"] = out.top_values.count()
            thunks.append(("top_values", tv))

        for i, (keys, salt, pre) in enumerate(self._uniq):
            kname = ",".join(keys)
            # legacy single-keyset aliases: only the LAST-registered key
            # set writes them, so concurrent stage threads finishing out
            # of order can't make duplicate_keys flap between key sets
            is_last = i == len(self._uniq) - 1

            def uq(keys=keys, salt=salt, pre=pre, kname=kname,
                   is_last=is_last):
                d = uniqueness_violations(df, keys, salt_buckets=salt,
                                          hash_prefilter=pre)
                out.duplicates[kname] = d
                n = d.count()
                counters[f"n_duplicate_keys:{kname}"] = n
                if is_last:
                    out.duplicate_keys = d
                    counters["n_duplicate_keys"] = n
            thunks.append((f"uniqueness:{kname}" if len(self._uniq) > 1
                           else "uniqueness", uq))

        for fk, dim, pk, bc in self._refs:
            name = fk if isinstance(fk, str) else ",".join(fk)

            def rf(fk=fk, dim=dim, pk=pk, bc=bc, name=name):
                out.referential[name] = referential_violations(
                    df, fk, dim, pk, broadcast=bc)
                counters[f"n_ref_violations:{name}"] = \
                    out.referential[name].count()
            thunks.append((f"referential:{name}", rf))

        if self._drift:
            def dr():
                vexpr, group, lo, hi, buckets, baseline, method = self._drift
                dff = df.select(F.expr(vexpr).alias("__v"),
                                F.col(group).alias("__g"))
                fn = chi_square_drift if method == "chi2" else ks_drift
                out.drift = fn(dff, "__v", "__g", lo, hi, buckets, baseline)
                counters["n_drift_groups"] = out.drift.count()
            thunks.append(("drift", dr))
        thunks.extend(self._numstats_thunks(df, out))
        return thunks

    def fused_grouped_plan(self, df: DataFrame):
        """Build (lazily — no job runs) the fused grouped-aggregate plan:
        ONE corpus scan → lean validation projection (+ broadcast
        referential flag joins) → partial-aggregated groupBy on
        (partition, drift-bucket) carrying verdict/referential counters
        and, when stats are fused, mergeable stat partials.

        Returns ``(grouped_df, ref_flags, stat_types, fuse_stats)``.
        Public so plan-shape tests assert the ACTUAL executed plan (no
        Python in the hot path, map-side combine, broadcast ref joins)
        rather than a hand-mirrored reconstruction.
        """
        assert self._partition, "run_fused needs a partition column"
        pcols = self._partition
        part_aliases = [f"__part_{i}" for i in range(len(pcols))]
        if self._drift:
            assert self._drift[1] in pcols, \
                "run_fused derives drift per partition column; " \
                "use run() for a drift group outside the partitioning"
        # the fused aggregate only COUNTS violations — compile the lean
        # plan (constant violation structs; ~10× smaller expression tree);
        # the full plan stays available lazily on the SuiteResult
        ann = validate(df, self.schema, mode=self.mode, lean=True).annotated
        stat_cols = getattr(self, "_stats_columns", None)
        fuse_stats = bool(self._stats and getattr(self, "_stats_fused", False)
                          and stat_cols
                          and all(c in ann.columns for c in stat_cols))
        if (self._stats and getattr(self, "_stats_fused", False)
                and getattr(self, "_stats_exact_distinct", False)
                and not fuse_stats):
            # the caller asked for exact n_distinct via the fused path but
            # a stat column is missing from the annotated frame — degrading
            # to the HLL estimate silently is how round 2 lost the request
            missing = [c for c in (stat_cols or [])
                       if c not in ann.columns] or ["<no stat columns>"]
            raise ValueError(
                "exact_distinct=True requires every fused stat column on "
                f"the annotated frame; missing: {missing}")

        # referential flags: broadcast the dim keys, left-join once
        ref_flags: list[tuple[str, str]] = []
        for i, (fk, dim, pk, bc) in enumerate(self._refs):
            fkl = [fk] if isinstance(fk, str) else list(fk)
            pkl = fkl if pk is None else ([pk] if isinstance(pk, str) else list(pk))
            name = ",".join(fkl)
            flag = f"__ref_ok_{i}"
            keys = (dim.select(*[F.col(p).alias(f)
                                 for p, f in zip(pkl, fkl)])
                    .dropDuplicates().withColumn(flag, F.lit(1)))
            ann = ann.join(F.broadcast(keys), fkl, "left")
            ref_flags.append((name, flag))

        # lean annotated frames carry the pure-integer count twin —
        # aggregating it (instead of size(_violations)) lets Catalyst
        # prune the struct-array column out of the fused scan entirely
        from .engine import VIOLATIONS_COUNT_COLUMN
        nviol = (F.col(VIOLATIONS_COUNT_COLUMN)
                 if VIOLATIONS_COUNT_COLUMN in ann.columns
                 else F.size(F.col(VIOLATIONS_COLUMN)))
        sel = [F.col(c).alias(a) for c, a in zip(pcols, part_aliases)]
        sel.append(nviol.alias("__nv"))
        if self._drift:
            vexpr, _group, lo, hi, buckets, _baseline, _method = self._drift
            from .constraints.drift import _bucket
            # -1 sentinel for null drift values: they count for verdicts
            # but are excluded from the drift histogram (the sequential
            # path filters value IS NOT NULL)
            sel.append(F.coalesce(_bucket(F.expr(vexpr), lo, hi, buckets),
                                  F.lit(-1)).alias("__bk"))
        else:
            sel.append(F.lit(0).alias("__bk"))
        for name, flag in ref_flags:
            fkl = name.split(",")
            # ALL FK columns non-null (nil passes, Peri semantics) —
            # mirrors the cond loop in referential_violations for
            # composite FKs
            nn_all = F.col(fkl[0]).isNotNull()
            for c in fkl[1:]:
                nn_all = nn_all & F.col(c).isNotNull()
            miss = nn_all & F.col(flag).isNull()
            sel.append(miss.cast("long").alias(f"__miss_{flag}"))

        # opt-in fused stats (see with_stats docstring): per-group
        # partials (nulls, min/max, length/value sums, DataSketches HLL
        # sketches) are all mergeable, so the final global stats
        # re-aggregate the tiny grouped frame — no second corpus scan
        stat_types: list = []
        if fuse_stats:
            from pyspark.sql import types as T
            by_name = {f.name: f.dataType for f in ann.schema.fields}
            for i, c in enumerate(stat_cols):
                stat_types.append(by_name[c])
                sel.append(F.col(c).alias(f"__st_{i}"))
        b = ann.select(*sel)

        # per-group aggregates stay cheap (count/sum/min/max/sketch —
        # constant state per group); heavyweight whole-value stats over
        # unlisted columns run as their own pruned-scan job below
        aggs = [F.count(F.lit(1)).alias("n_rows"),
                F.sum((F.col("__nv") > 0).cast("long")).alias("n_bad_rows"),
                F.sum("__nv").alias("n_violations")]
        for _name, flag in ref_flags:
            aggs.append(F.sum(F.col(f"__miss_{flag}")).alias(f"missing_{flag}"))
        exact_nd = fuse_stats and getattr(self, "_stats_exact_distinct",
                                          False)
        for i, dt in enumerate(stat_types):
            c = F.col(f"__st_{i}")
            aggs.append(F.sum(c.isNull().cast("long")).alias(f"st_nulls_{i}"))
            if not exact_nd:
                # min/max buffers are variable-width for strings; without
                # the HLL TypedImperativeAggregate they would demote the
                # whole corpus aggregate to SortAggregate. In exact mode
                # min/max derive from the value-group rows instead (each
                # distinct value IS a group key), keeping every corpus-agg
                # buffer fixed-width → HashAggregate.
                aggs.append(F.min(c).alias(f"st_min_{i}"))
                aggs.append(F.max(c).alias(f"st_max_{i}"))
            if isinstance(dt, T.StringType):
                aggs.append(F.sum(F.length(c)).alias(f"st_len_{i}"))
            elif isinstance(dt, T.NumericType):
                aggs.append(F.sum(c.cast("double")).alias(f"st_len_{i}"))
            else:
                aggs.append(F.lit(None).cast("double").alias(f"st_len_{i}"))
            if not exact_nd:
                aggs.append(
                    F.hll_sketch_agg(c.cast("string")).alias(f"st_hll_{i}"))

        if exact_nd:
            # GROUPING SETS: counter groups + one value-group per stat
            # column share ONE scan and ONE partial-aggregated exchange.
            # grouping() flags (not grouping_id bit layout) discriminate
            # the sets — robust to column order and to genuinely-null
            # partition values.
            for i, dt in enumerate(stat_types):
                assert isinstance(dt, T.AtomicType), \
                    f"exact_distinct needs a groupable stat column; " \
                    f"{stat_cols[i]!r} is {dt.simpleString()}"
            st_names = [f"__st_{i}" for i in range(len(stat_types))]
            flags = ([F.grouping(part_aliases[0]).alias("__g_part")]
                     + [F.grouping(n).alias(f"__g_st_{i}")
                        for i, n in enumerate(st_names)])
            g = (b.groupingSets([part_aliases + ["__bk"]]
                                + [[n] for n in st_names],
                                *part_aliases, "__bk", *st_names)
                 .agg(*flags, *aggs))
        else:
            g = b.groupBy(*part_aliases, "__bk").agg(*aggs)
        return g, ref_flags, stat_types, fuse_stats

    def run_fused(self, df: DataFrame) -> "SuiteResult":
        """Single-pass execution: ONE scan and ONE partial-aggregated
        shuffle produce verdicts + stats + drift + referential counts;
        uniqueness (a different key) is the only second shuffle, and it
        runs CONCURRENTLY with the fused scan so its tasks fill scheduler
        slots during the other job's driver gaps (on a cluster: FAIR
        pools, same idea).

        How: referential checks become broadcast-join flags on the scan;
        the annotated frame aggregates by (partition, bucket) — the
        finest granularity any stage needs — carrying per-group stat
        partials (null counts, min/max, length sums, DataSketches HLL
        sketches); every stage's result, stats included, derives from
        that tiny grouped frame (≤ partitions × buckets rows) without
        touching the corpus again. This is the plan you want at 100 TB:
        corpus bytes cross the wire once, as pre-aggregated counters and
        mergeable sketches.
        """
        from concurrent.futures import ThreadPoolExecutor

        from pyspark.storagelevel import StorageLevel

        out_timings: dict[str, float] = {}
        t_all = time.perf_counter()

        res = _LazyValidation(
            lambda: validate(df, self.schema, mode=self.mode))
        out = SuiteResult(validation=res, timings=out_timings)
        # build the (lazy) fused grouped-aggregate plan up front — also
        # the surface tests/test_plan_shape.py asserts on
        g, ref_flags, stat_types, fuse_stats = self.fused_grouped_plan(df)
        pcols = self._partition
        part_aliases = [f"__part_{i}" for i in range(len(pcols))]
        stat_cols = getattr(self, "_stats_columns", None)

        # uniqueness (and the separate-scan stats job, when stats aren't
        # fused) overlap the fused scan: their actions are submitted from
        # threads BEFORE the fused collect so all jobs share the task
        # slots (at local[1] they serialize on the single slot — same
        # total work; at N slots the overlap hides each job's driver
        # planning/submission gaps behind the other's compute)
        exact_nd_early = fuse_stats and getattr(
            self, "_stats_exact_distinct", False)
        # top_values derives FREE from the exact-distinct value groups
        # (each distinct value is a GROUPING-SETS group whose n_rows is
        # its frequency); otherwise it is one more overlapped side scan
        tv_from_groups = bool(
            self._top_values and exact_nd_early
            and set(self._top_values[0]) <= set(stat_cols or []))
        n_side = (len(self._uniq)
                  + (1 if self._stats and not fuse_stats else 0)
                  + (1 if self._top_values and not tv_from_groups else 0))
        pool = ThreadPoolExecutor(max_workers=n_side) if n_side else None
        uniq_futures = []
        stats_future = None

        def _uniq_count(keys, salt, pre, kname):
            t0 = time.perf_counter()
            d = uniqueness_violations(df, keys, salt_buckets=salt,
                                      hash_prefilter=pre)
            n = d.count()
            return kname, d, n, time.perf_counter() - t0

        def _stats_job():
            t0 = time.perf_counter()
            s = column_stats(df, stat_cols,
                             exact_distinct=getattr(
                                 self, "_stats_exact_distinct", False))
            n = s.count()
            return s, n, time.perf_counter() - t0

        tv_future = None

        def _tv_job():
            t0 = time.perf_counter()
            cols_tv, k = self._top_values
            tv = top_values(df, cols_tv, k)
            n = tv.count()
            return tv, n, time.perf_counter() - t0

        for keys, salt, pre in self._uniq:
            kname = ",".join(keys)
            uniq_futures.append(
                pool.submit(_uniq_count, keys, salt, pre, kname))
        if self._stats and not fuse_stats:
            stats_future = pool.submit(_stats_job)
        if self._top_values and not tv_from_groups:
            tv_future = pool.submit(_tv_job)

        # Truncate lineage by round-tripping the tiny grouped frame
        # (≤ partitions × buckets rows) through the driver: every derived
        # stage below plans against a LocalRelation instead of
        # re-optimizing the giant validation plan per query. NOTE:
        # localCheckpoint(eager=True) also truncates but measured 4×
        # slower (it bypasses the AQE final plan); collect is exact here.
        # GATED: above derive_collect_threshold groups (huge
        # partition-column cardinality, e.g. repo at 10^8 repos) the frame
        # stays distributed+persisted — the driver never holds it. Only
        # the COUNTER columns round-trip: HLL sketch binaries (~KB each)
        # stay executor-side and merge in one distributed aggregate.
        thresh = self.derive_collect_threshold
        counter_cols = (part_aliases
                        + ["__bk", "n_rows", "n_bad_rows", "n_violations"]
                        + [f"missing_{flag}" for _n, flag in ref_flags])
        exact_nd = fuse_stats and getattr(self, "_stats_exact_distinct",
                                          False)
        g_persisted = g.persist(StorageLevel.MEMORY_AND_DISK)
        g_all = g_persisted
        if exact_nd:
            # counter derivation sees only the (partition, bucket) set;
            # the value-group rows exist solely for exact n_distinct
            g = g_all.where(F.col("__g_part") == 0)
        else:
            g = g_all
        counter_schema = g.select(*counter_cols).schema
        head = g.select(*counter_cols).limit(thresh + 1).collect()
        out_timings["fused_scan_agg"] = time.perf_counter() - t_all

        # fused stats ← ONE global merge of the per-group partials over
        # the persisted grouped frame (sketch union + min/max/sum), then
        # the single result row becomes a LocalRelation — stats cost no
        # second corpus scan and no lineage back to it
        if fuse_stats:
            t = time.perf_counter()
            # under exact_distinct the persisted frame mixes counter rows
            # and value-group rows: stat partials merge from the counter
            # set only; n_distinct counts each column's value-groups
            # (nulls excluded, count-distinct semantics)
            cg = (F.col("__g_part") == 0) if exact_nd else F.lit(True)
            merge = [F.sum(F.when(cg, F.col("n_rows"))).alias("n_rows")]
            for i in range(len(stat_types)):
                merge.append(F.sum(F.when(cg, F.col(f"st_nulls_{i}")))
                             .alias(f"n{i}"))
                if exact_nd:
                    # min/max over the value-group rows — each distinct
                    # value appears as its set's group key
                    vg = F.when(F.col(f"__g_st_{i}") == 0,
                                F.col(f"__st_{i}"))
                    merge.append(F.min(vg).cast("string").alias(f"mn{i}"))
                    merge.append(F.max(vg).cast("string").alias(f"mx{i}"))
                else:
                    merge.append(F.min(F.when(cg, F.col(f"st_min_{i}")))
                                 .cast("string").alias(f"mn{i}"))
                    merge.append(F.max(F.when(cg, F.col(f"st_max_{i}")))
                                 .cast("string").alias(f"mx{i}"))
                merge.append(F.sum(F.when(cg, F.col(f"st_len_{i}")))
                             .alias(f"sl{i}"))
                if exact_nd:
                    merge.append(F.coalesce(F.sum(
                        ((F.col(f"__g_st_{i}") == 0)
                         & F.col(f"__st_{i}").isNotNull()).cast("long")),
                        F.lit(0)).alias(f"nd{i}"))
                else:
                    merge.append(F.coalesce(
                        F.hll_sketch_estimate(
                            F.hll_union_agg(f"st_hll_{i}", True)),
                        F.lit(0)).alias(f"nd{i}"))
            wrow = g_all.agg(*merge).collect()[0]
            n_all = wrow["n_rows"] or 0
            srows = []
            for i, c in enumerate(stat_cols):
                n_null = wrow[f"n{i}"]
                nonnull = n_all - (n_null or 0)
                sl = wrow[f"sl{i}"]
                avg_len = (float(sl) / nonnull
                           if sl is not None and nonnull else None)
                srows.append((c, n_all, n_null,
                              float(n_null) / n_all if n_all else None,
                              wrow[f"mn{i}"], wrow[f"mx{i}"], avg_len,
                              wrow[f"nd{i}"]))
            out.stats = df.sparkSession.createDataFrame(
                srows,
                "column string, n_rows bigint, n_null bigint, "
                "null_rate double, min_value string, max_value string, "
                "avg_len double, n_distinct bigint")
            out.counters["n_stat_cols"] = len(srows)
            out_timings["stats"] = time.perf_counter() - t

        if tv_from_groups:
            # heavy-hitter derivation while the grouped frame is still
            # persisted: each stat column's value groups carry their
            # frequency in n_rows, so top-k costs one tiny window over
            # ≤ sum(n_distinct) already-aggregated rows — no extra scan
            t = time.perf_counter()
            cols_tv, k = self._top_values
            from pyspark.sql import Window
            pieces = []
            for c in cols_tv:
                i = stat_cols.index(c)
                pieces.append(
                    g_all.where((F.col(f"__g_st_{i}") == 0)
                                & F.col(f"__st_{i}").isNotNull())
                    .select(F.lit(c).alias("column"),
                            F.col(f"__st_{i}").cast("string").alias("value"),
                            F.col("n_rows").alias("n")))
            u = pieces[0]
            for p in pieces[1:]:
                u = u.unionByName(p)
            w = Window.partitionBy("column").orderBy(F.col("n").desc(),
                                                     "value")
            tv_rows = (u.select("column", "value", "n",
                                F.row_number().over(w).alias("rank"))
                       .where(F.col("rank") <= k).collect())
            out.top_values = df.sparkSession.createDataFrame(
                tv_rows, "column string, value string, n bigint, rank int")
            out.counters["n_top_values"] = len(tv_rows)
            out_timings["top_values"] = time.perf_counter() - t

        if len(head) <= thresh:
            g_persisted.unpersist()
            g_rows = head
            g = df.sparkSession.createDataFrame(g_rows, counter_schema)
        else:
            g_rows = None  # distributed path: counters via tiny aggregates
            g = g.select(*counter_cols)
            # the derived stages (verdicts/drift) stay lazy over the
            # persisted frame — hand the handle to the caller for release
            out.persisted_frames.append(g_persisted)

        t = time.perf_counter()
        grouped = g

        # verdicts ← re-agg the tiny frame by the partition key(s)
        out.verdicts = (grouped.groupBy(*[F.col(a).alias(c) for a, c
                                          in zip(part_aliases, pcols)])
                        .agg(F.sum("n_rows").alias("n_rows"),
                             F.sum("n_bad_rows").alias("n_bad_rows"),
                             F.sum("n_violations").alias("n_violations"))
                        .select(*pcols, "n_rows", "n_bad_rows",
                                "n_violations",
                                (F.col("n_bad_rows") / F.col("n_rows"))
                                .alias("bad_ratio"),
                                (F.col("n_bad_rows") <= F.lit(self._max_bad_ratio)
                                 * F.col("n_rows")).alias("passed")))
        if g_rows is not None:
            out.counters["n_rows"] = sum(r["n_rows"] for r in g_rows)
            out.counters["n_bad_rows"] = sum(r["n_bad_rows"] for r in g_rows)
        else:
            tot = g.agg(F.sum("n_rows"), F.sum("n_bad_rows"),
                        *[F.sum(f"missing_{flag}")
                          for _n, flag in ref_flags]).collect()[0]
            out.counters["n_rows"] = tot[0]
            out.counters["n_bad_rows"] = tot[1]

        # referential miss counts ← summed counters (violating rows stay
        # available lazily via the classic anti-join)
        for i, ((name, flag), (fk, dim, pk, bc)) in enumerate(
                zip(ref_flags, self._refs)):
            out.counters[f"n_ref_violations:{name}"] = \
                (sum(r[f"missing_{flag}"] for r in g_rows)
                 if g_rows is not None else tot[2 + i])
            out.referential[name] = referential_violations(df, fk, dim, pk,
                                                           broadcast=bc)

        # drift ← chi-square / KS over the tiny (partition × bucket)
        # frame; the bucketed histogram is the sufficient statistic for
        # both tests, so switching method never touches the corpus again
        if self._drift:
            vexpr, _gr, lo, hi, buckets, _bl, method = self._drift
            from .constraints.drift import chi2_critical, ks_stat_from_obs
            # the drift group is one of the partition keys; with a
            # composite partitioning the (group, bucket) histogram sums
            # over the other key dimensions — still the tiny frame
            gi = part_aliases[pcols.index(_gr)]
            obs = (grouped.where(F.col("__bk") >= 0)
                   .groupBy(F.col(gi).alias("group"),
                            F.col("__bk").alias("bucket"))
                   .agg(F.sum("n_rows").alias("obs")))
            if _bl is not None:
                # configured baseline histogram (bucket, n, p) — same
                # semantics as chi_square_drift(..., baseline=_bl)
                base = _bl.select("bucket", "n", "p")
            else:
                base = (obs.groupBy("bucket").agg(F.sum("obs").alias("n")))
                from pyspark.sql import Window
                base = base.select("bucket", "n",
                                   (F.col("n") / F.sum("n")
                                    .over(Window.partitionBy())).alias("p"))
            if method == "ks":
                # one trivial action over the tiny histogram for the
                # baseline size (mirrors ks_drift's m_total)
                m_total = base.agg(F.sum("n")).collect()[0][0]
                out.drift = ks_stat_from_obs(obs, base, m_total)
            else:
                totals = obs.groupBy("group").agg(F.sum("obs").alias("total"))
                grid = (totals.crossJoin(F.broadcast(base.select("bucket",
                                                                 "p")))
                        .join(obs, ["group", "bucket"], "left")
                        .select("group", "total", "p",
                                F.coalesce(F.col("obs"), F.lit(0))
                                .alias("obs"),
                                (F.col("total") * F.col("p")).alias("exp")))
                crit = chi2_critical(buckets - 1)
                out.drift = (grid.where(F.col("exp") > 0).groupBy("group")
                             .agg(F.max("total").alias("n"),
                                  F.sum((F.col("obs") - F.col("exp")) ** 2
                                        / F.col("exp")).alias("chi2"))
                             .select("group", "n",
                                     F.round("chi2", 6).alias("chi2"),
                                     F.lit(round(crit, 6)).alias("critical"),
                                     (F.col("chi2") > crit).alias("drifted")))
            out.counters["n_drift_groups"] = out.drift.count()
        out_timings["derive_stages"] = time.perf_counter() - t

        # stats / uniqueness — submitted concurrently above; harvest the
        # futures (their scans/shuffles overlapped the fused job)
        if stats_future is not None:
            s, n, wall = stats_future.result()
            out.stats = s
            out.counters["n_stat_cols"] = n
            out_timings["stats"] = wall
        for fut in uniq_futures:
            kname, d, n, wall = fut.result()
            out.duplicates[kname] = d
            out.duplicate_keys = d
            out.counters[f"n_duplicate_keys:{kname}"] = n
            out.counters["n_duplicate_keys"] = n
            out_timings["uniqueness:" + kname if len(self._uniq) > 1
                        else "uniqueness"] = wall
        if tv_future is not None:
            tv, n, wall = tv_future.result()
            out.top_values = tv
            out.counters["n_top_values"] = n
            out_timings["top_values"] = wall
        if pool is not None:
            pool.shutdown()
        # numeric-distribution stages: separate pruned scans (their
        # percentile/co-moment state aggregates on other keys than the
        # fused frame's exchange — see _numstats_thunks); run after the
        # fused harvest so their scans hit OS-cached hot columns
        for name, fn in self._numstats_thunks(df, out):
            t = time.perf_counter()
            fn()
            out_timings[name] = time.perf_counter() - t
        return out

    def _run_concurrent(self, df: DataFrame) -> "SuiteResult":
        from concurrent.futures import ThreadPoolExecutor

        res = validate(df, self.schema, mode=self.mode)
        out = SuiteResult(validation=res)
        thunks = self._stage_thunks(df, out)

        def timed(name, fn):
            t0 = time.perf_counter()
            fn()
            out.timings[name] = time.perf_counter() - t0

        with ThreadPoolExecutor(max_workers=len(thunks)) as ex:
            futures = [ex.submit(timed, n, f) for n, f in thunks]
            for f in futures:
                f.result()  # propagate stage exceptions
        return out

    def _run_sequential(self, df: DataFrame, eager: bool) -> "SuiteResult":
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
            out.stats = column_stats(df, getattr(self, "_stats_columns", None))
            if eager:
                counters["n_stat_cols"] = out.stats.count()
            timings["stats"] = time.perf_counter() - t

        if self._top_values:
            t = time.perf_counter()
            cols, k = self._top_values
            out.top_values = top_values(df, cols, k)
            if eager:
                counters["n_top_values"] = out.top_values.count()
            timings["top_values"] = time.perf_counter() - t

        for keys, salt, pre in self._uniq:
            kname = ",".join(keys)
            t = time.perf_counter()
            d = uniqueness_violations(df, keys, salt_buckets=salt,
                                      hash_prefilter=pre)
            out.duplicates[kname] = d
            out.duplicate_keys = d
            if eager:
                counters[f"n_duplicate_keys:{kname}"] = d.count()
                counters["n_duplicate_keys"] = \
                    counters[f"n_duplicate_keys:{kname}"]
            timings["uniqueness:" + kname if len(self._uniq) > 1
                    else "uniqueness"] = time.perf_counter() - t

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
            vexpr, group, lo, hi, buckets, baseline, method = self._drift
            dff = df.select(F.expr(vexpr).alias("__v"),
                            F.col(group).alias("__g"))
            fn = chi_square_drift if method == "chi2" else ks_drift
            out.drift = fn(dff, "__v", "__g", lo, hi, buckets, baseline)
            if eager:
                counters["n_drift_groups"] = out.drift.count()
            timings["drift"] = time.perf_counter() - t

        for vc, gc, th, exact in self._outliers:
            t = time.perf_counter()
            out.outliers[vc] = robust_outliers(df, vc, gc, threshold=th,
                                               exact=exact)
            if eager:
                counters[f"n_outliers:{vc}"] = out.outliers[vc].count()
            timings[f"outliers:{vc}"] = time.perf_counter() - t
        for vc, gc, alpha, min_n in self._benford:
            t = time.perf_counter()
            out.benford[vc] = benford_drift(df, vc, gc, alpha=alpha,
                                            min_n=min_n)
            if eager:
                counters[f"n_benford_drifted:{vc}"] = (
                    out.benford[vc].where(F.col("drifted")).count())
            timings[f"benford:{vc}"] = time.perf_counter() - t
        if self._corr:
            t = time.perf_counter()
            out.correlations = corr_matrix(df, self._corr)
            if eager:
                counters["n_corr_pairs"] = out.correlations.count()
            timings["correlations"] = time.perf_counter() - t
        for det, dep in self._fd:
            name = ",".join(det) + "->" + dep
            t = time.perf_counter()
            out.fd[name] = fd_violations(df, det, dep)
            if eager:
                counters[f"n_fd_violations:{name}"] = out.fd[name].count()
            timings[f"fd:{name}"] = time.perf_counter() - t
        if self._value_dist:
            t = time.perf_counter()
            out.value_dist = value_distribution_stats(df, self._value_dist)
            if eager:
                counters["n_value_dist_cols"] = out.value_dist.count()
            timings["value_dist"] = time.perf_counter() - t
        if self._completeness:
            dc, st, en, mb = self._completeness
            t = time.perf_counter()
            out.completeness = partition_completeness(
                df, dc, start=st, end=en, max_buckets=mb)
            if eager:
                counters["n_missing_partitions"] = (
                    out.completeness.where(~F.col("present")).count())
            timings["completeness"] = time.perf_counter() - t

        return out


# counter-name prefixes that denote "bad things" — suggested gates cap
# them; everything else is informational (n_rows gets a floor instead)
_BAD_COUNTER_PREFIXES = (
    "n_bad_rows", "n_violations", "n_outliers:", "n_benford_drifted:",
    "n_fd_violations:", "n_missing_partitions", "n_duplicate",
    "n_ref_violations", "n_drifted")


def suggest_expectations(result: SuiteResult, slack: float = 0.5,
                         min_headroom: int = 10) -> dict:
    """Derive an ``evaluate_expectations`` rules dict from a healthy
    baseline run — Deequ's constraint-suggestion idea applied to the
    operational gate: run the suite once on a known-good batch, freeze
    the suggested rules, and every later batch is judged against them.

    Per bad-counter (violations, outliers, drift, FD, missing
    partitions, duplicates): a ceiling of ``observed·(1+slack)``
    rounded up, with at least ``min_headroom`` of absolute slack so a
    zero-violation baseline doesn't demand perpetual perfection.
    ``n_bad_rows`` gates as a ``ratio_lte`` against n_rows (the
    scale-robust form); ``n_rows`` gets a floor of
    ``observed·(1-slack)``.

    Guarantee (tested): the suggested rules PASS on the result they
    were derived from. Pure driver-side arithmetic; no jobs run.
    """
    import math
    c = result.counters
    rules: dict = {}
    n_rows = c.get("n_rows")
    if n_rows:
        rules["n_rows"] = ("gte", int(math.floor(n_rows * (1 - slack))))
    for name, v in c.items():
        if not isinstance(v, (int, float)):
            continue
        if not name.startswith(_BAD_COUNTER_PREFIXES):
            continue
        if name == "n_bad_rows" and n_rows:
            # NO rounding: at 100M rows a 6dp round collapses a tiny
            # nonzero budget to 0.0 and the baseline fails its own rule
            ratio = v / n_rows
            rules[name] = ("ratio_lte",
                           min(1.0, ratio * (1 + slack)
                               + min_headroom / n_rows))
        else:
            rules[name] = ("lte",
                           int(math.ceil(v * (1 + slack))) + min_headroom)
    return rules


def evaluate_expectations(result: SuiteResult, rules: dict) -> dict:
    """Operational pass/fail gate over a finished suite's counters — the
    "expectations" layer an orchestrator (Airflow/dagster sensor, CI
    gate) reads to decide whether a validated batch ships.

    ``rules`` maps a counter name (as found in ``result.counters``) to
    ``(op, threshold)`` with op one of ``lte/gte/lt/gt/eq`` (compare the
    counter) or ``ratio_lte`` (counter / counters['n_rows'] must not
    exceed the threshold — the violation-budget form). A referenced
    counter that the run never produced fails CLOSED (ok=False,
    reason='missing counter'): a silently-skipped check must not read
    as a pass.

    Pure driver-side arithmetic over already-collected counters — no
    jobs run. Returns ``{"passed": bool, "checks": [...]}``.
    """
    ops = {"lte": lambda a, t: a <= t, "gte": lambda a, t: a >= t,
           "lt": lambda a, t: a < t, "gt": lambda a, t: a > t,
           "eq": lambda a, t: a == t}
    checks = []
    for name, (op, threshold) in rules.items():
        c = result.counters
        if name not in c:
            checks.append({"counter": name, "op": op,
                           "threshold": threshold, "actual": None,
                           "ok": False, "reason": "missing counter"})
            continue
        actual = c[name]
        if op == "ratio_lte":
            n = c.get("n_rows")
            if not n:
                checks.append({"counter": name, "op": op,
                               "threshold": threshold, "actual": actual,
                               "ok": False, "reason": "n_rows unavailable"})
                continue
            actual = actual / n
            ok = actual <= threshold
        elif op in ops:
            ok = ops[op](actual, threshold)
        else:
            raise ValueError(f"unknown expectation op {op!r}")
        checks.append({"counter": name, "op": op, "threshold": threshold,
                       "actual": actual, "ok": bool(ok)})
    return {"passed": all(ch["ok"] for ch in checks), "checks": checks}
