"""Mergeable column sketches: incremental distinct counts + quantiles.

The 100 TB move the ledger enables but nothing exploited yet: per-batch
SKETCHES persist next to the metrics, and corpus-lifetime statistics
("distinct repos ever", "p99 file size across all runs") come from
merging kilobyte-sized sketch blobs — never from rescanning history.
Both sketch families are Apache DataSketches via Spark built-ins
(``hll_sketch_agg`` / ``hll_union_agg``, ``kll_sketch_agg_double`` /
``kll_sketch_merge_double``), so merging is associative and
order-insensitive: fold(batches) ≡ sketch(whole corpus), which is
exactly the resumability contract the RunLedger records (tested).

No SQL oracle: DuckDB has no DataSketches reader, so this subsystem is
pytest-verified (estimate-vs-exact tolerance + fold-equals-rebuild),
like the other pure components. Everything is one aggregate pass per
call; sketch rows are bytes, not data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["distinct_sketches", "merge_distinct_sketches",
           "quantile_sketches", "merge_quantile_sketches",
           "theta_sketches", "novelty_estimate"]


def distinct_sketches(df: DataFrame, columns: list[str],
                      lg_k: int = 12,
                      by: list[str] | None = None) -> DataFrame:
    """HLL sketch blobs: per column a binary ``<col>__hll`` plus
    ``n_rows`` — ONE row, or one row per ``by`` group (e.g. per day:
    the rollup grain later window merges slice on — "distinct users
    last 7 days" = merge 7 daily rows). Store per batch (parquet binary
    columns / the ledger directory); merge with
    :func:`merge_distinct_sketches`. ``lg_k=12`` ≈ 1.6% relative error
    at 4 KiB per sketch.
    """
    if not columns:
        raise ValueError("columns must be non-empty")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in columns:
        aggs.append(F.hll_sketch_agg(F.col(c).cast("string"),
                                     F.lit(lg_k)).alias(f"{c}__hll"))
    if by:
        return df.groupBy(*by).agg(*aggs)
    return df.agg(*aggs)


def merge_distinct_sketches(history: DataFrame, columns: list[str],
                            by: list[str] | None = None) -> DataFrame:
    """Union sketch rows (one per batch / grain) into distinct
    estimates: ``(*by, column, n_distinct_est, n_rows_total)``. Filter
    the history to a window first for sliding answers ("last 7 daily
    rows"). The merge touches only sketch bytes — cost is independent
    of how much data the batches contained.
    """
    if not columns:
        raise ValueError("columns must be non-empty")
    aggs = [F.sum("n_rows").alias("n_rows_total")]
    for c in columns:
        aggs.append(F.hll_sketch_estimate(
            F.hll_union_agg(f"{c}__hll", F.lit(True)))
            .alias(f"{c}__est"))
    wide = history.groupBy(*by).agg(*aggs) if by else history.agg(*aggs)
    structs = [F.struct(F.lit(c).alias("column"),
                        F.col(f"{c}__est").alias("n_distinct_est"))
               for c in columns]
    return (wide.select(*(by or []), "n_rows_total",
                        F.explode(F.array(*structs)).alias("s"))
            .select(*(by or []),
                    F.col("s.column").alias("column"),
                    F.col("s.n_distinct_est").alias("n_distinct_est"),
                    "n_rows_total"))


def quantile_sketches(df: DataFrame, columns: list[str],
                      k: int = 200) -> DataFrame:
    """ONE row of KLL quantile sketches over DOUBLE-castable columns:
    per column a binary ``<col>__kll``. ``k=200`` ≈ 1.7% rank error.
    NULLs are skipped by the aggregate (never poison the sketch).
    """
    if not columns:
        raise ValueError("columns must be non-empty")
    aggs = [F.kll_sketch_agg_double(F.col(c).cast("double"), F.lit(k))
            .alias(f"{c}__kll") for c in columns]
    return df.agg(*aggs)


def merge_quantile_sketches(history: DataFrame, columns: list[str],
                            ps: list[float] = (0.5, 0.95, 0.99)
                            ) -> DataFrame:
    """Merge per-batch KLL rows and read quantiles off the merged
    sketch: ``(column, p, value)`` — corpus-lifetime percentiles with
    no rescan. Rank error is the sketch's (~1.7% at k=200), identical
    to having sketched the concatenated corpus once.
    """
    if not columns:
        raise ValueError("columns must be non-empty")
    # kll_merge_agg_double merges distributively (partial-aggregated,
    # no driver-side blob fold). On ZERO input rows it emits an empty
    # sketch buffer that get_quantile rejects, so an empty history (a
    # window matching no batches) is guarded to NULL → NULL quantiles.
    merged = history.agg(*[
        F.when(F.count(f"{c}__kll") > 0,
               F.kll_merge_agg_double(F.col(f"{c}__kll")))
        .alias(f"{c}__kll") for c in columns])
    structs = []
    for c in columns:
        for p in ps:
            structs.append(F.struct(
                F.lit(c).alias("column"),
                F.lit(float(p)).alias("p"),
                F.kll_sketch_get_quantile_double(
                    f"{c}__kll", F.lit(float(p))).alias("value")))
    return (merged.select(F.explode(F.array(*structs)).alias("s"))
            .select("s.column", "s.p", "s.value"))


def theta_sketches(df: DataFrame, columns: list[str],
                   lg_k: int = 12) -> DataFrame:
    """ONE row of Theta sketch blobs (``<col>__theta``) — like
    :func:`distinct_sketches` but supporting SET ALGEBRA on merge:
    theta sketches estimate unions, intersections AND differences,
    which HLL cannot (no difference operator)."""
    if not columns:
        raise ValueError("columns must be non-empty")
    aggs = [F.expr(f"theta_sketch_agg(CAST({c} AS STRING), {lg_k})")
            .alias(f"{c}__theta") for c in columns]
    return df.agg(*aggs)


def novelty_estimate(batch: DataFrame, corpus: DataFrame,
                     columns: list[str]) -> DataFrame:
    """How much of an arriving batch is NEW? Per column, from one
    batch theta-sketch row and one corpus theta-sketch row
    (:func:`theta_sketches` outputs): ``batch_distinct_est``,
    ``new_est`` (batch ∖ corpus — keys never seen before) and
    ``overlap_est`` (batch ∩ corpus — the dedup-able mass).

    The crawl-freshness / dedup-forecast question answered from two
    kilobyte blobs — no join against the standing corpus, no rescan.
    Estimates carry the sketches' relative error (~1.6% at lg_k=12).
    """
    if not columns:
        raise ValueError("columns must be non-empty")
    b = batch.select(*[F.col(f"{c}__theta").alias(f"b_{c}")
                       for c in columns])
    s = corpus.select(*[F.col(f"{c}__theta").alias(f"s_{c}")
                        for c in columns])
    j = b.crossJoin(s)      # 1 row × 1 row
    structs = [F.struct(
        F.lit(c).alias("column"),
        F.expr(f"theta_sketch_estimate(b_{c})")
        .alias("batch_distinct_est"),
        F.expr(f"theta_sketch_estimate(theta_difference(b_{c}, s_{c}))")
        .alias("new_est"),
        F.expr(f"theta_sketch_estimate("
               f"theta_intersection(b_{c}, s_{c}))")
        .alias("overlap_est")) for c in columns]
    return (j.select(F.explode(F.array(*structs)).alias("s"))
            .select("s.column", "s.batch_distinct_est", "s.new_est",
                    "s.overlap_est"))
