"""Sampled validation with confidence intervals.

At 10^12 files a full validation sweep is a deliberate spend; the
operational pre-flight is "validate a deterministic slice, extrapolate
the violation rate, and only pay the full scan if the estimate clears
review". This stage runs the SAME compiled schema the full run uses
over a hash-coin sample (stable across runs/engines/cluster layouts —
the property a resumable pipeline needs, and what lets the DuckDB
oracle reproduce the exact sampled row set) and reports the bad-row
rate with a Wilson score interval.

Wilson rather than normal approximation: violation rates live near 0,
exactly where the normal interval collapses to a useless [p, p].

One pruned scan of the sampled slice; the aggregate is a single
partial-aggregated reduce — no shuffle carries row data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["sample_validate"]

# z for a 95% two-sided interval, spelled to double precision so the
# Spark plan literal and the SQL oracle literal are the same bits
Z95 = 1.959963984540054


def sample_validate(df: DataFrame, schema: dict, key_col: str,
                    fraction: float, seed: int = 42,
                    z: float = Z95) -> DataFrame:
    """Validate a deterministic ``fraction`` of ``df`` against
    ``schema`` and estimate the corpus violation rate.

    Returns one row: ``(n_sampled, n_bad, bad_rate, ci_low, ci_high)``
    — Wilson score bounds at confidence ``z``. Sampling is the same
    md5 hash coin as ``hash_split``/``stratified_sample`` keyed on
    ``key_col`` (NULL keys never sample — the full run owns their
    violations). An empty sample yields NULL rate/bounds, not zeros:
    no evidence is not evidence of health.
    """
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    from ..functions.curation import _coin, _threshold
    from ..engine import VIOLATIONS_COLUMN, validate

    coin = _coin(F.col(key_col), seed)
    # _threshold (round, not int-truncate) keeps the boundary coin value
    # identical to hash_split/stratified_sample and the SQL mirror
    sampled = df.where(coin < _threshold(fraction))
    res = validate(sampled, schema, mode="permissive")
    agg = res.annotated.agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum((F.size(VIOLATIONS_COLUMN) > 0).cast("long"))
        .alias("n_bad"))
    n = F.col("n_sampled").cast("double")
    bad = F.col("n_bad").cast("double")
    p = bad / n
    denom = F.lit(1.0) + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = (z * F.sqrt(p * (F.lit(1.0) - p) / n
                       + z * z / (4 * n * n))) / denom
    guard = F.col("n_sampled") > 0
    return agg.select(
        "n_sampled", "n_bad",
        F.when(guard, p).alias("bad_rate"),
        F.when(guard, F.greatest(F.lit(0.0), center - half))
        .alias("ci_low"),
        F.when(guard, F.least(F.lit(1.0), center + half))
        .alias("ci_high"))
