"""Distribution-drift stage: per-group chi-square / KS vs a baseline histogram.

Everything stays JVM-side: bucketing is arithmetic on the scan, counts are
one hash aggregate, and the chi-square statistic is a sum over the (small)
group × bucket grid joined to a broadcast baseline. No pandas UDF — the
histogram *is* the sufficient statistic, so the Python-side math the north
rule allows (per-partition KS/chi-square) reduces to a JVM aggregate.

Bucket formula is plain arithmetic (not ``width_bucket``) so the DuckDB
oracle can reproduce it bit-for-bit.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["histogram", "chi_square_drift", "ks_drift", "ks_stat_from_obs",
           "psi_drift", "chi2_critical"]


def _bucket(col, lo: float, hi: float, nb: int):
    """Equal-width bucket index in [0, nb-1]; clamped at both ends.

    Null-safe: Spark's greatest/least IGNORE nulls (greatest(null,0)=0),
    which would silently drop null values into bucket 0 — guard first.
    """
    raw = F.floor((col - F.lit(lo)) / F.lit((hi - lo) / nb))
    clamped = F.least(F.greatest(raw, F.lit(0)), F.lit(nb - 1)).cast("int")
    return F.when(col.isNotNull(), clamped)


def histogram(df: DataFrame, value_col: str, lo: float, hi: float,
              buckets: int = 10) -> DataFrame:
    """(bucket, n, p) for non-null values — the stored-baseline format."""
    nn = df.where(F.col(value_col).isNotNull())
    h = (nn.groupBy(_bucket(F.col(value_col), lo, hi, buckets).alias("bucket"))
         .agg(F.count(F.lit(1)).alias("n")))
    total = nn.count()
    return h.select("bucket", "n", (F.col("n") / F.lit(float(total))).alias("p"))


def chi2_critical(dof: int, alpha: float = 0.01) -> float:
    """Chi-square upper quantile via the Wilson–Hilferty approximation
    (public formula; avoids a scipy dependency)."""
    z = {0.01: 2.3263478740408408, 0.05: 1.6448536269514722}[alpha]
    k = float(dof)
    return k * (1.0 - 2.0 / (9.0 * k) + z * math.sqrt(2.0 / (9.0 * k))) ** 3


def _grouped_counts(df: DataFrame, value_col: str, group_col: str,
                    lo: float, hi: float, buckets: int) -> DataFrame:
    nn = df.where(F.col(value_col).isNotNull())
    return (nn.groupBy(F.col(group_col).alias("group"),
                       _bucket(F.col(value_col), lo, hi, buckets).alias("bucket"))
            .agg(F.count(F.lit(1)).alias("obs")))


def _grid(obs: DataFrame, baseline: DataFrame) -> DataFrame:
    """Full group × bucket grid with observed (0-filled) and expected."""
    totals = obs.groupBy("group").agg(F.sum("obs").alias("total"))
    grid = totals.crossJoin(F.broadcast(baseline.select("bucket", "p")))
    return (grid.join(obs, ["group", "bucket"], "left")
            .select("group", "bucket", "total", "p",
                    F.coalesce(F.col("obs"), F.lit(0)).alias("obs"),
                    (F.col("total") * F.col("p")).alias("exp")))


def chi_square_drift(df: DataFrame, value_col: str, group_col: str,
                     lo: float, hi: float, buckets: int = 10,
                     baseline: DataFrame | None = None,
                     alpha: float = 0.01) -> DataFrame:
    """Per-group Pearson chi-square against the baseline histogram.

    ``baseline=None`` → the global distribution of ``df`` itself (each
    group tested against the whole), which makes the check self-contained.
    Returns (group, n, chi2, critical, drifted).

    Plan note: with a self-baseline, the global histogram and the
    per-group counts come out of ONE ``cube`` aggregation — a single scan
    and a single (partially-aggregated) shuffle; the grid join is a
    broadcast of the tiny histogram.
    """
    if baseline is None:
        nn = (df.where(F.col(value_col).isNotNull())
              .select(F.col(group_col).alias("group"),
                      _bucket(F.col(value_col), lo, hi, buckets)
                      .alias("bucket")))
        from pyspark.sql import Window

        cube = (nn.cube("group", "bucket")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.grouping("group").alias("__all_groups"),
                     F.grouping("bucket").alias("__all_buckets"))
                .where(F.col("__all_buckets") == 0))
        glob = cube.where(F.col("__all_groups") == 1).select("bucket", "n")
        # total via window over the tiny histogram — avoids a separate
        # collect job (driver round-trips serialize the whole suite)
        baseline = glob.select(
            "bucket", "n",
            (F.col("n") / F.sum("n").over(Window.partitionBy())).alias("p"))
        obs = (cube.where(F.col("__all_groups") == 0)
               .select("group", "bucket", F.col("n").alias("obs")))
    else:
        obs = _grouped_counts(df, value_col, group_col, lo, hi, buckets)
    grid = _grid(obs, baseline)
    per_group = (grid.where(F.col("exp") > 0)
                 .groupBy("group")
                 .agg(F.max("total").alias("n"),
                      F.sum((F.col("obs") - F.col("exp")) ** 2 / F.col("exp"))
                      .alias("chi2")))
    crit = chi2_critical(buckets - 1, alpha)
    return per_group.select(
        "group", "n", F.round("chi2", 6).alias("chi2"),
        F.lit(round(crit, 6)).alias("critical"),
        (F.col("chi2") > crit).alias("drifted"))


def ks_stat_from_obs(obs: DataFrame, baseline: DataFrame, m_total: int,
                     threshold: float | None = None) -> DataFrame:
    """KS statistic from pre-bucketed (group, bucket, obs) counts — the
    shared tail of ``ks_drift`` and the fused-suite derivation (which
    already holds the histogram as its grouped counter frame and must
    not rescan the corpus)."""
    from pyspark.sql import Window

    grid = _grid(obs, baseline)
    w = Window.partitionBy("group").orderBy("bucket")
    cdf = grid.select(
        "group", "bucket", "total",
        (F.sum("obs").over(w) / F.col("total")).alias("cdf_g"),
        F.sum("p").over(w).alias("cdf_b"))
    d = (cdf.groupBy("group")
         .agg(F.max("total").alias("n"),
              F.max(F.abs(F.col("cdf_g") - F.col("cdf_b"))).alias("ks")))
    c_alpha = 1.62762  # c(0.01) for the two-sample asymptotic form
    if threshold is not None:
        return d.select("group", "n", F.round("ks", 6).alias("ks"),
                        F.lit(threshold).alias("critical"),
                        (F.col("ks") > threshold).alias("drifted"))
    crit = F.lit(c_alpha) * F.sqrt((F.col("n") + F.lit(m_total))
                                   / (F.col("n") * F.lit(float(m_total))))
    return d.select("group", "n", F.round("ks", 6).alias("ks"),
                    F.round(crit, 6).alias("critical"),
                    (F.col("ks") > crit).alias("drifted"))


def psi_drift(df: DataFrame, value_col: str, group_col: str,
              lo: float, hi: float, buckets: int = 10,
              baseline: DataFrame | None = None,
              threshold: float = 0.2,
              epsilon: float = 1e-6) -> DataFrame:
    """Per-group Population Stability Index against the baseline
    histogram — the ML-monitoring standard companion to chi-square/KS:

    ``PSI = Σ_b (p_obs(b) - p_base(b)) · ln(p_obs(b) / p_base(b))``

    with ``epsilon``-smoothing on both proportions so empty buckets
    contribute a large-but-finite term instead of ±inf. Conventional
    reading: < 0.1 stable, 0.1–0.2 moderate shift, > 0.2 (the default
    ``threshold``) action-worthy drift.

    Returns (group, n, psi, critical, drifted). Same plan shape as
    ``chi_square_drift``: per-group bucket counts from one partial-
    aggregated shuffle, a broadcast grid join against the tiny
    baseline, and a per-group reduce over ≤ ``buckets`` rows.
    """
    if baseline is None:
        baseline = histogram(df, value_col, lo, hi, buckets)
    obs = _grouped_counts(df, value_col, group_col, lo, hi, buckets)
    grid = _grid(obs, baseline)
    p_obs = F.greatest(F.col("obs") / F.col("total"), F.lit(epsilon))
    p_base = F.greatest(F.col("p"), F.lit(epsilon))
    term = (p_obs - p_base) * F.log(p_obs / p_base)
    per_group = (grid.groupBy("group")
                 .agg(F.max("total").alias("n"),
                      F.sum(term).alias("psi")))
    return per_group.select(
        "group", "n", F.round("psi", 6).alias("psi"),
        F.lit(threshold).alias("critical"),
        (F.col("psi") > threshold).alias("drifted"))


def ks_drift(df: DataFrame, value_col: str, group_col: str,
             lo: float, hi: float, buckets: int = 64,
             baseline: DataFrame | None = None,
             threshold: float | None = None) -> DataFrame:
    """Per-group two-sample KS statistic on bucketed CDFs.

    D = max_b |CDF_group(b) - CDF_baseline(b)|; with ``threshold=None`` the
    asymptotic 1% critical value c(α)·sqrt((n+m)/(n·m)) is used per group.
    """
    if baseline is None:
        baseline = histogram(df, value_col, lo, hi, buckets)
    m_total = baseline.agg(F.sum("n")).collect()[0][0]
    obs = _grouped_counts(df, value_col, group_col, lo, hi, buckets)
    return ks_stat_from_obs(obs, baseline, m_total, threshold)
