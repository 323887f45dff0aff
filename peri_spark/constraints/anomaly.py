"""Metric anomaly detection over run history.

North rule: runs checkpoint per partition "with lineage and metrics
tables". The metrics table only pays for itself if something READS it —
this stage compares each metric's latest run value against its own
history and flags deviations, the nightly tripwire that catches a
silently drifting pipeline (row counts collapsing, violation rates
spiking) before a human would. Deequ ships the same idea as
"anomaly checks" on its MetricsRepository; the Elixir reference has no
cross-run state at all (single-record validation, lib/peri.ex:360).

Input is the long metric-history shape ``(*keys, order_col, value_col)``
— one row per (metric series, run). ``RunLedger.metrics()`` unpivots to
it trivially, but any metrics table works; the stage never assumes the
ledger schema.

Plan shape: ONE hash exchange on the series keys; the run ranking
(window) and the per-series aggregate reuse that partitioning. The
aggregate emits a handful of scalars per series — at 10^12 files the
metrics table is tiny by construction (runs × partitions × metrics),
so this stage costs noise next to the validation scan that produced it.

Both methods are engine-portable arithmetic (avg / stddev_samp /
division), so a SQL oracle reproduces every verdict bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["metric_anomalies"]


def metric_anomalies(history: DataFrame, keys: list[str],
                     order_col: str, value_col: str = "value",
                     method: str = "zscore", threshold: float = 3.0,
                     min_history: int = 3) -> DataFrame:
    """Flag each metric series whose LATEST value deviates from its
    prior history.

    - ``method="zscore"``: anomaly when ``|latest - mean(prior)| >
      threshold * stddev_samp(prior)``. Zero-variance history flags any
      change at all (the strictest reading — a constant series that
      moves IS the anomaly).
    - ``method="rate"``: anomaly when the relative change vs the
      IMMEDIATELY PREVIOUS run exceeds ``threshold`` (e.g. 0.5 = ±50%).
      A previous value of exactly 0 flags any nonzero latest.

    Rows: one per series — ``(*keys, latest_<order>, latest_value,
    n_prior, baseline, deviation, is_anomaly)`` where baseline/deviation
    are (prior mean, zscore) or (previous value, relative change) by
    method. Series with fewer than ``min_history`` prior runs get a
    NULL ``is_anomaly`` (insufficient history ≠ pass — mirrors the
    Benford stage's ``min_n`` convention).

    Ties on ``order_col`` within a series rank the larger value first
    (deterministic, engine-portable); NULL values are ignored entirely.
    """
    if method not in ("zscore", "rate"):
        raise ValueError(f"metric_anomalies: unknown method {method!r}")
    v, o = F.col(value_col), F.col(order_col)
    base = history.where(v.isNotNull() & o.isNotNull())
    w = Window.partitionBy(*keys).orderBy(o.desc(), v.desc())
    ranked = base.withColumn("__rn", F.row_number().over(w))
    rn, val = F.col("__rn"), F.col(value_col)
    prior = F.when(rn > 1, val)
    agg = (ranked.groupBy(*keys).agg(
        F.max(F.when(rn == 1, o)).alias(f"latest_{order_col}"),
        F.max(F.when(rn == 1, val)).alias("latest_value"),
        F.max(F.when(rn == 2, val)).alias("__prev"),
        F.count(prior).alias("n_prior"),
        F.avg(prior).alias("__mean"),
        F.stddev_samp(prior).alias("__std")))

    latest = F.col("latest_value")
    enough = F.col("n_prior") >= min_history
    if method == "zscore":
        mean, std = F.col("__mean"), F.col("__std")
        dev = F.when(std > 0, (latest - mean) / std)
        flag = (F.when(~enough, F.lit(None).cast("boolean"))
                .when(std > 0, F.abs(dev) > threshold)
                .otherwise(latest != mean))
        baseline, deviation = mean, dev
    else:
        prev = F.col("__prev")
        dev = F.when(prev != 0, (latest - prev) / F.abs(prev))
        flag = (F.when(~enough, F.lit(None).cast("boolean"))
                .when(prev != 0, F.abs(dev) > threshold)
                .otherwise(latest != 0))
        baseline, deviation = prev, dev
    return agg.select(
        *keys, f"latest_{order_col}", "latest_value", "n_prior",
        baseline.alias("baseline"),
        deviation.alias("deviation"),
        flag.alias("is_anomaly"))
