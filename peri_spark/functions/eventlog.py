"""Event-log analytics: cohort retention and funnels.

The consumers of a validated events table (SURVEY.md §2.6's north-rule
input) run exactly these next, and both are shuffle-lean when expressed
Spark-first:

* :func:`cohort_retention` — (cohort bucket × offset) distinct-user
  counts: two hash aggregates keyed on the user, no window, no join
  back to the raw stream.
* :func:`funnel` — ordered step matching ("signup → click → purchase"):
  per step one aggregate over the step's rows joined to the shrinking
  matched-user frame; AQE broadcasts the funnel side as it shrinks.
  No per-user Python, no UDFs.

All time math is integer microseconds over :func:`epoch_micros`
(tz-free for TIMESTAMP_NTZ parquet), so DuckDB oracles reproduce
every bucket boundary exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .timeseries import _bucket_of, _gap_us, epoch_micros

__all__ = ["cohort_retention", "funnel"]


def cohort_retention(df: DataFrame, user_col: str, ts_col: str,
                     bucket_seconds: float = 86400.0) -> DataFrame:
    """Retention matrix: users bucketed by their FIRST event's time
    bucket (the cohort), counted once per (cohort, offset) where
    offset = active bucket - cohort bucket.

    Output: (cohort, bucket_offset, n_users) — ``offset 0`` row is the
    cohort size, later offsets are "still active after N buckets".

    Scale shape: aggregate #1 keys on (user, bucket) — map-side
    combine collapses each user's events per bucket before any
    shuffle; a min-over-user window on that SMALL frame derives the
    cohort (same exchange, user-partitioned); aggregate #2 is over the
    (cohort, offset) pairs. The raw stream shuffles once, pre-reduced.
    NULL users/timestamps are dropped.
    """
    bus = _gap_us(bucket_seconds)
    per_bucket = (df.where(F.col(user_col).isNotNull()
                           & F.col(ts_col).isNotNull())
                  .select(F.col(user_col).alias("__u"),
                          _bucket_of(df, ts_col, bus).alias("__b"))
                  .distinct())
    cohort = F.min("__b").over(Window.partitionBy("__u"))
    mat = per_bucket.withColumn("__c", cohort)
    return (mat.groupBy(
                F.col("__c").alias("cohort"),
                (F.col("__b") - F.col("__c")).alias("bucket_offset"))
            .agg(F.count(F.lit(1)).alias("n_users")))


def funnel(df: DataFrame, user_col: str, ts_col: str, type_col: str,
           steps: list[str], *,
           within_seconds: float | None = None) -> DataFrame:
    """Ordered funnel: a user completes step k at the EARLIEST event of
    type ``steps[k]`` at-or-after their step k-1 completion time
    (``>=`` — simultaneous distinct events chain; timestamps are
    typically unique per user anyway).  ``within_seconds`` bounds the
    whole journey: step k must land within the window of the step-0
    time.

    Output: (step, step_index, n_users) — strictly non-increasing
    counts down the funnel.

    Scale shape: step 0 is one aggregate over its type's rows; each
    later step aggregates ITS type's rows joined to the matched-user
    frame from the previous step — a frame that only shrinks, which
    AQE broadcasts.  k steps = k aggregates over disjoint row subsets,
    never a self-join of the full stream.

    Execution (r6): the step-filtered event set localCheckpoints ONCE
    up front (it is bounded by the funnel-relevant rows, not the
    stream) — without the cut, step k's matched-frame lineage re-ran
    every earlier step's join against a fresh scan, O(k²) scans of the
    source for a k-step funnel. The function is therefore eager at
    call time (like ``bm25_topk``); results are unchanged.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    for a, b in zip(steps, steps[1:]):
        if a == b:
            # the >= match would let ONE event satisfy both copies of a
            # repeated step (same-event self-match); timestamps alone
            # can't distinguish "the same event" from "another event at
            # the same instant", so repeat-engagement funnels must
            # pre-derive distinct step labels (e.g. click#1/click#2 via
            # a row_number) instead
            raise ValueError(
                f"adjacent funnel steps must differ, got {a!r} twice")
    us = epoch_micros(df, ts_col)
    ev = df.where(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
                  & F.col(type_col).isin(steps)) \
        .select(F.col(user_col).alias("__u"), F.col(type_col).alias("__t"),
                us.alias("__us")) \
        .localCheckpoint(eager=True)

    def step_count(frame: DataFrame, step: str, idx: int) -> DataFrame:
        return frame.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(step).alias("step"),
            F.lit(idx).cast("int").alias("step_index"), "n_users")

    matched = (ev.where(F.col("__t") == steps[0])
               .groupBy("__u").agg(F.min("__us").alias("__m0")))
    prev_ts, deadline = "__m0", None
    if within_seconds is not None:
        matched = matched.withColumn(
            "__deadline", F.col("__m0") + F.lit(_gap_us(within_seconds)))
        deadline = "__deadline"
    out = step_count(matched, steps[0], 0)
    for i, step in enumerate(steps[1:], start=1):
        cur = f"__m{i}"
        rows = ev.where(F.col("__t") == step)
        j = rows.join(matched, "__u") \
            .where(F.col("__us") >= F.col(prev_ts))
        if deadline is not None:
            j = j.where(F.col("__us") <= F.col(deadline))
        keep = [F.min("__us").alias(cur)] + \
            ([F.first(deadline).alias(deadline)] if deadline else [])
        matched = j.groupBy("__u").agg(*keep)
        out = out.unionByName(step_count(matched, step, i))
        prev_ts = cur
    return out
