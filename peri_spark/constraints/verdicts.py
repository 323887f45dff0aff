"""Per-partition pass/fail verdicts over an annotated validation frame."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..engine import VIOLATIONS_COLUMN

__all__ = ["partition_verdicts", "compare_verdicts"]


def partition_verdicts(annotated: DataFrame, partition_cols: list[str] | str,
                       max_bad_ratio: float = 0.0) -> DataFrame:
    """Aggregate the annotated frame (``_violations`` array column) into one
    verdict row per partition: counts + pass/fail.

    One hash aggregate (partial+final); the violations array is reduced
    map-side so only per-partition counters shuffle.
    """
    pc = [partition_cols] if isinstance(partition_cols, str) else list(partition_cols)
    nviol = F.size(F.col(VIOLATIONS_COLUMN))
    agg = (annotated.groupBy(*pc).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((nviol > 0).cast("long")).alias("n_bad_rows"),
        F.sum(nviol).alias("n_violations")))
    return agg.select(
        *pc, "n_rows", "n_bad_rows", "n_violations",
        (F.col("n_bad_rows") / F.col("n_rows")).alias("bad_ratio"),
        (F.col("n_bad_rows") <= F.lit(max_bad_ratio) * F.col("n_rows"))
        .alias("passed"))


def compare_verdicts(current: DataFrame, previous: DataFrame,
                     partition_cols: list[str] | str) -> DataFrame:
    """Regression diff between two verdict frames (e.g. tonight's run vs
    last night's): one row per partition present in either run, with

    * ``status`` — ``regressed`` (passed → failed), ``fixed`` (failed →
      passed), ``still_failing``, ``still_passing``, ``added`` (only in
      current), ``removed`` (only in previous)
    * ``n_bad_rows`` / ``prev_n_bad_rows`` and ``bad_delta`` (NULL when
      the partition is absent on one side)

    The operational question a nightly 100 TB validation answers is not
    "how many violations" but "what CHANGED" — `regressed` rows page
    someone, `still_failing` rows don't.

    Plan shape: verdict frames are already aggregates (one row per
    partition), so this full-outer join shuffles only partition-count
    rows; at 10^6 partitions that is still broadcast-size, and AQE picks
    the strategy.
    """
    pc = [partition_cols] if isinstance(partition_cols, str) \
        else list(partition_cols)
    cur = current.select(
        *pc, F.col("n_bad_rows").alias("n_bad_rows"),
        F.col("passed").alias("__cur_passed"), F.lit(True).alias("__in_cur"))
    prev = previous.select(
        *pc, F.col("n_bad_rows").alias("prev_n_bad_rows"),
        F.col("passed").alias("__prev_passed"), F.lit(True).alias("__in_prev"))
    j = cur.join(prev, on=pc, how="full_outer")
    status = (
        F.when(F.col("__in_cur").isNull(), "removed")
        .when(F.col("__in_prev").isNull(), "added")
        .when(F.col("__prev_passed") & ~F.col("__cur_passed"), "regressed")
        .when(~F.col("__prev_passed") & F.col("__cur_passed"), "fixed")
        .when(~F.col("__cur_passed"), "still_failing")
        .otherwise("still_passing"))
    return j.select(
        *pc, status.alias("status"), "n_bad_rows", "prev_n_bad_rows",
        (F.col("n_bad_rows") - F.col("prev_n_bad_rows")).alias("bad_delta"))
