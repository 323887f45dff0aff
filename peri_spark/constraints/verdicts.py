"""Per-partition pass/fail verdicts over an annotated validation frame."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..engine import VIOLATIONS_COLUMN

__all__ = ["partition_verdicts"]


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
