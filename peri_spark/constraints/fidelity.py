"""Row-fidelity stage: sha256(content) equality vs a reference pass
(north rule: "per-row fidelity is enforced by sha256 equality on content").

Both sides reduce to (key, sha256) before the join, so the shuffle carries
64-byte digests instead of file contents. Reference side may be a prior
run's output table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fidelity_violations", "with_sha256"]


def with_sha256(df: DataFrame, content_col: str = "content",
                out_col: str = "content_sha256") -> DataFrame:
    return df.withColumn(out_col, F.sha2(F.col(content_col), 256))


def fidelity_violations(df: DataFrame, reference: DataFrame,
                        keys: list[str], content_col: str = "content",
                        as_violations: bool = False) -> DataFrame:
    """Rows whose content hash differs from the reference pass (or that
    are missing from it)."""
    left = df.select(*keys, F.sha2(F.col(content_col), 256).alias("__sha"))
    right = reference.select(
        *keys, F.sha2(F.col(content_col), 256).alias("__ref_sha"))
    joined = left.join(right, keys, "left")
    bad = joined.where(F.col("__ref_sha").isNull()
                       | (F.col("__sha") != F.col("__ref_sha")))
    if not as_violations:
        return bad.select(*keys, "__sha", "__ref_sha")
    return bad.select(
        F.array(*[F.lit(k) for k in keys]).alias("path"),
        F.lit(content_col).alias("key"),
        F.when(F.col("__ref_sha").isNull(),
               F.lit("row missing from reference pass"))
         .otherwise(F.concat(F.lit("content sha256 mismatch: "),
                             F.col("__sha"), F.lit(" != "), F.col("__ref_sha")))
         .alias("message"),
        F.to_json(F.struct(
            F.col("__sha").alias("actual"),
            F.coalesce(F.col("__ref_sha"), F.lit("nil")).alias("expected")))
        .alias("content"))
