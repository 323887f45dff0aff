"""Skew handling for giant-repo keys (north rule: "skew from giant repos
is handled with salted repartitioning and AQE").

The code_files corpus is Zipf-skewed by construction (FIXTURES.md §F1:
two monorepos hold ~40% of rows). Where each technique applies:

- **Aggregations** (uniqueness, verdicts): Catalyst's partial+final hash
  aggregate already absorbs key skew map-side; explicit salting
  (``uniqueness_violations(salt_buckets=...)``) is for aggregates whose
  partial state doesn't combine cheaply.
- **Broadcast joins** (referential dims): inherently skew-immune — no
  shuffle of the fact side at all. Always the first choice.
- **Shuffle joins on a skewed key**: ``salted_shuffle_join`` (explicit,
  deterministic) or AQE's skew-join splitting
  (``spark.sql.adaptive.skewJoin.enabled``, automatic at runtime).
- **Writes / downstream partitioning**: ``salted_repartition`` spreads a
  hot key over N subpartitions to keep task sizes uniform.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_repartition", "salted_shuffle_join", "recommended_conf",
           "skew_report"]


def skew_report(df: DataFrame, columns: list[str],
                parallelism: int = 32) -> DataFrame:
    """Measure key skew per candidate join/partition column and
    recommend a salt-bucket count, one row per column:

    ``(column, n_rows, n_distinct, top_value, top_n, top_share,
    recommended_salt_buckets)``

    ``recommended_salt_buckets`` = how many average-task units the
    hottest key occupies — ``ceil(top_n * parallelism / n_rows)``
    clamped to [1, parallelism]: 1 means "no salting needed"; feed
    anything larger to :func:`salted_repartition` /
    :func:`salted_shuffle_join` (or trust AQE skew-join at runtime and
    keep this as the monitoring signal).

    One scan + one shuffle bounded by distinct values for ALL columns
    (same stacked-explode shape as ``top_values``); candidate columns
    are join/partition keys, which are low-cardinality relative to rows
    — don't point it at a unique id and expect a cheap answer.
    """
    if not columns:
        raise ValueError("columns must be non-empty")
    pairs = df.select(F.explode(F.array(*[
        F.struct(F.lit(c).alias("column"),
                 F.col(c).cast("string").alias("value"))
        for c in columns])).alias("p")).select("p.column", "p.value")
    counts = (pairs.where(F.col("value").isNotNull())
              .groupBy("column", "value")
              .agg(F.count(F.lit(1)).alias("n")))
    from pyspark.sql import Window
    w = Window.partitionBy("column").orderBy(F.col("n").desc(), "value")
    per_col = (counts.select(
        "column", "value", "n",
        F.row_number().over(w).alias("__rk"),
        F.sum("n").over(Window.partitionBy("column")).alias("n_rows"),
        F.count(F.lit(1)).over(Window.partitionBy("column"))
        .alias("n_distinct"))
        .where(F.col("__rk") == 1))
    share = F.col("n") / F.col("n_rows")
    rec = F.least(
        F.greatest(F.ceil(share * F.lit(parallelism)), F.lit(1)),
        F.lit(parallelism)).cast("int")
    return per_col.select(
        "column", "n_rows", F.col("n_distinct").cast("long"),
        F.col("value").alias("top_value"), F.col("n").alias("top_n"),
        F.round(share, 6).alias("top_share"),
        rec.alias("recommended_salt_buckets"))


def salted_repartition(df: DataFrame, cols: list[str], buckets: int,
                       num_partitions: int | None = None,
                       salt_col: str = "__salt") -> DataFrame:
    """Repartition by (cols…, salt) so one hot key spreads over up to
    ``buckets`` tasks. Salt is deterministic per row (hash of all
    columns), not random — reruns produce identical partitioning.
    Size ``num_partitions`` ≥ a few× buckets: salt values hash into
    partitions, so equal counts collide birthday-style."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]),
                  F.lit(buckets))
    parts = [F.col(c) for c in cols] + [F.col(salt_col)]
    out = df.withColumn(salt_col, salt)
    if num_partitions:
        return out.repartition(num_partitions, *parts)
    return out.repartition(*parts)


def salted_shuffle_join(fact: DataFrame, other: DataFrame,
                        on: list[str] | str, buckets: int = 16,
                        how: str = "inner") -> DataFrame:
    """Skew-safe shuffle join: the fact side salts its key, the other side
    replicates each row ``buckets`` times (one per salt value), and the
    join runs on (key…, salt). A key holding 40% of the fact now occupies
    ``buckets`` reducers instead of one.

    Use when the other side is too big to broadcast AND the key is skewed.
    Cost: ``buckets``× replication of the other side — keep it the smaller
    input.
    """
    on = [on] if isinstance(on, str) else list(on)
    fact_s = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]),
                         F.lit(buckets)))
    other_s = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))))
    joined = fact_s.join(other_s, on + ["__salt"], how)
    return joined.drop("__salt")


def recommended_conf(workers: int | None = None) -> dict[str, str]:
    """Cluster session conf for the validation pipeline (spark-submit
    ``--conf`` pairs): AQE with skew-join splitting, sane partition
    sizing for wide text rows."""
    conf = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "3",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.files.maxPartitionBytes": "128m",
        "spark.sql.parquet.filterPushdown": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "4096",
    }
    if workers:
        conf["spark.sql.shuffle.partitions"] = str(workers * 2)
    return conf
