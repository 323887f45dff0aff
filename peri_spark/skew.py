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

__all__ = ["salted_repartition", "salted_shuffle_join", "recommended_conf"]


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
