"""Uniqueness stage: duplicate-key detection at scale.

The north rule calls for "uniqueness via salted hash-aggregate on
(repo, path, commit)". For a pure COUNT aggregate, Catalyst already does
map-side partial aggregation, which absorbs key skew before the shuffle —
so the default path is a plain two-phase ``groupBy(keys).count()``.

The *explicit* salted variant matters when the per-key state doesn't
partial-aggregate cheaply (collect-style aggs) or when a single key's
partial rows still overwhelm one reducer: we first aggregate on
``(keys, salt)`` (spreading one hot key over ``salt_buckets`` reducers),
then re-aggregate on ``keys``. Both phases are hash aggregates; AQE
handles residual imbalance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["uniqueness_violations"]


def uniqueness_violations(df: DataFrame, keys: list[str],
                          salt_buckets: int | None = None,
                          as_violations: bool = False,
                          hash_prefilter: bool = False) -> DataFrame:
    """Rows = duplicated key tuples with their multiplicity (``n_dups``).

    ``salt_buckets=K`` forces the explicit two-phase salted plan.
    ``as_violations=True`` emits Peri-shaped violation rows instead.

    ``hash_prefilter=True`` is the wide-key scale plan: phase 1 shuffles
    only ``xxhash64(keys)`` (8 bytes/row after map-side combine) and
    keeps the hashes seen more than once; phase 2 re-scans, joins on the
    (rare) hot hashes — AQE broadcasts the hot set when it is small —
    and re-counts by the EXACT keys, so hash collisions are weeded out
    and the result is identical to the default plan. Trades a second
    pruned-column scan for a ~(key width / 8B) shuffle reduction: the
    right trade when keys are wide strings and the corpus is 100 TB
    (shuffling hashes, not keys) — and measurable even single-node,
    where the shuffle's serialize+sort is memory-bandwidth-bound.
    """
    if hash_prefilter:
        h = F.xxhash64(*[F.col(k) for k in keys])
        hot = (df.select(h.alias("__h")).groupBy("__h")
               .agg(F.count(F.lit(1)).alias("__c"))
               .where(F.col("__c") > 1).select("__h"))
        dups = (df.select(*keys, h.alias("__h"))
                .join(hot, "__h")
                .groupBy(*keys).agg(F.count(F.lit(1)).alias("n_dups"))
                .where(F.col("n_dups") > 1))
    elif salt_buckets:
        salt = F.pmod(F.hash(F.monotonically_increasing_id()), salt_buckets)
        partial = (df.select(*keys).withColumn("__salt", salt)
                   .groupBy(*keys, "__salt").count())
        counts = (partial.groupBy(*keys)
                  .agg(F.sum("count").alias("n_dups")))
        dups = counts.where(F.col("n_dups") > 1)
    else:
        counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_dups"))
        dups = counts.where(F.col("n_dups") > 1)
    if not as_violations:
        return dups
    key_txt = ", ".join(keys)
    return dups.select(
        F.array(*[F.lit(k) for k in keys]).alias("path"),
        F.lit(key_txt).alias("key"),
        F.concat(F.lit(f"should be unique on ({key_txt}), found "),
                 F.col("n_dups").cast("string"),
                 F.lit(" occurrences of ("),
                 F.concat_ws(", ", *[F.col(k).cast("string") for k in keys]),
                 F.lit(")")).alias("message"),
        F.to_json(F.struct(
            F.col("n_dups").cast("string").alias("count"),
            *[F.col(k).cast("string").alias(k) for k in keys])).alias("content"))
