"""Keyed two-table reconciliation (table diff).

The operational question after any migration, backfill, or engine swap
is "does the new table match the old one?" — the same question the
north rule's per-row fidelity check answers with sha256 on content,
asked table-wide: which keys exist on only one side, and per shared
column, how many common rows disagree. The Elixir reference validates
one record against one schema (lib/peri.ex:360) and has no two-dataset
operation; this is a SURVEY §2.6 table-level stage in the spirit of the
referential and fidelity checks.

Plan shape (the 100 TB contract): ONE full-outer shuffle join on the
key columns — the unavoidable cost of keyed reconciliation — then a
single partial-aggregated global aggregate producing a handful of
scalars; per-column counters all ride that one aggregate, so adding
columns adds zero jobs and zero extra scans. The wide one-row result
reshapes to (column, counts) rows via an in-plan inline explode — no
driver collect. If both tables are bucketed/partitioned on the keys,
Catalyst elides the exchanges entirely.

Key rows with a NULL key component never match (plain SQL equality in
the join) and therefore count as left-only/right-only — deterministic
and mirrored exactly by the SQL oracle. Keys are expected unique per
side (run the uniqueness stage first); duplicate keys join m×n and
inflate counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["table_diff", "diff_rows"]


def table_diff(left: DataFrame, right: DataFrame, keys: list[str],
               compare_cols: list[str] | None = None) -> DataFrame:
    """Reconcile ``left`` and ``right`` on ``keys``.

    Returns one row per compared column:
    ``(column, n_left_only, n_right_only, n_common, n_equal, n_diff)``
    where the key-membership counts repeat on every row (they are
    properties of the key sets, not the column) and
    ``n_equal + n_diff = n_common``. Column equality is null-safe:
    NULL == NULL counts as equal, NULL vs value as different.

    ``compare_cols`` defaults to every non-key column present in BOTH
    schemas (order = left schema order).
    """
    if compare_cols is None:
        rcols = set(right.columns)
        compare_cols = [c for c in left.columns
                        if c not in keys and c in rcols]
    if not compare_cols:
        raise ValueError("table_diff: no shared non-key columns")
    missing = [c for c in keys + compare_cols if c not in left.columns]
    missing += [c for c in keys + compare_cols if c not in right.columns]
    if missing:
        raise ValueError(f"table_diff: columns not in both frames: "
                         f"{sorted(set(missing))}")

    # SHUFFLE_HASH hint on both sides (round-6; guide §3.1): the
    # full-outer join degrades to sort-merge by default, paying a full
    # sort of BOTH sides on wide string keys. A shuffled hash join
    # skips both sorts; per-task build memory is one post-shuffle
    # partition (AQE sizes those to the advisory target, and keys are
    # expected unique per side), so the build fits wherever the
    # reconciliation itself is feasible. Row-identical output.
    l = left.select(*keys, *compare_cols,
                    F.lit(True).alias("__l")).hint("shuffle_hash").alias("l")
    r = right.select(*keys, *compare_cols,
                     F.lit(True).alias("__r")).hint("shuffle_hash").alias("r")
    cond = None
    for k in keys:
        c: Column = F.col(f"l.{k}") == F.col(f"r.{k}")
        cond = c if cond is None else (cond & c)
    j = l.join(r, cond, "full_outer")

    in_l = F.col("l.__l").isNotNull()
    in_r = F.col("r.__r").isNotNull()
    both = in_l & in_r
    # count() over the filtered condition, not sum() — sum over an
    # empty join is NULL, and a reconciliation of two empty partitions
    # must report zeros, not an indeterminate verdict
    aggs = [
        F.count(F.when(in_l & ~in_r, 1)).alias("__lo"),
        F.count(F.when(in_r & ~in_l, 1)).alias("__ro"),
        F.count(F.when(both, 1)).alias("__co"),
    ]
    for c in compare_cols:
        eq = F.col(f"l.{c}").eqNullSafe(F.col(f"r.{c}"))
        aggs.append(F.count(F.when(both & eq, 1)).alias(f"__eq_{c}"))
    wide = j.agg(*aggs)

    structs = [
        F.struct(F.lit(c).alias("column"),
                 F.col(f"__eq_{c}").alias("n_equal"))
        for c in compare_cols
    ]
    return (wide
            .select(F.col("__lo"), F.col("__ro"), F.col("__co"),
                    F.explode(F.array(*structs)).alias("s"))
            .select(F.col("s.column").alias("column"),
                    F.col("__lo").alias("n_left_only"),
                    F.col("__ro").alias("n_right_only"),
                    F.col("__co").alias("n_common"),
                    F.col("s.n_equal").alias("n_equal"),
                    (F.col("__co") - F.col("s.n_equal")).alias("n_diff")))


def diff_rows(left: DataFrame, right: DataFrame, keys: list[str],
              compare_cols: list[str] | None = None) -> DataFrame:
    """The row-level companion to :func:`table_diff`: every key that is
    NOT identical across the two tables, with why.

    Returns ``(*keys, status, diff_columns)`` where status is
    ``left_only`` / ``right_only`` / ``different`` and ``diff_columns``
    is the sorted list of disagreeing columns (empty for the membership
    statuses). Equal rows are filtered out map-side right after the
    join, so the output is sized by the disagreement, not the corpus —
    the frame a remediation job actually consumes. Same join shape and
    null-safe column semantics as ``table_diff``.
    """
    if compare_cols is None:
        rcols = set(right.columns)
        compare_cols = [c for c in left.columns
                        if c not in keys and c in rcols]
    if not compare_cols:
        raise ValueError("diff_rows: no shared non-key columns")

    # same SHUFFLE_HASH choice as table_diff (see comment there)
    l = left.select(*keys, *compare_cols,
                    F.lit(True).alias("__l")).hint("shuffle_hash").alias("l")
    r = right.select(*keys, *compare_cols,
                     F.lit(True).alias("__r")).hint("shuffle_hash").alias("r")
    cond = None
    for k in keys:
        c: Column = F.col(f"l.{k}") == F.col(f"r.{k}")
        cond = c if cond is None else (cond & c)
    j = l.join(r, cond, "full_outer")

    in_l = F.col("l.__l").isNotNull()
    in_r = F.col("r.__r").isNotNull()
    diff_cols = F.filter(
        F.array(*[F.when(~F.col(f"l.{c}").eqNullSafe(F.col(f"r.{c}")),
                         F.lit(c)) for c in compare_cols]),
        lambda x: x.isNotNull())
    status = (F.when(in_l & ~in_r, F.lit("left_only"))
              .when(in_r & ~in_l, F.lit("right_only"))
              .otherwise(F.lit("different")))
    key_cols = [F.coalesce(F.col(f"l.{k}"), F.col(f"r.{k}")).alias(k)
                for k in keys]
    return (j.select(*key_cols, status.alias("status"),
                     F.when(in_l & in_r, F.array_sort(diff_cols))
                     .otherwise(F.array().cast("array<string>"))
                     .alias("diff_columns"))
            .where((F.col("status") != "different")
                   | (F.size("diff_columns") > 0)))
