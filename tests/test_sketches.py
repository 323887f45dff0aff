"""Mergeable sketch tests: fold-equals-rebuild + tolerance vs exact."""

import pytest
from pyspark.sql import functions as F

from peri_spark.constraints import (distinct_sketches,
                                    merge_distinct_sketches,
                                    merge_quantile_sketches,
                                    quantile_sketches)


def test_distinct_fold_equals_rebuild(spark):
    """Sketching 3 disjoint batches and merging must estimate the same
    corpus as one whole-corpus sketch (associativity = resumability)."""
    full = spark.range(30000).select(
        (F.col("id") % 5117).alias("v"),
        (F.col("id") % 13).cast("string").alias("w"))
    batches = [full.where(f"id % 3 = {i}") for i in range(3)]
    hist = batches[0].transform(
        lambda d: distinct_sketches(d, ["v", "w"]))
    for b in batches[1:]:
        hist = hist.unionByName(distinct_sketches(b, ["v", "w"]))
    merged = {r.column: r for r in
              merge_distinct_sketches(hist, ["v", "w"]).collect()}
    whole = {r.column: r for r in merge_distinct_sketches(
        distinct_sketches(full, ["v", "w"]), ["v", "w"]).collect()}
    for c in ("v", "w"):
        assert merged[c].n_distinct_est == whole[c].n_distinct_est
    assert merged["v"].n_rows_total == 30000
    # within HLL tolerance of the exact answers
    assert abs(merged["v"].n_distinct_est - 5117) / 5117 < 0.05
    assert merged["w"].n_distinct_est == 13


def test_quantile_merge_within_rank_tolerance(spark):
    full = spark.range(20000).select(F.col("id").cast("double").alias("x"))
    batches = [full.where(f"CAST(x AS BIGINT) % 4 = {i}") for i in range(4)]
    hist = quantile_sketches(batches[0], ["x"])
    for b in batches[1:]:
        hist = hist.unionByName(quantile_sketches(b, ["x"]))
    got = {r.p: r.value for r in
           merge_quantile_sketches(hist, ["x"]).collect()}
    for p, v in got.items():
        assert abs(v - p * 20000) < 0.03 * 20000   # ~rank error bound


def test_sketches_null_and_arg_handling(spark):
    df = spark.createDataFrame([(1.0,), (None,), (2.0,)], "x double")
    sk = quantile_sketches(df, ["x"])
    got = merge_quantile_sketches(sk, ["x"], ps=[0.0, 1.0]).collect()
    vals = {r.p: r.value for r in got}
    assert vals[0.0] == 1.0 and vals[1.0] == 2.0   # NULL skipped
    with pytest.raises(ValueError, match="non-empty"):
        distinct_sketches(df, [])


def test_novelty_estimate(spark):
    """Batch vs standing corpus: 2000 keys of which 500 are brand new."""
    from peri_spark.constraints import novelty_estimate, theta_sketches
    corpus = spark.range(10000).select(F.col("id").alias("k"))
    batch = spark.range(8500, 10500).select(F.col("id").alias("k"))
    nov = novelty_estimate(theta_sketches(batch, ["k"]),
                           theta_sketches(corpus, ["k"]),
                           ["k"]).collect()[0]
    assert abs(nov.batch_distinct_est - 2000) / 2000 < 0.05
    assert abs(nov.new_est - 500) / 500 < 0.10
    assert abs(nov.overlap_est - 1500) / 1500 < 0.10


def test_novelty_disjoint_and_subset(spark):
    from peri_spark.constraints import novelty_estimate, theta_sketches
    corpus = spark.range(1000).select(F.col("id").alias("k"))
    disjoint = spark.range(5000, 5200).select(F.col("id").alias("k"))
    nov = novelty_estimate(theta_sketches(disjoint, ["k"]),
                           theta_sketches(corpus, ["k"]), ["k"]).collect()[0]
    assert nov.new_est == 200.0 and nov.overlap_est == 0.0
    subset = spark.range(100).select(F.col("id").alias("k"))
    nov2 = novelty_estimate(theta_sketches(subset, ["k"]),
                            theta_sketches(corpus, ["k"]), ["k"]).collect()[0]
    assert nov2.new_est == 0.0 and nov2.overlap_est == 100.0


def test_distinct_sketches_by_group_window_merge(spark):
    """Per-day sketch rows; a 2-day window merge answers 'distinct
    users over days 1-2' without touching day 0."""
    ev = spark.createDataFrame(
        [(d, u) for d in range(3) for u in range(d * 50, d * 50 + 100)],
        "day int, user int")
    daily = distinct_sketches(ev, ["user"], by=["day"])
    assert daily.count() == 3
    window = daily.where("day >= 1")
    got = merge_distinct_sketches(window, ["user"]).collect()[0]
    # days 1,2: users 50..149 and 100..199 -> 150 distinct
    assert abs(got.n_distinct_est - 150) <= 5
    assert got.n_rows_total == 200


def test_merge_quantile_sketches_empty_history(spark):
    """A window matching zero batches yields NULL quantiles, never an
    ANSI INVALID_ARRAY_INDEX error."""
    df = spark.createDataFrame([(1.0,)], "x double")
    hist = quantile_sketches(df, ["x"]).where("1 = 0")
    got = merge_quantile_sketches(hist, ["x"]).collect()
    assert [r.value for r in got] == [None, None, None]
