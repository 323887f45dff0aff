"""sample_validate + partition_completeness tests."""

import pytest
from pyspark.sql import functions as F

from peri_spark.constraints import partition_completeness, sample_validate


def test_sample_validate_estimates_rate(spark):
    # 1000 rows, every 10th has a NULL required field -> true rate 0.1
    df = spark.createDataFrame(
        [(i, None if i % 10 == 0 else f"u{i}") for i in range(1000)],
        "id long, name string")
    schema = {"id": ("required", "integer"),
              "name": ("required", "string")}
    r = sample_validate(df, schema, "id", 0.5).collect()[0]
    assert 300 < r.n_sampled < 700            # hash coin ~ uniform
    assert r.bad_rate == pytest.approx(r.n_bad / r.n_sampled)
    assert 0.0 <= r.ci_low < r.bad_rate < r.ci_high <= 1.0
    assert r.ci_low < 0.1 < r.ci_high         # true rate inside the CI


def test_sample_validate_determinism_and_fraction_guard(spark):
    df = spark.createDataFrame([(i, "x") for i in range(100)],
                               "id long, name string")
    schema = {"name": ("required", "string")}
    a = sample_validate(df, schema, "id", 0.3).collect()[0]
    b = sample_validate(df, schema, "id", 0.3).collect()[0]
    assert a == b                              # same coin, same slice
    with pytest.raises(ValueError, match="fraction"):
        sample_validate(df, schema, "id", 0.0)


def test_sample_validate_empty_sample_is_null(spark):
    df = spark.createDataFrame([(None, "x")], "id long, name string")
    schema = {"name": ("required", "string")}
    r = sample_validate(df, schema, "id", 0.5).collect()[0]
    # NULL keys never sample; no evidence -> NULL rate, not 0.0
    assert r.n_sampled == 0 and r.bad_rate is None and r.ci_low is None


def test_partition_completeness_interior_gap(spark):
    df = spark.createDataFrame(
        [("2024-01-01",), ("2024-01-01",), ("2024-01-02",),
         ("2024-01-05",), (None,)], "d string")
    out = {str(r.partition): r for r in
           partition_completeness(df, "d").collect()}
    assert out["2024-01-01"].n_rows == 2 and out["2024-01-01"].present
    assert out["2024-01-03"].n_rows == 0 and not out["2024-01-03"].present
    assert out["2024-01-04"].n_rows == 0
    assert out["2024-01-05"].present
    assert out["None"].n_rows == 1            # NULL dates cannot hide
    assert len(out) == 6                      # 5-day spine + NULL row


def test_partition_completeness_pinned_range(spark):
    df = spark.createDataFrame([("2024-01-02",)], "d string")
    out = {str(r.partition): r.present for r in partition_completeness(
        df, "d", start="2024-01-01", end="2024-01-04").collect()}
    assert out == {"2024-01-01": False, "2024-01-02": True,
                   "2024-01-03": False, "2024-01-04": False}


def test_partition_completeness_spine_cap(spark):
    df = spark.createDataFrame([("2024-01-01",), ("9999-01-01",)],
                               "d string")
    with pytest.raises(Exception, match="max_buckets"):
        partition_completeness(df, "d", max_buckets=1000).collect()


def test_suite_with_completeness_all_paths(spark):
    from peri_spark.suite import ValidationSuite
    df = spark.createDataFrame(
        [(i, ["2024-01-01", "2024-01-02", "2024-01-04"][i % 3])
         for i in range(9)], "id int, d string")
    schema = {"id": ("required", "integer"), "d": ("required", "string")}
    for runner in ("run", "run_sequential"):
        suite = ValidationSuite(schema).with_completeness("d")
        res = (suite.run(df) if runner == "run"
               else suite.run(df, concurrent=False))
        assert res.counters["n_missing_partitions"] == 1   # Jan 3
        missing = [str(r.partition) for r in
                   res.completeness.where("NOT present").collect()]
        assert missing == ["2024-01-03"]


def test_completeness_pinned_start_empty_or_inverted(spark):
    """A pinned bound with no data, or a start past all observed data,
    is an empty expected window — report nothing, never crash."""
    empty = spark.createDataFrame([], "d string")
    assert partition_completeness(empty, "d",
                                  start="2024-01-01").collect() == []
    df = spark.createDataFrame([("2024-01-05",)], "d string")
    assert partition_completeness(df, "d",
                                  start="2024-02-01").collect() == []


def test_sample_validate_threshold_matches_hash_split_boundary(spark):
    """round(), not int-truncate: fraction 0.3 must include coin
    299999.99999999994-rounded boundary rows exactly like hash_split."""
    from peri_spark.functions.curation import _COIN_M, _coin, _threshold
    df = spark.createDataFrame([(i,) for i in range(5000)], "id long")
    frac = 0.3
    n_coin = df.where(_coin(F.col("id"), 42) < _threshold(frac)).count()
    schema = {"id": ("required", "integer")}
    r = sample_validate(df, schema, "id", frac).collect()[0]
    assert r.n_sampled == n_coin


def test_suggest_expectations_self_passes_and_gates(spark):
    """Suggested rules must pass on their own baseline, and a later
    degraded batch must fail the gate."""
    from peri_spark.suite import (ValidationSuite, evaluate_expectations,
                                  suggest_expectations)
    from pyspark.sql import functions as SF
    good = spark.createDataFrame(
        [(i, "x" if i % 50 else None) for i in range(1000)],
        "id long, name string")
    schema = {"id": ("required", "integer"),
              "name": ("required", "string")}
    base = ValidationSuite(schema).run(good)
    rules = suggest_expectations(base)
    assert evaluate_expectations(base, rules)["passed"]
    # degraded batch: half the rows, 30% nulls
    bad = spark.createDataFrame(
        [(i, None if i % 3 == 0 else "x") for i in range(400)],
        "id long, name string")
    res2 = ValidationSuite(schema).run(bad)
    verdict = evaluate_expectations(res2, rules)
    assert not verdict["passed"]
    failed = {ch["counter"] for ch in verdict["checks"] if not ch["ok"]}
    assert "n_rows" in failed          # row-count collapse caught


def test_suggest_expectations_self_pass_at_scale():
    """100M rows with 1 bad row: the ratio rule must not round to 0.0
    and fail its own baseline (review finding)."""
    from peri_spark.suite import SuiteResult, evaluate_expectations, \
        suggest_expectations
    res = SuiteResult(validation=None,
                      counters={"n_rows": 100_000_000, "n_bad_rows": 1})
    rules = suggest_expectations(res)
    assert evaluate_expectations(res, rules)["passed"]
