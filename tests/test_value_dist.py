"""value_distribution_stats tests."""

import math

import pytest

from peri_spark.constraints import value_distribution_stats


def test_value_distribution_metrics(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3), ("c", None), (None, 3)],
        "s string, i int")
    got = {r.column: r for r in
           value_distribution_stats(df, ["s", "i"]).collect()}
    s = got["s"]
    # values: a,a,b,c -> n=4, distinct=3
    assert (s.n_values, s.n_distinct) == (4, 3)
    expect = -(0.5 * math.log(0.5) + 2 * 0.25 * math.log(0.25))
    assert s.entropy == pytest.approx(expect)
    assert s.distinctness == pytest.approx(0.75)
    assert s.uniqueness == pytest.approx(0.5)          # b,c of 4 rows
    assert s.unique_value_ratio == pytest.approx(2 / 3)
    i = got["i"]
    # values: 1,2,3,3 -> singles 1,2
    assert (i.n_values, i.n_distinct) == (4, 3)
    assert i.uniqueness == pytest.approx(0.5)


def test_uniform_and_constant_columns(spark):
    df = spark.createDataFrame([(x, "k") for x in range(8)],
                               "u int, k string")
    got = {r.column: r for r in
           value_distribution_stats(df, ["u", "k"]).collect()}
    u = got["u"]
    assert u.entropy == pytest.approx(math.log(8))
    assert u.distinctness == 1.0 and u.uniqueness == 1.0
    k = got["k"]
    assert k.entropy == pytest.approx(0.0)
    assert k.unique_value_ratio == 0.0


def test_value_distribution_validates_and_plan(spark):
    df = spark.createDataFrame([(1,)], "x int")
    with pytest.raises(ValueError, match="non-empty"):
        value_distribution_stats(df, [])
    plan = value_distribution_stats(df, ["x"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 2
    assert "BatchEvalPython" not in plan


def test_suite_value_distribution_all_paths(spark):
    from peri_spark.suite import ValidationSuite
    df = spark.createDataFrame(
        [(i, ["a", "b", "c"][i % 3]) for i in range(30)],
        "id int, cat string")
    schema = {"id": ("required", "integer"), "cat": ("required", "string")}
    for runner in ("run", "run_sequential", "run_fused"):
        suite = (ValidationSuite(schema)
                 .with_value_distribution(["cat"]))
        if runner == "run_fused":
            suite = suite.with_partitioning("cat")
        if runner == "run":
            res = suite.run(df)
        elif runner == "run_sequential":
            res = suite.run(df, concurrent=False)
        else:
            res = suite.run_fused(df)
        rows = {r.column: r for r in res.value_dist.collect()}
        assert rows["cat"].n_distinct == 3
        assert res.counters.get("n_value_dist_cols") == 1


def test_all_null_column_still_reported(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None)], "x int, dead string")
    got = {r.column: r for r in
           value_distribution_stats(df, ["x", "dead"]).collect()}
    d = got["dead"]
    assert (d.n_values, d.n_distinct) == (0, 0)
    assert d.entropy is None and d.distinctness is None
    assert got["x"].n_values == 2
