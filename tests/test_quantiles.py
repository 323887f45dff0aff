"""column_quantiles: exact vs approx, NULL handling, input validation."""
import pytest
from pyspark.sql import functions as F

from peri_spark.constraints import column_quantiles


def test_exact_quantiles_known_values(spark):
    df = spark.createDataFrame([(float(i),) for i in range(1, 6)], "v double")
    out = column_quantiles(df, ["v"], (0.0, 0.5, 0.75, 1.0), exact=True)
    got = {r["p"]: r["value"] for r in out.collect()}
    assert got == {0.0: 1.0, 0.5: 3.0, 0.75: 4.0, 1.0: 5.0}


def test_approx_matches_exact_on_small_input(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], "v double")
    ex = {(r["column"], r["p"]): r["value"] for r in
          column_quantiles(df, ["v"], (0.5,), exact=True).collect()}
    ap = {(r["column"], r["p"]): r["value"] for r in
          column_quantiles(df, ["v"], (0.5,)).collect()}
    # approx_percentile is exact when n << accuracy
    assert abs(ex[("v", 0.5)] - ap[("v", 0.5)]) <= 1.0


def test_nulls_ignored_and_all_null_column(spark):
    df = spark.createDataFrame([(1.0, None), (3.0, None), (None, None)],
                               "a double, b double")
    out = column_quantiles(df, ["a", "b"], (0.5,), exact=True)
    got = {r["column"]: r["value"] for r in out.collect()}
    assert got == {"a": 2.0, "b": None}


def test_single_pass_plan(spark):
    """All columns' sketches ride ONE aggregate — no per-column scan."""
    df = spark.createDataFrame([(1.0, 2.0)], "a double, b double")
    out = column_quantiles(df, ["a", "b"], (0.5, 0.9))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") + plan.count("LocalTableScan") <= 1


def test_rejects_non_numeric_and_empty(spark):
    df = spark.createDataFrame([("x", 1.0)], "s string, v double")
    with pytest.raises(ValueError, match="not numeric"):
        column_quantiles(df, ["s"])
    with pytest.raises(ValueError, match="non-empty"):
        column_quantiles(df, [])
    with pytest.raises(ValueError, match="probs must be non-empty"):
        column_quantiles(df, ["v"], ())
    with pytest.raises(ValueError, match=r"in \[0, 1\]"):
        column_quantiles(df, ["v"], (0.5, 1.5))
