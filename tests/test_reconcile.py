"""table_diff keyed reconciliation tests."""

import pytest

from peri_spark.constraints import table_diff


def _frames(spark):
    left = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None),
         (4, "d", 40.0), (None, "x", 0.0)],
        "k int, s string, v double")
    right = spark.createDataFrame(
        [(1, "a", 10.0),        # identical
         (2, "B", 20.0),        # s differs
         (3, "c", None),        # NULL == NULL -> equal
         (5, "e", 50.0),        # right-only
         (None, "x", 0.0)],     # NULL key never matches
        "k int, s string, v double")
    return left, right


def test_table_diff_counts(spark):
    left, right = _frames(spark)
    got = {r.column: r for r in table_diff(left, right, ["k"]).collect()}
    s, v = got["s"], got["v"]
    # key membership identical on every row: left-only = {4, NULL},
    # right-only = {5, NULL}, common = {1,2,3}
    for r in (s, v):
        assert (r.n_left_only, r.n_right_only, r.n_common) == (2, 2, 3)
    assert (s.n_equal, s.n_diff) == (2, 1)
    assert (v.n_equal, v.n_diff) == (3, 0)     # null-safe equal


def test_table_diff_compare_cols_default_intersection(spark):
    left, right = _frames(spark)
    right2 = right.withColumnRenamed("v", "w")   # v no longer shared
    out = table_diff(left, right2, ["k"])
    assert [r.column for r in out.collect()] == ["s"]


def test_table_diff_identical_frames(spark):
    left, _ = _frames(spark)
    clean = left.filter("k IS NOT NULL")
    got = {r.column: r for r in table_diff(clean, clean, ["k"]).collect()}
    for r in got.values():
        assert (r.n_left_only, r.n_right_only) == (0, 0)
        assert r.n_common == 4 and r.n_diff == 0


def test_table_diff_errors(spark):
    left, right = _frames(spark)
    with pytest.raises(ValueError, match="no shared"):
        table_diff(left.select("k"), right.select("k"), ["k"])
    with pytest.raises(ValueError, match="not in both"):
        table_diff(left, right, ["k"], compare_cols=["nope"])


def test_table_diff_single_aggregate_plan(spark):
    left, right = _frames(spark)
    plan = table_diff(left, right, ["k"]) \
        ._jdf.queryExecution().executedPlan().toString()
    # one join, one global aggregate, no window, no python
    assert "BatchEvalPython" not in plan and "Window" not in plan


def test_diff_rows_statuses(spark):
    from peri_spark.constraints import diff_rows
    left, right = _frames(spark)
    got = {r.k: (r.status, r.diff_columns) for r in
           diff_rows(left, right, ["k"]).where("k IS NOT NULL").collect()}
    assert got[2] == ("different", ["s"])
    assert got[4] == ("left_only", [])
    assert got[5] == ("right_only", [])
    assert 1 not in got and 3 not in got      # equal rows filtered out


def test_diff_rows_multi_column_disagreement(spark):
    from peri_spark.constraints import diff_rows
    l = spark.createDataFrame([(1, "a", 1.0)], "k int, s string, v double")
    r = spark.createDataFrame([(1, "b", 2.0)], "k int, s string, v double")
    row = diff_rows(l, r, ["k"]).collect()[0]
    assert row.status == "different" and row.diff_columns == ["s", "v"]


def test_table_diff_empty_inputs_report_zeros(spark):
    from peri_spark.constraints import table_diff
    empty = spark.createDataFrame([], "k int, v double")
    got = table_diff(empty, empty, ["k"]).collect()[0]
    assert (got.n_left_only, got.n_right_only, got.n_common,
            got.n_equal, got.n_diff) == (0, 0, 0, 0, 0)
