"""skew_report recommendations and PSI drift semantics."""

import pytest

from peri_spark.constraints import psi_drift
from peri_spark.skew import skew_report


def test_skew_report_flags_hot_key(spark):
    rows = [("hot", i) for i in range(80)] + \
           [(f"k{i}", i) for i in range(20)]
    df = spark.createDataFrame(rows, "repo string, x long")
    r = {row.column: row for row in
         skew_report(df, ["repo"], parallelism=16).collect()}["repo"]
    assert r.top_value == "hot" and r.top_n == 80
    assert r.n_rows == 100 and r.n_distinct == 21
    assert r.top_share == 0.8
    # the hot key occupies 0.8*16 = 12.8 average tasks -> 13 buckets
    assert r.recommended_salt_buckets == 13


def test_skew_report_uniform_needs_no_salt(spark):
    df = spark.createDataFrame([(f"k{i % 10}",) for i in range(100)],
                               "repo string")
    r = skew_report(df, ["repo"], parallelism=8).collect()[0]
    assert r.recommended_salt_buckets == 1


def test_skew_report_validates_columns(spark):
    df = spark.createDataFrame([("a",)], "repo string")
    with pytest.raises(ValueError):
        skew_report(df, [])


def test_psi_detects_shifted_group(spark):
    # explicit uniform baseline; "flat" matches it, "shift" sits high
    from peri_spark.constraints import histogram
    rows = [("flat", float(i % 100)) for i in range(1000)] + \
           [("shift", 90.0 + (i % 10)) for i in range(1000)]
    df = spark.createDataFrame(rows, "src string, v double")
    base = histogram(df.where("src = 'flat'"), "v", 0.0, 100.0, 10)
    got = {r.group: r for r in
           psi_drift(df, "v", "src", lo=0.0, hi=100.0, buckets=10,
                     baseline=base, threshold=0.2).collect()}
    assert got["shift"].drifted and got["shift"].psi > 1.0
    assert not got["flat"].drifted and got["flat"].psi == 0.0
    assert got["flat"].critical == 0.2


def test_psi_zero_against_own_distribution(spark):
    rows = [("only", float(i % 50)) for i in range(500)]
    df = spark.createDataFrame(rows, "src string, v double")
    r = psi_drift(df, "v", "src", lo=0.0, hi=50.0, buckets=10).collect()[0]
    # the single group IS the baseline -> PSI exactly 0
    assert r.psi == 0.0 and not r.drifted
