"""top_values heavy-hitters stage: exactness, ties, nulls, suite wiring."""

import pytest

from peri_spark.constraints import top_values


def _df(spark):
    rows = [("a", "x"), ("a", "y"), ("a", None), ("b", "y"),
            ("b", "y"), ("c", "y"), (None, "z")]
    return spark.createDataFrame(rows, "lang string, src string")


def test_top_values_counts_and_ranks(spark):
    got = {(r.column, r.rank): (r.value, r.n)
           for r in top_values(_df(spark), ["lang", "src"], k=2).collect()}
    assert got[("lang", 1)] == ("a", 3)
    assert got[("lang", 2)] == ("b", 2)
    assert got[("src", 1)] == ("y", 4)
    assert got[("src", 2)] == ("x", 1)   # tie x/z at 1 -> value asc


def test_top_values_include_nulls_and_k1(spark):
    out = top_values(_df(spark), ["lang"], k=10, include_nulls=True)
    vals = {r.value: r.n for r in out.collect()}
    assert vals[None] == 1 and vals["a"] == 3
    one = top_values(_df(spark), ["lang"], k=1).collect()
    assert len(one) == 1 and one[0].value == "a"


def test_top_values_casts_non_strings(spark):
    df = spark.createDataFrame([(1,), (1,), (2,)], "n int")
    got = top_values(df, ["n"], k=1).collect()[0]
    assert got.value == "1" and got.n == 2


def test_top_values_validates_args(spark):
    with pytest.raises(ValueError):
        top_values(_df(spark), [], k=3)
    with pytest.raises(ValueError):
        top_values(_df(spark), ["lang"], k=0)


def test_suite_top_values_stage(spark):
    from peri_spark.suite import ValidationSuite
    df = _df(spark).withColumnRenamed("src", "source")
    suite = (ValidationSuite({"lang": ("required", "string")},
                             mode="permissive")
             .without_stats()
             .with_top_values(["lang", "source"], k=2))
    res = suite.run(df)
    assert res.top_values is not None
    assert res.counters["n_top_values"] == 4
    seq = suite.run(df, eager=True, concurrent=False)
    assert seq.counters["n_top_values"] == 4
    assert "top_values" in seq.timings


def test_run_fused_derives_top_values_from_value_groups(spark):
    """With exact-distinct fused stats, top_values must come from the
    GROUPING-SETS value groups (no separate corpus scan) and agree with
    the standalone stage row-for-row."""
    from peri_spark.constraints import top_values
    from peri_spark.suite import ValidationSuite
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    suite = (ValidationSuite({"doc_id": ("required", "integer")},
                             mode="permissive")
             .with_partitioning("source")
             .with_stats(["lang", "source"], fused=True,
                         exact_distinct=True)
             .with_top_values(["lang", "source"], k=3))
    res = suite.run_fused(docs)
    assert res.counters["n_top_values"] == 6
    fused = {(r.column, r.rank): (r.value, r.n)
             for r in res.top_values.collect()}
    standalone = {(r.column, r.rank): (r.value, r.n)
                  for r in top_values(docs, ["lang", "source"], 3).collect()}
    assert fused == standalone
    assert "top_values" in res.timings


def test_run_fused_top_values_fallback_scan(spark):
    """Without exact-distinct value groups the stage falls back to its
    own overlapped scan and still lands on the result."""
    from peri_spark.suite import ValidationSuite
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    suite = (ValidationSuite({"doc_id": ("required", "integer")},
                             mode="permissive")
             .with_partitioning("source")
             .without_stats()
             .with_top_values(["lang"], k=2))
    res = suite.run_fused(docs)
    assert res.counters["n_top_values"] == 2
    assert {r.column for r in res.top_values.collect()} == {"lang"}


def test_top_values_single_shuffle_plan(spark):
    plan = top_values(_df(spark), ["lang", "src"], k=2) \
        ._jdf.queryExecution().executedPlan().toString()
    # one exchange for the groupBy, one for the |columns|-group window
    assert plan.count("Exchange") <= 2
    assert "BatchEvalPython" not in plan
