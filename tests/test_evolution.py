"""schema_diff (schema-evolution gate) and evaluate_expectations (SLA
gate) — pure driver-side logic, no Spark session needed."""

import pytest

from peri_spark.suite import SuiteResult, evaluate_expectations
from peri_spark.walker import schema_diff

OLD = {
    "repo": ("required", "string"),
    "lang": ("enum", ["py", "ex"]),
    "meta": {"n": "integer", "gone": "string"},
}


def test_schema_diff_added_removed_changed():
    new = {
        "repo": ("required", "string"),
        "lang": ("enum", ["py", "ex", "go"]),       # retyped (wider enum)
        "meta": {"n": "float", "fresh": "string"},  # retype + add + remove
        "opt": "string",                            # added optional
    }
    d = schema_diff(OLD, new)
    assert set(d["added"]) == {"meta.fresh", "opt"}
    assert set(d["removed"]) == {"meta.gone"}
    assert set(d["changed"]) == {"lang", "meta.n"}
    assert d["changed"]["meta.n"] == {"old": ":integer", "new": ":float"}
    assert d["breaking"] is True


def test_schema_diff_identical_and_formatting_invariance():
    # bare option vs single-element list normalize to the same AST
    a = {"s": ("string", ("min", 1))}
    b = {"s": ("string", [("min", 1)])}
    d = schema_diff(a, b)
    assert not any((d["added"], d["removed"], d["changed"]))
    assert d["breaking"] is False


def test_schema_diff_requiredness():
    relaxed = schema_diff({"a": ("required", "string")}, {"a": "string"})
    assert relaxed["required_removed"] == ["a"]
    assert relaxed["breaking"] is False
    tightened = schema_diff({"a": "string"}, {"a": ("required", "string")})
    assert tightened["required_added"] == ["a"]
    assert tightened["breaking"] is True
    # ADDING a required key breaks old data too
    grown = schema_diff({"a": "string"},
                        {"a": "string", "b": ("required", "integer")})
    assert grown["breaking"] is True and "b" in grown["added"]


def _result(counters):
    return SuiteResult(validation=None, counters=counters)


def test_expectations_pass_and_ratio():
    res = _result({"n_rows": 1000, "n_bad_rows": 5,
                   "n_duplicate_keys": 0, "n_drift_groups": 3})
    rep = evaluate_expectations(res, {
        "n_bad_rows": ("ratio_lte", 0.01),
        "n_duplicate_keys": ("eq", 0),
        "n_drift_groups": ("lte", 10)})
    assert rep["passed"] is True
    ratio = next(c for c in rep["checks"] if c["counter"] == "n_bad_rows")
    assert ratio["actual"] == 0.005


def test_expectations_fail_closed_on_missing_counter():
    rep = evaluate_expectations(_result({"n_rows": 10}),
                                {"n_outliers:value": ("lte", 5)})
    assert rep["passed"] is False
    assert rep["checks"][0]["reason"] == "missing counter"


def test_expectations_ratio_without_n_rows_fails():
    rep = evaluate_expectations(_result({"n_bad_rows": 1}),
                                {"n_bad_rows": ("ratio_lte", 0.5)})
    assert rep["passed"] is False
    assert rep["checks"][0]["reason"] == "n_rows unavailable"


def test_expectations_unknown_op_raises():
    with pytest.raises(ValueError):
        evaluate_expectations(_result({"n_rows": 1}),
                              {"n_rows": ("approx", 1)})


def test_migration_impact_classifies_rows(spark):
    """v2 tightens the enum and adds a range: the breakage set must be
    exactly the rows valid under v1 but not v2."""
    from peri_spark.walker import migration_impact
    rows = [(1, "en", 5.0), (2, "xx", 5.0), (3, "en", 99.0),
            (4, "xx", 99.0)]
    df = spark.createDataFrame(rows, "id int, lang string, v double")
    v1 = {"id": ("required", "integer"), "lang": ("enum", ["en", "xx"]),
          "v": "float"}
    v2 = {"id": ("required", "integer"), "lang": ("enum", ["en"]),
          "v": ("float", ("lte", 50.0))}
    got = {r.status: r.n for r in
           migration_impact(df, v1, v2).collect()}
    # row1 ok->ok, row2 enum breaks, row3 range breaks, row4 both break
    assert got == {"still_valid": 1, "newly_invalid": 3}


def test_migration_impact_newly_valid(spark):
    from peri_spark.walker import migration_impact
    df = spark.createDataFrame([(1, None), (2, "a")],
                               "id int, s string")
    strict = {"id": ("required", "integer"), "s": ("required", "string")}
    relaxed = {"id": ("required", "integer"), "s": "string"}
    got = {r.status: r.n for r in
           migration_impact(df, strict, relaxed).collect()}
    assert got == {"still_valid": 1, "newly_valid": 1}
