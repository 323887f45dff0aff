"""Deeper reference-parity cases: transforms inside combinators
(peri_test.exs:1852-2158), 2-arity callbacks (nested_list_callback_test),
error content maps, enum type option, multi nested-branch errors."""

import json

from pyspark.sql import Row, functions as F

import peri_spark as ps
from peri_spark import ColFn, Expr

from conftest import viol_set


def one_row(spark, ddl, *rows):
    return spark.createDataFrame(list(rows), ddl)


# -- transforms inside combinators (peri_test.exs:2077-2158) -------------------

def test_transform_inside_either_branch(spark):
    df = one_row(spark, "v string", ("abc",), ("x",))
    schema = {"v": ("either", (
        ("string", [("min", 3), ("transform", "upper")]),
        "string"))}
    res = ps.validate(df, schema)
    assert sorted(r.v for r in res.valid.collect()) == ["ABC", "x"]


def test_transform_inside_oneof_first_match_wins(spark):
    df = one_row(spark, "v long", (5,), (50,))
    schema = {"v": ("oneof", [
        ("integer", [("lt", 10), ("transform", ColFn(lambda c: c * 100))]),
        ("integer", [("transform", ColFn(lambda c: c * -1))]),
    ])}
    res = ps.validate(df, schema)
    assert sorted(r.v for r in res.valid.collect()) == [-50, 500]


def test_transform_in_nested_schema(spark):
    df = one_row(spark, "u struct<name:string>", (("ada",),))
    res = ps.validate(df, {"u": {"name": ("string", ("transform", "upper"))}})
    assert res.valid.collect()[0].u.name == "ADA"


def test_transform_chained_with_default(spark):
    df = one_row(spark, "s string", (None,))
    res = ps.validate(
        df, {"s": ("string", [("default", "pad"), ("transform", "upper")])})
    assert res.valid.collect() == [Row(s="PAD")]


# -- 2-arity callbacks: (current, root) (nested_list_callback_test.exs) --------

def test_cond_expr_over_root_sibling(spark):
    df = one_row(spark, "plan string, seats long",
                 ("team", None), ("solo", None))
    schema = {"plan": "string",
              "seats": ("cond", Expr("plan = 'team'"),
                        ("required", "integer"), "any")}
    res = ps.validate(df, schema)
    assert viol_set(res, "plan") == {
        ("team", ("seats",), "seats", "is required, expected type of :integer")}


def test_dependent4_two_arity_gets_value_and_dependent(spark):
    df = one_row(spark, "a long, b long", (1, 2), (5, 5))
    cb = {"cond": ColFn(lambda v, root: v < root("b")),
          "error": "a must be less than b"}
    schema = {"a": ("dependent", "b", cb, "integer"), "b": "integer"}
    res = ps.validate(df, schema)
    assert viol_set(res, "a") == {(5, ("a",), "a", "a must be less than b")}


# -- error content maps (custom_errors_test.exs / error_to_map) ----------------

def test_violation_content_json(spark):
    df = one_row(spark, "age long", (10,))
    res = ps.validate(df, {"age": ("integer", ("range", (18, 99)))})
    row = res.violations().collect()[0]
    assert json.loads(row["content"]) == {"max": "99", "min": "18"}


def test_enum_content_carries_actual_and_choices(spark):
    df = one_row(spark, "r string", ("zz",))
    res = ps.validate(df, {"r": ("enum", ["a", "b"])})
    c = json.loads(res.violations().collect()[0]["content"])
    assert c["actual"] == '"zz"' and c["choices"] == '["a", "b"]'


def test_required_content_expected(spark):
    df = one_row(spark, "x string", (None,))
    res = ps.validate(df, {"x": ("required", ("list", "string"))})
    row = res.violations().collect()[0]
    assert row["message"] == "is required, expected type of {:list, :string}"


# -- enum with type option (lib/peri.ex:1184-1192) ------------------------------

def test_enum_with_type_option(spark):
    df = one_row(spark, "lvl long", (2,), (9,))
    schema = {"lvl": ("enum", [1, 2, 3], {"type": ("integer", ("gte", 0))})}
    res = ps.validate(df, schema)
    assert [r["message"] for r in res.violations().collect()] == [
        "expected one of [1, 2, 3] received 9"]


def test_enum_error_override(spark):
    df = one_row(spark, "r string", ("zz",))
    res = ps.validate(df, {"r": ("enum", ["a"], {"error": "bad role"})})
    assert [r["message"] for r in res.violations().collect()] == ["bad role"]


# -- multi nested-branch errors (multi_test.exs) --------------------------------

def test_multi_branch_inner_violations_surface(spark):
    df = one_row(spark, "m struct<kind:string, num:long>", (("a", -1),))
    schema = {"m": ("multi", "kind", {
        "a": {"kind": "string", "num": ("integer", ("gte", 0))}})}
    res = ps.validate(df, schema)
    assert viol_set(res) == {
        (("m", "num"), "num", "should be greater then or equal to 0")}


# -- deep paths -----------------------------------------------------------------

def test_list_of_structs_with_inner_list_path(spark):
    df = one_row(spark, "o array<struct<tags:array<string>>>",
                 ([ (["ok"],), (["toolongtag"],) ],))
    schema = {"o": ("list", {"tags": ("list", ("string", ("max", 5)))})}
    res = ps.validate(df, schema)
    assert viol_set(res) == {
        (("o", "1", "tags", "0"), "tags", "should have the maximum length of 5")}


def test_permissive_nested_keeps_undeclared_struct_fields(spark):
    df = one_row(spark, "u struct<a:string, extra:long>", (("x", 7),))
    res = ps.validate(df, {"u": {"a": "string"}}, mode="permissive")
    row = res.valid.collect()[0]
    assert row.u.a == "x" and row.u.extra == 7
