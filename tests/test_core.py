"""Core validation matrix — re-expresses the reference ExUnit cases
(/root/reference/test/peri_test.exs and friends, see SURVEY.md §5) as
pytest fixtures over 1-to-few-row DataFrames. Violations compare as sets
(reference error *ordering* is an implementation detail)."""

import pytest
from pyspark.sql import Row, functions as F

import peri_spark as ps
from peri_spark import ColFn, Expr, PandasFn

from conftest import viol_set


def one_row(spark, ddl, *rows):
    return spark.createDataFrame(list(rows), ddl)


# -- primitives & type errors (peri_test.exs:49-110) -------------------------

def test_simple_schema_valid(spark):
    df = one_row(spark, "name string, age long, email string",
                 ("John", 30, "john@example.com"))
    schema = {"name": "string", "age": "integer",
              "email": ("required", "string")}
    res = ps.validate(df, schema)
    assert res.conforms()
    assert res.valid.collect() == [Row(name="John", age=30, email="john@example.com")]


def test_optional_nil_passes(spark):
    df = one_row(spark, "name string, age long", (None, None))
    assert ps.validate(df, {"name": "string", "age": "integer"}).conforms()


def test_type_mismatch_static(spark):
    df = one_row(spark, "age string", ("thirty",))
    res = ps.validate(df, {"age": "integer"})
    vs = viol_set(res)
    assert (("age",), "age", 'expected type of :integer received "thirty" value') in vs


def test_numeric_type_strictness(spark):
    # :integer directive on a double column is a type error (regression #72,
    # reference test/peri_test.exs:2360-2384)
    df = one_row(spark, "n double", (1.0,))
    res = ps.validate(df, {"n": ("integer", ("gte", 0))})
    assert [r["message"] for r in res.violations().collect()] == [
        "expected type of :integer received 1.0 value"]
    # and :float on a long column
    df2 = one_row(spark, "n long", (1,))
    res2 = ps.validate(df2, {"n": ("float", ("gte", 0))})
    assert [r["message"] for r in res2.violations().collect()] == [
        "expected type of :float received 1 value"]


def test_boolean_and_date_types(spark):
    df = spark.sql("select true as b, date'2020-01-02' as d, timestamp'2020-01-02 03:04:05' as ts")
    assert ps.validate(df, {"b": "boolean", "d": "date", "ts": "datetime"}).conforms()


# -- required (peri_test.exs:284-343) ----------------------------------------

def test_required_missing_column(spark):
    df = one_row(spark, "name string", ("x",))
    res = ps.validate(df, {"name": "string", "email": ("required", "string")})
    assert viol_set(res) == {
        (("email",), "email", "is required, expected type of :string")}


def test_required_null_value(spark):
    df = one_row(spark, "email string", (None,))
    res = ps.validate(df, {"email": ("required", "string")})
    assert viol_set(res) == {
        (("email",), "email", "is required, expected type of :string")}


def test_required_default_conflict_is_schema_error(spark):
    with pytest.raises(ps.InvalidSchemaError, match="cannot set default value"):
        ps.validate_schema({"x": ("required", ("string", ("default", "a")))})


# -- literal (peri_test.exs:599) ---------------------------------------------

def test_literal(spark):
    df = one_row(spark, "status string", ("active",), ("inactive",), (None,))
    res = ps.validate(df, {"status": ("literal", "active")})
    msgs = sorted(r["message"] for r in res.violations().collect())
    assert msgs == [
        'expected literal value "active" but got "inactive"',
        'expected literal value "active" but got nil',
    ]


# -- enum (peri_test.exs:380-489) --------------------------------------------

def test_enum(spark):
    df = one_row(spark, "role string", ("admin",), ("root",), (None,))
    res = ps.validate(df, {"role": ("enum", ["admin", "user"])})
    assert viol_set(res) == {
        (("role",), "role",
         'expected one of ["admin", "user"] received "root"')}


def test_enum_integer(spark):
    df = one_row(spark, "lvl long", (1,), (9,))
    res = ps.validate(df, {"lvl": ("enum", [1, 2, 3])})
    assert [r["message"] for r in res.violations().collect()] == [
        "expected one of [1, 2, 3] received 9"]


# -- string constraints (peri_test.exs:2256-2359) ----------------------------

def test_string_constraints(spark):
    df = one_row(spark, "s string", ("ab",))
    assert ps.validate(df, {"s": ("string", [("min", 2), ("max", 3)])}).conforms()
    res = ps.validate(df, {"s": ("string", ("min", 3))})
    assert viol_set(res) == {(("s",), "s", "should have the minimum length of 3")}
    res = ps.validate(df, {"s": ("string", ("max", 1))})
    assert viol_set(res) == {(("s",), "s", "should have the maximum length of 1")}
    res = ps.validate(df, {"s": ("string", ("eq", "xy"))})
    assert viol_set(res) == {(("s",), "s", "should be equal to literal xy")}
    res = ps.validate(df, {"s": ("string", ("regex", r"^\d+$"))})
    assert viol_set(res) == {(("s",), "s", r"should match the ~r/^\d+$/ pattern")}


def test_multi_option_accumulates_all_failures(spark):
    # reference accumulates every failed option (peri_test.exs:2794-2827)
    df = one_row(spark, "s string", ("abcdef",))
    res = ps.validate(df, {"s": ("string", [("max", 3), ("regex", r"^\d+$")])})
    assert len(res.violations().collect()) == 2


# -- numeric constraints ------------------------------------------------------

@pytest.mark.parametrize("directive,val,msg", [
    (("integer", ("eq", 5)), 4, "should be equal to 5"),
    (("integer", ("neq", 4)), 4, "should be not equal to 4"),
    (("integer", ("gt", 5)), 5, "should be greater then 5"),
    (("integer", ("gte", 5)), 4, "should be greater then or equal to 5"),
    (("integer", ("lt", 5)), 5, "should be less then 5"),
    (("integer", ("lte", 5)), 6, "should be less then or equal to 5"),
    (("integer", ("range", (2, 4))), 5, "should be in the range of 2..4 (inclusive)"),
    (("integer", ("multiple_of", 3)), 4, "should be a multiple of 3"),
])
def test_numeric_constraint_messages(spark, directive, val, msg):
    df = one_row(spark, "n long", (val,))
    res = ps.validate(df, {"n": directive})
    assert viol_set(res) == {(("n",), "n", msg)}


def test_float_multiple_of_epsilon(spark):
    # quotient-round ε=1e-9 (reference lib/peri.ex:1435-1438)
    df = one_row(spark, "x double", (0.30000000000000004,), (0.31,))
    res = ps.validate(df, {"x": ("float", ("multiple_of", 0.1))})
    assert [r for r in res.invalid.select("x").collect()] == [Row(x=0.31)]


def test_multiple_of_zero_always_fails(spark):
    with pytest.raises(ps.InvalidSchemaError, match="multiple_of"):
        ps.validate_schema({"n": ("integer", ("multiple_of", 0))})


# -- defaults & transforms (peri_test.exs:1666-2158) --------------------------

def test_default_fills_null_then_validates(spark):
    df = one_row(spark, "role string", (None,), ("user",))
    res = ps.validate(df, {"role": ("string", ("default", "guest"))})
    assert sorted(r.role for r in res.valid.collect()) == ["guest", "user"]


def test_default_for_absent_column(spark):
    df = one_row(spark, "a string", ("x",))
    res = ps.validate(df, {"a": "string", "b": ("integer", ("default", 7))})
    assert res.valid.collect() == [Row(a="x", b=7)]


def test_default_callable(spark):
    df = one_row(spark, "n long", (None,))
    res = ps.validate(df, {"n": ("integer", ("default", lambda: 42))})
    assert res.valid.collect() == [Row(n=42)]


def test_transform_registry(spark):
    df = one_row(spark, "name string", ("john",))
    res = ps.validate(df, {"name": ("string", ("transform", "upper"))})
    assert res.valid.collect() == [Row(name="JOHN")]


def test_transform_colfn_with_root(spark):
    df = one_row(spark, "first string, last string", ("Ada", "Lovelace"))
    t = ColFn(lambda v, root: F.concat(v, F.lit(" "), root("last")))
    res = ps.validate(df, {"first": ("string", ("transform", t)),
                           "last": "string"})
    assert res.valid.collect()[0].first == "Ada Lovelace"


def test_transform_only_applies_when_valid(spark):
    df = one_row(spark, "s string", ("toolong",))
    res = ps.validate(df, {"s": ("string", [("max", 3), ("transform", "upper")])})
    assert res.invalid.select("s").collect() == [Row(s="toolong")]


def test_transform_pandas_fn(spark):
    df = one_row(spark, "n long", (2,), (3,))
    t = PandasFn(lambda s: s * 10, "long")
    res = ps.validate(df, {"n": ("integer", ("transform", t))})
    assert sorted(r.n for r in res.valid.collect()) == [20, 30]


# -- modes (permissive_mode_test.exs:20-190) -----------------------------------

def test_strict_drops_unknown_keys(spark):
    df = one_row(spark, "a string, zz string", ("x", "drop-me"))
    res = ps.validate(df, {"a": "string"})
    assert res.valid.columns == ["a"]


def test_permissive_passthrough(spark):
    df = one_row(spark, "a string, zz string", ("x", "keep-me"))
    res = ps.validate(df, {"a": ("string", ("transform", "upper"))},
                      mode="permissive")
    assert res.valid.collect() == [Row(a="X", zz="keep-me")]


def test_invalid_mode_raises(spark):
    df = one_row(spark, "a string", ("x",))
    with pytest.raises(ValueError, match="Invalid mode"):
        ps.validate(df, {"a": "string"}, mode="bogus")


# -- nested schemas (peri_test.exs:110-282, 2828-2913) -------------------------

def test_nested_struct(spark):
    df = one_row(spark, "user struct<name:string, age:long>",
                 (("John", 30),), ((None, 10),))
    schema = {"user": {"name": ("required", "string"),
                       "age": ("integer", ("gte", 18))}}
    res = ps.validate(df, schema)
    assert viol_set(res) == {
        (("user", "name"), "name", "is required, expected type of :string"),
        (("user", "age"), "age", "should be greater then or equal to 18"),
    }


def test_nested_null_parent_passes_when_optional(spark):
    df = one_row(spark, "user struct<name:string>", (None,))
    assert ps.validate(df, {"user": {"name": ("required", "string")}}).conforms()


def test_nested_defaults_materialize_on_null_parent(spark):
    # regression #40 analogue (reference test/peri_test.exs:2828-2913)
    df = one_row(spark, "settings struct<theme:string, lang:string>", (None,))
    schema = {"settings": {"theme": ("string", ("default", "light")),
                           "lang": "string"}}
    res = ps.validate(df, schema)
    row = res.valid.collect()[0]
    assert row.settings.theme == "light" and row.settings.lang is None


def test_nested_strict_projection(spark):
    df = one_row(spark, "u struct<a:string, zz:string>", (("x", "drop"),))
    res = ps.validate(df, {"u": {"a": "string"}})
    assert res.valid.schema["u"].dataType.fieldNames() == ["a"]


# -- lists (peri_test.exs:322, list_constraints_test.exs) ----------------------

def test_list_of_strings(spark):
    df = one_row(spark, "tags array<string>", (["a", "b"],))
    assert ps.validate(df, {"tags": ("list", "string")}).conforms()


def test_list_element_violations_carry_index_path(spark):
    df = one_row(spark, "ns array<long>", ([1, 99, 2, 100],))
    res = ps.validate(df, {"ns": ("list", ("integer", ("lt", 50)))})
    assert viol_set(res) == {
        (("ns", "1"), "ns", "should be less then 50"),
        (("ns", "3"), "ns", "should be less then 50"),
    }


def test_list_constraints(spark):
    df = one_row(spark, "xs array<long>", ([1],))
    res = ps.validate(df, {"xs": ("list", "integer", {"min": 2})})
    assert viol_set(res) == {(("xs",), "xs", "should have at least 2 items")}
    df2 = one_row(spark, "xs array<long>", ([1, 2, 3],))
    res2 = ps.validate(df2, {"xs": ("list", "integer", {"max": 2})})
    assert viol_set(res2) == {(("xs",), "xs", "should have at most 2 items")}
    df3 = one_row(spark, "xs array<long>", ([1, 1],))
    res3 = ps.validate(df3, {"xs": ("list", "integer", {"unique": True})})
    assert viol_set(res3) == {(("xs",), "xs", "should have unique items")}


def test_list_constraint_failure_suppresses_element_checks(spark):
    # reference: with :ok <- check_list_constraints (lib/peri.ex:1218-1225)
    df = one_row(spark, "xs array<long>", ([99, 99, 99],))
    res = ps.validate(df, {"xs": ("list", ("integer", ("lt", 5)), {"max": 2})})
    assert viol_set(res) == {(("xs",), "xs", "should have at most 2 items")}


def test_list_of_structs(spark):
    df = one_row(spark, "addr array<struct<city:string>>",
                 ([("NY",), (None,)],))
    res = ps.validate(df, {"addr": ("list", {"city": ("required", "string")})})
    assert viol_set(res) == {
        (("addr", "1", "city"), "city", "is required, expected type of :string")}


# -- maps (peri_test.exs:490-678) ----------------------------------------------

def test_map_values(spark):
    df = one_row(spark, "prefs map<string,string>", ({"a": "x", "b": None},))
    assert ps.validate(df, {"prefs": ("map", "string")}).conforms()


def test_map_key_value_types(spark):
    df = one_row(spark, "scores map<string,long>", ({"m": 1, "n": 900},))
    res = ps.validate(df, {"scores": ("map", "string", ("integer", ("lt", 100)))})
    assert viol_set(res) == {(("scores", "n"), "scores", "should be less then 100")}


# -- tuples (peri_test.exs:872) -------------------------------------------------

def test_tuple(spark):
    df = one_row(spark, "geo struct<_1:double,_2:double>", ((1.0, 200.0),))
    res = ps.validate(
        df, {"geo": ("tuple", [("float", ("lte", 90.0)), ("float", ("lte", 90.0))])})
    assert viol_set(res) == {
        (("geo",), "geo", "tuple element 1: should be less then or equal to 90.0")}


def test_tuple_arity_mismatch(spark):
    df = one_row(spark, "t struct<a:long,b:long,c:long>", ((1, 2, 3),))
    res = ps.validate(df, {"t": ("tuple", ["integer", "integer"])})
    assert viol_set(res) == {
        (("t",), "t", "expected tuple of size 2 received tuple with 3 length")}


# -- combinators (peri_test.exs:2428-2793, multi_test.exs) ----------------------

def test_either(spark):
    df = one_row(spark, "v string", ("hello",), ("x",))
    schema = {"v": ("either", (("string", ("min", 3)), ("string", ("eq", "x"))))}
    assert ps.validate(df, schema).conforms()
    df2 = one_row(spark, "v string", ("no",))
    res = ps.validate(df2, schema)
    assert [r["message"] for r in res.violations().collect()] == [
        'expected either :string or :string, got: "no"']


def test_either_across_types(spark):
    # either(:integer, :string) on a string column: string branch wins
    df = one_row(spark, "v string", ("abc",))
    assert ps.validate(df, {"v": ("either", ("integer", "string"))}).conforms()


def test_oneof(spark):
    df = one_row(spark, "v long", (5,), (500,))
    schema = {"v": ("oneof", [("integer", ("lt", 10)), ("integer", ("gt", 1000))])}
    res = ps.validate(df, schema)
    assert [r["message"] for r in res.violations().collect()] == [
        "expected one of :integer or :integer, got: 500"]


def test_cond(spark):
    df = one_row(spark, "is_premium boolean, limit long",
                 (True, None), (False, None))
    schema = {"is_premium": "boolean",
              "limit": ("cond", Expr("is_premium"), ("required", "integer"), "any")}
    res = ps.validate(df, schema)
    assert viol_set(res, "is_premium") == {
        (True, ("limit",), "limit", "is required, expected type of :integer")}


def test_dependent4_password_confirmation(spark):
    df = one_row(spark, "password string, confirmation string",
                 ("abc", "abc"), ("abc", "xyz"))
    cb = {"cond": ColFn(lambda v, root: v.eqNullSafe(root("password"))),
          "error": "passwords do not match"}
    schema = {"password": "string",
              "confirmation": ("dependent", "password", cb, "string")}
    res = ps.validate(df, schema)
    assert viol_set(res) == {
        (("confirmation",), "confirmation", "passwords do not match")}


def test_dependent_branches(spark):
    df = one_row(spark, "kind string, value string",
                 ("number", "12"), ("number", "abc"), ("text", "abc"))
    schema = {
        "kind": "string",
        "value": ("dependent", {
            "on": "kind",
            "branches": {"number": ("string", ("regex", r"^\d+$")),
                         "text": "string"},
        }),
    }
    res = ps.validate(df, schema)
    assert [r["message"] for r in res.violations().collect()] == [
        r"should match the ~r/^\d+$/ pattern"]


def test_custom_expr(spark):
    df = one_row(spark, "rating long", (5,), (15,))
    schema = {"rating": ("custom", {"cond": ColFn(lambda v: v < 10),
                                    "error": "invalid rating"})}
    res = ps.validate(df, schema)
    assert viol_set(res) == {(("rating",), "rating", "invalid rating")}


def test_custom_pandas(spark):
    def check(s):
        return (s % 2 == 0), "must be even"
    df = one_row(spark, "n long", (2,), (3,))
    res = ps.validate(df, {"n": ("custom", PandasFn(check))})
    assert viol_set(res) == {(("n",), "n", "must be even")}


def test_multi_dispatch(spark):
    df = one_row(
        spark, "msg struct<kind:string, num:long, txt:string>",
        (("a", 5, None),), (("b", None, "hi"),), (("zz", None, None),),
        ((None, None, None),))
    schema = {"msg": ("multi", "kind", {
        "a": {"kind": "string", "num": ("required", "integer")},
        "b": {"kind": "string", "txt": ("required", "string")},
    })}
    res = ps.validate(df, schema)
    msgs = sorted(r["message"] for r in res.violations().collect())
    assert msgs == [
        "missing :multi dispatch field :kind",
        'no :multi branch matches dispatch :kind="zz"; expected one of ["a", "b"]',
    ]


def test_ref(spark):
    ps.defschema("peri_test_address", {"city": ("required", "string")})
    df = one_row(spark, "addr struct<city:string>", ((None,),))
    res = ps.validate(df, {"addr": ("ref", "peri_test_address")})
    assert viol_set(res) == {
        (("addr", "city"), "city", "is required, expected type of :string")}


def test_meta_passthrough(spark):
    df = one_row(spark, "email string", (None,))
    schema = {"email": ("meta", ("required", "string"), {"doc": "Login email"})}
    res = ps.validate(df, schema)
    assert viol_set(res) == {
        (("email",), "email", "is required, expected type of :string")}


def test_error_override(spark):
    # custom error: option (custom_errors_test.exs:17-72)
    df = one_row(spark, "age long", (10,))
    res = ps.validate(df, {"age": ("integer", [("gte", 18), ("error", "must be adult")])})
    assert viol_set(res) == {(("age",), "age", "must be adult")}


# -- schema validation (peri_test.exs:1452) -------------------------------------

def test_validate_schema_rejects_garbage(spark):
    errs = ps.validate_schema_errors({"x": "not_a_type"})
    assert errs and "invalid schema definition" in errs[0].message


def test_validate_schema_ok():
    ps.validate_schema({"a": ("required", "string"),
                        "b": ("list", {"c": ("integer", ("gte", 0))})})


# -- bare directive / whole-row schema -------------------------------------------

def test_bare_directive_multi_at_top_level(spark):
    df = one_row(spark, "kind string, n long", ("a", 1), ("b", None))
    schema = ("multi", "kind", {
        "a": {"kind": "string", "n": "integer"},
        "b": {"kind": "string", "n": ("required", "integer")},
    })
    res = ps.validate(df, schema)
    assert [r["message"] for r in res.violations().collect()] == [
        "is required, expected type of :integer"]


def test_validate_column(spark):
    df = one_row(spark, "s string", ("xx",), ("y",))
    res = ps.validate_column(df, "s", ("string", ("min", 2)))
    assert res.invalid.count() == 1


def test_additional_keys_struct(spark):
    # {:schema, s, {:additional_keys, vt}} — reference lib/peri.ex:1272-1296
    df = one_row(spark, "cfg struct<host:string, retries:string, timeout:string>",
                 (("localhost", "3", "abc"),))
    schema = {"cfg": ("schema", {"host": ("required", "string")},
                      ("additional_keys", ("string", ("regex", r"^\d+$"))))}
    res = ps.validate(df, schema)
    assert viol_set(res) == {
        (("cfg", "timeout"), "timeout", r"should match the ~r/^\d+$/ pattern")}


def test_additional_keys_map(spark):
    df = one_row(spark, "cfg map<string,string>",
                 ({"host": "localhost", "retries": "3", "timeout": "abc"},))
    schema = {"cfg": ("schema", {"host": ("required", "string")},
                      ("additional_keys", ("string", ("regex", r"^\d+$"))))}
    res = ps.validate(df, schema)
    assert viol_set(res) == {
        (("cfg", "timeout"), "cfg", r"should match the ~r/^\d+$/ pattern")}
