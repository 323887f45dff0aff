"""Round-3 features: :duration runtime validation, JSON-Schema
on_unsupported modes, sources path/identifier hardening, suite
exact_distinct forwarding, thread-safe lazy validation (VERDICT r02
next-round #3/#7 + ADVICE items)."""

import threading

import pytest
from pyspark.sql import functions as F

import peri_spark as ps


# ---------------------------------------------------------------------------
# :duration — Elixir Duration.from_iso8601 grammar parity
# ---------------------------------------------------------------------------


def test_duration_accepts_iso8601_forms(spark):
    """Parity with Elixir Duration.from_iso8601 (the canonical string →
    %Duration{} path; reference lib/peri.ex:790 validates the struct):
    signed components, fractional seconds, weeks; bare P / dangling T /
    misplaced units rejected."""
    good = ["P1Y2M3DT4H5M6S", "PT4.650S", "PT4,650S", "P3Y-2MT3H",
            "-PT10H-30M", "P2W", "P1D", "PT0S", "P-10DT4H", "+P1Y",
            "P1YT1S"]
    bad = ["P", "-P", "PT", "P1YT", "P5S",      # S without T
           "P1H",                                # H without T
           "PT3H5Y",                             # out of order
           "P1Y2Y",                              # duplicate designator
           "banana", "1Y", "P1.5Y",              # fraction on non-second
           "PT1H x"]                             # trailing garbage
    rows = [(i, s, True) for i, s in enumerate(good)] + \
           [(100 + i, s, False) for i, s in enumerate(bad)]
    df = spark.createDataFrame([(i, s) for i, s, _ in rows],
                               "id long, d string")
    res = ps.validate(df, {"d": "duration"}, mode="permissive")
    invalid = {r["id"] for r in res.invalid.select("id").collect()}
    assert invalid == {i for i, _s, okk in rows if not okk}


def test_time_and_duration_reject_trailing_newline(spark):
    """Java-regex `$` matches before a final line terminator, so `$`-
    anchored patterns accept \"P1D\\n\" — Elixir's parsers and the RE2
    oracle both reject it. The runtime checks anchor with \\z."""
    df = spark.createDataFrame(
        [(1, "P1D\n", "23:50:07\n"), (2, "P1D", "23:50:07")],
        "id long, d string, t string")
    res = ps.validate(df, {"d": "duration", "t": "time"}, mode="permissive")
    invalid = {r["id"] for r in res.invalid.select("id").collect()}
    assert invalid == {1}


def test_duration_violation_message_shape(spark):
    df = spark.createDataFrame([(1, "banana")], "id long, d string")
    res = ps.validate(df, {"d": "duration"}, mode="permissive")
    v = res.violations("id").collect()
    assert len(v) == 1
    assert v[0]["message"] == \
        'expected type of :duration received "banana" value'


def test_duration_interval_column_type_gates(spark):
    """True interval columns pass the static gate with no runtime regex
    stage (they are durations by construction) — both the day-time and
    year-month halves of %Duration{}."""
    df = spark.sql("SELECT 1 AS id, INTERVAL '10 04:30:00' "
                   "DAY TO SECOND AS d, INTERVAL '1-2' YEAR TO MONTH AS ym")
    res = ps.validate(df, {"d": "duration", "ym": "duration"},
                      mode="permissive")
    assert res.invalid.count() == 0


# ---------------------------------------------------------------------------
# JSON-Schema on_unsupported + exclude_meta_keys (encoder.ex:27,288)
# ---------------------------------------------------------------------------


def test_json_schema_on_unsupported_omit_default():
    from peri_spark.dsl import Expr
    from peri_spark.json_schema import to_json_schema
    schema = {"v": ("cond", Expr("x IS NOT NULL"), "string", "integer")}
    out = to_json_schema(schema)
    assert out["properties"]["v"] == {}          # true schema


def test_json_schema_on_unsupported_true_schema_alias():
    from peri_spark.dsl import ColFn
    from peri_spark.json_schema import to_json_schema
    schema = {"v": ("custom", {"cond": ColFn(lambda v: v > 0),
                               "message": "bad"})}
    out = to_json_schema(schema, on_unsupported="true_schema")
    assert out["properties"]["v"] == {}


def test_json_schema_on_unsupported_raise():
    from peri_spark.dsl import Expr
    from peri_spark.json_schema import UnsupportedTypeError, to_json_schema
    schema = {"v": ("cond", Expr("x IS NOT NULL"), "string", "integer")}
    with pytest.raises(UnsupportedTypeError) as ei:
        to_json_schema(schema, on_unsupported="raise")
    assert "cond" in str(ei.value)


def test_unsupported_type_error_pickles():
    """Spark tasks / multiprocessing ship exceptions by pickle — the
    cls(*args) replay must reconstruct the error."""
    import pickle
    from peri_spark.json_schema import UnsupportedTypeError
    e = UnsupportedTypeError("cond", "dynamic schema")
    e2 = pickle.loads(pickle.dumps(e))
    assert e2.tag == "cond" and e2.reason == "dynamic schema"
    assert str(e2) == str(e) == \
        "cannot encode 'cond' to JSON Schema: dynamic schema"


def test_json_schema_on_unsupported_invalid_mode():
    from peri_spark.json_schema import to_json_schema
    with pytest.raises(ValueError):
        to_json_schema({"v": "string"}, on_unsupported="explode")


def test_json_schema_exclude_meta_keys():
    from peri_spark.json_schema import to_json_schema
    schema = {"v": ("meta", ("string", ("default", "x")),
                    {"doc": "docs", "example": "ex"})}
    full = to_json_schema(schema)["properties"]["v"]
    assert full["description"] == "docs" and full["default"] == "x"
    slim = to_json_schema(schema, exclude_meta_keys=["default", "doc"])
    assert "default" not in slim["properties"]["v"]
    assert "description" not in slim["properties"]["v"]
    assert slim["properties"]["v"]["examples"] == ["ex"]


# ported encoder-mode cases from reference test/json_schema_test.exs


def test_json_schema_raise_on_dependent():
    """json_schema_test.exs:178-184."""
    from peri_spark.dsl import ColFn
    from peri_spark.json_schema import UnsupportedTypeError, to_json_schema
    cb = {"cond": ColFn(lambda v, root: v.isNotNull()), "error": "bad"}
    schema = {"a": ("dependent", "b", cb, "integer"), "b": "integer"}
    with pytest.raises(UnsupportedTypeError):
        to_json_schema(schema, on_unsupported="raise")
    # default still omits
    assert to_json_schema(schema)["properties"]["a"] == {}


def test_json_schema_meta_full_vocabulary():
    """json_schema_test.exs:150-169: camelCase renames, List.wrap for
    example, unknown keys dropped."""
    from peri_spark.json_schema import to_json_schema
    schema = {"f": ("meta", "string",
                    {"title": "T", "deprecated": True, "pattern": "^x",
                     "read_only": True, "write_only": False,
                     "content_encoding": "base64",
                     "content_media_type": "application/jwt",
                     "custom_internal": 1, "fromat": "uuid"})}
    prop = to_json_schema(schema)["properties"]["f"]
    assert prop == {"type": "string", "title": "T", "deprecated": True,
                    "pattern": "^x", "readOnly": True, "writeOnly": False,
                    "contentEncoding": "base64",
                    "contentMediaType": "application/jwt"}


def test_json_schema_examples_list_wrap():
    from peri_spark.json_schema import to_json_schema
    one = to_json_schema({"f": ("meta", "string", {"example": "a"})})
    many = to_json_schema({"f": ("meta", "string",
                                 {"examples": ["a", "b"]})})
    assert one["properties"]["f"]["examples"] == ["a"]
    assert many["properties"]["f"]["examples"] == ["a", "b"]


def test_json_schema_exclude_default_from_directive():
    """json_schema_test.exs:500-529: {:integer, {:default, 0}} with and
    without exclude_meta_keys=[:default]."""
    from peri_spark.json_schema import to_json_schema
    s = {"f": ("integer", ("default", 0))}
    assert to_json_schema(s)["properties"]["f"] == \
        {"type": "integer", "default": 0}
    assert to_json_schema(s, exclude_meta_keys=["default"])[
        "properties"]["f"] == {"type": "integer"}


def test_json_schema_exclude_preserves_other_meta():
    """json_schema_test.exs:512-524."""
    from peri_spark.json_schema import to_json_schema
    s = {"f": ("meta", ("integer", ("default", 0)),
               {"description": "count", "deprecated": True})}
    got = to_json_schema(s, exclude_meta_keys=["default"])["properties"]["f"]
    assert got == {"type": "integer", "description": "count",
                   "deprecated": True}
    got2 = to_json_schema(
        s, exclude_meta_keys=["default", "deprecated"])["properties"]["f"]
    assert got2 == {"type": "integer", "description": "count"}


# ---------------------------------------------------------------------------
# sources: path-vs-identifier resolution (ADVICE)
# ---------------------------------------------------------------------------


def test_relative_parquet_path_is_not_a_table(spark):
    """ADVICE: `documents.parquet` (slash-free, known extension) must
    load as a file path, not resolve as a catalog table."""
    import shutil
    from peri_spark.sources import is_table_identifier, load_table
    ref = "tmp_docs_r3.parquet"   # relative to the session's cwd
    spark.range(5).write.mode("overwrite").parquet(ref)
    try:
        assert not is_table_identifier(ref)
        assert load_table(spark, ref).count() == 5
    finally:
        shutil.rmtree(ref, ignore_errors=True)


def test_table_identifier_validation():
    from peri_spark.sources import is_table_identifier
    assert is_table_identifier("db.table")
    assert is_table_identifier("catalog.db.table")
    assert is_table_identifier("plain_table")
    # a DOTLESS ref is always an identifier — a table legitimately named
    # `csv`/`json` must not be rerouted to the filesystem, and the
    # decision never depends on what exists in the driver's cwd
    assert is_table_identifier("csv")
    assert is_table_identifier("json")
    assert is_table_identifier("tests")      # exists as a dir; still a table
    assert not is_table_identifier("a/b.parquet")
    assert not is_table_identifier("x.csv")
    assert not is_table_identifier("x.json")
    # SQL metacharacters never reach the FROM position as identifiers
    assert not is_table_identifier("t WHERE 1=1 --")
    assert not is_table_identifier("(select 1)")


def test_load_table_rejects_sql_injection(spark):
    from peri_spark.sources import load_table
    with pytest.raises(Exception):
        load_table(spark, "nonexistent_t; DROP TABLE x")


def test_load_table_quotes_identifier_parts(spark):
    """Pinned loads backtick-quote each dotted part, so identifier-shaped
    refs keep identifier semantics inside the interpolated SQL."""
    from peri_spark.sources import _quoted
    assert _quoted("cat.db.t") == "`cat`.`db`.`t`"


# ---------------------------------------------------------------------------
# suite: exact_distinct forwarding + thread-safe lazy validation (ADVICE)
# ---------------------------------------------------------------------------


def test_run_forwards_exact_distinct(spark):
    from peri_spark.suite import ValidationSuite
    df = spark.createDataFrame(
        [(i, f"g{i % 3}") for i in range(30)], "id long, g string")
    suite = (ValidationSuite({"id": ("required", "integer")},
                             mode="permissive")
             .with_stats(["g"], exact_distinct=True))
    res = suite.run(df)
    row = {r["column"]: r for r in res.stats.collect()}
    assert row["g"]["n_distinct"] == 3           # exact, not HLL estimate


def test_run_fused_exact_distinct_without_fusion_raises(spark):
    """The caller asked for exact n_distinct but the stat column is not
    part of the annotated frame — silently degrading to HLL (round-2
    behavior) is an error now."""
    from peri_spark.suite import ValidationSuite
    df = spark.createDataFrame(
        [(i, f"g{i % 3}", "x") for i in range(30)],
        "id long, g string, other string")
    suite = (ValidationSuite({"id": ("required", "integer")},
                             mode="permissive")
             .with_stats(["missing_col"], fused=True, exact_distinct=True)
             .with_partitioning("g"))
    with pytest.raises(ValueError, match="exact_distinct"):
        suite.run_fused(df)


def test_lazy_validation_is_threadsafe_and_typed(spark):
    from peri_spark.engine import ValidationResult
    from peri_spark.suite import ValidationSuite
    df = spark.createDataFrame(
        [(i, f"g{i % 3}") for i in range(30)], "id long, g string")
    suite = (ValidationSuite({"id": ("required", "integer")},
                             mode="permissive")
             .without_stats()
             .with_partitioning("g"))
    res = suite.run_fused(df)
    seen = []

    def grab():
        seen.append(res.validation_result())

    ts = [threading.Thread(target=grab) for _ in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert all(v is seen[0] for v in seen)       # compiled exactly once
    assert isinstance(seen[0], ValidationResult)  # public type contract
    assert isinstance(res.validation_result(), ValidationResult)
    # attribute-style access still works for existing callers
    assert res.validation.annotated is seen[0].annotated
    res.unpersist()
