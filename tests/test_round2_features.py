"""Round-2 reference-parity features: callable error: overrides +
traverse_errors (test/custom_errors_test.exs:17-105), gen: overrides
(test/gen_overrides_test.exs), dynamic {:dependent, cb}
(lib/peri.ex:1001-1037), and grapheme-exact string length
(lib/peri.ex:879-893)."""

import pytest
from pyspark.sql import functions as F

import peri_spark as ps
from peri_spark.dsl import ColFn, Expr


# ---------------------------------------------------------------------------
# callable error: overrides (reference test/custom_errors_test.exs:17-72)
# ---------------------------------------------------------------------------


def email_msg(err):
    # MFA-analogue: builds the message from the error's runtime content
    return F.concat(F.lit("email is invalid (was: "), err.content,
                    F.lit(")"))


USER_SCHEMA = {
    "age": ("integer", [("gte", 18), ("error", "must be adult")]),
    "email": ("required", "string", email_msg),
    "nickname": ("string", [("min", 3), ("error", "too short")]),
}


@pytest.fixture(scope="module")
def users(spark):
    return spark.createDataFrame(
        [(1, 10, "a@b.io", None), (2, 20, None, None), (3, 20, "a@b.io", "ab")],
        "id long, age long, email string, nickname string")


def test_static_string_override(spark, users):
    res = ps.validate(users.where("id = 1"), USER_SCHEMA, mode="permissive")
    errs = res.errors("id")
    assert [e["message"] for e in errs] == ["must be adult"]
    assert errs[0]["key"] == "age"


def test_callable_override_receives_error_content(spark, users):
    res = ps.validate(users.where("id = 2"), USER_SCHEMA, mode="permissive")
    errs = res.errors("id")
    email = next(e for e in errs if e["key"] == "email")
    assert email["message"].startswith("email is invalid (was: ")
    assert "expected" in email["message"]  # content JSON interpolated


def test_static_override_on_string_constraint(spark, users):
    res = ps.validate(users.where("id = 3"), USER_SCHEMA, mode="permissive")
    errs = res.errors("id")
    assert [e["message"] for e in errs] == ["too short"]


def test_non_string_callable_result_keeps_default(spark, users):
    schema = {"age": ("integer", [("gte", 18), ("error", lambda e: 42)])}
    res = ps.validate(users.where("id = 1"), schema, mode="permissive")
    assert res.errors("id")[0]["message"] == \
        "should be greater then or equal to 18"


def test_validate_schema_rejects_non_string_non_callable_error():
    assert ps.validate_schema_errors({"x": ("integer", ("error", 123))})
    assert not ps.validate_schema_errors({"x": ("integer", ("error", "bad"))})
    assert not ps.validate_schema_errors(
        {"x": ("required", "string", "needed")})


# ---------------------------------------------------------------------------
# traverse_errors (reference test/custom_errors_test.exs:78-105)
# ---------------------------------------------------------------------------


def test_traverse_errors_translates_messages(spark, users):
    res = ps.validate(users, USER_SCHEMA, mode="permissive")
    errs = res.errors("id")
    translated = ps.traverse_errors(errs, lambda e: f"[translated] {e['message']}")
    assert translated and all(
        e["message"].startswith("[translated]") for e in translated)
    # inputs not mutated
    assert not errs[0]["message"].startswith("[translated]")


def test_traverse_errors_coerces_non_string():
    errs = [{"path": ["x"], "key": "x", "message": "m", "content": "{}"}]
    out = ps.traverse_errors(errs, lambda e: 123)
    assert out[0]["message"] == "123"


def test_map_errors_vectorized(spark, users):
    res = ps.validate(users, USER_SCHEMA, mode="permissive")
    out = res.map_errors(
        lambda e: F.concat(F.lit("x_"), e.message), "id")
    msgs = [r["message"] for r in out.collect()]
    assert msgs and all(m.startswith("x_") for m in msgs)
    assert "BatchEvalPython" not in \
        out._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# gen: overrides (reference test/gen_overrides_test.exs)
# ---------------------------------------------------------------------------


def test_gen_override_in_multi_options():
    from peri_spark.generate import generate_rows
    schema = {"age": ("integer", [("gte", 18),
                                  ("gen", lambda rng: rng.randint(18, 120))])}
    rows = generate_rows(schema, 20)
    assert all(18 <= r["age"] <= 120 for r in rows)


def test_gen_override_in_required_and_meta():
    from peri_spark.generate import generate_rows
    schema = {
        "login": ("required", "string", {"gen": lambda: "system"}),
        "name": ("meta", "string", {"gen": lambda: "hello"}),
    }
    rows = generate_rows(schema, 5)
    assert all(r["login"] == "system" and r["name"] == "hello" for r in rows)


def test_gen_override_values_pass_validation(spark):
    from peri_spark.generate import generate_df
    schema = {"age": ("integer", [("gte", 18),
                                  ("gen", lambda rng: rng.randint(18, 120))])}
    df = generate_df(spark, schema, 10)
    assert ps.conforms(df, schema, mode="permissive")


def test_validate_schema_rejects_bad_gen():
    assert ps.validate_schema_errors({"age": ("integer", [("gte", 18), ("gen", 123)])})
    assert ps.validate_schema_errors(
        {"x": ("required", "string", {"gen": 42})})
    assert ps.validate_schema_errors(
        {"x": ("meta", "string", {"gen": lambda a, b: a})})  # 2-arity
    assert not ps.validate_schema_errors(
        {"x": ("meta", "string", {"gen": lambda: "ok"})})


# ---------------------------------------------------------------------------
# dynamic {:dependent, cb} (reference lib/peri.ex:1001-1037)
# ---------------------------------------------------------------------------


def test_dynamic_dependent_callable(spark):
    df = spark.createDataFrame(
        [(1, "purchase", 0.5), (2, "purchase", 5.0), (3, "click", 150.0),
         (4, "view", -1.0), (5, "click", 50.0)],
        "id long, event_type string, value double")

    def branches(root):
        return [
            (Expr("event_type = 'purchase'"), ("float", ("gte", 1.0))),
            (ColFn(lambda r: r("event_type") == "click"),
             ("float", ("lte", 99.0))),
            (None, "float"),
        ]

    res = ps.validate(df, {"value": ("dependent", branches)},
                      mode="permissive")
    bad = {r["id"]: r["message"]
           for r in res.violations("id").select("id", "message").collect()}
    assert bad == {1: "should be greater then or equal to 1.0",
                   3: "should be less then or equal to 99.0"}


def test_dynamic_dependent_matches_branch_dict(spark):
    df = spark.createDataFrame(
        [(i, ["purchase", "click", "view"][i % 3], float(i * 7 % 120))
         for i in range(60)],
        "id long, event_type string, value double")
    dyn = {"value": ("dependent", lambda root: [
        (Expr("event_type = 'purchase'"), ("float", ("gte", 1.0))),
        (Expr("event_type = 'click'"), ("float", ("lte", 99.0))),
        (None, "float")])}
    dct = {"value": ("dependent", {"on": "event_type", "branches": {
        "purchase": ("float", ("gte", 1.0)),
        "click": ("float", ("lte", 99.0))}, "else": "float"})}
    a = {(r["id"], r["message"]) for r in
         ps.validate(df, dyn, mode="permissive").violations("id").collect()}
    b = {(r["id"], r["message"]) for r in
         ps.validate(df, dct, mode="permissive").violations("id").collect()}
    assert a == b and a


# ---------------------------------------------------------------------------
# grapheme length mode (reference lib/peri.ex:879-893)
# ---------------------------------------------------------------------------


def test_grapheme_length_mode(spark):
    combining = "é"          # 2 chars, 1 grapheme
    family = "\U0001F468‍\U0001F469"  # man ZWJ woman: 3 chars, 1 grapheme
    df = spark.createDataFrame(
        [(1, combining), (2, family), (3, "ab"), (4, None)],
        "id long, s string")

    chars = ps.validate(df, {"s": ("string", ("min", 2))}, mode="permissive")
    assert {r["id"] for r in chars.invalid.select("id").collect()} == set()

    graph = ps.validate(df, {"s": ("string", ("min", 2))},
                        mode="permissive", length_mode="grapheme")
    assert {r["id"] for r in graph.invalid.select("id").collect()} == {1, 2}

    # default mode diverges only on multi-codepoint clusters — ASCII equal
    ascii_df = spark.createDataFrame([(1, "abc")], "id long, s string")
    for mode in ("chars", "grapheme"):
        r = ps.validate(ascii_df, {"s": ("string", ("max", 2))},
                        mode="permissive", length_mode=mode)
        assert r.invalid.count() == 1


# ---------------------------------------------------------------------------
# regex fast-path (anchored char-class -> translate/length, no rlike)
# ---------------------------------------------------------------------------


FASTPATH_PATTERNS = [
    r"^[0-9a-f]{40}$",
    r"^[\w.-]+/[\w.-]+$",
    r"^[a-z]+$",
    r"^[A-Za-z0-9_]*$",
    r"^[abc]{3}$",
]

ADVERSARIAL = [
    "", "/", "a/", "/a", "a//b", "a/b", "abc", "ab", "abcd", "aBc",
    "deadbeef" * 5, "deadbeef" * 5 + "0", ("deadbeef" * 5)[:-1],
    "DEADBEEF" + "0" * 32, "org/repo", "org/re/po", "o.r-g_1/r.e-p_o2",
    "café/x", "é", "a" * 40, "0" * 40, "g" * 40, "a-b", ".",
    "_", "-/-", "a/b/", "x" * 39 + "/",
]


def test_regex_fastpath_matches_rlike(spark):
    """The translate/length fast path is observationally identical to
    rlike for every supported pattern (Python re as the neutral oracle —
    same ASCII-class semantics as java.util.regex for these shapes)."""
    import re as _re

    from peri_spark.compiler import _regex_fastpath

    df = spark.createDataFrame([(i, s) for i, s in enumerate(ADVERSARIAL)],
                               "id long, s string")
    for pat in FASTPATH_PATTERNS:
        ok = _regex_fastpath(pat, F.col("s"))
        assert ok is not None, pat
        got = {r["id"] for r in df.where(ok).collect()}
        via_rlike = {r["id"] for r in df.where(F.col("s").rlike(pat)).collect()}
        # re.ASCII: java.util.regex (and the reference's PCRE default)
        # treat \w as ASCII; Python defaults to Unicode
        via_re = {i for i, s in enumerate(ADVERSARIAL)
                  if _re.match(pat + r"\Z", s, _re.ASCII)}
        assert got == via_rlike == via_re, pat


def test_regex_fastpath_line_terminators_match_rlike(spark):
    """java non-MULTILINE `$` matches before ONE final line terminator —
    'abc\\n' passes ^[a-c]+$ via rlike; the byte-level fast path must
    agree (it strips exactly one trailing terminator first)."""
    from peri_spark.compiler import _regex_fastpath

    cases = ["abc", "abc\n", "abc\r\n", "abc\r", "abc\n\n", "abc\nx",
             "\n", "ab\nc", "abc\u0085", "abc\u2028",
             "a" * 40 + "\n", "deadbeef" * 5 + "\n", "org/repo\n",
             "org/repo\r\n", "org\n/repo", ""]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(cases)],
                               "id long, s string")
    for pat in FASTPATH_PATTERNS:
        ok = _regex_fastpath(pat, F.col("s"))
        assert ok is not None, pat
        got = {r["id"] for r in df.where(ok).collect()}
        via_rlike = {r["id"]
                     for r in df.where(F.col("s").rlike(pat)).collect()}
        assert got == via_rlike, pat


def test_regex_fastpath_rejects_class_intersection(spark):
    """[a-z&&b] is java class INTERSECTION (matches only 'b'), not
    literal '&' chars — the fast path must decline and fall back to
    rlike rather than silently accepting a-z."""
    from peri_spark.compiler import _regex_fastpath

    assert _regex_fastpath(r"^[a-z&&b]+$", F.col("s")) is None
    df = spark.createDataFrame([(1, "abc"), (2, "b"), (3, "ab&")],
                               "id long, s string")
    sch = {"s": ("string", ("regex", r"^[a-z&&b]+$"))}
    res = ps.validate(df, sch, mode="permissive")
    bad = {r["id"] for r in res.invalid.select("id").collect()}
    assert bad == {1, 3}  # only 'b' conforms under intersection
    # single literal '&' (no intersection) still fast-paths correctly
    ok = _regex_fastpath(r"^[a&b]+$", F.col("s"))
    assert ok is not None
    got = {r["id"] for r in df.where(ok).collect()}
    via = {r["id"]
           for r in df.where(F.col("s").rlike(r"^[a&b]+$")).collect()}
    assert got == via == {2, 3}


def test_time_accepts_iso8601_suffixes(spark):
    """Elixir Time.from_iso8601 accepts fractional ,/. seconds and a
    discarded Z / ±hh:mm offset; the :time runtime check must too,
    while still rejecting range violations and trailing garbage."""
    good = ["23:50:07", "23:50:07Z", "23:50:07.123", "23:50:07,012",
            "23:50:07.123+02:30", "00:00:00-0100", "23:50:07+02:30",
            "T23:50:07", "23:50:07+02", "23:50:07+0000", "23:50:07+00:00",
            "23:50:07-00:30"]
    bad = ["99:99:99", "12:00:00garbage", "24:00:00", "12:60:00",
           "12:00:61", "12:00", "12:00:00Zx",
           "23:50:07+24:00", "23:50:07+12:60",  # offset out of range
           "23:50:07-00:00", "23:50:07-0000", "23:50:07-00"]  # neg zero
    rows = [(i, s, True) for i, s in enumerate(good)] + \
           [(100 + i, s, False) for i, s in enumerate(bad)]
    df = spark.createDataFrame([(i, s) for i, s, _ in rows],
                               "id long, t string")
    res = ps.validate(df, {"t": "time"}, mode="permissive")
    invalid = {r["id"] for r in res.invalid.select("id").collect()}
    assert invalid == {i for i, _s, okk in rows if not okk}


def test_regex_fastpath_in_validate_plan(spark):
    """r6: regex constraints compile to RLike again — re-measured on
    Spark 4.1/JDK 17 the translate fastpath is ~2× slower than the
    compiled-regex path on the flagship patterns (StringTranslate boxes
    every code point through a Map<Character,Character>), so the
    compiler no longer routes through _regex_fastpath. The fastpath
    helper itself is retained with its parity tests above."""
    df = spark.createDataFrame([(1, "abc/def", "a" * 40)],
                               "id long, repo string, commit string")
    sch = {"repo": ("string", ("regex", r"^[\w.-]+/[\w.-]+$")),
           "commit": ("string", ("regex", r"^[0-9a-f]{40}$"))}
    res = ps.validate(df, sch, mode="permissive")
    plan = res.annotated._jdf.queryExecution().optimizedPlan().toString()
    assert "rlike" in plan.lower()
    sch2 = {"repo": ("string", ("regex", r"^Customer#\d+$"))}
    res2 = ps.validate(df, sch2, mode="permissive")
    plan2 = res2.annotated._jdf.queryExecution().optimizedPlan().toString()
    assert "rlike" in plan2.lower()


def test_regex_fastpath_declines_terminator_in_class(spark):
    """A class containing a literal line terminator must fall back to
    rlike — the $-strip would mis-handle '^[a\\n]+$' on '\\n'."""
    from peri_spark.compiler import _regex_fastpath

    assert _regex_fastpath("^[a\n]+$", F.col("s")) is None
    df = spark.createDataFrame([(1, "\n"), (2, "a\na"), (3, "b")],
                               "id long, s string")
    res = ps.validate(df, {"s": ("string", ("regex", "^[a\n]+$"))},
                      mode="permissive")
    ok = {r["id"] for r in res.valid.select("id").collect()}
    via = {r["id"] for r in df.where(F.col("s").rlike("^[a\n]+$")).collect()}
    assert ok == via == {1, 2}
