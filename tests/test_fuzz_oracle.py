"""Cross-engine differential fuzz: random flat schemas from the
SQL-expressible directive subset + random data → the compiled Spark plan
and the generated DuckDB oracle (peri_spark.oracle.violations_sql) must
emit IDENTICAL violation rows (ids, key, path, message strings).

This multiplies the driver's per-query correctness gate across the whole
message-template space — including the round-2 ASCII regex fast-path,
which must stay observationally identical to both rlike and DuckDB
regexp_matches on every generated pattern.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import peri_spark as ps
from peri_spark.oracle import violations_sql

# --- schema-directive strategies (oracle-expressible subset) ---------------

_REGEXES = [r"^[a-z]+$", r"^[A-Z]{2}[0-9]+$", r"^a", r"xyz", r"^\d+$",
            r"^[a-z]+ [a-z]+$", r"^[0-9a-f]*$"]

_string_dir = st.one_of(
    st.just("string"),
    st.sampled_from([("string", ("regex", r)) for r in _REGEXES]),
    st.builds(lambda v: ("string", ("eq", v)),
              st.sampled_from(["abc", "Zz9", ""])),
    st.builds(lambda n: ("string", ("min", n)), st.integers(0, 6)),
    st.builds(lambda n: ("string", ("max", n)), st.integers(0, 6)),
    st.builds(lambda lo, hi: ("string", [("min", lo), ("max", hi)]),
              st.integers(0, 3), st.integers(3, 8)),
    st.builds(lambda cs: ("enum", list(cs)),
              st.sets(st.sampled_from(["abc", "de", "xyz", "Zz9", ""]),
                      min_size=1, max_size=3)),
    st.builds(lambda v: ("literal", v), st.sampled_from(["abc", "de"])),
)

_num_ops = st.one_of(
    st.builds(lambda v: ("eq", v), st.integers(-5, 5)),
    st.builds(lambda v: ("neq", v), st.integers(-5, 5)),
    st.builds(lambda v: ("gt", v), st.integers(-5, 5)),
    st.builds(lambda v: ("gte", v), st.integers(-5, 5)),
    st.builds(lambda v: ("lt", v), st.integers(-5, 5)),
    st.builds(lambda v: ("lte", v), st.integers(-5, 5)),
    st.builds(lambda lo, hi: ("range", (lo, hi)),
              st.integers(-5, 0), st.integers(0, 5)),
    st.builds(lambda v: ("multiple_of", v), st.integers(1, 4)),
)

_int_dir = st.one_of(
    st.just("integer"),
    st.builds(lambda op: ("integer", op), _num_ops),
    st.builds(lambda cs: ("enum", sorted(cs)),
              st.sets(st.integers(-3, 3), min_size=1, max_size=3)),
)

_wrap = st.sampled_from(["plain", "required", "override"])


def _as_override(d):
    """error: override — an ("error", msg) option on a constrained tuple
    (custom_errors_test.exs syntax); other shapes keep their message."""
    if (isinstance(d, tuple) and len(d) == 2 and d[0] in ("string", "integer")
            and not isinstance(d[1], dict)):
        opts = d[1] if isinstance(d[1], list) else [d[1]]
        return (d[0], opts + [("error", "custom oops")])
    return d


def _wrapped(dir_strategy):
    return st.tuples(dir_strategy, _wrap).map(
        lambda t: {"plain": t[0],
                   "required": ("required", t[0]),
                   "override": _as_override(t[0])}[t[1]])


_schemas = st.fixed_dictionaries(
    {}, optional={
        "s1": _wrapped(_string_dir),
        "s2": _wrapped(_string_dir),
        "n1": _wrapped(_int_dir),
        "n2": _wrapped(_int_dir),
    }).filter(lambda d: len(d) >= 1)

_string_vals = st.one_of(st.none(), st.sampled_from(
    ["abc", "de", "xyz", "Zz9", "", "a b", "AB12", "0f3c", "7", "hello xyz"]))
_int_vals = st.one_of(st.none(), st.integers(-6, 6))


@st.composite
def _cases(draw):
    schema = draw(_schemas)
    n = draw(st.integers(1, 6))
    rows = []
    for i in range(n):
        row = {"row_id": i}
        for k in schema:
            row[k] = draw(_string_vals if k.startswith("s") else _int_vals)
        rows.append(row)
    return schema, rows


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(case=_cases())
def test_spark_matches_duckdb_oracle(spark, duck, case):
    schema, rows = case
    cols = ["row_id"] + list(schema)
    pdf = pd.DataFrame(rows, columns=cols)
    for k in schema:
        if k.startswith("n"):
            pdf[k] = pdf[k].astype("Int64")
    spark_types = ", ".join(
        ["row_id long"] + [f"{k} {'string' if k.startswith('s') else 'long'}"
                           for k in schema])
    # plain tuples for Spark — pandas nullable Int64 NaN is rejected by
    # LongType verification
    df = spark.createDataFrame(
        [tuple(r[c] for c in cols) for r in rows], spark_types)

    res = ps.validate(df, schema, mode="permissive")
    v = res.violations("row_id")
    import pyspark.sql.functions as F
    path_col = "err_path" if "err_path" in v.columns else "path"
    got = sorted(
        (r["row_id"], r["key"], r["p"], r["message"])
        for r in v.select("row_id", "key",
                          F.array_join(path_col, "/").alias("p"),
                          "message").collect())

    duck.register("fuzz_t", pdf)
    sql = violations_sql(schema, "fuzz_t", ["row_id"])
    want = sorted(tuple(r) for r in duck.execute(sql).fetchall()) if sql else []
    assert got == want, f"schema={schema!r}\nrows={rows!r}"


# --- :duration / :time grammar differential fuzz ---------------------------
# The runtime checks anchor with \z (Java) and claim the RE2/DuckDB `$`
# matches the same language. Fuzz adversarial near-miss strings through
# BOTH engines and require identical accept/reject verdicts — this is
# exactly the class of bug the round-3 review found ($ vs trailing \n).

_DUR_GRAMMAR = (r"^[+-]?P(-?\d+Y)?(-?\d+M)?(-?\d+W)?(-?\d+D)?"
                r"(T(-?\d+H)?(-?\d+M)?(-?\d+([.,]\d+)?S)?)?$")
_TIME_GRAMMAR = (r"^T?([01]\d|2[0-3]):[0-5]\d:[0-5]\d([.,]\d+)?"
                 r"(Z|[+-]([01]\d|2[0-3])(:?[0-5]\d)?)?$")

_dur_frag = st.sampled_from(
    ["P", "T", "-", "+", "1", "23", "0", "Y", "M", "W", "D", "H", "S",
     ".5", ",25", "\n", " ", "Z", "PT1H", "P1Y", "-P2M", "T4S"])
_dur_strings = st.lists(_dur_frag, min_size=0, max_size=6).map("".join)

_time_frag = st.sampled_from(
    ["23", "07", "99", ":", "50", "61", "00", "T", "Z", "+", "-", ".", ",",
     "1", "\n", " ", "23:50:07", "-00", "+0230", ":30"])
_time_strings = st.lists(_time_frag, min_size=0, max_size=5).map("".join)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(vals=st.lists(_dur_strings, min_size=1, max_size=8))
def test_duration_matches_duckdb_verdicts(spark, duck, vals):
    df = spark.createDataFrame(list(enumerate(vals)), "row_id long, d string")
    res = ps.validate(df, {"d": "duration"}, mode="permissive")
    got = {r["row_id"] for r in res.invalid.select("row_id").collect()}
    pdf = pd.DataFrame({"row_id": range(len(vals)), "d": vals})
    duck.register("dur_t", pdf)
    want = {r[0] for r in duck.execute(
        "SELECT row_id FROM dur_t WHERE d IS NOT NULL AND NOT ("
        f"regexp_matches(d, '{_DUR_GRAMMAR}') "
        "AND NOT regexp_matches(d, '^[+-]?P$') "
        "AND NOT regexp_matches(d, 'T$'))").fetchall()}
    assert got == want, f"vals={vals!r}"


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(vals=st.lists(_time_strings, min_size=1, max_size=8))
def test_time_matches_duckdb_verdicts(spark, duck, vals):
    df = spark.createDataFrame(list(enumerate(vals)), "row_id long, t string")
    res = ps.validate(df, {"t": "time"}, mode="permissive")
    got = {r["row_id"] for r in res.invalid.select("row_id").collect()}
    pdf = pd.DataFrame({"row_id": range(len(vals)), "t": vals})
    duck.register("time_t", pdf)
    want = {r[0] for r in duck.execute(
        "SELECT row_id FROM time_t WHERE t IS NOT NULL AND NOT ("
        f"regexp_matches(t, '{_TIME_GRAMMAR}') "
        "AND NOT regexp_matches(t, '-00(:?00)?$'))").fetchall()}
    assert got == want, f"vals={vals!r}"


# --- curation-op differential fuzz ------------------------------------------
# clean_lines and normalize_text ship hand-mirrored DuckDB SQL in
# __spark_entry__; fuzz the exact divergence surfaces the r4 review hit
# (CRLF line ends, vertical tab vs Java \s, deny substrings, control
# bytes, combining accents, whitespace runs).

_line_frag = st.sampled_from(
    ["Good words here.", "click here", "javaScript rules!", "x y z",
     "tab\tsep words.", "  padded words !  ", "", "no terminal words",
     "aa\x0bbb cc.", "one two three?", 'quoted words end"', "p q r\r",
     "lorem ipsum dolor sit."])
_line_docs = st.lists(_line_frag, min_size=1, max_size=6) \
    .map(lambda ls: "\n".join(ls))

_CLEAN_ORACLE = r"""
SELECT row_id,
       COALESCE(array_to_string(list_filter(string_split(t, chr(10)), x ->
         len(regexp_extract_all(trim(x), '[^ \t\n\x0B\f\r]+')) >= 3
         AND regexp_matches(trim(x), '[.!?"]\z')
         AND NOT contains(lower(x), 'javascript')
         AND NOT contains(lower(x), 'lorem ipsum')
         AND NOT contains(lower(x), 'cookie policy')
         AND NOT contains(lower(x), 'terms of use')
         AND NOT contains(lower(x), 'privacy policy')), chr(10)), '')
FROM clean_t ORDER BY row_id
"""


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(vals=st.lists(_line_docs, min_size=1, max_size=6))
def test_clean_lines_matches_duckdb(spark, duck, vals):
    from peri_spark.functions import clean_lines
    df = spark.createDataFrame(list(enumerate(vals)),
                               "row_id long, t string")
    got = {r["row_id"]: r["t_clean"] for r in
           clean_lines(df, "t").collect()}
    duck.register("clean_t",
                  pd.DataFrame({"row_id": range(len(vals)), "t": vals}))
    want = dict(duck.execute(_CLEAN_ORACLE).fetchall())
    assert got == want, f"vals={vals!r}"


# \x00 excluded: DuckDB's nfc_normalize (utf8proc) treats NUL as a
# C-string terminator ('\x00x' -> ''), while Spark strips it like
# any control byte -- an ORACLE-ENGINE limitation, not an operator
# bug (probed: duckdb length() stores NUL fine, nfc_normalize not).
_norm_frag = st.sampled_from(
    ["école", "ﬁne", "  ", "\t\t", "a\x0bb", "\x07", "\x01\x1f",
     "plain", "\r\n", "Ώ", "x  y", "\x7f", "ﬀ"])
_norm_docs = st.lists(_norm_frag, min_size=0, max_size=8).map("".join)

_NORM_ORACLE = r"""
SELECT row_id,
       trim(regexp_replace(
         regexp_replace(nfc_normalize(t),
           '[\x00-\x08\x0E-\x1F\x7F]', '', 'g'),
         '[ \t\n\x0B\f\r]+', ' ', 'g'))
FROM norm_t ORDER BY row_id
"""


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(vals=st.lists(_norm_docs, min_size=1, max_size=8))
def test_normalize_text_matches_duckdb(spark, duck, vals):
    from peri_spark.functions import normalize_text
    df = spark.createDataFrame(list(enumerate(vals)),
                               "row_id long, t string")
    got = {r["row_id"]: r["t_norm"] for r in
           normalize_text(df, "t").collect()}
    duck.register("norm_t",
                  pd.DataFrame({"row_id": range(len(vals)), "t": vals}))
    want = dict(duck.execute(_NORM_ORACLE).fetchall())
    assert got == want, f"vals={vals!r}"


# --------------------------------------------------------------- licenses

# fragments compose adversarial license headers: real SPDX tags, broken
# tags, phrase snippets in scrambled case, expression operators, exotic
# terminators, and filler — scan_licenses and the SQL mirror must agree
# on license AND family for every composition.
_lic_frag = st.sampled_from([
    "SPDX-License-Identifier: MIT", "SPDX-License-Identifier:\tGPL-3.0",
    "SPDX-License-Identifier: Apache-2.0 OR GPL-2.0-only",
    "SPDX-License-Identifier: Apache-2.0 WITH LLVM-exception",
    "SPDX-License-Identifier:", "SPDX-License-Identifier: ",
    "spdx-license-identifier: MIT",          # tag is case-sensitive
    "Mozilla Public License", "mozilla public license",
    "Apache License", "PERMISSION IS HEREBY GRANTED, FREE OF CHARGE",
    "GNU LESSER General Public License", "GNU General Public License",
    "gnu affero general public license",
    "Redistribution and use in source and binary forms",
    "This is free and unencumbered software",
    "x = 1", "\n", "\r", "\u2028", " ", "\t", "// ", "# ", "*",
    "OR", "AND", "WITH", "MIT", "BSD-3-Clause", "WTFPL",
])
_lic_docs = st.lists(_lic_frag, min_size=0, max_size=10).map(" ".join)


def _lic_mirror_sql():
    from peri_spark.functions.codescan import (LICENSE_PHRASES,
                                               SPDX_PATTERN,
                                               _FAMILY_RULES)
    spdx_lit = SPDX_PATTERN.replace("'", "''")
    phrase_whens = " ".join(
        f"WHEN contains(head, '{p}') THEN '{l}'"
        for p, l in LICENSE_PHRASES)
    fam_whens = " ".join(
        f"WHEN contains(upper(license), '{p}') THEN '{f}'"
        for p, f in _FAMILY_RULES)
    return f"""
    WITH h AS (SELECT row_id,
                 upper(substr(t, 1, 4096)) AS head,
                 nullif(regexp_extract(substr(t, 1, 4096),
                                       '{spdx_lit}', 1), '') AS spdx
               FROM lic_t),
    lic AS (SELECT row_id, coalesce(spdx, CASE {phrase_whens}
                                    ELSE NULL END) AS license FROM h)
    SELECT row_id, license,
           CASE WHEN license IS NULL THEN 'none' {fam_whens}
                ELSE 'unknown' END AS fam
    FROM lic ORDER BY row_id
    """


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(vals=st.lists(_lic_docs, min_size=1, max_size=8))
def test_scan_licenses_matches_duckdb(spark, duck, vals):
    from peri_spark.functions import scan_licenses
    df = spark.createDataFrame(list(enumerate(vals)),
                               "row_id long, t string")
    got = {r["row_id"]: (r["license"], r["license_family"])
           for r in scan_licenses(df, "t").collect()}
    duck.register("lic_t",
                  pd.DataFrame({"row_id": range(len(vals)), "t": vals}))
    want = {rid: (lic, fam) for rid, lic, fam in
            duck.execute(_lic_mirror_sql()).fetchall()}
    assert got == want, f"vals={vals!r}"
