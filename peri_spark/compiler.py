"""Schema → Spark Column compiler.

Each normalized DSL node compiles, *type-directed* against the input
DataFrame's Spark schema, into:

- a **value Column** (rewrites: defaults, transforms, strict projection), and
- a **violations Column** of type ``array<struct<path,key,message,content>>``

so that the whole row-level validation is ONE projection pass — no shuffle,
fully whole-stage-codegen'd, nothing per-row in Python. Violations for all
fields are concatenated into a single array column; valid rows are
``size(_violations) = 0``.

Semantics parity notes (reference zoedsoupe/peri, lib/peri.ex):
- ``nil`` passes every directive except ``{:required,_}`` (825) and
  ``{:literal,_}`` (801) — clause order puts the nil catch-all at 1056.
- list/map/tuple element errors: the reference halts on the first bad
  element (1197, 1228, 1325); we report ALL element violations (documented
  superset — vectorized evaluation has no order to halt in).
- list constraint failures suppress element validation (1218-1225).
- numeric type-strictness: an :integer directive on a float column is a
  type error, and vice versa (guard lib/peri.ex:779-780).
- string length uses Spark ``length`` (chars) vs Elixir graphemes (879-893)
  — equivalent for ASCII/BMP content; documented divergence.
- key-present-vs-nil (field_presence?) collapses: a Spark column either
  exists in the schema (present) or not (absent). Nested defaults
  materialize on null parents when the parent column exists (1048-1054).
"""

from __future__ import annotations

import re

from dataclasses import dataclass, field, replace
from typing import Any, Callable

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .dsl import ColFn, Expr, Node, PandasFn, schema_registry, parse
from .errors import content_json, format_template, inspect_value, summarize

__all__ = ["compile_node", "compile_fields", "Compiled", "Ctx", "ErrorRef",
           "VIOL_DDL", "AVIOL_DDL", "empty_viols", "TRANSFORM_REGISTRY",
           "attach_count", "count_of"]

VIOL_DDL = "struct<path:array<string>,key:string,message:string,content:string>"
AVIOL_DDL = f"array<{VIOL_DDL}>"

MAX_REF_DEPTH = 64  # reference: lib/peri.ex:1481-1487

# Named JVM-side transforms usable as ("transform", "name") — the fast path
# for the reference's MFA transforms (lib/peri.ex:1076-1108).
TRANSFORM_REGISTRY: dict[str, Callable[[Column], Column]] = {
    "upper": F.upper,
    "lower": F.lower,
    "trim": F.trim,
    "abs": F.abs,
    "string": lambda c: c.cast("string"),
}


def empty_viols() -> Column:
    return F.array().cast(AVIOL_DDL)


@dataclass(frozen=True)
class Ctx:
    """Compilation context: root-row accessor + violation path/key."""
    root: Callable[[str], Column]          # root field accessor (original row)
    key: str                               # violation `key` (current field)
    path: tuple = ()                       # str | Column elements
    depth: int = 0                         # ref-recursion guard
    root_fields: tuple = ()                # root column names (for 2-arity
                                           # PandasFn callbacks needing the row)
    grapheme: bool = False                 # string length = grapheme clusters
                                           # (Arrow UDF) instead of chars
    # lean mode: violation structs become constants (no message/content
    # rendering). For counting-only consumers (verdicts, bad-row filters)
    # this shrinks the expression tree ~10× — less driver-side
    # analysis/codegen and no string building per bad row.
    lean: bool = False

    def child(self, key: str) -> "Ctx":
        return replace(self, key=key, path=self.path + (key,))

    def at_index(self, idx: Column) -> "Ctx":
        return replace(self, path=self.path + (idx,))

    def path_col(self) -> Column:
        parts = [F.lit(p) if isinstance(p, str) else p.cast("string")
                 for p in self.path]
        return F.array(*parts) if parts else F.array().cast("array<string>")


@dataclass
class Compiled:
    value: Column            # rewritten value
    viols: Column            # array<VIOL_DDL>, never null
    dtype: T.DataType | None # output type (None = unchanged/unknown)


@dataclass(frozen=True)
class ErrorRef:
    """What a callable ``error:`` override / ``map_errors`` callback sees —
    the vectorized analogue of the reference's MFA override receiving a
    %Peri.Error{} (lib/peri/error.ex:182-195): key/path statically, the
    default message and content JSON as Columns. The callback returns a
    replacement message (str or Column); anything else keeps the default
    (reference apply_override fallthrough)."""
    key: str | Any
    path: tuple | Any
    message: Any             # Column
    content: Any             # Column (JSON string)


# ---------------------------------------------------------------------------
# type conformance
# ---------------------------------------------------------------------------

_INT_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FLOAT_TYPES = (T.FloatType, T.DoubleType, T.DecimalType)


def type_ok(prim: str, dtype: T.DataType | None) -> bool:
    """Static type conformance: Spark column type vs Peri primitive."""
    if prim == "any":
        return True
    if dtype is None:
        return True
    m = {
        "string": (T.StringType,),
        "atom": (T.StringType,),           # atoms degrade to strings (doc'd)
        "integer": _INT_TYPES,
        "float": _FLOAT_TYPES,             # strict: int column is NOT float
        "boolean": (T.BooleanType,),
        "date": (T.DateType,),
        # parquet timestamps without tz metadata load as NTZ (Spark 4
        # inferTimestampNTZ) — :datetime accepts both flavors;
        # :naive_datetime requires NTZ (doc'd divergence from %DateTime{})
        "datetime": ((T.TimestampType, T.TimestampNTZType)
                     if hasattr(T, "TimestampNTZType")
                     else (T.TimestampType,)),
        "map": (T.MapType, T.StructType),
        "list": (T.ArrayType,),
        "time": (T.StringType,),           # HH:mm:ss string (doc'd)
        # %Duration{} carries year/month AND day/time components; Spark
        # splits those across two interval types — accept both (plus the
        # runtime-checked ISO-8601 string form)
        "duration": (T.DayTimeIntervalType, T.YearMonthIntervalType,
                     T.StringType),
    }
    if prim == "naive_datetime":
        ok: tuple = (T.TimestampType,)
        if hasattr(T, "TimestampNTZType"):
            ok = ok + (T.TimestampNTZType,)
        return isinstance(dtype, ok)
    if prim == "pid":
        return False  # unsupported on Spark (doc'd)
    return isinstance(dtype, m.get(prim, ()))


def _lit_dtype(v: Any) -> T.DataType:
    if isinstance(v, bool):
        return T.BooleanType()
    if isinstance(v, int):
        return T.LongType()
    if isinstance(v, float):
        return T.DoubleType()
    if isinstance(v, str):
        return T.StringType()
    return T.StringType()


def inspect_col(col: Column, dtype: T.DataType | None) -> Column:
    """Runtime Elixir-inspect-ish rendering of a value (for %{actual})."""
    if isinstance(dtype, T.StringType):
        body = F.concat(F.lit('"'), col, F.lit('"'))
    elif isinstance(dtype, T.BooleanType):
        body = F.when(col, F.lit("true")).otherwise(F.lit("false"))
    elif dtype is None:
        body = F.lit("nil")
    else:
        body = col.cast("string")
    return F.coalesce(F.when(col.isNull(), F.lit("nil")).otherwise(body),
                      F.lit("nil"))


# ---------------------------------------------------------------------------
# violation builders
# ---------------------------------------------------------------------------

def _viol_struct(ctx: Ctx, message: Column | str,
                 content: dict[str, Column | str] | None,
                 extra_path: tuple = ()) -> Column:
    if ctx.lean:
        return F.struct(
            F.array().cast("array<string>").alias("path"),
            F.lit(ctx.key).alias("key"), F.lit("").alias("message"),
            F.lit("{}").alias("content"))
    path = ctx.path + extra_path
    parts = [F.lit(p) if isinstance(p, str) else p.cast("string")
             for p in path]
    path_col = (F.array(*parts) if parts
                else F.array().cast("array<string>"))
    msg_col = F.lit(message) if isinstance(message, str) else message
    if not content:
        content_col = F.lit("{}")
    elif all(isinstance(v, str) for v in content.values()):
        content_col = F.lit(content_json(content))
    else:
        fields = [(v if isinstance(v, Column) else F.lit(v)).alias(k)
                  for k, v in sorted(content.items())]
        content_col = F.to_json(F.struct(*fields))
    return F.struct(path_col.alias("path"), F.lit(ctx.key).alias("key"),
                    msg_col.alias("message"), content_col.alias("content"))


class _Pending:
    """A conditional violation: (fail_cond, viol_struct), not yet a Column.

    Kept as a pair so `_collect` can emit
    ``CASE WHEN cond THEN array(struct) ELSE array() END`` and concat —
    pure codegen-able expressions. The alternative (array of nullable
    structs + HOF ``filter``/``array_compact``) falls out of
    WholeStageCodegen (HOFs are CodegenFallback) and measured ~1.65×
    slower on the flagship schema at 6M rows.
    """

    __slots__ = ("cond", "struct")

    def __init__(self, cond: Column, struct: Column):
        self.cond = cond
        self.struct = struct


def _maybe(cond: Column, viol: Column) -> _Pending:
    return _Pending(cond, viol)


def _as_array(item) -> Column:
    if isinstance(item, _Pending):
        return F.when(item.cond, F.array(item.struct).cast(AVIOL_DDL)) \
                .otherwise(empty_viols())
    return item


def attach_count(col: Column, count: Column) -> Column:
    """Pin the violation-COUNT expression of a viols array onto the
    Column wrapper (round-6). Counting consumers (the fused suite, any
    ``size(viols)`` reduction) can then aggregate the pure-integer
    expression and let Catalyst prune the array itself out of the plan
    — no per-row struct/array allocation on the hot path. The count
    expression mirrors the array construction EXACTLY, including NULL
    propagation (size(NULL array) = NULL ⇔ a NULL term nulls the sum)."""
    col._peri_count = count
    return col


def count_of(viols: Column) -> Column:
    """Violation count of a viols array Column: the attached integer
    twin when the builder recorded one, else ``F.size`` (always
    correct, just materializes the array). NB: read via __dict__ —
    plain getattr on a pyspark Column falls through to getField and
    would fabricate a struct-field access."""
    c = viols.__dict__.get("_peri_count")
    return c if c is not None else F.size(viols)


def _count_item(item) -> Column:
    if isinstance(item, _Pending):
        # size(when(cond, [s]).otherwise([])) — NULL cond takes the
        # otherwise branch, hence coalesce to 0
        return F.coalesce(item.cond.cast("int"), F.lit(0))
    return count_of(item)


def _collect(*items) -> Column:
    """Combine pending single violations and array columns into one array."""
    out = [_as_array(i) for i, _is_arr in items]
    if not out:
        return attach_count(empty_viols(), F.lit(0))
    counts = [_count_item(i) for i, _is_arr in items]
    total = counts[0]
    for c in counts[1:]:
        total = total + c
    if len(out) == 1:
        return attach_count(out[0], total)
    return attach_count(F.concat(*out), total)


def _static_msg(template: str, content: dict[str, str]) -> str:
    return format_template(template, content)


def _type_error(col: Column, dtype, node_summary: str, ctx: Ctx,
                guard: Column | None = None) -> Column:
    """'expected type of %{expected} received %{actual} value' (1320-1323)."""
    actual = inspect_col(col, dtype)
    msg = F.concat(F.lit(f"expected type of {node_summary} received "),
                   actual, F.lit(" value"))
    content = {"actual": actual, "expected": node_summary}
    cond = col.isNotNull() if guard is None else guard
    return _maybe(cond, _viol_struct(ctx, msg, content))


# ---------------------------------------------------------------------------
# the compiler
# ---------------------------------------------------------------------------

def compile_node(node: Node, col: Column, dtype: T.DataType | None,
                 ctx: Ctx, mode: str = "strict") -> Compiled:
    t = node.tag
    fn = _DISPATCH.get(t)
    if fn is None:
        raise NotImplementedError(f"directive not supported: {t}")
    return fn(node, col, dtype, ctx, mode)


def _c_prim(node, col, dtype, ctx, mode):
    prim = node.args[0]
    if prim == "any" or type_ok(prim, dtype):
        extra = empty_viols()
        # runtime-checked string-backed types
        if prim == "time" and isinstance(dtype, T.StringType):
            # anchored + range-checked (Elixir Time.from_iso8601 rejects
            # out-of-range fields and trailing garbage, but ACCEPTS an
            # optional T prefix, a ./, fractional second, and a discarded
            # offset suffix: Z, ±hh, ±hhmm or ±hh:mm with hour<24 min<60
            # — EXCEPT the negative-zero offset (-00/-0000/-00:00), which
            # Calendar.ISO rejects explicitly)
            # \z (not $): Java-regex $ matches BEFORE a final line
            # terminator, so "23:50:07\n" would validate while Elixir
            # Time.from_iso8601 and the RE2 oracle ($ = end-of-text in
            # RE2) both reject it
            ok = col.rlike(
                r"^T?([01]\d|2[0-3]):[0-5]\d:[0-5]\d([.,]\d+)?"
                r"(Z|[+-]([01]\d|2[0-3])(:?[0-5]\d)?)?\z") \
                & ~col.rlike(r"-00(:?00)?\z")
            bad = col.isNotNull() & ~ok
            extra = _collect((_type_error(col, dtype, ":time", ctx, bad), False))
        elif prim == "duration" and isinstance(dtype, T.StringType):
            # Elixir Duration.from_iso8601 grammar (the canonical string →
            # %Duration{} path; reference validates the struct,
            # lib/peri.ex:790): optional leading sign, designators in
            # canonical order Y M W D [T H M S] each at most once, signed
            # components ("P3Y-2MT3H", "-PT10H-30M"), fractional seconds
            # ("PT4.650S"). Rejected: bare "P"/"-P", a trailing "T" with
            # no time component, out-of-order or unknown designators,
            # fractions on non-second units. No lookaheads, and \z not $
            # (Java $ would accept a trailing newline) — the DuckDB
            # oracle (RE2, where $ is already end-of-text) matches the
            # same language.
            ok = (col.rlike(
                r"^[+-]?P(-?\d+Y)?(-?\d+M)?(-?\d+W)?(-?\d+D)?"
                r"(T(-?\d+H)?(-?\d+M)?(-?\d+([.,]\d+)?S)?)?\z")
                & ~col.rlike(r"^[+-]?P\z") & ~col.rlike(r"T\z"))
            bad = col.isNotNull() & ~ok
            extra = _collect((_type_error(col, dtype, ":duration", ctx, bad),
                              False))
        return Compiled(col, extra, dtype)
    return Compiled(col, _collect((_type_error(col, dtype, summarize(node), ctx), False)), dtype)


def _c_literal(node, col, dtype, ctx, mode):
    v = node.args[0]
    want = _lit_dtype(v)
    if dtype is not None and not _same_family(want, dtype):
        fail = F.lit(True)
    else:
        fail = ~col.eqNullSafe(F.lit(v))
    actual = inspect_col(col, dtype)
    msg = F.concat(F.lit(f"expected literal value {inspect_value(v)} but got "), actual)
    viol = _maybe(fail, _viol_struct(
        ctx, msg, {"expected": inspect_value(v), "actual": actual}))
    return Compiled(col, _collect((viol, False)), dtype)


def _same_family(a: T.DataType, b: T.DataType) -> bool:
    for fam in (_INT_TYPES, _FLOAT_TYPES, (T.StringType,), (T.BooleanType,)):
        if isinstance(a, fam) and isinstance(b, fam):
            return True
    return type(a) is type(b)


def _c_enum(node, col, dtype, ctx, mode):
    choices, base = node.args
    viols = []
    ok = col.isin([_enum_cast(c) for c in choices])
    if base is not None:
        b = compile_node(base, col, dtype, ctx, mode)
        viols.append((b.viols, True))
    actual = inspect_col(col, dtype)
    msg = F.concat(
        F.lit(f"expected one of {inspect_value(list(choices))} received "), actual)
    viol = _maybe(col.isNotNull() & ~ok, _viol_struct(
        ctx, msg, {"choices": inspect_value(list(choices)), "actual": actual}))
    viols.append((viol, False))
    return Compiled(col, _collect(*viols), dtype)


def _enum_cast(c):
    return c


def _c_constrained(node, col, dtype, ctx, mode):
    base, opts = node.args
    # numeric type-strictness / string base type first (reference guard 779-782)
    if not type_ok(base, dtype):
        return Compiled(col, _collect(
            (_type_error(col, dtype, ":" + base, ctx), False)), dtype)
    length_fn = _grapheme_len if ctx.grapheme else F.length
    items = []
    nn = col.isNotNull()
    for op, arg in opts:
        fail, msg, content = _constraint(base, op, arg, col, dtype, length_fn)
        items.append((_maybe(nn & fail, _viol_struct(ctx, msg, content)), False))
    return Compiled(col, _collect(*items), dtype)


_GRAPHEME_UDF = None


def _grapheme_len(col: Column) -> Column:
    """Opt-in exact-ish grapheme-cluster length (Elixir String.length
    parity, reference lib/peri.ex:879-893). Arrow-batched; approximates
    UAX#29: combining marks, ZWJ sequences, variation selectors, and
    skin-tone modifiers extend the previous cluster. Default mode stays
    JVM ``length`` (identical for ASCII/BMP content — doc'd divergence)."""
    global _GRAPHEME_UDF
    if _GRAPHEME_UDF is None:
        import pandas as pd
        import unicodedata
        from pyspark.sql.functions import pandas_udf

        def _count(s):
            if s is None:
                return None
            n = 0
            joined = False  # previous char was a ZWJ → this char extends
            for ch in s:
                o = ord(ch)
                extend = (unicodedata.combining(ch) > 0
                          or 0xFE00 <= o <= 0xFE0F      # variation selectors
                          or 0x1F3FB <= o <= 0x1F3FF)   # skin-tone modifiers
                if extend or joined:
                    joined = False
                    continue
                if ch == "\u200d":  # zero-width joiner
                    joined = True
                    continue
                n += 1
            return n

        _GRAPHEME_UDF = pandas_udf(
            lambda s: s.map(_count, na_action="ignore").astype("Int64"),
            "long")
    return _GRAPHEME_UDF(col)


_CLASS_ESCAPES = {
    "d": "0123456789",
    "w": "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789_",
}


def _parse_charclass(body: str) -> str | None:
    """``[...]`` body → explicit ASCII char string, or None if unsupported
    (negation, non-ASCII, unknown escapes)."""
    if body.startswith("^"):
        return None
    if "&&" in body:
        return None  # java class intersection [a-z&&b] — not a literal &
    out, i = [], 0
    while i < len(body):
        ch = body[i]
        if ch == "\\":
            if i + 1 >= len(body):
                return None
            esc = body[i + 1]
            if esc in _CLASS_ESCAPES:
                out.append(_CLASS_ESCAPES[esc])
            elif esc in ".-\\/+*?()[]{}^$|":
                out.append(esc)
            else:
                return None
            i += 2
            continue
        if i + 2 < len(body) and body[i + 1] == "-" and body[i + 2] != "]":
            lo, hi = ord(ch), ord(body[i + 2])
            if hi < lo or hi > 127:
                return None
            out.append("".join(chr(c) for c in range(lo, hi + 1)))
            i += 3
            continue
        if ord(ch) > 127:
            return None
        out.append(ch)
        i += 1
    chars = "".join(dict.fromkeys("".join(out)))  # dedup, keep order
    return chars or None


_FASTPATH_RE = re.compile(
    r"^\^\[(?P<c1>(?:[^\]\\]|\\.)+)\](?P<q1>\+|\*|\{\d+\})"
    r"(?:(?P<sep>[^\[\]\\^$.|?*+(){}]|\\[.\-/\\+*?()\[\]{}^$|])"
    r"\[(?P<c2>(?:[^\]\\]|\\.)+)\]\+)?\$$")


def _regex_fastpath(pattern: str, col: Column) -> Column | None:
    """Anchored char-class patterns → byte-level Column ops.

    Spark's RLike codegen converts the UTF8String to a UTF-16 String and
    allocates a Matcher EVERY row; on an allocation-bound multi-thread
    profile that per-row garbage is the scaling bottleneck (measured:
    validate kernel work-inflation 1.57× at 4 threads). ``length`` /
    ``translate`` / ``replace`` operate on the UTF8String bytes directly,
    so the hot loop allocates ~nothing. Supported shapes (everything else
    falls back to rlike, semantics identical — ASCII classes only, so
    non-ASCII input fails both paths):

    - ``^[C]{n}$``      → length == n  AND translate(col, C, '') == ''
    - ``^[C]+$``        → length >= 1  AND all chars in C
    - ``^[C]*$``        → all chars in C
    - ``^[C]+s[C]+$``   → all chars in C∪{s}, exactly one s, not at ends
      (single literal separator, s ∉ C — e.g. ``^[\\w.-]+/[\\w.-]+$``)
    """
    m = _FASTPATH_RE.match(pattern)
    if not m:
        return None
    c1 = _parse_charclass(m.group("c1"))
    if c1 is None:
        return None
    # a class that itself contains a line terminator interacts with the
    # $-before-final-terminator rule in ways the strip below would get
    # wrong ("^[a\n]+$" must match "\n") — fall back to rlike
    if any(t in c1 for t in "\n\r\u0085\u2028\u2029"):
        return None
    # java non-MULTILINE `$` also matches just before ONE final line
    # terminator ("abc\n" matches ^[a-c]+$); mirror rlike by dropping a
    # single trailing terminator (\r\n counts as one) before the
    # byte-level checks — the branch only allocates for the rare
    # terminator-ended values
    term = col.substr(F.length(col), F.lit(1))
    col = (F.when(col.endswith("\r\n"),
                  col.substr(F.lit(1), F.length(col) - F.lit(2)))
           .when(term.isin("\n", "\r", "\u0085", "\u2028", "\u2029"),
                 col.substr(F.lit(1), F.length(col) - F.lit(1)))
           .otherwise(col))
    empty = F.lit("")
    if m.group("sep") is None:
        q = m.group("q1")
        all_in = F.translate(col, c1, "") == empty
        if q == "+":
            return all_in & (F.length(col) >= 1)
        if q == "*":
            return all_in
        n = int(q[1:-1])
        return all_in & (F.length(col) == n)
    if m.group("q1") != "+":
        return None
    sep = m.group("sep")
    sep = sep[-1] if sep.startswith("\\") else sep
    c2 = _parse_charclass(m.group("c2"))
    if c2 is None or c2 != c1 or sep in c1 or len(sep) != 1:
        # differing halves would need positional split — keep rlike
        return None
    seplit = F.lit(sep)
    return ((F.translate(col, c1 + sep, "") == empty)
            & (F.length(col) - F.length(F.replace(col, seplit, empty)) == 1)
            & ~F.startswith(col, seplit) & ~F.endswith(col, seplit))


def _constraint(base: str, op: str, arg, col: Column, dtype,
                length_fn=F.length):
    """One constraint option → (fail_cond, message, content).

    Messages verbatim from the reference (lib/peri.ex:863-968).
    """
    if base == "string":
        if op == "regex":
            # round-6: the charclass fastpath (translate/length byte ops,
            # _regex_fastpath) is DISABLED — re-measured on Spark 4.1 /
            # JDK 17 it is ~2× slower than rlike on both flagship
            # patterns (StringTranslate's per-char Map<Character,...>
            # lookup boxes every code point, while compiled java.util
            # regex on short anchored patterns is a tight loop):
            # commit ^[0-9a-f]{40}$  rlike 6.8 vs translate 9.2 CPU-s,
            # repo two-class pattern rlike 2.6 vs translate 5.1 CPU-s
            # at 6M rows. _regex_fastpath stays for reference/tests.
            fail = ~col.rlike(arg)
            return (fail,
                    _static_msg("should match the %{regex} pattern", {"regex": f"~r/{arg}/"}),
                    {"regex": f"~r/{arg}/"})
        if op == "eq":
            return (col != F.lit(arg),
                    _static_msg("should be equal to literal %{literal}", {"literal": arg}),
                    {"literal": arg})
        if op == "min":
            return (length_fn(col) < arg,
                    _static_msg("should have the minimum length of %{length}",
                                {"length": inspect_value(arg)}),
                    {"length": inspect_value(arg)})
        if op == "max":
            return (length_fn(col) > arg,
                    _static_msg("should have the maximum length of %{length}",
                                {"length": inspect_value(arg)}),
                    {"length": inspect_value(arg)})
    else:
        v = inspect_value(arg) if op != "range" else None
        if op == "eq":
            return (col != F.lit(arg),
                    _static_msg("should be equal to %{value}", {"value": v}), {"value": v})
        if op == "neq":
            return (col == F.lit(arg),
                    _static_msg("should be not equal to %{value}", {"value": v}), {"value": v})
        if op == "gt":
            return (col <= F.lit(arg),
                    _static_msg("should be greater then %{value}", {"value": v}), {"value": v})
        if op == "gte":
            return (col < F.lit(arg),
                    _static_msg("should be greater then or equal to %{value}", {"value": v}),
                    {"value": v})
        if op == "lte":
            return (col > F.lit(arg),
                    _static_msg("should be less then or equal to %{value}", {"value": v}),
                    {"value": v})
        if op == "lt":
            return (col >= F.lit(arg),
                    _static_msg("should be less then %{value}", {"value": v}), {"value": v})
        if op == "range":
            lo, hi = arg
            c = {"min": inspect_value(lo), "max": inspect_value(hi)}
            return (~col.between(lo, hi),
                    _static_msg("should be in the range of %{min}..%{max} (inclusive)", c), c)
        if op == "multiple_of":
            c = {"value": inspect_value(arg)}
            msg = _static_msg("should be a multiple of %{value}", c)
            if arg == 0:
                return (F.lit(True), msg, c)
            if base == "integer" and isinstance(arg, int):
                return (col % arg != 0, msg, c)
            # float path: quotient-round ε=1e-9 (reference lib/peri.ex:1435-1438)
            q = col / F.lit(float(arg))
            return (F.abs(q - F.round(q, 0)) >= 1e-9, msg, c)
    raise NotImplementedError(f"constraint {base}/{op}")


def _c_required(node, col, dtype, ctx, mode):
    inner = compile_node(node.args[0], col, dtype, ctx, mode)
    exp = summarize(node.args[0])
    req = _viol_struct(
        ctx, _static_msg("is required, expected type of %{expected}", {"expected": exp}),
        {"expected": exp})
    # required nil → only the required error (clause 825 precedes all others)
    viols = F.when(col.isNull(), F.array(req).cast(AVIOL_DDL)) \
             .otherwise(inner.viols)
    viols = attach_count(viols, F.when(col.isNull(), F.lit(1))
                         .otherwise(count_of(inner.viols)))
    return Compiled(inner.value, viols, inner.dtype)


def _c_default(node, col, dtype, ctx, mode):
    inner_node, dval = node.args
    if callable(dval) and not isinstance(dval, (Expr, ColFn)):
        dval = dval()  # 0-arity default fns resolved at compile time (970-991)
    newcol = F.coalesce(col, F.lit(dval)) if dtype is not None else F.lit(dval)
    ndtype = dtype if dtype is not None else _lit_dtype(dval)
    inner = compile_node(inner_node, newcol, ndtype, ctx, mode)
    return Compiled(inner.value, inner.viols, inner.dtype)


def _c_transform(node, col, dtype, ctx, mode):
    inner_node, fn = node.args
    inner = compile_node(inner_node, col, dtype, ctx, mode)
    v = inner.value
    out_dtype = inner.dtype
    if isinstance(fn, str):
        v2 = TRANSFORM_REGISTRY[fn](v)
    elif isinstance(fn, ColFn):
        v2 = fn.fn(v, ctx.root) if _arity(fn.fn) >= 2 else fn.fn(v)
    elif isinstance(fn, Expr):
        raise NotImplementedError("use ColFn or registry name for transforms")
    elif isinstance(fn, PandasFn):
        from pyspark.sql.functions import pandas_udf
        f = fn.fn
        if _arity(f) >= 2:
            # documented ABI fn(values, root): the root row arrives as a
            # pandas DataFrame (struct column over Arrow)
            if not ctx.root_fields:
                raise NotImplementedError(
                    "2-arity PandasFn transform needs root columns; "
                    "use it at top level or switch to a 1-arity fn")
            udf = pandas_udf(lambda s, r: f(s, r), fn.returns)
            v2 = udf(v, F.struct(*[ctx.root(n).alias(n)
                                   for n in ctx.root_fields]))
        else:
            udf = pandas_udf(lambda s: f(s), fn.returns)
            v2 = udf(v)
        out_dtype = _ddl_to_dtype(fn.returns)
    else:
        raise NotImplementedError("transform callback must be registry name, ColFn or PandasFn")
    # transform applies only when validation passed (reference 1058-1065)
    v2 = F.when(F.size(inner.viols) == 0, v2).otherwise(v)
    return Compiled(v2, inner.viols, out_dtype)


def _arity(f) -> int:
    import inspect as _i
    try:
        return len(_i.signature(f).parameters)
    except (TypeError, ValueError):
        return 1


def _required_arity(f) -> int:
    """Parameters WITHOUT defaults — a fn(s, root=None) can still be
    called 1-ary, so compile-time must-have-root guards key off this,
    not _arity (which counts defaulted params)."""
    import inspect as _i
    try:
        return sum(1 for p in _i.signature(f).parameters.values()
                   if p.default is _i.Parameter.empty
                   and p.kind in (p.POSITIONAL_ONLY,
                                  p.POSITIONAL_OR_KEYWORD))
    except (TypeError, ValueError):
        return 1


def _ddl_to_dtype(ddl: str) -> T.DataType:
    return T._parse_datatype_string(ddl)  # noqa: SLF001


def _c_list(node, col, dtype, ctx, mode):
    elem_node, opts = node.args
    if not isinstance(dtype, T.ArrayType):
        return Compiled(col, _collect(
            (_type_error(col, dtype, summarize(node), ctx), False)), dtype)
    edt = dtype.elementType
    nn = col.isNotNull()

    # constraints (reference 1396-1430); failures suppress element checks
    citems = []
    cfail = F.lit(False)
    if "min" in opts:
        f = F.size(col) < opts["min"]
        c = {"min": inspect_value(opts["min"])}
        citems.append((_maybe(nn & f, _viol_struct(
            ctx, _static_msg("should have at least %{min} items", c), c)), False))
        cfail = cfail | (nn & f)
    if "max" in opts:
        f = F.size(col) > opts["max"]
        c = {"max": inspect_value(opts["max"])}
        citems.append((_maybe(nn & f, _viol_struct(
            ctx, _static_msg("should have at most %{max} items", c), c)), False))
        cfail = cfail | (nn & f)
    if opts.get("unique"):
        f = F.size(F.array_distinct(col)) != F.size(col)
        citems.append((_maybe(nn & f, _viol_struct(
            ctx, "should have unique items", {})), False))
        cfail = cfail | (nn & f)

    def _elem_viols(x: Column, i: Column) -> Column:
        c = compile_node(elem_node, x, edt, ctx.at_index(i), mode)
        return c.viols

    elem = F.flatten(F.transform(col, _elem_viols))
    elem = F.when(nn & ~cfail, elem).otherwise(empty_viols())

    def _elem_value(x: Column) -> Column:
        return compile_node(elem_node, x, edt, ctx, mode).value

    value = F.when(nn, F.transform(col, _elem_value)).otherwise(col) \
        if _node_rewrites(elem_node) else col
    return Compiled(value, _collect(*citems, (elem, True)), dtype)


def _node_rewrites(n: Node) -> bool:
    if n.tag in ("default", "transform"):
        return True
    if n.tag in ("required", "override", "meta"):
        return _node_rewrites(n.args[0])
    if n.tag == "nested":
        return True
    return False


def _c_map(node, col, dtype, ctx, mode):
    kt, vt = node.args
    if not isinstance(dtype, T.MapType):
        return Compiled(col, _collect(
            (_type_error(col, dtype, summarize(node), ctx), False)), dtype)
    nn = col.isNotNull()

    def _val_viols(e: Column) -> Column:
        c = compile_node(vt, e["value"], dtype.valueType,
                         ctx.at_index(e["key"]), mode)
        return c.viols

    items = [(F.when(nn, F.flatten(F.transform(F.map_entries(col), _val_viols)))
              .otherwise(empty_viols()), True)]
    if kt is not None:
        def _key_viols(e: Column) -> Column:
            c = compile_node(kt, e["key"], dtype.keyType,
                             ctx.at_index(e["key"]), mode)
            return c.viols
        items.append((F.when(nn, F.flatten(
            F.transform(F.map_entries(col), _key_viols)))
            .otherwise(empty_viols()), True))
    return Compiled(col, _collect(*items), dtype)


def _c_tuple(node, col, dtype, ctx, mode):
    types = node.args[0]
    if not isinstance(dtype, T.StructType):
        return Compiled(col, _collect(
            (_type_error(col, dtype, summarize(node), ctx), False)), dtype)
    nn = col.isNotNull()
    if len(dtype.fields) != len(types):
        c = {"length": inspect_value(len(types)),
             "actual": inspect_value(len(dtype.fields))}
        msg = _static_msg(
            "expected tuple of size %{length} received tuple with %{actual} length", c)
        return Compiled(col, _collect(
            (_maybe(nn, _viol_struct(ctx, msg, c)), False)), dtype)
    items = []
    for i, (tn, fld) in enumerate(zip(types, dtype.fields)):
        sub = compile_node(tn, col.getField(fld.name), fld.dataType, ctx, mode)
        # reference prefixes "tuple element %{index}: " and halts at first
        # bad element (1325-1349); we emit all (documented superset)
        def _prefix(idx):
            def inner(v):
                return F.struct(
                    v["path"].alias("path"), v["key"].alias("key"),
                    F.concat(F.lit(f"tuple element {idx}: "),
                             v["message"]).alias("message"),
                    v["content"].alias("content"))
            return inner
        pfx = F.transform(sub.viols, _prefix(i))
        items.append((F.when(nn, pfx).otherwise(empty_viols()), True))
    return Compiled(col, _collect(*items), dtype)


def _c_nested(node, col, dtype, ctx, mode):
    entries: dict[str, Node] = node.args[0]
    if not isinstance(dtype, T.StructType):
        return Compiled(col, _collect(
            (_type_error(col, dtype, summarize(node), ctx), False)), dtype)
    by_name = {f.name: f for f in dtype.fields}
    nn = col.isNotNull()
    has_defaults = any(_find_default(n) is not None for n in entries.values())

    items = []
    out_fields: list[Column] = []
    out_struct_fields: list[T.StructField] = []
    for k, child in entries.items():
        cctx = ctx.child(k)
        if k in by_name:
            fdt = by_name[k].dataType
            sub = compile_node(child, col.getField(k), fdt, cctx, mode)
            items.append((F.when(nn, sub.viols).otherwise(empty_viols()), True))
            out_fields.append(sub.value.alias(k))
            out_struct_fields.append(T.StructField(k, sub.dtype or fdt))
        else:
            missing = _compile_absent(child, cctx, mode)
            if missing is None:
                continue
            mviols, mval, mdt = missing
            if mviols is not None:
                items.append((F.when(nn, mviols).otherwise(empty_viols()), True))
            if mval is not None:
                out_fields.append(mval.alias(k))
                out_struct_fields.append(T.StructField(k, mdt))
    if mode == "permissive":
        for f in dtype.fields:
            if f.name not in entries:
                out_fields.append(col.getField(f.name).alias(f.name))
                out_struct_fields.append(f)
    rebuilt = F.struct(*out_fields) if out_fields else col
    # nested defaults on null parent (reference 1048-1054): presence ≈ column
    # exists; materialize the defaults-struct when parent is null
    if has_defaults and out_fields:
        value = F.coalesce(F.when(nn, rebuilt),
                           _defaults_struct(entries, out_struct_fields))
    else:
        value = F.when(nn, rebuilt)
    return Compiled(value, _collect(*items),
                    T.StructType(out_struct_fields) if out_fields else dtype)


def _find_default(n: Node):
    if n.tag == "default":
        return n.args[1]
    if n.tag in ("transform", "override", "meta", "required"):
        return _find_default(n.args[0])
    return None


def _defaults_struct(entries: dict[str, Node], fields: list[T.StructField]) -> Column:
    cols = []
    for f in fields:
        d = _find_default(entries[f.name]) if f.name in entries else None
        cols.append(F.lit(d).alias(f.name))
    if not cols:
        return F.lit(None)
    return F.struct(*cols).cast(T.StructType(fields))


def _compile_absent(node: Node, ctx: Ctx, mode: str):
    """Field declared in schema but absent from the data's type.

    Returns (viols|None, value|None, dtype) or None to skip entirely.
    """
    base = node
    while base.tag in ("override", "meta"):
        base = base.args[0]
    if base.tag == "required":
        exp = summarize(base.args[0])
        v = _viol_struct(
            ctx, _static_msg("is required, expected type of %{expected}",
                             {"expected": exp}), {"expected": exp})
        return (F.array(v).cast(AVIOL_DDL), None, None)
    d = _find_default(base)
    if d is not None:
        dt = _lit_dtype(d)
        return (None, F.lit(d), dt)
    return None


def _c_additional(node, col, dtype, ctx, mode):
    """{:schema, s, {:additional_keys, vt}} (reference lib/peri.ex:1272-1296):
    declared keys validate against the map schema; every OTHER key's value
    validates against ``vt``. On a StructType column the undeclared fields
    are static; on a MapType column we split with ``map_filter``."""
    entries, vt = node.args
    if isinstance(dtype, T.StructType):
        declared = set(entries)
        base = _c_nested(Node("nested", (entries,)), col, dtype, ctx, mode)
        extra_items = []
        for f in dtype.fields:
            if f.name in declared:
                continue
            sub = compile_node(vt, col.getField(f.name), f.dataType,
                               ctx.child(f.name), mode)
            extra_items.append((F.when(col.isNotNull(), sub.viols)
                                .otherwise(empty_viols()), True))
        viols = _collect((base.viols, True), *extra_items)
        return Compiled(base.value, viols, base.dtype)
    if isinstance(dtype, T.MapType):
        declared_lit = F.lit(list(entries.keys()))
        nn = col.isNotNull()
        items = []
        for k, child in entries.items():
            sub = compile_node(child, F.element_at(col, F.lit(k)),
                               dtype.valueType, ctx.child(k), mode)
            items.append((F.when(nn, sub.viols).otherwise(empty_viols()), True))
        extras = F.map_filter(col, lambda k, _v:
                              ~F.array_contains(declared_lit, k))

        def _extra_viols(e: Column) -> Column:
            c = compile_node(vt, e["value"], dtype.valueType,
                             ctx.at_index(e["key"]), mode)
            return c.viols

        items.append((F.when(nn, F.flatten(
            F.transform(F.map_entries(extras), _extra_viols)))
            .otherwise(empty_viols()), True))
        return Compiled(col, _collect(*items), dtype)
    return Compiled(col, _collect(
        (_type_error(col, dtype, summarize(node), ctx), False)), dtype)


def _c_either(node, col, dtype, ctx, mode):
    a, b = node.args
    ca = compile_node(a, col, dtype, ctx, mode)
    cb = compile_node(b, col, dtype, ctx, mode)
    ok_a, ok_b = F.size(ca.viols) == 0, F.size(cb.viols) == 0
    actual = inspect_col(col, dtype)
    sa, sb = summarize(a), summarize(b)
    msg = F.concat(F.lit(f"expected either {sa} or {sb}, got: "), actual)
    viol = _maybe(col.isNotNull() & ~ok_a & ~ok_b, _viol_struct(
        ctx, msg, {"first_type": sa, "second_type": sb, "actual": actual}))
    value = col
    if _node_rewrites(a) or _node_rewrites(b):
        value = F.when(ok_a, ca.value).when(ok_b, cb.value).otherwise(col)
    return Compiled(value, _collect((viol, False)), dtype)


def _c_oneof(node, col, dtype, ctx, mode):
    types = node.args[0]
    compiled = [compile_node(x, col, dtype, ctx, mode) for x in types]
    oks = [F.size(c.viols) == 0 for c in compiled]
    all_fail = col.isNotNull()
    for ok in oks:
        all_fail = all_fail & ~ok
    expected = " or ".join(summarize(x) for x in types)
    actual = inspect_col(col, dtype)
    msg = F.concat(F.lit(f"expected one of {expected}, got: "), actual)
    viol = _maybe(all_fail, _viol_struct(
        ctx, msg, {"oneof": expected, "actual": actual}))
    value = col
    if any(_node_rewrites(x) for x in types):
        expr = None
        for ok, c in zip(oks, compiled):
            expr = F.when(ok, c.value) if expr is None else expr.when(ok, c.value)
        value = expr.otherwise(col)
    return Compiled(value, _collect((viol, False)), dtype)


def _cb_condition(cb, ctx: Ctx, col: Column | None = None) -> Column:
    """Vectorize a cond/dependent condition callback into a boolean Column."""
    if isinstance(cb, Expr):
        return F.expr(cb.sql)
    if isinstance(cb, ColFn):
        n = _arity(cb.fn)
        if col is not None and n >= 2:
            return cb.fn(col, ctx.root)
        return cb.fn(ctx.root) if col is None else cb.fn(col)
    raise NotImplementedError(
        "cond/dependent callbacks must be Expr or ColFn (vectorized)")


def _c_cond(node, col, dtype, ctx, mode):
    cb, tn, fn_ = node.args
    cond = _cb_condition(cb, ctx)
    ct = compile_node(tn, col, dtype, ctx, mode)
    cf = compile_node(fn_, col, dtype, ctx, mode)
    viols = F.when(cond, ct.viols).otherwise(cf.viols)
    value = F.when(cond, ct.value).otherwise(cf.value) \
        if (_node_rewrites(tn) or _node_rewrites(fn_)) else col
    return Compiled(value, viols, dtype)


def _c_dependent(node, col, dtype, ctx, mode):
    spec = node.args[0]
    if isinstance(spec, dict) and "branches" in spec:
        on = spec["on"]
        on_col = ctx.root(on) if isinstance(on, str) else _cb_condition(on, ctx)
        branches = {k: parse(v) for k, v in spec["branches"].items()}
        default = parse(spec["else"]) if "else" in spec else None
        expr_v = None
        expr_val = None
        for tag, bn in branches.items():
            c = compile_node(bn, col, dtype, ctx, mode)
            expr_v = (F.when(on_col == tag, c.viols) if expr_v is None
                      else expr_v.when(on_col == tag, c.viols))
            expr_val = (F.when(on_col == tag, c.value) if expr_val is None
                        else expr_val.when(on_col == tag, c.value))
        if default is not None:
            cd = compile_node(default, col, dtype, ctx, mode)
            viols = expr_v.otherwise(cd.viols)
            value = expr_val.otherwise(cd.value)
        else:
            viols = expr_v.otherwise(empty_viols())
            value = expr_val.otherwise(col)
        return Compiled(value, viols, dtype)
    if callable(spec) and not isinstance(spec, (Expr, ColFn, PandasFn)):
        # general dynamic form: cb(root_accessor) returns the branch
        # enumeration [(cond, schema), ...] where cond is Expr/ColFn/
        # Column (None = else). This is the vectorized analogue of the
        # reference's cb(data) -> {:ok, schema} (lib/peri.ex:1001-1037):
        # the callback derives each branch's condition from root columns,
        # and the whole dispatch compiles to one CASE chain — no per-row
        # Python, no second validation pass.
        pairs = list(spec(ctx.root))
        expr_v = expr_val = None
        default = None
        for cond, sch in pairs:
            compiled = compile_node(parse(sch), col, dtype, ctx, mode)
            if cond is None:
                default = compiled
                continue
            cc = cond if isinstance(cond, Column) else _cb_condition(cond, ctx)
            expr_v = (F.when(cc, compiled.viols) if expr_v is None
                      else expr_v.when(cc, compiled.viols))
            expr_val = (F.when(cc, compiled.value) if expr_val is None
                        else expr_val.when(cc, compiled.value))
        dv = default.viols if default is not None else empty_viols()
        dval = default.value if default is not None else col
        if expr_v is None:
            return Compiled(dval, dv, dtype)
        return Compiled(expr_val.otherwise(dval), expr_v.otherwise(dv), dtype)
    raise NotImplementedError(
        "{:dependent, cb}: cb must be the branch-dict form "
        '("dependent", {"on": field, "branches": {...}}) or a callable '
        "(root) -> [(cond, schema), ...] for vectorization")


def _c_dependent4(node, col, dtype, ctx, mode):
    fld, cb, tn = node.args
    if isinstance(cb, dict):
        cond = _cb_condition(cb["cond"], ctx, col)
        template = cb.get("error", "is invalid")
        content = cb.get("content", {})
    else:
        cond = _cb_condition(cb, ctx, col)
        template, content = "is invalid", {}
    inner = compile_node(tn, col, dtype, ctx, mode)
    msg = _static_msg(template, {k: inspect_value(v) for k, v in content.items()})
    viol = _maybe(~F.coalesce(cond, F.lit(False)), _viol_struct(
        ctx, msg, {k: inspect_value(v) for k, v in content.items()}))
    viols = F.when(F.coalesce(cond, F.lit(False)), inner.viols) \
             .otherwise(_as_array(viol))
    return Compiled(inner.value, viols, inner.dtype)


def _c_custom(node, col, dtype, ctx, mode):
    fn = node.args[0]
    if isinstance(fn, dict):
        cond = _cb_condition(fn["cond"], ctx, col)
        template = fn.get("error", "is invalid")
        content = {k: inspect_value(v) for k, v in fn.get("content", {}).items()}
        viol = _maybe(col.isNotNull() & ~F.coalesce(cond, F.lit(False)),
                      _viol_struct(ctx, _static_msg(template, content), content))
        return Compiled(col, _collect((viol, False)), dtype)
    if isinstance(fn, PandasFn):
        # the vectorized Python ABI: fn(values[, root]) -> (ok, message[,...])
        # via Arrow batches (never per-row Python)
        from pyspark.sql.functions import pandas_udf
        f = fn.fn
        if _required_arity(f) >= 2 and not ctx.root_fields:
            # mirror the transform branch: fail at compile time with a
            # clear message, not a TypeError deep inside an Arrow batch.
            # _required_arity: fn(s, root=None) stays callable 1-ary.
            raise NotImplementedError(
                "2-arity PandasFn custom check needs root columns; "
                "use it at top level or switch to a 1-arity fn")
        two_arg = _arity(f) >= 2 and bool(ctx.root_fields)

        def _body(s, r=None):
            import pandas as pd
            out = f(s, r) if two_arg else f(s)
            ok, message = out[0], out[1]
            if isinstance(message, str):
                message = pd.Series([message] * len(s))
            return pd.DataFrame({"ok": ok, "message": message})

        if two_arg:
            _udf = pandas_udf(lambda s, r: _body(s, r),
                              "struct<ok:boolean,message:string>")
            res = _udf(col, F.struct(*[ctx.root(n).alias(n)
                                       for n in ctx.root_fields]))
        else:
            _udf = pandas_udf(lambda s: _body(s),
                              "struct<ok:boolean,message:string>")
            res = _udf(col)
        # res is referenced twice below (ok + message); Spark's
        # ExtractPythonUDFs dedups equal ArrowEvalPython expressions to one
        # Python round-trip — asserted in tests/test_plan_shape.py
        viol = _maybe(col.isNotNull() & ~F.coalesce(res["ok"], F.lit(False)),
                      _viol_struct(ctx, F.coalesce(res["message"], F.lit("is invalid")), None))
        return Compiled(col, _collect((viol, False)), dtype)
    raise NotImplementedError(
        'custom callbacks: use {"cond": Expr/ColFn, "error": ..., "content": ...} '
        "or PandasFn (vectorized)")


def _c_multi(node, col, dtype, ctx, mode):
    fld, branches = node.args
    if not isinstance(dtype, T.StructType):
        actual = inspect_col(col, dtype)
        msg = F.concat(F.lit("expected a map or keyword list for :multi dispatch, got "), actual)
        return Compiled(col, _collect(
            (_maybe(F.lit(True), _viol_struct(ctx, msg, {"actual": actual})), False)), dtype)
    names = {f.name for f in dtype.fields}
    if fld not in names:
        c = {"field": ":" + fld}
        msg = _static_msg("missing :multi dispatch field %{field}", c)
        return Compiled(col, _collect(
            (_maybe(F.lit(True), _viol_struct(ctx, msg, c)), False)), dtype)
    tag = col.getField(fld)
    tags_txt = inspect_value(list(branches.keys()))
    unknown_msg = F.concat(
        F.lit(f"no :multi branch matches dispatch :{fld}="),
        inspect_col(tag, dtype[fld].dataType),
        F.lit(f"; expected one of {tags_txt}"))
    missing_c = {"field": ":" + fld}
    missing = _viol_struct(ctx, _static_msg(
        "missing :multi dispatch field %{field}", missing_c), missing_c)
    unknown = _viol_struct(ctx, unknown_msg, {"tags": tags_txt})
    expr = F.when(tag.isNull(), F.array(missing).cast(AVIOL_DDL))
    for tg, bn in branches.items():
        cb = compile_node(bn, col, dtype, ctx, mode)
        expr = expr.when(tag == F.lit(tg), cb.viols)
    viols = expr.otherwise(F.array(unknown).cast(AVIOL_DDL))
    return Compiled(col, viols, dtype)


def _c_ref(node, col, dtype, ctx, mode):
    name = node.args[0]
    if ctx.depth >= MAX_REF_DEPTH:
        return Compiled(col, empty_viols(), dtype)
    schema, _m = schema_registry[name]
    target = parse(schema)
    # type-directed recursion terminates naturally: the Spark schema is
    # finite, so nested refs beyond the data's depth see absent fields
    return compile_node(target, col, dtype,
                        replace(ctx, depth=ctx.depth + 1), mode)


def _c_meta(node, col, dtype, ctx, mode):
    return compile_node(node.args[0], col, dtype, ctx, mode)


def _c_override(node, col, dtype, ctx, mode):
    inner, msg = node.args
    c = compile_node(inner, col, dtype, ctx, mode)
    if msg is None:
        return c

    def _rewrite(v: Column) -> Column:
        if callable(msg):
            res = msg(ErrorRef(key=ctx.key, path=ctx.path,
                               message=v["message"], content=v["content"]))
            if isinstance(res, Column):
                m = res
            elif isinstance(res, str):
                m = F.lit(res)
            else:  # non-string result → keep default (reference parity)
                m = v["message"]
        else:
            m = F.lit(msg)
        return F.struct(v["path"].alias("path"), v["key"].alias("key"),
                        m.alias("message"), v["content"].alias("content"))

    return Compiled(c.value, F.transform(c.viols, _rewrite), c.dtype)


_DISPATCH = {
    "prim": _c_prim,
    "literal": _c_literal,
    "enum": _c_enum,
    "constrained": _c_constrained,
    "required": _c_required,
    "default": _c_default,
    "transform": _c_transform,
    "list": _c_list,
    "map": _c_map,
    "tuple": _c_tuple,
    "nested": _c_nested,
    "additional": _c_additional,
    "either": _c_either,
    "oneof": _c_oneof,
    "cond": _c_cond,
    "dependent": _c_dependent,
    "dependent4": _c_dependent4,
    "custom": _c_custom,
    "multi": _c_multi,
    "ref": _c_ref,
    "meta": _c_meta,
    "override": _c_override,
}


# ---------------------------------------------------------------------------
# top-level: compile a dict schema against a DataFrame schema
# ---------------------------------------------------------------------------

@dataclass
class FieldOut:
    name: str
    value: Column | None
    viols: Column


def compile_fields(entries: dict[str, Node], df_schema: T.StructType,
                   mode: str = "strict", lean: bool = False,
                   grapheme: bool = False) -> list[FieldOut]:
    by_name = {f.name: f for f in df_schema.fields}

    def root(name: str) -> Column:
        return F.col(name)

    root_fields = tuple(f.name for f in df_schema.fields)
    out: list[FieldOut] = []
    for k, nd in entries.items():
        ctx = Ctx(root=root, key=k, path=(k,), lean=lean,
                  root_fields=root_fields, grapheme=grapheme)
        if k in by_name:
            c = compile_node(nd, F.col(k), by_name[k].dataType, ctx, mode)
            out.append(FieldOut(k, c.value, c.viols))
        else:
            missing = _compile_absent(nd, ctx, mode)
            if missing is None:
                continue
            mviols, mval, _ = missing
            out.append(FieldOut(k, mval, mviols if mviols is not None else empty_viols()))
    return out
