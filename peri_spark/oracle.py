"""ANSI-SQL oracle generator.

For the SQL-expressible subset of the DSL (primitives on conforming column
types, required, enum, literal, string/numeric constraints), generate the
DuckDB SQL that produces byte-identical violation rows to the compiled
Spark plan: ``(id_cols…, key, path, message)``. This is how the driver's
CORRECTNESS gate cross-checks the engine — one schema, two engines, equal
hashes.

Messages mirror compiler.py exactly (which mirrors the reference verbatim,
lib/peri.ex:801-968, 1174-1182). The ``path`` column is the '/'-joined
path string (arrays hash differently across engines).
"""

from __future__ import annotations

from .dsl import Node, parse
from .errors import inspect_value

__all__ = ["violations_sql", "valid_rows_sql", "bad_row_predicate_sql"]


def _q(s: str) -> str:
    return '"' + s.replace('"', '""') + '"'


def _lit(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _inspect_sql(col: str, is_string: bool) -> str:
    """DuckDB expr rendering a value the way inspect_col does in Spark."""
    if is_string:
        return f"CASE WHEN {col} IS NULL THEN 'nil' ELSE '\"' || {col} || '\"' END"
    return (f"CASE WHEN {col} IS NULL THEN 'nil' "
            f"ELSE CAST({col} AS STRING) END")


def _checks(key: str, node: Node, col: str, is_string: bool) -> list[tuple[str, str]]:
    """→ [(where_cond, message_sql_expr)] for one field's directive chain."""
    t = node.tag
    if t in ("meta",):
        return _checks(key, node.args[0], col, is_string)
    if t == "override":
        inner = _checks(key, node.args[0], col, is_string)
        msg = node.args[1]
        return [(c, _lit(msg)) for c, _ in inner] if msg else inner
    if t == "required":
        exp = _summ(node.args[0])
        inner = _checks(key, node.args[0], col, is_string)
        out = [(f"{col} IS NULL",
                _lit(f"is required, expected type of {exp}"))]
        # non-null rows run the inner checks (required nil short-circuits)
        out.extend((f"({col} IS NOT NULL AND ({c}))", m) for c, m in inner)
        return out
    if t == "default":
        dval = node.args[1]
        if callable(dval):
            dval = dval()
        d = _lit(dval) if isinstance(dval, str) else str(dval)
        inner_col = f"COALESCE({col}, {d})"
        return _checks(key, node.args[0], inner_col, is_string)
    if t == "prim":
        return []  # static type conformance assumed for oracle queries
    if t == "enum":
        choices, _base = node.args
        in_list = ", ".join(_lit(c) if isinstance(c, str) else str(c)
                            for c in choices)
        msg = (f"{_lit('expected one of ' + inspect_value(list(choices)) + ' received ')}"
               f" || {_inspect_sql(col, is_string)}")
        return [(f"{col} IS NOT NULL AND {col} NOT IN ({in_list})", msg)]
    if t == "literal":
        v = node.args[0]
        vs = _lit(v) if isinstance(v, str) else str(v)
        msg = (f"{_lit('expected literal value ' + inspect_value(v) + ' but got ')}"
               f" || {_inspect_sql(col, is_string)}")
        return [(f"({col} IS NULL OR {col} <> {vs})", msg)]
    if t == "constrained":
        base, opts = node.args
        out = []
        for op, arg in opts:
            out.append(_constraint_sql(base, op, arg, col))
        return [(f"{col} IS NOT NULL AND ({c})", m) for c, m in out]
    raise NotImplementedError(f"no SQL oracle for directive {t}")


def _constraint_sql(base: str, op: str, arg, col: str) -> tuple[str, str]:
    if base == "string":
        if op == "regex":
            return (f"NOT regexp_matches({col}, {_lit(arg)})",
                    _lit(f"should match the ~r/{arg}/ pattern"))
        if op == "eq":
            return (f"{col} <> {_lit(arg)}",
                    _lit(f"should be equal to literal {arg}"))
        if op == "min":
            return (f"length({col}) < {arg}",
                    _lit(f"should have the minimum length of {arg}"))
        if op == "max":
            return (f"length({col}) > {arg}",
                    _lit(f"should have the maximum length of {arg}"))
    else:
        v = inspect_value(arg)
        if op == "eq":
            return (f"{col} <> {arg}", _lit(f"should be equal to {v}"))
        if op == "neq":
            return (f"{col} = {arg}", _lit(f"should be not equal to {v}"))
        if op == "gt":
            return (f"{col} <= {arg}", _lit(f"should be greater then {v}"))
        if op == "gte":
            return (f"{col} < {arg}",
                    _lit(f"should be greater then or equal to {v}"))
        if op == "lt":
            return (f"{col} >= {arg}", _lit(f"should be less then {v}"))
        if op == "lte":
            return (f"{col} > {arg}",
                    _lit(f"should be less then or equal to {v}"))
        if op == "range":
            lo, hi = arg
            return (f"({col} < {lo} OR {col} > {hi})",
                    _lit(f"should be in the range of {inspect_value(lo)}.."
                         f"{inspect_value(hi)} (inclusive)"))
        if op == "multiple_of":
            if isinstance(arg, int) and base == "integer":
                return (f"{col} % {arg} <> 0",
                        _lit(f"should be a multiple of {v}"))
            return (f"abs(({col} / {arg}) - round({col} / {arg}, 0)) >= 1e-9",
                    _lit(f"should be a multiple of {v}"))
    raise NotImplementedError(f"{base}/{op}")


def _summ(node: Node) -> str:
    from .errors import summarize
    return summarize(node)


def _string_cols(schema_node: Node) -> dict[str, bool]:
    out = {}
    for k, n in schema_node.args[0].items():
        base = n
        while base.tag in ("required", "override", "meta", "default", "transform"):
            base = base.args[0]
        out[k] = not (base.tag == "prim" and base.args[0] in
                      ("integer", "float", "boolean"))
        if base.tag == "constrained":
            out[k] = base.args[0] == "string"
        if base.tag == "enum":
            out[k] = all(isinstance(c, str) for c in base.args[0])
    return out


def violations_sql(schema, table: str, id_cols: list[str]) -> str:
    """DuckDB SQL producing (id_cols…, key, err_path, message) violation rows."""
    node = parse(schema)
    assert node.tag == "nested"
    stringish = _string_cols(node)
    ids = ", ".join(_q(c) for c in id_cols)
    selects = []
    for key, child in node.args[0].items():
        col = _q(key)
        for cond, msg in _checks(key, child, col, stringish[key]):
            selects.append(
                f"SELECT {ids}, {_lit(key)} AS key, {_lit(key)} AS err_path, "
                f"{msg} AS message FROM {table} WHERE {cond}")
    return "\nUNION ALL\n".join(selects)


def bad_row_predicate_sql(schema) -> str:
    """DuckDB boolean expression over the schema's table: TRUE iff the row
    carries at least one violation — the SQL mirror of permissive mode's
    ``size(violations) > 0`` predicate, for oracles that aggregate bad-row
    counts (e.g. watermarked window rates) instead of emitting the rows."""
    node = parse(schema)
    assert node.tag == "nested"
    stringish = _string_cols(node)
    conds = []
    for key, child in node.args[0].items():
        for cond, _m in _checks(key, child, _q(key), stringish[key]):
            conds.append(f"COALESCE(({cond}), FALSE)")
    return "(" + " OR ".join(conds) + ")" if conds else "FALSE"


def valid_rows_sql(schema, table: str, select_cols: list[str]) -> str:
    """DuckDB SQL selecting rows with zero violations (strict projection)."""
    node = parse(schema)
    assert node.tag == "nested"
    stringish = _string_cols(node)
    conds = []
    for key, child in node.args[0].items():
        for cond, _m in _checks(key, child, _q(key), stringish[key]):
            conds.append(f"NOT COALESCE(({cond}), FALSE)")
    where = " AND ".join(conds) if conds else "TRUE"
    cols = ", ".join(_q(c) for c in select_cols)
    return f"SELECT {cols} FROM {table} WHERE {where}"
