"""Peri-style schema DSL for Python/PySpark.

The user-facing DSL mirrors the reference's raw-data-structure schemas
(reference: lib/peri.ex:289-292 type grammar; full grammar validated at
lib/peri.ex:1668-1961) with Python literals in place of Elixir terms:

==========================================  =======================================
Reference directive                         Python DSL
==========================================  =======================================
``:string`` / ``:integer`` / ...            ``"string"`` / ``"integer"`` / ...
``{:required, t}``                          ``("required", t)``
``{:enum, choices}``                        ``("enum", [..])``
``{:literal, v}``                           ``("literal", v)``
``{:string, {:regex, ~r/../}}``             ``("string", ("regex", r".."))``
``{:string, [min: 1, max: 5]}``             ``("string", [("min",1),("max",5)])``
``{:integer, {:gt, 5}}``                    ``("integer", ("gt", 5))``
``{t, {:default, v}}``                      ``(t, ("default", v))``
``{t, {:transform, f}}``                    ``(t, ("transform", f))``
``{:list, t}`` / ``{:list, t, opts}``       ``("list", t)`` / ``("list", t, {...})``
``{:map, vt}`` / ``{:map, kt, vt}``         ``("map", vt)`` / ``("map", kt, vt)``
``{:tuple, [..]}``                          ``("tuple", [..])``
``%{...}`` nested schema                    ``{...}`` (dict)
``{:schema, s}``                            ``("schema", s)``
``{:schema, s, {:additional_keys, vt}}``    ``("schema", s, ("additional_keys", vt))``
``{:either, {a, b}}``                       ``("either", (a, b))``
``{:oneof, [..]}``                          ``("oneof", [..])``
``{:cond, cb, t, f}``                       ``("cond", cb, t, f)``
``{:dependent, cb}``                        ``("dependent", cb)``
``{:dependent, field, cb, t}``              ``("dependent", field, cb, t)``
``{:custom, f}``                            ``("custom", f)``
``{:multi, field, branches}``               ``("multi", field, {tag: schema})``
``{:ref, name}``                            ``("ref", name)``
``{:meta, t, opts}``                        ``("meta", t, {...})``
``error:`` option                           ``("error", msg)`` inside option lists
==========================================  =======================================

Callbacks (cond/dependent/custom/transform) must be *vectorizable*: pass an
``Expr("sql over root columns")``, a ``ColFn(lambda root: Column)``, or a
``PandasFn(fn)`` (Arrow-batched fallback; never per-row Python — input_hint).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

from .errors import InvalidSchemaError, SchemaError, inspect_value

__all__ = [
    "Node", "parse", "parse_schema", "validate_schema", "validate_schema_errors",
    "Expr", "ColFn", "PandasFn", "schema_registry", "defschema", "get_schema",
    "PRIMITIVES", "NUMERIC_CONSTRAINT_OPS", "STRING_CONSTRAINT_OPS",
]

PRIMITIVES = frozenset({
    "any", "atom", "string", "integer", "float", "boolean", "map", "list",
    "date", "time", "datetime", "naive_datetime", "duration", "pid",
})

STRING_CONSTRAINT_OPS = frozenset({"regex", "eq", "min", "max"})
NUMERIC_CONSTRAINT_OPS = frozenset(
    {"eq", "neq", "gt", "gte", "lt", "lte", "range", "multiple_of"})


# -- callback wrappers -------------------------------------------------------

@dataclass(frozen=True)
class Expr:
    """A SQL expression over root columns; compiles JVM-side (fast path)."""
    sql: str


@dataclass(frozen=True)
class ColFn:
    """``lambda root_struct_accessor: Column`` — JVM-side (fast path)."""
    fn: Callable


@dataclass(frozen=True)
class PandasFn:
    """Arrow-batched pandas function — the vectorized Python fallback ABI.

    For ``custom``: ``fn(values: pd.Series, root: pd.DataFrame|None)
    -> (ok: pd.Series[bool], message: str, content: dict)``.
    For ``transform``: ``fn(values, root) -> pd.Series`` of same length.
    """
    fn: Callable
    returns: str = "string"  # Spark DDL of transform output type


class Node:
    """Normalized AST node: ``tag`` + ``args`` tuple. Hash/eq by value."""

    __slots__ = ("tag", "args")

    def __init__(self, tag: str, args: tuple):
        self.tag = tag
        self.args = args

    def __repr__(self) -> str:  # pragma: no cover
        return f"Node({self.tag!r}, {self.args!r})"

    def __eq__(self, other):
        return (isinstance(other, Node) and self.tag == other.tag
                and self.args == other.args)

    def __hash__(self):
        try:
            return hash((self.tag, self.args))
        except TypeError:
            return hash(self.tag)


def _err(msg: str, **content) -> SchemaError:
    return SchemaError(msg, content)


def parse(t: Any, errors: list[SchemaError] | None = None, path: list | None = None) -> Node:
    """Normalize one type directive into a Node.

    Grammar mirrors the reference's ``validate_schema`` clause set
    (lib/peri.ex:1668-1961); invalid directives are collected into
    ``errors`` (or raised if errors is None).
    """
    own = errors if errors is not None else []
    path = path or []
    node = _parse(t, own, path)
    if errors is None and own:
        raise InvalidSchemaError(own)
    return node


def _bad(errors: list, path: list, t: Any) -> Node:
    errors.append(SchemaError(
        "invalid schema definition: %{invalid}",
        {"invalid": inspect_value(t)}, path=path))
    return Node("prim", ("any",))


_VALUE_OPTS = ("default", "transform")


def _parse(t: Any, errors: list, path: list) -> Node:
    # primitive
    if isinstance(t, str):
        if t in PRIMITIVES:
            return Node("prim", (t,))
        return _bad(errors, path, t)

    # nested map schema
    if isinstance(t, dict):
        return Node("nested", (_parse_entries(t, errors, path),))

    if not isinstance(t, tuple) or not t:
        return _bad(errors, path, t)

    head = t[0]

    if head == "required" and len(t) in (2, 3):
        inner = _parse(t[1], errors, path)
        override = None
        gen = None
        if len(t) == 3:
            if isinstance(t[2], dict):  # ("required", t, {"error":…, "gen":…})
                if "gen" in t[2]:
                    gen = _parse_gen_opt(t[2]["gen"], errors)
                if "error" in t[2]:
                    override = _parse_error_opt(t[2]["error"], errors, path)
            else:
                override = _parse_error_opt(t[2], errors, path)
        if gen is not None:
            inner = Node("meta", (inner, {"gen": gen}))
        # required + default conflict (reference: lib/peri.ex:829-834, 1780-1783)
        if _has_default(inner):
            errors.append(SchemaError(
                "cannot set default value of %{value} for required field of type %{type}",
                {"value": inspect_value(_default_value(inner)),
                 "type": _summ(inner)}, path=path))
        n = Node("required", (inner,))
        return Node("override", (n, override)) if override else n

    if head == "literal" and len(t) == 2:
        return Node("literal", (t[1],))

    if head == "enum" and len(t) in (2, 3):
        choices = t[1]
        if not isinstance(choices, (list, tuple)) or not choices:
            return _bad(errors, path, t)
        base = None
        override = None
        if len(t) == 3:
            opts = t[2]
            if not isinstance(opts, dict):
                errors.append(_err(
                    "expected enum opts to be a keyword list, got %{actual}",
                    actual=inspect_value(opts)))
                opts = {}
            base = opts.get("type")
            if base is not None:
                base = _parse(base, errors, path)
            override = opts.get("error")
            if override is not None:
                override = _parse_error_opt(override, errors, path)
        n = Node("enum", (list(choices), base))
        return Node("override", (n, override)) if override else n

    if head == "list" and len(t) in (2, 3):
        elem = _parse(t[1], errors, path)
        opts = {}
        if len(t) == 3:
            raw = t[2]
            if not isinstance(raw, dict):
                errors.append(_err(
                    "expected list opts to be a keyword list, got %{actual}",
                    actual=inspect_value(raw)))
            else:
                for k, v in raw.items():
                    if k in ("min", "max", "unique"):
                        opts[k] = v
                    elif k == "error":
                        opts[k] = v
                    else:
                        errors.append(_err(
                            "invalid list constraint, allowed: :min, :max, :unique; got %{actual}",
                            actual=inspect_value(k)))
        override = opts.pop("error", None)
        n = Node("list", (elem, opts))
        return Node("override", (n, override)) if override else n

    if head == "map" and len(t) == 2:
        return Node("map", (None, _parse(t[1], errors, path)))
    if head == "map" and len(t) == 3:
        return Node("map", (_parse(t[1], errors, path), _parse(t[2], errors, path)))

    if head == "tuple" and len(t) == 2 and isinstance(t[1], (list, tuple)):
        return Node("tuple", (tuple(_parse(x, errors, path) for x in t[1]),))

    if head == "schema" and len(t) == 2:
        return _parse(t[1], errors, path)
    if head == "schema" and len(t) == 3:
        extra = t[2]
        if (isinstance(extra, tuple) and len(extra) == 2
                and extra[0] == "additional_keys" and isinstance(t[1], dict)):
            return Node("additional", (_parse_entries(t[1], errors, path),
                                       _parse(extra[1], errors, path)))
        if isinstance(extra, dict):  # ("schema", s, {"name": ...}) opts form
            return _parse(t[1], errors, path)
        return _bad(errors, path, t)

    if head == "either" and len(t) == 2 and isinstance(t[1], tuple) and len(t[1]) == 2:
        return Node("either", (_parse(t[1][0], errors, path),
                               _parse(t[1][1], errors, path)))

    if head == "oneof" and len(t) == 2 and isinstance(t[1], (list, tuple)):
        return Node("oneof", (tuple(_parse(x, errors, path) for x in t[1]),))

    if head == "cond" and len(t) == 4:
        return Node("cond", (_check_cb(t[1], errors), _parse(t[2], errors, path),
                             _parse(t[3], errors, path)))

    if head == "dependent" and len(t) == 2:
        # general form: cb maps root → schema; vectorized via branch dict
        # ("dependent", {"when": Expr/ColFn, "branches": {...}}) or callable
        return Node("dependent", (t[1],))
    if head == "dependent" and len(t) == 4:
        return Node("dependent4", (t[1], _check_cb(t[2], errors),
                                   _parse(t[3], errors, path)))

    if head == "custom" and len(t) == 2:
        return Node("custom", (t[1],))

    if head == "multi" and len(t) == 3:
        field, branches = t[1], t[2]
        if not isinstance(field, str):
            errors.append(_err(
                "expected :multi dispatch field to be an atom, got %{actual}",
                actual=inspect_value(field)))
        if not isinstance(branches, dict):
            errors.append(_err(
                "expected :multi branches to be a map, got %{actual}",
                actual=inspect_value(branches)))
            branches = {}
        return Node("multi", (field, {k: _parse(v, errors, path + [k])
                                      for k, v in branches.items()}))

    if head == "ref" and len(t) == 2:
        return Node("ref", (t[1],))

    if head == "meta" and len(t) == 3:
        opts = t[2]
        if not isinstance(opts, dict):
            errors.append(_err(
                "expected meta opts to be a keyword list, got %{actual}",
                actual=inspect_value(opts)))
            opts = {}
        if "gen" in opts:
            g = _parse_gen_opt(opts["gen"], errors)
            opts = {**opts, "gen": g} if g is not None else \
                {k: v for k, v in opts.items() if k != "gen"}
        return Node("meta", (_parse(t[1], errors, path), opts))

    # {type, option} / {type, [options]} — constraints, default, transform
    if isinstance(head, str) and head in PRIMITIVES and len(t) == 2:
        return _parse_typed_options(head, t[1], errors, path)

    return _bad(errors, path, t)


def _parse_typed_options(base: str, raw, errors: list, path: list) -> Node:
    opts = raw if isinstance(raw, list) else [raw]
    constraints: list[tuple] = []
    default = _MISSING
    transform = None
    override = None
    gen = None
    for o in opts:
        if not (isinstance(o, tuple) and len(o) == 2):
            return _bad(errors, path, (base, raw))
        op, arg = o
        if op == "default":
            default = arg
        elif op == "transform":
            transform = arg
        elif op == "error":
            override = _parse_error_opt(arg, errors, path)
        elif op == "gen":
            gen = _parse_gen_opt(arg, errors)
        elif base == "string" and op in STRING_CONSTRAINT_OPS:
            constraints.append((op, arg))
        elif base in ("integer", "float") and op in NUMERIC_CONSTRAINT_OPS:
            if op == "multiple_of" and (not isinstance(arg, (int, float)) or arg == 0):
                errors.append(_err(
                    "expected :multiple_of value to be a non-zero number, got %{actual}",
                    actual=inspect_value(arg)))
            constraints.append((op, arg))
        else:
            return _bad(errors, path, (base, o))
    node: Node = (Node("constrained", (base, tuple(constraints)))
                  if constraints else Node("prim", (base,)))
    if default is not _MISSING:
        node = Node("default", (node, default))
    if transform is not None:
        node = Node("transform", (node, transform))
    if gen is not None:  # carried as meta opts; generate.py consumes it
        node = Node("meta", (node, {"gen": gen}))
    if override is not None:
        node = Node("override", (node, override))
    return node


_MISSING = object()


def _parse_error_opt(v, errors: list, path: list):
    """error: opt — static string, or a callable (the MFA analogue,
    reference lib/peri/error.ex:182-195). The callable receives an
    ErrorRef (key + path + message/content Columns) at compile time and
    returns a replacement message (str or Column) — fully vectorized."""
    if isinstance(v, str) or callable(v):
        return v
    errors.append(_err(
        "expected error: opt to be a string or MFA tuple, got %{actual}",
        actual=inspect_value(v)))
    return None


def _parse_gen_opt(v, errors: list):
    """gen: opt — callable() or callable(rng) producing a conforming value
    (reference MFA/0-arity StreamData, lib/peri.ex:535-540). Rejects
    non-callables and arity > 1 like the reference's validate_schema."""
    if callable(v):
        import inspect as _i
        try:
            n = len(_i.signature(v).parameters)
        except (TypeError, ValueError):
            n = 0
        if n <= 1:
            return v
    errors.append(_err(
        "expected gen: opt to be a 0/1-arity callable, got %{actual}",
        actual=inspect_value(v)))
    return None


def _check_cb(cb, errors: list):
    if isinstance(cb, (Expr, ColFn, PandasFn, dict)) or callable(cb):
        return cb
    errors.append(_err("invalid schema definition: %{invalid}",
                       invalid=inspect_value(cb)))
    return Expr("false")


def _has_default(n: Node) -> bool:
    if n.tag == "default":
        return True
    if n.tag in ("transform", "override", "meta"):
        return _has_default(n.args[0])
    return False


def _default_value(n: Node):
    if n.tag == "default":
        return n.args[1]
    return _default_value(n.args[0])


def _summ(n: Node) -> str:
    from .errors import summarize
    return summarize(n)


def _parse_entries(schema: dict, errors: list, path: list) -> dict[str, Node]:
    out = {}
    for k, v in schema.items():
        out[str(k)] = _parse(v, errors, path + [k])
    return out


def parse_schema(schema: Any) -> Node:
    """Parse a full schema (dict or bare directive) raising on invalid."""
    errors: list[SchemaError] = []
    node = _parse(schema, errors, [])
    if errors:
        raise InvalidSchemaError(errors)
    return node


def validate_schema_errors(schema: Any) -> list[SchemaError]:
    """Validate a schema definition; return errors (empty = valid).

    Analogue of ``Peri.validate_schema/1`` (reference: lib/peri.ex:1635-1650).
    """
    errors: list[SchemaError] = []
    _parse(schema, errors, [])
    return errors


def validate_schema(schema: Any) -> Any:
    """Raise InvalidSchemaError if the definition is bad; return schema."""
    errors = validate_schema_errors(schema)
    if errors:
        raise InvalidSchemaError(errors)
    return schema


# -- named-schema registry (defschema analogue, lib/peri.ex:339-374) ---------

schema_registry: dict[str, Any] = {}


def defschema(name: str, schema: Any, mode: str = "strict"):
    """Register a named schema; returns a validator closure.

    ``("ref", name)`` resolves against this registry at compile time
    (reference macro-time rewrite: lib/peri.ex:380-388).
    """
    validate_schema(schema)
    schema_registry[name] = (schema, mode)

    def _validator(df, **kw):
        from .engine import validate as _validate
        kw.setdefault("mode", mode)
        return _validate(df, schema, **kw)

    _validator.__name__ = name
    return _validator


def get_schema(name: str):
    return schema_registry[name][0]
