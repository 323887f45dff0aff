"""Error model: Peri-shaped violation rows and schema-definition errors.

Mirrors the reference error semantics (zoedsoupe/peri):
- message templates with ``%{placeholder}`` interpolation
  (reference: lib/peri/error.ex:331-339)
- ``content`` context map (reference: lib/peri/error.ex:139-145)
- compact type rendering ``summarize/1`` (reference: lib/peri/error.ex:242-325)

At DataFrame level a violation is a struct
``(path: array<string>, key: string, message: string, content: string)``
where ``content`` is a deterministic JSON object string (sorted keys) —
flattened for Arrow/DuckDB parity; nested errors are reconstructible from
``path`` (reference keeps a nested ``errors`` list, lib/peri/error.ex:55-61).
"""

from __future__ import annotations

import re
from typing import Any

__all__ = [
    "InvalidSchemaError",
    "SchemaError",
    "inspect_value",
    "format_template",
    "summarize",
    "content_json",
    "traverse_errors",
]


def traverse_errors(errors, fun):
    """Walk an error (dict / SchemaError) or list of errors, replacing each
    leaf's ``message`` with ``fun(err)`` — the i18n hook
    (Peri.Error.traverse_errors/2, reference lib/peri/error.ex:212-223).

    Non-string callback results coerce via ``str()``; nested errors (an
    ``errors`` list on a node) are translated at the leaves. Returns the
    same shape with new dicts (inputs are not mutated). For the vectorized
    DataFrame-level equivalent see ``ValidationResult.map_errors``.
    """
    if isinstance(errors, list):
        return [traverse_errors(e, fun) for e in errors]
    e = dict(errors.to_map()) if isinstance(errors, SchemaError) else dict(errors)
    nested = e.get("errors")
    if nested:
        e["errors"] = [traverse_errors(x, fun) for x in nested]
        return e
    res = fun(e)
    e["message"] = res if isinstance(res, str) else str(res)
    return e


class SchemaError:
    """A schema-definition error (pure-Python compile-time).

    Mirrors %Peri.Error{} for schema validation failures
    (reference: lib/peri.ex:1635-1650).
    """

    __slots__ = ("path", "key", "message", "content")

    def __init__(self, message: str, content: dict | None = None,
                 path: list | None = None, key: str | None = None):
        self.content = dict(content or {})
        self.message = format_template(message, self.content)
        self.path = list(path or [])
        self.key = key

    def __repr__(self) -> str:  # pragma: no cover
        return f"SchemaError(path={self.path!r}, message={self.message!r})"

    def to_map(self) -> dict:
        return {
            "path": self.path,
            "key": self.key,
            "message": self.message,
            "content": self.content,
        }


class InvalidSchemaError(ValueError):
    """Raised when a schema definition is invalid.

    Analogue of Peri.InvalidSchema (reference: lib/peri/invalid_schema.ex:17-22).
    """

    def __init__(self, errors: list[SchemaError]):
        self.errors = errors
        msgs = "; ".join(
            (f"{'.'.join(map(str, e.path))}: " if e.path else "") + e.message
            for e in errors
        )
        super().__init__(f"Invalid schema: {msgs}")


_FLOAT_RE = re.compile(r"^-?\d+(\.\d+)?([eE][+-]?\d+)?$")


def inspect_value(v: Any) -> str:
    """Elixir ``inspect/1``-style rendering used in error content/messages.

    Divergence from the reference (documented): Elixir atoms become Python
    strings in our DSL, so enum/literal members render quoted (``"admin"``)
    rather than ``:admin``.
    """
    if v is None:
        return "nil"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, str):
        return '"' + v + '"'
    if isinstance(v, float):
        s = repr(v)
        return s
    if isinstance(v, int):
        return str(v)
    if isinstance(v, (list,)):
        return "[" + ", ".join(inspect_value(x) for x in v) + "]"
    if isinstance(v, tuple):
        return "{" + ", ".join(inspect_value(x) for x in v) + "}"
    if isinstance(v, dict):
        inner = ", ".join(f"{k}: {inspect_value(x)}" for k, x in v.items())
        return "%{" + inner + "}"
    return str(v)


def format_template(template: str, context: dict) -> str:
    """Interpolate ``%{key}`` placeholders (reference: lib/peri/error.ex:331-339)."""
    out = template
    for k, v in context.items():
        out = out.replace("%{" + str(k) + "}", v if isinstance(v, str) else inspect_value(v))
    return out


def content_json(content: dict) -> str:
    """Deterministic JSON-ish rendering of a content map (sorted keys,
    values already inspect-rendered strings)."""
    import json

    return json.dumps({k: str(v) for k, v in sorted(content.items())},
                      sort_keys=True, separators=(",", ":"))


# ---------------------------------------------------------------------------
# summarize — compact type rendering (reference: lib/peri/error.ex:242-325)
# ---------------------------------------------------------------------------

_MAX_KEYS = 3


def _atomize(name: str) -> str:
    return ":" + name


def summarize(node: Any, max_keys: int = _MAX_KEYS) -> str:
    """Render a *normalized* AST node the way Peri renders raw directives."""
    from . import dsl  # late import; avoid cycle

    if isinstance(node, dsl.Node):
        return _summarize_node(node, max_keys)
    # raw user DSL values (strings, dicts, tuples) — normalize first
    try:
        return _summarize_node(dsl.parse(node), max_keys)
    except Exception:
        return inspect_value(node)


def _summarize_node(n, max_keys: int) -> str:
    from . import dsl

    t = n.tag
    if t == "prim":
        return _atomize(n.args[0])
    if t == "literal":
        return "{:literal, " + inspect_value(n.args[0]) + "}"
    if t == "enum":
        return "{:enum, " + inspect_value(list(n.args[0])) + "}"
    if t == "constrained":
        base, opts = n.args[0], n.args[1]
        if len(opts) == 1:
            return _atomize(base)
        return _atomize(base)
    if t == "required":
        return "{:required, " + _summarize_node(n.args[0], max_keys) + "}"
    if t == "default":
        return _summarize_node(n.args[0], max_keys)
    if t == "transform":
        return _summarize_node(n.args[0], max_keys)
    if t == "list":
        return "{:list, " + _summarize_node(n.args[0], max_keys) + "}"
    if t == "map":
        kt, vt = n.args
        if kt is None:
            return "{:map, " + _summarize_node(vt, max_keys) + "}"
        return ("{:map, " + _summarize_node(kt, max_keys) + ", "
                + _summarize_node(vt, max_keys) + "}")
    if t == "tuple":
        inner = ", ".join(_summarize_node(x, max_keys) for x in n.args[0])
        return "{:tuple, [" + inner + "]}"
    if t == "nested":
        keys = list(n.args[0].keys())
        total = len(keys)
        shown = ", ".join(str(k) for k in keys[:max_keys])
        if total == 0:
            return "%{}"
        if total <= max_keys:
            return "%{" + shown + "}"
        return "%{" + shown + f", +{total - max_keys} more" + "}"
    if t == "additional":
        return _summarize_node(dsl.Node("nested", (n.args[0],)), max_keys) + " (+ additional keys)"
    if t == "either":
        return ("{:either, " + _summarize_node(n.args[0], max_keys) + " | "
                + _summarize_node(n.args[1], max_keys) + "}")
    if t == "oneof":
        inner = ", ".join(_summarize_node(x, max_keys) for x in n.args[0])
        return "{:oneof, [" + inner + "]}"
    if t == "multi":
        field, branches = n.args
        tags = ", ".join(inspect_value(k) for k in branches)
        return "{:multi, " + inspect_value(field) + ", [" + tags + "]}"
    if t == "ref":
        return f"ref({inspect_value(n.args[0])})"
    if t == "meta":
        return _summarize_node(n.args[0], max_keys)
    if t in ("cond", "dependent", "dependent4", "custom"):
        return _atomize(t)
    if t == "override":
        return _summarize_node(n.args[0], max_keys)
    return inspect_value(n)
