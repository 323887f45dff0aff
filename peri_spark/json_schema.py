"""JSON Schema (Draft-7) interop.

``to_json_schema``: Peri DSL → JSON Schema (reference encoder:
lib/peri/json_schema/encoder.ex:64-348 — meta vocab, $defs for refs,
discriminator shape for :multi).
``from_json_schema``: JSON Schema → Peri DSL (reference decoder:
lib/peri/json_schema/decoder.ex:13-242 — lossy: ``oneOf`` decodes with
anyOf semantics (decoder.ex:78-84), ``number`` → either(integer,float)
(decoder.ex:194-198), ``format`` email/uri → regex (decoder.ex:182-191)).
"""

from __future__ import annotations

from typing import Any

from .dsl import Node, parse, schema_registry

__all__ = ["to_json_schema", "from_json_schema", "UnsupportedTypeError"]


class UnsupportedTypeError(TypeError):
    """Raised by ``to_json_schema(..., on_unsupported='raise')`` for
    dynamic Peri types that cannot be expressed statically (reference
    Peri.JSONSchema.Encoder.UnsupportedTypeError, encoder.ex:31-45)."""

    def __init__(self, tag: str, reason: str):
        # pass BOTH args to BaseException so pickle's cls(*args) replay
        # works (Spark tasks / multiprocessing ship exceptions by pickle)
        super().__init__(tag, reason)
        self.tag = tag
        self.reason = reason

    def __str__(self) -> str:
        return f"cannot encode {self.tag!r} to JSON Schema: {self.reason}"

_FORMAT_REGEX = {
    # reference decoder.ex:182-191
    "email": r"^[^\s@]+@[^\s@]+\.[^\s@]+$",
    "uri": r"^https?://",
}


def to_json_schema(schema: Any, title: str | None = None,
                   on_unsupported: str = "omit",
                   exclude_meta_keys: list[str] | None = None) -> dict:
    """Peri DSL → JSON Schema.

    ``on_unsupported`` controls dynamic types (:cond/:dependent/:custom,
    reference encoder.ex:27,288): ``"omit"`` (default) and
    ``"true_schema"`` emit ``{}`` (the true schema); ``"raise"`` raises
    :class:`UnsupportedTypeError`. ``exclude_meta_keys`` drops the listed
    annotation keywords (meta vocabulary plus ``"default"``) from the
    output — for consumer-facing schemas where defaults are
    validation-only (encoder.ex:16-21).
    """
    if on_unsupported not in ("omit", "true_schema", "raise"):
        raise ValueError(
            f"on_unsupported must be omit|true_schema|raise, "
            f"got {on_unsupported!r}")
    node = parse(schema)
    defs: dict[str, dict] = {}
    opts = {"on_unsupported": on_unsupported,
            "exclude": frozenset(exclude_meta_keys or ())}
    out = _encode(node, defs, opts)
    if title:
        out["title"] = title
    if defs:
        out["$defs"] = defs
    return out


_DEFAULT_OPTS = {"on_unsupported": "omit", "exclude": frozenset()}

# meta vocabulary → emitted JSON Schema keyword (reference @meta_keys +
# camelCase renames, encoder.ex:41-61; unknown keys are dropped). "doc"
# is this repo's historical alias for "description".
_META_KEYWORD = {
    "doc": "description",
    "title": "title",
    "description": "description",
    "example": "examples",          # List.wrap parity
    "examples": "examples",
    "deprecated": "deprecated",
    "default": "default",
    "format": "format",
    "pattern": "pattern",
    "read_only": "readOnly",
    "write_only": "writeOnly",
    "content_encoding": "contentEncoding",
    "content_media_type": "contentMediaType",
}


def _encode(node: Node, defs: dict, opts: dict = _DEFAULT_OPTS) -> dict:
    t = node.tag
    if t == "prim":
        p = node.args[0]
        return {
            "any": {},
            "atom": {"type": "string"},
            "string": {"type": "string"},
            "integer": {"type": "integer"},
            "float": {"type": "number"},
            "boolean": {"type": "boolean"},
            "map": {"type": "object"},
            "list": {"type": "array"},
            "date": {"type": "string", "format": "date"},
            "time": {"type": "string", "format": "time"},
            "datetime": {"type": "string", "format": "date-time"},
            "naive_datetime": {"type": "string", "format": "date-time"},
            "duration": {"type": "string", "format": "duration"},
            "pid": {"type": "string"},
        }[p]
    if t == "literal":
        return {"const": node.args[0]}
    if t == "enum":
        return {"enum": list(node.args[0])}
    if t == "constrained":
        base, copts = node.args
        out = _encode(Node("prim", (base,)), defs, opts)
        for op, arg in copts:
            if base == "string":
                out.update({"regex": {"pattern": arg},
                            "eq": {"const": arg},
                            "min": {"minLength": arg},
                            "max": {"maxLength": arg}}[op])
            else:
                out.update({
                    "eq": {"const": arg}, "neq": {"not": {"const": arg}},
                    "gt": {"exclusiveMinimum": arg}, "gte": {"minimum": arg},
                    "lt": {"exclusiveMaximum": arg}, "lte": {"maximum": arg},
                    "range": {"minimum": arg[0], "maximum": arg[1]}
                    if op == "range" else {},
                    "multiple_of": {"multipleOf": arg},
                }[op])
        return out
    if t == "required":
        return _encode(node.args[0], defs, opts)  # required surfaces at object level
    if t == "default":
        out = _encode(node.args[0], defs, opts)
        if "default" not in opts["exclude"]:
            out["default"] = node.args[1] if not callable(node.args[1]) \
                else node.args[1]()
        return out
    if t == "transform":
        return _encode(node.args[0], defs, opts)
    if t == "override":
        return _encode(node.args[0], defs, opts)
    if t == "meta":
        out = _encode(node.args[0], defs, opts)
        meta = node.args[1]
        for mk, v in meta.items():
            keyword = _META_KEYWORD.get(mk)
            if keyword is None:
                continue  # unknown meta keys are dropped (encoder.ex:334)
            if mk in opts["exclude"] or keyword in opts["exclude"]:
                continue
            if keyword == "examples" and not isinstance(v, list):
                v = [v]  # List.wrap (encoder.ex:339-340)
            out[keyword] = v
        return out
    if t == "list":
        elem, lopts = node.args
        out = {"type": "array", "items": _encode(elem, defs, opts)}
        if "min" in lopts:
            out["minItems"] = lopts["min"]
        if "max" in lopts:
            out["maxItems"] = lopts["max"]
        if lopts.get("unique"):
            out["uniqueItems"] = True
        return out
    if t == "map":
        kt, vt = node.args
        return {"type": "object", "additionalProperties": _encode(vt, defs, opts)}
    if t == "tuple":
        return {"type": "array",
                "items": [_encode(x, defs, opts) for x in node.args[0]],
                "minItems": len(node.args[0]), "maxItems": len(node.args[0])}
    if t == "nested":
        props, req = {}, []
        for k, child in node.args[0].items():
            props[k] = _encode(child, defs, opts)
            if _is_required(child):
                req.append(k)
        out = {"type": "object", "properties": props,
               "additionalProperties": False}
        if req:
            out["required"] = req
        return out
    if t == "additional":
        inner = _encode(Node("nested", (node.args[0],)), defs, opts)
        inner["additionalProperties"] = _encode(node.args[1], defs, opts)
        return inner
    if t == "either":
        return {"anyOf": [_encode(node.args[0], defs, opts),
                          _encode(node.args[1], defs, opts)]}
    if t == "oneof":
        return {"anyOf": [_encode(x, defs, opts) for x in node.args[0]]}
    if t == "multi":
        fld, branches = node.args
        # discriminator pattern (reference multi_test.exs JSON Schema case)
        one = []
        for tag, branch in branches.items():
            enc = _encode(branch, defs, opts)
            enc.setdefault("properties", {})[fld] = {"const": tag}
            one.append(enc)
        return {"oneOf": one,
                "discriminator": {"propertyName": fld}}
    if t == "ref":
        name = node.args[0]
        if name not in defs:
            defs[name] = {}  # placeholder breaks recursion
            schema, _ = schema_registry[name]
            defs[name] = _encode(parse(schema), defs, opts)
        return {"$ref": f"#/$defs/{name}"}
    if t in ("cond", "dependent", "dependent4", "custom"):
        # dynamic types cannot be expressed statically — reference
        # encoder.ex:287-292 fallback modes
        if opts["on_unsupported"] == "raise":
            raise UnsupportedTypeError(t, "dynamic schema")
        return {}  # :omit / :true_schema → the true schema
    raise NotImplementedError(t)


def _is_required(n: Node) -> bool:
    if n.tag == "required":
        return True
    if n.tag in ("override", "meta", "transform"):
        return _is_required(n.args[0])
    return False


# ---------------------------------------------------------------------------

def from_json_schema(js: dict) -> Any:
    """JSON Schema → Peri DSL (lossy per reference decoder notes)."""
    return _decode(js)


def _decode(js: dict) -> Any:
    if not isinstance(js, dict) or js == {}:
        return "any"
    if "$ref" in js:
        return ("ref", js["$ref"].rsplit("/", 1)[-1])
    if "const" in js:
        return ("literal", js["const"])
    if "enum" in js:
        return ("enum", list(js["enum"]))
    if "anyOf" in js or "oneOf" in js:
        # oneOf decodes with anyOf (first-match) semantics — decoder.ex:78-84
        types = [_decode(x) for x in js.get("anyOf", js.get("oneOf"))]
        if len(types) == 2:
            return ("either", (types[0], types[1]))
        return ("oneof", types)
    t = js.get("type")
    if t == "object":
        if "properties" in js:
            req = set(js.get("required", []))
            out = {}
            for k, v in js["properties"].items():
                d = _decode(v)
                out[k] = ("required", d) if k in req else d
            ap = js.get("additionalProperties")
            if isinstance(ap, dict):
                return ("schema", out, ("additional_keys", _decode(ap)))
            return out
        ap = js.get("additionalProperties")
        if isinstance(ap, dict):
            return ("map", _decode(ap))
        return "map"
    if t == "array":
        items = js.get("items")
        if isinstance(items, list):
            return ("tuple", [_decode(x) for x in items])
        opts = {}
        if "minItems" in js:
            opts["min"] = js["minItems"]
        if "maxItems" in js:
            opts["max"] = js["maxItems"]
        if js.get("uniqueItems"):
            opts["unique"] = True
        elem = _decode(items) if items else "any"
        return ("list", elem, opts) if opts else ("list", elem)
    if t == "string":
        fmt = js.get("format")
        if fmt == "date":
            return "date"
        if fmt == "date-time":
            return "datetime"
        if fmt == "time":
            return "time"
        if fmt in _FORMAT_REGEX:  # email/uri → regex (decoder.ex:182-191)
            return ("string", ("regex", _FORMAT_REGEX[fmt]))
        opts = []
        if "pattern" in js:
            opts.append(("regex", js["pattern"]))
        if "minLength" in js:
            opts.append(("min", js["minLength"]))
        if "maxLength" in js:
            opts.append(("max", js["maxLength"]))
        if len(opts) == 1:
            return ("string", opts[0])
        if opts:
            return ("string", opts)
        return "string"
    if t in ("integer", "number"):
        base = "integer" if t == "integer" else None
        opts = []
        if "minimum" in js and "maximum" in js:
            opts.append(("range", (js["minimum"], js["maximum"])))
        elif "minimum" in js:
            opts.append(("gte", js["minimum"]))
        elif "maximum" in js:
            opts.append(("lte", js["maximum"]))
        if "exclusiveMinimum" in js:
            opts.append(("gt", js["exclusiveMinimum"]))
        if "exclusiveMaximum" in js:
            opts.append(("lt", js["exclusiveMaximum"]))
        if "multipleOf" in js:
            opts.append(("multiple_of", js["multipleOf"]))
        if base is None:
            # number → either(integer, float) — decoder.ex:194-198
            if opts:
                return ("either", (("integer", opts if len(opts) > 1 else opts[0]),
                                   ("float", opts if len(opts) > 1 else opts[0])))
            return ("either", ("integer", "float"))
        if len(opts) == 1:
            return (base, opts[0])
        if opts:
            return (base, opts)
        return base
    if t == "boolean":
        return "boolean"
    return "any"
