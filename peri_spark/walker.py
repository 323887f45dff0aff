"""Schema walker: depth-first pre-order rewrite of schema definitions.

Analogue of ``Peri.walk/2`` (reference: lib/peri/walker.ex:57-162; tests
test/walker_test.exs:6-200). The callback sees each (key, directive) entry
and each bare directive, returning:

- ``("cont", (key, directive))``  — keep (possibly rewritten; key rename ok)
- ``"drop"``                      — remove this entry
- anything else                   — raises ValueError (invalid return)

Operates on the *raw* DSL (dicts/tuples), before parsing — like the
reference, which rewrites the literal schema term.
"""

from __future__ import annotations

from typing import Any, Callable

__all__ = ["walk", "make_all_optional", "drop_keys", "rename_keys",
           "schema_diff", "migration_impact"]

_NESTING = {"required", "meta"}  # single-inner-type wrappers to recurse


def _walk_type(t: Any, fn: Callable) -> Any:
    """Recurse into composite directives, rewriting nested schemas."""
    if isinstance(t, dict):
        return walk(t, fn)
    if not isinstance(t, tuple) or not t:
        return t
    head = t[0]
    if head in _NESTING and len(t) >= 2:
        return (head, _walk_type(t[1], fn), *t[2:])
    if head == "list":
        return ("list", _walk_type(t[1], fn), *t[2:])
    if head == "map":
        return ("map", *[_walk_type(x, fn) for x in t[1:]])
    if head == "tuple" and len(t) == 2:
        return ("tuple", [_walk_type(x, fn) for x in t[1]])
    if head == "schema":
        return ("schema", _walk_type(t[1], fn), *t[2:])
    if head == "either" and len(t) == 2:
        a, b = t[1]
        return ("either", (_walk_type(a, fn), _walk_type(b, fn)))
    if head == "oneof" and len(t) == 2:
        return ("oneof", [_walk_type(x, fn) for x in t[1]])
    if head == "cond" and len(t) == 4:
        return ("cond", t[1], _walk_type(t[2], fn), _walk_type(t[3], fn))
    if head == "dependent" and len(t) == 4:
        return ("dependent", t[1], t[2], _walk_type(t[3], fn))
    if head == "multi" and len(t) == 3:
        return ("multi", t[1], {k: _walk_type(v, fn) for k, v in t[2].items()})
    return t


def walk(schema: Any, fn: Callable) -> Any:
    """Rewrite a schema depth-first, pre-order (entries before nesting)."""
    if isinstance(schema, dict):
        out = {}
        for k, v in schema.items():
            res = fn((k, v))
            if res == "drop":
                continue
            if (isinstance(res, tuple) and len(res) == 2
                    and res[0] == "cont"):
                nk, nv = res[1]
                out[nk] = _walk_type(nv, fn)
            else:
                raise ValueError(
                    f"invalid walker return for key {k!r}: {res!r} "
                    "(expected ('cont', (key, type)) or 'drop')")
        return out
    res = fn((None, schema))
    if res == "drop":
        return None
    if isinstance(res, tuple) and len(res) == 2 and res[0] == "cont":
        return _walk_type(res[1][1], fn)
    raise ValueError(f"invalid walker return: {res!r}")


# -- common rewrites (reference walker_test.exs scenarios) --------------------

def make_all_optional(schema: dict) -> dict:
    """Strip every ``("required", t)`` wrapper."""
    def fn(entry):
        k, t = entry
        while isinstance(t, tuple) and t and t[0] == "required":
            t = t[1]
        return ("cont", (k, t))
    return walk(schema, fn)


def drop_keys(schema: dict, keys: set[str]) -> dict:
    def fn(entry):
        k, t = entry
        return "drop" if k in keys else ("cont", (k, t))
    return walk(schema, fn)


def rename_keys(schema: dict, mapping: dict[str, str]) -> dict:
    def fn(entry):
        k, t = entry
        return ("cont", (mapping.get(k, k), t))
    return walk(schema, fn)


def _unwrap(n):
    """Strip presentation wrappers (override/meta) and surface
    (required, inner): returns (required?, core-node)."""
    from . import dsl
    req = False
    while isinstance(n, dsl.Node):
        if n.tag in ("override", "meta"):
            n = n.args[0]
        elif n.tag == "required":
            req = True
            n = n.args[0]
        else:
            break
    return req, n


def schema_diff(old: dict, new: dict) -> dict:
    """Structural diff of two Peri schemas — the schema-evolution check a
    long-lived validation pipeline runs before accepting a new schema
    version (Iceberg-style column add/drop/retype, requiredness flips).

    Compares the NORMALIZED ASTs (``dsl.parse``), so formatting-only
    rewrites (list vs tuple options, equivalent option order is NOT
    normalized — options are positional in Peri) of the same directive
    don't flag. Returns::

        {"added":    {path: summary},      # new-only keys
         "removed":  {path: summary},      # old-only keys
         "changed":  {path: {"old": s, "new": s}},  # same key, new type
         "required_added":   [path],       # optional -> required
         "required_removed": [path],       # required -> optional
         "breaking": bool}

    ``breaking`` is the conservative backward-compatibility verdict:
    data valid under ``old`` may fail under ``new`` iff a key was
    removed*, retyped, or newly required. (*Removal breaks strict-mode
    consumers of the projection, so it counts.) Added OPTIONAL keys and
    required->optional relaxations are non-breaking. Nested map schemas
    recurse with dotted paths.
    """
    from . import dsl
    out = {"added": {}, "removed": {}, "changed": {},
           "required_added": [], "required_removed": []}
    added_required: list[str] = []

    def visit(o_entries, n_entries, prefix):
        for k in sorted(set(o_entries) | set(n_entries)):
            path = f"{prefix}{k}"
            if k not in n_entries:
                out["removed"][path] = errors_mod.summarize(o_entries[k])
                continue
            if k not in o_entries:
                out["added"][path] = errors_mod.summarize(n_entries[k])
                if _unwrap(n_entries[k])[0]:
                    added_required.append(path)
                continue
            o_req, o_core = _unwrap(o_entries[k])
            n_req, n_core = _unwrap(n_entries[k])
            if o_req != n_req:
                out["required_added" if n_req
                    else "required_removed"].append(path)
            if o_core.tag == "nested" and n_core.tag == "nested":
                visit(o_core.args[0], n_core.args[0], path + ".")
            elif o_core != n_core:
                out["changed"][path] = {
                    "old": errors_mod.summarize(o_core),
                    "new": errors_mod.summarize(n_core)}

    from . import errors as errors_mod
    o_root = dsl.parse_schema(old)
    n_root = dsl.parse_schema(new)
    visit(o_root.args[0], n_root.args[0], "")
    # an added key that is REQUIRED breaks old data (it lacks the key)
    out["breaking"] = bool(out["removed"] or out["changed"]
                           or out["required_added"] or added_required)
    return out


def migration_impact(df, old_schema: dict, new_schema: dict):
    """The DYNAMIC complement to :func:`schema_diff`: run BOTH schema
    versions over the same frame and classify every row —
    ``(status, n)`` with status ``still_valid`` / ``newly_invalid``
    (the migration's breakage set) / ``newly_valid`` /
    ``still_invalid``. ``schema_diff`` says what changed; this says how
    much real data it breaks — the number a migration review actually
    wants.

    ONE pruned scan: both schemas compile to violation-array
    expressions evaluated in the same projection (lean structs — only
    emptiness matters), then a 4-row aggregate. No join, no row ids
    needed, duplicate rows count once each.
    """
    from pyspark.sql import functions as F

    from .compiler import compile_fields
    from .dsl import parse
    from .engine import _concat_viols

    def bad(schema):
        from .compiler import count_of
        outs = compile_fields(parse(schema).args[0], df.schema,
                              "permissive", lean=True)
        # r6: aggregate the integer count twin — the struct-array never
        # materializes in this counting-only plan
        return count_of(_concat_viols([o.viols for o in outs])) > 0
    status = (F.when(~bad(old_schema) & ~bad(new_schema), "still_valid")
              .when(~bad(old_schema) & bad(new_schema), "newly_invalid")
              .when(bad(old_schema) & ~bad(new_schema), "newly_valid")
              .otherwise("still_invalid"))
    return (df.select(status.alias("status"))
            .groupBy("status").agg(F.count(F.lit(1)).alias("n")))
