"""Schema-driven synthetic data generation (``Peri.generate/1`` analogue).

Reference: lib/peri/generatable.ex:75-390 — StreamData generators per
directive, constraint filters via rejection sampling, ref depth cap 5.
Here: a seeded ``random.Random`` drives plain-Python row dicts; callers
get either rows (for fixtures) or a Spark DataFrame with the schema's
natural Spark types. Deterministic for a given (schema, seed, n).

Generated rows always CONFORM to the schema (the property-test contract:
validate(generate(schema)) must emit zero violations). ``mutate_rows``
produces targeted non-conforming variants for the inverse property.
"""

from __future__ import annotations

import random
import string
from typing import Any

from .dsl import Node, parse, schema_registry

__all__ = ["generate_rows", "generate_df", "mutate_rows", "spark_ddl_for"]

_GEN_REF_DEPTH = 5  # reference: lib/peri/generatable.ex:99,116-131


def _gen_arity(f) -> int:
    import inspect as _i
    try:
        return len(_i.signature(f).parameters)
    except (TypeError, ValueError):
        return 0


def _gen_string(rng: random.Random, opts: dict) -> str:
    lo = opts.get("min", 1)
    hi = opts.get("max", max(lo + 11, 12))
    n = rng.randint(lo, min(hi, lo + 40))
    return "".join(rng.choice(string.ascii_lowercase) for _ in range(n))


def _gen_value(node: Node, rng: random.Random, depth: int = 0) -> Any:
    t = node.tag
    if t == "prim":
        p = node.args[0]
        return {
            "any": lambda: rng.choice([rng.randint(0, 99), _gen_string(rng, {})]),
            "atom": lambda: _gen_string(rng, {}),
            "string": lambda: _gen_string(rng, {}),
            "integer": lambda: rng.randint(-1000, 1000),
            "float": lambda: round(rng.uniform(-1000, 1000), 6),
            "boolean": lambda: rng.random() < 0.5,
            "date": lambda: f"20{rng.randint(10, 25)}-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}",
            "time": lambda: f"{rng.randint(0, 23):02d}:{rng.randint(0, 59):02d}:{rng.randint(0, 59):02d}",
            "datetime": lambda: f"2024-01-{rng.randint(1, 28):02d} 12:00:00",
            "naive_datetime": lambda: f"2024-01-{rng.randint(1, 28):02d} 12:00:00",
            "map": lambda: {},
            "list": lambda: [],
            "duration": lambda: "PT1H",
            "pid": lambda: None,
        }[p]()
    if t == "literal":
        return node.args[0]
    if t == "enum":
        return rng.choice(list(node.args[0]))
    if t == "constrained":
        base, opts = node.args
        o = dict(opts)
        if base == "string":
            if "eq" in o:
                return o["eq"]
            if "regex" in o:
                # rejection sampling is unbounded for arbitrary regexes;
                # support the fixture patterns via a tiny alphabet trick
                return _gen_for_regex(o["regex"], rng)
            return _gen_string(rng, o)
        lo = o.get("gt", o.get("gte", -1000))
        hi = o.get("lt", o.get("lte", 1000))
        if "range" in o:
            lo, hi = o["range"]
        if "eq" in o:
            return o["eq"]
        for _ in range(1000):  # rejection sampling (reference style)
            v = (rng.randint(int(lo), int(hi)) if base == "integer"
                 else round(rng.uniform(float(lo), float(hi)), 6))
            if _num_ok(v, o):
                return v
        raise ValueError(f"cannot satisfy constraints {opts}")
    if t == "required":
        return _gen_value(node.args[0], rng, depth)
    if t == "default":
        return _gen_value(node.args[0], rng, depth)
    if t == "transform":
        return _gen_value(node.args[0], rng, depth)
    if t == "meta":
        # gen: override (reference lib/peri.ex:535-540) — a 0/1-arity
        # callable replaces the type-driven generator; 1-arity receives
        # the seeded rng for determinism
        opts = node.args[1] if len(node.args) > 1 and isinstance(node.args[1], dict) else {}
        g = opts.get("gen")
        if g is not None:
            return g(rng) if _gen_arity(g) >= 1 else g()
        return _gen_value(node.args[0], rng, depth)
    if t == "override":
        return _gen_value(node.args[0], rng, depth)
    if t == "list":
        elem, opts = node.args
        lo = opts.get("min", 0)
        hi = opts.get("max", lo + 3)
        vals = [_gen_value(elem, rng, depth) for _ in range(rng.randint(lo, hi))]
        if opts.get("unique"):
            seen, out = set(), []
            for v in vals:
                k = repr(v)
                if k not in seen:
                    seen.add(k)
                    out.append(v)
            return out
        return vals
    if t == "map":
        kt, vt = node.args
        n = rng.randint(0, 3)
        return {(_gen_value(kt, rng, depth) if kt else _gen_string(rng, {})):
                _gen_value(vt, rng, depth) for _ in range(n)}
    if t == "tuple":
        return tuple(_gen_value(x, rng, depth) for x in node.args[0])
    if t == "nested":
        return {k: _gen_value(v, rng, depth) for k, v in node.args[0].items()}
    if t == "either":
        return _gen_value(rng.choice(list(node.args)), rng, depth)
    if t == "oneof":
        return _gen_value(rng.choice(list(node.args[0])), rng, depth)
    if t == "ref":
        if depth >= _GEN_REF_DEPTH:
            return None
        schema, _ = schema_registry[node.args[0]]
        return _gen_value(parse(schema), rng, depth + 1)
    if t == "multi":
        fld, branches = node.args
        tag = rng.choice(list(branches))
        v = _gen_value(branches[tag], rng, depth)
        if isinstance(v, dict):
            v[fld] = tag
        return v
    if t in ("cond", "dependent", "dependent4", "custom"):
        return None  # caller-specific; cannot generically satisfy
    raise NotImplementedError(t)


_KNOWN_REGEX = {
    r"^[0-9a-f]{40}$": lambda rng: "".join(rng.choice("0123456789abcdef")
                                           for _ in range(40)),
    r"^[\w.-]+/[\w.-]+$": lambda rng: f"org{rng.randint(0, 99)}/repo{rng.randint(0, 99)}",
    r"^\d+$": lambda rng: str(rng.randint(0, 10 ** 9)),
}


def _gen_for_regex(pattern: str, rng: random.Random) -> str:
    gen = _KNOWN_REGEX.get(pattern)
    if gen:
        return gen(rng)
    import re
    for _ in range(5000):  # rejection sampling over short lowercase strings
        s = _gen_string(rng, {})
        if re.search(pattern, s):
            return s
    raise ValueError(f"cannot generate for regex {pattern!r}; register it "
                     "in _KNOWN_REGEX")


def _num_ok(v, o: dict) -> bool:
    if "gt" in o and not v > o["gt"]:
        return False
    if "gte" in o and not v >= o["gte"]:
        return False
    if "lt" in o and not v < o["lt"]:
        return False
    if "lte" in o and not v <= o["lte"]:
        return False
    if "neq" in o and v == o["neq"]:
        return False
    if "range" in o and not (o["range"][0] <= v <= o["range"][1]):
        return False
    if "multiple_of" in o:
        m = o["multiple_of"]
        if isinstance(v, int) and isinstance(m, int):
            if v % m != 0:
                return False
        else:
            q = v / m
            if abs(q - round(q)) >= 1e-9:
                return False
    return True


def generate_rows(schema, n: int, seed: int = 42,
                  null_rate: float = 0.0) -> list[dict]:
    """n conforming rows; optional nulls injected into OPTIONAL fields only."""
    node = parse(schema)
    assert node.tag == "nested", "generate_rows wants a dict schema"
    rng = random.Random(seed)
    entries = node.args[0]
    rows = []
    for _ in range(n):
        row = {}
        for k, child in entries.items():
            optional = child.tag not in ("required", "literal") \
                and not (child.tag in ("override", "meta")
                         and child.args[0].tag == "required")
            if optional and null_rate and rng.random() < null_rate:
                row[k] = None
            else:
                row[k] = _gen_value(child, rng)
        rows.append(row)
    return rows


def spark_ddl_for(schema) -> str:
    """Natural Spark DDL for a schema's generated rows."""
    node = parse(schema)
    parts = [f"`{k}` {_ddl(v)}" for k, v in node.args[0].items()]
    return ", ".join(parts)


def _ddl(node: Node) -> str:
    t = node.tag
    if t in ("required", "default", "transform", "meta", "override"):
        return _ddl(node.args[0])
    if t == "prim":
        return {
            "any": "string", "atom": "string", "string": "string",
            "integer": "long", "float": "double", "boolean": "boolean",
            "date": "string", "time": "string", "datetime": "string",
            "naive_datetime": "string", "map": "map<string,string>",
            "list": "array<string>", "duration": "string", "pid": "string",
        }[node.args[0]]
    if t == "literal":
        v = node.args[0]
        return ("long" if isinstance(v, bool) is False and isinstance(v, int)
                else "boolean" if isinstance(v, bool)
                else "double" if isinstance(v, float) else "string")
    if t == "enum":
        return "long" if all(isinstance(c, int) and not isinstance(c, bool)
                             for c in node.args[0]) else "string"
    if t == "constrained":
        return {"string": "string", "integer": "long",
                "float": "double"}[node.args[0]]
    if t == "list":
        return f"array<{_ddl(node.args[0])}>"
    if t == "map":
        kt = _ddl(node.args[0]) if node.args[0] else "string"
        return f"map<{kt},{_ddl(node.args[1])}>"
    if t == "tuple":
        inner = ", ".join(f"_{i + 1} {_ddl(x)}"
                          for i, x in enumerate(node.args[0]))
        return f"struct<{inner}>"
    if t == "nested":
        inner = ", ".join(f"{k}: {_ddl(v)}" for k, v in node.args[0].items())
        return f"struct<{inner}>"
    if t == "either":
        return _ddl(node.args[0])
    if t == "oneof":
        return _ddl(node.args[0][0])
    if t == "ref":
        schema, _ = schema_registry[node.args[0]]
        return _ddl(parse(schema))
    if t == "multi":
        return _ddl(next(iter(node.args[1].values())))
    return "string"


def generate_df(spark, schema, n: int, seed: int = 42,
                null_rate: float = 0.0):
    rows = generate_rows(schema, n, seed, null_rate)
    ddl = spark_ddl_for(schema)
    keys = list(parse(schema).args[0].keys())
    data = [tuple(r[k] for k in keys) for r in rows]
    return spark.createDataFrame(data, ddl)


def mutate_rows(schema, rows: list[dict], seed: int = 43) -> list[tuple[dict, str]]:
    """For each row, one targeted mutation that must be flagged: returns
    (mutated_row, mutated_key) pairs. Mutations: required→None,
    enum→out-of-domain, constrained string→too short/long, numeric→out of
    bounds."""
    node = parse(schema)
    entries = node.args[0]
    rng = random.Random(seed)
    out = []
    mutable = {k: v for k, v in entries.items()
               if _mutation_for(v) is not None}
    for row in rows:
        k = rng.choice(sorted(mutable))
        m = dict(row)
        m[k] = _mutation_for(mutable[k])(rng, row[k])
        out.append((m, k))
    return out


def _mutation_for(node: Node):
    t = node.tag
    if t in ("meta", "override"):
        return _mutation_for(node.args[0])
    if t == "required":
        return lambda rng, v: None
    if t == "enum":
        return lambda rng, v: "__not_a_choice__" \
            if any(isinstance(c, str) for c in node.args[0]) else -999999
    if t == "literal":
        return lambda rng, v: "__wrong__" if isinstance(node.args[0], str) else None
    if t == "constrained":
        base, opts = node.args
        o = dict(opts)
        if base == "string":
            if "min" in o:
                return lambda rng, v: "x" * max(o["min"] - 1, 0)
            if "max" in o:
                return lambda rng, v: "x" * (o["max"] + 1)
            if "regex" in o:
                return lambda rng, v: "///not--matching§§§"
            if "eq" in o:
                return lambda rng, v: o["eq"] + "_x"
        else:
            if "gte" in o:
                return lambda rng, v: o["gte"] - 1
            if "gt" in o:
                return lambda rng, v: o["gt"] - 1
            if "lte" in o:
                return lambda rng, v: o["lte"] + 1
            if "lt" in o:
                return lambda rng, v: o["lt"] + 1
            if "range" in o:
                return lambda rng, v: o["range"][1] + 1
            if "eq" in o:
                return lambda rng, v: o["eq"] + 1
            if "neq" in o:
                return lambda rng, v: o["neq"]
    return None
