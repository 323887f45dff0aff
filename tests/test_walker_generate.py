"""Walker rewrites (walker_test.exs analogue) + property tests: generated
rows conform (zero violations); mutated rows are flagged on exactly the
mutated field."""

import pytest

import peri_spark as ps
from peri_spark.generate import generate_df, generate_rows, mutate_rows, spark_ddl_for
from peri_spark.walker import drop_keys, make_all_optional, rename_keys, walk


SCHEMA = {
    "name": ("required", "string"),
    "age": ("integer", ("gte", 18)),
    "role": ("enum", ["admin", "user", "guest"]),
    "score": ("float", ("range", (0.0, 100.0))),
    "commit": ("required", ("string", ("regex", r"^[0-9a-f]{40}$"))),
    "tags": ("list", "string", {"max": 4}),
    "profile": {"city": "string", "zip": ("string", ("min", 3))},
}


# -- walker -------------------------------------------------------------------

def test_walk_identity():
    out = walk(SCHEMA, lambda e: ("cont", e))
    assert out == SCHEMA


def test_make_all_optional():
    out = make_all_optional(SCHEMA)
    assert out["name"] == "string"
    assert out["commit"] == ("string", ("regex", r"^[0-9a-f]{40}$"))


def test_drop_and_rename():
    out = drop_keys(SCHEMA, {"tags", "profile"})
    assert "tags" not in out and "profile" not in out
    out2 = rename_keys(SCHEMA, {"name": "full_name"})
    assert "full_name" in out2 and "name" not in out2


def test_walk_recurses_into_nested():
    def upcase_keys(entry):
        k, t = entry
        return ("cont", (k.upper() if k else k, t))
    out = walk(SCHEMA, upcase_keys)
    assert "PROFILE" in out and "CITY" in out["PROFILE"]


def test_walk_invalid_return_raises():
    with pytest.raises(ValueError, match="invalid walker return"):
        walk(SCHEMA, lambda e: "keep")


# -- generate → validate round-trip (property contract) -----------------------

def test_generated_rows_conform(spark):
    df = generate_df(spark, SCHEMA, n=200, seed=7, null_rate=0.2)
    res = ps.validate(df, SCHEMA)
    bad = res.violations().collect()
    assert bad == [], f"generator produced non-conforming rows: {bad[:3]}"


def test_mutated_rows_flagged_on_exact_field(spark):
    rows = generate_rows(SCHEMA, n=60, seed=11)
    mutated = mutate_rows(SCHEMA, rows, seed=12)
    keys = list(SCHEMA.keys())
    data = [tuple(m[k] for k in keys) for m, _ in mutated]
    df = spark.createDataFrame(data, spark_ddl_for(SCHEMA))
    res = ps.validate(df, SCHEMA)
    viols = res.violations().collect()
    # every mutated field is flagged at least once, and nothing else is
    flagged_keys = {v["key"] for v in viols}
    expected_keys = {k for _, k in mutated}
    assert flagged_keys == expected_keys
    # count: one mutation per row → at least n violations total
    assert len(viols) >= len(mutated)


def test_generator_determinism():
    assert generate_rows(SCHEMA, 10, seed=5) == generate_rows(SCHEMA, 10, seed=5)
    assert generate_rows(SCHEMA, 10, seed=5) != generate_rows(SCHEMA, 10, seed=6)
