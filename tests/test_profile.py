"""Schema inference: profile evidence and the zero-violation round-trip."""

import datetime

from peri_spark import validate
from peri_spark.profile import profile, suggest_schema


def _df(spark):
    rows = [
        (1, "en", "hello world", 1.5, True, datetime.date(2020, 1, 2)),
        (2, "es", "ho", 2.5, False, datetime.date(2021, 3, 4)),
        (3, "en", None, -0.5, None, None),
        (4, "es", "medium txt", 0.0, True, datetime.date(2021, 3, 4)),
    ]
    return spark.createDataFrame(
        rows, "id long, lang string, txt string, score double,"
              " flag boolean, d date")


def test_profile_rows(spark):
    got = {r.column: r for r in profile(_df(spark)).collect()}
    assert got["id"].base_type == "integer" and got["id"].required
    assert got["id"].n_distinct == 4 and not got["id"].is_enum_candidate
    assert got["lang"].is_enum_candidate and got["lang"].n_distinct == 2
    assert got["txt"].n_null == 1 and not got["txt"].required
    assert got["txt"].min_len == 2 and got["txt"].max_len == 11
    assert got["score"].min_value == "-0.5" and got["score"].max_value == "2.5"
    assert got["flag"].base_type == "boolean"
    assert got["d"].base_type == "date"


def test_suggest_schema_shapes(spark):
    s = suggest_schema(_df(spark), enum_threshold=2)
    assert s["id"] == ("required", ("integer", [("gte", 1), ("lte", 4)]))
    assert s["lang"] == ("required", ("enum", ["en", "es"]))
    assert s["txt"] == ("string", [("min", 2), ("max", 11)])
    assert s["score"] == ("required", ("float", [("gte", -0.5), ("lte", 2.5)]))
    assert s["flag"] == "boolean"
    assert s["d"] == "date"


def test_roundtrip_zero_violations(spark):
    df = _df(spark)
    res = validate(df, suggest_schema(df), mode="permissive")
    assert res.invalid.count() == 0


def test_roundtrip_zero_violations_documents(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    schema = suggest_schema(docs)
    assert schema["lang"][0] == "required"          # no NULL langs
    res = validate(docs, schema, mode="permissive")
    assert res.invalid.count() == 0
    # a mutated row violates exactly the inferred bound it breaks
    from pyspark.sql import functions as F
    bad = docs.limit(1).withColumn(
        "n_chars", F.lit(10_000_000).cast("long"))
    bres = validate(bad, schema, mode="permissive")
    rows = bres.violations("doc_id").collect()
    assert len(rows) == 1 and rows[0]["path"] == ["n_chars"]


def test_profile_single_aggregate_plan(spark):
    plan = profile(_df(spark), ["id", "lang"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_profile_generate_validate_loop(spark):
    """Close the loop: infer a schema from real data, GENERATE fresh
    rows from it, and the generated rows must conform to it."""
    from peri_spark.generate import generate_df
    from peri_spark import validate
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    schema = suggest_schema(docs, columns=["lang", "source", "n_chars"])
    gen = generate_df(spark, schema, n=200, seed=7)
    res = validate(gen, schema, mode="permissive")
    assert res.invalid.count() == 0 and res.valid.count() == 200
