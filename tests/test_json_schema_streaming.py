"""JSON Schema round-trips (json_schema_test.exs analogue) + streaming
validation over a file-source stream (availableNow trigger)."""

import tempfile

import pytest
from pyspark.sql import functions as F

import peri_spark as ps
from peri_spark.json_schema import from_json_schema, to_json_schema
from peri_spark.streaming import (split_stream, streaming_dedup,
                                  validate_stream, violation_rates)


def test_encode_object_with_required_and_constraints():
    js = to_json_schema({
        "name": ("required", "string"),
        "age": ("integer", [("gte", 18), ("lte", 99)]),
        "role": ("enum", ["a", "b"]),
        "tags": ("list", "string", {"min": 1, "unique": True}),
    })
    assert js["type"] == "object"
    assert js["required"] == ["name"]
    assert js["properties"]["age"] == {"type": "integer",
                                       "minimum": 18, "maximum": 99}
    assert js["properties"]["role"] == {"enum": ["a", "b"]}
    assert js["properties"]["tags"] == {
        "type": "array", "items": {"type": "string"},
        "minItems": 1, "uniqueItems": True}


def test_encode_multi_discriminator():
    js = to_json_schema(("multi", "kind", {
        "a": {"kind": "string", "x": ("required", "integer")},
        "b": {"kind": "string"}}))
    assert js["discriminator"] == {"propertyName": "kind"}
    consts = [b["properties"]["kind"]["const"] for b in js["oneOf"]]
    assert sorted(consts) == ["a", "b"]


def test_encode_ref_defs():
    ps.defschema("js_city", {"name": ("required", "string")})
    js = to_json_schema({"home": ("ref", "js_city")})
    assert js["properties"]["home"] == {"$ref": "#/$defs/js_city"}
    assert js["$defs"]["js_city"]["required"] == ["name"]


def test_decode_roundtrip_basics():
    original = {
        "name": ("required", "string"),
        "age": ("integer", ("range", (0, 120))),
        "role": ("enum", ["a", "b"]),
        "tags": ("list", "string"),
    }
    back = from_json_schema(to_json_schema(original))
    assert back["name"] == ("required", "string")
    assert back["age"] == ("integer", ("range", (0, 120)))
    assert back["role"] == ("enum", ["a", "b"])
    assert back["tags"] == ("list", "string")


def test_decode_lossy_number_and_format():
    # number → either(int,float) (decoder.ex:194-198)
    assert from_json_schema({"type": "number"}) == ("either", ("integer", "float"))
    # format email → regex (decoder.ex:182-191)
    d = from_json_schema({"type": "string", "format": "email"})
    assert d[0] == "string" and d[1][0] == "regex"
    # oneOf decodes with anyOf semantics (decoder.ex:78-84)
    d2 = from_json_schema({"oneOf": [{"type": "integer"}, {"type": "string"}]})
    assert d2 == ("either", ("integer", "string"))


def test_decoded_schema_validates(spark):
    js = {"type": "object",
          "properties": {"a": {"type": "string", "minLength": 2},
                         "b": {"type": "integer", "minimum": 0}},
          "required": ["a"]}
    schema = from_json_schema(js)
    df = spark.createDataFrame([("xx", 1), (None, -5)], "a string, b long")
    res = ps.validate(df, schema)
    msgs = sorted(r["message"] for r in res.violations().collect())
    assert msgs == ["is required, expected type of :string",
                    "should be greater then or equal to 0"]


# -- streaming -----------------------------------------------------------------

@pytest.fixture()
def stream_dir(spark, tmp_path):
    src = str(tmp_path / "src")
    (spark.createDataFrame(
        [(1, "alice", 30, "2024-01-01 00:00:10"),
         (2, None, 15, "2024-01-01 00:00:20"),
         (3, "carol", 99, "2024-01-01 00:01:10"),
         (3, "carol", 99, "2024-01-01 00:01:12")],
        "id long, name string, age long, ts string")
     .withColumn("ts", F.to_timestamp("ts"))
     .write.mode("overwrite").parquet(src))
    return src


SCHEMA = {"id": ("required", "integer"),
          "name": ("required", "string"),
          "age": ("integer", ("gte", 18))}


def _read_stream(spark, src):
    batch = spark.read.parquet(src)
    return spark.readStream.schema(batch.schema).parquet(src)


def _run(stream, name):
    q = (stream.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    return q


def test_stream_split(spark, stream_dir):
    valid, viols = split_stream(_read_stream(spark, stream_dir),
                                SCHEMA, mode="permissive", id_cols=["id"])
    _run(valid, "t_valid")
    _run(viols, "t_viols")
    v = spark.sql("select id from t_valid order by id").collect()
    assert [r.id for r in v] == [1, 3, 3]
    bad = spark.sql("select id, key, message from t_viols").collect()
    assert {(r.id, r.key) for r in bad} == {(2, "name"), (2, "age")}


def test_stream_violation_rates(spark, stream_dir):
    rates = violation_rates(_read_stream(spark, stream_dir), SCHEMA,
                            ts_col="ts", window="1 minute")
    # complete mode for the test sink: append emits only watermark-closed
    # windows, and availableNow never advances the watermark past the last
    # event, so the tail windows would stay pending forever
    q = (rates.writeStream.format("memory").queryName("t_rates")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql(
        "select n_rows, n_bad_rows from t_rates order by window_start").collect()
    assert [(r.n_rows, r.n_bad_rows) for r in rows] == [(2, 1), (2, 0)]


def test_streaming_dedup(spark, stream_dir):
    dd = streaming_dedup(_read_stream(spark, stream_dir),
                         ["id"], "ts", watermark="10 minutes")
    _run(dd, "t_dedup")
    ids = sorted(r.id for r in spark.sql("select id from t_dedup").collect())
    assert ids == [1, 2, 3]


def test_violation_streaks_stateful(spark, stream_dir):
    from peri_spark.streaming import violation_streaks
    streaks = violation_streaks(_read_stream(spark, stream_dir), SCHEMA,
                                key_col="id", ts_col="ts")
    q = (streaks.writeStream.format("memory").queryName("t_streaks")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = {r.key: (r.streak, r.total_bad)
            for r in spark.sql("select * from t_streaks").collect()}
    # id=2 is the invalid row (null name, age 15): streak 1, total 1
    assert rows[2] == (1, 1)
    assert rows[1] == (0, 0) and rows[3] == (0, 0)
