"""Driver-oracle queries for every SURVEY.md §2 directive.

Round 1 oracle-checked ~1/3 of the directive inventory; this module gives
each remaining directive a ``queries()`` entry + a hand-derived DuckDB
``oracle_sql()`` so the driver's rows+schema+hash gate exercises the whole
§2 table (VERDICT r01 "Next round" #1).

Pattern: nested/array/map/tuple columns are CONSTRUCTED inside the query
from flat TPC-H columns (``F.struct/array/create_map/split``), the Peri
schema validates them, and the oracle SQL reproduces the exact violation
rows (key, '/'-joined path, message) from the same base tables. Messages
mirror compiler.py, which mirrors the reference verbatim
(zoedsoupe/peri lib/peri.ex:801-968, 1174-1438).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import oracle as po
from .dsl import ColFn, Expr, defschema
from .engine import validate

__all__ = ["DIRECTIVE_QUERIES", "DIRECTIVE_ORACLES"]


def _flat(df: DataFrame, schema, id_cols) -> DataFrame:
    """Violations as (ids…, key, err_path joined with '/', message)."""
    res = validate(df, schema, mode="permissive")
    v = res.violations(*id_cols)
    path_col = "err_path" if "err_path" in v.columns else "path"
    return v.select(*id_cols, "key",
                    F.array_join(path_col, "/").alias("err_path"), "message")


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_literal_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{:literal, v} (#2): o_orderstatus must be exactly 'F'."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return _flat(orders, {"o_orderstatus": ("literal", "F")}, ["o_orderkey"])


def q_list_constraints_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{:list, t, opts} min/unique gating (#20, lib/peri.ex:1396-1430)."""
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    arr = (F.when(F.col("p_partkey") % 5 == 0, F.array(F.col("p_name")))
           .when(F.col("p_partkey") % 11 == 0,
                 F.array(F.col("p_brand"), F.col("p_brand")))
           .otherwise(F.array(F.col("p_brand"), F.col("p_type"))))
    df = part.select("p_partkey", arr.alias("arr"))
    return _flat(df, {"arr": ("list", "string", {"min": 2, "unique": True})},
                 ["p_partkey"])


def q_list_elements_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{:list, t} element validation (#19): per-index violation paths."""
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    df = part.select("p_partkey", F.split("p_name", " ").alias("words"))
    return _flat(df, {"words": ("list", ("string", ("max", 5)))},
                 ["p_partkey"])


def q_map_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{:map, kt, vt} (#21-22): key+value directives over a map column."""
    li = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .where(F.col("l_partkey") % 10 == 0))
    df = li.select(
        "l_orderkey", "l_linenumber",
        F.create_map(F.lit("qty"), F.col("l_quantity"),
                     F.lit("price"), F.col("l_extendedprice")).alias("m"))
    return _flat(df, {"m": ("map", ("string", ("min", 4)),
                            ("float", ("lt", 2000.0)))},
                 ["l_orderkey", "l_linenumber"])


def q_tuple_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{:tuple, types} (#23): element directives + arity mismatch."""
    li = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .where(F.col("l_partkey") % 10 == 0))
    pair = F.struct(F.col("l_quantity").alias("q"), F.col("l_tax").alias("t"))
    df = li.select("l_orderkey", "l_linenumber",
                   pair.alias("pair"), pair.alias("trio"))
    return _flat(df, {"pair": ("tuple", [("float", ("lte", 49.0)), "float"]),
                      "trio": ("tuple", ["float", "float", "float"])},
                 ["l_orderkey", "l_linenumber"])


def q_nested_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nested map schema (#24): child violations carry parent/child path."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    df = cust.select("c_custkey", F.struct(
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("bal")).alias("profile"))
    return _flat(df, {"profile": {"name": ("required", "string"),
                                  "bal": ("float", ("gte", 0.0))}},
                 ["c_custkey"])


def q_additional_keys_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{:schema, s, {:additional_keys, vt}} (#25, lib/peri.ex:1272-1296)."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    df = cust.select("c_custkey", F.struct(
        F.col("c_mktsegment").alias("seg"),
        F.col("c_name").alias("name"),
        F.col("c_custkey").cast("string").alias("ckey")).alias("profile"))
    schema = {"profile": ("schema", {"seg": ("string", ("min", 2))},
                          ("additional_keys", ("string", ("max", 17))))}
    return _flat(df, schema, ["c_custkey"])


def q_oneof_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{:oneof, types} (#35): all alternatives must fail to violate."""
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    schema = {"n_name": ("oneof", [("string", ("eq", "FRANCE")),
                                   ("string", ("eq", "GERMANY")),
                                   ("string", ("regex", "^NATION_1"))])}
    return _flat(nation, schema, ["n_nationkey"])


def q_cond_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{:cond, cb, t, f} (#36): branch on a root-column SQL condition."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    schema = {"o_totalprice": ("cond", Expr("o_orderstatus = 'F'"),
                               ("float", ("lte", 300000.0)),
                               ("float", ("gte", 50000.0)))}
    return _flat(orders, schema, ["o_orderkey"])


def q_dependent_branches_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{:dependent, cb} branch-dict form (#37): schema picked per row by
    another column's value (vectorized CASE over branches)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    schema = {"value": ("dependent", {
        "on": "event_type",
        "branches": {"purchase": ("float", ("gte", 1.0)),
                     "click": ("float", ("lte", 99.0))},
        "else": "float"})}
    return _flat(ev, schema, ["event_id"])


def q_dependent4_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{:dependent, field, cb, type} (#38): condition + custom error."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    schema = {"value": ("dependent", "event_type",
                        {"cond": Expr("event_type <> 'error'"),
                         "error": "value not allowed for error events"},
                        ("float", ("lte", 100.0)))}
    return _flat(ev, schema, ["event_id"])


def q_custom_expr_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{:custom, f} expression form (#39): vectorized predicate + message."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    schema = {"c_acctbal": ("custom", {
        "cond": Expr("c_acctbal >= 0 OR c_mktsegment = 'BUILDING'"),
        "error": "negative balance requires BUILDING segment"})}
    return _flat(cust, schema, ["c_custkey"])


def q_multi_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{:multi, field, branches} (#40): tag dispatch with unknown/missing."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    kind = (F.when(F.col("event_id") % 13 == 3, F.lit(None).cast("string"))
            .otherwise(F.col("event_type")))
    df = ev.select("event_id", F.struct(
        kind.alias("kind"), F.col("value").alias("value")).alias("payload"))
    schema = {"payload": ("multi", "kind", {
        "click": {"kind": "string", "value": ("float", ("lte", 99.0))},
        "purchase": {"kind": "string", "value": ("float", ("gte", 1.0))}})}
    return _flat(df, schema, ["event_id"])


def q_ref_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{:ref, name} (#41): registry resolution inside a nested column."""
    defschema("addr_v1", {"street": ("string", ("min", 5)),
                          "nk": ("integer", ("lte", 20))})
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    df = cust.select("c_custkey", F.struct(
        F.col("c_mktsegment").alias("street"),
        F.col("c_nationkey").alias("nk")).alias("addr"))
    return _flat(df, {"addr": ("ref", "addr_v1")}, ["c_custkey"])


def q_meta_override_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{:meta, t, opts} passthrough (#42) + error: override (#43)."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    schema = {
        "c_name": ("meta", ("string", ("regex", r"^Customer#00000\d{4}$")),
                   {"description": "customer display name"}),
        "c_mktsegment": ("string", [("eq", "BUILDING"),
                                    ("error", "must be BUILDING")]),
    }
    return _flat(cust, schema, ["c_custkey"])


def q_enum_opts_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """enum + type/error opts (#4): base type and message override."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    schema = {"event_type": ("enum", ["click", "view", "purchase", "signup"],
                             {"type": ("string", ("min", 4)),
                              "error": "unknown event type"})}
    return _flat(ev, schema, ["event_id"])


def q_num_constraints_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """numeric eq/neq/lt/lte/gte (#9-12): oracle generated from the same
    AST via peri_spark.oracle (one schema, two engines)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return _flat(li, _NUM_SCHEMA, ["l_orderkey", "l_linenumber"])


_NUM_SCHEMA = {
    "l_linenumber": ("integer", ("lt", 5)),
    "l_quantity": ("float", ("neq", 13.0)),
    "l_discount": ("float", [("gte", 0.0), ("lte", 0.08)]),
}


def q_nested_defaults_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nested defaults on nil parent (#29, lib/peri.ex:1048-1054): the
    defaults-struct materializes when the parent struct is null."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    tier = (F.when(F.col("c_custkey") % 3 == 0, F.lit(None).cast("string"))
            .otherwise(F.col("c_mktsegment")))
    profile = F.when(F.col("c_custkey") % 7 != 0,
                     F.struct(tier.alias("tier")))
    df = cust.select("c_custkey", profile.alias("profile"))
    res = validate(df, {"profile": {"tier": ("string", ("default", "basic"))}},
                   mode="permissive")
    return res.valid.select(
        "c_custkey", F.col("profile").getField("tier").alias("tier"))


def q_transform_colfn_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform f/2 (#31): ColFn(value, root) rewriting a passing value."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    fn = ColFn(lambda v, root: F.concat(v, F.lit("@"), root("o_orderstatus")))
    res = validate(orders, {"o_orderpriority": ("string", ("transform", fn))},
                   mode="permissive")
    return res.valid.select("o_orderkey", "o_orderpriority")


def q_transform_root_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform f/2 explicit row (#31, lib/peri.ex:1067-1074): the
    2-arity callback receives (value, root accessor) — the vectorized
    analogue of the reference's fn(val, data)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    fn = ColFn(lambda v, root: F.concat(
        v, F.lit("#"), F.substring(root("o_orderpriority"), 1, 1)))
    res = validate(orders, {"o_orderstatus": ("string", ("transform", fn))},
                   mode="permissive")
    return res.valid.select("o_orderkey", "o_orderstatus")


def q_type_strictness_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """numeric type-strictness (#16, reference test/peri_test.exs:
    2360-2384): :float does NOT accept an integer column and :integer
    does not accept a string column — static mismatch, so every non-null
    value violates (no coercion)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return _flat(orders, {"o_custkey": "float", "o_orderstatus": "integer"},
                 ["o_orderkey"])


def q_duration_strings_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:duration runtime check (#1c): Elixir Duration.from_iso8601
    grammar — negative components and fractional seconds accepted; bare
    'P', dangling 'T', unit-without-T and out-of-order designators
    rejected (compiler.py duration branch)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    m = F.col("event_id") % 60
    d = (F.when(m == 0, F.lit("P"))                # bare P → reject
         .when(m == 1, F.lit("P1YT"))             # dangling T → reject
         .when(m == 2, F.lit("P5S"))              # S without T → reject
         .when(m == 3, F.lit("PT4.650S"))         # fractional seconds → ok
         .when(m == 4, F.lit("-PT10H-30M"))       # leading minus → ok
         .when(m == 5, F.lit("P3Y-2MT3H"))        # negative component → ok
         .when(m == 6, F.lit("PT3H5Y"))           # out of order → reject
         .when(m == 7, F.lit("P2W"))              # weeks → ok
         .otherwise(F.concat(F.lit("PT"), (F.col("event_id") % 24)
                             .cast("string"), F.lit("H"))))
    df = ev.select("event_id", d.alias("d"))
    return _flat(df, {"d": "duration"}, ["event_id"])


def q_time_strings_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:time runtime check (#1b): anchored, range-checked HH:mm:ss."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    base = F.substring(F.col("ts").cast("string"), 12, 8)
    t = (F.when(F.col("event_id") % 50 == 7, F.lit("99:99:99"))
         .when(F.col("event_id") % 50 == 8, F.concat(base, F.lit("x")))
         .when(F.col("event_id") % 50 == 9, F.lit("7:00:00"))
         .otherwise(base))
    df = ev.select("event_id", t.alias("t"))
    return _flat(df, {"t": "time"}, ["event_id"])


def q_verdicts_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 per-partition verdicts: counts + pass/fail per event_type."""
    from .constraints import partition_verdicts

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    res = validate(ev, _EVENTS_SCHEMA, mode="permissive")
    v = partition_verdicts(res.annotated, "event_type")
    return v.select("event_type", "n_rows", "n_bad_rows", "n_violations",
                    F.round("bad_ratio", 6).alias("bad_ratio"), "passed")


_EVENTS_SCHEMA = {
    "event_id": ("required", "integer"),
    "ts": ("required", "datetime"),
    "event_type": ("enum", ["click", "view", "purchase", "signup"]),
    "value": ("float", ("range", (0.0, 100.0))),
    "user_id": ("required", "integer"),
}


def q_error_callable_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """callable error: override (#43 full form): the MFA analogue — a
    compile-time callback receives the ErrorRef (default message/content
    Columns) and builds the replacement message as a Column expression
    (reference lib/peri/error.ex:182-195, test/custom_errors_test.exs)."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    cb = lambda e: F.concat(F.upper(e.message), F.lit(" [acct]"))  # noqa: E731
    schema = {"c_acctbal": ("float", [("gte", 0.0), ("error", cb)])}
    return _flat(cust, schema, ["c_custkey"])


def q_grapheme_min_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """length_mode='grapheme' (#7 exact mode): combining-mark strings
    count as grapheme clusters (Elixir String.length parity,
    lib/peri.ex:879-893); 'xxxx' + 'e' + U+0301 is 6 chars but 5
    graphemes, failing min=6 only in grapheme mode."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # NB: Spark's chr() is ASCII-only (mod 256) — embed U+0301 directly
    # as the two-codepoint cluster "e" + combining acute (6 chars total,
    # 5 graphemes: fails min=6 only when counting graphemes)
    t2 = (F.when(F.col("doc_id") % 3 == 0,
                 F.concat(F.substring("text", 1, 4), F.lit("e\u0301")))
          .otherwise(F.substring("text", 1, 6)))
    df = docs.select("doc_id", t2.alias("t2"))
    res = validate(df, {"t2": ("string", ("min", 6))},
                   mode="permissive", length_mode="grapheme")
    v = res.violations("doc_id")
    return v.select("doc_id", "key",
                    F.array_join("path", "/").alias("err_path"), "message")


def q_fidelity_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 sha256 fidelity vs a reference pass (tampered in-query)."""
    from .constraints import fidelity_violations

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ref = docs.select("doc_id", F.when(
        F.col("doc_id") % 97 == 3, F.concat(F.col("text"), F.lit("X")))
        .otherwise(F.col("text")).alias("text"))
    bad = fidelity_violations(docs, ref, ["doc_id"], "text")
    return bad.select("doc_id", F.col("__sha").alias("sha_actual"),
                      F.col("__ref_sha").alias("sha_ref"))


DIRECTIVE_QUERIES = {
    "literal_orders": q_literal_orders,
    "list_constraints_part": q_list_constraints_part,
    "list_elements_part": q_list_elements_part,
    "map_lineitem": q_map_lineitem,
    "tuple_lineitem": q_tuple_lineitem,
    "nested_customer": q_nested_customer,
    "additional_keys_customer": q_additional_keys_customer,
    "oneof_nation": q_oneof_nation,
    "cond_orders": q_cond_orders,
    "dependent_branches_events": q_dependent_branches_events,
    "dependent4_events": q_dependent4_events,
    "custom_expr_customer": q_custom_expr_customer,
    "multi_events": q_multi_events,
    "ref_customer": q_ref_customer,
    "meta_override_customer": q_meta_override_customer,
    "enum_opts_events": q_enum_opts_events,
    "num_constraints_lineitem": q_num_constraints_lineitem,
    "nested_defaults_customer": q_nested_defaults_customer,
    "transform_colfn_orders": q_transform_colfn_orders,
    "transform_root_orders": q_transform_root_orders,
    "type_strictness_orders": q_type_strictness_orders,
    "duration_strings_events": q_duration_strings_events,
    "time_strings_events": q_time_strings_events,
    "verdicts_events": q_verdicts_events,
    "fidelity_documents": q_fidelity_documents,
    "error_callable_customer": q_error_callable_customer,
    "grapheme_min_documents": q_grapheme_min_documents,
}


# ---------------------------------------------------------------------------
# oracles (DuckDB SQL) — messages must match compiler.py byte-for-byte
# ---------------------------------------------------------------------------

_ORACLES: dict[str, str] = {}

_ORACLES["literal_orders"] = """
SELECT o_orderkey, 'o_orderstatus' AS key, 'o_orderstatus' AS err_path,
       'expected literal value "F" but got ' ||
       CASE WHEN o_orderstatus IS NULL THEN 'nil'
            ELSE '"' || o_orderstatus || '"' END AS message
FROM orders
WHERE o_orderstatus IS NULL OR o_orderstatus <> 'F'
"""

_ORACLES["list_constraints_part"] = """
WITH t AS (
  SELECT p_partkey,
         CASE WHEN p_partkey % 5 = 0 THEN [p_name]
              WHEN p_partkey % 11 = 0 THEN [p_brand, p_brand]
              ELSE [p_brand, p_type] END AS arr
  FROM part)
SELECT p_partkey, 'arr' AS key, 'arr' AS err_path,
       'should have at least 2 items' AS message
FROM t WHERE len(arr) < 2
UNION ALL
SELECT p_partkey, 'arr', 'arr', 'should have unique items'
FROM t WHERE len(list_distinct(arr)) <> len(arr)
"""

_ORACLES["list_elements_part"] = """
WITH t AS (SELECT p_partkey, string_split(p_name, ' ') AS words FROM part)
SELECT p_partkey, 'words' AS key,
       'words/' || CAST(i AS STRING) AS err_path,
       'should have the maximum length of 5' AS message
FROM t, LATERAL (SELECT unnest(range(len(words))) AS i) r
WHERE length(words[i + 1]) > 5
"""

_ORACLES["map_lineitem"] = """
SELECT l_orderkey, l_linenumber, 'm' AS key, 'm/price' AS err_path,
       'should be less then 2000.0' AS message
FROM lineitem
WHERE l_partkey % 10 = 0 AND l_extendedprice IS NOT NULL
  AND l_extendedprice >= 2000.0
UNION ALL
SELECT l_orderkey, l_linenumber, 'm', 'm/qty',
       'should have the minimum length of 4'
FROM lineitem WHERE l_partkey % 10 = 0
"""

_ORACLES["tuple_lineitem"] = """
SELECT l_orderkey, l_linenumber, 'pair' AS key, 'pair' AS err_path,
       'tuple element 0: should be less then or equal to 49.0' AS message
FROM lineitem
WHERE l_partkey % 10 = 0 AND l_quantity IS NOT NULL AND l_quantity > 49.0
UNION ALL
SELECT l_orderkey, l_linenumber, 'trio', 'trio',
       'expected tuple of size 3 received tuple with 2 length'
FROM lineitem WHERE l_partkey % 10 = 0
"""

_ORACLES["nested_customer"] = """
SELECT c_custkey, 'bal' AS key, 'profile/bal' AS err_path,
       'should be greater then or equal to 0.0' AS message
FROM customer WHERE c_acctbal IS NOT NULL AND c_acctbal < 0.0
UNION ALL
SELECT c_custkey, 'name', 'profile/name',
       'is required, expected type of :string'
FROM customer WHERE c_name IS NULL
"""

_ORACLES["additional_keys_customer"] = """
SELECT c_custkey, 'seg' AS key, 'profile/seg' AS err_path,
       'should have the minimum length of 2' AS message
FROM customer WHERE c_mktsegment IS NOT NULL AND length(c_mktsegment) < 2
UNION ALL
SELECT c_custkey, 'name', 'profile/name',
       'should have the maximum length of 17'
FROM customer WHERE c_name IS NOT NULL AND length(c_name) > 17
UNION ALL
SELECT c_custkey, 'ckey', 'profile/ckey',
       'should have the maximum length of 17'
FROM customer
WHERE c_custkey IS NOT NULL AND length(CAST(c_custkey AS STRING)) > 17
"""

_ORACLES["oneof_nation"] = """
SELECT n_nationkey, 'n_name' AS key, 'n_name' AS err_path,
       'expected one of :string or :string or :string, got: "'
         || n_name || '"' AS message
FROM nation
WHERE n_name IS NOT NULL
  AND n_name <> 'FRANCE' AND n_name <> 'GERMANY'
  AND NOT regexp_matches(n_name, '^NATION_1')
"""

_ORACLES["cond_orders"] = """
SELECT o_orderkey, 'o_totalprice' AS key, 'o_totalprice' AS err_path,
       CASE WHEN o_orderstatus = 'F'
            THEN 'should be less then or equal to 300000.0'
            ELSE 'should be greater then or equal to 50000.0'
       END AS message
FROM orders
WHERE (o_orderstatus = 'F' AND o_totalprice IS NOT NULL
       AND o_totalprice > 300000.0)
   OR (NOT COALESCE(o_orderstatus = 'F', FALSE)
       AND o_totalprice IS NOT NULL AND o_totalprice < 50000.0)
"""

_ORACLES["dependent_branches_events"] = """
SELECT event_id, 'value' AS key, 'value' AS err_path,
       CASE WHEN event_type = 'purchase'
            THEN 'should be greater then or equal to 1.0'
            ELSE 'should be less then or equal to 99.0' END AS message
FROM events
WHERE (event_type = 'purchase' AND value IS NOT NULL AND value < 1.0)
   OR (event_type = 'click' AND value IS NOT NULL AND value > 99.0)
"""

_ORACLES["dependent4_events"] = """
SELECT event_id, 'value' AS key, 'value' AS err_path,
       'value not allowed for error events' AS message
FROM events WHERE NOT COALESCE(event_type <> 'error', FALSE)
UNION ALL
SELECT event_id, 'value', 'value',
       'should be less then or equal to 100.0'
FROM events
WHERE COALESCE(event_type <> 'error', FALSE)
  AND value IS NOT NULL AND value > 100.0
"""

_ORACLES["custom_expr_customer"] = """
SELECT c_custkey, 'c_acctbal' AS key, 'c_acctbal' AS err_path,
       'negative balance requires BUILDING segment' AS message
FROM customer
WHERE c_acctbal IS NOT NULL
  AND NOT COALESCE(c_acctbal >= 0 OR c_mktsegment = 'BUILDING', FALSE)
"""

_ORACLES["multi_events"] = """
WITH t AS (
  SELECT event_id, value,
         CASE WHEN event_id % 13 = 3 THEN NULL ELSE event_type END AS kind
  FROM events)
SELECT event_id, 'payload' AS key, 'payload' AS err_path,
       'missing :multi dispatch field :kind' AS message
FROM t WHERE kind IS NULL
UNION ALL
SELECT event_id, 'value', 'payload/value',
       'should be less then or equal to 99.0'
FROM t WHERE kind = 'click' AND value IS NOT NULL AND value > 99.0
UNION ALL
SELECT event_id, 'value', 'payload/value',
       'should be greater then or equal to 1.0'
FROM t WHERE kind = 'purchase' AND value IS NOT NULL AND value < 1.0
UNION ALL
SELECT event_id, 'payload', 'payload',
       'no :multi branch matches dispatch :kind="' || kind
         || '"; expected one of ["click", "purchase"]'
FROM t WHERE kind IS NOT NULL AND kind NOT IN ('click', 'purchase')
"""

_ORACLES["ref_customer"] = """
SELECT c_custkey, 'street' AS key, 'addr/street' AS err_path,
       'should have the minimum length of 5' AS message
FROM customer WHERE c_mktsegment IS NOT NULL AND length(c_mktsegment) < 5
UNION ALL
SELECT c_custkey, 'nk', 'addr/nk', 'should be less then or equal to 20'
FROM customer WHERE c_nationkey IS NOT NULL AND c_nationkey > 20
"""

_ORACLES["meta_override_customer"] = r"""
SELECT c_custkey, 'c_name' AS key, 'c_name' AS err_path,
       'should match the ~r/^Customer#00000\d{4}$/ pattern' AS message
FROM customer
WHERE c_name IS NOT NULL
  AND NOT regexp_matches(c_name, '^Customer#00000\d{4}$')
UNION ALL
SELECT c_custkey, 'c_mktsegment', 'c_mktsegment', 'must be BUILDING'
FROM customer
WHERE c_mktsegment IS NOT NULL AND c_mktsegment <> 'BUILDING'
"""

_ORACLES["enum_opts_events"] = """
SELECT event_id, 'event_type' AS key, 'event_type' AS err_path,
       'unknown event type' AS message
FROM events
WHERE event_type IS NOT NULL
  AND event_type NOT IN ('click', 'view', 'purchase', 'signup')
UNION ALL
SELECT event_id, 'event_type', 'event_type', 'unknown event type'
FROM events WHERE event_type IS NOT NULL AND length(event_type) < 4
"""

_ORACLES["nested_defaults_customer"] = """
SELECT c_custkey,
       CASE WHEN c_custkey % 7 = 0 THEN 'basic'
            WHEN c_custkey % 3 = 0 THEN 'basic'
            ELSE c_mktsegment END AS tier
FROM customer
"""

_ORACLES["transform_colfn_orders"] = """
SELECT o_orderkey,
       o_orderpriority || '@' || o_orderstatus AS o_orderpriority
FROM orders
"""

_ORACLES["transform_root_orders"] = """
SELECT o_orderkey,
       o_orderstatus || '#' || substr(o_orderpriority, 1, 1) AS o_orderstatus
FROM orders
"""

_ORACLES["type_strictness_orders"] = """
SELECT o_orderkey, 'o_custkey' AS key, 'o_custkey' AS err_path,
       'expected type of :float received ' || CAST(o_custkey AS STRING)
       || ' value' AS message
FROM orders WHERE o_custkey IS NOT NULL
UNION ALL
SELECT o_orderkey, 'o_orderstatus', 'o_orderstatus',
       'expected type of :integer received "' || o_orderstatus || '" value'
FROM orders WHERE o_orderstatus IS NOT NULL
"""

_ORACLES["duration_strings_events"] = r"""
WITH t AS (
  SELECT event_id,
    CASE WHEN event_id % 60 = 0 THEN 'P'
         WHEN event_id % 60 = 1 THEN 'P1YT'
         WHEN event_id % 60 = 2 THEN 'P5S'
         WHEN event_id % 60 = 3 THEN 'PT4.650S'
         WHEN event_id % 60 = 4 THEN '-PT10H-30M'
         WHEN event_id % 60 = 5 THEN 'P3Y-2MT3H'
         WHEN event_id % 60 = 6 THEN 'PT3H5Y'
         WHEN event_id % 60 = 7 THEN 'P2W'
         ELSE 'PT' || CAST(event_id % 24 AS STRING) || 'H' END AS d
  FROM events)
SELECT event_id, 'd' AS key, 'd' AS err_path,
       'expected type of :duration received "' || d || '" value' AS message
FROM t
WHERE d IS NOT NULL AND NOT (
  regexp_matches(d, '^[+-]?P(-?\d+Y)?(-?\d+M)?(-?\d+W)?(-?\d+D)?(T(-?\d+H)?(-?\d+M)?(-?\d+([.,]\d+)?S)?)?$')
  AND NOT regexp_matches(d, '^[+-]?P$')
  AND NOT regexp_matches(d, 'T$'))
"""

_ORACLES["time_strings_events"] = r"""
WITH t AS (
  SELECT event_id,
         CASE WHEN event_id % 50 = 7 THEN '99:99:99'
              WHEN event_id % 50 = 8
                THEN substr(CAST(ts AS STRING), 12, 8) || 'x'
              WHEN event_id % 50 = 9 THEN '7:00:00'
              ELSE substr(CAST(ts AS STRING), 12, 8) END AS tv
  FROM events)
SELECT event_id, 't' AS key, 't' AS err_path,
       'expected type of :time received "' || tv || '" value' AS message
FROM t
WHERE tv IS NOT NULL
  AND NOT regexp_matches(tv, '^([01]\d|2[0-3]):[0-5]\d:[0-5]\d(\.\d+)?$')
"""

_ORACLES["verdicts_events"] = """
WITH per AS (
  SELECT event_type,
    (CASE WHEN event_id IS NULL THEN 1 ELSE 0 END)
    + (CASE WHEN ts IS NULL THEN 1 ELSE 0 END)
    + (CASE WHEN event_type IS NOT NULL AND event_type NOT IN
        ('click', 'view', 'purchase', 'signup') THEN 1 ELSE 0 END)
    + (CASE WHEN value IS NOT NULL AND (value < 0.0 OR value > 100.0)
        THEN 1 ELSE 0 END)
    + (CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS nv
  FROM events)
SELECT event_type,
       count(*) AS n_rows,
       CAST(sum(CASE WHEN nv > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_rows,
       CAST(sum(nv) AS BIGINT) AS n_violations,
       round(sum(CASE WHEN nv > 0 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
         AS bad_ratio,
       sum(CASE WHEN nv > 0 THEN 1 ELSE 0 END) <= 0 AS passed
FROM per GROUP BY event_type
"""

_ORACLES["fidelity_documents"] = """
WITH l AS (SELECT doc_id, sha256(text) AS sha_actual FROM documents),
r AS (SELECT doc_id,
             sha256(CASE WHEN doc_id % 97 = 3 THEN text || 'X'
                         ELSE text END) AS sha_ref
      FROM documents)
SELECT l.doc_id, sha_actual, sha_ref
FROM l JOIN r USING (doc_id)
WHERE sha_ref IS NULL OR sha_actual <> sha_ref
"""


_ORACLES["error_callable_customer"] = """
SELECT c_custkey, 'c_acctbal' AS key, 'c_acctbal' AS err_path,
       'SHOULD BE GREATER THEN OR EQUAL TO 0.0 [acct]' AS message
FROM customer
WHERE c_acctbal IS NOT NULL AND c_acctbal < 0.0
"""

_ORACLES["grapheme_min_documents"] = """
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN substr(text, 1, 4) || 'e' || chr(769)
              ELSE substr(text, 1, 6) END AS t2
  FROM documents)
SELECT doc_id, 't2' AS key, 't2' AS err_path,
       'should have the minimum length of 6' AS message
FROM d
WHERE t2 IS NOT NULL AND length_grapheme(t2) < 6
"""


def _num_constraints_sql() -> str:
    return po.violations_sql(_NUM_SCHEMA, "lineitem",
                             ["l_orderkey", "l_linenumber"])


def directive_oracles() -> dict[str, str]:
    out = dict(_ORACLES)
    out["num_constraints_lineitem"] = _num_constraints_sql()
    return out


DIRECTIVE_ORACLES = directive_oracles()
