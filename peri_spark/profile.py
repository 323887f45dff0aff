"""Schema inference: profile a DataFrame and suggest a Peri schema.

The reference validates data against a hand-written schema; at corpus
scale the schema usually has to be *discovered* first (a new Iceberg
table lands, nobody wrote the contract). ``profile`` computes the
per-column evidence in one aggregate pass; ``suggest_schema`` turns it
into the same Peri-style DSL dict that :func:`peri_spark.validate`
consumes, closing the loop: profile → schema → validate.

Guarantee (tested): the suggested schema validates the frame it was
inferred from with ZERO violations — every inferred bound is inclusive
of the observed data (required only when no NULL was seen, enum only
over the full observed value set, numeric gte/lte at the observed
min/max, string min/max at the observed length extremes).

Scale: the profile is ONE hash aggregate over the pruned columns
(count/sum/min/max/count_distinct — Catalyst partial+final, map-side
combined; exactly the column_stats shape, `constraints/stats.py:18`)
producing one driver row per column; enum candidate values add one
``collect_set`` over only the columns whose distinct count already
measured ≤ threshold, each set bounded by that threshold.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["profile", "suggest_schema"]

_BASE_TYPE = {
    T.StringType: "string",
    T.BooleanType: "boolean",
    T.DateType: "date",
    T.TimestampType: "datetime",
    T.TimestampNTZType: "naive_datetime",
    T.FloatType: "float",
    T.DoubleType: "float",
}
_INT_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def _base_type(dt: T.DataType) -> str:
    if isinstance(dt, _INT_TYPES):
        return "integer"
    if isinstance(dt, T.DecimalType):
        return "float"
    for cls, name in _BASE_TYPE.items():
        if isinstance(dt, cls):
            return name
    return "any"


def profile(df: DataFrame, columns: list[str] | None = None,
            enum_threshold: int = 20) -> DataFrame:
    """Per-column schema evidence, one row per column:

    ``(column, base_type, n_rows, n_null, required, n_distinct,
    is_enum_candidate, min_len, max_len, min_value, max_value)``

    ``required`` = no NULL observed; ``is_enum_candidate`` = string
    column whose EXACT distinct count is ≤ ``enum_threshold``;
    min/max_len are string lengths (NULL for other types); min/max
    values are rendered as strings for a stable cross-type schema.
    Atomic (groupable) column types only — nested columns profile via
    their exploded projections.
    """
    cols = columns or df.columns
    by_name = {f.name: f.dataType for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        dt = by_name[c]
        aggs.append(F.sum(F.col(c).isNull().cast("long"))
                    .alias(f"{c}__nulls"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"{c}__distinct"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"{c}__min"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"{c}__max"))
        if isinstance(dt, T.StringType):
            aggs.append(F.min(F.length(F.col(c))).alias(f"{c}__minlen"))
            aggs.append(F.max(F.length(F.col(c))).alias(f"{c}__maxlen"))
        else:
            aggs.append(F.lit(None).cast("int").alias(f"{c}__minlen"))
            aggs.append(F.lit(None).cast("int").alias(f"{c}__maxlen"))
    wide = df.agg(*aggs)
    stack_args = []
    for c in cols:
        is_str = isinstance(by_name[c], T.StringType)
        stack_args += [f"'{c}'", f"'{_base_type(by_name[c])}'",
                       f"`{c}__nulls`", f"`{c}__distinct`",
                       f"`{c}__min`", f"`{c}__max`",
                       f"`{c}__minlen`", f"`{c}__maxlen`",
                       "true" if is_str else "false"]
    expr = (f"stack({len(cols)}, " + ", ".join(stack_args)
            + ") as (column, base_type, n_null, n_distinct, min_value,"
              " max_value, min_len, max_len, __is_str)")
    return (wide.select(F.col("__n").alias("n_rows"), F.expr(expr))
            .select("column", "base_type", "n_rows", "n_null",
                    (F.col("n_null") == 0).alias("required"),
                    "n_distinct",
                    (F.col("__is_str")
                     & (F.col("n_distinct") <= enum_threshold))
                    .alias("is_enum_candidate"),
                    "min_len", "max_len", "min_value", "max_value"))


def suggest_schema(df: DataFrame, columns: list[str] | None = None,
                   enum_threshold: int = 20,
                   string_bounds: bool = True) -> dict[str, Any]:
    """Infer a Peri-style schema dict from observed data.

    * no NULLs observed → ``("required", t)``
    * string with ≤ ``enum_threshold`` distinct values → ``("enum",
      sorted(values))``
    * other strings → length bounds ``[("min", lo), ("max", hi)]``
      (observed extremes; disable with ``string_bounds=False``)
    * integer/float → ``[("gte", lo), ("lte", hi)]`` observed range
    * everything else → the bare base type

    The result is data-derived, so it validates the profiled frame with
    zero violations; tighten it by hand before enforcing on new data
    (observed bounds are a floor for the real contract, not the
    contract itself).
    """
    cols = columns or df.columns
    by_name = {f.name: f.dataType for f in df.schema.fields}
    rows = {r["column"]: r
            for r in profile(df, cols, enum_threshold).collect()}
    enum_cols = [c for c in cols if rows[c]["is_enum_candidate"]
                 and rows[c]["n_distinct"] > 0]
    enum_values: dict[str, list] = {}
    if enum_cols:
        sets = df.agg(*[F.collect_set(F.col(c)).alias(c)
                        for c in enum_cols]).collect()[0]
        enum_values = {c: sorted(sets[c]) for c in enum_cols}

    schema: dict[str, Any] = {}
    for c in cols:
        r = rows[c]
        base = r["base_type"]
        t: Any = base
        if c in enum_values:
            t = ("enum", enum_values[c])
        elif base == "string" and string_bounds and r["min_len"] is not None:
            t = ("string", [("min", int(r["min_len"])),
                            ("max", int(r["max_len"]))])
        elif base == "integer" and r["min_value"] is not None:
            t = ("integer", [("gte", int(r["min_value"])),
                             ("lte", int(r["max_value"]))])
        elif base == "float" and r["min_value"] is not None:
            t = ("float", [("gte", float(r["min_value"])),
                           ("lte", float(r["max_value"]))])
        schema[c] = ("required", t) if r["required"] and r["n_rows"] > 0 \
            else t
    return schema
