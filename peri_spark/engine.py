"""Validation engine: ``validate(df, schema)`` → (valid, invalid, violations).

Execution model (Spark-first):
- ONE projection pass computes every field's rewritten value plus a single
  ``_violations`` array column (all constraints for all fields). The plan is
  a pure map stage — no shuffle, fully inside WholeStageCodegen; Catalyst
  prunes the scan to schema-referenced columns automatically.
- ``valid`` / ``invalid`` / ``violations`` are lazy views over the annotated
  frame; consuming more than one triggers at most one extra scan (callers at
  scale should ``.persist()`` the annotated frame — see ``ValidationSuite``).

Reference lifecycle parity (zoedsoupe/peri):
- mode check + strict-mode projection: lib/peri.ex:572-604, 630-664
- per-field traverse accumulating errors: lib/peri.ex:686-707
- unlike the reference (which re-validates the schema on every defschema
  call, lib/peri.ex:360-362) we compile once and reuse the plan.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import dsl
from .compiler import AVIOL_DDL, compile_fields, compile_node, Ctx, empty_viols
from .dsl import Node, parse
from .errors import InvalidSchemaError

__all__ = ["validate", "conforms", "validate_column", "ValidationResult",
           "VIOLATIONS_COLUMN", "VIOLATIONS_COUNT_COLUMN"]

VIOLATIONS_COLUMN = "_violations"
# lean mode only: the pure-integer violation count twin (round-6). A
# counting consumer that reads THIS column instead of size(_violations)
# lets Catalyst prune the struct-array column out of the plan entirely.
VIOLATIONS_COUNT_COLUMN = "_violations_count"


@dataclass
class ValidationResult:
    """Lazy views over one annotated DataFrame."""

    annotated: DataFrame         # output columns + _violations array
    source: DataFrame            # the input frame (original columns)

    @property
    def valid(self) -> DataFrame:
        return (self.annotated
                .where(F.size(F.col(VIOLATIONS_COLUMN)) == 0)
                .drop(VIOLATIONS_COLUMN))

    @property
    def invalid(self) -> DataFrame:
        return self.annotated.where(F.size(F.col(VIOLATIONS_COLUMN)) > 0)

    def violations(self, *id_cols: str) -> DataFrame:
        """Exploded Peri-shaped violation rows: id cols + path/key/message/
        content. Violation columns clashing with an id column are renamed
        ``err_<name>`` (e.g. a ``path`` id column)."""
        v = self.invalid.select(
            *id_cols, F.explode(F.col(VIOLATIONS_COLUMN)).alias("v"))

        def out(name: str) -> str:
            return f"err_{name}" if name in id_cols else name

        return v.select(
            *id_cols,
            *[F.col(f"v.{n}").alias(out(n))
              for n in ("path", "key", "message", "content")])

    def conforms(self) -> bool:
        """Whole-frame boolean (Peri.conforms?/2, lib/peri.ex:443-450)."""
        return self.invalid.isEmpty()

    def sample_violations(self, k: int, *id_cols: str,
                          seed: int = 42) -> DataFrame:
        """``k`` deterministic exemplar rows per violation CLASS
        (path, key), each annotated with ``class_count`` and ``rank`` —
        the triage view: at 10^12 files nobody pages through the full
        violation set; you read k examples of each failure mode next to
        how often it fires.

        Selection is a pure function of (id values, seed) via the
        portable md5 coin (`functions/curation.py:_coin`), so re-runs,
        cluster layouts, and the DuckDB oracle pick identical rows.

        Plan shape: one hash exchange on the class key over the
        already-exploded violations; the rank and count windows share
        that exchange. Class cardinality is the schema's (field,
        check) count — tiny — so per-class sort buffers see only that
        class's violations.
        """
        if k <= 0:
            raise ValueError(f"k must be positive, got {k}")
        if not id_cols:
            raise ValueError(
                "sample_violations needs id columns for deterministic "
                "selection")
        from pyspark.sql import Window

        from .functions.curation import _coin
        v = self.violations(*id_cols)
        pname = "err_path" if "path" in id_cols else "path"
        kname = "err_key" if "key" in id_cols else "key"
        cls = F.concat_ws("|", F.array_join(F.col(pname), "."),
                          F.col(kname))
        coin = _coin(F.concat_ws(
            "\x1f", *[F.col(c).cast("string") for c in id_cols]), seed)
        w = Window.partitionBy("__cls").orderBy(F.col("__coin"), *id_cols)
        wc = Window.partitionBy("__cls")
        return (v.withColumn("__cls", cls).withColumn("__coin", coin)
                .withColumn("rank", F.row_number().over(w))
                .withColumn("class_count",
                            F.count(F.lit(1)).over(wc).cast("long"))
                .where(F.col("rank") <= k)
                .drop("__cls", "__coin"))

    def persist(self, *a, **kw) -> "ValidationResult":
        self.annotated = self.annotated.persist(*a, **kw)
        return self

    def errors(self, *id_cols: str) -> list[dict]:
        """Collect violations as Python dicts (small results only)."""
        return [r.asDict(recursive=True)
                for r in self.violations(*id_cols).collect()]

    def map_errors(self, fn, *id_cols: str) -> DataFrame:
        """Vectorized ``traverse_errors``: the violations frame with each
        message rewritten by ``fn(ErrorRef) -> Column | str`` (i18n hook);
        key/path/message/content arrive as Columns. Stays JVM-side when
        fn builds Column expressions."""
        from .compiler import ErrorRef

        v = self.violations(*id_cols)
        path_col = "err_path" if "err_path" in v.columns else "path"
        msg_col = "err_message" if "err_message" in v.columns else "message"
        content_col = "err_content" if "err_content" in v.columns else "content"
        key_col = "err_key" if "err_key" in v.columns else "key"
        res = fn(ErrorRef(key=F.col(key_col), path=F.col(path_col),
                          message=F.col(msg_col), content=F.col(content_col)))
        if isinstance(res, str):
            res = F.lit(res)
        return v.withColumn(msg_col, res.cast("string"))


def validate(df: DataFrame, schema, mode: str = "strict",
             lean: bool = False,
             length_mode: str = "chars") -> ValidationResult:
    """Validate a DataFrame against a Peri-style schema.

    - ``strict``  → output contains only schema-declared columns
      (reference: lib/peri.ex:630-664)
    - ``permissive`` → all input columns pass through, declared ones rewritten
      (reference: lib/peri.ex:635-636)
    - ``lean`` → violation structs carry key only (constant message/
      content): ~10× smaller plan for counting-only consumers
    - ``length_mode="grapheme"`` → string min/max count grapheme clusters
      (Elixir String.length parity, Arrow UDF) instead of JVM chars
    """
    if mode not in ("strict", "permissive"):
        # reference raises ArgumentError (lib/peri.ex:575-579)
        raise ValueError(
            f"Invalid mode: {mode!r}. Must be 'strict' or 'permissive'")
    if length_mode not in ("chars", "grapheme"):
        raise ValueError(f"Invalid length_mode: {length_mode!r}")
    node = parse(schema) if not isinstance(schema, Node) else schema
    if node.tag == "nested":
        entries = node.args[0]
        outs = compile_fields(entries, df.schema, mode, lean=lean,
                              grapheme=length_mode == "grapheme")
        viols = _concat_viols([o.viols for o in outs])
        declared = {o.name for o in outs}
        cols: list[Column] = []
        if mode == "permissive":
            rewritten = {o.name: o.value for o in outs if o.value is not None}
            for name in df.columns:
                cols.append(rewritten.get(name, F.col(name)))
                if name in rewritten:
                    cols[-1] = cols[-1].alias(name)
            for o in outs:  # declared-but-absent fields with defaults
                if o.name not in df.columns and o.value is not None:
                    cols.append(o.value.alias(o.name))
        else:
            for o in outs:
                if o.value is not None:
                    cols.append(o.value.alias(o.name))
        sel = [*cols, viols.alias(VIOLATIONS_COLUMN)]
        if lean:
            from .compiler import count_of
            sel.append(count_of(viols).alias(VIOLATIONS_COUNT_COLUMN))
        annotated = df.select(*sel)
        return ValidationResult(annotated, df)
    # bare directive: validate the whole row as one value (struct)
    ctx = Ctx(root=lambda n: F.col(n), key="", path=())
    struct_t = df.schema
    c = compile_node(node, F.struct(*[F.col(f.name) for f in struct_t.fields]),
                     struct_t, ctx, mode)
    annotated = df.select("*", c.viols.alias(VIOLATIONS_COLUMN))
    return ValidationResult(annotated, df)


def validate_column(df: DataFrame, column: str, schema,
                    key: str | None = None) -> ValidationResult:
    """Validate a single column against a bare type directive."""
    node = parse(schema)
    fld = df.schema[column]
    ctx = Ctx(root=lambda n: F.col(n), key=key or column, path=(key or column,))
    c = compile_node(node, F.col(column), fld.dataType, ctx)
    annotated = df.withColumn(VIOLATIONS_COLUMN, c.viols)
    return ValidationResult(annotated, df)


def conforms(df: DataFrame, schema, mode: str = "strict") -> bool:
    return validate(df, schema, mode).conforms()


def _concat_viols(cols: list[Column]) -> Column:
    from .compiler import attach_count, count_of
    if not cols:
        return attach_count(empty_viols(), F.lit(0))
    if len(cols) == 1:
        return cols[0]
    total = count_of(cols[0])
    for c in cols[1:]:
        total = total + count_of(c)
    return attach_count(F.concat(*cols), total)
