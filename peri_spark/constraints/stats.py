"""Per-column statistics stage.

One single-pass hash aggregate (Catalyst partial+final, map-side combined)
computes every column's stats at once — at 100 TB this is one scan, no
shuffle beyond the final 1-row reduce. Output is unpivoted to one row per
column so thresholds can be validated relationally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["column_stats", "column_quantiles", "top_values",
           "value_distribution_stats", "stats_violations"]


def column_stats(df: DataFrame, columns: list[str] | None = None,
                 exact_distinct: bool = False) -> DataFrame:
    """Stats per column: rows, nulls, null_rate, min/max (as strings),
    avg string length, and (approx by default) distinct count.

    ``exact_distinct=True`` is a second shuffle per column — only for
    small frames / oracle tests; at scale use the HLL approximation.
    """
    cols = columns or df.columns
    by_name = {f.name: f.dataType for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        dt = by_name[c]
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"{c}__min"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"{c}__max"))
        if isinstance(dt, T.StringType):
            aggs.append(F.avg(F.length(F.col(c))).alias(f"{c}__avg_len"))
        elif isinstance(dt, T.NumericType):
            aggs.append(F.avg(F.col(c)).alias(f"{c}__avg_len"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"{c}__avg_len"))
        if exact_distinct:
            aggs.append(F.count_distinct(F.col(c)).alias(f"{c}__distinct"))
        else:
            aggs.append(F.approx_count_distinct(F.col(c)).alias(f"{c}__distinct"))
    wide = df.agg(*aggs)
    # unpivot via stack — stays on the single aggregated row (driver-cheap)
    n = len(cols)
    stack_args = []
    for c in cols:
        stack_args.append(f"'{c}'")
        stack_args.append(f"`{c}__nulls`")
        stack_args.append(f"`{c}__min`")
        stack_args.append(f"`{c}__max`")
        stack_args.append(f"`{c}__avg_len`")
        stack_args.append(f"`{c}__distinct`")
    expr = (f"stack({n}, " + ", ".join(stack_args)
            + ") as (column, n_null, min_value, max_value, avg_len, n_distinct)")
    return (wide.select(F.col("__n").alias("n_rows"), F.expr(expr))
            .select("column", "n_rows", "n_null",
                    (F.col("n_null") / F.col("n_rows")).alias("null_rate"),
                    "min_value", "max_value", "avg_len", "n_distinct"))


def column_quantiles(df: DataFrame, columns: list[str],
                     probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
                     *, exact: bool = False,
                     accuracy: int = 10_000) -> DataFrame:
    """Per-column quantiles in ONE aggregate pass, unpivoted to
    ``(column, p, value)`` so thresholds validate relationally.

    Default is ``approx_percentile`` — a mergeable sketch (map-side
    partials, one scan, no sort), the 100 TB path; ``accuracy`` trades
    memory for error (1/accuracy relative rank error).  ``exact=True``
    uses ``percentile``: per-group sort state, only for modest groups /
    oracle tests — its ``(n-1)*p`` linear interpolation is
    bit-identical to DuckDB's ``quantile_cont`` (verified), which is
    what makes the stage oracle-checkable.

    NULLs are ignored per column (both engines); an all-NULL column
    yields NULL values.
    """
    if not columns:
        raise ValueError("columns must be non-empty")
    if not probs:
        raise ValueError("probs must be non-empty")
    bad = [p for p in probs if not 0.0 <= p <= 1.0]
    if bad:
        raise ValueError(f"probs must be in [0, 1], got {bad}")
    by_name = {f.name: f.dataType for f in df.schema.fields}
    for c in columns:
        if not isinstance(by_name.get(c), T.NumericType):
            raise ValueError(f"column {c!r} is not numeric "
                             f"({by_name.get(c)})")
    plist = list(probs)
    if exact:
        aggs = [F.percentile(F.col(c), F.lit(plist)).alias(c)
                for c in columns]
    else:
        aggs = [F.percentile_approx(F.col(c), plist, accuracy).alias(c)
                for c in columns]
    wide = df.agg(*aggs)
    # unpivot stays on the single aggregated row (driver-cheap)
    cells = [F.struct(F.lit(c).alias("column"),
                      F.lit(p).alias("p"),
                      F.col(c)[i].cast("double").alias("value"))
             for c in columns for i, p in enumerate(plist)]
    return (wide.select(F.explode(F.array(*cells)).alias("q"))
            .select("q.column", "q.p", "q.value"))


def top_values(df: DataFrame, columns: list[str], k: int = 10,
               include_nulls: bool = False) -> DataFrame:
    """Exact per-column top-``k`` most frequent values (heavy hitters),
    unpivoted to ``(column, value, n, rank)``.

    All columns share ONE scan: each row explodes to (column, value)
    pairs (values cast to string), one partial-aggregated
    ``groupBy(column, value).count()`` shuffles only per-partition
    distinct (column, value) pairs (map-side combine collapses the
    heavy hitters before the exchange — the skewed case is exactly the
    cheap case), and the rank window runs on the already-aggregated
    frame whose partition key has |columns| groups. Ties break by value
    ascending, so output is deterministic and engine-portable.

    Exact by design: the shuffle is bounded by the distinct-value
    count, not the row count. A column whose distinct count approaches
    the row count (ids, digests) is not a heavy-hitter question — track
    it with column_stats' HLL distinct instead of forcing it through
    here.
    """
    if not columns:
        raise ValueError("columns must be non-empty")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    pairs = df.select(F.explode(F.array(*[
        F.struct(F.lit(c).alias("column"),
                 F.col(c).cast("string").alias("value"))
        for c in columns])).alias("p")).select("p.column", "p.value")
    if not include_nulls:
        pairs = pairs.where(F.col("value").isNotNull())
    counts = pairs.groupBy("column", "value").agg(
        F.count(F.lit(1)).alias("n"))
    from pyspark.sql import Window
    w = Window.partitionBy("column").orderBy(F.col("n").desc(), "value")
    return (counts.select("column", "value", "n",
                          F.row_number().over(w).alias("rank"))
            .where(F.col("rank") <= k))


def value_distribution_stats(df: DataFrame,
                             columns: list[str]) -> DataFrame:
    """Distribution-shape metrics per column, unpivoted to
    ``(column, n_values, n_distinct, entropy, distinctness, uniqueness,
    unique_value_ratio)`` — Deequ's Entropy / Distinctness / Uniqueness
    / UniqueValueRatio analyzers re-expressed as two bounded shuffles:

    - ``entropy``: Shannon entropy (natural log) of the value
      distribution, ``ln(n) - sum(c*ln(c))/n`` — computed from exact
      counts so it is engine-portable to the SQL oracle.
    - ``distinctness``: n_distinct / n_values.
    - ``uniqueness``: fraction of ROWS whose value appears exactly once.
    - ``unique_value_ratio``: fraction of VALUES appearing exactly once.

    All columns share ONE scan (the same stacked explode as
    ``top_values``); the first shuffle carries map-side-combined
    (column, value) counts — bounded by distinct values, the skewed
    case is the cheap case — and the second reduces |columns| groups.
    NULLs are excluded (column_stats owns null accounting). Like
    ``top_values``, id-like columns whose distinct count approaches the
    row count belong in column_stats' HLL path, not here.
    """
    if not columns:
        raise ValueError("columns must be non-empty")
    pairs = df.select(F.explode(F.array(*[
        F.struct(F.lit(c).alias("column"),
                 F.col(c).cast("string").alias("value"))
        for c in columns])).alias("p")).select("p.column", "p.value")
    counts = (pairs.where(F.col("value").isNotNull())
              .groupBy("column", "value")
              .agg(F.count(F.lit(1)).alias("c")))
    c = F.col("c")
    agg = counts.groupBy("column").agg(
        F.sum(c).alias("n_values"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(c * F.log(c)).alias("__clnc"),
        F.sum(F.when(c == 1, 1).otherwise(0)).alias("__singles"))
    # a fully-NULL column has no (column, value) pairs at all — it must
    # still get a row (n_values=0, NULL metrics), not silently vanish:
    # the degenerate column is the most interesting distribution signal
    spark = df.sparkSession
    all_cols = spark.createDataFrame([(c,) for c in columns],
                                     "column string")
    # agg's OUTPUT is ≤ |columns| rows — broadcast it so the literal
    # frame join never adds a hash exchange on top of the two real ones
    full = all_cols.join(F.broadcast(agg), "column", "left")
    n = F.coalesce(F.col("n_values"), F.lit(0))
    present = n > 0
    return full.select(
        "column", n.alias("n_values"),
        F.coalesce(F.col("n_distinct"), F.lit(0)).alias("n_distinct"),
        F.when(present, F.log(n) - F.col("__clnc") / n).alias("entropy"),
        F.when(present, F.col("n_distinct") / n).alias("distinctness"),
        F.when(present, F.col("__singles") / n).alias("uniqueness"),
        F.when(present, F.col("__singles") / F.col("n_distinct"))
        .alias("unique_value_ratio"))


def stats_violations(stats: DataFrame, thresholds: dict[str, dict]) -> DataFrame:
    """Validate stats rows against per-column thresholds, emitting
    Peri-shaped violations, e.g. ``{"content": {"max_null_rate": 0.01}}``.
    """
    checks = []
    for col, th in thresholds.items():
        if "max_null_rate" in th:
            m = th["max_null_rate"]
            checks.append(
                F.when((F.col("column") == col) & (F.col("null_rate") > m),
                       F.struct(
                           F.array(F.lit(col)).alias("path"),
                           F.lit(col).alias("key"),
                           F.concat(F.lit(f"null rate should be at most {m}, got "),
                                    F.round("null_rate", 6).cast("string")).alias("message"),
                           F.to_json(F.struct(
                               F.round("null_rate", 6).cast("string").alias("actual"),
                               F.lit(str(m)).alias("max"))).alias("content"))))
        if "min_distinct" in th:
            m = th["min_distinct"]
            checks.append(
                F.when((F.col("column") == col) & (F.col("n_distinct") < m),
                       F.struct(
                           F.array(F.lit(col)).alias("path"),
                           F.lit(col).alias("key"),
                           F.concat(F.lit(f"distinct count should be at least {m}, got "),
                                    F.col("n_distinct").cast("string")).alias("message"),
                           F.to_json(F.struct(
                               F.col("n_distinct").cast("string").alias("actual"),
                               F.lit(str(m)).alias("min"))).alias("content"))))
    if not checks:
        raise ValueError("no thresholds given")
    return (stats
            .select(F.explode(F.array_compact(F.array(*checks))).alias("v"))
            .select("v.path", "v.key", "v.message", "v.content"))
