"""Structured Streaming validation.

The compiled validation plan is a stateless projection, so it applies to a
streaming DataFrame unchanged — ``validate_stream`` is the same compile as
batch. On top of it:

- ``split_stream``: one input stream → (valid, violations) streams for
  dual sinks (``foreachBatch`` or two queries).
- ``violation_rates``: watermarked tumbling-window violation counts for
  late-data-tolerant quality dashboards.
- ``streaming_dedup``: exact-dedup within a watermark via Spark's
  built-in ``dropDuplicatesWithinWatermark`` (state-store backed; prefer
  built-ins over applyInPandasWithState when semantics allow).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .engine import VIOLATIONS_COLUMN, validate

__all__ = ["validate_stream", "split_stream", "violation_rates",
           "streaming_dedup", "session_stats"]


def validate_stream(stream_df: DataFrame, schema, mode: str = "strict"):
    """Identical compile path as batch; returns the ValidationResult whose
    views are streaming DataFrames."""
    return validate(stream_df, schema, mode=mode)


def split_stream(stream_df: DataFrame, schema, mode: str = "strict",
                 id_cols: list[str] | None = None
                 ) -> tuple[DataFrame, DataFrame]:
    """(valid_stream, violations_stream) over one annotated projection."""
    res = validate(stream_df, schema, mode=mode)
    return res.valid, res.violations(*(id_cols or []))


def violation_rates(stream_df: DataFrame, schema, ts_col: str,
                    window: str = "1 minute",
                    watermark: str = "5 minutes",
                    mode: str = "permissive") -> DataFrame:
    """Per-window (n_rows, n_bad_rows, bad_ratio) with late-data watermark.

    Watermark bounds state: windows older than ``watermark`` finalize and
    evict — mandatory for unbounded streams.
    """
    res = validate(stream_df, schema, mode=mode)
    ann = res.annotated.withWatermark(ts_col, watermark)
    nviol = F.size(F.col(VIOLATIONS_COLUMN))
    return (ann.groupBy(F.window(F.col(ts_col), window).alias("win"))
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum((nviol > 0).cast("long")).alias("n_bad_rows"))
            .select(F.col("win.start").alias("window_start"),
                    F.col("win.end").alias("window_end"),
                    "n_rows", "n_bad_rows",
                    (F.col("n_bad_rows") / F.col("n_rows"))
                    .alias("bad_ratio")))


def session_stats(stream_df: DataFrame, key_col: str, ts_col: str,
                  gap: str = "30 minutes", watermark: str = "60 minutes",
                  aggs: list | None = None) -> DataFrame:
    """Watermarked per-key SESSION-window aggregation via Spark's native
    ``session_window`` (state-store backed; one open session per key in
    state, merged as events arrive).

    Semantics (what the state store implements — verified empirically,
    and what an oracle must mirror): an event EXTENDS the session while
    ``delta <= gap`` (touching windows merge; only ``delta > gap``
    splits — the same convention as the batch
    :func:`peri_spark.functions.sessionize`); the window range is
    ``[first, last + gap)``.  In append mode a session emits
    only once the watermark passes its end (``last event + gap``), so a
    drained ``availableNow`` run yields exactly the sessions with
    ``session_end <= max(event time) - watermark delay`` — the batch-
    reproducible contract the entry oracle checks.

    Default agg is an event count; pass ``aggs`` (aliased Columns) for
    more.  Output: (key, session_start, session_end, *agg aliases).
    """
    if aggs is not None and not aggs:
        raise ValueError("aggs must be non-empty (or None for the "
                         "default event count)")
    if aggs is None:
        aggs = [F.count(F.lit(1)).alias("n_events")]
    grouped = (stream_df.withWatermark(ts_col, watermark)
               .groupBy(F.col(key_col),
                        F.session_window(F.col(ts_col), gap).alias("__sw"))
               .agg(*aggs))
    agg_cols = [c for c in grouped.columns if c not in (key_col, "__sw")]
    return grouped.select(
        key_col,
        F.col("__sw.start").alias("session_start"),
        F.col("__sw.end").alias("session_end"), *agg_cols)


def streaming_dedup(stream_df: DataFrame, keys: list[str], ts_col: str,
                    watermark: str = "10 minutes") -> DataFrame:
    """Keep first occurrence per key within the watermark horizon."""
    return (stream_df.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(keys))


def violation_streaks(stream_df: DataFrame, schema, key_col: str,
                      ts_col: str, watermark: str = "10 minutes",
                      mode: str = "permissive") -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-key running
    count of consecutive invalid records — built-ins can't express
    "consecutive", so this is the sanctioned Arrow-batched stateful path.

    Emits (key, streak, total_bad) on every update; state times out with
    the watermark so unbounded key spaces don't leak memory.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    res = validate(stream_df, schema, mode=mode, lean=True)
    ann = (res.annotated
           .select(F.col(key_col).alias("key"), F.col(ts_col).alias("ts"),
                   (F.size(F.col(VIOLATIONS_COLUMN)) > 0).alias("bad"))
           .withWatermark("ts", watermark))

    out_schema = "key long, streak int, total_bad long"
    state_schema = "streak int, total_bad long"

    def update(key, pdfs, state):
        import pandas as pd
        streak, total = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            for b in pdf.sort_values("ts")["bad"]:
                if b:
                    streak += 1
                    total += 1
                else:
                    streak = 0
        state.update((streak, total))
        yield pd.DataFrame({"key": [key[0]], "streak": [streak],
                            "total_bad": [total]})

    return (ann.groupBy("key")
            .applyInPandasWithState(update, out_schema, state_schema,
                                    "update",
                                    GroupStateTimeout.EventTimeTimeout))
