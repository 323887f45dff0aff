"""Temporal operators: sessionize / asof_join / range_join / resample.

Hand-built micro-fixtures with known answers plus the plan-shape
assertions that make these safe at 100 TB: the asof join must be a
single window pass (no BroadcastNestedLoopJoin / CartesianProduct) and
the range join must be an equi (hash) join on the bucket key.
"""
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from peri_spark.functions import asof_join, range_join, resample, sessionize

T0 = datetime(2024, 1, 1, 12, 0, 0)


def ts(sec):
    return T0 + timedelta(seconds=sec)


def test_sessionize_gap_boundaries(spark):
    rows = [("u1", ts(0), 1), ("u1", ts(60), 2),    # gap == 60 stays
            ("u1", ts(121), 3),                      # gap 61 > 60 splits
            ("u1", ts(181), 4),
            ("u2", ts(0), 5)]                        # other key independent
    df = spark.createDataFrame(rows, "k string, t timestamp, id long")
    out = sessionize(df, "k", "t", 60.0, order_cols=("id",))
    got = {r["id"]: r["session_seq"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}


def test_sessionize_equal_ts_tiebreak(spark):
    rows = [("u", ts(0), 2), ("u", ts(0), 1), ("u", ts(120), 3)]
    df = spark.createDataFrame(rows, "k string, t timestamp, id long")
    out = sessionize(df, "k", "t", 60.0, order_cols=("id",))
    got = {r["id"]: r["session_seq"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2}


def _asof_fixture(spark):
    left = spark.createDataFrame(
        [("u", ts(5), 1), ("u", ts(30), 2), ("u", ts(100), 3),
         ("v", ts(50), 4),          # key with no right rows at all
         ("u", ts(10), 5)],         # equal to a right ts -> matches it
        "k string, t timestamp, id long")
    right = spark.createDataFrame(
        [("u", ts(0), 10.0), ("u", ts(10), 20.0), ("u", ts(90), 30.0)],
        "k string, t timestamp, px double")
    return left, right


def test_asof_join_backward_semantics(spark):
    left, right = _asof_fixture(spark)
    out = asof_join(left, right, "k", "t", ["px"],
                    matched_ts_col="mt")
    got = {r["id"]: (r["px"], r["mt"]) for r in out.collect()}
    assert got[1] == (10.0, ts(0))     # only ts(0) precedes ts(5)
    assert got[2] == (20.0, ts(10))    # most recent <= 30
    assert got[3] == (30.0, ts(90))
    assert got[4] == (None, None)      # no right rows for key v
    assert got[5] == (20.0, ts(10))    # equal timestamps match


def test_asof_join_tolerance(spark):
    left, right = _asof_fixture(spark)
    out = asof_join(left, right, "k", "t", ["px"], tolerance_seconds=15.0)
    got = {r["id"]: r["px"] for r in out.collect()}
    # id=2: match age 20s > 15s tolerance -> nulled; id=3: age 10s ok
    assert got == {1: 10.0, 2: None, 3: 30.0, 4: None, 5: 20.0}


def test_asof_join_no_nested_loop(spark):
    left, right = _asof_fixture(spark)
    out = asof_join(left, right, "k", "t", ["px"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan


def test_asof_join_value_col_clash_raises(spark):
    left, right = _asof_fixture(spark)
    with pytest.raises(ValueError, match="clash"):
        asof_join(left, right.withColumnRenamed("px", "id"), "k", "t",
                  ["id"])


def _range_fixture(spark):
    points = spark.createDataFrame(
        [("u", ts(0), 1),     # == interval start (in, half-open)
         ("u", ts(59), 2),    # inside
         ("u", ts(60), 3),    # == end: out for "left", in for "both"
         ("u", ts(600), 4),   # far outside, same bucket count
         ("w", ts(30), 5)],   # wrong key
        "k string, pt timestamp, pid long")
    intervals = spark.createDataFrame(
        [("u", ts(0), ts(60), 100),
         ("u", ts(500), ts(700), 101),  # spans bucket boundary (bucket 60s)
         ("u", ts(800), ts(790), 102)],  # end < start: dropped
        "k string, s timestamp, e timestamp, iid long")
    return points, intervals


def test_range_join_half_open_and_keys(spark):
    points, intervals = _range_fixture(spark)
    out = range_join(points, intervals, point_ts_col="pt", start_col="s",
                     end_col="e", key_col="k", bucket_seconds=60.0)
    pairs = {(r["pid"], r["iid"]) for r in out.collect()}
    assert pairs == {(1, 100), (2, 100), (4, 101)}


def test_range_join_closed_both(spark):
    points, intervals = _range_fixture(spark)
    out = range_join(points, intervals, point_ts_col="pt", start_col="s",
                     end_col="e", key_col="k", bucket_seconds=60.0,
                     closed="both")
    pairs = {(r["pid"], r["iid"]) for r in out.collect()}
    assert pairs == {(1, 100), (2, 100), (3, 100), (4, 101)}


def test_range_join_exactly_once_across_buckets(spark):
    # one point, one interval spanning 4 tiny buckets -> exactly 1 row
    points = spark.createDataFrame([("u", ts(5), 1)],
                                   "k string, pt timestamp, pid long")
    intervals = spark.createDataFrame([("u", ts(0), ts(40), 9)],
                                      "k string, s timestamp, e timestamp, iid long")
    out = range_join(points, intervals, point_ts_col="pt", start_col="s",
                     end_col="e", key_col="k", bucket_seconds=10.0)
    assert out.count() == 1


def test_range_join_is_hash_join(spark):
    points, intervals = _range_fixture(spark)
    out = range_join(points, intervals, point_ts_col="pt", start_col="s",
                     end_col="e", key_col="k", bucket_seconds=60.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_guard_trips_on_huge_interval(spark):
    points = spark.createDataFrame([("u", ts(5), 1)],
                                   "k string, pt timestamp, pid long")
    intervals = spark.createDataFrame(
        [("u", ts(0), ts(0) + timedelta(days=400), 9)],
        "k string, s timestamp, e timestamp, iid long")
    out = range_join(points, intervals, point_ts_col="pt", start_col="s",
                     end_col="e", key_col="k", bucket_seconds=60.0,
                     max_buckets_per_interval=1000)
    with pytest.raises(Exception, match="spans more than"):
        out.collect()


def test_resample_counts_and_fill(spark):
    rows = [("a", ts(0), 1.0), ("a", ts(30), 2.0),   # bucket B
            ("a", ts(150), 4.0),                      # bucket B+2 (gap at B+1)
            ("b", ts(10), 8.0)]
    df = spark.createDataFrame(rows, "k string, t timestamp, v double")
    out = resample(df, "k", "t", 60.0,
                   [F.count("*").alias("n"), F.sum("v").alias("sv")],
                   fill=True)
    got = {(r["k"], r["bucket"]): (r["n"], r["sv"]) for r in out.collect()}
    base = next(b for (k, b) in got if k == "a")
    b0 = min(b for (k, b) in got if k == "a")
    assert got[("a", b0)] == (2, 3.0)
    assert got[("a", b0 + 1)] == (None, None)   # filled gap row
    assert got[("a", b0 + 2)] == (1, 4.0)
    assert len([1 for (k, _) in got if k == "b"]) == 1
    assert base is not None


def test_resample_bucket_ts_col(spark):
    df = spark.createDataFrame([("a", ts(0), 1.0)],
                               "k string, t timestamp, v double")
    out = resample(df, "k", "t", 60.0, [F.count("*").alias("n")],
                   bucket_ts_col="bt").collect()[0]
    assert out["bt"] == ts(0)  # T0 is on a minute boundary
    assert out["n"] == 1


def test_asof_join_null_ts_right_row_never_matches(spark):
    """A NULL-ts right row sorts FIRST in the window; its struct
    payload must not be carried onto left rows (ASOF semantics: it can
    never match)."""
    left = spark.createDataFrame([("u", ts(10), 1)],
                                 "k string, t timestamp, id long")
    right = spark.createDataFrame([("u", None, 5.0)],
                                  "k string, t timestamp, px double")
    out = asof_join(left, right, "k", "t", ["px"]).collect()
    assert out[0]["px"] is None


def test_asof_join_null_keys_never_match(spark):
    """NULL = NULL never matches in join semantics (window PARTITION BY
    would group them); NULL-key left rows are preserved unmatched."""
    left = spark.createDataFrame([(None, ts(100), 1)],
                                 "k string, t timestamp, id long")
    right = spark.createDataFrame([(None, ts(50), 9.0)],
                                  "k string, t timestamp, px double")
    out = asof_join(left, right, "k", "t", ["px"]).collect()
    assert len(out) == 1 and out[0]["px"] is None


def test_asof_join_zero_tolerance_is_equal_ts_only(spark):
    left, right = _asof_fixture(spark)
    out = asof_join(left, right, "k", "t", ["px"], tolerance_seconds=0.0)
    got = {r["id"]: r["px"] for r in out.collect()}
    # only id=5 sits exactly on a right timestamp
    assert got == {1: None, 2: None, 3: None, 4: None, 5: 20.0}
    with pytest.raises(ValueError, match=">= 0"):
        asof_join(left, right, "k", "t", ["px"], tolerance_seconds=-1.0)


def test_resample_fill_spine_guard(spark):
    rows = [("a", ts(0), 1.0), ("a", ts(10_000_000), 2.0)]
    df = spark.createDataFrame(rows, "k string, t timestamp, v double")
    out = resample(df, "k", "t", 1.0, [F.count("*").alias("n")],
                   fill=True, max_fill_buckets=1000)
    with pytest.raises(Exception, match="fill spine exceeds"):
        out.collect()


def test_ntz_timestamps_all_ops(spark):
    """Parquet timestamps decode as TIMESTAMP_NTZ — every operator must
    accept them, and the bucket/epoch math must be session-tz-free."""
    df = spark.createDataFrame(
        [("a", ts(0), 1), ("a", ts(3000), 2)],
        "k string, t timestamp, id long") \
        .withColumn("t", F.col("t").cast("timestamp_ntz"))
    out = sessionize(df, "k", "t", 60.0, order_cols=("id",))
    got = {r["id"]: r["session_seq"] for r in out.collect()}
    assert got == {1: 1, 2: 2}

    res = resample(df, "k", "t", 60.0, [F.count("*").alias("n")],
                   bucket_ts_col="bt")
    rows = {r["bt"]: r["n"] for r in res.collect()}
    assert rows == {ts(0): 1, ts(3000): 1}
    assert dict(res.dtypes)["bt"] == "timestamp_ntz"

    right = df.select("k", "t", (F.col("id") * 10.0).alias("px"))
    aj = asof_join(df, right, "k", "t", ["px"], tolerance_seconds=1.0)
    got = {r["id"]: r["px"] for r in aj.collect()}
    assert got == {1: 10.0, 2: 20.0}   # equal-ts self matches

    iv = df.select("k", F.col("t").alias("s"),
                   (F.col("t") + F.expr("INTERVAL 30 SECONDS")).alias("e"),
                   F.col("id").alias("iid"))
    rj = range_join(df.select("k", F.col("t").alias("pt"), "id"), iv,
                    point_ts_col="pt", start_col="s", end_col="e",
                    key_col="k", bucket_seconds=60.0)
    assert {(r["id"], r["iid"]) for r in rj.collect()} == {(1, 1), (2, 2)}

    from peri_spark.functions import (cohort_retention, funnel,
                                      merge_intervals, rolling_agg,
                                      staleness)
    st = staleness(df, "k", "t", 60.0)
    dt = dict(st.dtypes)
    # NTZ in -> NTZ out, value NOT shifted by session tz
    assert dt["first_ts"] == "timestamp_ntz" and dt["last_ts"] == "timestamp_ntz"
    row = st.collect()[0]
    assert row["first_ts"] == ts(0) and row["last_ts"] == ts(3000)

    ra = rolling_agg(df, "k", "t", 60.0, [(F.count(F.lit(1)), "n")])
    assert {r["id"]: r["n"] for r in ra.collect()} == {1: 1, 2: 1}

    mi = merge_intervals(iv, "k", "s", "e")
    assert mi.count() == 2

    cr = cohort_retention(df, "id", "t", 60.0)   # ids as users
    assert cr.count() == 2

    fv = df.withColumn("et", F.when(F.col("id") == 1, "a").otherwise("b"))
    fn = {r["step"]: r["n_users"]
          for r in funnel(fv, "k", "t", "et", ["a", "b"]).collect()}
    assert fn == {"a": 1, "b": 1}


def test_merge_intervals_basic(spark):
    from peri_spark.functions import merge_intervals
    rows = [("u", 0, 10), ("u", 5, 20),      # overlap -> [0,20]
            ("u", 20, 30),                    # touching -> absorbed
            ("u", 40, 50),                    # separate
            ("u", 42, 44),                    # contained
            ("v", 0, 1),                      # other key
            ("u", None, 5), ("u", 7, 3)]      # invalid: dropped
    df = spark.createDataFrame(rows, "k string, s long, e long")
    out = merge_intervals(df, "k", "s", "e")
    got = {(r["k"], r["s"], r["e"]): r["n_merged"] for r in out.collect()}
    assert got == {("u", 0, 30): 3, ("u", 40, 50): 2, ("v", 0, 1): 1}


def test_merge_intervals_half_open(spark):
    from peri_spark.functions import merge_intervals
    df = spark.createDataFrame([("u", 0, 10), ("u", 10, 20)],
                               "k string, s long, e long")
    out = merge_intervals(df, "k", "s", "e", merge_touching=False)
    assert out.count() == 2   # [0,10) and [10,20) stay separate


def test_merge_intervals_timestamps(spark):
    from peri_spark.functions import merge_intervals
    df = spark.createDataFrame(
        [("u", ts(0), ts(100)), ("u", ts(50), ts(200)), ("u", ts(300), ts(310))],
        "k string, s timestamp, e timestamp")
    out = merge_intervals(df, "k", "s", "e").orderBy("s").collect()
    assert [(r["s"], r["e"], r["n_merged"]) for r in out] == \
        [(ts(0), ts(200), 2), (ts(300), ts(310), 1)]


def test_session_stats_batch_semantics(spark):
    """session_window works on batch frames too — probe the exact-gap
    convention the oracle mirrors: delta == gap still EXTENDS (touching
    windows merge; only delta > gap splits), same as batch sessionize."""
    from peri_spark.streaming import session_stats
    df = spark.createDataFrame(
        [("u", ts(0)), ("u", ts(59)),      # delta 59 < 60 -> extends
         ("u", ts(119)),                    # delta 60 == gap -> extends
         ("u", ts(180)),                    # delta 61 > gap -> NEW
         ("v", ts(0))],
        "k string, t timestamp")
    out = session_stats(df, "k", "t", gap="60 seconds",
                        watermark="60 seconds")
    rows = {(r["k"], r["session_start"], r["session_end"]): r["n_events"]
            for r in out.collect()}
    assert rows == {("u", ts(0), ts(179)): 3,    # end = last(119) + 60
                    ("u", ts(180), ts(240)): 1,
                    ("v", ts(0), ts(60)): 1}


def test_rolling_agg_trailing_window(spark):
    from peri_spark.functions import rolling_agg
    rows = [("u", ts(0), 1.0, 1), ("u", ts(50), 2.0, 2),
            ("u", ts(60), 4.0, 3),      # exactly 60s after id=1
            ("u", ts(200), 8.0, 4), ("v", ts(55), 16.0, 5)]
    df = spark.createDataFrame(rows, "k string, t timestamp, v double, id long")
    out = rolling_agg(df, "k", "t", 60.0,
                      [(F.sum("v"), "sv"), (F.count(F.lit(1)), "n")])
    got = {r["id"]: (r["sv"], r["n"]) for r in out.collect()}
    # (row_ts - 60s, row_ts]: id=3 sees 50s and 60s rows but NOT 0s
    assert got == {1: (1.0, 1), 2: (3.0, 2), 3: (6.0, 2),
                   4: (8.0, 1), 5: (16.0, 1)}


def test_rolling_agg_exclude_current(spark):
    from peri_spark.functions import rolling_agg
    rows = [("u", ts(0), 1.0, 1), ("u", ts(30), 2.0, 2),
            ("u", ts(30), 4.0, 3)]     # equal-ts peer
    df = spark.createDataFrame(rows, "k string, t timestamp, v double, id long")
    out = rolling_agg(df, "k", "t", 60.0, [(F.count(F.lit(1)), "n")],
                      include_current=False)
    got = {r["id"]: r["n"] for r in out.collect()}
    # strictly-before frame: equal-ts peers excluded from each other
    # (count over an empty frame is 0)
    assert got == {1: 0, 2: 1, 3: 1}


def test_staleness_verdicts(spark):
    from peri_spark.functions import staleness
    rows = [("a", ts(0)), ("a", ts(100)), ("a", ts(130)),
            ("b", ts(0)), ("b", ts(20)),   # stale: silent since ts(20)
            ("c", ts(125))]                # single event, recent
    df = spark.createDataFrame(rows, "k string, t timestamp")
    out = staleness(df, "k", "t", 60.0)    # as_of = corpus max = ts(130)
    got = {r["k"]: (r["n_events"], r["max_gap_seconds"],
                    r["tail_gap_seconds"], r["stale"])
           for r in out.collect()}
    assert got["a"] == (3, 100.0, 0.0, True)     # internal 100s gap
    assert got["b"] == (2, 20.0, 110.0, True)    # tail gap 110s
    assert got["c"] == (1, 0.0, 5.0, False)


def test_staleness_explicit_as_of(spark):
    from peri_spark.functions import staleness
    df = spark.createDataFrame([("a", ts(0))], "k string, t timestamp")
    out = staleness(df, "k", "t", 3600.0,
                    as_of="2024-01-01 13:00:00+00:00").collect()[0]
    assert out["tail_gap_seconds"] == 3600.0 and not out["stale"]


def test_session_stats_rejects_empty_aggs(spark):
    from peri_spark.streaming import session_stats
    df = spark.createDataFrame([("u", ts(0))], "k string, t timestamp")
    with pytest.raises(ValueError, match="non-empty"):
        session_stats(df, "k", "t", aggs=[])


def test_rolling_agg_null_ts_peer_group(spark):
    """Documented contract: NULL-ts rows are a RANGE peer group — each
    aggregates over ALL of its key's NULL-ts rows."""
    from peri_spark.functions import rolling_agg
    df = spark.createDataFrame(
        [("u", None, 1.0, 1), ("u", None, 2.0, 2), ("u", ts(0), 4.0, 3)],
        "k string, t timestamp, v double, id long")
    out = rolling_agg(df, "k", "t", 60.0, [(F.sum("v"), "sv")])
    got = {r["id"]: r["sv"] for r in out.collect()}
    assert got == {1: 3.0, 2: 3.0, 3: 4.0}


def test_bad_args(spark):
    df = spark.createDataFrame([("a", ts(0), 1.0)],
                               "k string, t timestamp, v double")
    with pytest.raises(ValueError, match="positive"):
        sessionize(df, "k", "t", 0.0)
    with pytest.raises(ValueError, match="closed"):
        range_join(df, df, point_ts_col="t", start_col="t", end_col="t",
                   closed="open")
