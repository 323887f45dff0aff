"""cohort_retention and funnel over hand-built event logs."""
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from peri_spark.functions import cohort_retention, funnel

T0 = datetime(2024, 1, 1, 0, 0, 0)


def ts(days, sec=0):
    return T0 + timedelta(days=days, seconds=sec)


def test_cohort_retention_matrix(spark):
    rows = [  # u1: cohort day0, active day0+day2; u2: day0 only;
              # u3: cohort day2, active day2+day3 (two events day2 = 1)
        (1, ts(0)), (1, ts(0, 60)), (1, ts(2)),
        (2, ts(0)),
        (3, ts(2)), (3, ts(2, 5)), (3, ts(3)),
        (None, ts(1)), (4, None)]                 # dropped
    df = spark.createDataFrame(rows, "u long, t timestamp")
    out = cohort_retention(df, "u", "t", 86400.0)
    got = {(r["cohort"], r["bucket_offset"]): r["n_users"]
           for r in out.collect()}
    d0 = min(c for c, _ in got)
    assert got == {(d0, 0): 2, (d0, 2): 1,        # u1+u2 day0; u1 day2
                   (d0 + 2, 0): 1, (d0 + 2, 1): 1}  # u3


def test_funnel_ordering_and_window(spark):
    rows = [
        # u1 completes a->b->c in order
        (1, "a", ts(0)), (1, "b", ts(0, 10)), (1, "c", ts(0, 20)),
        # u2: b BEFORE a, never after -> stops at a
        (2, "b", ts(0)), (2, "a", ts(0, 10)),
        # u3: a then b, c outside the 1h window
        (3, "a", ts(0)), (3, "b", ts(0, 30)), (3, "c", ts(0, 4000)),
        # u4: never did a
        (4, "b", ts(0)), (4, "c", ts(0, 10))]
    df = spark.createDataFrame(rows, "u long, et string, t timestamp")
    out = funnel(df, "u", "t", "et", ["a", "b", "c"],
                 within_seconds=3600.0)
    got = {r["step"]: r["n_users"] for r in out.collect()}
    assert got == {"a": 3, "b": 2, "c": 1}


def test_funnel_equal_ts_chains(spark):
    df = spark.createDataFrame([(1, "a", ts(0)), (1, "b", ts(0))],
                               "u long, et string, t timestamp")
    got = {r["step"]: r["n_users"]
           for r in funnel(df, "u", "t", "et", ["a", "b"]).collect()}
    assert got == {"a": 1, "b": 1}     # >= lets same-instant events chain


def test_funnel_requires_two_steps(spark):
    df = spark.createDataFrame([(1, "a", ts(0))],
                               "u long, et string, t timestamp")
    with pytest.raises(ValueError, match="at least 2"):
        funnel(df, "u", "t", "et", ["a"])


def test_funnel_rejects_repeated_adjacent_steps(spark):
    """A single event would satisfy both copies of a repeated step via
    the >= match (same-event self-match) — rejected explicitly."""
    df = spark.createDataFrame([(1, "a", ts(0))],
                               "u long, et string, t timestamp")
    with pytest.raises(ValueError, match="must differ"):
        funnel(df, "u", "t", "et", ["a", "a"])
    # non-adjacent repeats are fine
    funnel(df, "u", "t", "et", ["a", "b", "a"])
