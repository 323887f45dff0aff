"""compare_verdicts regression-diff statuses."""

from peri_spark.constraints import compare_verdicts


def _verdicts(spark, rows):
    return spark.createDataFrame(
        rows, "part string, n_rows long, n_bad_rows long, passed boolean")


def test_all_six_statuses(spark):
    prev = _verdicts(spark, [
        ("a", 10, 0, True),    # -> regressed
        ("b", 10, 5, False),   # -> fixed
        ("c", 10, 5, False),   # -> still_failing
        ("d", 10, 0, True),    # -> still_passing
        ("e", 10, 1, True),    # -> removed
    ])
    cur = _verdicts(spark, [
        ("a", 10, 4, False),
        ("b", 10, 0, True),
        ("c", 10, 6, False),
        ("d", 10, 0, True),
        ("f", 10, 2, False),   # -> added
    ])
    got = {r.part: r for r in compare_verdicts(cur, prev, "part").collect()}
    assert got["a"].status == "regressed" and got["a"].bad_delta == 4
    assert got["b"].status == "fixed" and got["b"].bad_delta == -5
    assert got["c"].status == "still_failing" and got["c"].bad_delta == 1
    assert got["d"].status == "still_passing"
    assert got["e"].status == "removed" and got["e"].n_bad_rows is None
    assert got["e"].prev_n_bad_rows == 1
    assert got["f"].status == "added" and got["f"].prev_n_bad_rows is None
    assert got["f"].n_bad_rows == 2 and got["f"].bad_delta is None


def test_composite_partition_key(spark):
    prev = spark.createDataFrame(
        [("a", "x", 5, 0, True)],
        "p1 string, p2 string, n_rows long, n_bad_rows long, passed boolean")
    cur = spark.createDataFrame(
        [("a", "x", 5, 3, False), ("a", "y", 5, 0, True)],
        "p1 string, p2 string, n_rows long, n_bad_rows long, passed boolean")
    got = {(r.p1, r.p2): r.status
           for r in compare_verdicts(cur, prev, ["p1", "p2"]).collect()}
    assert got[("a", "x")] == "regressed"
    assert got[("a", "y")] == "added"
