"""ValidationResult.sample_violations: per-class caps, determinism."""

import pytest

from peri_spark import validate


def _res(spark):
    rows = [(i, -i, "x" * 50) for i in range(1, 21)] + [(100, 5, "ok")]
    df = spark.createDataFrame(rows, "id long, n long, s string")
    return validate(df, {"n": ("integer", ("gte", 0)),
                         "s": ("string", ("max", 10))}, mode="permissive")


def test_caps_per_class_and_counts(spark):
    out = _res(spark).sample_violations(3, "id").collect()
    by_class = {}
    for r in out:
        by_class.setdefault((tuple(r.path), r.key), []).append(r)
    assert set(by_class) == {(("n",), "n"), (("s",), "s")}
    for rows in by_class.values():
        assert len(rows) == 3
        assert sorted(r.rank for r in rows) == [1, 2, 3]
        assert all(r.class_count == 20 for r in rows)


def test_deterministic_across_runs(spark):
    a = {(r.id, r.key, r.rank) for r in
         _res(spark).sample_violations(2, "id").collect()}
    b = {(r.id, r.key, r.rank) for r in
         _res(spark).sample_violations(2, "id").collect()}
    assert a == b and len(a) == 4


def test_small_class_returns_all(spark):
    df = _res(spark)
    out = df.sample_violations(50, "id")
    assert out.count() == 40          # 20 violations x 2 classes


def test_validates_args(spark):
    r = _res(spark)
    with pytest.raises(ValueError):
        r.sample_violations(0, "id")
    with pytest.raises(ValueError):
        r.sample_violations(3)
