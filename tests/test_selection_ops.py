"""Selection-under-budget operators (curation.py): per-group top-k,
token-budget prefixes, and the sort-free exact top-fraction selector."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from peri_spark.functions.curation import (select_top_fraction,
                                           token_budget_sample,
                                           top_k_per_group)


@pytest.fixture(scope="module")
def docs(spark):
    # deterministic synthetic with heavy score ties across 3 groups
    return spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("src"),
        ((F.col("id") * 37) % 11).cast("long").alias("score"))


def _ranked(df, by_group):
    part = Window.partitionBy("src") if by_group else Window.partitionBy()
    w = part.orderBy(F.col("score").desc(), F.col("doc_id"))
    return df.withColumn("rn", F.row_number().over(w))


def test_top_k_per_group_matches_window(docs):
    got = top_k_per_group(docs, "src", "score", 7, "doc_id",
                          rank_col="rank")
    exp = _ranked(docs, True).where(F.col("rn") <= 7)
    assert sorted((r.doc_id, r.rank) for r in got.collect()) == \
        sorted((r.doc_id, r.rn) for r in exp.collect())
    # every group exactly k (300 rows / 3 groups, all groups ≥ 7)
    sizes = got.groupBy("src").count().collect()
    assert all(r["count"] == 7 for r in sizes)


def test_top_k_ascending_and_validation(docs):
    got = top_k_per_group(docs, "src", "score", 2, "doc_id",
                          descending=False)
    w = Window.partitionBy("src").orderBy(F.col("score").asc(),
                                          F.col("doc_id"))
    exp = (docs.withColumn("rn", F.row_number().over(w))
           .where(F.col("rn") <= 2).drop("rn"))
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, exp.collect()))
    with pytest.raises(ValueError):
        top_k_per_group(docs, "src", "score", 0, "doc_id")


def test_token_budget_sample_rows_frame(docs):
    # budget small enough that ties on the priority matter: a RANGE
    # frame would include all peers and keep nothing past the first tie
    got = token_budget_sample(docs, "src", "score", 40, "doc_id",
                              priority_col="score", cum_col="cum")
    w = (Window.partitionBy("src")
         .orderBy(F.col("score").desc(), F.col("doc_id"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    exp = (docs.withColumn("cum", F.sum("score").over(w))
           .where(F.col("cum") <= 40))
    assert sorted((r.doc_id, r.cum) for r in got.collect()) == \
        sorted((r.doc_id, r.cum) for r in exp.collect())
    assert got.count() > 0
    with pytest.raises(ValueError):
        token_budget_sample(docs, "src", "score", 0, "doc_id")


@pytest.mark.parametrize("frac", [0.1, 0.25, 0.5, 0.9])
def test_select_top_fraction_exact(docs, frac):
    import math
    got = select_top_fraction(docs, "score", frac, "doc_id")
    k = math.floor(frac * 300)
    exp = _ranked(docs, False).where(F.col("rn") <= k).drop("rn")
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, exp.collect()))


def test_select_top_fraction_forces_refinement(docs):
    # refine_cap below n forces at least one histogram refinement pass
    got = select_top_fraction(docs, "score", 0.25, "doc_id",
                              bins=4, refine_cap=20)
    exp = _ranked(docs, False).where(F.col("rn") <= 75).drop("rn")
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, exp.collect()))


def test_select_top_fraction_edges(spark, docs):
    assert select_top_fraction(docs, "score", 0.0, "doc_id").count() == 0
    assert select_top_fraction(docs, "score", 1.0, "doc_id").count() == 300
    # all-equal scores: pure tie path, ids decide
    const = spark.range(0, 50).select(
        F.col("id").alias("doc_id"), F.lit(5).alias("score"))
    got = select_top_fraction(const, "score", 0.2, "doc_id",
                              bins=4, refine_cap=10)
    assert sorted(r.doc_id for r in got.collect()) == list(range(10))
    # NULL scores never selected
    nulled = docs.withColumn(
        "score", F.when(F.col("doc_id") < 150, F.col("score")))
    got = select_top_fraction(nulled, "score", 0.5, "doc_id")
    assert got.count() == 75 and \
        got.where(F.col("score").isNull()).count() == 0
    with pytest.raises(ValueError):
        select_top_fraction(docs, "score", 1.5, "doc_id")


def test_select_top_fraction_final_plan_is_map_side(docs):
    # the returned plan must be a pure filter over the scan: no global
    # sort, no exchange — the cutoff is folded in as literals
    got = select_top_fraction(docs, "score", 0.25, "doc_id")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Sort" not in plan
