"""r6 parity guards: the Arrow-batched similarity kernels must equal
the retained JVM HOF formulation BIT-FOR-BIT (the HOF helpers `_sim`,
`_ivf_assign`, `_bucket_col` stay in-tree as the semantic
source-of-truth; these tests hold the fast kernels to them on
deterministic pseudo-random data, including a planted near-duplicate
structure so threshold decisions actually fire)."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from peri_spark.functions.similarity import (
    _bucket_col, _ivf_assign, _pair_sim, _planes, _sim,
    _vec_annotate_arrow, deterministic_kmeans, semantic_dedup)


def _vecs(spark, n=120, d=16, seed=7):
    rng = np.random.RandomState(seed)
    base = rng.standard_normal((n, d)).round(4)
    # plant near-dups: every 10th vector is a tiny perturbation of its
    # predecessor so cosine >= threshold pairs exist
    for i in range(10, n, 10):
        base[i] = base[i - 1] * 1.0001
    rows = [(int(i), [float(x) for x in base[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, v array<double>")


def test_pair_sim_matches_hof_exactly(spark):
    df = _vecs(spark)
    a = df.select(F.col("vec_id").alias("ia"), F.col("v").alias("va"))
    b = df.select(F.col("vec_id").alias("ib"), F.col("v").alias("vb"))
    pairs = a.join(b, F.col("ia") < F.col("ib")).limit(4000)
    for normed in (False, True):
        got = pairs.select(
            "ia", "ib",
            _pair_sim(F.col("va"), F.col("vb"), normed).alias("s"),
            _sim(F.col("va"), F.col("vb"), normed).alias("ref"))
        bad = got.where(~F.col("s").eqNullSafe(F.col("ref"))).count()
        assert bad == 0


def test_vec_annotate_matches_hof_exactly(spark):
    df = _vecs(spark)
    cent = deterministic_kmeans(
        np.array(df.select("v").toPandas()["v"].tolist()), 6, seed=3)
    two = df.select(F.col("vec_id").alias("id"), F.col("v").alias("__cv"))
    fast = _vec_annotate_arrow(two, "cell",
                               np.asarray(cent, np.float64), "cell")
    ref = two.select("id", _ivf_assign(F.col("__cv"), cent).alias("cell"))
    j = fast.select("id", F.col("cell").alias("fc")).join(ref, "id")
    assert j.where(~F.col("fc").eqNullSafe(F.col("cell"))).count() == 0

    P = np.asarray(_planes(16, 5, seed=11), np.float64)
    fastb = _vec_annotate_arrow(two, "bucket", P, "bucket")
    refb = two.select("id", _bucket_col(F.col("__cv"), 5, 11, dim=16)
                      .alias("bucket"))
    jb = (fastb.select("id", F.col("bucket").alias("fb")).join(refb, "id"))
    assert jb.where(F.col("fb") != F.col("bucket")).count() == 0


def test_semantic_dedup_matches_join_formulation(spark):
    """The grouped numpy kernel must drop exactly the ids the original
    within-cell self-join formulation dropped."""
    df = _vecs(spark, n=150)
    cent = deterministic_kmeans(
        np.array(df.select("v").toPandas()["v"].tolist()), 5, seed=5)
    got = {tuple(r) for r in
           semantic_dedup(df, "v", "vec_id", cent,
                          threshold=0.999).collect()}

    # reference: the r5 join formulation, verbatim
    c = df.select(F.col("vec_id").alias("id"), F.col("v").alias("__v"),
                  _ivf_assign(F.col("v"), cent).alias("cell"))
    sz = (c.groupBy("cell").agg(F.count(F.lit(1)).alias("n"))
          .where(F.col("n") <= 10_000).select("cell"))
    small = c.join(F.broadcast(sz), "cell")
    aa, bb = small.alias("a"), small.alias("b")
    simc = F.round(_sim(F.col("a.__v"), F.col("b.__v"), False), 6)
    dups = (aa.join(bb, (F.col("a.cell") == F.col("b.cell"))
                    & (F.col("a.id") > F.col("b.id")))
            .where(simc >= 0.999)
            .select(F.col("a.id").alias("id")).distinct())
    ref = {tuple(r) for r in
           c.join(dups, "id", "left_anti").select("id", "cell").collect()}
    assert got == ref
    # the planted perturbations must actually have fired
    assert len(got) < df.count()


def test_null_and_ragged_vectors_match_hof(spark):
    # no all-zero vector here: under Spark 4's ANSI default BOTH the
    # HOF and the Arrow formulation raise DIVIDE_BY_ZERO on a zero
    # norm (the division is a JVM expression in both), so the parity
    # surface is NULL/ragged handling
    rows = [(1, [1.0, 2.0, 3.0]), (2, None), (3, [1.0, 2.0]),
            (5, [4.0, 5.0, 6.0])]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    a = df.select(F.col("vec_id").alias("ia"), F.col("v").alias("va"))
    b = df.select(F.col("vec_id").alias("ib"), F.col("v").alias("vb"))
    pairs = a.crossJoin(b)
    got = pairs.select(
        "ia", "ib", _pair_sim(F.col("va"), F.col("vb"), False).alias("s"),
        _sim(F.col("va"), F.col("vb"), False).alias("ref"))
    rows = got.collect()
    for r in rows:
        s, ref = r["s"], r["ref"]
        if ref is None:          # NULL vec / length mismatch
            assert s is None, (r["ia"], r["ib"], s)
        elif ref != ref:         # NaN from a zero-norm division
            assert s != s, (r["ia"], r["ib"], s)
        else:
            assert s == ref, (r["ia"], r["ib"], s, ref)
