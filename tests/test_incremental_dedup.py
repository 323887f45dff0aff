"""Incremental (batch-vs-corpus) MinHash-LSH dedup: lsh_pairs_against."""

import pytest
from pyspark.sql import functions as F

from peri_spark.functions.dedup import (lsh_pairs_against,
                                        minhash_signatures,
                                        portable_hash64)


def _texts(spark, rows, id_start=0):
    return spark.createDataFrame(
        [(id_start + i, t) for i, t in enumerate(rows)], "id long, text string")


@pytest.fixture(scope="module")
def corpus(spark):
    # 40 distinct docs with enough length for stable 5-gram shingles;
    # non-foldable (id-derived) text so nothing constant-folds
    return spark.range(0, 40).select(
        "id",
        F.concat(F.lit("the quick brown fox document number "),
                 F.col("id").cast("string"),
                 F.lit(" jumps over the lazy dog repeatedly "),
                 F.md5(F.col("id").cast("string"))).alias("text"))


def test_batch_copies_hit_corpus(spark, corpus):
    # batch: exact copies of corpus docs 3 and 7 (new ids), plus a novel doc
    batch = (corpus.where(F.col("id").isin(3, 7))
             .select((F.col("id") + 1000).alias("id"), "text")
             .union(_texts(spark, ["entirely novel content that matches "
                                   "nothing in the corpus at all x" * 3],
                           id_start=2000)))
    pairs = lsh_pairs_against(corpus, batch, "text", "id", threshold=0.9)
    got = {(r.corpus_id, r.batch_id): r.est_jaccard for r in pairs.collect()}
    assert got.get((3, 1003)) == 1.0 and got.get((7, 1007)) == 1.0
    assert all(b != 2000 for _c, b in got)


def test_precomputed_index_equivalent(spark, corpus):
    batch = (corpus.where(F.col("id") < 5)
             .select((F.col("id") + 500).alias("id"), "text"))
    direct = lsh_pairs_against(corpus, batch, "text", "id", threshold=0.9)
    idx = minhash_signatures(corpus, "text", "id")
    via_index = lsh_pairs_against(None, batch, "text", "id", threshold=0.9,
                                  corpus_sigs=idx)
    assert sorted(map(tuple, direct.collect())) == \
        sorted(map(tuple, via_index.collect()))


def test_corpus_hot_bucket_cap(spark):
    # 30 identical corpus docs: every band bucket has 30 members, all
    # above the cap of 10 — the batch copy must find NO pairs, and the
    # counter must report the dropped buckets
    corpus = spark.range(0, 30).select(
        "id", F.lit("identical license boilerplate text that repeats "
                    "in every single file of the corpus").alias("text"))
    batch = _texts(spark, ["identical license boilerplate text that "
                           "repeats in every single file of the corpus"],
                   id_start=900)
    counter = {}
    pairs = lsh_pairs_against(corpus, batch, "text", "id", threshold=0.5,
                              max_bucket_size=10, dropped_counter=counter)
    assert pairs.count() == 0
    # identical docs share all 16 band buckets, each with 30 members
    assert counter["n_hot_buckets"] > 0
    assert counter["n_dropped_rows"] == 30 * counter["n_hot_buckets"]
    # without the cap the same batch doc pairs with all 30
    pairs2 = lsh_pairs_against(corpus, batch, "text", "id", threshold=0.5,
                               max_bucket_size=None)
    assert pairs2.count() == 30


def test_release_contract(spark, corpus):
    batch = corpus.limit(3).select((F.col("id") + 100).alias("id"), "text")
    lazy = lsh_pairs_against(corpus, batch, "text", "id", release=False)
    assert hasattr(lazy, "_peri_persisted") and lazy._peri_persisted
    for c in lazy._peri_persisted:
        c.unpersist()


def test_portable_hash_mode(spark, corpus):
    batch = corpus.limit(2).select((F.col("id") + 300).alias("id"), "text")
    pairs = lsh_pairs_against(corpus, batch, "text", "id", threshold=0.9,
                              hash_fn=portable_hash64)
    got = {(r.corpus_id, r.batch_id) for r in pairs.collect()}
    assert (0, 300) in got and (1, 301) in got


# -- exact_dedup_against ------------------------------------------------------

def test_exact_against_verdicts(spark):
    from peri_spark.functions.dedup import exact_dedup_against
    corpus = _texts(spark, ["alpha", "beta", "alpha"])        # ids 0,1,2
    batch = _texts(spark, ["alpha",      # 10: corpus dup -> canonical 0
                           "gamma",      # 11: new (first of two in batch)
                           "gamma",      # 12: dup within batch -> 11
                           "delta",      # 13: new, unique
                           None],        # 14: null text dropped
                   id_start=10)
    out = {r["id"]: (r["verdict"], r["canonical_id"])
           for r in exact_dedup_against(corpus, batch, "text", "id")
           .collect()}
    assert out == {10: ("dup_corpus", 0), 11: ("new", None),
                   12: ("dup_batch", 11), 13: ("new", None)}


def test_exact_against_prebuilt_index_matches(spark):
    from peri_spark.functions.dedup import (exact_dedup_against,
                                            exact_digest_index)
    corpus = _texts(spark, ["a", "b", "c", "a"])
    batch = _texts(spark, ["a", "z", "z"], id_start=100)
    direct = exact_dedup_against(corpus, batch, "text", "id")
    idx = exact_digest_index(corpus, "text", "id")
    via_index = exact_dedup_against(None, batch, "text", "id",
                                    corpus_index=idx)
    assert sorted(map(tuple, direct.collect())) == \
        sorted(map(tuple, via_index.collect()))
    # index carries multiplicity for corpus hygiene checks
    n = {r["digest"]: r["n"] for r in idx.collect()}
    assert sorted(n.values()) == [1, 1, 2]
    with pytest.raises(ValueError):
        exact_dedup_against(None, batch, "text", "id")


def test_exact_against_batch_exchange_reused(spark, corpus):
    from peri_spark.functions.dedup import exact_dedup_against
    batch = corpus.where(F.col("id") < 10).select(
        (F.col("id") + 1000).alias("id"), "text")
    out = exact_dedup_against(corpus, batch, "text", "id")
    out.collect()
    final = out._jdf.queryExecution().executedPlan().toString()
    # the batch (digest, id) repartition feeds probe + min-agg + join
    # off one exchange; AQE must reuse, not re-execute, it
    assert "ReusedExchange" in final


def test_update_digest_index_equals_rebuild(spark):
    from peri_spark.functions.dedup import (exact_digest_index,
                                            update_digest_index)
    corpus = _texts(spark, ["a", "b", "a"])          # ids 0,1,2
    batch = _texts(spark, ["a", "c", None], id_start=10)
    idx = exact_digest_index(corpus, "text", "id")
    merged = update_digest_index(idx, batch, "text", "id")
    rebuilt = exact_digest_index(
        corpus.unionByName(batch), "text", "id")
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, rebuilt.collect()))
    got = {r["canonical_id"]: r["n"] for r in merged.collect()}
    assert got == {0: 3, 1: 1, 11: 1}   # 'a' n=3 canonical 0; 'c' new
