"""Corpus-curation operators: decontamination, deterministic splits,
stratified sampling, weighted source mixing."""

import pytest
from pyspark.sql import functions as F

from peri_spark.functions import (contamination_overlap, hash_split,
                                  stratified_sample, weighted_mix)

DOCS = "/root/testdata/sf0.01/documents.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS)


# -- contamination_overlap --------------------------------------------------

def test_contamination_identical_and_disjoint(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "completely different words appear here now friend")],
        ["doc_id", "text"])
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        ["bench_id", "text"])
    out = {r.id: r for r in contamination_overlap(
        df, bench, "text", "doc_id", n=3, threshold=0.5).collect()}
    assert out[1].overlap == 1.0 and out[1].contaminated
    assert out[1].n_matched == out[1].n_grams
    assert out[2].overlap == 0.0 and not out[2].contaminated
    assert out[2].n_matched == 0


def test_contamination_partial_overlap(spark):
    # doc shares its first 3-gram with the benchmark, rest disjoint
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], ["doc_id", "text"])
    bench = spark.createDataFrame(
        [(9, "alpha beta gamma zeta eta")], ["bench_id", "text"])
    r = contamination_overlap(df, bench, "text", "doc_id",
                              n=3, threshold=0.9).collect()[0]
    # doc grams: (alpha beta gamma) (beta gamma delta) (gamma delta epsilon)
    assert r.n_grams == 3 and r.n_matched == 1
    assert r.overlap == round(1 / 3, 6) and not r.contaminated


def test_contamination_skips_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "   "), (2, None), (3, "real text here")], ["doc_id", "text"])
    bench = spark.createDataFrame([(9, "x y z")], ["bench_id", "text"])
    out = contamination_overlap(df, bench, "text", "doc_id", n=2)
    assert [r.id for r in out.collect()] == [3]


# -- hash_split -------------------------------------------------------------

def test_hash_split_partitions_and_is_deterministic(docs):
    out = hash_split(docs, "doc_id",
                     {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r["count"]
              for r in out.groupBy("split").count().collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == docs.count()
    assert counts["train"] > counts["val"]
    again = hash_split(docs, "doc_id",
                       {"train": 0.8, "val": 0.1, "test": 0.1})
    assert (out.select("doc_id", "split").exceptAll(
        again.select("doc_id", "split")).count() == 0)


def test_hash_split_remainder_is_null(docs):
    out = hash_split(docs, "doc_id", {"train": 0.5})
    n_null = out.where(F.col("split").isNull()).count()
    assert 0 < n_null < docs.count()


def test_hash_split_rejects_oversubscription(docs):
    with pytest.raises(ValueError, match="sum"):
        hash_split(docs, "doc_id", {"a": 0.7, "b": 0.5})


# -- stratified_sample ------------------------------------------------------

def test_stratified_sample_rates(docs):
    out = stratified_sample(docs, "lang", {"en": 1.0, "de": 0.0},
                            "doc_id", default_rate=0.5)
    n_en = docs.where(F.col("lang") == "en").count()
    got = {r.lang: r["count"]
           for r in out.groupBy("lang").count().collect()}
    assert got["en"] == n_en            # rate 1.0 keeps everything
    assert "de" not in got              # rate 0.0 drops the stratum
    for lang in ("es", "fr", "zh"):     # default applies to the rest
        total = docs.where(F.col("lang") == lang).count()
        assert 0 < got[lang] < total


def test_stratified_sample_is_subset_and_deterministic(docs):
    out = stratified_sample(docs, "source", {"src0": 0.3}, "doc_id")
    assert out.exceptAll(docs).count() == 0
    assert out.count() == stratified_sample(
        docs, "source", {"src0": 0.3}, "doc_id").count()


def test_stratified_sample_rejects_bad_rate(docs):
    with pytest.raises(ValueError, match="rate"):
        stratified_sample(docs, "lang", {"en": 1.5}, "doc_id")


# -- weighted_mix -----------------------------------------------------------

def test_weighted_mix_proportions(docs):
    # en is ~3x the size of de; ask for a 1:1 mix — en gets thinned,
    # the scarcer-relative-to-weight source keeps all its rows
    out = weighted_mix(docs, "lang", {"en": 1.0, "de": 1.0}, "doc_id")
    got = {r.lang: r["count"]
           for r in out.groupBy("lang").count().collect()}
    n_de = docs.where(F.col("lang") == "de").count()
    n_en = docs.where(F.col("lang") == "en").count()
    assert set(got) == {"en", "de"}     # unlisted sources dropped
    assert got["de"] == n_de            # max-retention source intact
    assert got["en"] < n_en             # oversized source thinned
    assert abs(got["en"] - n_de) <= 0.35 * n_de   # ~1:1 mix


def test_weighted_mix_keeps_schema_and_subset(docs):
    out = weighted_mix(docs, "lang", {"fr": 2.0, "zh": 1.0}, "doc_id")
    assert out.columns == docs.columns
    assert out.exceptAll(docs).count() == 0
    got = {r.lang: r["count"]
           for r in out.groupBy("lang").count().collect()}
    # fr weighted 2x zh: surviving fr ≈ 2 * surviving zh
    assert got["fr"] > got["zh"]


# -- redact_text ------------------------------------------------------------

def test_redact_text_defaults(spark):
    from peri_spark.functions import redact_text
    df = spark.createDataFrame(
        [(1, "mail bob@corp.example.org from 192.168.0.1 "
             "key deadbeefdeadbeefdeadbeefdeadbeef done"),
         (2, "nothing sensitive here")], ["doc_id", "text"])
    out = {r.doc_id: r for r in redact_text(df, "text").collect()}
    assert out[1].text_redacted == \
        "mail [EMAIL] from [IPV4] key [SECRET] done"
    assert (out[1].n_email, out[1].n_ipv4, out[1].n_secret) == (1, 1, 1)
    assert out[2].text_redacted == "nothing sensitive here"
    assert (out[2].n_email, out[2].n_ipv4, out[2].n_secret) == (0, 0, 0)


def test_redact_text_custom_patterns_and_plan(spark, docs):
    from peri_spark.functions import redact_text
    out = redact_text(docs, "text", patterns={"word": r"\bthe\b"},
                      out_col="clean", with_counts=False)
    assert out.columns == docs.columns + ["clean"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


# -- review-pass regressions -------------------------------------------------

def test_hash_split_float_accumulation_boundary(docs):
    # 0.34 + 0.56 + 0.10 accumulates to 1.0000000000000002 in floats;
    # the cumulative bound must clamp, not raise
    out = hash_split(docs, "doc_id", {"a": 0.34, "b": 0.56, "c": 0.10})
    counts = {r.split: r["count"]
              for r in out.groupBy("split").count().collect()}
    assert set(counts) == {"a", "b", "c"}
    assert sum(counts.values()) == docs.count()


def test_null_keys_null_propagate(spark):
    # NULL keys must behave like the SQL `||` mirror: NULL coin, row
    # dropped by samplers, NULL split — never one shared constant coin
    df = spark.createDataFrame(
        [(None, "en"), (None, "en"), ("k1", "en"), ("k2", "en")],
        ["key", "lang"])
    split = hash_split(df, "key", {"train": 0.99})
    assert split.where(F.col("key").isNull()
                       & F.col("split").isNotNull()).count() == 0
    kept = stratified_sample(df, "lang", {"en": 0.99}, "key")
    assert kept.where(F.col("key").isNull()).count() == 0


def test_redact_label_with_replacement_metachars(spark):
    from peri_spark.functions import redact_text
    df = spark.createDataFrame([(1, "price $42 end")], ["doc_id", "text"])
    out = redact_text(df, "text", patterns={"price$": r"\$\d+"},
                      with_counts=False).collect()[0]
    assert out.text_redacted == "price [PRICE$] end"


def test_temperature_mix_flattens_skew(spark):
    from collections import Counter

    from peri_spark.functions import temperature_mix
    rows = [(i, "big") for i in range(900)] + \
           [(1000 + i, "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = Counter(r.source for r in
                   temperature_mix(df, "source", "doc_id",
                                   tau=2.0).collect())
    # rates: w_s = n_s^(1/2); small keeps 100% (anchor), big keeps
    # sqrt(900)/900 / (sqrt(100)/100) = (1/30)/(1/10) = 1/3
    assert kept["small"] == 100
    assert abs(kept["big"] - 300) < 45        # hash-coin binomial noise
    # tau=1 is the natural mix: everything kept
    n1 = temperature_mix(df, "source", "doc_id", tau=1.0).count()
    assert n1 == 1000


def test_temperature_mix_up_mode_replicates(spark):
    from peri_spark.functions import temperature_mix
    rows = [(i, "big") for i in range(400)] + \
           [(1000 + i, "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_mix(df, "source", "doc_id", tau=2.0, mode="up")
    big = out.where("source = 'big'").count()
    small = out.where("source = 'small'").count()
    assert big == 400                          # anchor keeps 1 epoch
    # small replicates at rate (10/100)/(20/400) = 2.0 epochs
    assert small == 200
    import pytest
    with pytest.raises(ValueError, match="tau"):
        temperature_mix(df, "source", "doc_id", tau=0)
