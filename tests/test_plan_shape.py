"""Physical-plan regression tests: the scale properties are assertions,
not hopes. If a change reintroduces a Python UDF into the hot path, drops
column pruning, or turns the referential broadcast into a shuffle join,
these fail."""

import pytest
from pyspark.sql import functions as F

import peri_spark as ps
from peri_spark.constraints import referential_violations, uniqueness_violations
from peri_spark.generator import FLAGSHIP_SCHEMA, code_files

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture(scope="module")
def docs(spark):
    # other test modules cache this parquet; a cached InMemoryRelation
    # would replace the scan we're asserting on
    spark.catalog.clearCache()
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_row_validation_is_single_stage_no_python(spark, docs):
    res = ps.validate(docs, {"doc_id": ("required", "integer"),
                             "lang": ("enum", ["en", "es"])})
    p = plan_of(res.annotated)
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "Exchange" not in p            # zero shuffle — pure map stage
    assert p.count("Scan parquet") == 1   # one scan


def test_strict_mode_prunes_scan_columns(spark, docs):
    # schema references 2 of 5 columns → ReadSchema must carry only those
    res = ps.validate(docs, {"doc_id": ("required", "integer"),
                             "lang": "string"})
    p = plan_of(res.annotated)
    read = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert "doc_id" in read and "lang" in read
    assert "text" not in read and "n_chars" not in read and "source" not in read


def test_valid_filter_pushes_down_nothing_python(spark, docs):
    res = ps.validate(docs, {"n_chars": ("integer", ("gte", 0))})
    assert "Python" not in plan_of(res.valid)


def test_referential_uses_broadcast_anti_join(spark, docs):
    dim = docs.select("lang").dropDuplicates()
    bad = referential_violations(docs, "lang", dim, "lang", broadcast=True)
    p = plan_of(bad)
    assert "BroadcastHashJoin" in p and "LeftAnti" in p
    # the fact side must NOT shuffle for the join
    assert "Exchange hashpartitioning(lang" not in p.split("BroadcastHashJoin")[0]


def test_uniqueness_is_partial_aggregated(spark, docs):
    dups = uniqueness_violations(docs, ["lang", "source"])
    p = plan_of(dups)
    # two HashAggregates around one Exchange = map-side partial combine
    pre_exchange = p.split("Exchange")[-1]
    assert "HashAggregate" in p.split("Exchange")[0]  # final agg
    assert "HashAggregate" in pre_exchange            # partial agg
    assert p.count("Exchange") <= 2  # one shuffle (+AQE read)


def test_uniqueness_salted_two_phase(spark, docs):
    dups = uniqueness_violations(docs, ["lang"], salt_buckets=8)
    p = plan_of(dups)
    # salted plan: aggregate on (keys, salt) then re-aggregate on keys
    assert p.count("HashAggregate") >= 3


def test_fused_scan_agg_shuffles_counters_not_corpus(spark):
    from peri_spark.engine import validate, VIOLATIONS_COLUMN
    from peri_spark.constraints.drift import _bucket
    df = code_files(spark, SF)
    ann = validate(df, FLAGSHIP_SCHEMA, mode="permissive", lean=True).annotated
    g = (ann.select(F.col("repo").alias("p"),
                    F.coalesce(_bucket(F.length("content"), 0.0, 4096.0, 16),
                               F.lit(-1)).alias("b"),
                    F.size(F.col(VIOLATIONS_COLUMN)).alias("nv"))
         .groupBy("p", "b").agg(F.count(F.lit(1)).alias("n"), F.sum("nv")))
    p = plan_of(g)
    assert "BatchEvalPython" not in p
    # 2 scans: the generator's dup-injection UNION (bench uses a single
    # pre-materialized parquet; here we accept the generator's shape)
    assert p.count("Scan parquet") <= 2
    # partial aggregation before the exchange: corpus rows never shuffle
    first_exchange = p.find("Exchange")
    assert "HashAggregate" in p[first_exchange:], "no partial agg"


def test_lean_plan_is_much_smaller_than_full(spark, docs):
    full = ps.validate(docs, FLAGSHIP_SCHEMA if False else {
        "doc_id": ("required", "integer"),
        "text": ("required", ("string", ("min", 1))),
        "lang": ("enum", ["en", "es", "de", "fr", "zh"]),
    }, mode="permissive")
    lean = ps.validate(docs, {
        "doc_id": ("required", "integer"),
        "text": ("required", ("string", ("min", 1))),
        "lang": ("enum", ["en", "es", "de", "fr", "zh"]),
    }, mode="permissive", lean=True)
    assert len(optimized_of(lean.annotated)) < len(optimized_of(full.annotated))
    # counting consumers read the r6 integer twin column; selecting it
    # alone prunes the struct-array entirely — THAT projection must be
    # far smaller than the full tree (and contain no array/struct build)
    from peri_spark.engine import VIOLATIONS_COUNT_COLUMN
    cnt = optimized_of(lean.annotated.select(VIOLATIONS_COUNT_COLUMN))
    assert len(cnt) < len(optimized_of(full.annotated)) / 2
    assert "concat(" not in cnt


def test_fused_suite_actual_plan(spark, docs):
    """Assert the REAL fused grouped-aggregate plan (not a mirror):
    one scan, broadcast referential join, partial agg before the
    exchange, no Python, corpus columns absent from the shuffle."""
    from peri_spark.suite import ValidationSuite
    dim = docs.select("lang").dropDuplicates()
    suite = (ValidationSuite({"doc_id": ("required", "integer"),
                              "lang": ("enum", ["en", "es", "de", "fr"]),
                              "text": ("string", ("min", 1))},
                             mode="permissive")
             .with_referential("lang", dim, "lang", broadcast=True)
             .with_drift("length(text)", "source", lo=0.0, hi=4096.0,
                         buckets=16)
             .with_partitioning("source"))
    g, ref_flags, stat_types, fuse_stats = suite.fused_grouped_plan(docs)
    p = plan_of(g)
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "BroadcastHashJoin" in p            # ref dim never shuffles facts
    # map-side combine: a HashAggregate below the first Exchange
    first_exchange = p.find("Exchange")
    assert first_exchange > 0 and "HashAggregate" in p[first_exchange:]
    # only counters shuffle: the corpus text column must not appear in
    # any exchange output (it is consumed by the pre-agg projection)
    exchange_lines = [l for l in p.splitlines() if "Exchange" in l]
    assert exchange_lines and all("text" not in l for l in exchange_lines)


def test_lsh_pairs_plan_bucket_join_no_row_python(spark, docs):
    """MinHash-LSH candidate join: signatures via ONE Arrow-batched UDF
    (never row-at-a-time Python), candidates join on (band, band_hash)
    — no cartesian/nested-loop pairing, no corpus text in the join."""
    from peri_spark.functions import lsh_duplicate_pairs
    pairs = lsh_duplicate_pairs(docs, "text", "doc_id", threshold=0.8,
                                n_hashes=16, bands=4, max_bucket_size=100,
                                release=False)
    p = plan_of(pairs)
    assert "BatchEvalPython" not in p          # no per-row Python
    # r6: the signature stage is a MapInArrow operator (flat-buffer
    # numpy over the Arrow ListArray, no per-row pandas conversion)
    assert "MapInArrow" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "band_hash" in p                    # bucket-keyed equi-join
    # the pair join carries (band, band_hash, id) only — documents' text
    # is consumed by the signature projection, never joined
    join_region = p[p.find("Join"):]
    for l in join_region.splitlines():
        if "Join" in l:
            assert "text" not in l
    for c in pairs._peri_persisted:   # release=False hands ownership over
        c.unpersist()


def test_embedding_dups_plan_is_bucketed_equi_join(spark):
    from peri_spark.functions.dedup import embedding_duplicate_pairs
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    pairs = embedding_duplicate_pairs(emb, "embedding", "vec_id",
                                      threshold=0.95, planes=8)
    p = plan_of(pairs)
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "bucket" in p                       # hyperplane-bucket equi-join
    # r6: bucket bits + pair cosines are Arrow-vectorized numpy kernels
    # (exact-fold parity with the HOF formulation); never per-row Python
    assert "BatchEvalPython" not in p
    assert "ArrowEvalPython" in p


def test_ngram_jaccard_plan_hot_token_filter_broadcasts(spark, docs):
    from peri_spark.functions import ngram_jaccard_pairs
    pairs = ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.5,
                                max_candidates_per_token=200, release=False)
    p = plan_of(pairs)
    assert "BroadcastHashJoin" in p            # ok-token semi-filter
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    for c in pairs._peri_persisted:
        c.unpersist()


def test_ivf_topk_plan_broadcast_probe_no_python(spark):
    """IVF: cell assignment is a map-side pass (no shuffle of the
    corpus), the probe side broadcasts, candidates come from an
    equi-join on the cell id — never a cartesian pairing. r6: the
    assignment + re-rank kernels are Arrow-vectorized numpy (exact-fold
    parity with the JVM HOF formulation); never per-row Python."""
    from peri_spark.functions import ivf_topk, train_ivf_centroids
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cent = train_ivf_centroids(emb, "embedding", "vec_id", n_centroids=8,
                               train_limit=200)
    q = emb.limit(5)
    top = ivf_topk(emb, q, "embedding", "vec_id", cent, k=3, nprobe=2)
    p = plan_of(top)
    assert "BatchEvalPython" not in p
    assert "ArrowEvalPython" in p
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "cell" in p                        # cell-keyed equi-join


def test_brute_force_topk_uses_take_ordered(spark):
    from peri_spark.functions import cosine_topk_for_query
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = [0.1] * 64
    top = cosine_topk_for_query(emb, "embedding", "vec_id", q, k=5)
    assert "TakeOrderedAndProject" in plan_of(top)  # heap top-k, no full sort


def test_repetition_stats_zero_shuffle(spark, docs):
    """The Gopher repetition fold is per-document: it must stay a pure
    map stage (sort + sequential aggregate inside the row), never a
    corpus-wide explode+groupBy."""
    from peri_spark.functions import repetition_stats
    p = plan_of(repetition_stats(docs, "text", "doc_id", n=2))
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert p.count("Scan parquet") == 1


def test_dedup_chunks_reuses_chunk_exchange(spark, docs):
    """Chunk dedup at scale (broadcast disabled = the shape a corpus-
    sized chunk table forces): the explode+hash pass crosses the wire
    once — min-occurrence aggregate and join-back probe hang off ONE
    reused repartition exchange; no Window buffering hot boilerplate
    chunks."""
    from peri_spark.functions import dedup_chunks
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out = dedup_chunks(docs, "text", "doc_id", width=8)
        out.collect()
        final = plan_of(out)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "isFinalPlan=true" in final
    assert "ReusedExchange" in final
    assert "Window" not in final


def test_semantic_dedup_cell_equi_join_no_python(spark):
    """SemDeDup: map-side cell assignment, within-cell equi-join only —
    never a cartesian pairing, never Python in the plan."""
    from peri_spark.functions import semantic_dedup, train_ivf_centroids
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cent = train_ivf_centroids(emb, "embedding", "vec_id", n_centroids=8,
                               train_limit=200)
    out = semantic_dedup(emb, "embedding", "vec_id", cent, threshold=0.99)
    p = plan_of(out)
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
