"""Training-data ops: dedup / similarity / textstats / multimodal."""

import pytest
from pyspark.sql import Row, functions as F

from peri_spark.functions import (
    brute_force_topk, cosine_topk_for_query, embedding_duplicate_pairs,
    exact_duplicates, hyperplane_lsh_topk, language_id, lsh_duplicate_pairs,
    minhash_signatures, ngram_jaccard_pairs, quality_scores,
    simhash_signatures, token_counts, winnow_fingerprints)
from peri_spark.functions.multimodal import (attach_media_metadata,
                                             decode_features_stub,
                                             frame_sample_stub, resize_stub)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_exact_duplicates(spark):
    df = spark.createDataFrame(
        [(1, "aaa"), (2, "bbb"), (3, "aaa"), (4, "aaa")], "id long, t string")
    pairs = exact_duplicates(df, "t", "id").collect()
    assert {(r.canonical_id, r.dup_id) for r in pairs} == {(1, 3), (1, 4)}


def test_minhash_signature_properties(spark, docs):
    sigs = minhash_signatures(docs.limit(20), "text", "doc_id", n_hashes=16)
    rows = sigs.collect()
    assert all(len(r.sig) == 16 for r in rows)
    # deterministic across invocations
    rows2 = minhash_signatures(docs.limit(20), "text", "doc_id",
                               n_hashes=16).collect()
    assert sorted(map(str, rows)) == sorted(map(str, rows2))


def test_lsh_finds_planted_near_duplicates(spark, docs):
    base = docs.limit(30).select("doc_id", "text")
    # plant: doc_id+10000 is doc with one word appended (near-dup)
    mutated = base.select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat("text", F.lit(" extraword")).alias("text"))
    corpus = base.unionByName(mutated)
    pairs = lsh_duplicate_pairs(corpus, "text", "doc_id",
                                threshold=0.5, n_hashes=64, bands=16)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    planted = {(int(r.doc_id), int(r.doc_id) + 10000) for r in base.collect()}
    assert len(got & planted) >= len(planted) * 0.9  # ≥90% recall


def test_ngram_jaccard_pairs(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy cat"),
         (3, "completely different words entirely unrelated text")],
        "id long, t string")
    pairs = ngram_jaccard_pairs(df, "t", "id", threshold=0.4, k=3).collect()
    assert [(r.id_a, r.id_b) for r in pairs] == [(1, 2)]


def test_simhash_close_for_near_dups(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta"),
         (2, "alpha beta gamma delta epsilon zeta eta iota"),
         (3, "one two three four five six seven eight")],
        "id long, t string")
    sig = {r.id: r.simhash for r in simhash_signatures(df, "t", "id").collect()}
    ham = lambda a, b: bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
    assert ham(sig[1], sig[2]) < ham(sig[1], sig[3])


def test_cosine_topk_for_query(spark, emb):
    q = emb.where(F.col("vec_id") == 0).collect()[0].embedding
    top = cosine_topk_for_query(emb, "embedding", "vec_id", q, k=5).collect()
    assert top[0].id == 0 and abs(top[0].cosine - 1.0) < 1e-5
    assert len(top) == 5
    assert all(top[i].cosine >= top[i + 1].cosine for i in range(4))


def test_brute_force_topk(spark, emb):
    queries = emb.where(F.col("vec_id") < 3)
    r = brute_force_topk(emb, queries, "embedding", "vec_id", k=3)
    rows = r.collect()
    assert len(rows) == 9
    firsts = {x.query_id: x.id for x in rows if x.rank == 1}
    assert firsts == {0: 0, 1: 1, 2: 2}  # self is nearest


def test_hyperplane_lsh_recall(spark, emb):
    queries = emb.where(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, queries, "embedding", "vec_id", k=1)
    approx = hyperplane_lsh_topk(emb, queries, "embedding", "vec_id",
                                 k=1, planes=6, multiprobe=3)
    e = {r.query_id: r.id for r in exact.collect()}
    a = {r.query_id: r.id for r in approx.collect()}
    # self-match must always be retrieved (same bucket by construction)
    assert sum(a.get(q) == e[q] for q in e) >= 9


def test_ivf_topk_recall_and_determinism(spark, emb):
    from peri_spark.functions import (brute_force_topk, ivf_topk,
                                      train_ivf_centroids)
    cent = train_ivf_centroids(emb, "embedding", "vec_id", n_centroids=8,
                               train_limit=200)
    cent2 = train_ivf_centroids(emb, "embedding", "vec_id", n_centroids=8,
                                train_limit=200)
    assert cent == cent2                      # fully deterministic training
    q = emb.where(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, q, "embedding", "vec_id", k=1)
    approx = ivf_topk(emb, q, "embedding", "vec_id", cent, k=1, nprobe=3)
    e = {r.query_id: r.id for r in exact.collect()}
    a = {r.query_id: r.id for r in approx.collect()}
    # self is always retrieved: a query's own cell is its nearest cell
    assert sum(a.get(i) == e[i] for i in e) == 10


def test_ivf_training_paths_agree(spark, emb):
    """The Spark training sample (lowest train_limit ids via TakeOrdered)
    and the pyarrow path the oracle uses must produce identical
    centroids — otherwise queries() and oracle_sql() could drift."""
    import sys
    sys.path.insert(0, "/root/repo")
    from __spark_entry__ import _ivf_centroids_from_parquet
    from peri_spark.functions import train_ivf_centroids
    a = train_ivf_centroids(emb, "embedding", "vec_id", n_centroids=16,
                            train_limit=512)
    b = _ivf_centroids_from_parquet(f"{SF}/embeddings.parquet",
                                    n_train=512, n_centroids=16)
    assert a == b


def test_embedding_duplicate_pairs_selfdup(spark, emb):
    doubled = emb.unionByName(
        emb.select((F.col("vec_id") + 1000).alias("vec_id"),
                   "embedding", "label"))
    pairs = embedding_duplicate_pairs(doubled.limit(0).unionByName(doubled),
                                      "embedding", "vec_id",
                                      threshold=0.999, planes=8)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert all((v, v + 1000) in got for v in range(20))


def test_embedding_dups_hot_bucket_cap(spark):
    """10k identical vectors land in ONE hyperplane bucket — uncapped
    that is a 50M-pair self-join; the cap drops the degenerate bucket,
    reports it, and the job completes with bounded output (VERDICT r02
    what's-wrong #1, same guard as lsh_duplicate_pairs)."""
    n = 10_000
    const = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(0.5)] * 8).alias("embedding"))
    dropped = {}
    pairs = embedding_duplicate_pairs(const, "embedding", "vec_id",
                                      threshold=0.9, planes=8,
                                      max_bucket_size=100,
                                      dropped_counter=dropped)
    assert pairs.count() == 0
    assert dropped["n_hot_buckets"] == 1
    assert dropped["n_dropped_rows"] == n
    # capped buckets are EXCLUDED from the join, not truncated into it:
    # total candidate rows from a dropped bucket is zero by construction
    opt = pairs._jdf.queryExecution().optimizedPlan().toString()
    assert "CartesianProduct" not in opt


def test_embedding_dups_cap_keeps_normal_buckets(spark, emb):
    doubled = emb.unionByName(
        emb.select((F.col("vec_id") + 1000).alias("vec_id"),
                   "embedding", "label"))
    pairs = embedding_duplicate_pairs(doubled, "embedding", "vec_id",
                                      threshold=0.999, planes=8,
                                      max_bucket_size=1000)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert all((v, v + 1000) in got for v in range(20))


def test_lsh_pipelines_release_executor_storage(spark, docs):
    """VERDICT r02 missing #4: after the dedup pipelines run with the
    default release=True, no persisted RDD blocks may remain in the
    session (long-lived sessions running many passes must not leak)."""
    jsc = spark.sparkContext._jsc
    base = docs.limit(40).select("doc_id", "text")
    before = jsc.getPersistentRDDs().size()
    p1 = lsh_duplicate_pairs(base, "text", "doc_id", threshold=0.5,
                             n_hashes=16, bands=4)
    p2 = ngram_jaccard_pairs(base, "text", "doc_id", threshold=0.4, k=3)
    assert p1.count() >= 0 and p2.count() >= 0
    # the only blocks allowed to remain are the two (small, pair-count-
    # bounded) localCheckpoint results themselves — the signature and
    # shingle corpus caches must be unpersisted immediately, not
    # accumulate across passes
    after = jsc.getPersistentRDDs().size()
    assert after - before <= 2


def test_language_id(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog went to the park"),
         (2, "el perro y la casa de la playa es bonita"),
         (3, "der hund und die katze ist ein tier")],
        "id long, t string")
    out = {r.id: r.lang_pred for r in language_id(df, "t", "id").collect()}
    assert out == {1: "en", 2: "es", 3: "de"}


def test_quality_scores(spark, docs):
    q = quality_scores(docs.limit(5), "text", "doc_id")
    r = q.collect()[0]
    assert 0 <= r.alpha_ratio <= 1 and 0 <= r.distinct_token_ratio <= 1
    assert r.n_tokens > 0 and r.avg_token_len > 0


def test_token_counts_bpe(spark):
    df = spark.createDataFrame([(1, "hello world, it's 42 here")],
                               "id long, t string")
    r = token_counts(df, "t", "id", bpe_like=True).collect()[0]
    assert r.n_tokens_ws == 5
    # hello|world|,|it|'|s|4|2|here
    assert r.n_tokens_bpe_like == 9


def test_winnow_fingerprints_overlap(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "prefix words the quick brown fox jumps over the lazy dog"),
         (3, "zzz yyy xxx www vvv uuu ttt sss")],
        "id long, t string")
    fp = {r.id: set(r.fingerprints)
          for r in winnow_fingerprints(df, "t", "id").collect()}
    assert len(fp[1] & fp[2]) > 0
    assert len(fp[1] & fp[3]) == 0


def test_multimodal_stub_pipeline(spark):
    rows = [(i, "image", bytes([i % 256] * 100 + [7]),
             ("image/png", 8, 8, None)) for i in range(6)]
    rows.append((99, "image", None, ("image/png", 8, 8, None)))
    df = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, "
              "meta struct<mime:string,width:int,height:int,duration_ms:long>")
    md = attach_media_metadata(df)
    assert md.where("payload_bytes = 101").count() == 6
    feats = decode_features_stub(md, "payload", "media_id").collect()
    ok = [r for r in feats if r.error is None]
    bad = [r for r in feats if r.error is not None]
    assert len(ok) == 6 and len(bad) == 1  # null payload captured, not fatal
    assert all(len(r.features) == 8 and abs(sum(r.features) - 1.0) < 1e-3
               for r in ok)


def test_resize_stub(spark):
    rows = [(1, "image", bytes(range(200)) * 5, ("image/png", 100, 80, None)),
            (2, "image", b"tiny", ("image/png", 10, 10, None)),
            (3, "image", None, ("image/png", 8, 8, None)),       # null payload
            (4, "image", b"x" * 64, ("image/png", None, None, None))]  # no dims
    df = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, "
              "meta struct<mime:string,width:int,height:int,duration_ms:long>")
    out = {r.media_id: r for r in resize_stub(df, 50, 50).collect()}
    # aspect preserved, fit inside 50x50: 100x80 → 50x40
    assert (out[1].width, out[1].height) == (50, 40)
    # byte budget proportional to target/source area: 1000 * (2000/8000)
    assert len(out[1].payload) == 250
    # never upscale: 10x10 stays 10x10, payload untouched
    assert (out[2].width, out[2].height) == (10, 10)
    assert bytes(out[2].payload) == b"tiny"
    # per-row error capture, batch survives
    assert out[3].error is not None and out[3].payload is None
    assert out[4].error is not None and "dims" in out[4].error


def test_frame_sample_stub(spark):
    df = spark.createDataFrame(
        [(1, "video", None, (None, None, None, 3500))],
        "media_id long, kind string, payload binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:long>")
    frames = frame_sample_stub(df, every_ms=1000).collect()
    assert [f.frame_ms for f in frames] == [0, 1000, 2000, 3000]


def test_near_dup_clusters_components_and_dedup(spark):
    from peri_spark.functions import near_dup_clusters, deduplicate_by_clusters

    # two components: a 3-clique {1,2,3} and a CHAIN 10-11-12-13 (worst
    # case for label propagation: needs diameter rounds), plus pair {20,21}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (12, 13), (20, 21)],
        "id_a long, id_b long")
    got = {r["id"]: r["cluster_id"]
           for r in near_dup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 13: 10,
                   20: 20, 21: 20}

    corpus = spark.createDataFrame([(i,) for i in
                                    [1, 2, 3, 10, 11, 12, 13, 20, 21, 99]],
                                   "doc long")
    kept = sorted(r["doc"] for r in deduplicate_by_clusters(
        corpus, "doc", near_dup_clusters(pairs)).collect())
    # one survivor per component + untouched singleton 99
    assert kept == [1, 10, 20, 99]


def test_near_dup_clusters_max_iter_partial_refinement(spark):
    from peri_spark.functions import near_dup_clusters

    # a long chain with max_iter=1 yields a valid partial refinement
    # (labels only ever decrease toward the component min)
    pairs = spark.createDataFrame([(i, i + 1) for i in range(30, 40)],
                                  "id_a long, id_b long")
    full = {r["id"]: r["cluster_id"]
            for r in near_dup_clusters(pairs).collect()}
    assert set(full.values()) == {30}
    part = {r["id"]: r["cluster_id"]
            for r in near_dup_clusters(pairs, max_iter=1).collect()}
    assert all(part[i] >= full[i] for i in part) and part[31] == 30


# -- vocabulary / unigram_logprob ---------------------------------------------

def test_vocabulary_counts_docfreq_rank(spark):
    from peri_spark.functions import vocabulary
    df = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the dog sat"),
         (3, None), (4, "   ")], ["doc_id", "text"])
    v = {r.token: r for r in vocabulary(df, "text", "doc_id").collect()}
    assert v["the"]["count"] == 3 and v["the"].doc_freq == 2
    assert v["sat"]["count"] == 2 and v["sat"].doc_freq == 2
    assert v["the"].rank == 1 and v["sat"].rank == 2
    # count ties rank by token ascending — deterministic
    singles = [t for t in v if v[t]["count"] == 1]
    ranks = [v[t].rank for t in sorted(singles)]
    assert ranks == sorted(ranks)
    # min_count / top_k truncation
    assert {r.token for r in
            vocabulary(df, "text", "doc_id", min_count=2).collect()} == \
        {"the", "sat"}
    top = vocabulary(df, "text", "doc_id", top_k=2).collect()
    assert [(r.token, r.rank) for r in
            sorted(top, key=lambda r: r.rank)] == [("the", 1), ("sat", 2)]


def test_unigram_logprob_oov_and_reference_vocab(spark):
    import math
    from peri_spark.functions import unigram_logprob, vocabulary
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a z")], ["doc_id", "text"])
    # top_k=1 keeps only "a" (count 3); total=5, V=1, denom=5+1*2=7
    out = {r.id: r for r in
           unigram_logprob(df, "text", "doc_id", top_k=1).collect()}
    pa, poov = 4 / 7, 1 / 7
    assert out[1].logprob == round((2 * math.log(pa) + math.log(poov)) / 3, 6)
    assert out[2].logprob == round((math.log(pa) + math.log(poov)) / 2, 6)
    assert out[1].n_tokens == 3 and out[2].n_tokens == 2
    # an external reference vocabulary scores a different corpus: the
    # smoothing total must come from the REFERENCE counts (a large
    # reference over a small target must never yield p > 1 / logprob > 0)
    big_ref = spark.createDataFrame(
        [(i, "common " * 500) for i in range(20)], ["doc_id", "text"])
    ref = vocabulary(big_ref, "text", "doc_id", top_k=4)
    other = spark.createDataFrame([(9, "common rare")], ["doc_id", "text"])
    r9 = unigram_logprob(other, "text", "doc_id", vocab=ref).collect()[0]
    assert r9.n_tokens == 2 and r9.logprob < 0
    # reference mass total=10000 ('common' x500 x20 docs), V=1 distinct
    # -> denom = 10000 + 1*(1+1); p(common)=10001/denom, p(rare)=1/denom
    denom = 10002.0
    want = round((math.log(10001 / denom) + math.log(1 / denom)) / 2, 6)
    assert r9.logprob == want


def test_bm25_empty_corpus_returns_no_hits(spark):
    from peri_spark.functions import bm25_topk
    df = spark.createDataFrame([(1, None), (2, "   ")], ["doc_id", "text"])
    out = bm25_topk(df, "text", "doc_id", "anything", k=5)
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == ["id", "score", "n_hit"]


def test_unigram_vocab_join_is_broadcast(spark, docs):
    from peri_spark.functions import unigram_logprob
    df = unigram_logprob(docs, "text", "doc_id", top_k=20)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bm25_formula_and_ranking(spark):
    import math
    from peri_spark.functions import bm25_topk
    df = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry"),
         (3, "apple apple apple apple"), (4, None)], ["doc_id", "text"])
    out = bm25_topk(df, "text", "doc_id", "apple cherry", k=10).collect()
    # N=3, avgdl=3, df(apple)=2, df(cherry)=1
    idf_a = math.log((3 - 2 + 0.5) / 2.5 + 1)
    idf_c = math.log((3 - 1 + 0.5) / 1.5 + 1)

    def w(tf, dl, idf):
        return idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 3.0))

    expect = {1: round(w(2, 3, idf_a), 6), 2: round(w(1, 2, idf_c), 6),
              3: round(w(4, 4, idf_a), 6)}
    assert [r.id for r in out] == sorted(expect, key=lambda i: -expect[i])
    assert {r.id: r.score for r in out} == expect
    assert all(r.n_hit == 1 for r in out)


def test_bm25_topk_cut_and_errors(spark, docs):
    import pytest as _pytest
    from peri_spark.functions import bm25_topk
    top3 = bm25_topk(docs, "text", "doc_id", "scan window", k=3).collect()
    top9 = bm25_topk(docs, "text", "doc_id", "scan window", k=9).collect()
    assert [(r.id, r.score) for r in top3] == \
        [(r.id, r.score) for r in top9[:3]]
    assert len(top9) == 9
    # scores non-increasing, id ascending within equal scores
    pairs = [(r.score, r.id) for r in top9]
    assert pairs == sorted(pairs, key=lambda p: (-p[0], p[1]))
    with _pytest.raises(ValueError):
        bm25_topk(docs, "text", "doc_id", "   ")


def test_winnow_arrow_parity_and_errors(spark, docs):
    import pytest as _pytest
    from peri_spark.functions import winnow_fingerprints
    from peri_spark.functions.dedup import portable_hash64
    edge = spark.createDataFrame(
        [(1, "abcdefghij" * 5), (2, "short"), (3, ""), (4, None),
         (5, "AbC dEf\nGhI\t"), (6, "xxxxxxxxxxxxxxxx")],
        ["doc_id", "text"])
    for df in (docs.limit(60), edge):
        jvm = winnow_fingerprints(df, "text", "doc_id",
                                  hash_fn=portable_hash64)
        arw = winnow_fingerprints(df, "text", "doc_id", arrow=True)
        a = {r.id: r.fingerprints for r in jvm.collect()}
        b = {r.id: r.fingerprints for r in arw.collect()}
        assert a == b
    with _pytest.raises(ValueError):
        from pyspark.sql import functions as SF
        winnow_fingerprints(edge, "text", "doc_id", hash_fn=SF.xxhash64,
                            arrow=True)


# -- encode_tokens ------------------------------------------------------------

def test_encode_tokens_ids_and_oov(spark):
    from peri_spark.functions import encode_tokens, vocabulary
    df = spark.createDataFrame(
        [(1, "b a b c"), (2, "a zz B"), (3, None), (4, "   ")],
        ["doc_id", "text"])
    voc = vocabulary(df, "text", "doc_id", top_k=2)
    # counts: b=3, a=2, c=1, zz=1 -> vocab {b:1, a:2}; c/zz are OOV
    out = {r["id"]: (list(r["token_ids"]), r["n_tokens"]) for r in
           encode_tokens(df, "text", "doc_id", voc).collect()}
    assert out == {1: ([1, 2, 1, 0], 4), 2: ([2, 0, 1], 3)}
    # custom unk id
    custom = {r["id"]: list(r["token_ids"]) for r in
              encode_tokens(df, "text", "doc_id", voc,
                            unk_id=-1).collect()}
    assert custom[2] == [2, -1, 1]


def test_encode_tokens_paths_bit_identical(spark):
    from peri_spark.functions import encode_tokens, vocabulary
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    voc = vocabulary(docs, "text", "doc_id", top_k=10)
    key = lambda r: (r["id"], tuple(r["token_ids"]), r["n_tokens"])
    a = sorted(map(key, encode_tokens(docs, "text", "doc_id", voc,
                                      arrow=True).collect()))
    j = sorted(map(key, encode_tokens(docs, "text", "doc_id", voc,
                                      arrow=False).collect()))
    assert a == j and len(a) == 500


def test_encode_tokens_arrow_zero_shuffle(spark):
    from peri_spark.functions import encode_tokens, vocabulary
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    voc = vocabulary(docs, "text", "doc_id", top_k=10)
    plan = encode_tokens(docs, "text", "doc_id", voc)._jdf \
        .queryExecution().executedPlan().toString()
    # the encode itself is map-side: the only work after the scan is
    # the Arrow eval — no Exchange anywhere in the executed plan
    assert "Exchange" not in plan and "ArrowEvalPython" in plan


def test_encode_tokens_jvm_path_duplicate_ids(spark):
    # review finding: groupBy(id) alone interleaved rows sharing an id
    from peri_spark.functions import encode_tokens, vocabulary
    df = spark.createDataFrame(
        [(1, "a b"), (1, "b b"), (2, "a")], ["doc_id", "text"])
    voc = vocabulary(df, "text", "doc_id")  # b=3 -> rank 1, a=2 -> rank 2
    out = sorted((r["id"], tuple(r["token_ids"])) for r in
                 encode_tokens(df, "text", "doc_id", voc,
                               arrow=False).collect())
    assert out == [(1, (1, 1)), (1, (2, 1)), (2, (2,))]


def test_public_module_all_lists_are_real_names():
    # ADVICE r4: a missing comma in an __all__ silently fused two
    # entries ('portable_hash64repo_overlap_pairs') and broke
    # star-imports. Assert every __all__ name exists in its module,
    # across every peri_spark (sub)module that declares one.
    import importlib
    import pkgutil

    import peri_spark

    mods = ["peri_spark"]
    for pkg in pkgutil.walk_packages(peri_spark.__path__, "peri_spark."):
        mods.append(pkg.name)
    checked = 0
    for name in mods:
        mod = importlib.import_module(name)
        exported = getattr(mod, "__all__", None)
        if exported is None:
            continue
        missing = [n for n in exported if not hasattr(mod, n)]
        assert not missing, f"{name}.__all__ names missing: {missing}"
        checked += 1
    assert checked >= 10  # the guard actually covered the tree


def test_encode_tokens_enforces_vocab_bound(spark):
    """VERDICT r04 #6: an unbounded vocab must not silently collect to
    the driver dict; oracle behavior under the bound is unchanged."""
    import pytest
    from peri_spark.functions import encode_tokens, vocabulary
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "d e f")], ["doc_id", "text"])
    voc = vocabulary(df, "text", "doc_id")  # 6 tokens, no top_k
    with pytest.raises(ValueError, match="max_vocab_size"):
        encode_tokens(df, "text", "doc_id", voc, max_vocab_size=5)
    out = encode_tokens(df, "text", "doc_id", voc, max_vocab_size=6)
    assert out.count() == 2
