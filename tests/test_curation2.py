"""Round-4 additions: repetition stats, sequence packing, chunk-level
exact-substring dedup, SemDeDup embedding-cluster dedup."""

import pytest
from pyspark.sql import functions as F

from peri_spark.functions import (dedup_chunks, pack_sequences,
                                  repetition_stats, semantic_dedup)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.01/documents.parquet")


# -- repetition_stats --------------------------------------------------------

def test_repetition_counts_and_top_gram(spark):
    df = spark.createDataFrame([(1, "a b a b a c")], ["doc_id", "text"])
    r = repetition_stats(df, "text", "doc_id", n=2).collect()[0]
    # grams: "a b","b a","a b","b a","a c" -> dup occurrences 4 of 5
    assert r.n_grams == 5
    assert r.dup_ngram_frac == pytest.approx(0.8)
    # tie between "a b" and "b a" (2 each) -> lexicographically smallest
    assert r.top_ngram == "a b"
    assert r.top_ngram_char_frac == pytest.approx(round(2 * 3 / 11, 6))


def test_repetition_no_repeats_and_short_doc(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "solo"), (3, None), (4, "   ")],
        ["doc_id", "text"])
    out = {r.id: r for r in
           repetition_stats(df, "text", "doc_id", n=2).collect()}
    assert set(out) == {1, 2}          # null/blank dropped
    assert out[1].dup_ngram_frac == 0.0 and out[1].n_grams == 2
    assert out[1].top_ngram == "alpha beta"   # first max run, sorted order
    # shorter than n words -> the single partial gram
    assert out[2].n_grams == 1 and out[2].top_ngram == "solo"
    assert out[2].top_ngram_char_frac == 1.0


def test_repetition_arrow_parity(spark, docs):
    """arrow=True must be row-identical to the JVM fold — same grams,
    same dup counts, same tie-breaks, same rounding — on real documents
    and on crafted edges (ties, partial gram, multi-space, blank)."""
    edge = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "x"), (3, "tie tie foo tie tie foo"),
         (4, "  z  "), (5, "w1  w2\tw1 w2"), (6, None), (7, "   "),
         # Spark trim strips 0x20 only: trailing \n / leading \t survive
         # and split yields empty edge tokens the arrow path must keep
         (8, "a b a b\n"), (9, "\tx y x y"), (10, "p q\r\n")],
        ["doc_id", "text"])
    for df in (docs, edge):
        hof = repetition_stats(df, "text", "doc_id", n=2)
        arr = repetition_stats(df, "text", "doc_id", n=2, arrow=True)
        assert arr.exceptAll(hof).count() == 0
        assert hof.exceptAll(arr).count() == 0


# -- pack_sequences ----------------------------------------------------------

def test_pack_sequences_single_stream_spans(spark):
    rows = [(i, 100) for i in range(1, 7)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tok"])
    out = {r.id: r for r in
           pack_sequences(df, "doc_id", "n_tok", budget=256,
                          n_buckets=1).collect()}
    assert [out[i].start_tok for i in range(1, 7)] == \
        [0, 100, 200, 300, 400, 500]
    # doc 3 straddles the first bin boundary (tokens 200..299)
    assert (out[3].start_bin, out[3].end_bin) == (0, 1)
    assert (out[1].start_bin, out[1].end_bin) == (0, 0)
    assert (out[6].start_bin, out[6].end_bin) == (1, 2)


def test_pack_sequences_deterministic_and_filters(spark):
    df = spark.createDataFrame(
        [(1, 50), (2, 0), (3, None), (4, 70)], ["doc_id", "n_tok"])
    a = sorted(pack_sequences(df, "doc_id", "n_tok", 64).collect())
    b = sorted(pack_sequences(df, "doc_id", "n_tok", 64).collect())
    assert a == b                      # pure function of (id, tokens)
    assert {r.id for r in a} == {1, 4}  # zero/null token rows occupy no tape
    with pytest.raises(ValueError):
        pack_sequences(df, "doc_id", "n_tok", 0)


def test_pack_sequences_streams_are_independent(spark):
    df = spark.createDataFrame([(i, 10) for i in range(200)],
                               ["doc_id", "n_tok"])
    out = pack_sequences(df, "doc_id", "n_tok", budget=50, n_buckets=4)
    rows = out.collect()
    assert {r.bucket for r in rows} == {0, 1, 2, 3}
    # within each stream offsets are the exclusive prefix sum by id
    for b in range(4):
        stream = sorted((r for r in rows if r.bucket == b),
                        key=lambda r: r.id)
        run = 0
        for r in stream:
            assert r.start_tok == run
            run += r.n_tokens


# -- dedup_chunks ------------------------------------------------------------

def test_dedup_chunks_cross_and_within_doc(spark):
    c1 = "w1 w2 w3 w4 w5 w6 w7 w8"
    c2 = "x1 x2 x3 x4 x5 x6 x7 x8"
    c3 = "y1 y2 y3 y4 y5 y6 y7 y8"
    df = spark.createDataFrame(
        [(1, f"{c1} {c2}"),            # first occurrence of both chunks
         (2, f"{c1} {c3}"),            # c1 is a cross-doc duplicate
         (3, f"{c3} {c3}")],           # within-doc duplicate of (2)'s c3
        ["doc_id", "text"])
    out = {r.id: r for r in
           dedup_chunks(df, "text", "doc_id", width=8).collect()}
    assert (out[1].n_chunks, out[1].n_kept) == (2, 2)
    assert out[1].text_clean == f"{c1} {c2}"
    assert (out[2].n_chunks, out[2].n_kept) == (2, 1)
    assert out[2].text_clean == c3      # kept chunk order preserved
    assert (out[3].n_chunks, out[3].n_kept) == (2, 0)
    assert out[3].text_clean == ""      # fully-duplicated doc empties


def test_dedup_chunks_partial_tail_chunk(spark):
    df = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
    r = dedup_chunks(df, "text", "doc_id", width=3).collect()[0]
    assert r.n_chunks == 2 and r.n_kept == 2   # "a b c" + partial "d e"
    assert r.text_clean == "a b c d e"


# -- semantic_dedup ----------------------------------------------------------

CENTROIDS_2D = [[1.0, 0.0], [0.0, 1.0]]


def test_semantic_dedup_drops_within_cell_neighbor(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.999, 0.01]), (3, [0.0, 1.0])],
        ["vec_id", "v"])
    out = {r.id: r.cell for r in
           semantic_dedup(df, "v", "vec_id", CENTROIDS_2D,
                          threshold=0.99).collect()}
    assert set(out) == {1, 3}          # 2 had a lower-id 0.99+ neighbor
    assert out[1] == 0 and out[3] == 1


def test_semantic_dedup_cell_cap_skips_oversized(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.999, 0.01]), (3, [0.0, 1.0])],
        ["vec_id", "v"])
    out = semantic_dedup(df, "v", "vec_id", CENTROIDS_2D,
                         threshold=0.99, max_cell_size=1).collect()
    # cell 0 holds 2 members > cap -> kept un-deduped rather than joined
    assert {r.id for r in out} == {1, 2, 3}


def test_semantic_dedup_cross_cell_neighbors_survive(spark):
    # near-identical pair split across cells is NOT deduped (the SemDeDup
    # trade: more centroids -> cheaper joins, border dups survive)
    df = spark.createDataFrame(
        [(1, [0.71, 0.70]), (2, [0.70, 0.71])], ["vec_id", "v"])
    out = semantic_dedup(df, "v", "vec_id", CENTROIDS_2D, threshold=0.9)
    assert {r.id for r in out.collect()} == {1, 2}


# -- shingles_arrow parity ----------------------------------------------------

def test_shingles_arrow_matches_jvm_portable(spark):
    """The Arrow shingle path must produce the IDENTICAL distinct hash
    sets as shingles(hash_fn=portable_hash64) — on real corpus text and
    on the edge shapes (short doc, weird whitespace, unicode, null)."""
    from peri_spark.functions.dedup import (portable_hash64, shingles,
                                            shingles_arrow)
    docs = (spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
            .limit(100)
            .union(spark.createDataFrame(
                [(9001, "one two", "en", "s", 7),
                 (9002, "  tab\tand\nnewline  spaced ", "en", "s", 9),
                 (9003, "Ünïcode Wörds Ünïcode Wörds more", "en", "s", 9),
                 (9004, None, "en", "s", 0),
                 # trailing \n / leading \t survive Spark trim (0x20
                 # only) and create empty edge tokens after split
                 (9005, "edge case one\n", "en", "s", 9),
                 (9006, "\tlead tab case here", "en", "s", 9)],
                ["doc_id", "text", "lang", "source", "n_chars"])))
    for words, k in [(True, 3), (False, 5)]:
        jvm = docs.select(
            "doc_id",
            F.array_sort(shingles(F.col("text"), k, words=words,
                                  hash_fn=portable_hash64)).alias("g"))
        arw = docs.select(
            "doc_id",
            F.array_sort(shingles_arrow(F.col("text"), k,
                                        words=words)).alias("g"))
        a = {r.doc_id: r.g for r in jvm.collect()}
        b = {r.doc_id: r.g for r in arw.collect()}
        # null text: JVM shingles yields [hash("")] (concat_ws swallows
        # the null slice); the Arrow twin returns null — the documented
        # contract, and every caller pre-filters null text. Parity is
        # asserted on the non-null domain.
        assert b.pop(9004) is None
        a.pop(9004)
        assert a == b, f"mismatch for words={words}, k={k}"


def test_contamination_arrow_path_same_result(spark):
    from peri_spark.functions import contamination_overlap
    docs = spark.read.parquet(
        "/root/testdata/sf0.01/documents.parquet").limit(150)
    bench = docs.where(F.col("doc_id") % 10 == 0)
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    base = contamination_overlap(corpus, bench, "text", "doc_id",
                                 n=3, threshold=0.2).collect()
    fast = contamination_overlap(corpus, bench, "text", "doc_id",
                                 n=3, threshold=0.2, arrow=True).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, fast))


# -- quality_filter -----------------------------------------------------------

def test_quality_filter_reasons_and_keep(spark):
    from peri_spark.functions import quality_filter
    good = " ".join(f"word{i} extra" for i in range(15))   # 30 tokens, varied
    dup = " ".join(["spam ham"] * 30)                       # repeated 2-grams
    digits = " ".join(["12345 67890"] * 15)                 # digit-heavy
    df = spark.createDataFrame(
        [(1, good), (2, dup), (3, digits), (4, ""), (5, None), (6, "tiny doc")],
        ["doc_id", "text"])
    out = {r.id: r for r in
           quality_filter(df, "text", "doc_id").collect()}
    assert out[1].keep and out[1].reasons == ""
    assert not out[2].keep and "high_dup_2gram" in out[2].reasons
    assert "low_distinct" in out[2].reasons
    assert not out[3].keep and "high_digit" in out[3].reasons
    assert "low_alpha" in out[3].reasons
    assert out[4].reasons == "empty" and not out[4].keep
    assert out[5].reasons == "empty" and not out[5].keep
    assert "too_few_tokens" in out[6].reasons
    # reasons follow rule order (audit trails diff cleanly)
    assert out[2].reasons.index("low_distinct") \
        < out[2].reasons.index("high_dup_2gram")


def test_quality_filter_custom_rules(spark):
    from peri_spark.functions import quality_filter
    df = spark.createDataFrame([(1, "one two three")], ["doc_id", "text"])
    strict = [("needs_five", "n_tokens", "lt", 5)]
    lax = [("needs_two", "n_tokens", "lt", 2)]
    assert not quality_filter(df, "text", "doc_id", strict).first().keep
    assert quality_filter(df, "text", "doc_id", lax).first().keep


def test_quality_filter_arrow_parity(spark, docs):
    from peri_spark.functions import quality_filter
    edge = spark.createDataFrame(
        [(1, "a b a b a b " * 50), (2, None), (3, "   "),
         (4, "x " * 30), (5, "1 2 3 " * 40),
         (6, ("u v " * 30) + "\n"), (7, "\t" + "m n m n " * 10)],
        ["doc_id", "text"])
    for df in (docs, edge):
        hof = quality_filter(df, "text", "doc_id")
        arr = quality_filter(df, "text", "doc_id", arrow=True)
        assert arr.exceptAll(hof).count() == 0
        assert hof.exceptAll(arr).count() == 0


# -- clean_lines --------------------------------------------------------------

def test_clean_lines_rules(spark):
    from peri_spark.functions import clean_lines
    text = "\n".join([
        "A proper first sentence.",     # kept
        "click here",                   # dropped: <3 words, no terminal
        "Enable JavaScript to win.",    # dropped: deny substring (ci)
        "no terminal punctuation here", # dropped: require_terminal
        "  Trailing spaces count too!  ",  # kept: trimmed before checks
        "",                             # dropped: empty
    ])
    df = spark.createDataFrame([(1, text)], ["id", "text"])
    r = clean_lines(df, "text").collect()[0]
    assert r.n_lines == 6 and r.n_kept == 2
    assert r.text_clean == ("A proper first sentence.\n"
                            "  Trailing spaces count too!  ")


def test_clean_lines_options(spark):
    from peri_spark.functions import clean_lines
    df = spark.createDataFrame(
        [(1, "one two\nthree four five")], ["id", "text"])
    # relax both knobs: everything survives
    r = clean_lines(df, "text", min_words=2, require_terminal=False,
                    deny_substrings=()).collect()[0]
    assert r.n_kept == 2
    r = clean_lines(df, "text", min_words=3,
                    require_terminal=False).collect()[0]
    assert r.n_kept == 1
    with pytest.raises(ValueError):
        clean_lines(df, "text", min_words=-1)


def test_clean_lines_null_and_empty(spark):
    from peri_spark.functions import clean_lines
    df = spark.createDataFrame([(1, None), (2, "")], "id long, text string")
    out = {r.id: r for r in clean_lines(df, "text").collect()}
    assert out[1].text_clean is None and out[1].n_lines is None
    assert out[2].text_clean == "" and out[2].n_lines == 1 \
        and out[2].n_kept == 0


def test_clean_lines_zero_shuffle(spark):
    from peri_spark.functions import clean_lines
    df = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    plan = clean_lines(df, "text")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


# -- weighted_mix mode="up" ---------------------------------------------------

def test_upsample_mix_epochs_and_copies(docs):
    from peri_spark.functions import weighted_mix
    base = {r["lang"]: r["count"] for r in
            docs.groupBy("lang").count().collect()}
    out = weighted_mix(docs, "lang", {"en": 1.0, "zh": 4.0}, "doc_id",
                       mode="up")
    got = {r["lang"]: r["count"] for r in
           out.groupBy("lang").count().collect()}
    assert set(got) == {"en", "zh"}
    # the min-ratio anchor keeps every row at least once
    assert got["en"] >= base["en"] and got["zh"] >= base["zh"]
    # OUTPUT proportions track the weights (zh:en = 4:1); per-source
    # epochs are rate = (w/n)/min(w/n), so the zh epoch count exceeds
    # en's by 4 * n_en/n_zh (hash-coin tolerance on both)
    assert got["zh"] / got["en"] == pytest.approx(4.0, rel=0.15)
    zh_ep, en_ep = got["zh"] / base["zh"], got["en"] / base["en"]
    assert zh_ep / en_ep == pytest.approx(4.0 * base["en"] / base["zh"],
                                          rel=0.15)
    # copies are numbered 0..c-1 per doc: max copy == per-doc count - 1
    per_doc = (out.groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("c"), F.max("copy").alias("m"),
                    F.min("copy").alias("lo")).collect())
    assert all(r["m"] == r["c"] - 1 and r["lo"] == 0 for r in per_doc)


def test_upsample_mix_no_row_dropped_and_deterministic(docs):
    from peri_spark.functions import weighted_mix
    out = weighted_mix(docs, "lang", {"en": 1.0, "de": 2.0}, "doc_id",
                       mode="up")
    kept_ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    orig = {r["doc_id"] for r in
            docs.where(F.col("lang").isin("en", "de"))
                .select("doc_id").collect()}
    assert kept_ids == orig          # mode=up never drops a listed row
    again = weighted_mix(docs, "lang", {"en": 1.0, "de": 2.0}, "doc_id",
                         mode="up")
    assert sorted((r["doc_id"], r["copy"]) for r in again.collect()) == \
        sorted((r["doc_id"], r["copy"]) for r in out.collect())


def test_weighted_mix_rejects_bad_mode(docs):
    from peri_spark.functions import weighted_mix
    with pytest.raises(ValueError):
        weighted_mix(docs, "lang", {"en": 1.0}, "doc_id", mode="sideways")


def test_clean_lines_crlf_and_vtab_portability(spark):
    # review findings: Java '$' matches before a trailing \r (CRLF
    # corpora) and Java \s includes \x0B where RE2's does not — the
    # operator must use \z and an explicit word class so the DuckDB
    # oracle agrees
    from peri_spark.functions import clean_lines
    df = spark.createDataFrame(
        [(1, "Good line number one.\r\nGood line number two."),
         (2, "aa\x0bbb cc dd.")],
        ["id", "text"])
    out = {r.id: r for r in clean_lines(df, "text").collect()}
    # line 1 of doc 1 ends in '\r' after the \n split -> NOT terminal
    assert out[1].n_kept == 1
    assert "\r" not in out[1].text_clean
    # \x0B is a word separator in Java but not RE2: with the explicit
    # class it must NOT split — 3 words ("aa\x0bbb", "cc", "dd.") keep
    assert out[2].n_kept == 1
    import duckdb
    con = duckdb.connect()
    ora = con.execute(r"""
      SELECT len(list_filter(string_split(s, chr(10)), x ->
        len(regexp_extract_all(trim(x), '[^ \t\n\x0B\f\r]+')) >= 3
        AND regexp_matches(trim(x), '[.!?"]\z')))
      FROM (VALUES ('Good line number one.' || chr(13) || chr(10)
                    || 'Good line number two.'),
                   ('aa' || chr(11) || 'bb cc dd.')) AS t(s)
    """).fetchall()
    assert [r[0] for r in ora] == [out[1].n_kept, out[2].n_kept]


# -- normalize_text -----------------------------------------------------------

def test_normalize_text_nfc_control_ws(spark):
    from peri_spark.functions import normalize_text
    df = spark.createDataFrame(
        [(1, "  école\tde \x07bell\x0bpage  "),
         (2, None),
         (3, "a  b")],
        "id long, text string")
    out = {r.id: r.text_norm for r in
           normalize_text(df, "text").collect()}
    # decomposed e+U+0301 -> precomposed é; BEL stripped; vertical tab
    # is whitespace -> single space; runs collapse; ends trim
    assert out[1] == "école de bell page"
    assert out[2] is None
    assert out[3] == "a b"


def test_normalize_text_options(spark):
    from peri_spark.functions import normalize_text
    import pytest as _pytest
    df = spark.createDataFrame([(1, "ﬁne  Stuff")],
                               "id long, text string")
    # NFKC folds the fi ligature; lower applies last
    r = normalize_text(df, "text", form="NFKC", lower=True).collect()[0]
    assert r.text_norm == "fine stuff"
    # form=None skips the Arrow step entirely: plan must be pure JVM
    jvm = normalize_text(df, "text", form=None)
    plan = jvm._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert jvm.collect()[0].text_norm == "ﬁne Stuff"
    with _pytest.raises(ValueError):
        normalize_text(df, "text", form="NFX")


# -- sample_k_per_group -------------------------------------------------------

def test_sample_k_exact_counts_and_deterministic(docs):
    from peri_spark.functions import sample_k_per_group
    base = {r["lang"]: r["count"] for r in
            docs.groupBy("lang").count().collect()}
    out = sample_k_per_group(docs, "lang", 7, "doc_id")
    got = {r["lang"]: r["count"] for r in
           out.groupBy("lang").count().collect()}
    # exactly min(k, n_g) per group — never binomial
    assert got == {g: min(7, n) for g, n in base.items()}
    again = sample_k_per_group(docs, "lang", 7, "doc_id")
    assert sorted(r["doc_id"] for r in again.collect()) == \
        sorted(r["doc_id"] for r in out.collect())
    # different seed -> (almost surely) different picks, same counts
    other = sample_k_per_group(docs, "lang", 7, "doc_id", seed=7)
    assert sorted(r["doc_id"] for r in other.collect()) != \
        sorted(r["doc_id"] for r in out.collect())
    with pytest.raises(ValueError):
        sample_k_per_group(docs, "lang", 0, "doc_id")


def test_cluster_safe_split_members_share_split(spark):
    from peri_spark.functions import cluster_safe_split
    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(20)], ["doc_id", "text"])
    # clusters: {0,1,2} -> 0 and {7,8} -> 7; rest singletons
    labels = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (7, 7), (8, 7)], ["id", "cluster_id"])
    out = cluster_safe_split(df, "doc_id", labels,
                             {"train": 0.5, "test": 0.5})
    got = {r["doc_id"]: r["split"] for r in out.collect()}
    assert len(got) == 20 and all(v in ("train", "test")
                                  for v in got.values())
    # every cluster member agrees with its canonical
    assert got[0] == got[1] == got[2]
    assert got[7] == got[8]
    # singletons key on their own id == plain hash_split of the id
    from peri_spark.functions import hash_split
    plain = {r["doc_id"]: r["split"] for r in hash_split(
        df, "doc_id", {"train": 0.5, "test": 0.5}).collect()}
    for i in (3, 4, 5, 6, 9, 10):
        assert got[i] == plain[i]


def test_sample_k_null_keys_dropped_and_guards(spark):
    from peri_spark.functions import cluster_safe_split, sample_k_per_group
    df = spark.createDataFrame(
        [(1, "g"), (None, "g"), (2, "g"), (None, "g")],
        "doc_id long, grp string")
    out = sample_k_per_group(df, "grp", 3, "doc_id").collect()
    # null keys never win slots (NULL coin would sort NULLS FIRST in
    # Spark but NULLS LAST in the oracle, and tie nondeterministically)
    assert sorted(r["doc_id"] for r in out) == [1, 2]
    with pytest.raises(ValueError):
        sample_k_per_group(df.withColumn("__coin", F.lit(1)),
                           "grp", 1, "doc_id")
    labels = spark.createDataFrame([(1, 1)], ["id", "cluster_id"])
    with pytest.raises(ValueError):
        cluster_safe_split(df.withColumn("__skey", F.lit(1)),
                           "doc_id", labels, {"train": 1.0})
