"""BPE trainer + encoder: deterministic merges, hand-checked corpus."""

import pytest

from peri_spark.functions.bpe import (EOW, bpe_encode, bpe_encode_word,
                                      train_bpe_merges)


def test_merges_hand_checked():
    # classic Sennrich toy corpus
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = train_bpe_merges(wc, n_merges=4)
    # pair counts round 1: ('e','s') 9, ('s','t') 9, ('t','</w>') 9 ...
    # tie on 9 breaks lexicographically: ('e','s') first
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", EOW)
    assert merges[3] == ("l", "o")


def test_encoding_follows_merge_ranks():
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = train_bpe_merges(wc, n_merges=3)   # up to ('est','</w>')
    ranks = {p: i for i, p in enumerate(merges)}
    assert bpe_encode_word("newest", ranks)[-1] == "est" + EOW
    assert bpe_encode_word("widest", ranks)[-1] == "est" + EOW
    assert "".join(bpe_encode_word("newest", ranks)) == "newest" + EOW
    # more merges eventually fuse the frequent word whole
    full = train_bpe_merges(wc, n_merges=10)
    franks = {p: i for i, p in enumerate(full)}
    assert bpe_encode_word("newest", franks) == ["newest" + EOW]
    # unseen word still round-trips through characters
    assert "".join(bpe_encode_word("zzz", franks)) == "zzz" + EOW


def test_determinism_and_early_stop():
    wc = {"ab": 3, "cd": 1}
    m1 = train_bpe_merges(wc, n_merges=100)
    m2 = train_bpe_merges(dict(reversed(list(wc.items()))), n_merges=100)
    assert m1 == m2                       # insertion order irrelevant
    # min_pair_count=2 stops before memorizing the singleton 'cd'
    flat = {"".join(p) for p in m1}
    assert not any("cd" in s for s in flat)


def test_train_from_vocabulary_frame_and_encode_spark(spark):
    docs = [(1, "the lowest price the newest price"),
            (2, "newest lowest widest"),
            (3, None), (4, "   ")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    from peri_spark.functions import vocabulary
    voc = vocabulary(df, "text", "doc_id")
    merges = train_bpe_merges(voc, n_merges=20)
    out = {r.id: r for r in
           bpe_encode(df, "text", "doc_id", merges).collect()}
    assert set(out) == {1, 2}             # null/blank dropped
    ranks = {p: i for i, p in enumerate(merges)}
    expect = []
    for w in "the lowest price the newest price".split():
        expect.extend(bpe_encode_word(w, ranks))
    assert list(out[1].pieces) == expect
    assert out[1].n_pieces == len(expect)


def test_vocab_frame_bound_enforced(spark):
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    from peri_spark.functions import vocabulary
    voc = vocabulary(df, "text", "doc_id")
    with pytest.raises(ValueError, match="max_words"):
        train_bpe_merges(voc, n_merges=5, max_words=3)


def test_encode_preserves_string_ids(spark):
    """Review finding r5: id output type must follow the input id
    column (UUID/URL string ids), not hardcode long."""
    df = spark.createDataFrame(
        [("doc-a", "hello world hello"), ("doc-b", "world")],
        "doc_id string, text string")
    merges = train_bpe_merges({"hello": 2, "world": 2}, n_merges=5)
    out = {r.id: r.n_pieces for r in
           bpe_encode(df, "text", "doc_id", merges).collect()}
    assert set(out) == {"doc-a", "doc-b"}
