"""edit_distance_pairs: Ed-Join q-gram prefix filtering vs brute force."""

import itertools

import pytest

from peri_spark.functions import edit_distance_pairs


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(rows, k):
    return {(ia, ib, _lev(sa, sb))
            for (ia, sa), (ib, sb) in itertools.combinations(rows, 2)
            if _lev(sa, sb) <= k}


def _got(spark, rows, k, **kw):
    df = spark.createDataFrame(rows, "id long, s string")
    res = edit_distance_pairs(df, "s", "id", max_edit=k, **kw)
    return {(r.id_a, r.id_b, r.edit_distance) for r in res.collect()}


def test_matches_brute_force_mixed_corpus(spark):
    rows = [(1, "jonathan smith"), (2, "jonathon smith"),
            (3, "jonathan smyth"), (4, "mary jones"),
            (5, "marie jones"), (6, "completely different"),
            (7, "jonathan smith jr"), (8, "mary janes")]
    assert _got(spark, rows, 2) == _brute(rows, 2)


def test_short_strings_and_empties(spark):
    # all below the gram-bound boundary: the short branch must catch them
    rows = [(1, "ab"), (2, "ba"), (3, ""), (4, "a"),
            (5, "abcd"), (6, "abce"), (7, "zz")]
    assert _got(spark, rows, 2) == _brute(rows, 2)


def test_short_long_boundary_pairs(spark):
    # a short string within k of a long one crosses the branch boundary:
    # the gram branch must still find it (all short-side grams indexed)
    rows = [(1, "abc"), (2, "abcde"), (3, "abcdefg"), (4, "xbcde")]
    assert _got(spark, rows, 2) == _brute(rows, 2)


def test_edits_concentrated_in_prefix(spark):
    # both edits inside the first q chars — naive first-chars blocking
    # would miss these; the rarest-first gram prefix must not
    rows = [(1, "xxhello world test string"),
            (2, "yyhello world test string"),
            (3, "hello world test string"),
            (4, "hello world test strings")]
    assert _got(spark, rows, 2) == _brute(rows, 2)


def test_hot_gram_corpus_exact(spark):
    # heavy shared boilerplate ("customer record ...") makes most grams
    # hot; rarest-first prefixes keep candidates bounded AND exact
    rows = [(i, f"customer record {i:04d}") for i in range(60)]
    assert _got(spark, rows, 1) == _brute(rows, 1)


def test_null_text_ignored(spark):
    df = spark.createDataFrame([(1, "abcdef"), (2, None), (3, "abcdeg")],
                               "id long, s string")
    got = {(r.id_a, r.id_b) for r in
           edit_distance_pairs(df, "s", "id", max_edit=1).collect()}
    assert got == {(1, 3)}


def test_short_cap_discloses(spark):
    # k=2, q=3 → short boundary len <= 4; 30 DISTINCT short values over
    # a cap of 10 → whole short branch dropped, disclosed via counter
    rows = [(i, f"{i:03d}") for i in range(30)]
    ctr = {}
    got = _got(spark, rows, 2, max_short_strings=10, dropped_counter=ctr)
    assert got == set()
    assert ctr["n_short_values"] == 30
    assert ctr["n_short_dropped"] == 30


def test_short_duplicate_values_expand(spark):
    # 30 ids share ONE short value: the theta join sees 1 distinct
    # value; the id expansion must still emit all C(30,2) zero-distance
    # pairs exactly once
    rows = [(i, "ab") for i in range(30)]
    got = _got(spark, rows, 2)
    assert got == {(i, j, 0) for i in range(30) for j in range(i + 1, 30)}


def test_no_allpairs_join_in_gram_branch(spark):
    # the plan's only nested-loop joins belong to the short branch's
    # distinct-VALUE self-join — the full corpus must never feed a
    # cartesian/BNLJ (gram branch = equi-join on (g, occ))
    rows = [(i, f"some reasonably long string number {i}")
            for i in range(20)]
    df = spark.createDataFrame(rows, "id long, s string")
    res = edit_distance_pairs(df, "s", "id", max_edit=2, release=False)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert (plan.count("CartesianProduct")
            + plan.count("BroadcastNestedLoopJoin")) <= 1
