"""Add-α bigram LM scoring vs a straightforward Python reference."""

import math
from collections import Counter

import pytest

from peri_spark.functions import bigram_counts, bigram_lm_scores, vocabulary

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the log"),
    (3, "the cat ate the fish"),
    (4, "completely novel wording here"),
    (5, "single"),           # < 2 tokens: absent from scores
    (6, None),
]


def _reference_scores(alpha=0.1):
    toks = {i: t.lower().split() for i, t in DOCS if t}
    uni = Counter(w for ws in toks.values() for w in ws)
    bi = Counter((ws[i], ws[i + 1]) for ws in toks.values()
                 for i in range(len(ws) - 1))
    V = len(uni)
    out = {}
    for i, ws in toks.items():
        pairs = [(ws[k], ws[k + 1]) for k in range(len(ws) - 1)]
        if not pairs:
            continue
        lp = sum(math.log((bi[p] + alpha) / (uni[p[0]] + alpha * V))
                 for p in pairs)
        out[i] = (len(pairs), round(lp / len(pairs), 4))
    return out


def test_bigram_scores_match_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    bg = bigram_counts(df, "text")
    voc = vocabulary(df, "text", "doc_id")
    got = {r.id: (r.n_bigrams, r.avg_logprob)
           for r in bigram_lm_scores(df, "text", "doc_id",
                                     bg, voc).collect()}
    assert got == _reference_scores()
    assert 5 not in got and 6 not in got


def test_bigram_counts_deterministic_topk(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    top = bigram_counts(df, "text", top_k=3).collect()
    assert [(r.w1, r.w2, r["count"]) for r in top] == [
        ("on", "the", 2), ("sat", "on", 2), ("the", "cat", 2)]
