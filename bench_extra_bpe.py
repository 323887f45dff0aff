"""BPE merge-quality vs word-table truncation (VERDICT r5 next-round #4).

`train_bpe_merges` bounds its driver collect at MAX_DRIVER_WORDS=2M and
documents `vocabulary(..., top_k=...)` as the remedy for corpora whose
distinct-word table exceeds it.  This measures what that truncation
costs.  The shipped testdata cannot host the experiment — the synthetic
`documents` corpus has 31 distinct words (measured; every truncation
level is the full table) — so the word table here is a deterministic
Zipf-shaped synthetic vocabulary (seeded RNG, syllable-composed words so
merges have real shared substructure, counts ~ rank^-1.07: the shape of
natural-language word tables per Zipf's law, which is what makes
truncation safe or unsafe).

For each truncation level top-k we train the same merge count on the
truncated table and compare against training on the FULL table:

- merge-set overlap   |merges_k ∩ merges_full| / n_merges
- first divergence    longest common prefix of the two merge SEQUENCES
                      (order matters: encode uses ranks)
- encode-length delta token-weighted mean encoded length over the FULL
                      word distribution (truncation may only be judged
                      on the corpus it will encode, tail included)

Run:  python bench_extra_bpe.py          (pure driver, no Spark session:
the trainer operates on the word-frequency table by design — the corpus
half of the pipeline is the one `vocabulary()` aggregate either way).
Numbers are cited in OPTIMIZATION_r06.md.
"""

import json
import random
import sys
import time

sys.path.insert(0, "/root/repo")
from peri_spark.functions.bpe import bpe_encode_word, train_bpe_merges

N_WORDS = 200_000
N_MERGES = 1_000
TOP_KS = [5_000, 20_000, 50_000, 100_000]
ZIPF_S = 1.07
TOP_COUNT = 5_000_000


def make_word_table(n=N_WORDS, seed=0):
    rng = random.Random(seed)
    onsets = ["b", "c", "d", "f", "g", "h", "j", "k", "l", "m", "n",
              "p", "r", "s", "t", "v", "w", "z", "st", "tr", "ch", "th"]
    nuclei = ["a", "e", "i", "o", "u", "ai", "ea", "ou"]
    codas = ["", "", "n", "r", "s", "t", "l", "ng", "st"]
    affixes = ["ing", "ed", "er", "tion", "ly", "pre", "un", "re"]
    words = {}
    while len(words) < n:
        syls = rng.randint(1, 3)
        w = "".join(rng.choice(onsets) + rng.choice(nuclei)
                    + rng.choice(codas) for _ in range(syls))
        if rng.random() < 0.35:
            a = rng.choice(affixes)
            w = a + w if a in ("pre", "un", "re") else w + a
        words.setdefault(w, None)
    ranked = list(words)  # insertion order = deterministic rank order
    return {w: max(1, int(TOP_COUNT / (r + 1) ** ZIPF_S))
            for r, w in enumerate(ranked)}


def weighted_encode_len(table, merges):
    ranks = {p: i for i, p in enumerate(merges)}
    toks = rows = 0
    for w, c in table.items():
        toks += len(bpe_encode_word(w, ranks)) * c
        rows += c
    return toks / rows


def main():
    full = make_word_table()
    by_count = sorted(full.items(), key=lambda kv: (-kv[1], kv[0]))
    out = {"n_words": N_WORDS, "n_merges": N_MERGES, "zipf_s": ZIPF_S,
           "levels": []}
    t0 = time.time()
    merges_full = train_bpe_merges(full, N_MERGES)
    t_full = time.time() - t0
    len_full = weighted_encode_len(full, merges_full)
    out["full"] = {"train_sec": round(t_full, 2),
                   "weighted_len": round(len_full, 4)}
    for k in TOP_KS:
        sub = dict(by_count[:k])
        t0 = time.time()
        m = train_bpe_merges(sub, N_MERGES)
        t = time.time() - t0
        overlap = len(set(m) & set(merges_full)) / N_MERGES
        prefix = 0
        for a, b in zip(m, merges_full):
            if a != b:
                break
            prefix += 1
        wl = weighted_encode_len(full, m)
        out["levels"].append({
            "top_k": k, "train_sec": round(t, 2),
            "merge_overlap": round(overlap, 4),
            "first_divergence_rank": prefix,
            "weighted_len": round(wl, 4),
            "len_delta_pct": round(100 * (wl - len_full) / len_full, 3)})
        print(json.dumps(out["levels"][-1]), flush=True)
    print(json.dumps(out))
    with open("/root/repo/bench_extra_bpe.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
