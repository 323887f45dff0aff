"""Byte-pair-encoding tokenizer training + encoding at corpus scale.

The standard BPE trainer (Sennrich, Haddow & Birch 2016, ACL — the
algorithm behind GPT-2/RoBERTa vocabularies) never needs the corpus
itself: it operates on the WORD-FREQUENCY table. That factors perfectly
over Spark:

1. distributed half — :func:`peri_spark.functions.vocabulary` builds
   the word-count table with one two-level aggregate (the only corpus
   pass), bounded with ``top_k``;
2. driver half — :func:`train_bpe_merges` runs the merge loop over
   that bounded table with incremental pair-count maintenance
   (O(affected words) per merge, not O(vocab));
3. distributed again — :func:`bpe_encode` applies the learned merge
   ranks per document inside an Arrow-batched UDF with a per-batch
   word cache (each DISTINCT word in a batch encodes once).

Words segment on the corpus tokenize convention (lower → trim → split
whitespace — same as ``vocabulary``/``encode_tokens``); symbols start
as characters plus an explicit ``</w>`` end-of-word marker, so merges
never cross word boundaries and a suffix merge ("ing</w>") stays
distinct from an infix one ("ing").

Determinism: the merge chosen each round is the (count DESC, pair
LEXICOGRAPHIC ASC) maximum — re-running on the same word table yields
byte-identical merges on any host, the property a reproducible
training-data pipeline needs. Not SQL-expressible (iterative greedy
argmax), so this ships pytest-verified like the generator/JSON-Schema
subsystems rather than DuckDB-oracled.
"""

from __future__ import annotations

from collections import Counter, defaultdict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["train_bpe_merges", "bpe_encode", "bpe_encode_word",
           "EOW", "MAX_DRIVER_WORDS"]

EOW = "</w>"
MAX_DRIVER_WORDS = 2_000_000


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word) + (EOW,)


def train_bpe_merges(word_counts, n_merges: int,
                     min_pair_count: int = 2,
                     max_words: int = MAX_DRIVER_WORDS
                     ) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a word-frequency table.

    ``word_counts``: a ``{word: count}`` dict, or a ``vocabulary()``
    frame (its ``token``/``count`` columns are limit-probed against
    ``max_words`` before collecting — an unbounded vocab must not
    silently materialize on the driver, same contract as
    ``encode_tokens``). Stops early when no pair reaches
    ``min_pair_count`` (merging singletons only memorizes words).

    Incremental maintenance: a pair→count counter plus a pair→words
    inverted index; each merge touches only the words containing the
    merged pair, re-deriving their pair contributions exactly.
    """
    if isinstance(word_counts, DataFrame):
        probe = (word_counts.select("token", "count")
                 .limit(max_words + 1).collect())
        if len(probe) > max_words:
            raise ValueError(
                f"train_bpe_merges collects the word table to the "
                f"driver; this vocabulary exceeds max_words="
                f"{max_words}. Build it with vocabulary(..., top_k=...)"
                f" or raise max_words deliberately.")
        word_counts = {r["token"]: r["count"] for r in probe}
    import heapq

    words = {w: _word_symbols(w) for w in word_counts}
    pair_counts: Counter = Counter()
    pair_words: defaultdict[tuple, set] = defaultdict(set)
    for w, syms in words.items():
        c = word_counts[w]
        for p in zip(syms, syms[1:]):
            pair_counts[p] += c
            pair_words[p].add(w)
    # lazy-deletion max-heap over (count, pair): selection is O(log n)
    # per merge instead of a full pair_counts rescan (the rescan is
    # what would dominate at MAX_DRIVER_WORDS-scale vocabularies);
    # stale entries pop until the heap head matches the live count
    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)

    def _bump(p, c):
        if c >= min_pair_count:
            heapq.heappush(heap, (-c, p))

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = None
        while heap:
            negc, p = heap[0]
            if pair_counts.get(p) == -negc and -negc >= min_pair_count:
                best = p
                break
            heapq.heappop(heap)             # stale or below threshold
        if best is None:
            break
        merges.append(best)
        joined = best[0] + best[1]
        for w in list(pair_words[best]):
            syms = words[w]
            c = word_counts[w]
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= c
                pair_words[p].discard(w)
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                else:
                    _bump(p, pair_counts[p])
            new: list[str] = []
            i = 0
            while i < len(syms):
                if (i + 1 < len(syms)
                        and (syms[i], syms[i + 1]) == best):
                    new.append(joined)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            words[w] = tuple(new)
            for p in zip(words[w], words[w][1:]):
                pair_counts[p] += c
                pair_words[p].add(w)
                _bump(p, pair_counts[p])
    return merges


def bpe_encode_word(word: str, ranks: dict) -> list[str]:
    """Encode ONE word with learned merge ranks (GPT-2 ``bpe()``
    shape: repeatedly merge the lowest-rank adjacent pair)."""
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best_i, best_r = -1, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(df: DataFrame, text_col: str, id_col: str,
               merges: list[tuple[str, str]]) -> DataFrame:
    """Encode each document as BPE pieces: ``(id, pieces, n_pieces)``.

    Arrow-batched mapInPandas with the merge-rank dict shipped once per
    executor and a per-batch word cache — a batch's distinct words
    encode once regardless of repetition, and no token text shuffles
    (the operator is map-side only at any corpus size). Null/blank
    documents are dropped like ``encode_tokens``.
    """
    import re as _re
    from typing import Iterator

    from pyspark.sql import types as T

    ranks = {p: i for i, p in enumerate(merges)}
    ws = _re.compile(r"\s+", _re.ASCII)
    # preserve the caller's id type (UUID/URL string ids are common) —
    # a hardcoded LongType would fail Arrow conversion per partition
    id_type = df.schema[id_col].dataType
    out_schema = T.StructType([
        T.StructField("id", id_type),
        T.StructField("pieces", T.ArrayType(T.StringType())),
        T.StructField("n_pieces", T.LongType()),
    ])
    t = F.trim(F.lower(F.col(text_col)))
    base = (df.where(F.col(text_col).isNotNull() & (F.length(t) > 0))
            .select(F.col(id_col).alias("id"),
                    t.alias("__t")))

    def run(batches: Iterator) -> Iterator:
        import pandas as pd
        cache: dict[str, list[str]] = {}

        def enc_doc(txt: str) -> list[str]:
            out: list[str] = []
            for w in ws.split(txt.strip(" ")):
                got = cache.get(w)
                if got is None:
                    got = bpe_encode_word(w, ranks)
                    cache[w] = got
                out.extend(got)
            return out

        for pdf in batches:
            pieces = [enc_doc(x) for x in pdf["__t"]]
            yield pd.DataFrame({
                "id": pdf["id"],
                "pieces": pieces,
                "n_pieces": [len(p) for p in pieces],
            })

    return base.mapInPandas(run, schema=out_schema)
