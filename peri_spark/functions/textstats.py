"""Text analysis: language-ID, quality scoring, token counts, fingerprints.

All JVM-side column expressions (regexp counts, HOFs) — the hot path of a
100 TB text pipeline must not cross into Python per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["language_id", "quality_scores", "token_counts",
           "encode_tokens", "bigram_counts", "bigram_lm_scores",
           "winnow_fingerprints", "repetition_stats", "quality_filter",
           "LANG_MARKERS", "DEFAULT_QUALITY_RULES"]

# n-gram/stopword heuristic markers per language (word-boundary regexes,
# portable across Java regex and RE2)
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|to|is|in|that|for|with)\b",
    "es": r"\b(el|la|los|las|de|que|y|en|por|una?)\b",
    "de": r"\b(der|die|das|und|ist|von|mit|für|ein)\b",
    "fr": r"\b(le|la|les|des|et|est|que|pour|dans)\b",
    "zh": r"[一-鿿]",
}


def _count_matches(col: Column, pattern: str) -> Column:
    # regexp_count counts the same non-overlapping matches the old
    # size(regexp_extract_all(...)) did, without materializing an array
    # of match strings per row (round-6)
    return F.regexp_count(col, F.lit(pattern))


def language_id(df: DataFrame, text_col: str, id_col: str,
                markers: dict[str, str] | None = None) -> DataFrame:
    """Heuristic language ID: per-language marker hit-rate, argmax.

    Returns (id, lang_pred, score) where score = hits per 100 tokens.
    One projection; ties break lexicographically (deterministic).
    """
    markers = markers or LANG_MARKERS
    t = F.lower(F.col(text_col))
    n_tok = F.greatest(F.size(F.split(F.trim(t), r"\s+")), F.lit(1))
    scores = [(lang, F.round(_count_matches(t, pat) * 100.0 / n_tok, 4))
              for lang, pat in sorted(markers.items())]
    pairs = F.array(*[F.struct(s.alias("score"), F.lit(lang).alias("lang"))
                      for lang, s in scores])
    best = F.array_max(pairs)  # struct max: score first, lang tiebreak
    # null/empty text → no prediction (not an arbitrary tie-break winner)
    undecidable = F.col(text_col).isNull() | (F.trim(F.col(text_col)) == "")
    return df.select(
        F.col(id_col).alias("id"),
        F.when(undecidable, F.lit(None)).otherwise(best["lang"])
        .alias("lang_pred"),
        F.when(undecidable, F.lit(None)).otherwise(best["score"])
        .alias("score"))


def quality_scores(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Document quality heuristics (Gopher/C4-style cheap filters):
    length, token stats, punctuation/alpha ratios, stopword density,
    repetition (distinct-token ratio). One projection pass."""
    t = F.col(text_col)
    toks = F.split(F.trim(F.lower(t)), r"\s+")
    n_tok = F.size(toks)
    n_chars = F.length(t)
    # counting-by-translate (round-6): length(t) - length(translate(t,
    # C, '')) counts exactly the chars of class C, like the old
    # regexp_replace('[^C]') length — but translate walks the bytes once
    # with a lookup table instead of running the regex engine and
    # allocating a stripped copy per class. Identical counts.
    _alpha_chars = ("ABCDEFGHIJKLMNOPQRSTUVWXYZ"
                    "abcdefghijklmnopqrstuvwxyz")
    alpha = n_chars - F.length(F.translate(t, _alpha_chars, ""))
    digits = n_chars - F.length(F.translate(t, "0123456789", ""))
    punct = n_chars - F.length(F.translate(t, ".,;:!?", ""))
    stop = _count_matches(F.lower(t), LANG_MARKERS["en"])
    return df.select(
        F.col(id_col).alias("id"),
        n_chars.cast("long").alias("n_chars"),
        n_tok.cast("long").alias("n_tokens"),
        F.round(n_chars / F.greatest(n_tok, F.lit(1)), 4).alias("avg_token_len"),
        F.round(alpha / F.greatest(n_chars, F.lit(1)), 4).alias("alpha_ratio"),
        F.round(digits / F.greatest(n_chars, F.lit(1)), 4).alias("digit_ratio"),
        F.round(punct / F.greatest(n_chars, F.lit(1)), 4).alias("punct_ratio"),
        F.round(stop / F.greatest(n_tok, F.lit(1)), 4).alias("stopword_ratio"),
        F.round(F.size(F.array_distinct(toks)) / F.greatest(n_tok, F.lit(1)), 4)
        .alias("distinct_token_ratio"))


def token_counts(df: DataFrame, text_col: str, id_col: str,
                 bpe_like: bool = False) -> DataFrame:
    """Token counts: whitespace tokens and a BPE-ish subword estimate
    (word-piece regex: runs of letters / digits / single punctuation —
    the GPT-2 pre-tokenizer shape, minus unicode categories)."""
    t = F.col(text_col)
    ws = F.size(F.split(F.trim(t), r"\s+")).cast("long")
    out = [F.col(id_col).alias("id"), ws.alias("n_tokens_ws")]
    if bpe_like:
        pieces = F.regexp_count(
            t, F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]")).cast("long")
        out.append(pieces.alias("n_tokens_bpe_like"))
    return df.select(*out)


# (rule name, metric key, "lt"/"gt", default bound): a doc FAILS a rule
# when its metric is strictly beyond the bound. Bounds compare on the
# 4dp-rounded metrics so the keep/drop decision cannot hinge on a float
# ulp that differs between engines.
DEFAULT_QUALITY_RULES: list[tuple[str, str, str, float]] = [
    ("too_few_tokens", "n_tokens", "lt", 20),
    ("too_many_tokens", "n_tokens", "gt", 100_000),
    ("short_tokens", "avg_token_len", "lt", 2.0),
    ("long_tokens", "avg_token_len", "gt", 12.0),
    ("low_alpha", "alpha_ratio", "lt", 0.6),
    ("high_digit", "digit_ratio", "gt", 0.2),
    ("low_distinct", "distinct_token_ratio", "lt", 0.3),
    ("high_dup_2gram", "dup_2gram_frac", "gt", 0.6),
]


def quality_filter(df: DataFrame, text_col: str, id_col: str,
                   rules: list[tuple[str, str, str, float]] | None = None,
                   arrow: bool = False) -> DataFrame:
    """Composite Gopher/C4-style document filter: every rule that fires
    becomes a reason string; ``keep`` is true iff none fire.

    Returns ``(id, keep, reasons)`` with ``reasons`` a comma-joined,
    rule-ordered string (empty when kept) — the audit trail a curation
    pipeline writes next to its drop decisions. Metrics available to
    rules: ``n_tokens``, ``avg_token_len``, ``alpha_ratio``,
    ``digit_ratio``, ``distinct_token_ratio`` (as in
    :func:`quality_scores`) and ``dup_2gram_frac`` (the
    :func:`repetition_stats` duplicate-2-gram fold). Null/blank
    documents fail with the single reason ``empty``.

    One zero-shuffle projection — all metrics inline in the same pass,
    so a 100 TB filter sweep is a scan, not a join of metric tables.
    ``arrow=True`` swaps the interpreted 2-gram fold for the Arrow twin
    (identical ``dup_2gram_frac``); the cheap codegen metrics stay JVM.
    """
    rules = DEFAULT_QUALITY_RULES if rules is None else rules
    # text and tokens enter as ATTRIBUTES (materialized by the first
    # projection below): the 2-gram lambda would otherwise re-split the
    # text once per gram — quadratic in document length
    t = F.col("__t")
    toks = F.col("__toks")
    n_tok = F.size(toks)
    n_chars = F.length(t)
    # same counting-by-translate rewrite as quality_scores (identical
    # counts, no regex engine / stripped-copy allocation per class)
    alpha = n_chars - F.length(F.translate(
        t, "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz", ""))
    digits = n_chars - F.length(F.translate(t, "0123456789", ""))
    if arrow:
        folded = _repetition_fold_arrow(t, 2)
        dup, n_grams = folded["dup"], folded["n_grams"]
    else:
        grams = F.transform(
            F.sequence(F.lit(0), F.greatest(n_tok - 2, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2)))
        # duplicate-occurrence count via the sorted-run fold of
        # repetition_stats; the increment derives from the OLD run length
        # (a match extending run 1 -> 2 retroactively marks both grams)
        dup = F.aggregate(
            F.array_sort(grams),
            F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"),
                     F.lit(0).alias("dup")),
            lambda acc, g: F.struct(
                g.alias("prev"),
                F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
                .alias("run"),
                (acc["dup"] + F.when(
                    g == acc["prev"],
                    F.when(acc["run"] >= 2, F.lit(1)).otherwise(F.lit(2)))
                 .otherwise(F.lit(0))).alias("dup")))["dup"]
        n_grams = F.size(grams)
    metrics: dict[str, Column] = {
        "n_tokens": n_tok.cast("long"),
        "avg_token_len": F.round(n_chars / F.greatest(n_tok, F.lit(1)), 4),
        "alpha_ratio": F.round(alpha / F.greatest(n_chars, F.lit(1)), 4),
        "digit_ratio": F.round(digits / F.greatest(n_chars, F.lit(1)), 4),
        "distinct_token_ratio": F.round(
            F.size(F.array_distinct(toks)) / F.greatest(n_tok, F.lit(1)), 4),
        "dup_2gram_frac": F.round(dup / n_grams, 4),
    }
    fired = []
    for name, key, op, bound in rules:
        m = metrics[key]
        cond = m < F.lit(bound) if op == "lt" else m > F.lit(bound)
        fired.append(F.when(cond, F.lit(name)))
    blank = t.isNull() | (F.trim(t) == "")
    reasons = F.when(blank, F.lit("empty")).otherwise(
        F.array_join(F.filter(F.array(*fired), lambda x: x.isNotNull()),
                     ","))
    raw = F.col(text_col)
    return (df.select(F.col(id_col).alias("id"), raw.alias("__t"),
                      F.split(F.trim(F.lower(raw)), r"\s+").alias("__toks"))
            .select("id", (reasons == "").alias("keep"),
                    reasons.alias("reasons")))


def _repetition_fold_arrow(text: Column, n: int) -> Column:
    """Arrow-batched twin of the ``repetition_stats`` sorted-run fold:
    identical ``(n_grams, dup, best_cnt, best_g)`` per document, computed
    by one pandas UDF instead of the interpreted ``aggregate`` HOF (struct
    accumulators are CodegenFallback — the fold dominates wall time on
    long documents; a per-row ``Counter`` is ~an order of magnitude
    faster and the DuckDB oracle mirror is unchanged).

    Parity contract with the JVM fold (tested): lower → trim → split
    ``\\s+`` (``re.ASCII`` = Java's ``\\s`` char class; ``strip(" ")``
    because Spark ``trim`` strips 0x20 ONLY — a trailing newline/tab
    survives trim and yields an empty edge token after split, which the
    Python side must reproduce), partial final gram when the document is
    shorter than ``n`` words, ties on the top gram break
    lexicographically smallest (UTF-8 byte order == Python str order).
    """
    import re as _re
    from collections import Counter

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ws = _re.compile(r"\s+", _re.ASCII)

    def _fold(t):
        if t is None:
            return (0, 0, 0, "")
        toks = ws.split(t.lower().strip(" "))
        grams = [" ".join(toks[i:i + n])
                 for i in range(max(len(toks) - n, 0) + 1)]
        counts = Counter(grams)
        dup = sum(c for c in counts.values() if c >= 2)
        best_cnt = max(counts.values())
        best_g = min(g for g, c in counts.items() if c == best_cnt)
        return (len(grams), dup, best_cnt, best_g)

    # annotation-free lambda: stringized annotations can't resolve the
    # locally-imported pd inside pandas_udf hint inference
    f = pandas_udf(
        lambda s: pd.DataFrame(
            [_fold(t) for t in s],
            columns=["n_grams", "dup", "best_cnt", "best_g"]),
        "struct<n_grams:long, dup:long, best_cnt:int, best_g:string>")
    return f(text)


def repetition_stats(df: DataFrame, text_col: str, id_col: str,
                     n: int = 2, arrow: bool = False) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, Table A1):
    per-document word-n-gram repetition metrics.

    Returns ``(id, n_grams, dup_ngram_frac, top_ngram,
    top_ngram_char_frac)``:

    * ``dup_ngram_frac`` — fraction of n-gram OCCURRENCES whose gram
      appears more than once in the document (Gopher's "duplicate
      n-gram fraction").
    * ``top_ngram`` / ``top_ngram_char_frac`` — the most frequent
      n-gram (ties → lexicographically smallest) and the fraction of
      the document's characters its occurrences cover
      (count × gram length / document length).

    Zero shuffle — the Gopher statistic is per-document, so it must
    never become a corpus-wide explode+groupBy: grams sort per row
    (``array_sort``) and ONE sequential ``aggregate`` fold counts
    duplicate occurrences and the longest run (= the top gram; runs
    scan in sorted order, so the first maximal run is the smallest
    gram). A 100 TB corpus streams partition-local; only the
    (id, 4-column) result leaves the scan. Rows with null/blank text
    are dropped (no grams to measure); a document shorter than ``n``
    words yields its single partial gram, mirroring ``shingles``.

    ``arrow=True`` swaps the interpreted JVM fold for the Arrow-batched
    twin (``_repetition_fold_arrow``) — identical output, ~10× faster on
    long documents; the row filter and fraction rounding stay Spark-side
    either way.
    """
    t = F.trim(F.lower(F.col(text_col)))
    n_chars = F.length(F.col(text_col))
    if arrow:
        folded = _repetition_fold_arrow(F.col(text_col), n)
        return (df.where(F.col(text_col).isNotNull() & (F.length(t) > 0))
                .select(F.col(id_col).alias("id"), folded.alias("_f"),
                        n_chars.alias("_nc"))
                .select(F.col("id"),
                        F.col("_f.n_grams").alias("n_grams"),
                        F.round(F.col("_f.dup") / F.col("_f.n_grams"), 6)
                        .alias("dup_ngram_frac"),
                        F.col("_f.best_g").alias("top_ngram"),
                        F.round(F.col("_f.best_cnt")
                                * F.length(F.col("_f.best_g"))
                                / F.col("_nc"), 6)
                        .alias("top_ngram_char_frac")))
    # tokens materialize in their own projection: the split re-runs per
    # gram if it is inlined into the gram lambda (quadratic in length)
    toks = F.col("__toks")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    n_grams = F.size(grams)
    # fold state: previous gram, current run length, duplicate-occurrence
    # count, best (longest) run length + its gram
    acc0 = F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"),
                    F.lit(0).alias("dup"), F.lit(0).alias("best_cnt"),
                    F.lit("").alias("best_g"))

    def _step(acc, g):
        run = F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        # a run reaching 2 retroactively marks both occurrences duplicate
        dup = acc["dup"] + F.when(run == 2, F.lit(2)) \
                            .when(run > 2, F.lit(1)).otherwise(F.lit(0))
        better = run > acc["best_cnt"]
        return F.struct(
            g.alias("prev"), run.alias("run"), dup.alias("dup"),
            F.when(better, run).otherwise(acc["best_cnt"]).alias("best_cnt"),
            F.when(better, g).otherwise(acc["best_g"]).alias("best_g"))

    folded = F.aggregate(F.array_sort(grams), acc0, _step)
    return (df.where(F.col(text_col).isNotNull() & (F.length(t) > 0))
            .select(F.col(id_col).alias("id"),
                    F.split(t, r"\s+").alias("__toks"),
                    n_chars.alias("__nc"))
            .select("id",
                    n_grams.cast("long").alias("n_grams"),
                    F.round(folded["dup"] / n_grams, 6)
                    .alias("dup_ngram_frac"),
                    folded["best_g"].alias("top_ngram"),
                    F.round(folded["best_cnt"] * F.length(folded["best_g"])
                            / F.col("__nc"), 6)
                    .alias("top_ngram_char_frac")))


def winnow_fingerprints(df: DataFrame, text_col: str, id_col: str,
                        k: int = 8, window: int = 4,
                        hash_fn=None, arrow: bool = False) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03):
    k-gram rolling hashes → per-window minima → distinct fingerprint set.
    JVM HOFs end to end; output (id, fingerprints array<long>) feeds an
    inverted-index overlap join for plagiarism/near-dup detection.
    ``hash_fn`` defaults to xxhash64; pass dedup.portable_hash64 for an
    oracle-reproducible fingerprint set.

    ``arrow=True`` computes the PORTABLE (md5-prefix) fingerprints in
    one pandas UDF — identical values, first-occurrence order, same
    null/short-doc edges. Use it whenever portable mode is wanted:
    Catalyst inlines the gram-hash array into every window lambda
    (common subexpressions are not shared across HOF lambdas), so the
    JVM portable path recomputes the md5 chain once PER WINDOW —
    quadratic in document length and ~40× slower than the UDF even on
    300-char documents. Incompatible with a custom ``hash_fn``.
    """
    if arrow:
        from .dedup import portable_hash64
        if hash_fn is not None and hash_fn is not portable_hash64:
            raise ValueError("winnow_fingerprints: arrow=True computes "
                             "portable (md5-prefix) hashes only")
        return (df.where(F.col(text_col).isNotNull())
                .select(F.col(id_col).alias("id"),
                        _winnow_arrow(F.col(text_col), k, window)
                        .alias("fingerprints")))
    h = hash_fn or F.xxhash64
    # lowered text, then the gram-hash array, each materialize in their
    # own projection before any lambda captures them (see below)
    t = F.col("__lt")
    n = F.greatest(F.length(t) - k, F.lit(0))
    seq = F.transform(F.sequence(F.lit(0), n),
                      lambda i: h(F.substr(t, i + 1, F.lit(k))))
    # the gram-hash array MUST be an attribute before the window lambda
    # consumes it: a lambda re-evaluates captured expressions per
    # element, so inlining `seq` recomputes the whole hash chain once
    # per window — quadratic (165 s -> 3.7 s at sf0.01, portable mode)
    kh = F.col("__kh")
    wins = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(kh) - window, F.lit(0))),
        lambda i: F.array_min(F.slice(kh, i + 1, window)))
    # null text has no k-grams — drop the row (greatest() ignoring the
    # null length would otherwise emit one bogus hash-of-nothing
    # fingerprint per null document)
    return (df.where(F.col(text_col).isNotNull())
            .select(F.col(id_col).alias("id"),
                    F.lower(F.col(text_col)).alias("__lt"))
            .select("id", seq.alias("__kh"))
            .select("id", F.array_distinct(wins).alias("fingerprints")))


def _winnow_arrow(text: Column, k: int, window: int) -> Column:
    """Arrow twin of the portable-hash winnowing chain: md5-prefix
    60-bit k-gram hashes → window minima → distinct (first occurrence),
    matching the JVM expressions value-for-value on lower(text)."""
    import hashlib

    from pyspark.sql.functions import pandas_udf

    def _fps(t):
        if t is None:
            return None
        t = t.lower()
        grams = [t[i:i + k] for i in range(max(len(t) - k, 0) + 1)]
        hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
              for g in grams]
        wins = (min(hs[i:i + window])
                for i in range(max(len(hs) - window, 0) + 1))
        seen, out = set(), []
        for v in wins:
            if v not in seen:
                seen.add(v)
                out.append(v)
        return out

    f = pandas_udf(lambda s: s.map(_fps), "array<long>")
    return f(text)


def vocabulary(df: DataFrame, text_col: str, id_col: str,
               min_count: int = 1, top_k: int | None = None) -> DataFrame:
    """Corpus vocabulary table: ``(token, count, doc_freq, rank)``.

    Tokens are whitespace words of the lower/trim-normalized text (the
    shared convention of :func:`quality_scores` / :func:`repetition_stats`);
    ``count`` is total occurrences, ``doc_freq`` the number of distinct
    documents containing the token, ``rank`` the 1-based position by
    ``(count DESC, token ASC)`` — fully deterministic, ties included.

    Scale shape (100 TB corpus): the explode never materializes — tokens
    stream into a two-level aggregate, ``(token, id)`` partial counts
    first (spreads stopword skew across the full key space and gives
    ``doc_freq`` exactly, no distinct-count rescan), then ``token``
    totals. The final rank is a global sort of the VOCABULARY, not the
    corpus — with ``top_k`` it runs on the top-k rows after a
    distributed TakeOrdered; without it, on one vocab-sized partition
    (bounded by |V|, typically millions of rows ≪ corpus).
    """
    from pyspark.sql import Window

    t = F.trim(F.lower(F.col(text_col)))
    ex = (df.where(F.col(text_col).isNotNull() & (F.length(t) > 0))
          .select(F.col(id_col).alias("__id"),
                  F.explode(F.split(t, r"\s+")).alias("token")))
    voc = (ex.groupBy("token", "__id").agg(F.count(F.lit(1)).alias("__c"))
           .groupBy("token")
           .agg(F.sum("__c").alias("count"),
                F.count(F.lit(1)).alias("doc_freq"))
           .where(F.col("count") >= min_count))
    if top_k is not None:
        voc = voc.orderBy(F.desc("count"), F.asc("token")).limit(top_k)
    w = Window.orderBy(F.desc("count"), F.asc("token"))
    return voc.select("token", "count", "doc_freq",
                      F.row_number().over(w).cast("long").alias("rank"))


MAX_DRIVER_VOCAB = 5_000_000


def encode_tokens(df: DataFrame, text_col: str, id_col: str,
                  vocab: DataFrame, unk_id: int = 0,
                  arrow: bool = True,
                  max_vocab_size: int = MAX_DRIVER_VOCAB) -> DataFrame:
    """Encode each document as its vocabulary token-id array —
    ``(id, token_ids, n_tokens)``, the tokenize step feeding
    :func:`peri_spark.functions.curation.pack_sequences`.

    ``vocab`` is a :func:`vocabulary` frame; a token's id is its
    ``rank`` (1-based, deterministic), out-of-vocabulary tokens encode
    to ``unk_id`` (default 0 — never a rank). Tokenization is the
    shared corpus convention (lower → trim → split ``\\s+``); null and
    blank documents are dropped exactly like :func:`vocabulary`.

    ``arrow=True`` (default, the scale path): the vocab — bounded by
    construction when built with ``top_k``, and ENFORCED here at
    ``max_vocab_size`` (a vocab frame built without ``top_k`` over an
    open-ended corpus would otherwise collect unbounded rows to the
    driver; VERDICT r04 what's-wrong #5) — collects to a plain dict
    once at call time and ships inside an Arrow-batched pandas UDF:
    true O(1) lookups, map-side only, ZERO shuffle at any corpus size.
    The JVM-map-literal alternative is deliberately not used — Spark's
    ``element_at`` on ``ArrayBasedMapData`` is a linear scan per token,
    quadratic in vocab size across a document.

    ``arrow=False``: pure-relational twin (parity-tested bit-identical)
    — posexplode → broadcast hash join on token (a real O(1) hash
    probe) → regroup with positional ``array_sort`` reassembly. The
    regroup key includes a per-row uid, not just ``id_col``, so rows
    sharing an id re-emit one row each instead of interleaving their
    tokens into one garbage array. Costs one (uid, pos, tid) shuffle;
    use it where Python workers are unavailable.
    """
    import re as _re

    t = F.trim(F.lower(F.col(text_col)))
    base = df.where(F.col(text_col).isNotNull() & (F.length(t) > 0))
    if arrow:
        from pyspark.sql.functions import pandas_udf

        # limit-probe BEFORE collecting: one row past the bound proves
        # the vocab is oversized without ever materializing all of it
        probe = vocab.select("token", "rank").limit(max_vocab_size + 1) \
            .collect()
        if len(probe) > max_vocab_size:
            raise ValueError(
                f"encode_tokens(arrow=True) collects the vocab to the "
                f"driver; this vocab exceeds max_vocab_size="
                f"{max_vocab_size}. Build it with vocabulary(..., "
                f"top_k=...) or raise max_vocab_size deliberately.")
        vmap = {r["token"]: r["rank"] for r in probe}
        ws = _re.compile(r"\s+", _re.ASCII)

        def _enc(txt: str) -> list[int]:
            # strip(" ") — Spark trim strips 0x20 only (see
            # dedup.shingles_arrow parity contract)
            return [vmap.get(x, unk_id)
                    for x in ws.split(txt.lower().strip(" "))]

        f = pandas_udf(
            lambda s: s.map(lambda v: None if v is None else _enc(v)),
            "array<long>")
        return (base.select(F.col(id_col).alias("id"),
                            f(F.col(text_col)).alias("token_ids"))
                .withColumn("n_tokens",
                            F.size("token_ids").cast("long")))
    # the uid must materialize in its OWN projection: in the same
    # select as the generator it lands post-explode and numbers tokens
    withrow = base.select(F.col(id_col).alias("id"),
                          F.monotonically_increasing_id().alias("__row"),
                          F.split(t, r"\s+").alias("__toks"))
    ex = withrow.select("id", "__row",
                        F.posexplode("__toks").alias("pos", "token"))
    enc = ex.join(F.broadcast(vocab.select(
        "token", F.col("rank").alias("__tid"))), "token", "left")
    ordered = F.array_sort(F.collect_list(F.struct(
        "pos", F.coalesce("__tid", F.lit(unk_id)).cast("long")
        .alias("tid"))))
    return (enc.groupBy("__row", "id").agg(ordered.alias("__a"))
            .select("id",
                    F.transform("__a", lambda s: s["tid"])
                    .alias("token_ids"),
                    F.size("__a").cast("long").alias("n_tokens")))


def unigram_logprob(df: DataFrame, text_col: str, id_col: str,
                    top_k: int = 65536, alpha: float = 1.0,
                    vocab: DataFrame | None = None) -> DataFrame:
    """Per-document average unigram log-likelihood — the importance /
    quality score of DSIR-style data selection (Xie et al. 2023): docs
    whose tokens are typical of the corpus (or of a reference corpus
    passed as ``vocab``) score high; gibberish and boilerplate outliers
    score low.

    Laplace-smoothed: ``p(tok) = (c + alpha) / (total + alpha·(V+1))``
    with ``c`` the token's count in the (truncated) vocabulary, ``c=0``
    for out-of-vocabulary tokens, and ``V`` the retained vocabulary
    size. ``total`` is the token mass of the MODELED distribution:
    the full corpus token count when the vocabulary is built from the
    scored corpus itself, or the summed counts of a ``vocab`` passed
    in — counts and denominator must come from the same corpus or
    p is not a probability (a large reference over a small target
    would yield p > 1). Returns ``(id, n_tokens, logprob)`` with
    ``logprob`` the 6dp-rounded mean ``ln p`` over the document's
    token occurrences.

    Scale shape: the truncated vocabulary (≤ ``top_k`` rows) is
    collected ONCE — its size and token mass become plan literals and
    its rows re-enter as a BROADCAST hash join on the token stream,
    so the vocabulary job never re-runs per downstream action and no
    corpus-sized shuffle exists anywhere in scoring.
    """
    from pyspark.sql.functions import broadcast

    t = F.trim(F.lower(F.col(text_col)))
    ex = (df.where(F.col(text_col).isNotNull() & (F.length(t) > 0))
          .select(F.col(id_col).alias("id"),
                  F.explode(F.split(t, r"\s+")).alias("token")))
    own_corpus = vocab is None
    if own_corpus:
        vocab = vocabulary(df, text_col, id_col, top_k=top_k)
    rows = [(r["token"], int(r["count"]))
            for r in vocab.select("token", "count").collect()]
    v_size = len(rows)
    if own_corpus:
        total = int(ex.agg(F.count(F.lit(1))).collect()[0][0])
    else:
        total = sum(c for _tok, c in rows)
    denom = float(total) + alpha * (v_size + 1)
    vdf = df.sparkSession.createDataFrame(rows, "token string, count long") \
        if rows else df.sparkSession.createDataFrame([], "token string, count long")
    p = (F.coalesce(F.col("count"), F.lit(0)).cast("double") + F.lit(alpha)) \
        / F.lit(denom)
    return (ex.join(broadcast(vdf), "token", "left")
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.round(F.avg(F.log(p)), 6).alias("logprob")))


def bm25_topk(df: DataFrame, text_col: str, id_col: str, query: str,
              k: int = 10, k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """BM25 keyword retrieval: top-``k`` documents for a query string
    (Robertson-Spärck Jones idf, the `+1` variant that keeps idf
    positive). Returns ``(id, score, n_hit)`` — 6dp-rounded score,
    number of distinct query terms present — ordered by
    ``(score DESC, id ASC)`` so the cut is deterministic under ties.

    Scale shape (100 TB corpus, query of a few terms): the token
    explode feeds a codegen ``IN`` filter on the literal term set, so
    only MATCHING tokens ever shuffle — tf aggregates on
    ``(id, term)``, then one doc-level sum; the final top-k is a
    distributed TakeOrdered, never a global sort. Corpus statistics
    (N, average doc length, per-term document frequencies) come from
    two tiny scalar aggregates collected once and enter the plan as
    literals. Three scans of the corpus total; wrap ``df`` in
    ``.persist()`` first if it is already materialized columnar.
    """
    import math
    import re as _re

    terms = sorted({w for w in _re.split(r"\s+", query.strip().lower(),
                                         flags=_re.ASCII) if w})
    if not terms:
        raise ValueError("bm25_topk: query has no terms")
    t = F.trim(F.lower(F.col(text_col)))
    toks = F.split(t, r"\s+")
    base = (df.where(F.col(text_col).isNotNull() & (F.length(t) > 0))
            .select(F.col(id_col).alias("id"),
                    F.size(toks).alias("__dl"),
                    toks.alias("__toks")))
    stats = base.agg(F.count(F.lit(1)).alias("n"),
                     F.avg("__dl").alias("avgdl")).collect()[0]
    if stats.n == 0:  # no non-blank documents -> zero hits, not a crash
        return base.select("id", F.lit(0.0).alias("score"),
                           F.lit(0).cast("long").alias("n_hit")).limit(0)
    n_docs, avgdl = int(stats.n), float(stats.avgdl)
    ex = (base.select("id", "__dl", F.explode("__toks").alias("__tok"))
          .where(F.col("__tok").isin(terms)))
    # tf is tiny (≤ docs × |terms| rows) but its lineage re-runs the
    # corpus tokenize+explode; both consumers below (the df collect and
    # the final score) read the materialized frame instead, saving one
    # full corpus scan (round-6)
    tf = (ex.groupBy("id", "__dl", "__tok")
          .agg(F.count(F.lit(1)).alias("__tf"))
          .localCheckpoint(eager=True))
    dfs = {r["__tok"]: int(r["df"]) for r in
           tf.groupBy("__tok").agg(F.count(F.lit(1)).alias("df"))
           .collect()}
    idf = {w: math.log((n_docs - dfs.get(w, 0) + 0.5)
                       / (dfs.get(w, 0) + 0.5) + 1.0) for w in terms}
    idf_col = F.lit(idf[terms[0]])
    for w in terms[1:]:
        idf_col = F.when(F.col("__tok") == w, F.lit(idf[w])) \
            .otherwise(idf_col)
    term_score = idf_col * F.col("__tf") * (k1 + 1) / (
        F.col("__tf") + k1 * (1 - b + b * F.col("__dl") / F.lit(avgdl)))
    return (tf.select("id", term_score.alias("__s"))
            .groupBy("id")
            .agg(F.round(F.sum("__s"), 6).alias("score"),
                 F.count(F.lit(1)).cast("long").alias("n_hit"))
            .orderBy(F.desc("score"), F.asc("id"))
            .limit(k))


def _consecutive_pairs(text_col: str):
    """(normalized text expr, consecutive-token pair array expr) — the
    ONE definition of the corpus bigram convention, shared by model
    building and scoring so they can never tokenize differently."""
    t = F.trim(F.lower(F.col(text_col)))
    toks = F.split(t, r"\s+")
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")))
    return t, pairs


def bigram_counts(df: DataFrame, text_col: str,
                  min_count: int = 1,
                  top_k: int | None = None) -> DataFrame:
    """Corpus bigram table ``(w1, w2, count)`` over the shared tokenize
    convention (lower → trim → split whitespace; same as
    :func:`vocabulary`) — the model half of add-α bigram language-model
    scoring (:func:`bigram_lm_scores`), the in-repo equivalent of the
    n-gram-LM perplexity filters CCNet-style pipelines run.

    Scale shape: consecutive-pair arrays build map-side from two array
    slices (``zip_with`` — no self-join, no window), stream through
    explode into ONE partial-aggregated count; with ``top_k`` the
    global order runs on the bigram VOCABULARY via distributed
    TakeOrdered, never on the corpus. Deterministic tie-break
    ``(count DESC, w1 ASC, w2 ASC)``.
    """
    t, pairs = _consecutive_pairs(text_col)
    ex = (df.where(F.col(text_col).isNotNull() & (F.length(t) > 0))
          .select(F.explode(pairs).alias("p"))
          .select("p.w1", "p.w2"))
    out = (ex.groupBy("w1", "w2")
           .agg(F.count(F.lit(1)).cast("long").alias("count"))
           .where(F.col("count") >= min_count))
    if top_k is not None:
        out = out.orderBy(F.desc("count"), F.asc("w1"),
                          F.asc("w2")).limit(top_k)
    return out


def bigram_lm_scores(df: DataFrame, text_col: str, id_col: str,
                     bigrams: DataFrame, vocab: DataFrame,
                     alpha: float = 0.1,
                     vocab_size: int | None = None) -> DataFrame:
    """Per-document add-α bigram LM score:
    ``(id, n_bigrams, avg_logprob)`` with

        avg_logprob = mean over document bigrams of
            ln( (c(w1,w2) + α) / (c(w1) + α·V) )

    — higher (less negative) = more corpus-typical text; thresholding
    the score is the perplexity filter of CCNet/Wenzek et al. 2020
    with a bigram model instead of their external KenLM. Documents
    with fewer than 2 tokens (no bigrams) are absent from the output.

    ``bigrams`` is a :func:`bigram_counts` frame, ``vocab`` a
    :func:`vocabulary` frame (its ``count`` is c(w1)); ``vocab_size``
    defaults to ``vocab.count()`` — on an UNCACHED vocab frame that
    re-runs the whole corpus word aggregation once just for |V|, so at
    scale either persist the vocab first or pass ``vocab_size``
    explicitly. Unseen bigrams/unigrams
    back off to the α-smoothed floor via COALESCE(…, 0).

    Scale shape: per-document equal bigrams pre-aggregate BEFORE the
    model joins (shuffle carries ``(id, w1, w2, m)``, not every token
    position); both model joins are plain equi-joins Spark broadcasts
    when the model was built with ``top_k`` (no forced hint — an
    unbounded model must stay a shuffle join, not OOM the driver);
    the final per-id sum partial-aggregates map-side.
    """
    if vocab_size is None:
        vocab_size = vocab.count()
    t, pairs = _consecutive_pairs(text_col)
    ex = (df.where(F.col(text_col).isNotNull() & (F.length(t) > 0))
          .select(F.col(id_col).alias("id"), F.explode(pairs).alias("p"))
          .select("id", "p.w1", "p.w2")
          .groupBy("id", "w1", "w2")
          .agg(F.count(F.lit(1)).cast("long").alias("m")))
    bg = bigrams.select(F.col("w1"), F.col("w2"),
                        F.col("count").alias("__c12"))
    ug = vocab.select(F.col("token").alias("w1"),
                      F.col("count").alias("__c1"))
    denom = F.coalesce(F.col("__c1"), F.lit(0)) + alpha * vocab_size
    term = F.log((F.coalesce(F.col("__c12"), F.lit(0)) + alpha) / denom)
    scored = (ex.join(bg, ["w1", "w2"], "left")
              .join(ug, ["w1"], "left")
              .groupBy("id")
              .agg(F.sum(F.col("m") * term).alias("__lp"),
                   F.sum("m").cast("long").alias("n_bigrams")))
    return scored.select(
        "id", "n_bigrams",
        F.round(F.col("__lp") / F.col("n_bigrams"), 4)
        .alias("avg_logprob"))
