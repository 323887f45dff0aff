"""Text analysis: language-ID, quality scoring, token counts, fingerprints.

All JVM-side column expressions (regexp counts, HOFs) — the hot path of a
100 TB text pipeline must not cross into Python per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["language_id", "quality_scores", "token_counts",
           "winnow_fingerprints", "LANG_MARKERS"]

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
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0)))


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
    alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    digits = F.length(F.regexp_replace(t, r"[^0-9]", ""))
    punct = F.length(F.regexp_replace(t, r"[^.,;:!?]", ""))
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
        pieces = F.size(F.regexp_extract_all(
            t, F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"), F.lit(0))).cast("long")
        out.append(pieces.alias("n_tokens_bpe_like"))
    return df.select(*out)


def winnow_fingerprints(df: DataFrame, text_col: str, id_col: str,
                        k: int = 8, window: int = 4,
                        hash_fn=None) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03):
    k-gram rolling hashes → per-window minima → distinct fingerprint set.
    JVM HOFs end to end; output (id, fingerprints array<long>) feeds an
    inverted-index overlap join for plagiarism/near-dup detection.
    ``hash_fn`` defaults to xxhash64; pass dedup.portable_hash64 for an
    oracle-reproducible fingerprint set."""
    h = hash_fn or F.xxhash64
    t = F.lower(F.col(text_col))
    n = F.greatest(F.length(t) - k, F.lit(0))
    seq = F.transform(F.sequence(F.lit(0), n),
                      lambda i: h(F.substr(t, i + 1, F.lit(k))))
    wins = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(seq) - window, F.lit(0))),
        lambda i: F.array_min(F.slice(seq, i + 1, window)))
    # null text has no k-grams — drop the row (greatest() ignoring the
    # null length would otherwise emit one bogus hash-of-nothing
    # fingerprint per null document)
    return (df.where(F.col(text_col).isNotNull())
            .select(F.col(id_col).alias("id"),
                    F.array_distinct(wins).alias("fingerprints")))
