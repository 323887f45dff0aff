"""Grapheme-length parity matrix (VERDICT r5 next-round #7).

Characterizes ``length_mode="grapheme"`` (``compiler._grapheme_len``)
against Elixir ``String.length`` (true UAX#29 extended grapheme
clusters, reference lib/peri.ex:879-893) over non-BMP / combining /
ZWJ inputs, and pins exactly where each mode diverges:

- default char mode (JVM ``length``): counts CODE POINTS — diverges
  from Elixir on every multi-codepoint cluster (documented, SURVEY §7);
- grapheme mode: approximates UAX#29 (combining marks, ZWJ sequences,
  variation selectors, skin tones) — matches Elixir on those classes
  and DIVERGES on three known residues pinned here: regional-indicator
  pairs (flags), conjoining Hangul jamo, and the CRLF cluster (plus the
  degenerate lone-ZWJ string).  ASCII/BMP-without-marks is identical
  across all three semantics.

These are characterization pins, not aspirations: the declared
``grapheme_min_documents`` query depends on the CURRENT approximation,
so changing ``_grapheme_len`` is a cross-round re-baseline, never a
patch.  If a row here fails, semantics moved and the oracle hash moved
with it.
"""

import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
from peri_spark.compiler import _grapheme_len  # noqa: E402

# (label, string, jvm_chars, elixir_graphemes, impl_graphemes)
MATRIX = [
    ("ascii", "abc", 3, 3, 3),
    ("precomposed_eacute", "é", 1, 1, 1),
    ("combining_eacute", "é", 2, 1, 1),
    ("double_combining", "é̂", 3, 1, 1),
    ("two_marked_clusters", "àb́", 4, 2, 2),
    ("nonbmp_letter", "\U0001D54F", 1, 1, 1),            # 𝕏
    ("emoji_zwj_family", "\U0001F468‍\U0001F469‍\U0001F467",
     5, 1, 1),
    ("emoji_skin_tone", "\U0001F44D\U0001F3FD", 2, 1, 1),
    ("variation_selector", "x️", 2, 1, 1),
    # known approximation residues (impl != Elixir), pinned:
    ("flag_regional_pair", "\U0001F1FA\U0001F1F8", 2, 1, 2),
    ("hangul_jamo", "각", 3, 1, 3),
    ("crlf", "\r\n", 2, 1, 2),
    ("lone_zwj", "‍", 1, 1, 0),
]


@pytest.mark.parametrize("label,s,jvm,elixir,impl",
                         MATRIX, ids=[m[0] for m in MATRIX])
def test_grapheme_matrix(spark, label, s, jvm, elixir, impl):
    df = spark.createDataFrame([(s,)], "s string")
    row = df.select(F.length("s").alias("chars"),
                    _grapheme_len(F.col("s")).alias("graph")).first()
    assert row["chars"] == jvm, f"{label}: JVM length moved"
    assert row["graph"] == impl, f"{label}: _grapheme_len moved"
    # divergence accounting stays honest in both directions
    if label in ("flag_regional_pair", "hangul_jamo", "crlf", "lone_zwj"):
        assert impl != elixir, f"{label}: residue healed — update SURVEY"
    else:
        assert impl == elixir, f"{label}: Elixir parity claim broken"


def test_null_and_empty(spark):
    df = spark.createDataFrame([(None,), ("",)], "s string")
    rows = df.select(_grapheme_len(F.col("s")).alias("g")) \
             .orderBy(F.col("g").asc_nulls_first()).collect()
    assert [r["g"] for r in rows] == [None, 0]
