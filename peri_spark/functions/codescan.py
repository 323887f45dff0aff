"""Source-code corpus scanning operators.

The north-rule input is an Iceberg table of source-code repositories
``(repo, path, commit, lang, content)``; before that corpus is usable
as training data, a pipeline scans every file for (a) leaked
credentials — which must never reach a training set — and (b) file
"shape" signals (minified/generated blobs, indentation style, line
statistics) that drive keep/drop decisions. The Elixir reference has no
corpus layer (single-record validation only, lib/peri.ex:360); these
extend SURVEY §2.6's table-level stages the same way the curation and
textstats modules do.

Both operators are pure map-side projections built from ``pyspark.sql``
functions only — whole-stage codegen, zero shuffle, zero Python — so at
10^12 files they cost exactly one columnar scan of the pruned
``content`` column and scale linearly with executors.

All regexes are engine-portable (no lookaround, no \\b ambiguity,
ASCII classes; identical under Java regex and RE2) so the DuckDB
oracle reproduces every count and flag bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["SECRET_PATTERNS", "SECRET_ANCHORS", "scan_secrets",
           "code_shape_stats", "IMPORT_PATTERNS", "extract_imports",
           "import_edges", "module_document_frequency",
           "SPDX_PATTERN", "LICENSE_PHRASES", "scan_licenses",
           "SYMBOL_PATTERNS", "extract_symbols", "repo_license_rollup",
           "IMPORT_PATTERN_SETS", "extract_imports_by_lang",
           "ENTROPY_CANDIDATE_PATTERN", "high_entropy_tokens",
           "EXT_LANG", "SHEBANG_LANG", "KEYWORD_LANG", "detect_code_lang",
           "COMMENT_PATTERNS", "normalize_code",
           "PATH_FLAG_PATTERNS", "path_flags", "comment_stats",
           "LANG_COMMENT_STYLES", "code_profile"]

# label -> engine-portable regex. Deliberately high-precision shapes
# (provider-prefixed token formats, PEM armor) — a corpus-scale scan
# wants near-zero false positives because every hit quarantines a file.
SECRET_PATTERNS: dict[str, str] = {
    # AWS access key id: fixed AKIA prefix + 16 uppercase base32-ish
    "aws_key": r"AKIA[0-9A-Z]{16}",
    # GitHub fine-grained / classic personal access tokens
    "github_token": r"gh[ps]_[A-Za-z0-9]{36}",
    # Slack bot/app/legacy tokens
    "slack_token": r"xox[abpr]-[0-9A-Za-z-]{10,48}",
    # PEM private-key armor (RSA/EC/OPENSSH/blank algorithm tag)
    "private_key": r"-----BEGIN [A-Z ]{0,20}PRIVATE KEY-----",
    # three dot-separated base64url segments opening with {"... ("eyJ")
    "jwt": r"eyJ[A-Za-z0-9_-]{8,}\.[A-Za-z0-9_-]{8,}\.[A-Za-z0-9_-]{4,}",
    # quoted literal assigned to a password-ish identifier
    "password": r"(?i)(password|passwd|pwd)['\"]? *[:=] *['\"][^'\"]{6,64}['\"]",
}


# label -> literal substrings, at least one of which every match of the
# pattern must contain. `contains` is a plain substring scan (~10×
# cheaper than the regex), so guarding the regex behind it makes the
# common case — a clean file — cost one memchr-style pass per anchor
# instead of six regex engines. Semantics-preserving by construction:
# the anchor is a literal inside the regex itself.
SECRET_ANCHORS: dict[str, list[str]] = {
    "aws_key": ["AKIA"],
    "github_token": ["ghp_", "ghs_"],
    "slack_token": ["xox"],
    "private_key": ["PRIVATE KEY-----"],
    "jwt": ["eyJ"],
    # "password" has no case-sensitive literal anchor ((?i) identifier)
}


def scan_secrets(df: DataFrame, text_col: str,
                 patterns: dict[str, str] | None = None) -> DataFrame:
    """Count credential-pattern hits per row.

    Appends one ``n_<label>`` long column per pattern (match counts on
    the raw text), plus ``n_secrets`` (their sum) and ``has_secret``.
    Composes with :func:`peri_spark.functions.curation.redact_text`
    (pass ``patterns=SECRET_PATTERNS``) when the remediation is
    scrubbing rather than quarantining.

    Plan shape: one ``regexp_count`` chain inside a single projection —
    no shuffle, no Python, and Catalyst prunes the scan to ``text_col``
    plus whatever downstream selects.
    """
    use_defaults = patterns is None
    patterns = SECRET_PATTERNS if use_defaults else patterns
    t = F.col(text_col)
    counts = []
    for label, pat in patterns.items():
        subject, anchors = t, None
        if use_defaults:
            anchors = SECRET_ANCHORS.get(label)
            if label == "password":
                # (?i) over the whole text is the one regex with no
                # case-sensitive anchor; matching the case-sensitive
                # lowercase pattern against lower(text) counts the same
                # matches (the identifier is the only cased literal)
                # and lets 'passw'/'pwd' anchors guard it
                subject = F.lower(t)
                pat = pat.removeprefix("(?i)")
                anchors = ["passw", "pwd"]
        cnt = F.regexp_count(subject, F.lit(pat)).cast("long")
        if anchors:
            guard = subject.contains(anchors[0])
            for a in anchors[1:]:
                guard = guard | subject.contains(a)
            # NULL text must stay NULL (not 0) through the guard
            cnt = (F.when(t.isNull(), F.lit(None).cast("long"))
                   .when(guard, cnt).otherwise(F.lit(0).cast("long")))
        counts.append(cnt.alias(f"n_{label}"))
    out = df.select("*", *counts)
    total = sum((F.col(f"n_{label}") for label in patterns),
                F.lit(0).cast("long"))
    return out.select("*", total.alias("n_secrets")) \
              .withColumn("has_secret", F.col("n_secrets") > 0)


def code_shape_stats(df: DataFrame, content_col: str,
                     minified_line_len: int = 500) -> DataFrame:
    """Per-file line-shape statistics for a source-code corpus.

    Appends:

    * ``n_lines`` — 1 + newline count (empty string counts 1 line;
      NULL content yields NULL metrics, mirroring the suite's
      null-content violation path which handles those rows).
    * ``max_line_len`` / ``avg_line_len`` — longest line and mean line
      length (2dp; the sum of line lengths is ``length - (n_lines-1)``,
      so no per-line aggregation is needed for the mean).
    * ``blank_lines`` — lines that are empty or whitespace-only.
    * ``indent_tab_lines`` / ``indent_space_lines`` — leading-tab vs
      leading-space line counts (indentation-style signal).
    * ``alnum_fraction`` — [A-Za-z0-9] chars / total chars (4dp);
      low values flag binary-ish or symbol-soup blobs.
    * ``is_minified`` — ``max_line_len >= minified_line_len``: the
      single strongest generated/minified-file signal (a human-written
      source line virtually never reaches 500 chars).

    Plan shape: ``split`` + array HOFs (``transform``/``filter``/
    ``array_max``) in one codegen'd projection — the line array exists
    only inside the stage, never in a shuffle.
    """
    c = F.col(content_col)
    lines = F.split(c, "\n", -1)
    n_lines = F.size(lines).cast("long")
    line_lens = F.transform(lines, lambda s: F.length(s))
    max_len = F.array_max(line_lens).cast("long")
    avg_len = F.round((F.length(c) - (n_lines - F.lit(1)))
                      / n_lines.cast("double"), 2)
    blank = F.size(F.filter(lines, lambda s: F.trim(s) == "")).cast("long")
    tabbed = F.size(F.filter(lines, lambda s: s.startswith("\t"))).cast("long")
    spaced = F.size(F.filter(lines, lambda s: s.startswith(" "))).cast("long")
    alnum = F.length(F.regexp_replace(c, r"[^A-Za-z0-9]", ""))
    frac = F.round(alnum / F.greatest(F.length(c), F.lit(1)).cast("double"), 4)
    return df.select(
        "*",
        n_lines.alias("n_lines"),
        max_len.alias("max_line_len"),
        avg_len.alias("avg_line_len"),
        blank.alias("blank_lines"),
        tabbed.alias("indent_tab_lines"),
        spaced.alias("indent_space_lines"),
        frac.alias("alnum_fraction"),
        (max_len >= minified_line_len).alias("is_minified"),
    )


# language label -> engine-portable multiline import regex whose group 1
# is the imported module. (?m)^ anchors each LINE start; no lookaround,
# no backrefs — identical under Java regex and RE2/DuckDB, so the oracle
# reproduces every edge. Leading whitespace tolerated (indented imports
# inside try/if blocks are idiomatic python).
IMPORT_PATTERNS: dict[str, str] = {
    # `import a.b.c` / `import a.b as x` — first dotted name only;
    # `from a.b import c` — the source module a.b
    "py_import": r"(?m)^[ \t]*import[ \t]+([A-Za-z_][A-Za-z0-9_.]*)",
    "py_from": r"(?m)^[ \t]*from[ \t]+([A-Za-z_][A-Za-z0-9_.]*)[ \t]+import",
}


# Java's (?m)^ matches after \r, \u0085, \u2028 and \u2029; RE2's (and
# therefore DuckDB's) matches only after \n. Every line-anchored
# extractor normalizes the exotic terminators to \n FIRST — on both
# engines — so a bare-\r (classic-Mac) or U+2028 file cannot make the
# engines disagree about where a line starts. (\r\n becomes \n\n,
# which is transparent to line-start anchoring.)
_LINE_TERMINATORS = "[\r\u0085\u2028\u2029]"


def _normalize_lines(c: Column) -> Column:
    return F.regexp_replace(c, _LINE_TERMINATORS, "\n")


def _merged_modules(c, patterns: dict[str, str]):
    """Shared extract-merge-dedup-sort over a normalized content
    attribute — the single definition both the single-language and
    per-language dispatch paths consume."""
    parts = [F.regexp_extract_all(c, F.lit(p), 1)
             for p in patterns.values()]
    merged = parts[0]
    for p in parts[1:]:
        merged = F.concat(merged, p)
    return F.array_sort(F.array_distinct(merged))


def extract_imports(df: DataFrame, content_col: str,
                    patterns: dict[str, str] | None = None,
                    out_col: str = "imported_modules") -> DataFrame:
    """Append ``out_col``: the sorted distinct modules imported by each
    file (python-style ``import X`` / ``from X import Y`` by default;
    pass language-specific ``patterns`` — group 1 must capture the
    module).

    Plan shape: one ``regexp_extract_all`` per pattern concatenated and
    dedup-sorted inside a single codegen'd projection — zero shuffle,
    zero Python; the content column never leaves the scan stage. NULL
    content yields NULL (the null-content violation path owns those
    rows); a file with no imports yields an empty array.
    """
    patterns = IMPORT_PATTERNS if patterns is None else patterns
    # normalized copy materializes in its own projection so each
    # pattern's regexp_extract_all consumes the ATTRIBUTE (Catalyst
    # re-evaluates captured expressions once per consumer otherwise)
    staged = df.withColumn("__norm", _normalize_lines(F.col(content_col)))
    return (staged.withColumn(out_col,
                              _merged_modules(F.col("__norm"), patterns))
            .drop("__norm"))


def import_edges(df: DataFrame, content_col: str,
                 *id_cols: str,
                 patterns: dict[str, str] | None = None) -> DataFrame:
    """Explode each file's imports into dependency edges
    ``(*id_cols, module, root_module)`` — ``root_module`` is the first
    dotted segment (``pkg.sub.mod`` → ``pkg``), the granularity
    dependency analysis usually wants. Files with NULL content or no
    imports contribute no edges (inner explode). Map-side only: the
    exploded frame carries just the (tiny) id columns + module string,
    so whatever aggregation follows shuffles edges, never file bodies.
    """
    e = extract_imports(df, content_col, patterns=patterns)
    return (e.select(*id_cols,
                     F.explode("imported_modules").alias("module"))
            .withColumn("root_module",
                        F.split(F.col("module"), r"\.").getItem(0)))


def module_document_frequency(df: DataFrame, content_col: str,
                              repo_col: str | None = None,
                              patterns: dict[str, str] | None = None
                              ) -> DataFrame:
    """Corpus-level dependency census: per imported module, the number
    of files importing it (``n_files``) and — when ``repo_col`` is
    given — the number of distinct repos (``n_repos``, exact).

    Scale: the only shuffle carries (module[, repo]) pairs — bounded by
    the module vocabulary × repo fan-out, never by corpus bytes. At
    10^12 files the partial aggregation absorbs the per-file fan-in
    map-side, the same design as ``domain_counts``.
    """
    ids = [repo_col] if repo_col else []
    edges = import_edges(df, content_col, *ids, patterns=patterns)
    aggs = [F.count(F.lit(1)).alias("n_files")]
    if repo_col:
        aggs.append(F.countDistinct(repo_col).alias("n_repos"))
    return edges.groupBy("module", "root_module").agg(*aggs)


# ------------------------------------------------------------------ license

# SPDX short identifier expression after the standard tag line. The
# expression grammar here is deliberately the flat subset (ids joined by
# OR/AND/WITH) — group 1 captures the whole expression. Portable: no
# lookaround, ASCII classes only.
SPDX_PATTERN = (r"SPDX-License-Identifier:[ \t]*"
                r"([A-Za-z0-9.+-]+(?:[ \t]+(?:OR|AND|WITH)"
                r"[ \t]+[A-Za-z0-9.+-]+)*)")

# Header-phrase fallbacks, checked IN ORDER on the uppercased head when
# no SPDX tag is present. Phrases are the canonical first-line /
# grant-clause wordings, specific enough that a mention in prose is the
# acceptable false-positive trade (license scanners share this trade).
LICENSE_PHRASES: list[tuple[str, str]] = [
    ("GNU AFFERO GENERAL PUBLIC LICENSE", "AGPL-3.0"),
    ("GNU LESSER GENERAL PUBLIC LICENSE", "LGPL-3.0"),
    ("GNU LIBRARY GENERAL PUBLIC LICENSE", "LGPL-2.0"),
    ("GNU GENERAL PUBLIC LICENSE", "GPL-3.0"),
    ("MOZILLA PUBLIC LICENSE", "MPL-2.0"),
    ("APACHE LICENSE", "Apache-2.0"),
    ("PERMISSION IS HEREBY GRANTED, FREE OF CHARGE", "MIT"),
    ("REDISTRIBUTION AND USE IN SOURCE AND BINARY FORMS", "BSD-3-Clause"),
    ("THIS IS FREE AND UNENCUMBERED SOFTWARE", "Unlicense"),
]

# family classification over the UPPERCASED resolved license id /
# expression, checked IN ORDER (AGPL before GPL, LGPL before GPL).
_FAMILY_RULES: list[tuple[str, str]] = [
    ("AGPL", "copyleft"),
    ("LGPL", "weak-copyleft"),
    ("GPL", "copyleft"),
    ("MPL", "weak-copyleft"),
    ("EPL", "weak-copyleft"),
    ("MIT", "permissive"),
    ("BSD", "permissive"),
    ("APACHE", "permissive"),
    ("ISC", "permissive"),
    ("UNLICENSE", "permissive"),
    ("CC0", "permissive"),
]


def scan_licenses(df: DataFrame, content_col: str,
                  head_chars: int = 4096) -> DataFrame:
    """Append license columns to a code corpus: ``license`` (the SPDX
    tag expression if present, else a header-phrase match, else NULL),
    ``license_family`` (permissive / weak-copyleft / copyleft /
    unknown / none) and ``has_license``.

    Training-data curation for code filters on exactly this verdict
    (keep permissive, drop copyleft, review unknown), so it must be
    corpus-scan cheap: only the first ``head_chars`` characters are
    examined (license headers lead the file — bounding the regex cost
    per file regardless of blob size), everything is one codegen'd
    zero-shuffle projection, and the SPDX regex + phrase table are
    engine-portable so the DuckDB oracle reproduces every verdict.

    NULL content → NULL license, family 'none' stays NULL-safe as
    'none' only for non-NULL content (NULL rows keep NULL family — the
    null-content violation path owns them).
    """
    # the head substrings materialize in their own projection so the
    # probe chain consumes ATTRIBUTES — the repo's standing fix for
    # Catalyst re-evaluating a non-cheap captured expression once per
    # consumer (SURVEY §11 HOF/CASE materialization sweep)
    staged = df.withColumn(
        "__h", F.substring(F.col(content_col), 1, head_chars))
    staged = staged.withColumn("__hu", F.upper(F.col("__h")))
    h, hu = F.col("__h"), F.col("__hu")
    # literal anchor guard: `contains` is a substring scan ~10× cheaper
    # than the regex engine, and the tag line IS a literal in the regex
    spdx = F.when(
        h.contains("SPDX-License-Identifier"),
        F.nullif(F.regexp_extract(h, SPDX_PATTERN, 1), F.lit("")))
    phrase = F.lit(None).cast("string")
    for probe, lic in reversed(LICENSE_PHRASES):
        phrase = F.when(hu.contains(probe), F.lit(lic)).otherwise(phrase)
    staged = staged.withColumn("license", F.coalesce(spdx, phrase))
    license_col = F.col("license")
    up = F.upper(license_col)
    family = F.lit("unknown")
    for probe, fam in reversed(_FAMILY_RULES):
        family = F.when(up.contains(probe), F.lit(fam)).otherwise(family)
    family = (F.when(F.col(content_col).isNull(),
                     F.lit(None).cast("string"))
              .when(license_col.isNull(), F.lit("none"))
              .otherwise(family))
    return (staged
            .withColumn("license_family", family)
            .withColumn("has_license", F.when(F.col(content_col).isNull(),
                                              F.lit(None).cast("boolean"))
                        .otherwise(license_col.isNotNull()))
            .drop("__h", "__hu"))


# ------------------------------------------------------------------ symbols

# label -> (portable line-anchored regex, group 1 = symbol name).
# async defs are their own pattern: the plain def pattern is anchored to
# the line start (modulo indent) so `async def` never half-matches.
SYMBOL_PATTERNS: dict[str, str] = {
    "function": r"(?m)^[ \t]*def[ \t]+([A-Za-z_][A-Za-z0-9_]*)",
    "async_function": r"(?m)^[ \t]*async[ \t]+def[ \t]+([A-Za-z_][A-Za-z0-9_]*)",
    "class": r"(?m)^[ \t]*class[ \t]+([A-Za-z_][A-Za-z0-9_]*)",
}


def extract_symbols(df: DataFrame, content_col: str,
                    patterns: dict[str, str] | None = None) -> DataFrame:
    """Append ``n_<label>`` definition counts and ``n_symbols_distinct``
    (distinct defined names across all labels) per file — the
    shape signal that separates real modules from vendored blobs and
    generated code, and the per-file input to an API-surface census.

    Same contract as :func:`extract_imports`: one codegen'd zero-shuffle
    projection, engine-portable regexes (line-anchored, no lookaround),
    NULL content → NULL counts.
    """
    patterns = SYMBOL_PATTERNS if patterns is None else patterns
    out = df.withColumn("__norm", _normalize_lines(F.col(content_col)))
    c = F.col("__norm")
    alls = []
    for label, pat in patterns.items():
        arr = F.regexp_extract_all(c, F.lit(pat), 1)
        alls.append(arr)
        out = out.withColumn(f"n_{label}", F.size(arr).cast("long"))
    merged = alls[0]
    for a in alls[1:]:
        merged = F.concat(merged, a)
    return (out.withColumn("n_symbols_distinct",
                           F.size(F.array_distinct(merged)).cast("long"))
            .drop("__norm"))


# most → least restrictive; the rollup's effective verdict is the file
# maximum, because one copyleft file contaminates the repo for training
_FAMILY_SEVERITY: list[str] = [
    "none", "permissive", "unknown", "weak-copyleft", "copyleft"]


def repo_license_rollup(df: DataFrame, content_col: str,
                        repo_col: str = "repo",
                        head_chars: int = 4096) -> DataFrame:
    """Per-repo license verdict: family counts plus
    ``effective_family`` — the MOST RESTRICTIVE family any file in the
    repo carries (one GPL file makes the whole repo copyleft for
    curation purposes; 'unknown' outranks 'permissive' because an
    unidentified license needs review, not silent inclusion).

    ``scan_licenses``'s zero-shuffle projection feeds ONE
    partial-aggregated groupBy(repo); only (repo, severity, counters)
    cross the wire. Files with NULL content have a NULL family and are
    counted separately (``n_no_content``), never raising the verdict.
    """
    scanned = scan_licenses(df, content_col, head_chars=head_chars)
    fam = F.col("license_family")
    sev = F.array_position(
        F.array(*[F.lit(x) for x in _FAMILY_SEVERITY]), fam)
    aggs = [F.count(F.lit(1)).alias("n_files"),
            F.count(F.when(fam.isNull(), 1)).alias("n_no_content")]
    for x in _FAMILY_SEVERITY:
        aggs.append(F.count(F.when(fam == x, 1)).alias(
            "n_" + x.replace("-", "_")))
    aggs.append(F.max(sev).alias("__sev"))
    rolled = scanned.groupBy(F.col(repo_col).alias("repo")).agg(*aggs)
    eff = F.element_at(
        F.array(*[F.lit(x) for x in _FAMILY_SEVERITY]),
        F.col("__sev").cast("int"))
    return rolled.withColumn(
        "effective_family",
        F.when(F.col("__sev").isNotNull(), eff)).drop("__sev")


# per-language import-pattern sets (group 1 = module/header/crate).
# Same portability contract as IMPORT_PATTERNS: line-anchored, no
# lookaround, ASCII classes — Java regex ≡ RE2 on every construct.
IMPORT_PATTERN_SETS: dict[str, dict[str, str]] = {
    "python": IMPORT_PATTERNS,
    "javascript": {
        # import x from 'mod' / import 'mod' / import {a} from 'mod' —
        # a separator after the keyword ([ \t{*]) keeps identifiers
        # like `important_flag` or `imports[...]` from matching
        "js_import": r"""(?m)^[ \t]*import[ \t{*][^\n]*?["']([^"'\n]+)["']""",
        "js_require": r"""require\(["']([^"'\n]+)["']\)""",
        "js_dyn_import": r"""import\(["']([^"'\n]+)["']\)""",
    },
    "java": {
        "java_import": r"(?m)^[ \t]*import[ \t]+(?:static[ \t]+)?"
                       r"([A-Za-z_][A-Za-z0-9_.]*[A-Za-z0-9_*])[ \t]*;",
    },
    "go": {
        # single import "pkg"; block members are bare "pkg" lines
        "go_import": r"""(?m)^[ \t]*import[ \t]+[A-Za-z_.]*[ \t]*"([^"\n]+)\"""",
        "go_block": r"""(?m)^[ \t]+(?:[A-Za-z0-9_.]+[ \t]+)?"([^"\n]+)"[ \t]*$""",
    },
    "rust": {
        # brace groups (`use std::{fs, io};`) resolve to the BASE path
        # before the brace — crate granularity, never a mangled fragment
        "rust_use": r"(?m)^[ \t]*(?:pub[ \t]+)?use[ \t]+"
                    r"([A-Za-z_][A-Za-z0-9_]*(?:::[A-Za-z0-9_]+)*)",
        "rust_extern": r"(?m)^[ \t]*extern[ \t]+crate[ \t]+"
                       r"([A-Za-z_][A-Za-z0-9_]*)",
    },
    "c": {
        "c_include": r"""(?m)^[ \t]*#[ \t]*include[ \t]*[<"]([^>"\n]+)[>"]""",
    },
}


def extract_imports_by_lang(df: DataFrame, content_col: str,
                            lang_col: str,
                            sets: dict[str, dict[str, str]] | None = None,
                            out_col: str = "imported_modules") -> DataFrame:
    """Language-dispatched import extraction: each row's ``lang_col``
    picks its pattern set from ``IMPORT_PATTERN_SETS`` (unknown
    languages yield an empty array, NULL content NULL — same contract
    as :func:`extract_imports`).

    One projection: codegen CASE branches evaluate lazily, so each row
    pays only its own language's regexes; the normalized copy
    materializes once like the single-language path.
    """
    sets = IMPORT_PATTERN_SETS if sets is None else sets
    staged = df.withColumn("__norm",
                           _normalize_lines(F.col(content_col)))
    c = F.col("__norm")

    expr = F.when(c.isNull(), F.lit(None).cast("array<string>"))
    for lang, patterns in sets.items():
        expr = expr.when(F.col(lang_col) == lang,
                         _merged_modules(c, patterns))
    expr = expr.otherwise(
        F.when(c.isNotNull(), F.array().cast("array<string>")))
    return staged.withColumn(out_col, expr).drop("__norm")


# candidate shape for generic secret detection: long unbroken runs of
# base64/hex-ish characters. The pattern SELECTS candidates cheaply;
# the entropy test then separates random material (keys, tokens) from
# structured runs (identifiers, repeated padding).
ENTROPY_CANDIDATE_PATTERN = r"[A-Za-z0-9+/=_-]{20,}"


def high_entropy_tokens(df: DataFrame, text_col: str, *id_cols: str,
                        threshold: float = 4.3,
                        pattern: str = ENTROPY_CANDIDATE_PATTERN
                        ) -> DataFrame:
    """Generic (pattern-free) secret signal: per row, the maximum
    character-level Shannon entropy (bits) over candidate tokens —
    ``(*id_cols, n_candidates, max_entropy, has_high_entropy)``.
    Catches credential formats :data:`SECRET_PATTERNS` has no shape
    for: random base64 runs ≥ ``threshold`` bits/char (≈4.3 flags
    random hex and anything denser; English-ish identifiers sit ~3).

    Fully relational — and therefore exactly SQL-oracle-able: the
    candidate regex runs in the scan projection; only candidate tokens
    explode (suspicious runs are rare, so the exploded frames are
    candidate-sized, never corpus-sized); two partial-aggregated
    groupBys compute per-token char entropy ``log2(n) − Σc·log2(c)/n``
    and the per-row max; a left join restores candidate-free rows
    (``max_entropy`` NULL, flag false). NULL text → NULL columns.
    """
    if not id_cols:
        raise ValueError("high_entropy_tokens needs id column(s)")
    # the grouping key is a CONTENT hash, not the caller's ids: ids can
    # repeat (the corpus plants duplicate (repo,path,commit) rows, and
    # (repo,path) repeats across commits), and pooling two different
    # texts' candidate chars corrupts the entropy. Rows identical in
    # (ids, text) still pool — harmless: entropy is invariant under
    # uniform count scaling and the (uid, position) key keeps
    # n_candidates per-row.
    uid = F.xxhash64(*id_cols, F.col(text_col)).alias("__uid")
    base = df.select(*id_cols, F.col(text_col).alias("__t"), uid)
    cands = base.select(
        "__uid",
        F.posexplode(F.regexp_extract_all("__t", F.lit(pattern), 0))
        .alias("__cp", "__cand"))
    chars = cands.select(
        "__uid", "__cp",
        F.explode(F.split("__cand", "")).alias("__ch")) \
        .where(F.col("__ch") != "")
    freq = (chars.groupBy("__uid", "__cp", "__ch")
            .agg(F.count(F.lit(1)).alias("c")))
    ent = (freq.groupBy("__uid", "__cp")
           .agg((F.log2(F.sum("c"))
                 - F.sum(F.col("c") * F.log2("c")) / F.sum("c"))
                .alias("__h")))
    per_row = (ent.groupBy("__uid")
               .agg(F.count(F.lit(1)).alias("n_candidates"),
                    F.max("__h").alias("__hmax")))
    # the verdict compares the UNROUNDED max (the SQL oracle does too);
    # the reported max_entropy rounds for the display/hash surface only
    out = (base.join(per_row, "__uid", "left")
           .select(*id_cols,
                   F.when(F.col("__t").isNull(),
                          F.lit(None).cast("long"))
                   .otherwise(F.coalesce("n_candidates", F.lit(0)))
                   .alias("n_candidates"),
                   F.round("__hmax", 4).alias("max_entropy"),
                   F.when(F.col("__t").isNull(),
                          F.lit(None).cast("boolean"))
                   .otherwise(F.coalesce(
                       F.col("__hmax") >= threshold, F.lit(False)))
                   .alias("has_high_entropy")))
    return out


# ------------------------------------------------------------ lang detect

# extension -> language (the authoritative signal when present)
EXT_LANG: dict[str, str] = {
    "py": "python", "pyi": "python",
    "js": "javascript", "jsx": "javascript", "mjs": "javascript",
    "ts": "typescript", "tsx": "typescript",
    "java": "java", "go": "go", "rs": "rust",
    "c": "c", "h": "c", "cpp": "cpp", "cc": "cpp", "hpp": "cpp",
    "rb": "ruby", "php": "php", "cs": "csharp",
    "sh": "shell", "bash": "shell",
    "md": "markdown", "rst": "markdown",
    "json": "config", "yaml": "config", "yml": "config", "toml": "config",
}

# shebang interpreter substring -> language (second signal)
SHEBANG_LANG: list[tuple[str, str]] = [
    ("python", "python"), ("node", "javascript"),
    ("bash", "shell"), ("/sh", "shell"), ("ruby", "ruby"),
    ("perl", "perl"),
]

# content keyword probes, checked IN ORDER (most distinctive first);
# plain `contains` so the fallback costs substring scans, not regexes
KEYWORD_LANG: list[tuple[str, str]] = [
    ("public static void main", "java"),
    ("package main", "go"),
    ("fn main(", "rust"),
    ("#include", "c"),
    ("<?php", "php"),
    ("def ", "python"),
    ("function ", "javascript"),
]


def detect_code_lang(df: DataFrame, path_col: str, content_col: str,
                     out_col: str = "detected_lang",
                     head_chars: int = 512) -> DataFrame:
    """Detect each file's programming language: extension map first
    (authoritative), then the shebang interpreter, then ordered content
    keyword probes over the first ``head_chars`` chars, else
    ``'unknown'``. Corpus lang columns are routinely missing or wrong;
    downstream per-language dispatch (``extract_imports_by_lang``,
    lang-keyed dedup/stats) needs this verdict.

    One zero-shuffle codegen projection; the head materializes in its
    own projection so the probe chain consumes the attribute. NULL
    content rows still classify by extension; NULL path AND NULL
    content → NULL.
    """
    ext = F.lower(F.regexp_extract(F.col(path_col),
                                   r"\.([A-Za-z0-9_]+)$", 1))
    staged = df.withColumn(
        "__peri_head", F.substring(F.col(content_col), 1, head_chars))
    head = F.col("__peri_head")
    shebang = F.when(head.startswith("#!"),
                     F.substring_index(head, "\n", 1))
    by_ext = F.lit(None).cast("string")
    for e, lang in reversed(EXT_LANG.items()):
        by_ext = F.when(ext == e, F.lit(lang)).otherwise(by_ext)
    by_shebang = F.lit(None).cast("string")
    for probe, lang in reversed(SHEBANG_LANG):
        by_shebang = (F.when(shebang.contains(probe), F.lit(lang))
                      .otherwise(by_shebang))
    by_kw = F.lit(None).cast("string")
    for probe, lang in reversed(KEYWORD_LANG):
        by_kw = F.when(head.contains(probe), F.lit(lang)).otherwise(by_kw)
    verdict = F.coalesce(by_ext, by_shebang, by_kw)
    verdict = (F.when(F.col(path_col).isNull()
                      & F.col(content_col).isNull(),
                      F.lit(None).cast("string"))
               .otherwise(F.coalesce(verdict, F.lit("unknown"))))
    return staged.withColumn(out_col, verdict).drop("__peri_head")


# comment syntaxes by family; regexes are engine-portable (non-greedy
# block comments via [\s\S]*? — no DOTALL flag needed in either engine)
COMMENT_PATTERNS: dict[str, list[str]] = {
    "hash": [r"(?m)#[^\n]*"],                       # python/shell/ruby
    "c": [r"/\*[\s\S]*?\*/", r"(?m)//[^\n]*"],      # c-family/js/java/go/rust
}


# language -> comment styles that actually apply. Stripping the wrong
# family is not harmless: '#include' lines are CODE in C, '//' is floor
# division in Python — a language-blind strip merges genuinely
# different files on the dedup key.
LANG_COMMENT_STYLES: dict[str, tuple[str, ...]] = {
    "python": ("hash",), "shell": ("hash",), "ruby": ("hash",),
    "config": ("hash",),
    "c": ("c",), "cpp": ("c",), "javascript": ("c",),
    "typescript": ("c",), "java": ("c",), "go": ("c",), "rust": ("c",),
    "php": ("c", "hash"), "csharp": ("c",),
}


def _strip_comments(c: Column, styles: tuple[str, ...]) -> Column:
    """The ONE comment-strip chain both normalize_code and
    comment_stats consume (and the SQL oracles mirror)."""
    for style in styles:
        for pat in COMMENT_PATTERNS[style]:
            c = F.regexp_replace(c, pat, "")
    return c


def _strip_by_lang(c: Column, lang: Column) -> Column:
    out = c  # unknown language: strip NOTHING (conservative)
    for lg, styles in LANG_COMMENT_STYLES.items():
        out = F.when(lang == lg, _strip_comments(c, styles)) \
            .otherwise(out)
    return out


def normalize_code(df: DataFrame, content_col: str,
                   lang_col: str | None = None,
                   comment_styles: tuple[str, ...] = ("hash", "c"),
                   out_col: str = "content_norm",
                   digest_col: str = "norm_digest") -> DataFrame:
    """Formatting-invariant code normalization for NEAR-EXACT dedup
    (the big code-corpus pipelines dedup on exactly this): strip line
    and block comments, collapse whitespace runs to single spaces,
    trim — then ``digest_col`` = sha256 of the normalized text, the
    key ``exact_duplicates`` / ``exact_digest_index`` consume. Two
    files differing only in comments/indentation/blank lines collide;
    raw sha256 would keep both.

    Pass ``lang_col`` (e.g. ``detect_code_lang``'s verdict) to strip
    only the language's OWN comment syntax — without it the default
    strips both families, which treats '#include' lines in C and '//'
    floor division in Python as comments and can merge genuinely
    different files (acceptable only when the corpus is known
    single-family). Unknown languages under ``lang_col`` strip
    nothing. String literals containing a comment marker still
    truncate (the standard regex-strip trade, identical in both
    engines). Zero shuffle; NULL content → NULL.
    """
    c = F.col(content_col)
    if lang_col is not None:
        c = _strip_by_lang(c, F.col(lang_col))
    else:
        c = _strip_comments(c, comment_styles)
    c = F.trim(F.regexp_replace(c, r"[ \t\r\n]+", " "))
    staged = df.withColumn(out_col, c)
    return staged.withColumn(
        digest_col, F.sha2(F.col(out_col).cast("binary"), 256))


# path-classification probes (case-insensitive on the lowered path):
# directory segments / filename shapes that mark files a training
# pipeline usually EXCLUDES (vendored deps, generated artifacts) or
# ROUTES differently (tests, docs)
# matched against the RAW path: (?i:...) groups handle the
# case-insensitive parts, while the *Test.java convention stays
# case-SENSITIVE (lowering the path made `latest.java` a test)
PATH_FLAG_PATTERNS: dict[str, str] = {
    # tests: test/tests dirs, test_*.py, *_test.go, *.spec.js, *Test.java
    "is_test": r"(?i:(^|/)(tests?|spec|__tests__)(/|$))"
               r"|(?i:(^|/)test_[^/]*$)|(?i:_test\.[a-z]+$)"
               r"|(?i:\.(spec|test)\.[a-z]+$)"
               r"|(^|/|[a-z0-9_])Test\.java$",
    # vendored dependency trees
    "is_vendored": r"(?i:(^|/)(vendor|node_modules|third_party|"
                   r"thirdparty|external|deps)(/|$))",
    # generated artifacts: *.pb.go, *_pb2.py, *.g.dart, .min.js, dist/
    "is_generated": r"(?i:\.pb\.[a-z]+$|_pb2\.py$|\.g\.[a-z]+$"
                    r"|\.min\.(js|css)$|(^|/)(dist|build|target)(/|$))",
    # documentation dirs + doc markup; bare .txt deliberately NOT a doc
    # signal (requirements.txt / CMakeLists.txt are build inputs)
    "is_docs": r"(?i:(^|/)(docs?|documentation)(/|$)|\.(md|rst)$)",
}


def path_flags(df: DataFrame, path_col: str) -> DataFrame:
    """Append boolean path-classification flags (``is_test`` /
    ``is_vendored`` / ``is_generated`` / ``is_docs``) — the route/drop
    signals a code-corpus curation pass applies before reading a single
    content byte. All regexes match the RAW path with inline ``(?i:)``
    groups in one zero-shuffle projection — the deliberately
    case-sensitive ``*Test.java`` alternation (see
    :data:`PATH_FLAG_PATTERNS`) is why the path is never lowered;
    portable (no lookaround), so the SQL oracle reproduces every flag.
    NULL path → NULL flags.
    """
    p = F.col(path_col)
    out = df
    for name, pat in PATH_FLAG_PATTERNS.items():
        out = out.withColumn(name, F.when(p.isNotNull(), p.rlike(pat)))
    return out


def comment_stats(df: DataFrame, content_col: str,
                  lang_col: str | None = None,
                  comment_styles: tuple[str, ...] = ("hash", "c")
                  ) -> DataFrame:
    """Append ``comment_chars`` and ``comment_ratio`` (fraction of
    characters inside comments, 4dp): near-zero flags generated or
    minified code, near-one flags license-header boilerplate files.
    Derived as ``length(content) − length(comments stripped)`` — no
    per-line pass, one zero-shuffle projection, same portable
    :data:`COMMENT_PATTERNS` chain as ``normalize_code`` — including
    its ``lang_col`` language dispatch and the documented
    string-literal / language-blind-default trades. NULL content →
    NULL.
    """
    c = F.col(content_col)
    if lang_col is not None:
        stripped = _strip_by_lang(c, F.col(lang_col))
    else:
        stripped = _strip_comments(c, comment_styles)
    removed = F.length(c) - F.length(stripped)
    return (df.withColumn("comment_chars", removed.cast("long"))
            .withColumn("comment_ratio",
                        F.round(removed
                                / F.greatest(F.length(c), F.lit(1))
                                .cast("double"), 4)))


def code_profile(df: DataFrame, path_col: str, content_col: str) -> DataFrame:
    """Every per-file scan signal in ONE fused pass: path flags,
    detected language, language-aware comment stats, license verdict,
    credential counts, per-language imports, symbol counts, and the
    normalized near-exact-dedup digest. All constituents are
    zero-shuffle codegen projections, so Catalyst collapses the whole
    profile into a single scan-stage — at 10^12 files the corpus is
    read ONCE for the complete signal set (measured in bench.py:
    the fused profile costs far less than the sum of separate scans).

    The detected language feeds the comment stripping and the import
    dispatch, so the signals are consistent with each other by
    construction.
    """
    out = path_flags(df, path_col)
    out = detect_code_lang(out, path_col, content_col)
    out = comment_stats(out, content_col, lang_col="detected_lang")
    out = scan_licenses(out, content_col)
    out = scan_secrets(out, content_col)
    out = extract_imports_by_lang(out, content_col, "detected_lang")
    out = extract_symbols(out, content_col)
    return normalize_code(out, content_col,
                          lang_col="detected_lang").drop("content_norm")
