"""Text analysis for training-data pipelines: tokens, language-ID, quality,
fingerprints.

The webtext counterpart of the reference's tag-derivation projections
(/root/reference/osm2assimp/osmfeature.cpp:20-111 derives typed features from
string maps with priority rules; here typed features are derived from document
text). Everything is a pure Catalyst column expression (whole-stage codegen,
no UDF) with a DuckDB SQL twin for the correctness oracle — the dual-backend
pattern established in ``functions/cells.py``.

Parity rules: tokenization is a plain single-space split (document fixtures
are single-space normalized by the extractor's whitespace collapse,
``textextract.py``); hashing is MD5 (identical in Spark and DuckDB); hex→int
is Spark ``conv(h,16,10)`` ≡ DuckDB ``CAST('0x'||h AS BIGINT)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Stopword lists for the n-gram/stopword language-ID heuristic. Deliberately
# tiny and frozen: they are part of the versioned function definition (same
# spirit as the reference's frozen tag-priority lists, osmfeature.cpp:20-21).
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu", "den", "mit", "von"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "de", "des", "que"),
    "es": ("el", "la", "los", "y", "es", "un", "una", "de", "del", "que"),
}
LANG_ORDER = ("en", "de", "fr", "es")  # deterministic argmax tiebreak
UNKNOWN_LANG = "und"

TOKENANALYSIS_VERSION = 1


# ---------------------------------------------------------------------------
# Tokens
# ---------------------------------------------------------------------------

def tokens_col(text: Column) -> Column:
    """Whitespace tokens (single-space split; parity-safe both dialects)."""
    return F.split(text, " ")


def tokens_sql(text: str) -> str:
    return f"string_split({text}, ' ')"


def token_count_col(text: Column) -> Column:
    return F.size(tokens_col(text)).cast("long")


def token_count_sql(text: str) -> str:
    return f"CAST(len({tokens_sql(text)}) AS BIGINT)"


# BPE-ish sub-token classes: alphabetic runs, digit runs, single other marks.
# Kept to character classes that Java regex and RE2 treat identically.
_ALPHA_RUN = "[A-Za-z]+"
_DIGIT_RUN = "[0-9]+"
_MARK = "[^A-Za-z0-9 ]"


def subtoken_counts_col(text: Column) -> tuple[Column, Column, Column]:
    """(alpha_runs, digit_runs, marks) — the inputs a BPE-ish pre-tokenizer
    would count; JVM-side regexp, no UDF."""
    return (
        F.regexp_count(text, F.lit(_ALPHA_RUN)).cast("long"),
        F.regexp_count(text, F.lit(_DIGIT_RUN)).cast("long"),
        F.regexp_count(text, F.lit(_MARK)).cast("long"),
    )


def subtoken_counts_sql(text: str) -> tuple[str, str, str]:
    return (
        f"CAST(len(regexp_extract_all({text}, '{_ALPHA_RUN}')) AS BIGINT)",
        f"CAST(len(regexp_extract_all({text}, '{_DIGIT_RUN}')) AS BIGINT)",
        f"CAST(len(regexp_extract_all({text}, '{_MARK}')) AS BIGINT)",
    )


# ---------------------------------------------------------------------------
# Language-ID (stopword-hit heuristic)
# ---------------------------------------------------------------------------

def lang_hits_col(toks: Column, lang: str) -> Column:
    words = STOPWORDS[lang]
    return F.size(F.filter(toks, lambda t: t.isin(*words))).cast("long")


def lang_hits_sql(toks: str, lang: str) -> str:
    inlist = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"CAST(len(list_filter({toks}, t -> t IN ({inlist}))) AS BIGINT)"


def langid_col(toks: Column) -> Column:
    """argmax over per-language stopword hits; ties broken by LANG_ORDER;
    all-zero -> 'und'."""
    scores = {lang: lang_hits_col(toks, lang) for lang in LANG_ORDER}
    best = F.greatest(*scores.values())
    out = F.lit(UNKNOWN_LANG)
    for lang in reversed(LANG_ORDER):
        out = F.when(scores[lang] == best, F.lit(lang)).otherwise(out)
    return F.when(best > 0, out).otherwise(F.lit(UNKNOWN_LANG))


def langid_sql(toks: str) -> str:
    scores = {lang: lang_hits_sql(toks, lang) for lang in LANG_ORDER}
    best = f"GREATEST({', '.join(scores.values())})"
    out = f"'{UNKNOWN_LANG}'"
    for lang in reversed(LANG_ORDER):
        out = f"CASE WHEN {scores[lang]} = {best} THEN '{lang}' ELSE {out} END"
    return f"CASE WHEN {best} > 0 THEN {out} ELSE '{UNKNOWN_LANG}' END"


# ---------------------------------------------------------------------------
# Quality scoring
# ---------------------------------------------------------------------------

def quality_cols(text: Column) -> dict[str, Column]:
    """Quality-signal bundle: all pure arithmetic over counts, so every value
    is a single deterministic float op (oracle-exact)."""
    toks = tokens_col(text)
    n_tok = F.size(toks).cast("long")
    n_char = F.length(text).cast("long")
    stop_hits = lang_hits_col(toks, "en")
    alpha, digit, mark = subtoken_counts_col(text)
    return {
        "n_tokens": n_tok,
        "n_chars": n_char,
        # mean token length: chars excluding the n-1 separators
        "mean_token_len": (n_char - (n_tok - F.lit(1))).cast("double") / n_tok.cast("double"),
        "stopword_ratio": stop_hits.cast("double") / n_tok.cast("double"),
        "digit_ratio": digit.cast("double") / F.greatest(alpha + digit, F.lit(1)).cast("double"),
        "mark_ratio": mark.cast("double") / n_char.cast("double"),
    }


def quality_sqls(text: str) -> dict[str, str]:
    toks = tokens_sql(text)
    n_tok = f"CAST(len({toks}) AS BIGINT)"
    n_char = f"CAST(LENGTH({text}) AS BIGINT)"
    stop = lang_hits_sql(toks, "en")
    alpha, digit, mark = subtoken_counts_sql(text)
    return {
        "n_tokens": n_tok,
        "n_chars": n_char,
        "mean_token_len": f"CAST({n_char} - ({n_tok} - 1) AS DOUBLE) / CAST({n_tok} AS DOUBLE)",
        "stopword_ratio": f"CAST({stop} AS DOUBLE) / CAST({n_tok} AS DOUBLE)",
        "digit_ratio": f"CAST({digit} AS DOUBLE) / CAST(GREATEST({alpha} + {digit}, 1) AS DOUBLE)",
        "mark_ratio": f"CAST({mark} AS DOUBLE) / CAST({n_char} AS DOUBLE)",
    }


def quality_keep_col(text: Column,
                     min_tokens: int = 20,
                     min_stopword_ratio: float = 0.01,
                     max_mark_ratio: float = 0.2) -> Column:
    """Gopher-style keep/drop gate from the quality bundle."""
    q = quality_cols(text)
    return (
        (q["n_tokens"] >= min_tokens)
        & (q["stopword_ratio"] >= min_stopword_ratio)
        & (q["mark_ratio"] <= max_mark_ratio)
    )


# ---------------------------------------------------------------------------
# Shingles + fingerprints
# ---------------------------------------------------------------------------

def word_shingles_col(text: Column, k: int = 3) -> Column:
    """Distinct word k-shingles; whole text as the lone shingle when shorter
    than k tokens. Row-local (no explode/shuffle on the hot path).

    Perf note: each shingle is ONE ``slice`` of the token array, not k
    ``element_at`` calls — Catalyst inlines ``split(text)`` into every
    array access inside the (interpreted, non-codegen) higher-order
    lambda, so the element_at form re-tokenized the document k times per
    position (measured 6x slowdown at k=6 on the dup-coverage query)."""
    toks = tokens_col(text)
    n = F.size(toks)
    sh = F.transform(
        F.sequence(F.lit(1), n - F.lit(k - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )
    return F.array_distinct(F.when(n >= k, sh).otherwise(F.array(text)))


def word_shingles_sql(text: str, k: int = 3) -> str:
    toks = tokens_sql(text)
    joined = " || ' ' || ".join(f"({toks})[i + {j}]" for j in range(k))
    # i = 1 .. n-k+1 (range() excludes the stop bound)
    sh = f"list_transform(range(1, len({toks}) - {k - 2}), i -> {joined})"
    return (
        f"list_distinct(CASE WHEN len({toks}) >= {k} THEN {sh} ELSE [{text}] END)"
    )


def word_ngrams_col(text: Column, k: int = 2) -> Column:
    """NON-distinct word k-grams (multiset, for repetition metrics — Gopher
    'fraction of n-grams occupied by the top n-gram' needs raw counts, unlike
    the deduped shingles above). Empty array when the doc has < k tokens.
    Row-local (no explode/shuffle until the caller asks for one)."""
    toks = tokens_col(text)
    n = F.size(toks)
    sh = F.transform(
        F.sequence(F.lit(1), n - F.lit(k - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )
    return F.when(n >= k, sh).otherwise(F.array().cast("array<string>"))


def word_ngrams_sql(text: str, k: int = 2) -> str:
    toks = tokens_sql(text)
    joined = " || ' ' || ".join(f"({toks})[i + {j}]" for j in range(k))
    sh = f"list_transform(range(1, len({toks}) - {k - 2}), i -> {joined})"
    return (
        f"CASE WHEN len({toks}) >= {k} THEN {sh} "
        f"ELSE CAST([] AS VARCHAR[]) END"
    )


def fingerprint_col(text: Column, k_shingle: int = 3, bottom_k: int = 8) -> Column:
    """Bottom-k sketch fingerprint: md5 of the ``bottom_k`` smallest shingle
    hashes — a winnowing-style document fingerprint (one string per doc,
    equal fingerprints => near-identical shingle sets)."""
    hashes = F.array_sort(
        F.transform(word_shingles_col(text, k_shingle), lambda s: F.md5(s.cast("binary")))
    )
    return F.md5(F.concat_ws("", F.slice(hashes, 1, bottom_k)).cast("binary"))


def fingerprint_sql(text: str, k_shingle: int = 3, bottom_k: int = 8) -> str:
    hashes = (
        f"list_sort(list_transform({word_shingles_sql(text, k_shingle)}, s -> md5(s)))"
    )
    return f"md5(array_to_string(({hashes})[1:{bottom_k}], ''))"


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003 — MOSS)
# ---------------------------------------------------------------------------

# key layout: 44-bit gram hash << 16 | (n_grams - pos). Minimizing the key
# over a window picks the minimum hash with RIGHTMOUST-position tie-break
# (larger pos => smaller low bits) — the paper's robust-winnowing rule —
# in ONE integer array_min, no struct folds. Bounds: docs up to 65,535
# grams per row (a 64 KiB page; chunk longer docs upstream).
WINNOW_POS_BITS = 16
_WINNOW_POS_MASK = (1 << WINNOW_POS_BITS) - 1


def winnow_keys_col(text: Column, k: int = 5, w: int = 8) -> Column:
    """DISTINCT winnowing selection keys for char-``k``-gram hashes under
    window ``w`` (guarantee: any shared substring of length >= w + k - 1
    shares at least one selected fingerprint). Row-local: grams, hashes,
    window minima and dedup all stay inside one Catalyst projection —
    zero exchanges until the caller aggregates. Decode with
    ``pos = n_grams - (key & 65535)``, ``fp = key >> 16``.

    Shape note — the lambda-binding barrier. The n gram hashes must be
    evaluated ONCE per row, then read w times by the sliding windows.
    Aliasing the hash array as a projection column does NOT guarantee
    that: CollapseProject re-inlines a derived array through projection
    boundaries (e.g. under the caller's explode), and each window's
    ``slice`` then re-evaluates all n md5s — O(n^2), measured 40 s ->
    timeout at sf0.1. Instead the array is bound as a HIGHER-ORDER-
    FUNCTION lambda variable: ``transform(array(keys), ks -> ...)``
    evaluates ``keys`` exactly once and every ``ks`` reference inside is
    an attribute read Catalyst cannot inline through. n md5s + n*w
    integer comparisons, collapse-proof in any consumer context
    (test_textanalysis pins one md5 per optimized plan)."""
    n = F.length(text) - F.lit(k - 1)
    keys = F.transform(
        F.sequence(F.lit(1), n),
        lambda j: F.conv(
            F.substring(F.md5(text.substr(j, F.lit(k)).cast("binary")), 1, 11),
            16, 10).cast("long") * F.lit(1 << WINNOW_POS_BITS)
        + (n - j).cast("long"),
    )

    def select_mins(ks):
        return F.array_distinct(F.transform(
            F.sequence(F.lit(1), F.size(ks) - F.lit(w - 1)),
            lambda i: F.array_min(F.slice(ks, i, F.lit(w))),
        ))

    sel = F.get(F.transform(F.array(keys), select_mins), F.lit(0))
    return F.when(n >= w, sel).otherwise(F.array().cast("array<bigint>"))


def winnow_keys_sql(text: str, k: int = 5, w: int = 8) -> str:
    """DuckDB twin — same md5-prefix hash, same key encoding, same
    nested window-min selection (all-integer outputs, so the value is
    engine-order independent)."""
    n = f"(LENGTH({text}) - {k - 1})"
    key = (f"CAST('0x' || SUBSTR(md5(SUBSTR({text}, j, {k})), 1, 11) AS BIGINT)"
           f" * {1 << WINNOW_POS_BITS} + CAST({n} - j AS BIGINT)")
    sel = (f"list_distinct(list_transform(range(1, {n} - {w - 2}), "
           f"i -> list_min(list_transform(range(i, i + {w}), j -> {key}))))")
    return (f"CASE WHEN {n} >= {w} THEN {sel} "
            f"ELSE CAST([] AS BIGINT[]) END")


# ---------------------------------------------------------------------------
# Sentence segmentation (r5)
# ---------------------------------------------------------------------------

# boundary = terminal punctuation run's last char followed by spaces.
# Deterministic dependency-free core (no abbreviation lexicon — "Mr. X"
# splits; a lexicon slots in as an extra alternation, same shape both
# dialects). RE2-safe: no lookaround — the boundary is rewritten to a
# BEL sentinel (a byte that cannot survive textextract's control-char
# scrub, so it never collides with content) and split on that.
SENT_BOUND_RE = r"([.!?]) +"
_SENT_SENTINEL = "\x07"


def sentences_col(text: Column) -> Column:
    """Array of sentences, terminators kept, empties dropped."""
    marked = F.regexp_replace(text, SENT_BOUND_RE, "$1" + _SENT_SENTINEL)
    return F.filter(F.split(marked, _SENT_SENTINEL), lambda s: s != "")


def sentences_sql(text: str) -> str:
    marked = (f"regexp_replace({text}, '{SENT_BOUND_RE}', "
              f"'\\1{_SENT_SENTINEL}', 'g')")
    return (f"list_filter(string_split({marked}, '{_SENT_SENTINEL}'), "
            f"s -> s <> '')")


# ---------------------------------------------------------------------------
# Unicode-script profiling (r5)
# ---------------------------------------------------------------------------

# Same Unicode script properties, two spellings: Java needs the Is
# prefix, RE2 takes the bare name (the one place the shared-literal rule
# bends — pinned by the parity test and the oracle query).
SCRIPT_ORDER = ["Latin", "Cyrillic", "Han", "Arabic", "Greek"]


def script_count_col(text: Column, script: str) -> Column:
    """Chars of one Unicode script (Java \\p{IsX})."""
    return F.regexp_count(text, F.lit(rf"\p{{Is{script}}}")).cast("long")


def script_count_sql(text: str, script: str) -> str:
    return (f"CAST(len(regexp_extract_all({text}, '\\p{{{script}}}')) "
            f"AS BIGINT)")


def dominant_script_col(text: Column) -> Column:
    """argmax over SCRIPT_ORDER char counts, ties to the earlier entry;
    'none' when the text has no scripted chars at all."""
    scores = {s: script_count_col(text, s) for s in SCRIPT_ORDER}
    best = F.greatest(*scores.values())
    out = F.lit("none")
    for s in reversed(SCRIPT_ORDER):
        out = F.when(scores[s] == best, F.lit(s)).otherwise(out)
    return F.when(best > 0, out).otherwise(F.lit("none"))


def dominant_script_sql(text: str) -> str:
    scores = {s: script_count_sql(text, s) for s in SCRIPT_ORDER}
    best = f"GREATEST({', '.join(scores.values())})"
    out = "'none'"
    for s in reversed(SCRIPT_ORDER):
        out = f"CASE WHEN {scores[s]} = {best} THEN '{s}' ELSE {out} END"
    return f"CASE WHEN {best} > 0 THEN {out} ELSE 'none' END"
