"""Deterministic HTML -> text extraction (byte-stable, versioned).

The engine's webtext analog of the reference's deterministic feature
conversion: output must be byte-identical per url across runs and platforms
(BASELINE.json per-row invariant; golden precedent
/root/reference/test.bats:81-90 pins exact stdout bytes).

Pure function of the input bytes: fixed utf-8 ``errors='replace'`` decode,
fixed tag/entity grammar, fixed whitespace collapse — no environment-dependent
behavior. The batch form is an Arrow-batched pandas UDF built from the *same
compiled regexes* as the scalar form, so scalar goldens and the distributed
path cannot drift.

TEXT_EXTRACT_VERSION is bumped on any semantic change; goldens embed it.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

TEXT_EXTRACT_VERSION = 1

_RE_COMMENT = re.compile(r"<!--.*?-->", re.S)
_RE_DROPBLOCK = re.compile(r"<(script|style|noscript)\b.*?</\1\s*>", re.S | re.I)
_RE_BLOCKTAG = re.compile(
    r"</?(?:p|div|br|li|ul|ol|h[1-6]|tr|table|thead|tbody|td|th|section|article|"
    r"header|footer|blockquote|title|figure|figcaption|nav|aside|pre|hr|dl|dt|dd)"
    r"(?:\s[^>]*)?/?\s*>",
    re.I,
)
_RE_ANYTAG = re.compile(r"<[^>]*>", re.S)
_RE_ENT_DEC = re.compile(r"&#([0-9]{1,7});")
_RE_ENT_HEX = re.compile(r"&#[xX]([0-9a-fA-F]{1,6});")
_NAMED_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&amp;", "&"),  # must be last
]
# One-pass form of the six sequential fixed replaces. Equivalent because no
# replacement string can create a new named entity for a pass ordered after
# it: replacements emit single chars, and the only '&'-emitter (&amp;) is
# LAST in the sequential order, so its output is never rescanned there
# either. (Proven byte-identical by the fuzz test.)
_RE_NAMED = re.compile("|".join(e for e, _ in _NAMED_ENTITIES))
_NAMED_MAP = dict(_NAMED_ENTITIES)


def _decode_named(m: re.Match) -> str:
    return _NAMED_MAP[m.group(0)]


_RE_HSPACE = re.compile(r"[ \t\r\f\v]+")
_RE_NLRUN = re.compile(r" ?\n[ \n]*")
# Fast forms that skip the overwhelmingly-common no-op matches (a lone
# space / a lone newline replaced by itself). Byte-identical outputs:
# maximal hspace runs of length >= 2 and lone non-space hspace chars still
# collapse to one space; a lone "\n" with no adjacent space/newline was
# replaced by "\n" before — now simply untouched.
_RE_HSPACE_FAST = re.compile(r"[ \t\r\f\v]{2,}|[\t\r\f\v]")
_RE_NLRUN_FAST = re.compile(r" \n[ \n]*|\n[ \n]+")


def _decode_dec(m: re.Match) -> str:
    cp = int(m.group(1))
    return chr(cp) if 0 < cp <= 0x10FFFF else ""


def _decode_hex(m: re.Match) -> str:
    cp = int(m.group(1), 16)
    return chr(cp) if 0 < cp <= 0x10FFFF else ""


def extract_text_series(html: pd.Series) -> pd.Series:
    """bytes Series -> extracted-text Series (the one true implementation)."""
    s = html.str.decode("utf-8", errors="replace")
    s = s.str.replace(_RE_COMMENT, " ", regex=True)
    s = s.str.replace(_RE_DROPBLOCK, " ", regex=True)
    s = s.str.replace(_RE_BLOCKTAG, "\n", regex=True)
    s = s.str.replace(_RE_ANYTAG, " ", regex=True)
    s = s.str.replace(_RE_ENT_DEC, _decode_dec, regex=True)
    s = s.str.replace(_RE_ENT_HEX, _decode_hex, regex=True)
    s = s.str.replace(_RE_NAMED, _decode_named, regex=True)
    s = s.str.replace(_RE_HSPACE_FAST, " ", regex=True)
    s = s.str.replace(_RE_NLRUN_FAST, "\n", regex=True)
    return s.str.strip(" \n")


def extract_text_series_v1_reference(html: pd.Series) -> pd.Series:
    """The original pass-by-pass formulation, kept as the equivalence
    reference for the fused/fast passes (fuzz-tested byte-identical).
    Not on any hot path."""
    s = html.str.decode("utf-8", errors="replace")
    s = s.str.replace(_RE_COMMENT, " ", regex=True)
    s = s.str.replace(_RE_DROPBLOCK, " ", regex=True)
    s = s.str.replace(_RE_BLOCKTAG, "\n", regex=True)
    s = s.str.replace(_RE_ANYTAG, " ", regex=True)
    s = s.str.replace(_RE_ENT_DEC, _decode_dec, regex=True)
    s = s.str.replace(_RE_ENT_HEX, _decode_hex, regex=True)
    for ent, rep in _NAMED_ENTITIES:
        s = s.str.replace(ent, rep, regex=False)
    s = s.str.replace(_RE_HSPACE, " ", regex=True)
    s = s.str.replace(_RE_NLRUN, "\n", regex=True)
    return s.str.strip(" \n")


def extract_text(html: bytes) -> str:
    """Scalar form for golden pinning — delegates to the Series impl so the
    two can never disagree."""
    return extract_text_series(pd.Series([html])).iloc[0]


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return extract_text_series(html)
