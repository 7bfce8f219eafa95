"""Unicode + whitespace text normalization (the CCNet/C4 cleaning stage
that runs before tokenization and dedup: canonically-equivalent byte
sequences must hash identically or every md5-keyed dedup tier silently
treats "café" (NFC) and "café" (NFD) as different documents).

Two tiers, chosen by what the engine can express natively:

* **NFC canonical composition** — Spark has no built-in Unicode
  normalizer, so this is one of the repo's few legitimate Arrow-batched
  pandas-UDF kernels (same class as textextract): ``unicodedata``'s NFC
  per batch, zero shuffles, row-local. The DuckDB oracle twin is
  ``nfc_normalize`` (utf8proc); both implement Unicode canonical
  composition, verified byte-identical on the planted decomposed
  sequences (tests + oracle hash compare).
* **Whitespace / control cleanup** — pure codegen ``regexp_replace``
  twins (no UDF): strip C0/C1 control chars (except ``\\n``/``\\t``),
  collapse horizontal whitespace runs, trim. Shared pattern literals,
  RE2-safe, identical in both dialects (the pii.py discipline).

Scale: everything here is embarrassingly row-local — the stage fuses
into the corpus scan. The UDF tier costs one Arrow round-trip; keep it
adjacent to other UDF stages (textextract) so Spark runs them in one
python-worker pass.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Shared pattern literals — single source of truth for both dialects.
# C0 controls minus \t\n, DEL. (No C1: those bytes are valid UTF-8
# continuation text in common mojibake; dropping them needs a decoder,
# not a regex.)
CONTROL_RE = "[\\x00-\\x08\\x0b-\\x1f\\x7f]"
HSPACE_RE = "[ \\t]+"


def nfc_series(text: pd.Series) -> pd.Series:
    """Batch NFC. None passes through (Arrow nulls stay null)."""
    return text.map(
        lambda x: x if x is None else unicodedata.normalize("NFC", x))


@F.pandas_udf(T.StringType())
def nfc_udf(text: pd.Series) -> pd.Series:
    return nfc_series(text)


def clean_ws_col(text: Column) -> Column:
    """Control-strip + horizontal-whitespace collapse + trim (codegen)."""
    c = F.regexp_replace(text, CONTROL_RE, "")
    c = F.regexp_replace(c, HSPACE_RE, " ")
    return F.trim(c)


def clean_ws_sql(text: str) -> str:
    c = f"regexp_replace({text}, '{CONTROL_RE}', '', 'g')"
    c = f"regexp_replace({c}, '{HSPACE_RE}', ' ', 'g')"
    return f"trim({c})"


def normalize_col(text: Column) -> Column:
    """Full normalize: NFC (Arrow UDF) then whitespace cleanup (codegen).
    DuckDB twin: ``normalize_sql`` (nfc_normalize + the same regexes)."""
    return clean_ws_col(nfc_udf(text))


def normalize_sql(text: str) -> str:
    return clean_ws_sql(f"nfc_normalize({text})")
