"""PII detection / redaction as paired Catalyst-Column and DuckDB-SQL
builders (the queries.py twin discipline).

Any corpus destined for model training gets a PII pass: find and mask
emails, phone numbers, and bare IPv4 addresses. The patterns here are the
deterministic regex core (the RE2-safe subset, shared verbatim between the
Spark/Java and DuckDB/RE2 engines); a production pass layers NER models on
top, which is a model-scoring UDF stage out of scope for the oracle-checked
kernel.

All builders are chained ``regexp_replace`` / ``regexp_count`` expressions:
whole-stage codegen on the Spark side, no UDFs, no shuffle — the pass is
embarrassingly row-local at any corpus size.

Redaction order is fixed (email, then phone, then IP). Counts are computed
on the PRE-redaction text in both dialects, and the classes may overlap on
adversarial inputs ('555-123-4567@x.example' counts n_email=1 AND
n_phone=1 yet redacts to a single <EMAIL>), so the sum of class counts can
exceed the number of masked spans. Both dialects count identically, so
oracle parity holds; treat per-class counts as detector hit counts, not a
span partition.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Shared pattern literals — single source of truth for both dialects.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"
IP_TOKEN = "<IP>"

_CLASSES = (
    ("email", EMAIL_RE, EMAIL_TOKEN),
    ("phone", PHONE_RE, PHONE_TOKEN),
    ("ip", IPV4_RE, IP_TOKEN),
)


def pii_count_cols(text: Column) -> dict[str, Column]:
    """Per-class match counts: {'n_email': .., 'n_phone': .., 'n_ip': ..}."""
    return {
        f"n_{name}": F.regexp_count(text, F.lit(pat)).cast("int")
        for name, pat, _ in _CLASSES
    }


def pii_count_sqls(text: str) -> dict[str, str]:
    return {
        f"n_{name}": f"CAST(len(regexp_extract_all({text}, '{pat}')) AS INT)"
        for name, pat, _ in _CLASSES
    }


def redact_col(text: Column) -> Column:
    """Replace every match of every class with its token, in class order."""
    out = text
    for _, pat, token in _CLASSES:
        out = F.regexp_replace(out, pat, token)
    return out


def redact_sql(text: str) -> str:
    out = text
    for _, pat, token in _CLASSES:
        out = f"regexp_replace({out}, '{pat}', '{token}', 'g')"
    return out


def has_pii_col(text: Column) -> Column:
    """Cheap boolean gate (rlike short-circuits; no counting)."""
    combined = "|".join(pat for _, pat, _ in _CLASSES)
    return text.rlike(combined)


def has_pii_sql(text: str) -> str:
    combined = "|".join(pat for _, pat, _ in _CLASSES)
    return f"regexp_matches({text}, '{combined}')"
