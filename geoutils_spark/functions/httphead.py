"""HTTP response-header parsing as paired Column/SQL builders — the
field extraction layer over the raw ``HTTP/1.1 ...`` blocks the WARC
source carries verbatim (sources/warc.py: response records are status
line + headers + CRLFCRLF + body, per ISO 28500).

A crawl pipeline branches on these before touching the body: status
routes (2xx keep, 3xx follow ``Location`` back to the frontier, 4xx/5xx
drop), ``Content-Type`` gates the parser (html vs pdf vs image), its
``charset`` parameter picks the decoder when the html <meta> is absent
(pagemeta.charset_col is the in-body fallback of this cascade).

Shared-literal regexps in the RE2/Java subset; ``(?im)`` (case-fold +
per-line anchors) behaves identically in both engines, and header
NAMES match case-insensitively per RFC 9110 while values keep their
bytes. First occurrence wins for repeated headers (both engines'
regexp_extract take the leftmost match).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STATUS_RE = r"^HTTP/1\.[01] ([0-9]{3})"
_CT_RE = r"(?im)^content-type:[ \t]*([^;\r\n]*)"
_CHARSET_RE = r"(?im)^content-type:[^\r\n]*;[ \t]*charset=([A-Za-z0-9._-]+)"


def _header_re(name: str) -> str:
    return rf"(?im)^{name}:[ \t]*([^\r\n]*)"


def status_col(http: Column) -> Column:
    """Status code as int; NULL when the block isn't an HTTP response."""
    return F.nullif(F.regexp_extract(http, STATUS_RE, 1), F.lit("")) \
        .cast("int")


def status_sql(http: str) -> str:
    return (f"CAST(nullif(regexp_extract({http}, '{STATUS_RE}', 1), '') "
            f"AS INT)")


def header_col(http: Column, name: str) -> Column:
    """First value of one header; '' when absent. ``name`` must be a
    regex-safe token (RFC 9110 header names are)."""
    return F.regexp_extract(http, _header_re(name), 1)


def header_sql(http: str, name: str) -> str:
    return f"regexp_extract({http}, '{_header_re(name)}', 1)"


def content_type_col(http: Column) -> Column:
    """Media type without parameters, lowercased (RFC 9110: type/subtype
    are case-insensitive), trailing spaces trimmed."""
    return F.lower(F.trim(F.regexp_extract(http, _CT_RE, 1)))


def content_type_sql(http: str) -> str:
    return f"lower(trim(regexp_extract({http}, '{_CT_RE}', 1)))"


def charset_param_col(http: Column) -> Column:
    """charset= parameter of Content-Type, lowercased; '' when absent."""
    return F.lower(F.regexp_extract(http, _CHARSET_RE, 1))


def charset_param_sql(http: str) -> str:
    return f"lower(regexp_extract({http}, '{_CHARSET_RE}', 1))"
