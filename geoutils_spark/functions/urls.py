"""URL parsing / normalization as paired Catalyst-Column and DuckDB-SQL
builders (the queries.py twin discipline).

A web-corpus engine lives and dies on per-URL / per-host operations:
partition-by-host crawl politeness, registered-domain reputation joins,
dedup keyed on a normalized URL. All builders here are single regex /
string expressions — whole-stage-codegen on the Spark side, no UDFs — and
every pattern literal is shared verbatim between the two dialects so the
oracle comparison is bit-exact.

Dialect-parity notes (verified empirically):

* ``regexp_extract`` returns ``''`` on no-match in BOTH Spark and DuckDB;
* patterns stay inside the RE2 subset (no backrefs/lookahead) so the Java
  and RE2 engines agree;
* backslashes reach both engines literally (Python raw strings on the
  Spark side, standard single-quoted strings in DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Shared pattern literals — single source of truth for both dialects.
# RFC 3986 schemes are case-insensitive and real crawl data contains
# HTTP:// — match both cases explicitly (no inline (?i): RE2/Java flag
# scoping differs; an explicit class is identical in both engines).
SCHEME_RE = r"[A-Za-z][A-Za-z0-9+.-]*"
HOST_RE = rf"^{SCHEME_RE}://([^/?#]+)"
PATH_RE = rf"^{SCHEME_RE}://[^/?#]+(/[^?#]*)"
DOMAIN_RE = r"([^.]+\.[^.]+)$"          # registered domain ~ last two labels
TLD_RE = r"\.([^.:]+)(:\d+)?$"          # last label of the host, port-safe
SEGMENT_RE = r"/[^/]+"                  # one non-empty path segment
FRAGMENT_RE = r"#.*$"


def url_host_col(url: Column) -> Column:
    """Hostname (authority without the path), '' when not a URL."""
    return F.regexp_extract(url, HOST_RE, 1)


def url_host_sql(url: str) -> str:
    return f"regexp_extract({url}, '{HOST_RE}', 1)"


def url_path_col(url: Column) -> Column:
    """Path component including the leading slash ('' when absent)."""
    return F.regexp_extract(url, PATH_RE, 1)


def url_path_sql(url: str) -> str:
    return f"regexp_extract({url}, '{PATH_RE}', 1)"


def url_domain_col(host: Column) -> Column:
    """Registered domain approximated as the last two host labels
    (site7.example from sub.site7.example). A real public-suffix list is a
    broadcast dim-table join at scale; the two-label rule is the
    deterministic, dependency-free core."""
    return F.regexp_extract(host, DOMAIN_RE, 1)


def url_domain_sql(host: str) -> str:
    return f"regexp_extract({host}, '{DOMAIN_RE}', 1)"


def url_tld_col(host: Column) -> Column:
    return F.regexp_extract(host, TLD_RE, 1)


def url_tld_sql(host: str) -> str:
    return f"regexp_extract({host}, '{TLD_RE}', 1)"


def url_depth_col(path: Column) -> Column:
    """Number of non-empty path segments ('/a/b/c' -> 3, '' -> 0)."""
    return F.regexp_count(path, F.lit(SEGMENT_RE)).cast("int")


def url_depth_sql(path: str) -> str:
    return f"CAST(len(regexp_extract_all({path}, '{SEGMENT_RE}')) AS INT)"


def url_param_col(url: Column, key: str) -> Column:
    """Value of one query parameter ('' when absent). ``key`` must be a
    regex-safe literal (an identifier)."""
    return F.regexp_extract(url, rf"[?&]{key}=([^&#]*)", 1)


def url_param_sql(url: str, key: str) -> str:
    return f"regexp_extract({url}, '[?&]{key}=([^&#]*)', 1)"


def url_normalize_col(url: Column) -> Column:
    """Canonical form for dedup keys: strip the fragment, lowercase the
    scheme+host (path/query case is significant per RFC 3986), drop one
    trailing slash. Single codegen expression."""
    nofrag = F.regexp_replace(url, FRAGMENT_RE, "")
    head = F.regexp_extract(nofrag, HOST_RE + f"|^{SCHEME_RE}:", 0)
    # lowercase only the scheme://host prefix, keep the rest byte-exact
    rest = F.substring(nofrag, F.length(head) + 1, F.lit(1 << 30))
    norm = F.concat(F.lower(head), rest)
    return F.regexp_replace(norm, r"(.)/$", "$1")


def url_normalize_sql(url: str) -> str:
    nofrag = f"regexp_replace({url}, '{FRAGMENT_RE}', '')"
    head = f"regexp_extract({nofrag}, '{HOST_RE}|^{SCHEME_RE}:', 0)"
    rest = f"substring({nofrag}, length({head}) + 1)"
    norm = f"concat(lower({head}), {rest})"
    return f"regexp_replace({norm}, '(.)/$', '\\1')"
