"""HTML head-metadata extraction — title / meta / canonical / charset /
lang as paired Catalyst-Column and DuckDB-SQL builders (the queries.py
twin discipline, same dialect-parity rules as urls.py).

A crawl pipeline needs these fields long before NLP sees the text:
``<link rel=canonical>`` collapses print/AMP/session-id variants ahead
of content dedup, ``<html lang>`` + ``<meta charset>`` route documents
to per-language pipelines and decoders, and the title cascade is the
display/snippet field every retrieval index stores. All builders are
single regexp_extract expressions — whole-stage codegen on the Spark
side, no UDFs — with every pattern literal shared verbatim between the
two engines (RE2 subset: no backrefs/lookaround; ``(?i)`` scoped
globally is identical in Java and RE2).

The ``display_title`` cascade (og:title, else <title>, else first <h1>)
mirrors the reference's name-priority cascade for OSM feature labels
(osm2assimp/main.cpp nameFromTags — name:en > name > id), re-expressed
for pages: the highest-fidelity field wins, each fallback only fires
when every stronger field is absent/empty.

Pinned simplifications (identical both dialects, documented contract):
attributes match in their canonical written order (``name= content=``,
``rel= href=``) with double quotes — the deterministic dependency-free
core; a full attribute-order-insensitive parser would slot in as a
mapInPandas source-boundary step like the WARC reader does.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TITLE_RE = r"(?i)<title[^>]*>([^<]*)</title>"
H1_RE = r"(?i)<h1[^>]*>([^<]*)</h1>"
CANONICAL_RE = r'(?i)<link\s+rel="canonical"\s+href="([^"]*)"'
CHARSET_RE = r'(?i)<meta\s+charset="?([A-Za-z0-9][A-Za-z0-9._-]*)'
LANG_RE = r'(?i)<html[^>]*\slang="([^"]*)"'


def _meta_name_re(name: str) -> str:
    return rf'(?i)<meta\s+name="{name}"\s+content="([^"]*)"'


def _meta_prop_re(prop: str) -> str:
    return rf'(?i)<meta\s+property="{prop}"\s+content="([^"]*)"'


def title_col(html: Column) -> Column:
    """<title> text, trimmed; '' when absent."""
    return F.trim(F.regexp_extract(html, TITLE_RE, 1))


def title_sql(html: str) -> str:
    return f"trim(regexp_extract({html}, '{TITLE_RE}', 1))"


def meta_content_col(html: Column, name: str) -> Column:
    """content= of <meta name="...">; ``name`` must be a regex-safe
    identifier literal."""
    return F.regexp_extract(html, _meta_name_re(name), 1)


def meta_content_sql(html: str, name: str) -> str:
    return f"regexp_extract({html}, '{_meta_name_re(name)}', 1)"


def og_content_col(html: Column, prop: str) -> Column:
    """content= of <meta property="og:...">."""
    return F.regexp_extract(html, _meta_prop_re(prop), 1)


def og_content_sql(html: str, prop: str) -> str:
    return f"regexp_extract({html}, '{_meta_prop_re(prop)}', 1)"


def canonical_col(html: Column) -> Column:
    return F.regexp_extract(html, CANONICAL_RE, 1)


def canonical_sql(html: str) -> str:
    return f"regexp_extract({html}, '{CANONICAL_RE}', 1)"


def charset_col(html: Column) -> Column:
    """Declared charset, lowercased ('' when absent) — per-language
    decoder routing key; HTML5 makes charset names case-insensitive."""
    return F.lower(F.regexp_extract(html, CHARSET_RE, 1))


def charset_sql(html: str) -> str:
    return f"lower(regexp_extract({html}, '{CHARSET_RE}', 1))"


def lang_col(html: Column) -> Column:
    """<html lang> attribute, lowercased (BCP 47 tags are
    case-insensitive)."""
    return F.lower(F.regexp_extract(html, LANG_RE, 1))


def lang_sql(html: str) -> str:
    return f"lower(regexp_extract({html}, '{LANG_RE}', 1))"


def display_title_col(html: Column) -> Column:
    """og:title > <title> > first <h1>, each trimmed; '' when all are
    absent. Empty strings (regexp no-match AND genuinely empty fields)
    fall through — the cascade keys on content, not tag presence."""
    og = F.trim(og_content_col(html, "og:title"))
    t = title_col(html)
    h1 = F.trim(F.regexp_extract(html, H1_RE, 1))
    return F.when(og != "", og).when(t != "", t).otherwise(h1)


def display_title_sql(html: str) -> str:
    og = f"trim({og_content_sql(html, 'og:title')})"
    t = title_sql(html)
    h1 = f"trim(regexp_extract({html}, '{H1_RE}', 1))"
    return (f"(CASE WHEN {og} <> '' THEN {og} "
            f"WHEN {t} <> '' THEN {t} ELSE {h1} END)")


# ---------------------------------------------------------------------------
# Publish-date cascade (r5)
# ---------------------------------------------------------------------------

TIME_TAG_RE = r'(?i)<time[^>]*\sdatetime="([^"]*)"'
URL_DATE_RE = r"/(20[0-9]{2})/([0-9]{2})/([0-9]{2})/"


def time_datetime_col(html: Column) -> Column:
    """datetime= of the first <time> element; '' when absent."""
    return F.regexp_extract(html, TIME_TAG_RE, 1)


def time_datetime_sql(html: str) -> str:
    return f"regexp_extract({html}, '{TIME_TAG_RE}', 1)"


def url_date_col(url: Column) -> Column:
    """yyyy-mm-dd from a /YYYY/MM/DD/ path segment; '' when absent."""
    y = F.regexp_extract(url, URL_DATE_RE, 1)
    m = F.regexp_extract(url, URL_DATE_RE, 2)
    d = F.regexp_extract(url, URL_DATE_RE, 3)
    return F.when(y != "", F.concat_ws("-", y, m, d)).otherwise(F.lit(""))


def url_date_sql(url: str) -> str:
    y = f"regexp_extract({url}, '{URL_DATE_RE}', 1)"
    m = f"regexp_extract({url}, '{URL_DATE_RE}', 2)"
    d = f"regexp_extract({url}, '{URL_DATE_RE}', 3)"
    return (f"(CASE WHEN {y} <> '' THEN {y} || '-' || {m} || '-' || {d} "
            f"ELSE '' END)")


def publish_date_col(html: Column, url: Column) -> Column:
    """First 10 chars (yyyy-mm-dd) of: og article:published_time >
    <time datetime> > URL /YYYY/MM/DD/ path; '' when all absent. The
    trafilatura-style cascade: highest-fidelity declaration wins."""
    og = F.substring(og_content_col(html, "article:published_time"), 1, 10)
    tt = F.substring(time_datetime_col(html), 1, 10)
    ud = url_date_col(url)
    return F.when(og != "", og).when(tt != "", tt).otherwise(ud)


def publish_date_sql(html: str, url: str) -> str:
    og = f"substring({og_content_sql(html, 'article:published_time')}, 1, 10)"
    tt = f"substring({time_datetime_sql(html)}, 1, 10)"
    ud = url_date_sql(url)
    return (f"(CASE WHEN {og} <> '' THEN {og} "
            f"WHEN {tt} <> '' THEN {tt} ELSE {ud} END)")
